"""Build the --py-files artifact: dist/quant_feature_pipeline_spark.zip.

Deterministic (sorted entries, fixed timestamp) so repeated builds of
the same tree are byte-identical — a cluster cache keyed on the zip's
hash never re-ships an unchanged package.

    python tools/make_pyfiles.py [out_dir]
    spark-submit --py-files dist/quant_feature_pipeline_spark.zip jobs/run_features.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "quant_feature_pipeline_spark"
FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # determinism, not provenance


def build_zip(repo_root: str, out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(repo_root, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    pkg_root = os.path.join(repo_root, PKG)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, repo_root), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = build_zip(repo, sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
