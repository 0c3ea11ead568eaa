"""Schema contract hash.

The reference pins its feature contract with
``schema_sha = sha1("|".join(feature_names))``
(`/root/reference/tools/export_utils.py:47-50`) stored in the NPZ and
recomputed on load. Same contract here over ``df.columns``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence


def schema_sha(names: Sequence[str]) -> str:
    return hashlib.sha1("|".join(names).encode("utf-8")).hexdigest()
