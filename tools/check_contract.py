"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` via DuckDB at a given sf dir, compares row count,
column names, and order-insensitive values (exact after the queries'
own rounding). Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # tolerate int32/int64 diffs
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = np.allclose(av.fillna(-9e99), bv.fillna(-9e99), rtol=0, atol=0, equal_nan=True)
        else:
            ok = av.fillna("__null__").equals(bv.fillna("__null__")) if av.dtype == object else av.equals(bv)
            if not ok and pd.api.types.is_datetime64_any_dtype(av):
                ok = (av.fillna(pd.Timestamp(0)) == bv.fillna(pd.Timestamp(0))).all()
        if not ok:
            mism = None
            try:
                neq = ~((av == bv) | (av.isna() & bv.isna()))
                idx = neq[neq].index[:3].tolist()
                mism = [(c, i, av[i], bv[i]) for i in idx]
            except Exception:
                pass
            return False, f"values differ in col {c}: {mism}"
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from quant_feature_pipeline_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:28s} spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS  {name:28s} rows={len(spark_pdf)} cols={len(spark_pdf.columns)} ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:28s} duckdb error: {str(e)[:300]}")
            continue
        ok, msg = compare(spark_pdf, duck_pdf)
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status}  {name:28s} rows={len(spark_pdf)} ({time.time()-t0:.1f}s) {msg if not ok else ''}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
