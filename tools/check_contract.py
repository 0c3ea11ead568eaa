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
    """Sort columns by name + rows by value, like the driver's gate.

    Hash-faithful: floats stay float64 (compared bit-for-bit later) and
    integers keep their dtype (int32 vs int64 vs float64 is a REAL
    mismatch the driver's content hash sees — do not paper over it).
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            # width-normalize only (int32->int64 passed the driver's hash in
            # r2); int<->float KIND mismatches are checked strictly in compare
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def _float_bits_equal(av: pd.Series, bv: pd.Series) -> np.ndarray:
    """Bit-pattern equality per element, after canonicalizing NaN.

    Catches ±0.0 (different sign bit, equal value) and NaN-payload
    differences — exactly what value-level ``allclose`` masks but a
    byte-level content hash sees.
    """
    # copy=True: for an already-float64 column to_numpy returns a VIEW of
    # the caller's data and ascontiguousarray would be a no-op, so the
    # in-place NaN canonicalization below would mutate the frames being
    # compared (ADVICE r3)
    a = np.array(av.to_numpy(dtype="float64", na_value=np.nan), dtype="float64", copy=True)
    b = np.array(bv.to_numpy(dtype="float64", na_value=np.nan), dtype="float64", copy=True)
    a[np.isnan(a)] = np.nan  # canonical quiet-NaN bit pattern
    b[np.isnan(b)] = np.nan
    return a.view("uint64") == b.view("uint64")


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        a_float, b_float = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        a_int, b_int = pd.api.types.is_integer_dtype(av), pd.api.types.is_integer_dtype(bv)
        if (a_float or a_int) and (b_float or b_int):
            # strict KIND parity: HUGEINT->float64 vs int64 is a hash fail
            if a_float != b_float:
                return False, f"numeric kind differs in col {c}: {av.dtype} vs {bv.dtype}"
        if a_float and b_float:
            eq = _float_bits_equal(av, bv)
            ok = bool(eq.all())
            if not ok:
                idx = np.nonzero(~eq)[0][:3].tolist()
                return False, f"float bits differ in col {c}: {[(c, i, av.iloc[i], bv.iloc[i]) for i in idx]}"
            continue
        if av.dtype == object:
            ok = av.fillna("__null__").equals(bv.fillna("__null__"))
        else:
            ok = av.equals(bv)
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
    degraded = getattr(entrymod, "DEGRADED_ORACLES", {})
    failures = []
    rows_only = []
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
            why = degraded.get(name, "by design: no SQL-expressible oracle")
            rows_only.append((name, why))
            print(f"ROWS  {name:28s} rows={len(spark_pdf)} cols={len(spark_pdf.columns)} ({time.time()-t0:.1f}s) [rows-only: {why}]")
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
    if rows_only:
        # every oracle-less entry and WHY (ADVICE/VERDICT r3: a gate run
        # in a broken environment must not silently lose hash checks)
        print(f"\n{len(rows_only)} rows-only entries (weaker check):")
        for name, why in rows_only:
            print(f"  - {name}: {why}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
