"""W14/P8 — grid reindex + forward/backward fill + numeric cleaning.

Reference semantics (`/root/reference/tools/filling.py:19-73`): build a
complete time grid at the bar frequency, reindex onto it, forward-fill
``close``, seed missing ``open/high/low`` from the filled close, set
missing ``volume`` to 0. Generic ffill/bfill on request
(`fill_nan`, `tools/filling.py:49-73`). Cleaning (`tools/export_utils.py:72-94`):
±inf → null, ffill, then 0.

Spark-first: the grid is ``sequence(min_ts, max_ts, interval)`` exploded
per entity and left-joined (no driver loop); ffill is
``last(x, ignorenulls=True)`` over an unbounded-preceding row frame;
bfill is the mirrored ``first`` over the following frame. All Catalyst,
one shuffle on entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import tf_seconds


def _w_back(by: str, ts_col: str):
    return (
        Window.partitionBy(by)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )


def _w_fwd(by: str, ts_col: str):
    return (
        Window.partitionBy(by)
        .orderBy(ts_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )


def ffill(df: DataFrame, cols: list[str], by: str = "entity", ts_col: str = "ts") -> DataFrame:
    w = _w_back(by, ts_col)
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in cols],
    )


def bfill(df: DataFrame, cols: list[str], by: str = "entity", ts_col: str = "ts") -> DataFrame:
    w = _w_fwd(by, ts_col)
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[F.first(c, ignorenulls=True).over(w).alias(c) for c in cols],
    )


def grid_fill(
    bars: DataFrame,
    tf: str,
    by: str = "entity",
    ts_col: str = "ts",
    price_cols: tuple[str, ...] = ("open", "high", "low", "close"),
    volume_col: str = "volume",
) -> DataFrame:
    """Complete the per-entity time grid and fill OHLCV per reference
    rules: close→ffill; open/high/low→(their own value else filled close);
    volume→0. Grid spans each entity's own [min_ts, max_ts]."""
    step = tf_seconds(tf)
    grid = (
        bars.groupBy(by)
        .agg(F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1"))
        .select(
            by,
            F.explode(
                F.sequence(
                    F.col("_t0"), F.col("_t1"), F.expr(f"INTERVAL {step} SECONDS")
                )
            ).alias(ts_col),
        )
    )
    joined = grid.join(bars, [by, ts_col], "left")
    w = _w_back(by, ts_col)
    close_f = F.last("close", ignorenulls=True).over(w)
    out = joined.withColumn("_close_f", close_f)
    exprs = []
    for c in joined.columns:
        if c in (by, ts_col):
            exprs.append(F.col(c))
        elif c == "close":
            exprs.append(F.col("_close_f").alias("close"))
        elif c in price_cols:
            exprs.append(F.coalesce(F.col(c), F.col("_close_f")).alias(c))
        elif c == volume_col:
            exprs.append(F.coalesce(F.col(c), F.lit(0.0)).alias(c))
        else:
            exprs.append(F.col(c))
    return out.select(*exprs)


def clean_numeric(
    df: DataFrame,
    cols: list[str] | None = None,
    by: str = "entity",
    ts_col: str = "ts",
    fill_value: float = 0.0,
) -> DataFrame:
    """±inf/NaN → null → ffill → constant fill (`tools/export_utils.py:72-94`)."""
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float") and f.name not in (by, ts_col)
        ]
    w = _w_back(by, ts_col)
    exprs = []
    for c in df.columns:
        if c in cols:
            nulled = F.when(
                F.isnan(F.col(c)) | (F.abs(F.col(c)) == float("inf")), F.lit(None)
            ).otherwise(F.col(c))
            exprs.append(
                F.coalesce(
                    F.last(nulled, ignorenulls=True).over(w), F.lit(fill_value)
                ).alias(c)
            )
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)
