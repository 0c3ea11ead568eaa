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


def grid_fill_ranges(
    bars: DataFrame,
    tf: str,
    by: str = "entity",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("close",),
    grid_bounds: DataFrame | None = None,
) -> DataFrame:
    """Scale variant of the grid+ffill pattern: each bar EXPLODES over
    its own validity range instead of sorting the full exploded grid.

    The join+window formulation sorts O(grid) rows (12.6M at sf0.1 for
    ~0.6M bars) just to forward-fill; here the only window is a lead()
    over O(bars) rows — each bar generates the grid points in
    [bar_ts, next_bar_ts - step] carrying its value, and a head segment
    covers [t0, first_bar_ts - step] with NULLs. Row-identical to
    ``grid.join(bars).ffill(value_cols)`` when bar timestamps are
    step-aligned and the grid is step-aligned from ``t0`` (both hold for
    resampled bars and hour/step-aligned bounds; asserted in tests).

    ``grid_bounds``: optional (by, t0, t1) frame defining each entity's
    grid span (default: the bars' own min/max ts). Bars labeled after
    ``t1`` generate nothing; entities with no bars yield all-NULL grids.
    Output: (by, ts, *value_cols) on the completed grid.
    """
    step = tf_seconds(tf)
    interval = F.expr(f"INTERVAL {step} SECONDS")
    if grid_bounds is None:
        grid_bounds = bars.groupBy(by).agg(
            F.min(ts_col).alias("t0"), F.max(ts_col).alias("t1")
        )
    # bars outside [t0, t1] contribute nothing — identical to the
    # equality join, where off-grid bars never match a grid point
    b = (
        bars.select(by, ts_col, *value_cols)
        .join(F.broadcast(grid_bounds), [by])
        .filter((F.col(ts_col) >= F.col("t0")) & (F.col(ts_col) <= F.col("t1")))
    )
    w = Window.partitionBy(by).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    seg = (
        b.withColumn("_stop", F.least(F.coalesce(nxt - interval, F.col("t1")), F.col("t1")))
        .select(
            by,
            *value_cols,
            F.explode(F.sequence(F.col(ts_col), F.col("_stop"), interval)).alias(ts_col),
        )
        .select(by, ts_col, *value_cols)
    )
    first_bar = b.groupBy(by).agg(F.min(ts_col).alias("_first"))
    head = (
        grid_bounds.join(first_bar, [by], "left")
        .withColumn(
            "_stop",
            F.least(
                F.coalesce(F.col("_first") - interval, F.col("t1")), F.col("t1")
            ),
        )
        .filter(F.col("_stop") >= F.col("t0"))
        .select(
            by,
            F.explode(F.sequence(F.col("t0"), F.col("_stop"), interval)).alias(ts_col),
            *[F.lit(None).cast(bars.schema[c].dataType).alias(c) for c in value_cols],
        )
    )
    return head.unionByName(seg)


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
