"""Gap-based sessionization — north-rule operator (absent in the
reference's batch code; its streaming-adjacent analog is the
micro-batch tail recompute, SURVEY.md §2.9).

Two formulations:
- ``sessionize`` — gaps-and-islands: a new session starts when the gap
  to the previous event exceeds ``gap_s``; session id = running sum of
  start flags per entity. Pure Catalyst (lag + cumulative sum), works
  in any batch plan and matches ANSI SQL for the DuckDB oracle.
- Structured Streaming's ``session_window`` covers the streaming case
  (see streaming/micro.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tsutil import epoch_seconds


def sessionize(
    df: DataFrame,
    gap_s: int,
    by: str = "entity",
    ts_col: str = "ts",
    out: str = "session_id",
) -> DataFrame:
    w = Window.partitionBy(by).orderBy(ts_col)
    prev = F.lag(ts_col, 1).over(w)
    new_sess = F.when(
        prev.isNull()
        | ((epoch_seconds(F.col(ts_col)) - epoch_seconds(prev)) > float(gap_s)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        out,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(
    df: DataFrame,
    gap_s: int,
    by: str = "entity",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates: bounds, duration, event count (+sum of a
    value column if given)."""
    s = sessionize(df, gap_s, by=by, ts_col=ts_col)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (epoch_seconds(F.max(ts_col)) - epoch_seconds(F.min(ts_col))).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return s.groupBy(by, "session_id").agg(*aggs)
