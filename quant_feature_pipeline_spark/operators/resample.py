"""A1/A3 — time-bucket resample and rolling (sliding) bars.

Reference semantics (`/root/reference/step2_resample.py:220-244`): pandas
``resample(tf, label='right', closed='right')`` with
``{open: first, high: max, low: min, close: last, volume: sum}``,
dropping incomplete buckets. The reference documents its own look-ahead
bug (closed='right' puts the bar stamped T INTO the bar labeled T,
`step2_resample.py:237-239`); the *correct* leakage-free semantics is the
half-open bucket ``[T-p, T)`` labeled T. We default to the correct form
and expose ``closed="right"`` as an explicit reference-compat mode.

Spark-first: ``groupBy(entity, window(ts, tf))`` with
``min_by/max_by`` picking open/close by timestamp — one shuffle on
(entity, bucket), map-side partial aggregation for min/max/sum, and
Parquet stats pruning upstream. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import tf_interval, tf_seconds
from ..tsutil import epoch_seconds


def resample_ohlcv(
    bars: DataFrame,
    tf: str,
    by: str = "entity",
    ts_col: str = "ts",
    closed: str = "left",
    label: str = "right",
    drop_incomplete: bool = False,
    expected_rows: int | None = None,
) -> DataFrame:
    """Tumbling OHLCV aggregation onto timeframe ``tf``.

    closed="left"  -> bucket [start, end), label end   (leakage-free default)
    closed="right" -> bucket (start, end], label end   (reference-compat,
                      `/root/reference/step2_resample.py:229` label/closed='right')
    ``drop_incomplete`` drops buckets with fewer than ``expected_rows``
    rows (reference `dropna()` effect on a regular 1m grid).
    """
    ts = F.col(ts_col)
    if closed == "right":
        # shift ts by -1us so a row exactly on a boundary lands in the
        # bucket that *ends* at its timestamp
        bucket_ts = ts - F.expr("INTERVAL 1 MICROSECOND")
    else:
        bucket_ts = ts
    win = F.window(bucket_ts, tf_interval(tf))
    agg = (
        bars.groupBy(F.col(by), win.alias("w"))
        .agg(
            F.min_by("open", ts_col).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts_col).alias("close"),
            F.sum("volume").alias("volume"),
            F.count(F.lit(1)).alias("bar_count"),
        )
    )
    label_col = F.col("w.end") if label == "right" else F.col("w.start")
    out = agg.select(
        F.col(by),
        label_col.alias(ts_col),
        "open",
        "high",
        "low",
        "close",
        "volume",
        "bar_count",
    )
    if drop_incomplete and expected_rows:
        out = out.filter(F.col("bar_count") >= expected_rows)
    return out


def rolling_bars(
    bars: DataFrame,
    k: int,
    by: str = "entity",
    ts_col: str = "ts",
) -> DataFrame:
    """A3 — sliding bar per base step: trailing-k-row OHLCV
    (`/root/reference/step2_resample.py:298-322`). Pure window frames."""
    w = Window.partitionBy(by).orderBy(ts_col).rowsBetween(-(k - 1), 0)
    return bars.select(
        by,
        ts_col,
        F.first("open").over(w).alias("open"),
        F.max("high").over(w).alias("high"),
        F.min("low").over(w).alias("low"),
        F.last("close").over(w).alias("close"),
        F.sum("volume").over(w).alias("volume"),
        F.count(F.lit(1)).over(w).alias("bar_count"),
    )


def continuity_stats(
    bars: DataFrame, tf: str, by: str = "entity", ts_col: str = "ts"
) -> DataFrame:
    """A8 — max inter-bar gap + missing ratio vs the expected grid
    (`/root/reference/run1_step1_data.py:31-60`)."""
    step = tf_seconds(tf)
    w = Window.partitionBy(by).orderBy(ts_col)
    gaps = bars.select(
        by,
        ts_col,
        (epoch_seconds(F.col(ts_col)) - epoch_seconds(F.lag(ts_col, 1).over(w))).alias("gap_s"),
    )
    return gaps.groupBy(by).agg(
        F.max("gap_s").alias("max_gap_s"),
        F.count(F.lit(1)).alias("n_rows"),
        (
            (epoch_seconds(F.max(ts_col)) - epoch_seconds(F.min(ts_col))) / step + 1
        ).cast("long").alias("expected_rows"),
        (
            1.0
            - F.count(F.lit(1))
            / ((epoch_seconds(F.max(ts_col)) - epoch_seconds(F.min(ts_col))) / step + 1)
        ).alias("missing_ratio"),
    )
