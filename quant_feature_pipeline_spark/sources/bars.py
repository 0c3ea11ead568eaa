"""Derive OHLCV bar streams.

Two deterministic derivations:

* ``bars_from_tokens`` — decode the north-rule token table
  ``(doc_id, tokens, n_tok, source)`` into a bar stream. ``doc_id``
  encodes ``(entity, epoch_minute)``; ``n_tok`` (and a hash of doc_id)
  drive a reproducible random-walk price. The ``tokens`` array rides
  along untouched (passthrough invariant: array equality on every
  surviving row).

* ``bars_from_events`` — map the driver testdata ``events`` table
  (event_id, ts, user_id, event_type, value, props) onto the bar shape
  used by operator tests: ``user_id → entity``, ``value → price``.

Both are pure Catalyst expressions (no UDFs). The random walk uses a
bounded log-price so values stay positive: close = 100 * exp(s/1000)
where s is a windowed cumulative sum of zero-mean per-row shocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bars_from_tokens(tokens_df: DataFrame) -> DataFrame:
    """tokens table -> (entity, ts, open, high, low, close, volume, tokens, n_tok, source).

    The reference's bar invariants (`/root/reference/step2_resample.py:118-143`):
    canonical OHLCV columns, ts-sorted, positive close, low<=min(o,c),
    high>=max(o,c).
    """
    df = tokens_df.select(
        F.split_part(F.col("doc_id"), F.lit(":"), F.lit(1)).alias("entity"),
        F.timestamp_seconds(
            F.split_part(F.col("doc_id"), F.lit(":"), F.lit(2)).cast("long") * 60
        ).alias("ts"),
        "doc_id",
        "tokens",
        "n_tok",
        "source",
    )
    # zero-mean shock in [-16, 16) from n_tok hash; cumulative log-price.
    shock = (F.pmod(F.xxhash64("doc_id"), F.lit(33)) - 16).cast("double")
    w = (
        Window.partitionBy("entity")
        .orderBy("ts", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn("_s", F.sum(shock).over(w))
    close = F.lit(100.0) * F.exp(F.col("_s") / 1000.0)
    prev_close = F.lag(close, 1).over(Window.partitionBy("entity").orderBy("ts", "doc_id"))
    opn = F.coalesce(prev_close, close)
    spread = F.lit(1.0) + (F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(100)).cast("double") / 10000.0)
    return (
        df.withColumn("close", close)
        .withColumn("open", opn)
        .withColumn("high", F.greatest("open", "close") * spread)
        .withColumn("low", F.least("open", "close") / spread)
        .withColumn("volume", F.col("n_tok").cast("double") * 10.0)
        .drop("_s")
        .select(
            "entity", "ts", "open", "high", "low", "close", "volume",
            "doc_id", "tokens", "n_tok", "source",
        )
    )


def bars_from_events(events_df: DataFrame) -> DataFrame:
    """events table -> minimal bar-shaped stream keyed (entity, ts).

    One row per event: price columns all set from `value` (a tick, not a
    true bar) — downstream resample (A1) builds real OHLCV buckets from it.
    """
    return events_df.select(
        F.col("user_id").cast("string").alias("entity"),
        F.col("ts"),
        F.col("value").alias("open"),
        F.col("value").alias("high"),
        F.col("value").alias("low"),
        F.col("value").alias("close"),
        F.lit(1.0).alias("volume"),
        F.col("event_id"),
        F.col("event_type"),
    )
