"""Grouped pandas execution with amortized per-group overhead.

``applyInPandas`` pays a fixed Python-side cost per group (Arrow batch
+ DataFrame construction), which dominates when groups are small/many.
``grouped_apply`` instead hash-repartitions by the group key and runs
ONE ``mapInPandas`` over each partition, splitting into groups with a
pandas groupby — identical semantics for whole-key groups (hash
partitioning puts a key's rows in exactly one partition), a fraction of
the overhead. NOTE: rows arrive in arbitrary order within each group —
``fn`` MUST sort its group itself if it is order-sensitive (the
indicator/rank kernels here all do).

Memory note: buffers one partition per task (like applyInPandas buffers
one group); partition sizing via spark.sql.shuffle.partitions /
maxPartitionBytes controls the bound at scale.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_apply(
    df: DataFrame,
    by: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType,
    num_partitions: int | None = None,
) -> DataFrame:
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        for _, g in pdf.groupby(by, sort=False):
            yield fn(g)[cols]

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parts, by).mapInPandas(run, schema=schema)
