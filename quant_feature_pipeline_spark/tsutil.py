"""Timestamp helpers that work for both TIMESTAMP and TIMESTAMP_NTZ.

Parquet written by other engines (e.g. the driver testdata, DuckDB)
carries TIMESTAMP_NTZ, which Spark refuses to cast directly to numeric.
Casting NTZ→LTZ first is exact under the UTC session timezone set in
session.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")
