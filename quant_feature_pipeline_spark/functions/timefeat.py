"""W12 — cyclic time encodings (`/root/reference/step5_featueres_unified.py:1095-1122`).

sin/cos of day-of-week/7 and hour/24. Reference uses pandas
``dayofweek`` (Monday=0); Spark's ``dayofweek`` is Sunday=1, so shift:
pandas_dow = (spark_dow + 5) % 7.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def time_encodings(df: DataFrame, ts_col: str = "ts", prefix: str = "time_") -> DataFrame:
    dow = (F.dayofweek(ts_col) + 5) % 7  # Monday=0 like pandas
    hour = F.hour(ts_col)
    return df.withColumns(
        {
            f"{prefix}day_sin": F.sin(dow * TWO_PI / 7.0),
            f"{prefix}day_cos": F.cos(dow * TWO_PI / 7.0),
            f"{prefix}hour_sin": F.sin(hour * TWO_PI / 24.0),
            f"{prefix}hour_cos": F.cos(hour * TWO_PI / 24.0),
        }
    )
