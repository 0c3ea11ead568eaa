"""W12 — cyclic time encodings (`/root/reference/step5_featueres_unified.py:1095-1122`).

sin/cos of day-of-week/7 and hour/24. Reference uses pandas
``dayofweek`` (Monday=0); Spark's ``dayofweek`` is Sunday=1, so shift:
pandas_dow = (spark_dow + 5) % 7.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
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


# Round-6 lookup tables shared by the Spark query and any SQL oracle.
# There are only 7x24 distinct (dow, hour) inputs and libm sin/cos differ
# across engines by ulps — fatal exactly on boundary values like
# sin(pi/6) = 0.5 where a 1-ulp difference flips round-6. Precomputing the
# rounded values once in Python and emitting them as literals on BOTH
# sides makes the comparison engine-independent.
# ``+ 0.0`` normalizes -0.0 -> +0.0: round(cos(2*pi*18/24), 6) is -0.0 in
# Python, Spark's element_at(array(lit(-0.0))) keeps the sign bit while
# DuckDB's list_extract normalizes it, so a byte-level content hash diverges
# on identical values unless the literal itself is sign-normalized.
DAY_SIN6 = [round(math.sin(TWO_PI * d / 7.0), 6) + 0.0 for d in range(7)]
DAY_COS6 = [round(math.cos(TWO_PI * d / 7.0), 6) + 0.0 for d in range(7)]
HOUR_SIN6 = [round(math.sin(TWO_PI * h / 24.0), 6) + 0.0 for h in range(24)]
HOUR_COS6 = [round(math.cos(TWO_PI * h / 24.0), 6) + 0.0 for h in range(24)]


def _lut(vals: list[float], idx) -> Column:
    return F.element_at(F.array(*[F.lit(float(v)) for v in vals]), (idx + 1).cast("int"))


def time_encodings_rounded(
    df: DataFrame, ts_col: str = "ts", prefix: str = "time_"
) -> DataFrame:
    """time_encodings with round-6 values taken from the shared lookup
    tables above (bit-exact against an oracle built from the same lists)."""
    dow = (F.dayofweek(ts_col) + 5) % 7  # Monday=0 like pandas
    hour = F.hour(ts_col)
    return df.withColumns(
        {
            f"{prefix}day_sin": _lut(DAY_SIN6, dow),
            f"{prefix}day_cos": _lut(DAY_COS6, dow),
            f"{prefix}hour_sin": _lut(HOUR_SIN6, hour),
            f"{prefix}hour_cos": _lut(HOUR_COS6, hour),
        }
    )
