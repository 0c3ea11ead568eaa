"""W1/W2/W7 — lag/lead shift features, momentum, log return.

Reference semantics:
- W1 "true sliding window" momentum (`/root/reference/tools/real_sliding_simple.py:30-78`):
  ``mom = close/close.shift(k*steps) - 1`` recomputed on the base grid so
  a large-timeframe momentum updates every base bar; NaN → ffill → 0.
- W7 log return (`step5_featueres_unified.py:1158-1163`): log(p_t/p_{t-1})
  with zero-price guard.
- lead shift: the mirrored forward-looking shift (label construction).

All pure window/lag expressions — whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _w(by: str, ts_col: str):
    return Window.partitionBy(by).orderBy(ts_col)


def lag_momentum(
    df: DataFrame,
    periods: int,
    src: str = "close",
    out: str = "mom",
    by: str = "entity",
    ts_col: str = "ts",
    fill_zero: bool = True,
) -> DataFrame:
    """mom = src/lag(src, periods) - 1, warm-up rows 0-filled like the
    reference (`tools/real_sliding_simple.py:75`)."""
    w = _w(by, ts_col)
    prev = F.lag(src, periods).over(w)
    mom = F.when(prev.isNotNull() & (prev != 0), F.col(src) / prev - 1.0)
    if fill_zero:
        mom = F.coalesce(mom, F.lit(0.0))
    return df.withColumn(out, mom)


def sliding_momentum(
    df: DataFrame,
    tf_periods: dict[str, int],
    base_steps: dict[str, int],
    src: str = "close",
    by: str = "entity",
    ts_col: str = "ts",
) -> DataFrame:
    """W1 driver: for each timeframe tf with lookback L bars and
    ``steps`` base bars per tf bar, compute ``{tf}_mom{L}`` on the base
    grid with shift L*steps (`tools/real_sliding_simple.py:81-155`)."""
    w = _w(by, ts_col)
    cols = {}
    for tf, L in tf_periods.items():
        k = L * base_steps[tf]
        prev = F.lag(src, k).over(w)
        cols[f"{tf}_mom{L}"] = F.coalesce(
            F.when(prev.isNotNull() & (prev != 0), F.col(src) / prev - 1.0),
            F.lit(0.0),
        )
    return df.withColumns(cols)


def log_return(
    df: DataFrame,
    src: str = "close",
    out: str = "ret_log",
    by: str = "entity",
    ts_col: str = "ts",
) -> DataFrame:
    w = _w(by, ts_col)
    prev = F.lag(src, 1).over(w)
    return df.withColumn(
        out,
        F.coalesce(
            F.when((prev > 0) & (F.col(src) > 0), F.log(F.col(src) / prev)),
            F.lit(0.0),
        ),
    )


def lead_shift(
    df: DataFrame,
    cols: list[str],
    periods: int,
    by: str = "entity",
    ts_col: str = "ts",
    suffix: str | None = None,
) -> DataFrame:
    """Forward shift (lead) — label/targets; suffix defaults to _lead{k}."""
    w = _w(by, ts_col)
    sfx = suffix or f"_lead{periods}"
    return df.withColumns({f"{c}{sfx}": F.lead(c, periods).over(w) for c in cols})


def lag_shift(
    df: DataFrame,
    cols: list[str],
    periods: int,
    by: str = "entity",
    ts_col: str = "ts",
    suffix: str | None = None,
) -> DataFrame:
    w = _w(by, ts_col)
    sfx = suffix or f"_lag{periods}"
    return df.withColumns({f"{c}{sfx}": F.lag(c, periods).over(w) for c in cols})


def boundary_momentum(
    df: DataFrame,
    lookback: int,
    steps: int,
    method: str = "boundary",
    anchor_steps: int = 0,
    src: str = "close",
    out: str = "bmom",
    by: str = "entity",
    ts_col: str = "ts",
) -> DataFrame:
    """W2 — boundary-anchored momentum
    (`/root/reference/step5_featueres_unified.py:320-424`).

    Positional semantics on the per-entity row grid (0-based rn):
      Ls = lookback*steps; a = anchor_steps
      point:    out[i] = c[i]/c[i-Ls] - 1                     (i >= Ls+a)
      boundary: cur = ((i-a)//steps)*steps + a
                out[i] = c[cur]/c[cur-Ls] - 1                 (i >= Ls+a)
      boundary_intra_avg:
                num = mean(c[bucket_start..i]) (anchored bucket)
                out[i] = num/c[i-(Ls-steps)] - 1  (i >= max(Ls, Ls-steps)+a)
      warm-up rows -> 0 (reference ffills NaN then zero-fills).

    Spark-first: cur's close is `first(src)` over the anchored-bucket
    frame; c[cur-Ls] is `lag(bucket_start_close, Ls)` — the phase of
    i-Ls matches i, so the lagged row's bucket-start IS cur-Ls. No UDF.
    """
    Ls = lookback * steps
    a = anchor_steps % steps
    w_ord = Window.partitionBy(by).orderBy(ts_col)
    rn = F.row_number().over(w_ord) - 1
    dfi = df.withColumn("_rn", rn).withColumn(
        "_bucket", F.floor((F.col("_rn") - a) / steps)
    )
    w_bucket = (
        Window.partitionBy(by, "_bucket")
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_ord2 = Window.partitionBy(by).orderBy(ts_col)
    if method == "point":
        prev = F.lag(src, Ls).over(w_ord2)
        raw = F.when(
            (F.col("_rn") >= Ls + a) & prev.isNotNull() & (prev != 0),
            F.col(src) / prev - 1.0,
        )
    elif method == "boundary":
        bs = F.first(src).over(w_bucket)
        dfi = dfi.withColumn("_bs", bs)
        prev = F.lag("_bs", Ls).over(w_ord2)
        raw = F.when(
            (F.col("_rn") >= Ls + a) & prev.isNotNull() & (prev != 0),
            F.col("_bs") / prev - 1.0,
        )
    elif method == "boundary_intra_avg":
        ref_shift = max(0, Ls - steps)
        num = F.avg(src).over(w_bucket)
        prev = F.lag(src, ref_shift).over(w_ord2)
        min_start = max(Ls + a, ref_shift + a)
        raw = F.when(
            (F.col("_rn") >= min_start) & prev.isNotNull() & (prev != 0),
            num / prev - 1.0,
        )
    else:
        raise ValueError(f"method must be point/boundary/boundary_intra_avg: {method}")
    return (
        dfi.withColumn(out, F.coalesce(raw, F.lit(0.0)))
        .drop("_rn", "_bucket", "_bs")
    )
