"""Stateless rolling indicators — pure Spark window aggregates.

Everything here streams over a ts-sorted per-entity frame inside
whole-stage codegen; the reference computed the same quantities with
pandas rolling/cumsum tricks:

- SMA windows (`/root/reference/congfigs/base_indicators.yaml` moving_averages;
  cumsum form `step5_featueres_unified.py:1010-1025`)
- Bollinger width (window 20, 2σ): (up-low)/ma
  (`tools/real_sliding_simple.py:158-209`)
- ROC momentum: close/close.shift(n)-1 (`tools/real_sliding_simple.py:44,71-73`)
- realized vol rv_win{20,50,100}: rolling std of log returns
  (`congfigs/base_indicators.yaml` volatility)
- rolling z-score via prefix sums (`step5_featueres_unified.py:157-196`)
- rolling volume sum (`step5_featueres_unified.py:595-620`)

Population variance (ddof=0) is used where the reference's cumsum math
implies it (z-score); sample std (ddof=1, pandas rolling default) for
Bollinger/realized-vol to match pandas `rolling().std()`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _frame(by: str, ts_col: str, n: int):
    return (
        Window.partitionBy(by).orderBy(ts_col).rowsBetween(-(n - 1), 0)
    )


def sma(
    df: DataFrame,
    windows: tuple[int, ...],
    src: str = "close",
    by: str = "entity",
    ts_col: str = "ts",
    min_periods: int = 1,
    prefix: str = "sma_",
) -> DataFrame:
    out = df
    for n in windows:
        w = _frame(by, ts_col, n)
        col = F.avg(src).over(w)
        if min_periods > 1:
            col = F.when(F.count(src).over(w) >= min_periods, col)
        out = out.withColumn(f"{prefix}{n}", col)
    return out


def rolling_std(
    df: DataFrame,
    n: int,
    src: str = "close",
    by: str = "entity",
    ts_col: str = "ts",
    out: str | None = None,
    ddof: int = 1,
) -> DataFrame:
    w = _frame(by, ts_col, n)
    fn = F.stddev_samp if ddof == 1 else F.stddev_pop
    return df.withColumn(out or f"std_{n}", fn(src).over(w))


def bollinger_width(
    df: DataFrame,
    n: int = 20,
    n_std: float = 2.0,
    src: str = "close",
    by: str = "entity",
    ts_col: str = "ts",
    out: str = "bb_width",
    min_periods: int | None = None,
) -> DataFrame:
    """width = (upper-lower)/ma = 2*k*σ/ma; min_periods defaults to
    max(10, n//2) like the reference (`tools/real_sliding_simple.py:170`).
    NaN warm-up rows are ffilled-then-zeroed by the caller's clean step."""
    mp = min_periods if min_periods is not None else max(10, n // 2)
    w = _frame(by, ts_col, n)
    ma = F.avg(src).over(w)
    sd = F.stddev_samp(src).over(w)
    cnt = F.count(src).over(w)
    width = F.when(
        (cnt >= mp) & (ma != 0), (2.0 * n_std * sd) / ma
    )
    return df.withColumn(out, width)


def roc_momentum(
    df: DataFrame,
    n: int = 14,
    src: str = "close",
    by: str = "entity",
    ts_col: str = "ts",
    out: str = "mom",
) -> DataFrame:
    w = Window.partitionBy(by).orderBy(ts_col)
    prev = F.lag(src, n).over(w)
    return df.withColumn(
        out, F.when(prev.isNotNull() & (prev != 0), F.col(src) / prev - 1.0)
    )


def realized_vol(
    df: DataFrame,
    windows: tuple[int, ...] = (20, 50, 100),
    src: str = "close",
    by: str = "entity",
    ts_col: str = "ts",
    prefix: str = "rv_win",
) -> DataFrame:
    wlag = Window.partitionBy(by).orderBy(ts_col)
    prev = F.lag(src, 1).over(wlag)
    out = df.withColumn(
        "_lr", F.when((prev > 0) & (F.col(src) > 0), F.log(F.col(src) / prev))
    )
    for n in windows:
        w = _frame(by, ts_col, n)
        out = out.withColumn(f"{prefix}{n}", F.stddev_samp("_lr").over(w))
    return out.drop("_lr")


def rolling_zscore(
    df: DataFrame,
    n: int,
    src: str,
    by: str = "entity",
    ts_col: str = "ts",
    out: str | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """z=(x-μ)/max(σ,eps) over a trailing n-row frame; population σ to
    match the reference's cumsum formulation
    (`step5_featueres_unified.py:157-196`)."""
    w = _frame(by, ts_col, n)
    mu = F.avg(src).over(w)
    sigma = F.stddev_pop(src).over(w)
    return df.withColumn(
        out or f"{src}_z{n}",
        (F.col(src) - mu) / F.greatest(sigma, F.lit(eps)),
    )


def rolling_volume_sum(
    df: DataFrame,
    steps: int,
    src: str = "volume",
    by: str = "entity",
    ts_col: str = "ts",
    out: str | None = None,
) -> DataFrame:
    w = _frame(by, ts_col, steps)
    return df.withColumn(out or f"{src}_sum{steps}", F.sum(src).over(w))


def true_range(
    high: Column, low: Column, prev_close: Column
) -> Column:
    """TR = max(h-l, |h-prev_c|, |l-prev_c|) — ATR's building block."""
    return F.greatest(
        high - low, F.abs(high - prev_close), F.abs(low - prev_close)
    )
