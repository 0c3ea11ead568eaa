"""Stateful recurrence indicators — one vectorized ``applyInPandas`` stage.

EMA-family recurrences (e_t = α·x_t + (1-α)·e_{t-1}) are inherently
sequential per entity and not expressible as Spark window aggregates, so
they run as ONE grouped Arrow-batched pandas stage per entity (never
per-row Python), exactly as the north rule mandates. Inside the group
everything is vectorized ``Series.ewm(..., adjust=False)`` / numpy; the
only scalar loop is SuperTrend's band-flip scan (path-dependent by
definition — the reference's external `IndicatorCalculator` does the
same, `/root/reference/indicators.py:1-3`).

Reproduced semantics (SURVEY.md §2.5 indicator table; parameters from
`/root/reference/congfigs/base_indicators.yaml`):

- EMA spans [7,9,12,20,26,55,100,200]: ``ewm(span, adjust=False)``
- RSI Wilder window 14: gains/losses smoothed with ``ewm(alpha=1/n,
  adjust=False)``; output reshaped to [-100,100] via (rsi-50)*2
  (`📊 重塑 rsi.md`); events: ±threshold on the reshaped axis with
  run-length >= min_persist → {-1,0,+1} + binary ob/os columns
  (`step5_featueres_unified.py:1027-1065`)
- MACD 12/26/9: ema_fast-ema_slow, signal=EMA9(macd), histogram
- ATR 14: Wilder-smoothed true range; atr_pct = atr/close
  (`step5_featueres_unified.py:816-823`)
- SuperTrend (10, 3.0): direction ∈ {-1,+1}
- warm-up: first row seeds the recurrence (pandas adjust=False), no
  look-ahead anywhere.

Partition-boundary discipline: groups are whole entities (the group IS
the unit of state). Incremental runs must replay a warm-up tail before
the resume point (plans/checkpoint.py), mirroring the reference's
warm-start (`step2_resample.py:370-397`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import PipelineConfig


def _wilder(s: pd.Series, n: int) -> pd.Series:
    return s.ewm(alpha=1.0 / n, adjust=False).mean()


def rsi_wilder(close: pd.Series, n: int = 14) -> pd.Series:
    """Raw Wilder RSI in [0,100]."""
    d = close.diff()
    gain = d.clip(lower=0.0)
    loss = (-d).clip(lower=0.0)
    ag = _wilder(gain.fillna(0.0), n)
    al = _wilder(loss.fillna(0.0), n)
    rs = ag / al.replace(0.0, np.nan)
    rsi = 100.0 - 100.0 / (1.0 + rs)
    rsi = rsi.where(al != 0, 100.0)
    rsi.iloc[: 1] = np.nan  # first diff undefined
    return rsi


def rsi_events(
    rsi_reshaped: pd.Series, threshold: float, min_persist: int
) -> tuple[pd.Series, pd.Series, pd.Series]:
    """Run-length-filtered RSI events on the [-100,100] axis.

    overbought mask = rsi' >= +threshold; oversold = rsi' <= -threshold;
    an event fires only when the mask has been true for >= min_persist
    consecutive bars (`step5_featueres_unified.py:1045-1064`).
    """
    ob = (rsi_reshaped >= threshold).fillna(False).to_numpy()
    os_ = (rsi_reshaped <= -threshold).fillna(False).to_numpy()

    def run_len(mask: np.ndarray) -> np.ndarray:
        # consecutive-True counter, vectorized gaps-and-islands
        idx = np.arange(len(mask))
        start = np.where(mask & ~np.concatenate(([False], mask[:-1])), idx, -1)
        start = np.maximum.accumulate(np.where(mask, start, idx + 1))
        return np.where(mask, idx - start + 1, 0)

    ob_persist = run_len(ob) >= min_persist
    os_persist = run_len(os_) >= min_persist
    event = np.where(ob_persist, 1.0, np.where(os_persist, -1.0, 0.0))
    return (
        pd.Series(event, index=rsi_reshaped.index),
        pd.Series(ob_persist.astype(np.float64), index=rsi_reshaped.index),
        pd.Series(os_persist.astype(np.float64), index=rsi_reshaped.index),
    )


def supertrend_direction(
    high: np.ndarray, low: np.ndarray, close: np.ndarray, atr: np.ndarray, mult: float
) -> np.ndarray:
    """Path-dependent SuperTrend direction scan (period folded into atr)."""
    n = len(close)
    hl2 = (high + low) / 2.0
    up = hl2 + mult * atr
    dn = hl2 - mult * atr
    direction = np.ones(n)
    f_up = np.copy(up)
    f_dn = np.copy(dn)
    for i in range(1, n):
        f_up[i] = up[i] if (up[i] < f_up[i - 1] or close[i - 1] > f_up[i - 1]) else f_up[i - 1]
        f_dn[i] = dn[i] if (dn[i] > f_dn[i - 1] or close[i - 1] < f_dn[i - 1]) else f_dn[i - 1]
        if direction[i - 1] > 0:
            direction[i] = -1.0 if close[i] < f_dn[i] else 1.0
        else:
            direction[i] = 1.0 if close[i] > f_up[i] else -1.0
    return direction


def indicator_frame(pdf: pd.DataFrame, cfg: PipelineConfig, ts_col: str = "ts") -> pd.DataFrame:
    """Single-entity, ts-sorted pandas kernel — also the test oracle."""
    pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
    c = pdf["close"].astype(np.float64)
    h = pdf["high"].astype(np.float64)
    low = pdf["low"].astype(np.float64)

    for span in cfg.ema_spans:
        pdf[f"ema_{span}"] = c.ewm(span=span, adjust=False).mean()

    raw_rsi = rsi_wilder(c, cfg.rsi_window)
    reshaped = (raw_rsi - 50.0) * 2.0
    pdf[f"rsi{cfg.rsi_window}"] = reshaped
    ev, ob, os_ = rsi_events(reshaped, cfg.rsi_event_threshold, cfg.rsi_min_persist)
    pdf["rsi_event"] = ev
    pdf["rsi_overbought"] = ob
    pdf["rsi_oversold"] = os_

    ema_fast = c.ewm(span=cfg.macd_fast, adjust=False).mean()
    ema_slow = c.ewm(span=cfg.macd_slow, adjust=False).mean()
    macd = ema_fast - ema_slow
    pdf["macd"] = macd
    pdf["macd_signal"] = macd.ewm(span=cfg.macd_signal, adjust=False).mean()
    pdf["macd_histogram"] = pdf["macd"] - pdf["macd_signal"]

    prev_c = c.shift(1)
    tr = pd.concat(
        [h - low, (h - prev_c).abs(), (low - prev_c).abs()], axis=1
    ).max(axis=1)
    atr = _wilder(tr.fillna(h - low), cfg.atr_window)
    pdf[f"atr{cfg.atr_window}"] = atr
    pdf[f"atr{cfg.atr_window}_pct"] = np.where(c > 0, atr / c, np.nan)

    st_atr = _wilder(tr.fillna(h - low), cfg.supertrend_period).to_numpy()
    pdf["supertrend_direction"] = supertrend_direction(
        h.to_numpy(), low.to_numpy(), c.to_numpy(), st_atr, cfg.supertrend_mult
    )
    return pdf


def recurrence_output_schema(input_schema: T.StructType, cfg: PipelineConfig) -> T.StructType:
    fields = list(input_schema.fields)
    names = [f"ema_{s}" for s in cfg.ema_spans]
    names += [
        f"rsi{cfg.rsi_window}",
        "rsi_event",
        "rsi_overbought",
        "rsi_oversold",
        "macd",
        "macd_signal",
        "macd_histogram",
        f"atr{cfg.atr_window}",
        f"atr{cfg.atr_window}_pct",
        "supertrend_direction",
    ]
    for n in names:
        fields.append(T.StructField(n, T.DoubleType(), True))
    return T.StructType(fields)


def compute_recurrence_indicators(
    bars: DataFrame,
    cfg: PipelineConfig | None = None,
    by: str = "entity",
    ts_col: str = "ts",
) -> DataFrame:
    cfg = cfg or PipelineConfig()
    out_schema = recurrence_output_schema(bars.schema, cfg)
    out_cols = [f.name for f in out_schema.fields]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        res = indicator_frame(pdf, cfg, ts_col=ts_col)
        return res[out_cols]

    return bars.groupBy(by).applyInPandas(fn, schema=out_schema)
