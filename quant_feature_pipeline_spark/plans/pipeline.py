"""End-to-end feature pipeline — the Spark re-expression of the
reference's Step2→Step5 chain (`/root/reference/unified_feature_pipeline.py:596-676`).

Stages (each a lazy DataFrame transformation; checkpointable between):

1. resample: base bars → one OHLCV table per timeframe (A1)
2. indicators: per-tf stateless window indicators + ONE recurrence
   applyInPandas stage (SURVEY.md §2.5)
3. merge: iterated backward as-of join of every larger tf onto the base
   axis, columns prefixed ``{tf}_`` (J1 + P6,
   `step4_merge_features.py:340-344, 522-535`)
4. features: sliding momentum on the base grid (W1), time encodings
   (W12), market state (W13), RSI normalization (W11), log return (W7),
   tanh compressions — the Step5 feature family
   (`step5_featueres_unified.py:689-745`)

The token payload (``tokens`` array) rides through every stage untouched
when present (north-rule passthrough invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig, steps_between, tf_seconds
from ..functions.indicators import bollinger_width, realized_vol, roc_momentum, sma
from ..functions.normalize import market_state, tanh_compress
from ..functions.recurrence import compute_recurrence_indicators
from ..functions.timefeat import time_encodings
from ..operators.asof import asof_join
from ..operators.resample import resample_ohlcv
from ..operators.shift import log_return

OHLCV = ("open", "high", "low", "close", "volume")


def indicator_table(
    bars_tf: DataFrame, cfg: PipelineConfig, by: str = "entity", ts_col: str = "ts"
) -> DataFrame:
    """Step3 equivalent: full indicator set for one timeframe table."""
    df = sma(bars_tf, cfg.sma_windows, by=by, ts_col=ts_col)
    df = bollinger_width(df, cfg.bb_window, cfg.bb_std, by=by, ts_col=ts_col)
    df = roc_momentum(df, cfg.mom_window, by=by, ts_col=ts_col)
    df = realized_vol(df, cfg.rv_windows, by=by, ts_col=ts_col)
    df = compute_recurrence_indicators(df, cfg, by=by, ts_col=ts_col)
    return df


def resample_all(
    bars: DataFrame, cfg: PipelineConfig, by: str = "entity", ts_col: str = "ts"
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for tf in cfg.resample_targets:
        out[tf] = resample_ohlcv(bars, tf, by=by, ts_col=ts_col).drop("bar_count")
    return out


def merge_timeframes(
    base: DataFrame,
    indicator_tables: dict[str, DataFrame],
    cfg: PipelineConfig,
    by: str = "entity",
    ts_col: str = "ts",
    asof_strategy: str = "union_ffill",
) -> DataFrame:
    """Step4 equivalent: as-of join each tf's indicators (OHLCV dropped,
    P2) onto the base axis with ``{tf}_`` prefixes."""
    merged = base
    for tf, ind in indicator_tables.items():
        right = ind.drop(*[c for c in OHLCV if c in ind.columns])
        merged = asof_join(
            merged,
            right,
            on=ts_col,
            by=by,
            direction=cfg.align_direction,
            allow_exact_matches=cfg.allow_exact_match,
            tolerance_s=(cfg.tolerance_ms / 1000.0) if cfg.tolerance_ms else None,
            right_prefix=f"{tf}_",
            strategy=asof_strategy,
        ).drop(f"{tf}_matched_{ts_col}")
    return merged


def feature_table(
    merged: DataFrame, cfg: PipelineConfig, by: str = "entity", ts_col: str = "ts"
) -> DataFrame:
    """Step5 equivalent: the normalized feature family on the merged
    wide table. Emits per-tf ``{tf}_market_state/{tf}_mom_n/{tf}_rsi_n``
    plus time encodings and the base log return."""
    df = merged
    base_tf = cfg.resample_targets[0]
    for tf in cfg.resample_targets:
        st = f"{tf}_supertrend_direction"
        if st in df.columns:
            df = df.withColumn(f"{tf}_market_state", market_state(F.col(st)))
        mom = f"{tf}_mom"
        if mom in df.columns:
            df = df.withColumn(
                f"{tf}_mom_n", tanh_compress(F.coalesce(F.col(mom), F.lit(0.0)), cfg.mom_tanh_scale)
            )
        rsi = f"{tf}_rsi{cfg.rsi_window}"
        if rsi in df.columns:
            # reshaped [-100,100] → [-1,1] via /80 clip (reference divisor 80,
            # `step5_featueres_unified.py:942-946`)
            df = df.withColumn(
                f"{tf}_rsi_n",
                F.least(
                    F.greatest(F.coalesce(F.col(rsi), F.lit(0.0)) / 80.0, F.lit(-1.0)),
                    F.lit(1.0),
                ),
            )
    df = time_encodings(df, ts_col=ts_col)
    df = log_return(df, src="close", out=f"ret_{base_tf}_log", by=by, ts_col=ts_col)
    return df


def run_pipeline(
    bars: DataFrame,
    cfg: PipelineConfig | None = None,
    by: str = "entity",
    ts_col: str = "ts",
    asof_strategy: str = "union_ffill",
) -> DataFrame:
    """bars(1-row-per-base-step) → wide feature table on the base axis."""
    cfg = cfg or PipelineConfig()
    tfs = resample_all(bars, cfg, by=by, ts_col=ts_col)
    base = tfs[cfg.resample_targets[0]]
    # token payload passthrough: re-attach payload columns of the base
    # grid rows if the input carried them (exact ts match on base axis)
    inds = {
        tf: indicator_table(df, cfg, by=by, ts_col=ts_col)
        for tf, df in tfs.items()
    }
    merged = merge_timeframes(base, inds, cfg, by=by, ts_col=ts_col, asof_strategy=asof_strategy)
    return feature_table(merged, cfg, by=by, ts_col=ts_col)
