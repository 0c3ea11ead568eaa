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


# ---- direct Cython ewm (r6 optimization, guide §4.2) -------------------
# pandas' Series.ewm(...).mean() pays ~0.15 ms of Series/em-window object
# construction PER CALL; the flagship runs ~15 ewm calls per (entity, tf)
# group, which dominates the whole indicator stage when groups are small
# (measured: 4.75 ms/group of 66 rows at sf0.1 — ~70% pandas overhead,
# ~7 s single-threaded for 6000 groups). Calling the underlying Cython
# aggregation directly on the float64 array is BIT-IDENTICAL (it is the
# exact code Series.ewm dispatches to, with the same com/minp/deltas
# arguments) and skips all of it. Guarded import: any pandas that
# renames the private module falls back to the Series path.
try:
    from pandas._libs.window.aggregations import ewm as _ewm_cython
except ImportError:  # pragma: no cover - pinned pandas always has it
    _ewm_cython = None


def _ewm_arr(x: np.ndarray, com: float) -> np.ndarray:
    """adjust=False, ignore_na=False, min_periods<=1 EWM over one array —
    bit-identical to pd.Series(x).ewm(com=com, adjust=False).mean()
    (asserted over real data in tests/test_kernel_numpy.py)."""
    n = len(x)
    if _ewm_cython is None:  # fallback: the reference pandas path
        return pd.Series(x).ewm(com=com, adjust=False).mean().to_numpy()
    start = np.zeros(1, dtype=np.int64)
    end = np.full(1, n, dtype=np.int64)
    deltas = np.ones(max(n - 1, 0), dtype=np.float64)
    return _ewm_cython(x, start, end, 1, com, False, False, deltas, True)


def _span_com(span: int) -> float:
    return (span - 1) / 2  # exactly how pandas derives com from span


def _alpha_com(n: float) -> float:
    # pandas derives com from alpha as 1/alpha - 1 IN FLOATING POINT;
    # float(n - 1) would differ in the last ulp for e.g. n=14 and break
    # bit-equality with the Series path
    alpha = 1.0 / n
    return 1.0 / alpha - 1.0


def _wilder_arr(x: np.ndarray, n: int) -> np.ndarray:
    return _ewm_arr(x, _alpha_com(n))


def _rsi_wilder_arr(c: np.ndarray, n: int) -> np.ndarray:
    """Array twin of rsi_wilder — same op order, bit-identical."""
    m = len(c)
    d = np.empty(m, dtype=np.float64)
    if m:
        d[0] = np.nan
        np.subtract(c[1:], c[:-1], out=d[1:])
    gain = np.where(d < 0.0, 0.0, d)  # clip(lower=0): NaN stays NaN
    neg = -d
    loss = np.where(neg < 0.0, 0.0, neg)
    ag = _wilder_arr(np.where(np.isnan(gain), 0.0, gain), n)
    al = _wilder_arr(np.where(np.isnan(loss), 0.0, loss), n)
    with np.errstate(invalid="ignore", divide="ignore"):
        rs = ag / np.where(al == 0.0, np.nan, al)
        rsi = 100.0 - 100.0 / (1.0 + rs)
    rsi = np.where(al != 0.0, rsi, 100.0)
    if m:
        rsi[0] = np.nan  # first diff undefined
    return rsi


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


def _run_len(mask: np.ndarray) -> np.ndarray:
    # consecutive-True counter, vectorized gaps-and-islands
    idx = np.arange(len(mask))
    start = np.where(mask & ~np.concatenate(([False], mask[:-1])), idx, -1)
    start = np.maximum.accumulate(np.where(mask, start, idx + 1))
    return np.where(mask, idx - start + 1, 0)


def _rsi_events_arr(
    rsi_reshaped: np.ndarray, threshold: float, min_persist: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Array twin of rsi_events (NaN compares False, like the Series
    comparison + fillna(False))."""
    with np.errstate(invalid="ignore"):
        ob = rsi_reshaped >= threshold
        os_ = rsi_reshaped <= -threshold
    ob_persist = _run_len(ob) >= min_persist
    os_persist = _run_len(os_) >= min_persist
    event = np.where(ob_persist, 1.0, np.where(os_persist, -1.0, 0.0))
    return event, ob_persist.astype(np.float64), os_persist.astype(np.float64)


def supertrend_direction(
    high: np.ndarray, low: np.ndarray, close: np.ndarray, atr: np.ndarray, mult: float
) -> np.ndarray:
    """Path-dependent SuperTrend direction scan (period folded into atr)."""
    n = len(close)
    hl2 = (high + low) / 2.0
    # plain-python lists: a scalar loop over numpy elements pays ~5-10x
    # boxing overhead per access; tolist() once keeps the loop cheap
    up = (hl2 + mult * atr).tolist()
    dn = (hl2 - mult * atr).tolist()
    c = close.tolist()
    direction = np.ones(n)
    d_prev = 1.0
    f_up_prev = up[0] if n else 0.0
    f_dn_prev = dn[0] if n else 0.0
    for i in range(1, n):
        ui, di, ci_prev, ci = up[i], dn[i], c[i - 1], c[i]
        f_up = ui if (ui < f_up_prev or ci_prev > f_up_prev) else f_up_prev
        f_dn = di if (di > f_dn_prev or ci_prev < f_dn_prev) else f_dn_prev
        if d_prev > 0:
            d = -1.0 if ci < f_dn else 1.0
        else:
            d = 1.0 if ci > f_up else -1.0
        direction[i] = d
        d_prev, f_up_prev, f_dn_prev = d, f_up, f_dn
    return direction


def indicator_frame_ref(
    pdf: pd.DataFrame, cfg: PipelineConfig, ts_col: str = "ts"
) -> pd.DataFrame:
    """Single-entity, ts-sorted pandas REFERENCE kernel — the
    Series-based formulation, kept verbatim as the oracle the optimized
    array kernel (indicator_frame) is asserted bit-identical against
    (tests/test_kernel_numpy.py).

    All derived columns are assembled in a dict and concatenated once:
    per-column insertion into a wide DataFrame churns the pandas block
    manager (measured ~4x slower at 80k-row groups).
    """
    pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
    c = pdf["close"].astype(np.float64)
    h = pdf["high"].astype(np.float64)
    low = pdf["low"].astype(np.float64)
    new: dict[str, object] = {}

    for span in cfg.ema_spans:
        new[f"ema_{span}"] = c.ewm(span=span, adjust=False).mean()

    raw_rsi = rsi_wilder(c, cfg.rsi_window)
    reshaped = (raw_rsi - 50.0) * 2.0
    new[f"rsi{cfg.rsi_window}"] = reshaped
    ev, ob, os_ = rsi_events(reshaped, cfg.rsi_event_threshold, cfg.rsi_min_persist)
    new["rsi_event"] = ev
    new["rsi_overbought"] = ob
    new["rsi_oversold"] = os_

    ema_fast = c.ewm(span=cfg.macd_fast, adjust=False).mean()
    ema_slow = c.ewm(span=cfg.macd_slow, adjust=False).mean()
    macd = ema_fast - ema_slow
    signal = macd.ewm(span=cfg.macd_signal, adjust=False).mean()
    new["macd"] = macd
    new["macd_signal"] = signal
    new["macd_histogram"] = macd - signal

    prev_c = c.shift(1)
    hl = (h - low).to_numpy()
    tr_np = np.maximum(
        hl,
        np.maximum(
            np.abs((h - prev_c).to_numpy()), np.abs((low - prev_c).to_numpy())
        ),
    )
    tr_np = np.where(np.isnan(tr_np), hl, tr_np)
    tr = pd.Series(tr_np, index=c.index)
    atr = _wilder(tr, cfg.atr_window)
    new[f"atr{cfg.atr_window}"] = atr
    new[f"atr{cfg.atr_window}_pct"] = np.where(c > 0, atr / c, np.nan)

    st_atr = _wilder(tr, cfg.supertrend_period).to_numpy()
    new["supertrend_direction"] = supertrend_direction(
        h.to_numpy(), low.to_numpy(), c.to_numpy(), st_atr, cfg.supertrend_mult
    )
    return pd.concat([pdf, pd.DataFrame(new, index=pdf.index)], axis=1)


def _indicator_arrays(
    c: np.ndarray, h: np.ndarray, low: np.ndarray, cfg: PipelineConfig
) -> dict[str, np.ndarray]:
    """The per-group indicator math on plain float64 arrays (ts-sorted).
    Same op order per element as indicator_frame_ref — bit-identical."""
    m = len(c)
    new: dict[str, np.ndarray] = {}

    for span in cfg.ema_spans:
        new[f"ema_{span}"] = _ewm_arr(c, _span_com(span))

    reshaped = (_rsi_wilder_arr(c, cfg.rsi_window) - 50.0) * 2.0
    new[f"rsi{cfg.rsi_window}"] = reshaped
    ev, ob, os_ = _rsi_events_arr(
        reshaped, cfg.rsi_event_threshold, cfg.rsi_min_persist
    )
    new["rsi_event"] = ev
    new["rsi_overbought"] = ob
    new["rsi_oversold"] = os_

    ema_fast = _ewm_arr(c, _span_com(cfg.macd_fast))
    ema_slow = _ewm_arr(c, _span_com(cfg.macd_slow))
    macd = ema_fast - ema_slow
    signal = _ewm_arr(macd, _span_com(cfg.macd_signal))
    new["macd"] = macd
    new["macd_signal"] = signal
    new["macd_histogram"] = macd - signal

    prev_c = np.empty(m, dtype=np.float64)
    if m:
        prev_c[0] = np.nan
        prev_c[1:] = c[:-1]
    hl = h - low
    tr_np = np.maximum(
        hl, np.maximum(np.abs(h - prev_c), np.abs(low - prev_c))
    )
    tr_np = np.where(np.isnan(tr_np), hl, tr_np)
    atr = _wilder_arr(tr_np, cfg.atr_window)
    new[f"atr{cfg.atr_window}"] = atr
    with np.errstate(invalid="ignore", divide="ignore"):
        new[f"atr{cfg.atr_window}_pct"] = np.where(c > 0, atr / c, np.nan)

    st_atr = _wilder_arr(tr_np, cfg.supertrend_period)
    new["supertrend_direction"] = supertrend_direction(
        h, low, c, st_atr, cfg.supertrend_mult
    )
    return new


def indicator_frame(pdf: pd.DataFrame, cfg: PipelineConfig, ts_col: str = "ts") -> pd.DataFrame:
    """Single-entity, ts-sorted indicator kernel — optimized array form.

    Same math, same op order per element as indicator_frame_ref, but on
    plain float64 arrays with the EWM recurrences dispatched straight to
    pandas' Cython aggregation (guide §4.2: hand whole batches to native
    code). This removes the ~15 Series/ewm-object constructions per
    group that dominate small-group cost (measured 4.75 -> ~1.2 ms per
    66-row group; bit-identical output asserted in
    tests/test_kernel_numpy.py over every sf0.1 entity)."""
    pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
    new = _indicator_arrays(
        pdf["close"].to_numpy(dtype=np.float64),
        pdf["high"].to_numpy(dtype=np.float64),
        pdf["low"].to_numpy(dtype=np.float64),
        cfg,
    )
    return pd.concat([pdf, pd.DataFrame(new, index=pdf.index)], axis=1)


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
    chunk_rows: int | None = None,
    warmup_rows: int = 4_096,
    metrics=None,
    auto_chunk_rows: int | None = 1_048_576,
    local_chunk_rows: int = 262_144,
    prepartitioned: bool = False,
) -> DataFrame:
    """Runs as grouped_apply (explicit hash repartition + mapInPandas),
    NOT groupBy().applyInPandas: FlatMapGroupsInPandas reports unknown
    output partitioning, which forces Catalyst to re-exchange the WIDE
    indicator output for every downstream window/join — mapInPandas
    preserves the (narrow, pre-stage) entity partitioning, so the later
    window indicators and the as-of merge need no further exchange.

    ``chunk_rows`` opts into grouped_apply_chunked for corpora where a
    single entity's history exceeds task memory: the entity is split
    into warm-up-overlapped chunks that process in parallel (default
    warmup 4096 rows drives the slowest recurrence seed error — span-200
    EMA — below float64 ulp; see grouped.py)."""
    cfg = cfg or PipelineConfig()
    out_schema = recurrence_output_schema(bars.schema, cfg)
    out_cols = [f.name for f in out_schema.fields]
    in_cols = [f.name for f in bars.schema.fields]
    ind_cols = [c for c in out_cols if c not in in_cols]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        res = indicator_frame(pdf, cfg, ts_col=ts_col)
        return res[out_cols]

    from .grouped import grouped_apply, grouped_apply_chunked

    if chunk_rows is not None:
        return grouped_apply_chunked(
            bars, by, ts_col, fn, out_schema,
            chunk_rows=chunk_rows, warmup_rows=warmup_rows,
        )

    from .grouped import array_partition_fn

    # whole-partition array kernel (r6, guide §4.2): one stable (by, ts)
    # sort per partition, the array kernel per contiguous group slice —
    # no pandas groupby, no per-group DataFrame/concat churn (the
    # assembly was ~60% of kernel wall once the EWMs went through the
    # Cython fast path); bit-identical, asserted in tests
    partition_fn = array_partition_fn(
        by, ts_col, ["close", "high", "low"],
        lambda sl: _indicator_arrays(sl["close"], sl["high"], sl["low"], cfg),
        ind_cols, out_cols,
        auto_chunk_rows, local_chunk_rows, warmup_rows,
    )

    # ts_col enables the local huge-entity auto-chunking inside the
    # Arrow task (bounded fn working set, no caller opt-in; grouped.py)
    # prepartitioned: caller guarantees entity-complete partitions (the
    # pipeline's one up-front repartition) — skips this stage's shuffle
    return grouped_apply(
        bars, by, fn, out_schema, metrics=metrics,
        ts_col=ts_col, warmup_rows=warmup_rows,
        auto_chunk_rows=auto_chunk_rows, chunk_rows=local_chunk_rows,
        prepartitioned=prepartitioned,
        partition_fn=partition_fn,
    )
