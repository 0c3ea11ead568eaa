"""W4 — rolling percentile rank, the reference's one custom JIT kernel.

Semantics (`/root/reference/step5_featueres_unified.py:104-154`): for each
row, the mid-rank of the current value within the trailing ``window``
values: ``(count_less + 0.5*count_equal)/count``, clipped to
[0.01, 0.99]; warm-up (fewer than ``min_periods`` values) → NaN.

No Spark built-in computes a rolling rank, so this is a grouped
``applyInPandas`` stage with an O(N·W) vectorized numpy kernel (a
sliding-window broadcast compare, chunked to bound memory) — the Spark
analog of the reference's numba kernel. Bounded windows keep the cost
linear in N at fixed W (SURVEY.md §7.3.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _rank_kernel(x: np.ndarray, window: int, min_periods: int) -> np.ndarray:
    """Fully vectorized O(N·W): NaN-pad the head so sliding_window_view
    covers EVERY row (warm-up rows see leading NaNs, which the validity
    mask drops — identical to an expanding window), then broadcast
    compare in chunks of ~4M cells — the numpy analog of the reference's
    numba kernel (`step5_featueres_unified.py:103-127`)."""
    n = len(x)
    out = np.full(n, np.nan)
    if n == 0:
        return out
    with np.errstate(invalid="ignore"):
        padded = np.concatenate([np.full(window - 1, np.nan), x])
        sw = np.lib.stride_tricks.sliding_window_view(padded, window)
        chunk = max(1, (1 << 22) // window)  # ~4M cells per chunk
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            blk = sw[s:e]
            c = x[s:e, None]
            valid = ~np.isnan(blk)
            cnt = valid.sum(axis=1)
            less = ((blk < c) & valid).sum(axis=1)
            equal = ((blk == c) & valid).sum(axis=1)
            ok = (cnt >= min_periods) & ~np.isnan(x[s:e])
            vals = (less + 0.5 * equal) / np.maximum(cnt, 1)
            out[s:e] = np.where(ok, vals, np.nan)
    return np.clip(out, 0.01, 0.99, out=out)


def rolling_rank_series(s: pd.Series, window: int, min_periods: int | None = None) -> pd.Series:
    """Single-series oracle/kernel (vectorized-enough; see _rank_kernel)."""
    mp = min_periods if min_periods is not None else max(2, window // 2)
    return pd.Series(
        _rank_kernel(s.to_numpy(dtype=np.float64), window, mp), index=s.index
    )


def rolling_percentile_rank(
    df: DataFrame,
    src: str,
    window: int,
    by: str = "entity",
    ts_col: str = "ts",
    out: str | None = None,
    min_periods: int | None = None,
) -> DataFrame:
    out_name = out or f"{src}_rank{window}"
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_name, T.DoubleType(), True)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        pdf[out_name] = rolling_rank_series(pdf[src], window, min_periods)
        return pdf

    from .grouped import array_partition_fn, grouped_apply

    mp = min_periods if min_periods is not None else max(2, window // 2)
    partition_fn = array_partition_fn(
        by, ts_col, [src],
        lambda sl: {out_name: _rank_kernel(sl[src], window, mp)},
        [out_name], [f.name for f in schema.fields],
        auto_chunk_rows=1_048_576, chunk_rows=262_144,
        warmup_rows=max(4_096, window),
    )
    # lookback_rows: rank is a HARD window — auto-chunking must replay
    # >= window-1 rows or boundary rows silently corrupt (ADVICE r4)
    return grouped_apply(
        df, by, fn, schema, ts_col=ts_col, lookback_rows=window,
        partition_fn=partition_fn,
    )


def rolling_rank_multi(
    df: DataFrame,
    specs: list[tuple[str, int, int, str]],
    by: str = "entity",
    ts_col: str = "ts",
    prepartitioned: bool = False,
) -> DataFrame:
    """Many rolling ranks in ONE grouped Arrow stage.

    ``specs`` = [(src_col, window, min_periods, out_col), ...]. The
    flagship contract needs 24 rank kernels (4 tfs × {atr, bb_width,
    volume} × fast/slow); computing them in a single grouped pass costs
    one shuffle+sort instead of 24 (`step5_featueres_unified.py:547-587,
    810-883` run the same kernels serially over one in-memory frame)."""
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out, T.DoubleType(), True) for _, _, _, out in specs]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        new = {}
        for src, window, mp, out in specs:
            new[out] = _rank_kernel(pdf[src].to_numpy(np.float64), window, mp)
        return pd.concat([pdf, pd.DataFrame(new, index=pdf.index)], axis=1)

    from .grouped import array_partition_fn, grouped_apply

    max_w = max(w for _, w, _, _ in specs)
    partition_fn = array_partition_fn(
        by, ts_col, sorted({s[0] for s in specs}),
        lambda sl: {
            out: _rank_kernel(sl[src], window, mp)
            for src, window, mp, out in specs
        },
        [s[3] for s in specs], [f.name for f in schema.fields],
        auto_chunk_rows=1_048_576, chunk_rows=262_144,
        warmup_rows=max(4_096, max_w),
    )
    return grouped_apply(
        df, by, fn, schema, ts_col=ts_col,
        lookback_rows=max_w,
        prepartitioned=prepartitioned,
        partition_fn=partition_fn,
    )


def fused_rank(
    df: DataFrame,
    src: str,
    fast_window: int,
    slow_window: int,
    fast_weight: float = 0.6,
    by: str = "entity",
    ts_col: str = "ts",
    out: str | None = None,
) -> DataFrame:
    """W10 fused fast/slow rank: 0.6*rank(fast)+0.4*rank(slow)
    (`step5_featueres_unified.py:547-587`). One grouped stage, two kernels."""
    out_name = out or f"{src}_fused_rank"
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_name, T.DoubleType(), True)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        fr = rolling_rank_series(pdf[src], fast_window)
        sr = rolling_rank_series(pdf[src], slow_window)
        pdf[out_name] = fast_weight * fr + (1.0 - fast_weight) * sr
        return pdf

    from .grouped import grouped_apply

    return grouped_apply(
        df, by, fn, schema, ts_col=ts_col,
        lookback_rows=max(fast_window, slow_window),
    )
