"""Flagship 45-feature contract vs a pandas first-principles oracle.

The oracle recomputes the normalization chain (`step5_featueres_unified.py`
band_width/volume/atr/return governance) from the MERGED frame with an
independent loop-based rank kernel, so it cross-checks everything
`plans/flagship.py` adds on top of the already-tested pipeline stages.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_spark.config import PipelineConfig, tf_seconds
from quant_feature_pipeline_spark.plans.flagship import (
    ATR_CALIB_P,
    ATR_CALIB_TARGET,
    ATR_CLIP_P,
    FUSE_W_FAST,
    RANK_FAST_BASE,
    RANK_SLOW_BASE,
    RET_TANH_FACTOR,
    RET_WINSOR_P,
    SHRINK_EPS,
    VOL_RANK_BASE,
    flagship_feature_names,
    flagship_health,
    run_flagship,
    run_flagship_contract,
)
from quant_feature_pipeline_spark.plans.pipeline import (
    indicator_table,
    merge_timeframes,
    resample_all,
)

from .conftest import make_bars_pdf

CFG = PipelineConfig(base_tf="1m", resample_targets=("1m", "5m", "15m"))


def naive_rank(x: np.ndarray, window: int) -> np.ndarray:
    """Reference pure-python rolling mid-rank (`step5:128-152`)."""
    out = np.zeros(len(x))
    for i in range(len(x)):
        w = x[max(0, i - window + 1) : i + 1]
        less = np.sum(w < x[i])
        equal = np.sum(w == x[i])
        out[i] = min(max((less + 0.5 * equal) / len(w), 0.01), 0.99)
    return out


@pytest.fixture(scope="module")
def flagship_frames(spark):
    bars = spark.createDataFrame(make_bars_pdf(n=700, entities=("A", "B"), freq_s=60))
    wide = run_flagship(bars, CFG).toPandas()
    tfs = resample_all(bars, CFG)
    inds = {tf: indicator_table(df, CFG) for tf, df in tfs.items()}
    merged = merge_timeframes(
        tfs[CFG.resample_targets[0]], inds, CFG, keep_right_cols=("close",)
    ).toPandas()
    return wide, merged


def test_contract_shape_and_names(flagship_frames):
    wide, _ = flagship_frames
    names = flagship_feature_names(CFG)
    # 3 tfs x 7 + 3 rsi-tfs x 4 + 4 time + 1 ret
    assert len(names) == 3 * 7 + 3 * 4 + 4 + 1
    assert list(wide.columns) == ["entity", "ts"] + names
    assert len(flagship_feature_names(PipelineConfig())) == 45


def _merged_sorted(merged: pd.DataFrame, entity: str) -> pd.DataFrame:
    g = merged[merged["entity"] == entity].sort_values("ts").reset_index(drop=True)
    return g


def test_volume_feature_oracle(flagship_frames):
    wide, merged = flagship_frames
    for tf in CFG.resample_targets:
        mult = tf_seconds(tf) // tf_seconds(CFG.base_tf)
        for e in ("A", "B"):
            g = _merged_sorted(merged, e)
            vol_syn = (
                pd.Series(g["volume"]).fillna(0.0).rolling(mult, min_periods=1).sum()
            )
            expect = naive_rank(
                np.log1p(np.maximum(vol_syn.to_numpy(), 0.0)), VOL_RANK_BASE * mult
            )
            got = (
                wide[wide["entity"] == e]
                .sort_values("ts")[f"{tf}_volume"]
                .to_numpy()
            )
            np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)


def test_bb_width_feature_oracle(flagship_frames):
    wide, merged = flagship_frames
    tf = CFG.resample_targets[1]
    mult = tf_seconds(tf) // tf_seconds(CFG.base_tf)
    for e in ("A", "B"):
        g = _merged_sorted(merged, e)
        bw = np.log1p(np.maximum(g[f"{tf}_bb_width"].fillna(0.0).to_numpy(), 0.0))
        fused = FUSE_W_FAST * naive_rank(bw, RANK_FAST_BASE * mult) + (
            1 - FUSE_W_FAST
        ) * naive_rank(bw, RANK_SLOW_BASE * mult)
        expect = fused * (1 - 2 * SHRINK_EPS) + SHRINK_EPS
        got = wide[wide["entity"] == e].sort_values("ts")[f"{tf}_bb_width"].to_numpy()
        np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)


def test_atr_feature_oracle(flagship_frames):
    wide, merged = flagship_frames
    tf = CFG.resample_targets[0]
    mult = 1
    m = merged.sort_values(["entity", "ts"])
    x_all = np.log1p(np.maximum(m[f"{tf}_atr14_pct"].fillna(0.0).to_numpy(), 0.0))
    lo, hi = np.percentile(x_all, [ATR_CLIP_P[0] * 100, ATR_CLIP_P[1] * 100])
    fused_all = []
    for e, g in m.groupby("entity", sort=True):
        x = np.log1p(np.maximum(g[f"{tf}_atr14_pct"].fillna(0.0).to_numpy(), 0.0))
        if hi > lo:
            x = np.clip(x, lo, hi)
        fused_all.append(
            FUSE_W_FAST * naive_rank(x, RANK_FAST_BASE * mult)
            + (1 - FUSE_W_FAST) * naive_rank(x, RANK_SLOW_BASE * mult)
        )
    fused = np.concatenate(fused_all)
    q = float(np.clip(np.quantile(fused, ATR_CALIB_P), 1e-6, 1 - 1e-6))
    gamma = 1.0 if abs(1 - q) < 1e-6 else max(math.log(ATR_CALIB_TARGET) / math.log(q), 1e-6)
    expect = np.clip(
        np.power(np.clip(fused, 0, 1), gamma), SHRINK_EPS, 1 - SHRINK_EPS
    )
    got = wide.sort_values(["entity", "ts"])[f"{tf}_atr_pct"].to_numpy()
    # percentile interpolation differs slightly between Spark and numpy at
    # small n; the clip bounds and gamma are data-wide scalars, so compare
    # with a loose-but-meaningful tolerance on the final feature
    np.testing.assert_allclose(got, expect, rtol=0, atol=5e-3)


def test_return_governance_oracle(flagship_frames):
    wide, merged = flagship_frames
    m = merged.sort_values(["entity", "ts"])
    rets = []
    for e, g in m.groupby("entity", sort=True):
        c = g["close"].to_numpy()
        prev = np.concatenate([[np.nan], c[:-1]])
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where((prev > 0) & (c > 0), np.log(c / prev), 0.0)
        rets.append(np.nan_to_num(r))
    ret = np.concatenate(rets)
    lo, hi = np.percentile(ret, [RET_WINSOR_P[0] * 100, RET_WINSOR_P[1] * 100])
    clipped = np.clip(ret, lo, hi)
    scale = RET_TANH_FACTOR * max(float(np.std(clipped)), 1e-12)
    expect = np.tanh(clipped / scale)
    got = wide.sort_values(["entity", "ts"])[f"ret_{CFG.base_tf}_log"].to_numpy()
    np.testing.assert_allclose(got, expect, rtol=0, atol=5e-3)


def test_health_gate_and_manifest(spark):
    bars = spark.createDataFrame(make_bars_pdf(n=500, entities=("A",), freq_s=60))
    arr_df, manifest = run_flagship_contract(bars, CFG)
    assert manifest.to_dict()["n_features"] == len(flagship_feature_names(CFG))
    assert len(manifest.schema_sha) == 40  # sha-1 hex like the reference
    row = arr_df.first()
    assert len(row["features"]) == len(manifest.feature_names)
    wide = run_flagship(bars, CFG)
    health = flagship_health(wide, CFG).toPandas().set_index("feature")
    bounded = [
        n
        for n, g in manifest.feature_groups.items()
        if g in ("market_state", "momentum", "bb_width", "volume", "rsi", "time", "atr")
    ]
    assert (health.loc[bounded, "oor_ratio"] == 0.0).all(), health.loc[
        bounded, "oor_ratio"
    ][health.loc[bounded, "oor_ratio"] > 0]


def test_export_npz_contract_roundtrip(spark, tmp_path):
    """The literal NPZ artifact matches the reference loader's contract:
    keys, dtypes, shapes, schema_sha, and feature order."""
    import numpy as np

    from quant_feature_pipeline_spark.plans.features_contract import (
        export_npz_contract,
    )
    from quant_feature_pipeline_spark.plans.pipeline import resample_all

    bars = spark.createDataFrame(make_bars_pdf(n=500, entities=("A",), freq_s=60))
    wide = run_flagship(bars, CFG)
    _, manifest = run_flagship_contract(bars, CFG)
    prices = resample_all(bars, CFG)[CFG.resample_targets[0]].select(
        "entity", "ts", "open", "high", "low", "close"
    )
    out = str(tmp_path / "features.npz")
    export_npz_contract(wide, manifest, out, prices=prices)
    with np.load(out, allow_pickle=True) as z:
        names = z["feature_names"].tolist()
        obs = z["observations"]
        assert str(z["version"]) == "rl_features_v1"
        assert names == manifest.feature_names
        assert obs.dtype == np.float32
        assert obs.shape == (z["timestamps"].shape[0], len(names))
        assert z["prices"].shape == (obs.shape[0], 4)
        assert not np.isnan(z["prices"]).any()
        assert str(z["schema_sha"]) == manifest.schema_sha
        assert (np.diff(z["timestamps"]) > 0).all()  # sorted, ms epoch


def test_approx_percentiles_mode(spark):
    """approx_percentiles=True (the 100 TB scale switch, r4): same
    schema and rows, every bounded feature group still passes the
    health gate, and features stay close to exact mode — the approx
    sketch only moves the global winsor/clip bounds slightly."""
    bars = spark.createDataFrame(make_bars_pdf(n=500, entities=("A",), freq_s=60))
    exact = run_flagship(bars, CFG).toPandas().sort_values(["entity", "ts"])
    approx = (
        run_flagship(bars, CFG, approx_percentiles=True)
        .toPandas()
        .sort_values(["entity", "ts"])
    )
    assert list(exact.columns) == list(approx.columns)
    assert len(exact) == len(approx)
    health = flagship_health(
        run_flagship(bars, CFG, approx_percentiles=True), CFG
    ).toPandas().set_index("feature")
    _, manifest = run_flagship_contract(bars, CFG)
    bounded = [
        n
        for n, g in manifest.feature_groups.items()
        if g in ("market_state", "momentum", "bb_width", "volume", "rsi", "time", "atr")
    ]
    assert (health.loc[bounded, "oor_ratio"] == 0.0).all()
    for c in flagship_feature_names(CFG):
        a = exact[c].to_numpy(dtype=float)
        b = approx[c].to_numpy(dtype=float)
        m = ~(np.isnan(a) | np.isnan(b))
        assert np.isnan(a).sum() == np.isnan(b).sum(), c
        # calibrated groups shift with the bounds; stay within 0.15 abs
        assert np.max(np.abs(a[m] - b[m]), initial=0.0) < 0.15, c


def test_train_serve_stats_determinism(spark):
    """SURVEY §7.3 hard part 5 (the reference's fixed_gamma discipline):
    persisted train-time global stats drive serve-mode runs with zero
    stats jobs, reproduce the training features bit-for-bit, and keep
    historical features bit-identical when serving on EXTENDED data —
    the offline/online consistency gate (reference README_RL2 §5),
    which also re-proves zero temporal leakage end-to-end."""
    from quant_feature_pipeline_spark.plans.flagship import FlagshipStats

    full = make_bars_pdf(n=700, entities=("A", "B"), freq_s=60)
    cut = full[full.ts < full.ts.quantile(0.8)].reset_index(drop=True)
    train_bars = spark.createDataFrame(cut)

    wide, stats = run_flagship(train_bars, CFG, return_stats=True)
    train_pdf = wide.toPandas().sort_values(["entity", "ts"]).reset_index(drop=True)

    # JSON round-trip must be exact (repr shortest-float)
    stats2 = FlagshipStats.from_json(stats.to_json())
    assert stats2 == stats

    served = (
        run_flagship(train_bars, CFG, stats=stats2)
        .toPandas()
        .sort_values(["entity", "ts"])
        .reset_index(drop=True)
    )
    names = flagship_feature_names(CFG)
    for c in names:
        a, b = train_pdf[c].to_numpy(float), served[c].to_numpy(float)
        assert np.array_equal(a, b, equal_nan=True), c

    # serve on the FULL history with train stats: rows the training run
    # saw must be bit-identical (backward-looking windows + fixed stats)
    extended = (
        run_flagship(spark.createDataFrame(full), CFG, stats=stats2)
        .toPandas()
        .sort_values(["entity", "ts"])
        .reset_index(drop=True)
    )
    cut_ts = train_pdf["ts"].max()
    hist = extended[extended.ts <= cut_ts].reset_index(drop=True)
    assert len(hist) == len(train_pdf)
    for c in names:
        a = train_pdf[c].to_numpy(float)
        b = hist[c].to_numpy(float)
        assert np.array_equal(a, b, equal_nan=True), c
