"""Grid fill / ffill / bfill / cleaning (W14, P8) and lag/lead shifts
(W1/W7) vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_spark.operators.fill import bfill, clean_numeric, ffill, grid_fill
from quant_feature_pipeline_spark.operators.shift import (
    lag_momentum,
    lead_shift,
    log_return,
    sliding_momentum,
)

from .conftest import assert_frame_close, make_bars_pdf


def test_grid_fill_reference_rules(spark):
    pdf = make_bars_pdf(n=200, gap_every=7)
    got = grid_fill(spark.createDataFrame(pdf), "1m").toPandas()
    out = []
    for e, g in pdf.groupby("entity"):
        g = g.set_index("ts").sort_index()
        full = pd.date_range(g.index.min(), g.index.max(), freq="1min")
        r = g.reindex(full)
        r["close"] = r["close"].ffill()
        for c in ("open", "high", "low"):
            r[c] = r[c].fillna(r["close"])
        r["volume"] = r["volume"].fillna(0.0)
        r["entity"] = e
        r.index.name = "ts"
        out.append(r.reset_index())
    want = pd.concat(out, ignore_index=True)[got.columns]
    assert_frame_close(got, want, keys=["entity", "ts"])


def test_ffill_bfill(spark):
    pdf = make_bars_pdf(n=100)
    pdf.loc[pdf.index % 3 == 0, "close"] = np.nan
    sdf = spark.createDataFrame(pdf)
    got_f = ffill(sdf, ["close"]).toPandas()
    got_b = bfill(sdf, ["close"]).toPandas()
    out_f, out_b = [], []
    for e, g in pdf.groupby("entity"):
        g = g.sort_values("ts").copy()
        f = g.copy()
        f["close"] = g["close"].ffill()
        b = g.copy()
        b["close"] = g["close"].bfill()
        out_f.append(f)
        out_b.append(b)
    assert_frame_close(got_f, pd.concat(out_f)[got_f.columns], keys=["entity", "ts"])
    assert_frame_close(got_b, pd.concat(out_b)[got_b.columns], keys=["entity", "ts"])


def test_clean_numeric(spark):
    pdf = make_bars_pdf(n=60, entities=("A",))
    pdf.loc[5, "close"] = np.inf
    pdf.loc[6, "close"] = np.nan
    pdf.loc[0, "volume"] = -np.inf
    got = clean_numeric(spark.createDataFrame(pdf), ["close", "volume"]).toPandas().sort_values("ts")
    assert np.isfinite(got["close"]).all() and np.isfinite(got["volume"]).all()
    # inf at row 5 ffilled from row 4; leading inf in volume -> 0
    assert got["close"].iloc[5] == pdf["close"].iloc[4]
    assert got["close"].iloc[6] == pdf["close"].iloc[4]
    assert got["volume"].iloc[0] == 0.0


def test_lag_momentum_and_log_return(spark):
    pdf = make_bars_pdf(n=120)
    sdf = spark.createDataFrame(pdf)
    got = log_return(lag_momentum(sdf, 5), src="close").toPandas()
    out = []
    for e, g in pdf.groupby("entity"):
        g = g.sort_values("ts").copy()
        g["mom"] = (g["close"] / g["close"].shift(5) - 1.0).fillna(0.0)
        g["ret_log"] = np.log(g["close"] / g["close"].shift(1)).fillna(0.0)
        out.append(g)
    assert_frame_close(got, pd.concat(out)[got.columns], keys=["entity", "ts"])


def test_sliding_momentum_multi_tf(spark):
    pdf = make_bars_pdf(n=200)
    got = sliding_momentum(
        spark.createDataFrame(pdf),
        tf_periods={"15m": 3, "30m": 2},
        base_steps={"15m": 15, "30m": 30},
    ).toPandas()
    out = []
    for e, g in pdf.groupby("entity"):
        g = g.sort_values("ts").copy()
        g["15m_mom3"] = (g["close"] / g["close"].shift(45) - 1.0).fillna(0.0)
        g["30m_mom2"] = (g["close"] / g["close"].shift(60) - 1.0).fillna(0.0)
        out.append(g)
    assert_frame_close(got, pd.concat(out)[got.columns], keys=["entity", "ts"])


def test_lead_shift(spark):
    pdf = make_bars_pdf(n=50)
    got = lead_shift(spark.createDataFrame(pdf), ["close"], 2).toPandas()
    out = []
    for e, g in pdf.groupby("entity"):
        g = g.sort_values("ts").copy()
        g["close_lead2"] = g["close"].shift(-2)
        out.append(g)
    assert_frame_close(got, pd.concat(out)[got.columns], keys=["entity", "ts"])


def test_grid_fill_ranges_matches_join_ffill(spark):
    """grid_fill_ranges (per-bar range explode, O(bars) window) must be
    row-identical to the grid-join + ffill formulation (O(grid) window)
    — including head NULLs before the first bar, gap segments, entities
    whose bars end before t1, bars labeled past t1 (excluded), and an
    entity with no bars at all (all-NULL grid)."""
    import datetime

    from pyspark.sql import functions as F

    from quant_feature_pipeline_spark.operators.fill import grid_fill_ranges

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    bars = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity": ["A"] * 4 + ["B"] * 2 + ["C"],
                # A: starts past t0 (head nulls), has a gap, ends early;
                # B: dense; C: single bar AFTER its t1 (contributes nothing)
                "ts": [ts(15), ts(20), ts(45), ts(60), ts(5), ts(10), ts(500)],
                "close": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 99.0],
            }
        )
    )
    bounds = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity": ["A", "B", "C", "D"],  # D has no bars at all
                "t0": [ts(0), ts(0), ts(0), ts(0)],
                "t1": [ts(90), ts(10), ts(30), ts(20)],
            }
        )
    )
    grid = bounds.select(
        "entity",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 5 MINUTES"))).alias("ts"),
    )
    want = (
        ffill(grid.join(bars, ["entity", "ts"], "left"), ["close"])
        .select("entity", "ts", "close")
        .toPandas()
        .sort_values(["entity", "ts"])
        .reset_index(drop=True)
    )
    got = (
        grid_fill_ranges(bars, "5m", value_cols=("close",), grid_bounds=bounds)
        .toPandas()
        .sort_values(["entity", "ts"])
        .reset_index(drop=True)
    )
    assert got["entity"].equals(want["entity"]) and got["ts"].equals(want["ts"])
    a, b = got["close"].to_numpy(), want["close"].to_numpy()
    assert np.array_equal(np.isnan(a), np.isnan(b))
    assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)])
