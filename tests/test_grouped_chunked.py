"""grouped_apply_chunked: a single huge entity processed in warm-up
overlapped chunks must equal the unchunked whole-entity result — the
100x-scale memory-hazard fix for the recurrence/rank stages (one entity
larger than any sane Arrow batch no longer needs to fit in one task)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_spark.config import PipelineConfig
from quant_feature_pipeline_spark.functions.grouped import (
    grouped_apply,
    grouped_apply_chunked,
)
from quant_feature_pipeline_spark.functions.recurrence import (
    compute_recurrence_indicators,
)

from .conftest import make_bars_pdf


def _key(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["entity", "ts"]).reset_index(drop=True)


def test_chunked_exact_for_finite_window_kernel(spark):
    """A rolling window-20 kernel is EXACTLY reproduced as long as
    warmup_rows >= window - 1 (here with plenty of margin)."""
    from pyspark.sql import types as T

    pdf = make_bars_pdf(n=2600, entities=("A", "B"))
    df = spark.createDataFrame(pdf)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("roll20", T.DoubleType(), True)]
    )
    cols = [f.name for f in schema.fields]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort").reset_index(drop=True)
        c = g["close"].to_numpy()
        out = np.full(len(c), np.nan)
        if len(c) >= 20:
            # window-LOCAL mean (each window summed independently):
            # pandas' rolling().mean() streams an accumulator across the
            # whole series, so its float result is not chunk-invariant
            out[19:] = np.lib.stride_tricks.sliding_window_view(c, 20).mean(axis=1)
        g["roll20"] = out
        return g[cols]

    want = _key(grouped_apply(df, "entity", fn, schema).toPandas())
    got = _key(
        grouped_apply_chunked(
            df, "entity", "ts", fn, schema, chunk_rows=500, warmup_rows=100
        ).toPandas()
    )
    assert len(got) == len(want) == len(pdf)
    for c in cols:
        if got[c].dtype.kind == "f":
            a, b = got[c].to_numpy(), want[c].to_numpy()
            assert np.array_equal(a, b, equal_nan=True), c
        else:
            assert got[c].equals(want[c]), c


def test_chunked_recurrence_identical_on_huge_entity(spark):
    """One entity of 16k rows (4x the 4k chunk budget) through the full
    EMA/Wilder/MACD/ATR/SuperTrend stack: chunked == unchunked
    bit-for-bit, because 4096 warm-up rows shrink the slowest seed error
    (span-200 EMA, (1-alpha)^4096) below float64 ulp."""
    pdf = make_bars_pdf(n=16_000, entities=("HUGE",))
    df = spark.createDataFrame(pdf)
    cfg = PipelineConfig()

    want = _key(compute_recurrence_indicators(df, cfg).toPandas())
    got = _key(
        compute_recurrence_indicators(
            df, cfg, chunk_rows=4_096, warmup_rows=4_096
        ).toPandas()
    )
    assert len(got) == len(want) == len(pdf)
    float_cols = [c for c in want.columns if want[c].dtype.kind == "f"]
    for c in float_cols:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert np.array_equal(a, b, equal_nan=True), (
            c,
            np.nanmax(np.abs(a - b)),
        )


def test_chunked_rejects_warmup_larger_than_chunk(spark):
    import pytest
    from pyspark.sql import types as T

    df = spark.createDataFrame(make_bars_pdf(n=10, entities=("A",)))
    with pytest.raises(ValueError, match="warm-up"):
        grouped_apply_chunked(
            df, "entity", "ts", lambda g: g, df.schema,
            chunk_rows=10, warmup_rows=11,
        )
    # same guard for a kernel-declared lookback (ADVICE r4): a hard
    # window the chunk size cannot cover must fail loudly
    with pytest.raises(ValueError, match="lookback"):
        grouped_apply_chunked(
            df, "entity", "ts", lambda g: g, df.schema,
            chunk_rows=10, warmup_rows=5, lookback_rows=11,
        )


def test_rank_window_larger_than_warmup_exact_under_auto_chunking(spark):
    """ADVICE r4 (high): rolling rank with window > warmup_rows was
    silently corrupted at chunk boundaries for entities above
    auto_chunk_rows. The fix passes the kernel window as lookback_rows,
    which bumps the replayed history — result must be BIT-identical to
    the unchunked path even with warmup_rows far below the window."""
    from quant_feature_pipeline_spark.functions.rank import rolling_rank_series
    from pyspark.sql import types as T

    pdf = make_bars_pdf(n=4_000, entities=("HUGE", "T"))
    pdf = pdf[(pdf.entity == "HUGE") | (pdf.index % 37 == 0)].reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    window = 300  # >> the warmup_rows=64 below: old code corrupted here
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("rk", T.DoubleType(), True)]
    )
    cols = [f.name for f in schema.fields]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort").reset_index(drop=True)
        g["rk"] = rolling_rank_series(g["close"], window)
        return g[cols]

    want = _key(
        grouped_apply(df, "entity", fn, schema, ts_col="ts",
                      auto_chunk_rows=None).toPandas()
    )
    got = _key(
        grouped_apply(
            df, "entity", fn, schema, ts_col="ts",
            auto_chunk_rows=1_000, chunk_rows=500, warmup_rows=64,
            lookback_rows=window,
        ).toPandas()
    )
    assert len(got) == len(want) == len(pdf)
    a, b = got["rk"].to_numpy(), want["rk"].to_numpy()
    assert np.array_equal(a, b, equal_nan=True)
    # and the public entry point wires the lookback itself
    from quant_feature_pipeline_spark.functions.rank import rolling_percentile_rank

    via_api = _key(
        rolling_percentile_rank(df, "close", window, out="rk").toPandas()
    )
    assert np.array_equal(via_api["rk"].to_numpy(), b, equal_nan=True)


def test_stage_metrics_accumulators(spark):
    """StageMetrics: per-partition rows/groups/latency accumulate on the
    executors and read back after the action (north-rule per-partition
    lineage + latency surface)."""
    from quant_feature_pipeline_spark.functions.grouped import StageMetrics

    pdf = make_bars_pdf(n=500, entities=("A", "B", "C"))
    df = spark.createDataFrame(pdf)
    m = StageMetrics(spark, "recurrence")
    out = compute_recurrence_indicators(df, PipelineConfig(), metrics=m)
    n = out.count()
    rep = m.report()
    assert n == len(pdf)
    assert rep["rows"] == len(pdf)
    assert rep["groups"] == 3
    assert rep["partitions"] >= 1
    assert rep["busy_wall_s"] > 0


def test_auto_local_chunking_bit_identical(spark):
    """grouped_apply's in-task auto-chunking (no caller opt-in, r4):
    an entity above auto_chunk_rows is processed in warm-up-overlapped
    local slices — output must be BIT-identical to the unchunked path.
    Exercised through the generic compute_recurrence_indicators entry
    point (the full EMA/Wilder/MACD/ATR/SuperTrend stack) with the
    threshold lowered so a 16k-row entity trips the dispatch."""
    pdf = make_bars_pdf(n=16_000, entities=("HUGE", "TINY"))
    pdf = pdf[(pdf.entity == "HUGE") | (pdf.index % 40 == 0)].reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    cfg = PipelineConfig()

    want = _key(
        compute_recurrence_indicators(df, cfg, auto_chunk_rows=None).toPandas()
    )
    got = _key(
        compute_recurrence_indicators(
            df, cfg, auto_chunk_rows=8_000, local_chunk_rows=5_000
        ).toPandas()
    )
    assert len(got) == len(want) == len(pdf)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            a, b = got[c].to_numpy(), want[c].to_numpy()
            an, bn = np.isnan(a), np.isnan(b)
            assert np.array_equal(an, bn), c
            assert (a[~an] == b[~bn]).all(), c
        else:
            assert got[c].equals(want[c]), c


def test_auto_local_chunking_rejects_row_dropping_kernel(spark):
    """A kernel that drops rows under auto-chunking must FAIL LOUDLY,
    not silently misalign the warm-row slice (ADVICE r3)."""
    import pytest
    from pyspark.sql import types as T

    pdf = make_bars_pdf(n=3_000, entities=("A",))
    df = spark.createDataFrame(pdf)
    schema = df.schema

    def bad(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[1:]

    out = grouped_apply(
        df, "entity", bad, schema,
        ts_col="ts", auto_chunk_rows=1_000, chunk_rows=1_000, warmup_rows=100,
    )
    with pytest.raises(Exception, match="one row per input row"):
        out.collect()


def test_asof_auto_routes_hot_entity(spark):
    """asof_join(strategy='auto'): hot entities route through the
    bucketed path, cold through union_ffill — results identical to the
    plain union_ffill join (both branches are exact)."""
    import datetime

    from quant_feature_pipeline_spark.operators.asof import asof_join

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for e, n in (("HOT", 5_000), ("C1", 300), ("C2", 7)):
        for k in range(n):
            rows.append((e, t0 + datetime.timedelta(seconds=11 * k), float(k)))
    left = spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity", "ts", "lval"])
    )
    rrows = [
        (e, t0 + datetime.timedelta(minutes=5 * k), float(100 + k))
        for e in ("HOT", "C1", "C2")
        for k in range(20)
    ]
    right = spark.createDataFrame(
        pd.DataFrame(rrows, columns=["entity", "ts", "rval"])
    )
    for direction, tol in (
        ("backward", None), ("forward", None), ("nearest", None), ("backward", 400)
    ):
        want = _key(
            asof_join(
                left, right, direction=direction, tolerance_s=tol,
                strategy="union_ffill",
            ).toPandas()
        )
        got = _key(
            asof_join(
                left, right, direction=direction, tolerance_s=tol,
                strategy="auto", hot_rows=1_000,
            ).toPandas()
        )
        assert got.equals(want), (direction, tol)


def test_asof_auto_sampled_hot_detection(spark):
    """hot_detect_sample: routing from a Bernoulli sample (the 100 TB
    path — no full extra count scan) is still EXACT, whatever the sample
    decides. Exercised at a fraction/threshold where the hot entity IS
    detected (expected sample count 50 >> threshold 10) and at one where
    nothing can be (threshold above the whole sampled row count), so
    both routing outcomes are covered."""
    import datetime

    from quant_feature_pipeline_spark.operators.asof import asof_join

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for e, n in (("HOT", 5_000), ("C1", 300), ("C2", 7)):
        for k in range(n):
            rows.append((e, t0 + datetime.timedelta(seconds=11 * k), float(k)))
    left = spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity", "ts", "lval"])
    )
    rrows = [
        (e, t0 + datetime.timedelta(minutes=5 * k), float(100 + k))
        for e in ("HOT", "C1", "C2")
        for k in range(20)
    ]
    right = spark.createDataFrame(
        pd.DataFrame(rrows, columns=["entity", "ts", "rval"])
    )
    want = _key(asof_join(left, right, strategy="union_ffill").toPandas())
    for hot_rows in (1_000, 10_000_000):  # detected / undetectable
        got = _key(
            asof_join(
                left, right, strategy="auto",
                hot_rows=hot_rows, hot_detect_sample=0.01,
            ).toPandas()
        )
        assert got.equals(want), hot_rows


def test_asof_auto_small_input_skips_detection(spark):
    """r6 (VERDICT r5 item 3): when the optimizer's size estimate proves
    the left is smaller than ``hot_rows`` BYTES (hence < hot_rows rows),
    the auto router must return the plain union_ffill plan WITHOUT
    running the detection count job — zero routing tax on small inputs."""
    import datetime

    from quant_feature_pipeline_spark.operators.asof import asof_join

    t0 = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        pd.DataFrame(
            [("A", t0 + datetime.timedelta(seconds=9 * k), float(k)) for k in range(200)],
            columns=["entity", "ts", "lval"],
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            [("A", t0 + datetime.timedelta(minutes=3 * k), float(k)) for k in range(20)],
            columns=["entity", "ts", "rval"],
        )
    )
    sc = spark.sparkContext
    sc.setJobGroup("asof_skip_probe", "asof_skip_probe")
    try:
        df = asof_join(left, right)  # default auto, default hot_rows
        jobs = sc.statusTracker().getJobIdsForGroup("asof_skip_probe")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == [], "plan build must run NO detection job on small inputs"
    want = _key(asof_join(left, right, strategy="union_ffill").toPandas())
    assert _key(df.toPandas()).equals(want)


def test_asof_auto_null_keys_survive_hot_routing(spark):
    """ADVICE r5 (medium): with a detected hot list, rows whose ``by``
    key is NULL must flow to the cold branch, not vanish under the
    three-valued isin split."""
    import datetime

    from quant_feature_pipeline_spark.operators.asof import asof_join

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("HOT", t0 + datetime.timedelta(seconds=7 * k), float(k)) for k in range(5000)]
    rows += [(None, t0 + datetime.timedelta(seconds=60 * k), float(1000 + k)) for k in range(5)]
    rows += [("C1", t0 + datetime.timedelta(seconds=60 * k), float(2000 + k)) for k in range(40)]
    left = spark.createDataFrame(pd.DataFrame(rows, columns=["entity", "ts", "lval"]))
    rrows = [
        (e, t0 + datetime.timedelta(minutes=5 * k), float(100 + k))
        for e in ("HOT", "C1", None)
        for k in range(12)
    ]
    right = spark.createDataFrame(pd.DataFrame(rrows, columns=["entity", "ts", "rval"]))
    out = asof_join(left, right, strategy="auto", hot_rows=1_000).toPandas()
    assert len(out) == len(rows), "no rows may be lost by the hot split"
    nulls = out[out["entity"].isna()]
    assert len(nulls) == 5
    # null-key lefts match null-key rights in the cold union_ffill branch
    want = _key(asof_join(left, right, strategy="union_ffill").toPandas())
    assert _key(out).equals(want)
