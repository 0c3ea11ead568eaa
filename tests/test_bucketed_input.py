"""Bucketed-table ingest: the write-once / shuffle-never-again contract.

`write_bucketed_table` records the hash layout in the catalog, so the
returned scan reports HashPartitioning(entity, N) and the pipeline's
up-front repartition (plus every downstream entity-clustered agg/window)
starts WITHOUT an exchange — the 100 TB ingest contract behind the r5
scaling work (VERDICT r4 item 1). These tests pin both halves: the plan
shape (no exchange between scan and the resample agg) and value identity
with the plain-parquet path.
"""
from __future__ import annotations

import pandas as pd
import pytest

from quant_feature_pipeline_spark.config import PipelineConfig
from quant_feature_pipeline_spark.operators.resample import resample_ohlcv
from quant_feature_pipeline_spark.plans.pipeline import run_pipeline
from quant_feature_pipeline_spark.sources.sink import write_bucketed_table

from .conftest import make_bars_pdf


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_bars(spark, tmp_path_factory):
    pdf = make_bars_pdf(n=600, entities=("A", "B", "C"))
    bars = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("bucketed") / "bars")
    scan = write_bucketed_table(
        bars, "test_bars_bucketed", buckets=4, by="entity",
        sort_cols=("entity", "ts"), path=path,
    )
    yield bars, scan
    spark.sql("DROP TABLE IF EXISTS test_bars_bucketed")


def test_bucketed_scan_elides_resample_exchange(spark, bucketed_bars):
    """groupBy(entity, window) over the bucketed scan needs NO exchange:
    HashPartitioning(entity, 4) from the catalog satisfies the agg's
    clustering requirement (entity is a subset of the group keys)."""
    bars, scan = bucketed_bars
    p_bucketed = _plan(resample_ohlcv(scan, "15m"))
    p_plain = _plan(resample_ohlcv(bars, "15m"))
    assert p_bucketed.count("Exchange") == 0, p_bucketed
    assert p_plain.count("Exchange") >= 1  # the shuffle the bucket layout saves
    assert "Bucketed: true" in p_bucketed


def test_pipeline_bucketed_input_identical(spark, bucketed_bars):
    """run_pipeline(input_partitioned=True) over the bucketed scan is
    value-identical to the plain path (same rows, same features) — the
    guard behind bench.py's bucketed-ingest token job."""
    bars, scan = bucketed_bars
    cfg = PipelineConfig(base_tf="1m", resample_targets=("1m", "5m", "15m"))
    want = (
        run_pipeline(bars, cfg, persist_stages=False)
        .toPandas().sort_values(["entity", "ts"]).reset_index(drop=True)
    )
    got = (
        run_pipeline(scan, cfg, persist_stages=False, input_partitioned=True)
        .toPandas().sort_values(["entity", "ts"]).reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in want.columns:
        if pd.api.types.is_float_dtype(want[c]):
            pd.testing.assert_series_equal(got[c], want[c], check_exact=False,
                                           rtol=1e-12, atol=1e-12, obj=c)
        else:
            assert got[c].equals(want[c]), c
