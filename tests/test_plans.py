"""Physical-plan regression guards: the optimizations the engine relies
on must stay visible in the executed plan (SURVEY.md §4)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from .conftest import make_bars_pdf


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_column_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "value")
        .filter(F.col("user_id") < 10)
    )
    p = _plan(df)
    assert "LessThan(user_id,10)" in p, "filter not pushed to parquet scan"
    rs = re.search(r"ReadSchema: ([^\n]*)", p).group(1)
    assert "props" not in rs and "event_type" not in rs, f"columns not pruned: {rs}"


def test_dimension_joins_broadcast(spark):
    import __spark_entry__ as e

    p = _plan(e.queries()["tpch_q5like"](spark, "/root/testdata/sf0.001"))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_asof_union_ffill_single_window(spark):
    """The union-ffill as-of join must stay one Window over one union —
    no join, no extra shuffle beyond the two inputs."""
    from quant_feature_pipeline_spark.operators.asof import asof_join_union_ffill

    pdf = make_bars_pdf(n=50)
    left = spark.createDataFrame(pdf[["entity", "ts", "close"]])
    right = spark.createDataFrame(
        pdf[["entity", "ts", "volume"]].rename(columns={"volume": "v"})
    )
    p = _plan(asof_join_union_ffill(left, right))
    assert p.count("Window") == 1
    assert "Join" not in p


def test_prefix_sum_sma_no_sliding_frame(spark):
    """sma must compile to running frames + lag, not O(W) sliding frames."""
    from quant_feature_pipeline_spark.functions.indicators import sma

    pdf = make_bars_pdf(n=50)
    p = _plan(sma(spark.createDataFrame(pdf), (5, 200)))
    # sliding frames print as 'ROWS BETWEEN 199 PRECEDING AND CURRENT ROW'
    assert "199 PRECEDING" not in p
    assert "unboundedpreceding" in p.lower() or "UNBOUNDED PRECEDING" in p
