"""Gap sessionization vs a hand-rolled pandas oracle + manual case."""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import functions as F

from quant_feature_pipeline_spark.operators.sessionize import session_stats, sessionize

from .conftest import T0, assert_frame_close


def _events():
    rows = []
    for e, offsets in {
        "A": [0, 60, 120, 4000, 4060, 9000],
        "B": [0, 30, 7200],
    }.items():
        for o in offsets:
            rows.append((e, T0 + datetime.timedelta(seconds=o), float(o)))
    return pd.DataFrame(rows, columns=["entity", "ts", "value"])


def test_sessionize_ids(spark):
    pdf = _events()
    got = (
        sessionize(spark.createDataFrame(pdf), gap_s=1800)
        .toPandas()
        .sort_values(["entity", "ts"])
    )
    assert got[got.entity == "A"]["session_id"].tolist() == [1, 1, 1, 2, 2, 3]
    assert got[got.entity == "B"]["session_id"].tolist() == [1, 1, 2]


def test_session_stats(spark):
    pdf = _events()
    got = session_stats(spark.createDataFrame(pdf), gap_s=1800, value_col="value").toPandas()
    a1 = got[(got.entity == "A") & (got.session_id == 1)].iloc[0]
    assert a1["n_events"] == 3
    assert a1["duration_s"] == 120.0
    assert a1["sum_value"] == 180.0
    assert len(got) == 5


def test_sessionize_exact_gap_not_new_session(spark):
    """A gap of exactly gap_s keeps the session (strict > semantics)."""
    pdf = pd.DataFrame(
        {
            "entity": ["A", "A"],
            "ts": [T0, T0 + datetime.timedelta(seconds=1800)],
            "value": [1.0, 2.0],
        }
    )
    got = sessionize(spark.createDataFrame(pdf), gap_s=1800).toPandas()
    assert got["session_id"].tolist() == [1, 1]


def test_streaming_equals_batch_resample(spark, tmp_path):
    """AvailableNow stream -> complete-mode memory sink == batch resample
    on the same bounded input (run_stream_to_table contract)."""
    import uuid

    from quant_feature_pipeline_spark.operators.resample import resample_ohlcv
    from quant_feature_pipeline_spark.streaming.micro import (
        run_stream_to_table,
        stream_bars_from_dir,
        streaming_resample,
    )

    from .conftest import assert_frame_close, make_bars_pdf

    pdf = make_bars_pdf(n=500, entities=("A", "B"), freq_s=60)
    src = str(tmp_path / "bars")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = stream_bars_from_dir(spark, src)
    name = f"t_stream_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(streaming_resample(stream, "15m"), name)
    got = spark.table(name).toPandas()
    want = resample_ohlcv(
        spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp")),
        "15m",
    ).toPandas()
    assert_frame_close(got, want, keys=["entity", "ts"])
