"""As-of join: all three Spark strategies vs the pandas merge_asof oracle
(the reference's own operator, `/root/reference/step4_merge_features.py:522-535`),
across direction / exact-match / tolerance, with edge timestamps per
FIXTURES.md F5: exact boundary matches, mid-bucket, before-all-right."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_spark.operators.asof import asof_join

from .conftest import T0, assert_frame_close

STRATEGIES = ["union_ffill", "sorted_merge", "bucketed"]


def _left_right(seed=7):
    rng = np.random.RandomState(seed)
    frames_l, frames_r = [], []
    for e in ("A", "B", "HOT"):
        n = 300 if e == "HOT" else 60
        lts = sorted(
            T0 + datetime.timedelta(seconds=int(s))
            for s in rng.choice(range(0, 36000), size=n, replace=False)
        )
        frames_l.append(
            pd.DataFrame({"entity": e, "ts": lts, "lval": rng.randn(n)})
        )
        # right axis: 15-minute marks, includes exact-boundary collisions
        rts = [T0 + datetime.timedelta(minutes=15 * k) for k in range(0, 40)]
        frames_r.append(
            pd.DataFrame({"entity": e, "ts": rts, "rval": rng.randn(len(rts))})
        )
    left = pd.concat(frames_l, ignore_index=True)
    # plant exact matches and a left row before all right rows
    left.loc[0, "ts"] = T0 - datetime.timedelta(minutes=5)
    left.loc[1, "ts"] = T0 + datetime.timedelta(minutes=15)
    right = pd.concat(frames_r, ignore_index=True)
    # entity present on left only
    ghost = pd.DataFrame({"entity": ["GHOST"], "ts": [T0], "lval": [1.0]})
    return pd.concat([left, ghost], ignore_index=True), right


def _oracle(left, right, direction, allow_exact, tol_s):
    out = []
    for e, lg in left.groupby("entity"):
        rg = right[right.entity == e].drop(columns=["entity"]).sort_values("ts")
        lg = lg.sort_values("ts")
        rg = rg.rename(columns={"rval": "rval"})
        rg["matched_ts"] = rg["ts"]
        if rg.empty:
            m = lg.copy()
            m["rval"] = np.nan
            m["matched_ts"] = pd.NaT
        else:
            m = pd.merge_asof(
                lg,
                rg,
                on="ts",
                direction=direction,
                allow_exact_matches=allow_exact,
                tolerance=pd.Timedelta(seconds=tol_s) if tol_s else None,
            )
        out.append(m)
    return pd.concat(out, ignore_index=True)


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize(
    "direction,allow_exact,tol_s",
    [
        ("backward", True, None),
        ("backward", False, None),
        ("backward", True, 600),
        ("forward", True, None),
        ("forward", False, None),
        ("nearest", True, None),
        ("nearest", True, 600),
        ("nearest", False, None),
        ("nearest", False, 600),
    ],
)
def test_asof_matches_pandas(spark, strategy, direction, allow_exact, tol_s):
    lpdf, rpdf = _left_right()
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = asof_join(
        left,
        right,
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance_s=tol_s,
        strategy=strategy,
    ).toPandas()
    want = _oracle(lpdf, rpdf, direction, allow_exact, tol_s)
    assert_frame_close(got, want, keys=["entity", "ts", "lval"])


def test_asof_nearest(spark):
    lpdf, rpdf = _left_right()
    got = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        direction="nearest",
    ).toPandas()
    want = _oracle(lpdf, rpdf, "nearest", True, None)
    assert_frame_close(got, want, keys=["entity", "ts", "lval"])


def test_asof_prefix(spark):
    lpdf, rpdf = _left_right()
    got = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        right_prefix="15m_",
    )
    assert "15m_rval" in got.columns and "15m_matched_ts" in got.columns


@pytest.mark.parametrize("direction", ["backward", "nearest"])
@pytest.mark.parametrize("bucket_s", [900, 3600, 86400])
def test_asof_bucketed_bucket_sizes(spark, bucket_s, direction):
    """Bucket size must not change results — boundary carry correctness
    (nearest exercises the dual-direction carry union)."""
    lpdf, rpdf = _left_right()
    from quant_feature_pipeline_spark.operators.asof import asof_join_bucketed

    got = asof_join_bucketed(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        direction=direction,
        bucket_s=bucket_s,
    ).toPandas()
    want = _oracle(lpdf, rpdf, direction, True, None)
    assert_frame_close(got, want, keys=["entity", "ts", "lval"])


def test_asof_multi_duplicate_left_ts_no_fanout(spark):
    """Duplicate left (entity, ts) rows must map 1:1 through the fused
    multi-asof and the nearest recombine (row-id join, not key join)."""
    import pandas as pd

    from quant_feature_pipeline_spark.operators.asof import asof_join_multi

    lts = [T0 + datetime.timedelta(minutes=m) for m in (1, 5, 5, 5, 9)]
    left = spark.createDataFrame(
        pd.DataFrame({"entity": "A", "ts": lts, "lval": range(5)})
    )
    rts = [T0 + datetime.timedelta(minutes=m) for m in (0, 4, 8)]
    right = spark.createDataFrame(
        pd.DataFrame({"entity": "A", "ts": rts, "rval": [10.0, 20.0, 30.0]})
    )
    out = asof_join_multi(left, {"r_": right}).toPandas()
    assert len(out) == 5
    assert sorted(out["lval"]) == [0, 1, 2, 3, 4]
    assert (out[out["lval"] > 0].sort_values("lval")["r_rval"] == [20.0] * 3 + [30.0]).all()

    near = asof_join(left, right, direction="nearest").toPandas()
    assert len(near) == 5
    assert sorted(near["lval"]) == [0, 1, 2, 3, 4]


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_null_right_values(spark, strategy, direction):
    """A matched right row with NULL in a value column must yield that
    NULL (paired with its own matched_ts) — not an older row's value
    (ADVICE r3: independent per-column ignorenulls fills mixed rows).
    Two value columns with nulls planted on different rows so a
    row-mixing bug is visible in either column."""
    rng = np.random.RandomState(11)
    lts = [T0 + datetime.timedelta(seconds=int(s)) for s in range(30, 3600, 90)]
    lpdf = pd.DataFrame({"entity": "A", "ts": lts, "lval": rng.randn(len(lts))})
    rts = [T0 + datetime.timedelta(minutes=5 * k) for k in range(12)]
    rpdf = pd.DataFrame(
        {
            "entity": "A",
            "ts": rts,
            "rval": rng.randn(len(rts)),
            "rval2": rng.randn(len(rts)),
        }
    )
    rpdf.loc[rpdf.index % 3 == 1, "rval"] = np.nan
    rpdf.loc[rpdf.index % 3 == 2, "rval2"] = np.nan
    got = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        direction=direction,
        strategy=strategy,
    ).toPandas()
    lg, rg = lpdf.sort_values("ts"), rpdf.drop(columns=["entity"]).sort_values("ts")
    rg = rg.assign(matched_ts=rg["ts"])
    want = pd.merge_asof(lg, rg, on="ts", direction=direction)
    assert_frame_close(got, want, keys=["ts"])


def test_asof_multi_hot_routing_value_identity(spark):
    """r6 (VERDICT r5 item 4): asof_join_multi routes hot entities
    through iterated range-bucketed joins; output must EQUAL the fused
    un-routed plan — rows, columns, values — on a skewed input (and
    null-key entities must survive)."""
    from quant_feature_pipeline_spark.operators.asof import asof_join_multi

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("HOT", t0 + datetime.timedelta(seconds=7 * k), float(k)) for k in range(4000)]
    rows += [("C1", t0 + datetime.timedelta(seconds=61 * k), float(100 + k)) for k in range(50)]
    rows += [(None, t0 + datetime.timedelta(seconds=67 * k), float(900 + k)) for k in range(5)]
    left = spark.createDataFrame(pd.DataFrame(rows, columns=["entity", "ts", "lval"]))
    rights = {}
    for j, p in enumerate(("a_", "b_")):
        rr = [
            (e, t0 + datetime.timedelta(minutes=(3 + j) * k), float(10 * j + k))
            for e in ("HOT", "C1", None)
            for k in range(20)
        ]
        rights[p] = spark.createDataFrame(
            pd.DataFrame(rr, columns=["entity", "ts", f"v{j}"])
        )

    def key(pdf):
        return pdf.sort_values(["entity", "ts", "lval"]).reset_index(drop=True)

    want = key(
        asof_join_multi(left, rights, route_hot=False).toPandas()
    )
    got = key(
        asof_join_multi(left, rights, hot_rows=1_000).toPandas()
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == len(rows)
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            assert np.allclose(g.fillna(-1), w.fillna(-1)), c
        else:
            assert g.fillna("ø").equals(w.fillna("ø")) if g.dtype == object else g.equals(w), c
    # tolerance variant too
    want_t = key(asof_join_multi(left, rights, tolerance_s=300, route_hot=False).toPandas())
    got_t = key(asof_join_multi(left, rights, tolerance_s=300, hot_rows=1_000).toPandas())
    assert len(got_t) == len(want_t)
    for c in got_t.columns:
        g, w = got_t[c], want_t[c]
        if g.dtype.kind == "f":
            assert np.allclose(g.fillna(-1), w.fillna(-1)), c
