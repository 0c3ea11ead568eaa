"""Custom stateful streaming operator: incremental EMA/Wilder state via
``applyInPandasWithState`` — the streaming analog of the batch
recurrence stage (SURVEY.md §2.9 'stateful recurrence').

Each entity's group state carries the last EMA values; every
micro-batch folds its (ts-sorted) rows into the recurrences and emits
one output row per input row. This is exactly the reference's
bar-to-bar state carry (`IndicatorCalculator`), lifted into Structured
Streaming with watermark-driven state cleanup.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("ema_fast", T.DoubleType(), True),
        T.StructField("ema_slow", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema_fast", T.DoubleType(), True),
        T.StructField("ema_slow", T.DoubleType(), True),
    ]
)


def _make_fn(fast_span: int, slow_span: int):
    a_f = 2.0 / (fast_span + 1)
    a_s = 2.0 / (slow_span + 1)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ef, es = state.get if state.exists else (None, None)
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="mergesort")
            fast, slow = [], []
            for c in pdf["close"].astype(float):
                ef = c if ef is None else a_f * c + (1 - a_f) * ef
                es = c if es is None else a_s * c + (1 - a_s) * es
                fast.append(ef)
                slow.append(es)
            outs.append(
                pd.DataFrame(
                    {
                        "entity": key[0],
                        "ts": pdf["ts"],
                        "close": pdf["close"],
                        "ema_fast": fast,
                        "ema_slow": slow,
                    }
                )
            )
        state.update((ef, es))
        for o in outs:
            yield o

    return update


def streaming_ema(
    stream: DataFrame,
    fast_span: int = 12,
    slow_span: int = 26,
    watermark: str = "10 minutes",
    by: str = "entity",
    ts_col: str = "ts",
) -> DataFrame:
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(by)
        .applyInPandasWithState(
            _make_fn(fast_span, slow_span),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_asof_backward(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str = "ts",
    by: str = "entity",
    tolerance_s: float | None = None,
    right_prefix: str = "",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming point-in-time enrich: each left row gets the latest
    right row with ``right.ts <= left.ts`` — the streaming analog of the
    batch backward as-of join (operators/asof.py), via
    ``applyInPandasWithState``.

    Mechanics: the two streams are union-tagged; per entity and
    micro-batch the group state carries the LAST right row seen, the
    batch's rights are prepended with that carry row, and one vectorized
    ``pd.merge_asof`` enriches the batch's lefts (never per-row Python).
    The new state is the last right row of (carry + batch rights).

    Exactness contract: equals the batch as-of when event-time order is
    non-decreasing per entity ACROSS micro-batches (replayed ordered
    files, per-entity-ordered Kafka partitions) — the same in-order
    contract the reference's online poll loop assumes. A left row
    arriving before its right rows within one micro-batch is still
    matched exactly (the batch sorts internally); only cross-batch
    late RIGHT rows degrade to processing-time semantics.
    """
    lcols = [c for c in left_stream.columns if c not in (by, on)]
    vcols = [c for c in right_stream.columns if c not in (by, on)]
    out_names = [f"{right_prefix}{c}" for c in vcols]

    l_tag = left_stream.select(
        F.col(by), F.col(on).cast("timestamp").alias(on), F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right_stream.schema[c].dataType).alias(f"_r_{c}") for c in vcols],
    )
    r_tag = right_stream.select(
        F.col(by), F.col(on).cast("timestamp").alias(on), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left_stream.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in vcols],
    )
    u = l_tag.unionByName(r_tag).withWatermark(on, watermark)

    out_schema = T.StructType(
        [left_stream.schema[by], T.StructField(on, T.TimestampType(), True)]
        + [left_stream.schema[c] for c in lcols]
        + [
            T.StructField(o, right_stream.schema[c].dataType, True)
            for c, o in zip(vcols, out_names)
        ]
        + [T.StructField(f"{right_prefix}matched_{on}", T.TimestampType(), True)]
    )
    # state = the latest right row (its ts + value columns)
    state_schema = T.StructType(
        [T.StructField("_rts", T.DoubleType(), True)]  # epoch us (timestamps not allowed in state tuples)
        + [right_stream.schema[c] for c in vcols]
    )
    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s is not None else None
    out_cols = [f.name for f in out_schema.fields]

    def update(key, pdfs, state: GroupState):
        carry = state.get if state.exists else None
        # concat the group's WHOLE micro-batch before sorting: the
        # iterator yields Arrow-sized chunks in arrival order, so a
        # per-chunk sort would process chunk 1's lefts before chunk 2's
        # earlier rights on large (multi-chunk) batches
        chunks = [p for p in pdfs]
        if not chunks:
            return
        merged = (
            pd.concat(chunks, ignore_index=True) if len(chunks) != 1 else chunks[0]
        )
        for pdf in ([merged] if len(merged) else []):
            pdf = pdf.sort_values([on, "_side"], kind="mergesort")
            rights = pdf[pdf["_side"] == 0][[on] + [f"_r_{c}" for c in vcols]]
            if carry is not None and carry[0] is not None:
                crow = pd.DataFrame(
                    {
                        on: [pd.Timestamp(int(carry[0]), unit="us")],
                        **{f"_r_{c}": [carry[1 + i]] for i, c in enumerate(vcols)},
                    }
                )
                # re-sort: a late (out-of-order) carry-vs-batch boundary
                # must not hand merge_asof an unsorted right side
                rights = pd.concat([crow, rights], ignore_index=True).sort_values(
                    on, kind="mergesort"
                )
            lefts = pdf[pdf["_side"] == 1][[on] + lcols].reset_index(drop=True)
            if len(lefts):
                if len(rights):
                    r = rights.rename(columns={f"_r_{c}": o for c, o in zip(vcols, out_names)})
                    r[f"{right_prefix}matched_{on}"] = r[on]
                    res = pd.merge_asof(
                        lefts, r, on=on, direction="backward",
                        allow_exact_matches=True, tolerance=tol,
                    )
                else:
                    res = lefts.copy()
                    for o in out_names:
                        res[o] = None
                    res[f"{right_prefix}matched_{on}"] = pd.NaT
                res.insert(0, by, key[0])
                yield res[out_cols]
            if len(rights):
                last = rights.iloc[-1]
                carry = (
                    float(last[on].value // 1000),
                    *[
                        None if pd.isna(last[f"_r_{c}"]) else last[f"_r_{c}"]
                        for c in vcols
                    ],
                )
        if carry is not None:
            state.update(carry)

    return u.groupBy(by).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_asof_buffered(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str = "ts",
    by: str = "entity",
    tolerance_s: float | None = None,
    right_prefix: str = "",
    watermark: str = "10 minutes",
    max_held_rows: int | None = 10_000_000,
    held_rows_acc=None,
    idle_right_ttl_s: float | None = None,
) -> DataFrame:
    """Watermark-buffered streaming backward as-of join — EXACT event-time
    semantics under cross-batch disorder (VERDICT r3 item 2; the fast
    carry-state variant above assumes per-entity in-order arrival).

    Mechanics per entity group: both sides are buffered in group state;
    a left row is emitted only once the watermark strictly passes its
    timestamp. Spark's watermark filter guarantees no future row (either
    side) can arrive with event time below the watermark, so every
    emitted left has seen ALL rights with ``right.ts <= left.ts`` —
    equality with the batch ``asof_join_union_ffill`` follows for rows
    the watermark has passed, for ANY arrival order. Matching is one
    vectorized ``pd.merge_asof`` per (entity, batch); buffers travel as
    pickled frames in binary state columns. The right buffer is pruned
    to the latest row at-or-below the watermark plus everything newer
    (exactly what any future left can still match); held lefts re-check
    on every batch and on an event-time timeout armed just past the
    earliest held row.

    Finite-replay flush: a stream that simply ENDS leaves lefts inside
    the final watermark window buffered (Spark cannot know no more data
    is coming). Append one far-future RIGHT sentinel row at the end of
    the replay — it emits nothing itself, matches nothing real, and
    advances the watermark past every real left so the event-time
    timeout flushes them (tests/test_boundary_skew.py and the
    streaming_asof_15m gate query drive this).

    Buffers are pickled pandas frames (same-process, same-env replay
    contract as any Spark state checkpoint); a long-lived production
    deployment pinning exact library versions could swap Arrow IPC in
    the same two binary columns.

    State-size contract (VERDICT r4 item 2 — correctness held for any
    watermark, but a misconfigured LARGE watermark had an unbounded-
    state failure mode with no guard or metric):

    - Steady state per entity is O(rows inside the watermark window):
      held lefts drain every time the watermark advances past them, and
      the right buffer keeps only the newest at-or-below-watermark row
      plus above-watermark rows.
    - ``max_held_rows``: HARD per-entity cap on (held lefts + buffered
      rights) after each batch — exceeding it FAILS LOUDLY with the
      observed counts instead of silently pickling an ever-growing
      frame. Size it to arrival_rate x watermark with headroom.
    - ``held_rows_acc``: optional Spark accumulator; every (entity,
      batch) state update adds its post-batch buffered row count, so
      acc.value / batches ~= mean buffered rows — the state-growth
      telemetry surfaced in BENCH.md. At-least-once semantics (added in
      a transformation), telemetry only.
    - Idle entities (ADVICE r4): a group holding only rights used to
      keep them forever once lefts stopped arriving (no timeout armed,
      rows above the watermark never re-pruned). Now a rights-only
      group arms an event-time timeout past its newest right, so the
      next wake re-prunes it down to the single newest candidate row —
      O(1) per idle entity, still exact for any future left.
      ``idle_right_ttl_s`` optionally expires even that candidate after
      the watermark passes it by the TTL (state fully removed; a left
      arriving later than the TTL then gets a null match — an explicit
      retention trade, off by default).
    """
    lcols = [c for c in left_stream.columns if c not in (by, on)]
    vcols = [c for c in right_stream.columns if c not in (by, on)]
    out_names = [f"{right_prefix}{c}" for c in vcols]

    l_tag = left_stream.select(
        F.col(by), F.col(on).cast("timestamp").alias(on), F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right_stream.schema[c].dataType).alias(f"_r_{c}") for c in vcols],
    )
    r_tag = right_stream.select(
        F.col(by), F.col(on).cast("timestamp").alias(on), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left_stream.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in vcols],
    )
    u = l_tag.unionByName(r_tag).withWatermark(on, watermark)

    out_schema = T.StructType(
        [left_stream.schema[by], T.StructField(on, T.TimestampType(), True)]
        + [left_stream.schema[c] for c in lcols]
        + [
            T.StructField(o, right_stream.schema[c].dataType, True)
            for c, o in zip(vcols, out_names)
        ]
        + [T.StructField(f"{right_prefix}matched_{on}", T.TimestampType(), True)]
    )
    state_schema = T.StructType(
        [
            T.StructField("lbuf", T.BinaryType(), True),
            T.StructField("rbuf", T.BinaryType(), True),
        ]
    )
    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s is not None else None
    out_cols = [f.name for f in out_schema.fields]
    rcols_full = [on] + [f"_r_{c}" for c in vcols]
    lcols_full = [on] + lcols

    def _match(key, lefts: pd.DataFrame, rights: pd.DataFrame) -> pd.DataFrame:
        lefts = lefts.sort_values(on, kind="mergesort").reset_index(drop=True)
        if len(rights):
            r = rights.sort_values(on, kind="mergesort").rename(
                columns={f"_r_{c}": o for c, o in zip(vcols, out_names)}
            )
            r[f"{right_prefix}matched_{on}"] = r[on]
            res = pd.merge_asof(
                lefts, r, on=on, direction="backward",
                allow_exact_matches=True, tolerance=tol,
            )
        else:
            res = lefts.copy()
            for o in out_names:
                res[o] = None
            res[f"{right_prefix}matched_{on}"] = pd.NaT
        res.insert(0, by, key[0])
        return res[out_cols]

    def update(key, pdfs, state: GroupState):
        import pickle

        lb, rb = state.get if state.exists else (None, None)
        lefts = pickle.loads(lb) if lb else None
        rights = pickle.loads(rb) if rb else None

        def _append(buf, new):
            # concat only non-empty pieces: pandas deprecates concat
            # with empty/all-NA frames (it would change result dtypes)
            if buf is None or not len(buf):
                return new
            if not len(new):
                return buf
            return pd.concat([buf, new], ignore_index=True)

        chunks = [p for p in pdfs]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            lefts = _append(lefts, batch[batch["_side"] == 1][lcols_full])
            rights = _append(rights, batch[batch["_side"] == 0][rcols_full])
        if lefts is None:
            lefts = pd.DataFrame(columns=lcols_full)
        if rights is None:
            rights = pd.DataFrame(columns=rcols_full)

        wm_ms = state.getCurrentWatermarkMs()
        wm = pd.Timestamp(wm_ms, unit="ms")
        ready = lefts[lefts[on] < wm]
        held = lefts[lefts[on] >= wm]
        if len(ready):
            yield _match(key, ready, rights)
        if len(rights):
            # latest right at-or-below the watermark is still the
            # backward match candidate for any future left; older rows
            # can never be picked again
            older = rights[rights[on] <= wm]
            if len(older):
                rights = rights[rights[on] >= older[on].max()]
        if (
            idle_right_ttl_s is not None
            and not len(held)
            and len(rights)
        ):
            # opt-in retention cut: expire candidates the watermark has
            # passed by more than the TTL (idle entity, no lefts held)
            cutoff = wm - pd.Timedelta(seconds=idle_right_ttl_s)
            rights = rights[rights[on] >= cutoff]
        n_state = len(held) + len(rights)
        if held_rows_acc is not None:
            held_rows_acc.add(int(n_state))
        if max_held_rows is not None and n_state > max_held_rows:
            raise ValueError(
                f"streaming_asof_buffered: entity {key[0]!r} buffers "
                f"{n_state} rows ({len(held)} held lefts + {len(rights)} "
                f"rights) > max_held_rows={max_held_rows}. The watermark "
                f"({watermark!r}) is too large for this arrival rate — "
                "shrink it, raise max_held_rows, or use the in-order "
                "carry-state variant (streaming_asof_backward)"
            )
        if len(held) or len(rights):
            state.update(
                (
                    pickle.dumps(held.reset_index(drop=True)) if len(held) else None,
                    pickle.dumps(rights.reset_index(drop=True)) if len(rights) else None,
                )
            )
            if len(held):
                # flush as soon as the watermark passes the earliest
                # held left (must arm strictly above the current wm)
                t = int(held[on].min().value // 1_000_000) + 1
                state.setTimeoutTimestamp(max(t, wm_ms + 1))
            elif len(rights) > 1 or idle_right_ttl_s is not None:
                # rights-only group (ADVICE r4): arm a wake so the
                # buffer re-prunes as the watermark advances — down to
                # ONE candidate row, or to zero under the TTL. A single
                # candidate with no TTL stays without a timer (O(1)).
                t = int(rights[on].max().value // 1_000_000) + 1
                if idle_right_ttl_s is not None:
                    t += int(idle_right_ttl_s * 1000)
                state.setTimeoutTimestamp(max(t, wm_ms + 1))
        else:
            state.remove()

    return u.groupBy(by).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
