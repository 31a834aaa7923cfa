"""Event-time streaming: watermarked windowed aggregation and the custom
stateful operator, driven through real ``readStream`` micro-batches.

The batch-mode equivalence of these transforms is oracle-checked in
``test_oracle_parity`` (``windowed_counts`` / ``session_window_stats``);
here we assert the STREAMING semantics: micro-batch accumulation, state
carried across batches, and update-mode emission.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline2_0_spark.streaming.windows import (
    running_user_stats,
    windowed_event_counts,
)

EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"

BATCH_1 = [
    (1, "2024-01-01 10:05:00", 1, "click", 1.0),
    (2, "2024-01-01 10:20:00", 1, "click", 2.0),
    (3, "2024-01-01 11:10:00", 2, "view", 3.0),
]
BATCH_2 = [
    (4, "2024-01-01 10:40:00", 2, "click", 4.0),  # late but within watermark
    (5, "2024-01-01 11:30:00", 1, "view", 5.0),
]


def _write_batch(spark, rows, path):
    raw = "event_id bigint, ts string, user_id bigint, event_type string, value double"
    df = spark.createDataFrame(rows, raw).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_streaming(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_batch(spark, BATCH_1, src)
    _write_batch(spark, BATCH_2, src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = windowed_event_counts(stream, window_duration="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got[("2024-01-01 10:00:00", "click")] == 3  # incl. late event 4
    assert got[("2024-01-01 11:00:00", "view")] == 2


def test_running_user_stats_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_batch(spark, BATCH_1, src)
    _write_batch(spark, BATCH_2, src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM user_stats").collect()
    # Update mode emits one row per key per batch; the LAST emission per key
    # carries the accumulated state across micro-batches.
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["n_events"], r["total_value"])
    assert last[1] == (3, pytest.approx(8.0))  # 1.0 + 2.0 (+5.0 in batch 2)
    assert last[2] == (2, pytest.approx(7.0))  # 3.0 (+4.0)
    # State genuinely accumulated (not recomputed per batch): more emitted
    # rows than keys proves multiple micro-batches fired.
    assert len(rows) > len(last)


def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "events")
    # event 2 duplicated across batches; both copies within the watermark.
    _write_batch(spark, BATCH_1, src)
    _write_batch(spark, [BATCH_1[1], (9, "2024-01-01 11:40:00", 2, "view", 9.0)], src)

    from etl_pipeline2_0_spark.streaming.windows import streaming_dedup

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dedup(stream, key_cols=["event_id"], watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [r["event_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()]
    assert sorted(ids) == [1, 2, 3, 9]  # duplicate of 2 dropped across batches


def test_stream_stream_join_attribution(spark, tmp_path):
    from etl_pipeline2_0_spark.streaming.windows import stream_stream_join

    purchases = [(1, "2024-01-01 10:00:00", 1, "purchase", 1.0)]
    follows = [
        (2, "2024-01-01 10:10:00", 1, "view", 2.0),   # within 30 min
        (3, "2024-01-01 11:10:00", 1, "view", 3.0),   # outside
        (4, "2024-01-01 10:10:00", 2, "view", 4.0),   # wrong user
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_batch(spark, purchases, lsrc)
    _write_batch(spark, follows, rsrc)

    left = spark.readStream.schema(EVENTS_SCHEMA).parquet(lsrc)
    right = spark.readStream.schema(EVENTS_SCHEMA).parquet(rsrc)
    joined = stream_stream_join(
        left, right, key="user_id", watermark="1 hour", within="30 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ss_join").collect()
    assert len(rows) == 1
    assert rows[0]["r_event_id"] == 2


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Batch ≡ stream row-exactness for the watermarked interval join:
    the same inputs joined as plain DataFrames (the function skips
    watermarks on non-streaming sides) and as two file streams drained
    one file per micro-batch must produce identical row sets — matches
    spanning micro-batch boundaries included (right rows land in later
    files than their left partners)."""
    from etl_pipeline2_0_spark.streaming.windows import stream_stream_join

    purchases = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.0),
        (2, "2024-01-01 12:00:00", 2, "purchase", 2.0),
    ]
    follows_a = [(3, "2024-01-01 10:10:00", 1, "view", 3.0)]   # match for 1
    follows_b = [
        (4, "2024-01-01 12:25:00", 2, "view", 4.0),            # match for 2
        (5, "2024-01-01 12:45:00", 2, "view", 5.0),            # outside 30m
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_batch(spark, purchases, lsrc)
    _write_batch(spark, follows_a, rsrc)
    _write_batch(spark, follows_b, rsrc)

    def key_set(rows):
        return sorted((r["event_id"], r["r_event_id"]) for r in rows)

    batch = key_set(
        stream_stream_join(
            spark.read.parquet(lsrc), spark.read.parquet(rsrc),
            key="user_id", watermark="1 hour", within="30 minutes",
        ).collect()
    )
    left = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(lsrc)
    right = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(rsrc)
    q = (
        stream_stream_join(
            left, right, key="user_id",
            watermark="1 hour", within="30 minutes",
        )
        .writeStream.format("memory")
        .queryName("ss_join_eqv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = key_set(spark.sql("SELECT * FROM ss_join_eqv").collect())
    assert streamed == batch == [(1, 3), (2, 4)]


def test_stream_stream_join_drops_late_rows(spark, tmp_path):
    """Late-data semantics: after the watermark advances past an event's
    join window, a matching right-side row that arrives in a LATER
    micro-batch run (same checkpoint) is dropped — bounded state means
    the join CANNOT emit it — while in-time pairs in the same late file
    still join."""
    from etl_pipeline2_0_spark.streaming.windows import stream_stream_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        # A FILE sink (memory sinks cannot recover a checkpoint): the
        # shared checkpoint is the point — run 2 resumes the watermark
        # run 1 advanced.
        left = spark.readStream.schema(EVENTS_SCHEMA).parquet(lsrc)
        right = spark.readStream.schema(EVENTS_SCHEMA).parquet(rsrc)
        q = (
            stream_stream_join(
                left, right, key="user_id",
                watermark="1 hour", within="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["event_id"], r["r_event_id"])
            for r in spark.read.parquet(out).collect()
        )

    # Run 1: a 10:00 purchase, and 20:00 activity on BOTH sides pushing
    # the event-time watermark to ~19:00 — far past 10:00's join window.
    _write_batch(spark, [(1, "2024-01-01 10:00:00", 1, "purchase", 1.0),
                         (2, "2024-01-01 20:00:00", 9, "purchase", 0.0)], lsrc)
    _write_batch(spark, [(3, "2024-01-01 20:00:00", 9, "view", 0.0)], rsrc)
    drain()

    # Run 2 (same checkpoint): a right-side view at 10:10 that WOULD have
    # matched purchase 1 arrives below the watermark -> dropped; an
    # in-time view at 20:10 for user 9 still joins.
    _write_batch(spark, [(4, "2024-01-01 10:10:00", 1, "view", 4.0),
                         (5, "2024-01-01 20:10:00", 9, "view", 5.0)], rsrc)
    got = drain()
    assert (1, 4) not in got           # late row dropped, state bounded
    assert (2, 5) in got               # in-time row in the same file joins


def test_continuous_rollup_matches_batch(spark, tmp_path):
    from etl_pipeline2_0_spark.streaming.rollup import continuous_rollup, read_rollup
    from etl_pipeline2_0_spark.streaming.windows import windowed_event_counts

    src = str(tmp_path / "events")
    out = str(tmp_path / "rollup")
    _write_batch(spark, BATCH_1, src)
    _write_batch(spark, BATCH_2, src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = continuous_rollup(spark, stream, out, available_now=True)
    q.awaitTermination(120)

    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in read_rollup(spark, out).collect()
    }
    batch_equiv = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(
            spark.read.parquet(src), window_duration="1 hour"
        ).collect()
    }
    # Incremental partials recombine to exactly the batch-mode rollup, and
    # the window key format matches (both 'yyyy-MM-dd HH:mm:ss').
    assert {k: (n, pytest.approx(s)) for k, (n, s) in got.items()} == batch_equiv

    # New data arrives -> restart from the same checkpoint processes ONLY
    # the new file; totals update incrementally.
    _write_batch(spark, [(6, "2024-01-01 10:50:00", 3, "click", 6.0)], src)
    q2 = continuous_rollup(spark, stream, out, available_now=True)
    q2.awaitTermination(120)
    updated = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in read_rollup(spark, out).collect()
    }
    assert updated[("2024-01-01 10:00:00", "click")] == 4  # was 3


def test_quality_gate_stream_matches_batch(spark, tmp_path):
    # The composed quality gate (corpus_filter's expressions) is pure
    # stateless narrow ops, so streaming it through micro-batches must
    # produce exactly the batch result rows — the §2.9 contract for the
    # curation path.
    from etl_pipeline2_0_spark.functions.text import quality_gate

    docs_schema = "doc_id bigint, text string"
    rows1 = [
        (1, "the cat and the dog sat on the mat for a while and then the "
            "mouse ran in to the house with the cheese for the winter"),
        (2, "el perro y el gato en la casa"),
    ]
    rows2 = [
        (3, "the quick brown fox jumps over the lazy dog and the slow "
            "turtle walks past the quiet pond toward the old barn door"),
        (4, "short"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows1, docs_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows2, docs_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    batch_out = {
        r["doc_id"]: (r["pred_lang"], r["n_tokens"], r["quality"])
        for r in quality_gate(spark.read.parquet(src)).collect()
    }

    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        quality_gate(stream)
        .writeStream.format("memory")
        .queryName("qgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = {
        r["doc_id"]: (r["pred_lang"], r["n_tokens"], r["quality"])
        for r in spark.sql("SELECT * FROM qgate").collect()
    }
    assert stream_out == batch_out
    assert set(batch_out) == {1, 3}  # es doc and short doc gated out


def test_stream_sessionize_equals_batch_on_testdata(spark, tmp_path):
    """The stateful streaming sessionizer's final per-user update equals
    the oracled batch q_sessionize row-exactly on the real sf0.001
    events table, replayed as three time-ordered micro-batches (the
    in-order-ingest contract); session boundaries that STRADDLE batch
    boundaries are carried by GroupState, which is the whole point."""
    import os

    from pyspark.sql import functions as F

    from etl_pipeline2_0_spark.plans.relational import q_sessionize
    from etl_pipeline2_0_spark.streaming.windows import stream_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ordered = events.orderBy("ts", "event_id").collect()
    assert len(ordered) > 100
    third = len(ordered) // 3
    src = str(tmp_path / "ev")
    os.makedirs(src)
    import time

    for i, chunk in enumerate(
        [ordered[:third], ordered[third: 2 * third], ordered[2 * third:]]
    ):
        d = os.path.join(src, f"b{i}")
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(d)
        t = time.time() - 100 + i * 10
        for root, _, files in os.walk(d):
            for fname in files:
                os.utime(os.path.join(root, fname), (t, t))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sessions_stream").collect()
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["n_sessions"], r["n_events"])
    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_sessionize(spark, "/root/testdata/sf0.001").collect()
    }
    assert last == batch
    # multiple micro-batches really fired (state carried, not recomputed)
    assert len(rows) > len(last)


def test_stream_session_windows_closed_equals_batch_reference(spark, tmp_path):
    """The closed-session append stream over three time-ordered
    micro-batches equals an independent Python sessionization of the
    same events MINUS each user's final (still-open) session — start,
    end, and event count all row-exact."""
    import os
    import time

    from etl_pipeline2_0_spark.streaming.windows import (
        _SESSION_GAP_US,
        stream_session_windows,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ordered = events.orderBy("ts", "event_id").collect()
    third = len(ordered) // 3
    src = str(tmp_path / "ev")
    os.makedirs(src)
    for i, chunk in enumerate(
        [ordered[:third], ordered[third: 2 * third], ordered[2 * third:]]
    ):
        d = os.path.join(src, f"b{i}")
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(d)
        t = time.time() - 100 + i * 10
        for root, _, files in os.walk(d):
            for fname in files:
                os.utime(os.path.join(root, fname), (t, t))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    # independent Python reference, computed FIRST so the stream wait
    # can poll for the expected count: a query holding pending
    # ProcessingTimeTimeout state NEVER self-terminates under
    # availableNow (it stays alive to fire the flush timeouts), so
    # awaitTermination would burn its full budget and leak an active
    # query — poll the sink, then stop() explicitly.
    per_user: dict = {}
    for r in ordered:
        ts_us = int(r["ts"].timestamp() * 1_000_000)
        per_user.setdefault(r["user_id"], []).append(ts_us)
    expected = set()
    for uid, tss in per_user.items():
        sessions = []
        start = last = tss[0]
        n = 1
        for ts in tss[1:]:
            if ts - last > _SESSION_GAP_US:
                sessions.append((uid, start, last, n))
                start, n = ts, 0
            last = ts
            n += 1
        expected.update(sessions)
    assert len(expected) > 0  # non-vacuous: real closed sessions exist

    q = (
        stream_session_windows(stream)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if (
                spark.sql("SELECT COUNT(*) FROM closed_sessions").first()[0]
                >= len(expected)
            ):
                break
            time.sleep(2)
        got = {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in spark.sql("SELECT * FROM closed_sessions").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_sessionize_out_of_order_contract_documented(spark, tmp_path):
    """Negative control for the documented in-order-per-user contract:
    delivering a user's EARLIER event in a LATER batch UNDERCOUNTS
    sessions vs the batch sessionizer — the late event's gap against
    the already-folded later event is negative, so it merges into the
    current session instead of standing as its own past session.
    Proves the contract is load-bearing, not boilerplate.  Within a
    single batch, order does NOT matter (the fold sorts)."""
    import os
    import time

    from etl_pipeline2_0_spark.streaming.windows import stream_sessionize

    from datetime import datetime

    schema = "event_id bigint, ts timestamp, user_id bigint"
    # user 1: two events 60 min apart (TWO sessions in batch
    # semantics), delivered in reverse order across two micro-batches.
    b1 = [(2, datetime(2024, 1, 1, 11, 0), 1)]
    b2 = [(1, datetime(2024, 1, 1, 10, 0), 1)]
    src = str(tmp_path / "ev")
    os.makedirs(src)
    for i, b in enumerate([b1, b2]):
        d = os.path.join(src, f"b{i}")
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(d)
        t = time.time() - 100 + i * 10
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("ooo_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    last = {}
    for r in spark.sql("SELECT * FROM ooo_sessions").collect():
        last[r["user_id"]] = (r["n_sessions"], r["n_events"])
    # batch semantics: 2 sessions; the out-of-order replay merges the
    # late event into the open session — the documented divergence.
    assert last[1] == (1, 2)
    # same events in ONE batch (any file order): correct TWO sessions
    src2 = str(tmp_path / "ev_one")
    os.makedirs(src2)
    spark.createDataFrame(b1 + b2, schema).coalesce(1).write.parquet(
        os.path.join(src2, "all")
    )
    stream2 = (
        spark.readStream.schema(schema).parquet(src2 + "/all")
    )
    q2 = (
        stream_sessionize(stream2)
        .writeStream.format("memory")
        .queryName("one_batch_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("SELECT * FROM one_batch_sessions").collect()
    assert {(r["n_sessions"], r["n_events"]) for r in rows} == {(2, 2)}


def test_stream_sessionize_idle_ttl_wiring(spark, tmp_path):
    """The opt-in idle-user TTL (advisor-r13): with ``idle_timeout_ms``
    set, the query runs on ProcessingTimeTimeout (setTimeoutDuration is
    exercised every update) and — with a TTL far above the test's
    runtime — produces exactly the no-TTL per-user finals, since
    eviction only changes behavior when it fires.  Poll-and-stop:
    pending processing-time timeouts keep an availableNow query alive
    past its backlog."""
    import datetime as dt
    import os
    import time

    from etl_pipeline2_0_spark.streaming.windows import stream_sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def _ev(uid, offset_s, eid):
        return (uid, t0 + dt.timedelta(seconds=offset_s), eid)

    # user 1: two events in session one, one event 40 min later (new
    # session); user 2: two events five minutes apart (one session)
    b0 = [_ev(1, 0, 1), _ev(1, 10, 2), _ev(2, 0, 3)]
    b1 = [_ev(1, 40 * 60, 4), _ev(2, 5 * 60, 5)]
    src = str(tmp_path / "ev")
    os.makedirs(src)
    schema = "user_id bigint, ts timestamp, event_id bigint"
    for i, chunk in enumerate([b0, b1]):
        d = os.path.join(src, f"b{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(d)
        t = time.time() - 100 + i * 10
        for root, _, files in os.walk(d):
            for fname in files:
                os.utime(os.path.join(root, fname), (t, t))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        stream_sessionize(stream, idle_timeout_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("sessions_ttl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # each micro-batch updates both users -> 4 sink rows total
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql(
                "SELECT COUNT(*) FROM sessions_ttl"
            ).first()[0] >= 4:
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM sessions_ttl").collect()
    finally:
        q.stop()
    # n_events is cumulative, so the final update per user is its max
    final = {}
    for r in rows:
        if (
            r["user_id"] not in final
            or r["n_events"] > final[r["user_id"]][1]
        ):
            final[r["user_id"]] = (r["n_sessions"], r["n_events"])
    assert final == {1: (2, 3), 2: (1, 2)}


def test_native_session_window_append_event_time_closure(spark, tmp_path):
    """The EVENT-TIME closed-session path (the stall-robust complement of
    stream_session_windows' processing-time timeout, cf. its documented
    caveat): native ``session_window`` + watermark in APPEND mode emits a
    session exactly when the event-time watermark passes its end —
    ingest stalls cannot close a live session early, and the emitted rows
    equal the batch sessionization of the closed subset.

    Batch A opens sessions for users 1 and 2; batch B carries a much
    later event whose watermark (2h behind max event time) passes both
    A-sessions' ends -> both emit closed; B's own session stays open and
    is NOT emitted."""
    from etl_pipeline2_0_spark.streaming.windows import session_window_stats

    src = str(tmp_path / "events_native_sess")
    batch_a = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:10:00", 1, "view", 1.0),   # same session (gap 30m)
        (3, "2024-01-01 10:05:00", 2, "click", 1.0),
    ]
    batch_b = [
        (4, "2024-01-01 20:00:00", 1, "click", 1.0),  # watermark -> 18:00
    ]
    _write_batch(spark, batch_a, src)
    _write_batch(spark, batch_b, src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = session_window_stats(stream, gap="30 minutes", watermark="2 hours")
    q = (
        sess.writeStream.format("memory")
        .queryName("native_sess_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r
        for r in spark.table("native_sess_append").collect()
    }
    # exactly the two batch-A sessions closed; 20:00 session still open
    assert set(got) == {
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:05:00"),
    }
    assert got[(1, "2024-01-01 10:00:00")]["n_events"] == 2
    # session end = last event + gap (native session_window semantics)
    assert got[(1, "2024-01-01 10:00:00")]["session_end"] == "2024-01-01 10:40:00"
    assert got[(2, "2024-01-01 10:05:00")]["n_events"] == 1
    # and the closed rows equal the BATCH sessionization of the same subset
    batch = {
        (r["user_id"], r["session_start"]): r
        for r in session_window_stats(
            spark.read.parquet(src), gap="30 minutes"
        ).collect()
        if r["session_end"] <= "2024-01-01 18:00:00"  # watermark horizon
    }
    assert set(batch) == set(got)
    for k in got:
        assert got[k]["n_events"] == batch[k]["n_events"]
        assert got[k]["session_end"] == batch[k]["session_end"]


def test_stream_static_enrich_matches_batch_and_broadcasts(spark, tmp_path):
    """r15 verdict item 5a: the stream-static broadcast enrichment join —
    every micro-batch plan must put the dimension on the build side of a
    BroadcastHashJoin (the fact stream never shuffles), unmatched facts
    survive (left join), and the drained stream result is row-exactly the
    batch join of the same files."""
    src = str(tmp_path / "events")
    _write_batch(spark, BATCH_1, src)
    _write_batch(spark, BATCH_2, src)
    # user 2 has no dimension row -> left join keeps its events unenriched
    dim = spark.createDataFrame(
        [(1, "BRAZIL", "BUILDING")],
        "user_id bigint, nation string, segment string",
    )

    from etl_pipeline2_0_spark.streaming.windows import stream_static_enrich

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = stream_static_enrich(stream, dim, key="user_id")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the BROADCAST pin: the micro-batch physical plan builds the
    # dimension side of a BroadcastHashJoin (the fact stream never
    # shuffles for the join)
    mb_plan = q._jsq.explainInternal(True)
    assert "BroadcastHashJoin" in mb_plan
    assert "SortMergeJoin" not in mb_plan

    want = stream_static_enrich(spark.read.parquet(src), dim, key="user_id")
    cols = want.columns
    got = spark.sql("SELECT * FROM enrich_stream").select(*cols)
    got_rows = sorted(map(repr, got.collect()))
    want_rows = sorted(map(repr, want.collect()))
    assert got_rows == want_rows and len(got_rows) == 5
    # every event survived; user 2's rows carry null enrichment
    assert got.where(F.col("nation").isNull()).count() == 2
    # batch parity of the same helper (the oracle-testable form)
    assert "BroadcastHashJoin" in want._jdf.queryExecution().executedPlan().toString()


def test_streaming_dedup_native_matches_handrolled_ingest(spark, tmp_path):
    """r15 verdict item 5b: the native streaming-dedup primitive
    (dropDuplicatesWithinWatermark on the content hash) must keep exactly
    the same CONTENT set as the hand-rolled checkpointed
    stream_dedup_ingest loop and as the batch exact dedup, on the same
    two-file backlog with intra-batch AND cross-batch duplicates.
    (Which copy survives may differ — the pin is on content.)"""
    rows_1 = [
        (1, "2024-01-01 10:00:00", "alpha document about spark joins"),
        (2, "2024-01-01 10:05:00", "totally different text on parquet files"),
        (3, "2024-01-01 10:10:00", "alpha document about spark joins"),
    ]
    rows_2 = [
        (4, "2024-01-01 10:20:00", "alpha document about spark joins"),
        (5, "2024-01-01 10:25:00", "a third unrelated subject entirely"),
    ]
    src = str(tmp_path / "docs")
    raw = "doc_id bigint, ts string, text string"
    for rows in (rows_1, rows_2):
        spark.createDataFrame(rows, raw).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(src)
    schema = "doc_id bigint, ts timestamp, text string"

    from etl_pipeline2_0_spark.streaming.dedup_ingest import (
        stream_dedup_ingest,
    )
    from etl_pipeline2_0_spark.streaming.windows import streaming_dedup

    # 1. native: dropDuplicatesWithinWatermark keyed on the content hash
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("content_hash", F.md5(F.coalesce("text", F.lit(""))))
    )
    q = (
        streaming_dedup(stream, key_cols=["content_hash"], watermark="2 hours")
        .writeStream.format("memory")
        .queryName("native_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    native = spark.sql("SELECT text FROM native_dedup_stream").collect()

    # 2. hand-rolled: the checkpointed ingest loop (threshold high enough
    #    that the near-dup probe drops nothing among these distinct texts)
    corpus = str(tmp_path / "corpus")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = stream_dedup_ingest(
        stream2,
        corpus_path=corpus,
        checkpoint=str(tmp_path / "ck2"),
        text_col="text",
        id_col="doc_id",
        threshold=0.9,
    )
    q2.awaitTermination(120)
    handrolled = spark.read.parquet(corpus).select("text").collect()

    # 3. batch oracle
    batch = spark.read.parquet(src).dropDuplicates(["text"]).select("text").collect()

    expect = {
        "alpha document about spark joins",
        "totally different text on parquet files",
        "a third unrelated subject entirely",
    }
    for got in (native, handrolled, batch):
        texts = [r["text"] for r in got]
        assert sorted(texts) == sorted(set(texts)), "a duplicate survived"
        assert set(texts) == expect
