"""Event-time streaming operators: watermarked windowed aggregation, session
windows, and a custom stateful operator.

The reference has no event-time semantics at all (SURVEY.md §2.9 — its only
"stream" is file-arrival batch).  These are the mandated scale extensions: a
100 TB event pipeline needs tumbling/sliding rollups, gap sessionization, and
custom keyed state.  All three transforms are written against the unbound
DataFrame API so the SAME function works on a batch frame (testable against a
DuckDB oracle) and on ``readStream`` input (where the watermark bounds state).

Scale notes: windowed aggregation shuffles on (window, key) with map-side
partial aggregation; session windows shuffle on the session key; state size
is bounded by the watermark horizon — late rows beyond it are dropped, which
is the documented, deliberate semantics.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default state-store instance count for the repo's stateful streaming
# queries.  A stateful operator keeps ONE state store per shuffle
# partition (a stream-stream join keeps FOUR), and each store pays
# per-micro-batch checkpoint commit I/O whether or not it holds data —
# so the drain cost of a small-state query scales with the partition
# count, not the data (guide §2: size partitioning to the data).  At the
# bench's ~10k-key state, 32 partitions measured 8.5 s vs 2.7 s at 8 on
# identical code/results (r17).  Production sizes this to state volume /
# throughput: keys × bytes-per-key / ~100 MB per store is a reasonable
# starting point, raised for write throughput.
DEFAULT_STATE_PARTITIONS = 8


@contextmanager
def sized_state_partitions(spark, partitions: "int | None" = None):
    """Pin ``spark.sql.shuffle.partitions`` — the only OSS-Spark knob
    that sets a streaming query's state-store instance count, fixed at
    the query's FIRST checkpoint — for the duration of a streaming query
    start, restoring the caller's batch setting afterwards.

    This lives in the LIBRARY (r17 verdict item: the sizing rationale
    belongs with the operator, not in a bench harness) but must wrap the
    caller's ``writeStream.start()``: Spark reads the conf when the
    query is planned, not when the operator's DataFrame is built, and a
    builder function that mutated the session conf could not restore it
    without also un-sizing the query it just built.  Usage::

        with sized_state_partitions(spark):           # env/default sizing
            q = stream_stream_join(l, r).writeStream...start()
            q.awaitTermination()

    ``partitions`` defaults to ``$SPARK_GRAFT_STREAM_STATE_PARTITIONS``
    (itself defaulting to :data:`DEFAULT_STATE_PARTITIONS`) so deploys
    size it per state volume without code changes.  Yields the effective
    count so harnesses can record the measured configuration.
    """
    n = int(
        partitions
        if partitions is not None
        else os.environ.get(
            "SPARK_GRAFT_STREAM_STATE_PARTITIONS", DEFAULT_STATE_PARTITIONS
        )
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    time_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) windowed count+sum per
    key — the hypertable-rollup shape.

    On a stream the watermark bounds aggregation state and admits late rows
    up to the horizon; on a batch frame the watermark is a no-op and the
    result equals a GROUP BY time-bucket.
    """
    if watermark is not None and events.isStreaming:
        events = events.withWatermark(time_col, watermark)
    win = (
        F.window(time_col, window_duration, slide)
        if slide
        else F.window(time_col, window_duration)
    )
    return (
        events.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    time_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows (native ``session_window`` — dynamic,
    per-key, merged by the engine; no lag+cumsum reimplementation needed).

    Works identically on batch and stream; the batch form is oracle-checked
    against the classic lag+cumsum SQL formulation.
    """
    if watermark is not None and events.isStreaming:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(F.session_window(time_col, gap).alias("sw"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key streaming deduplication.

    ``dropDuplicates`` on a stream keeps per-key state forever unless
    bounded; ``dropDuplicatesWithinWatermark`` expires state past the
    watermark horizon — duplicates arriving within the horizon are dropped,
    state stays O(keys-per-horizon).  On a batch frame this degrades to a
    plain dropDuplicates.
    """
    key_cols = key_cols or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: "str | None" = None,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the most common production
    enrichment shape (fact stream ⋈ dimension table): every micro-batch
    joins against the STATIC side, which needs no watermark and holds
    no state (Spark re-plans the static side per micro-batch, so a
    dimension backed by a table picks up slowly-changing updates at
    micro-batch granularity).

    ``broadcast=True`` pins the dimension to the build side of a
    BroadcastHashJoin in every micro-batch plan — the 100 TB shape: the
    fact stream never shuffles for the join; the bounded dimension
    ships to executors once per plan.  ``how="left"`` keeps unmatched
    facts (enrichment must never drop events).

    Works identically on a batch frame (oracle-testable) and a
    ``readStream`` input — the batch ≡ stream pin lives in
    tests/test_streaming_windows.py.
    """
    dim_key = dim_key or key
    d = dim.withColumnRenamed(dim_key, key) if dim_key != key else dim
    if broadcast:
        d = F.broadcast(d)
    return events.join(d, key, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    watermark: str = "1 hour",
    within: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: right events within ``within``
    AFTER the left event, per key (the impression⋈click attribution shape).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store retains each side only for
    watermark+within — the requirement for an unbounded stream⋈stream join
    to run with bounded state.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_time).alias("l_ts"),
        *[c for c in left.columns if c not in (key, left_time)],
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_time).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, right_time)
        ],
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
    )


# ------------------------------------------------------- custom state op ----

RUNNING_STATS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _running_stats_fn(key, pdf_iter: Iterator[pd.DataFrame], state):
    """Keyed running totals: count + sum carried in GroupState across
    micro-batches.  Emits one updated row per key per batch."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) that survives across micro-batches.

    This is the extension surface for operators Spark lacks natively —
    the state is an arbitrary tuple, the emit policy is ours, and the
    runtime handles shuffling keys to state partitions, checkpointing the
    state store, and Arrow-batching rows in and out.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_stats_fn,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------- stateful sessions ----

SESSION_STATS_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
_SESSION_STATE_SCHEMA = "n_sessions bigint, last_ts bigint, n_events bigint"
_SESSION_GAP_US = 30 * 60 * 1_000_000


def _make_sessionize_fn(idle_timeout_ms: "int | None"):
    """Build the per-user session fold (closure-captured TTL so the
    worker-side re-import of this module can't lose the setting)."""

    def _sessionize_fn(key, pdf_iter: Iterator[pd.DataFrame], state):
        """Per-user session folding continued across micro-batches: the
        30-minute-gap boundary rule of the batch ``q_sessionize``
        operator, with (session count, last event timestamp, event
        count) carried in GroupState.  Rows within a batch fold in
        (ts, event_id) order."""
        (user_id,) = key
        if state.hasTimedOut:
            # Idle-user eviction (opt-in TTL): the cumulative counts
            # were already emitted with the user's last event; drop the
            # state row and emit nothing.  A later event restarts the
            # fold from zero — the TTL caller accepts that by
            # definition (the batch operator remains the authority for
            # complete history).
            if state.exists:
                state.remove()
            return
        if state.exists:
            n_sessions, last_ts, n_events = state.get
        else:
            n_sessions, last_ts, n_events = 0, 0, 0
        parts = [pdf for pdf in pdf_iter if len(pdf)]
        if parts:
            batch = pd.concat(parts).sort_values(["ts", "event_id"])
            for ts_us in batch["ts"].astype("int64") // 1000:
                ts_us = int(ts_us)
                if n_events == 0:
                    n_sessions = 1
                elif ts_us - last_ts > _SESSION_GAP_US:
                    n_sessions += 1
                last_ts = ts_us
                n_events += 1
            state.update((n_sessions, last_ts, n_events))
            if idle_timeout_ms:
                state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return _sessionize_fn


def stream_sessionize(
    events: DataFrame, idle_timeout_ms: "int | None" = None
) -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState``:
    the batch lag+cumsum sessionizer re-expressed as an incremental
    per-user fold whose boundary state (last event time, session count)
    survives micro-batches — the canonical custom stateful operator the
    built-in windowed aggregations can't express (the boundary depends
    on the PREVIOUS event, not a fixed window).

    Contract: per-user event-time order ACROSS batches (the
    incremental-ingest reality — logs land roughly time-ordered; batch
    reprocessing remains the authority for out-of-order history).  A
    late-delivered earlier event UNDERCOUNTS: its gap against the
    already-folded later event is negative, so it merges into the open
    session instead of standing as its own past session
    (negative-control pinned).
    Within a batch, rows fold in (ts, event_id) order regardless of
    arrival order.  The final update per user is row-exact with the
    batch ``q_sessionize`` output — pinned in
    tests/test_streaming_windows.py against the oracled batch operator
    on the shared testdata.

    State TTL: by default per-user GroupState is kept forever (exact
    counts for every user, state-store size ∝ live user cardinality —
    fine for bounded keyspaces, unbounded growth on a long-running
    query over an open one).  Pass ``idle_timeout_ms`` to evict users
    idle for that much PROCESSING time: their cumulative counts were
    already emitted, but a user returning after eviction restarts from
    zero — choose a TTL comfortably above the real inter-visit gap, and
    treat the batch operator as the authority for complete history.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", F.col("ts").cast("timestamp"), "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_fn(idle_timeout_ms),
            outputStructType=SESSION_STATS_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


SESSION_WINDOW_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, "
    "n_events bigint"
)
_SESSION_WINDOW_STATE_SCHEMA = "cur_start bigint, last_ts bigint, n bigint"


def _session_windows_fn(key, pdf_iter: Iterator[pd.DataFrame], state):
    """Append-mode companion of ``_sessionize_fn``: emit each session
    WHEN IT CLOSES (a later event arrives past the gap, or the state
    times out with no successor), carrying the open session in
    GroupState.  Timestamps emitted in epoch microseconds."""
    (user_id,) = key

    def _row(start, end, n):
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [start],
                "session_end": [end],
                "n_events": [n],
            }
        )

    if state.hasTimedOut:
        if state.exists:
            cur_start, last_ts, n = state.get
            state.remove()
            yield _row(cur_start, last_ts, n)
        return
    if state.exists:
        cur_start, last_ts, n = state.get
    else:
        cur_start, last_ts, n = None, None, 0
    closed = []
    parts = [pdf for pdf in pdf_iter if len(pdf)]
    if parts:
        batch = pd.concat(parts).sort_values(["ts", "event_id"])
        for ts_us in batch["ts"].astype("int64") // 1000:
            ts_us = int(ts_us)
            if n == 0:
                cur_start, last_ts, n = ts_us, ts_us, 1
            elif ts_us - last_ts > _SESSION_GAP_US:
                closed.append((cur_start, last_ts, n))
                cur_start, last_ts, n = ts_us, ts_us, 1
            else:
                last_ts, n = ts_us, n + 1
    if n > 0:
        state.update((cur_start, last_ts, n))
        # Flush the trailing open session if no successor arrives within
        # twice the gap of PROCESSING time (event-time watermark flushing
        # needs EventTimeTimeout + a watermark; processing-time is the
        # availableNow-friendly choice and the contract is documented).
        state.setTimeoutDuration(2 * _SESSION_GAP_US // 1000)
    for start, end, cnt in closed:
        yield _row(start, end, cnt)


def stream_session_windows(events: DataFrame) -> DataFrame:
    """Closed-session stream: append-mode emission of each per-user
    session (start, end, event count) the moment a later event proves
    it over — the stateful pattern behind funnel/session analytics on
    live streams, inexpressible with fixed windows because the close
    condition depends on the NEXT event.

    Sessions still open at the end of a run stay in state (flushed by a
    processing-time timeout when the stream idles); the batch
    sessionizer remains the authority for complete history.  Pinned:
    the closed-session stream over time-ordered micro-batches equals
    the batch session table minus each user's final (possibly-open)
    session, row-exact on shared testdata.

    Stall caveat (load-bearing): the open-session flush fires on 2×-gap
    PROCESSING time, not event time.  During an ingest stall or backlog
    (no micro-batch for >2× the gap while events keep accruing
    upstream), a genuinely continuous EVENT-time session can be flushed
    as closed and then restarted by its next event — one session
    double-counted.  The 'batch minus final session' equality therefore
    holds only while ingest keeps pace (the pinned test polls before
    timeouts fire).  Where append-stream exactness under lag matters,
    use the NATIVE event-time path instead: ``session_window_stats`` in
    append mode (watermark + ``session_window``) closes a session only
    when the event-time watermark passes its end — stall-immune by
    construction, pinned in test_streaming_windows.
    test_native_session_window_append_event_time_closure.  Processing-
    time is the availableNow-friendly default HERE because availableNow
    drains and idles, which is exactly when the flush SHOULD fire; this
    custom operator earns its keep where the emitted row must carry
    state the native session aggregate cannot.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", F.col("ts").cast("timestamp"), "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_windows_fn,
            outputStructType=SESSION_WINDOW_SCHEMA,
            stateStructType=_SESSION_WINDOW_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
