"""Per-user sessionization — the custom stateful streaming operator.

The reference has no stateful stream processing at all (SURVEY.md §2.10);
this is the training-pipeline extension: group events by user, close a
session when ``gap`` elapses between consecutive events, emit
(user_id, session_start, session_end, n_events, sum_value).

Two implementations with identical semantics:
  * sessionize_batch — pure DataFrame ops (lag -> gap flag -> running sum
    session id -> groupBy), DuckDB-oracle-checkable, used for backfills.
  * sessionize_stream_fn — an ``applyInPandasWithState`` update function
    for Structured Streaming: state carries the open session per user;
    arrival of an event beyond the gap (or processing-timeout expiry)
    emits the closed session. Exactly the
    ``flatMapGroupsWithState``-style operator the reference's thread-based
    design could never express.

Hot-key note (tested in test_sessionize_batch_tolerates_hot_user_skew): a
power user with a large share of events lands wholly in one task — that is
REQUIRED for correctness (gap detection must see the user's full ordered
event list), so url-hash-style salting does NOT apply here (a salted split
would sever sessions at salt boundaries). At 100 TB the mitigations are:
(1) AQE skew handling for the surrounding stages, (2) per-key state bounded
to the open session only (the stream form holds O(1) state per user, not
the event list), and (3) for a pathological single key (bot traffic),
``sessionize_sharded`` — the IMPLEMENTED two-pass form: sessionize per
(user, day) shard, then merge sessions that straddle shard boundaries — a
deterministic reduce over ~days rows per user, proven session-identical
to the single-pass form (q46 oracles it against the single-pass SQL).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType()),  # epoch seconds
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessions as plain window ops (one shuffle on user_id;
    both window functions and the final aggregate reuse that partitioning)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    gap = F.lit(gap_minutes * 60)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap),
        1,
    ).otherwise(0)
    sid = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("_sid", sid)
        .groupBy(F.col(user_col).alias("user_id"), F.col("_sid").alias("session_id"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
    )


def sessionize_sharded(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Two-pass HOT-KEY-SAFE sessionization — the escape hatch this
    module's header documents for pathological single keys (bot traffic):

      pass 1: sessionize within (user, calendar day of ts) — a bot user's
              billion events split across ~days-many window partitions
              instead of landing wholly in one task;
      pass 2: merge per-shard session INTERVALS across day boundaries
              with the same gap rule (~days rows per user — trivial).

    Produces exactly ``sessionize_batch``'s sessions (same boundaries,
    numbering, and counts) by the gap-merge argument: a split inside a
    shard is also a global split, and a global session cut by a day
    boundary is re-joined in pass 2 iff the boundary gap <= gap — which
    is the same test the single-pass form applies. Event-value sums
    aggregate as DECIMAL(18,6) (exact, associative), so re-aggregating
    shard partials is bit-identical to the single-pass sum regardless of
    partitioning; the caller rounds after a final cast to double.
    """
    gap = F.lit(gap_minutes * 60)
    ev = events.withColumn("_shard", F.to_date(F.col(ts_col))).withColumn(
        "_val", F.col(value_col).cast("decimal(18,6)")
    )
    w1 = Window.partitionBy(user_col, "_shard").orderBy(
        F.col(ts_col), F.col(order_tiebreak)
    )
    prev_ts = F.lag(F.col(ts_col)).over(w1)
    new1 = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap),
        1,
    ).otherwise(0)
    sid1 = F.sum(new1).over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sub = (
        ev.withColumn("_sid", sid1)
        .groupBy(user_col, "_shard", "_sid")
        .agg(
            F.min(ts_col).alias("s_start"),
            F.max(ts_col).alias("s_end"),
            F.count("*").alias("n"),
            F.sum("_val").alias("v"),
        )
    )
    # pass 2: per-user interval merge (intervals are time-disjoint, so
    # ordering by s_start is total and deterministic)
    w2 = Window.partitionBy(user_col).orderBy("s_start", "s_end")
    prev_end = F.lag("s_end").over(w2)
    new2 = F.when(
        prev_end.isNull()
        | ((F.unix_timestamp(F.col("s_start")) - F.unix_timestamp(prev_end)) > gap),
        1,
    ).otherwise(0)
    sid2 = F.sum(new2).over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        sub.withColumn("_sid2", sid2)
        .groupBy(F.col(user_col).alias("user_id"), F.col("_sid2").alias("session_id"))
        .agg(
            F.min("s_start").alias("session_start"),
            F.max("s_end").alias("session_end"),
            F.sum("n").alias("n_events"),
            F.sum("v").alias("sum_value_dec"),
        )
    )


def sessionize_stream_fn(gap_minutes: int = 30, timeout_ms: int | None = None):
    """Returns the (key, batches, state) update function for
    ``groupBy(user_id).applyInPandasWithState(fn, SESSION_SCHEMA,
    STATE_SCHEMA, "append", <timeout conf>)``.

    State = the currently-open session for the user. Events are folded in
    event-time order; a gap closes the open session and emits it. With
    ``timeout_ms`` set (and ProcessingTimeTimeout configured) an idle
    user's open session is flushed on timeout; the default NoTimeout form
    leaves tail sessions in state — a periodic batch backfill
    (sessionize_batch) closes them, which is the cheaper pattern for a
    training-data pipeline where sessions are consumed in bulk.

    CROSS-BATCH ORDERING PRECONDITION (no event-time watermark in the
    state logic): events are sorted WITHIN each micro-batch, but batch-
    equivalent output requires each user's events to arrive in
    non-decreasing event-time order ACROSS micro-batches (true for
    time-ordered file drops / log offsets; __spark_entry__ q42 stages one
    ordered file for exactly this reason). A LATE event — older than the
    open session's tail — is ABSORBED into the open session (it extends
    session_start backward and adds to the counts; it can never reopen or
    corrupt an already-emitted session, and never creates an out-of-order
    duplicate) — tests/test_streaming.py pins this. Sessions the late
    event should have belonged to are healed by the production mitigation:
    a tumbling re-sessionization backfill over sessionize_batch."""
    gap_s = gap_minutes * 60.0

    def fn(key, pdfs, state):
        user_id = int(key[0])
        out = []

        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, v = state.get
                out.append((user_id, s0, s1, int(n), float(v)))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for ts, val in zip(pdf["ts"], pdf["value"]):
                    t = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
                    rows.append((t, float(val)))
            rows.sort()
            cur = list(state.get) if state.exists else None
            for t, val in rows:
                if cur is None:
                    cur = [t, t, 1, val]
                elif t - cur[1] > gap_s:
                    out.append((user_id, cur[0], cur[1], int(cur[2]), float(cur[3])))
                    cur = [t, t, 1, val]
                else:
                    # in-order: extends the tail; LATE (cross-batch) event:
                    # absorbed — start may extend backward, never corrupts
                    # an already-emitted session (docstring precondition)
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += val
            if cur is not None:
                state.update(tuple(cur))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [dt.datetime.utcfromtimestamp(o[1]) for o in out],
                    "session_end": [dt.datetime.utcfromtimestamp(o[2]) for o in out],
                    "n_events": [o[3] for o in out],
                    "sum_value": [round(o[4], 2) for o in out],
                }
            )

    return fn


WM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ev_ts", T.ArrayType(T.DoubleType())),  # epoch seconds
        T.StructField("ev_val", T.ArrayType(T.DoubleType())),
    ]
)


def sessionize_stream_watermark_fn(gap_minutes: int = 30):
    """EVENT-TIME-WATERMARKED sessionizer update function — replaces
    sessionize_stream_fn's cross-batch ordering PRECONDITION with real
    late-data absorption (round-3 verdict item #5):

      * state BUFFERS the user's pending events (not a folded session),
        so a late event — arriving out of order ACROSS micro-batches —
        slots into its true event-time position before any session
        boundary is decided;
      * a session is EMITTED only once the watermark proves it final:
        ``session_end + gap < watermark`` means no future event (all of
        which have ts >= watermark) can extend or merge it. Emission is
        therefore in event-time order per user, exactly the batch twin's
        sessions, regardless of arrival order within the watermark delay;
      * events older than the watermark itself are dropped (the standard
        watermark contract — Spark bounds disorder, not unboundedly);
      * pending events are held under EventTimeTimeout: the timeout
        timestamp is the earliest instant the oldest pending session can
        finalize, so a user with no new arrivals still emits as the
        watermark passes (including in the closing no-data micro-batch).

    State per key is O(events inside the gap+delay horizon), not O(all
    events): everything older is finalized and evicted each trigger.

    Use with ``withWatermark("ts", ...)`` + ``applyInPandasWithState(fn,
    SESSION_SCHEMA, WM_STATE_SCHEMA, "append", EventTimeTimeout)`` — see
    run_sessionize_stream_watermarked."""
    gap_s = gap_minutes * 60.0

    def fn(key, pdfs, state):
        user_id = int(key[0])
        ts_buf: list = []
        val_buf: list = []
        if state.exists:
            s_ts, s_val = state.get
            ts_buf = list(s_ts)
            val_buf = list(s_val)
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms / 1000.0
        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, val in zip(pdf["ts"], pdf["value"]):
                    t = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
                    if wm_ms > 0 and t < wm:
                        continue  # too late: beyond the declared disorder bound
                    ts_buf.append(t)
                    val_buf.append(float(val))
        order = sorted(range(len(ts_buf)), key=lambda i: (ts_buf[i], val_buf[i]))
        ts_buf = [ts_buf[i] for i in order]
        val_buf = [val_buf[i] for i in order]

        # sessionize the buffer; emit the prefix of sessions proven final
        out = []
        cur_start = 0  # index of first event of the current session
        keep_from = None  # first buffer index NOT finalized
        for i in range(1, len(ts_buf) + 1):
            closes = i == len(ts_buf) or ts_buf[i] - ts_buf[i - 1] > gap_s
            if not closes:
                continue
            end = ts_buf[i - 1]
            if wm_ms > 0 and end + gap_s < wm:
                out.append(
                    (
                        user_id,
                        ts_buf[cur_start],
                        end,
                        i - cur_start,
                        sum(val_buf[cur_start:i]),
                    )
                )
            elif keep_from is None:
                keep_from = cur_start
            cur_start = i
        keep_from = len(ts_buf) if keep_from is None else keep_from

        if keep_from < len(ts_buf):
            state.update((ts_buf[keep_from:], val_buf[keep_from:]))
            # earliest future finalization: oldest pending session could
            # close gap_s after its CURRENT tail (a later event may push
            # this out — the next trigger just re-arms the timeout)
            tail = ts_buf[keep_from]
            j = keep_from
            while j + 1 < len(ts_buf) and ts_buf[j + 1] - ts_buf[j] <= gap_s:
                j += 1
            tail = ts_buf[j]
            fire_ms = int((tail + gap_s) * 1000) + 1
            state.setTimeoutTimestamp(max(fire_ms, wm_ms + 1))
        else:
            state.remove()

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [dt.datetime.utcfromtimestamp(o[1]) for o in out],
                    "session_end": [dt.datetime.utcfromtimestamp(o[2]) for o in out],
                    "n_events": [o[3] for o in out],
                    "sum_value": [round(o[4], 2) for o in out],
                }
            )

    return fn


FLUSH_USER_ID = -1  # reserved key carried by the sentinel flush event


def run_sessionize_stream_watermarked(
    spark,
    events_path: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    delay: str = "2 hours",
    query_name: str = "sessions_wm",
    max_files_per_trigger: int | None = 1,
    flush: bool = True,
) -> DataFrame:
    """Drive the WATERMARKED sessionizer (availableNow, memory sink):
    ``withWatermark(ts, delay)`` + EventTimeTimeout. Unlike
    run_sessionize_stream there is NO cross-batch ordering precondition:
    arrival order may be arbitrary within ``delay`` (events later than
    that are dropped — the watermark contract).

    ``flush=True`` (default) appends TWO sentinel far-future events for
    the reserved key ``FLUSH_USER_ID``, each as its own LAST micro-batch
    (the key is filtered from the output). Why two: event-time timeouts
    fire in a batch whose watermark has passed them, and a batch's
    watermark derives from PREVIOUS batches only; trailing no-data
    micro-batches — the only other place final timeouts could fire — are
    not reliably scheduled under availableNow, so emission at termination
    would be timing-dependent. Sentinel batch 1 runs at watermark
    ``max(real ts) - delay``; sentinel batch 2 runs at
    ``sentinel1 - delay`` (far future), firing EVERY remaining timeout.
    Net contract, deterministically: the emitted sessions are EXACTLY
    the batch twin's sessions over the non-dropped events — full drain,
    in event-time order per user. With ``flush=False`` sessions still
    pending at termination stay in state (resume the checkpoint to
    continue absorbing arrivals).

    The sentinels are staged as ``zzz-wm-flush-N.parquet`` files INSIDE
    ``events_path`` (the flat file source only lists that one directory)
    and are DELETED once the query terminates, so other readers of the
    events directory never observe the synthetic rows — the mutation is
    scoped to the query's lifetime. (The memory sink holds the results;
    the returned DataFrame does not re-read the files.)"""
    from pyspark.sql.streaming.state import GroupStateTimeout

    # the state fn compares pandas naive .timestamp() (treated as UTC)
    # against getCurrentWatermarkMs() true-epoch values: correct ONLY
    # under a UTC session timezone (session.py pins it; a caller with a
    # local-TZ session would get lateness checks skewed by the offset)
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    zero_offset = tz.upper() in (
        "UTC", "GMT", "UT", "Z", "+00:00", "-00:00", "GMT0", "UTC0",
        "ETC/UTC", "ETC/GMT", "ETC/GMT0", "ETC/GMT+0", "ETC/GMT-0",
        "ETC/UNIVERSAL", "UNIVERSAL", "ZULU", "ETC/ZULU", "GREENWICH",
        "ETC/GREENWICH",
    )
    if not zero_offset:
        try:  # any IANA zone whose offset is permanently zero also works
            from zoneinfo import ZoneInfo

            z = ZoneInfo(tz)
            zero_offset = all(
                z.utcoffset(dt.datetime(y, m, 1)) == dt.timedelta(0)
                for y in (1990, 2024)
                for m in (1, 7)
            )
        except Exception:
            zero_offset = False
    if not zero_offset:
        raise ValueError(
            f"watermarked sessionizer requires spark.sql.session.timeZone=UTC, got {tz!r}"
        )

    batch_df = spark.read.parquet(events_path)
    schema = batch_df.schema
    if flush:
        import glob as _glob
        import os as _os
        import shutil as _shutil
        import tempfile as _tempfile
        import time as _time

        # sentinel ts derives from the REAL events only (a rerun over a
        # dir already holding sentinels must not compound the horizon)
        max_ts = (
            batch_df.filter(F.col("user_id") != F.lit(FLUSH_USER_ID))
            .agg(F.max("ts"))
            .first()[0]
        )
        if max_ts is None:
            raise ValueError(
                "run_sessionize_stream_watermarked: no (non-sentinel) events"
            )
        for n_sentinel in (1, 2):
            sentinel = spark.createDataFrame(
                [tuple(None for _ in schema.fields)], schema
            ).select(
                *[
                    F.lit(FLUSH_USER_ID).cast("long").alias("user_id")
                    if f.name == "user_id"
                    else F.lit(
                        max_ts + dt.timedelta(days=3650 * n_sentinel)
                    ).alias("ts")
                    if f.name == "ts"
                    else F.col(f.name)
                    for f in schema.fields
                ]
            )
            # stage as a single FILE inside events_path (a subdirectory
            # would confuse the flat parquet listing; an _-prefixed path
            # is hidden from Spark entirely), mtime in the future so the
            # file source — which orders batches by mtime — runs the
            # sentinels as the final two batches, in order
            stage_dir = _tempfile.mkdtemp(prefix="wm_flush_")
            sentinel.coalesce(1).write.mode("overwrite").parquet(stage_dir)
            part = _glob.glob(_os.path.join(stage_dir, "part-*.parquet"))[0]
            dest = _os.path.join(events_path, f"zzz-wm-flush-{n_sentinel}.parquet")
            _shutil.copyfile(part, dest)
            _shutil.rmtree(stage_dir, ignore_errors=True)
            future = _time.time() + 3600 * n_sentinel
            _os.utime(dest, (future, future))
        max_files_per_trigger = max_files_per_trigger or 1  # sentinels: own batches

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", delay)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        sessionize_stream_watermark_fn(gap_minutes),
        SESSION_SCHEMA,
        WM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if flush:
        # restore the caller's input directory: the memory sink already
        # holds every emitted row, so the sentinel files are dead weight
        # that would otherwise leak into any other reader of events_path
        import glob as _glob
        import os as _os

        for f in _glob.glob(_os.path.join(events_path, "zzz-wm-flush-*.parquet")):
            try:
                _os.remove(f)
            except OSError:
                pass  # best-effort: a vanished file is already clean
    return spark.sql(f"SELECT * FROM {query_name}").filter(
        F.col("user_id") != F.lit(FLUSH_USER_ID)
    )


def run_sessionize_stream(
    spark,
    events_path: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    query_name: str = "sessions",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the stateful sessionizer over the events parquet as a stream
    (availableNow, memory sink); returns sessions CLOSED by a later event
    (idle-flush needs a subsequent trigger's timeout).

    ``max_files_per_trigger`` splits availableNow into multiple
    micro-batches (1 file per batch) — used by tests to exercise
    cross-batch state behavior."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        sessionize_stream_fn(gap_minutes),
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
