"""Structured Streaming event-time operators.

Three streaming re-expressions over the ``events`` schema, each the
stream twin of a batch operator (tested for parity in
tests/test_streaming_ops.py):

- ``streaming_hourly_windows``  tumbling event-time windows with a
  watermark — the stream form of
  operators/relational3.events_hourly_windows.  The watermark bounds
  state: windows older than (max event time - delay) are finalized and
  their state dropped; a row arriving later than that is discarded
  (demonstrated in the late-drop test).
- ``streaming_sessionize``      custom stateful operator via
  ``applyInPandasWithState`` — the stream form of
  operators/sessionize.sessionize_events (L1's gap clustering over
  time).  State per user = (session counter, open-session aggregate);
  a session is emitted the moment the event that OPENS the next one is
  seen, so output contains every closed session and state holds at most
  one open session per user.
- ``streaming_asof_attribution`` stateful stream twin of
  operators/sessionize.asof_click_attribution: one click (id, ts) of
  state per user; each purchase is attributed on arrival.

At 100 TB-scale ingest these run against a file/Kafka stream with the
same code; the state store shuffles by group key exactly like the batch
window's hash exchange, and the watermark is what keeps state bounded.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)
SESSION_GAP_S = 300  # keep identical to operators/sessionize.py
_S = 1000000.0


def _round_half_up(x: float, digits: int) -> float:
    """Match Spark's F.round on DOUBLE (BigDecimal.valueOf -> HALF_UP on
    the shortest decimal repr).  Python's round() is banker's rounding
    on the exact binary value and differs on tie digits, which would
    break stream/batch sum parity."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _read_events_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def streaming_hourly_windows(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "hourly_windows",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    output_mode: str = "update",
) -> DataFrame:
    """Run the windowed agg over all currently-available files
    (trigger availableNow), collect results in a memory sink, return
    the result DataFrame.

    update mode: each trigger emits the windows it changed; the memory
    sink keeps every emission, so we dedup to the last update per key.
    Note (measured, Spark 4.1): update mode only drops a late row once
    the window's state has been evicted — while state is live a
    stale-but-buffered row still merges.

    append mode: a window is emitted exactly once, when the watermark
    passes its end; rows later than the watermark are dropped before
    they can touch finalized state (the strict late-data guarantee —
    demonstrated in tests/test_streaming_ops.py)."""
    ev = _read_events_stream(spark, input_dir, max_files_per_trigger)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * F.lit(_S))).alias("sum_scaled"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            F.round(F.col("sum_scaled").cast("double") / F.lit(_S), 4).alias(
                "sum_value"
            ),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table(query_name)
    if output_mode == "append":
        return sink  # at most one emission per window
    # update mode can emit a window more than once (once per trigger
    # that touched it); the final value is the last emission.  The
    # memory sink appends in trigger order, so dedup keeps the max n.
    return (
        sink.groupBy("win_start", "event_type")
        .agg(F.max_by(F.struct("n", "sum_value"), "n").alias("s"))
        .select("win_start", "event_type", F.col("s.n").alias("n"), F.col("s.sum_value").alias("sum_value"))
    )


_SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_id BIGINT, n_events BIGINT, "
    "start_s BIGINT, end_s BIGINT, sum_value DOUBLE"
)
_SESSION_STATE_SCHEMA = (
    "next_sid BIGINT, cur_start BIGINT, cur_end BIGINT, "
    "cur_n BIGINT, cur_sum_scaled BIGINT"
)


def _sessionize_group(key, pdf_iter, state: GroupState):
    """Fold this batch's events (sorted by ts, event_id) into the open
    session carried in state; emit every session that closes.

    The iterator yields the group's rows in Arrow-batch chunks
    (spark.sql.execution.arrow.maxRecordsPerBatch, 512 here), split in
    ARRIVAL order — so the sort must happen over the concatenation of
    all chunks, not per chunk, or a user with >512 events in one
    trigger folds in arrival order across chunk boundaries and session
    sums/splits diverge from the batch twin.

    Memory bound: this buffers ONE user's events for ONE trigger
    (gap-sessionization needs its events in global time order, and
    chunk arrival order is shuffle-dependent).  The operational knob
    for a pathologically hot user is trigger size
    (maxFilesPerTrigger / rate limits), which caps any group's rows
    per micro-batch."""
    (user_id,) = key
    if state.exists:
        next_sid, cur_start, cur_end, cur_n, cur_sum = state.get
    else:
        next_sid, cur_start, cur_end, cur_n, cur_sum = 1, None, None, 0, 0

    out_rows = []
    chunks = [p for p in pdf_iter if len(p)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        ts_s = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
        vals = pdf["value"].tolist()
        for t, v in zip(ts_s, vals):
            scaled = int((v * _S) // 1)  # floor toward -inf, matches F.floor
            if cur_start is None:
                cur_start, cur_end, cur_n, cur_sum = t, t, 1, scaled
            elif t - cur_end > SESSION_GAP_S:
                out_rows.append(
                    (user_id, next_sid, cur_n, cur_start, cur_end,
                     _round_half_up(cur_sum / _S, 4))
                )
                next_sid += 1
                cur_start, cur_end, cur_n, cur_sum = t, t, 1, scaled
            else:
                # max/min: a late CROSS-batch event inside the gap must
                # not move the open session's bounds backwards (it would
                # spuriously split later events)
                cur_start = min(cur_start, t)
                cur_end = max(cur_end, t)
                cur_n, cur_sum = cur_n + 1, cur_sum + scaled
    state.update((next_sid, cur_start, cur_end, cur_n, cur_sum))
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_id", "n_events", "start_s", "end_s", "sum_value"],
        )


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "stream_sessions",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState).
    Emits closed sessions; the (at most one) still-open session per
    user remains in the state store, exactly like a production
    sessionizer that finalizes on gap timeout."""
    ev = _read_events_stream(spark, input_dir, max_files_per_trigger)
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


_ASOF_OUT_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, ts_us BIGINT, "
    "click_id BIGINT, click_ts_us BIGINT"
)
_ASOF_STATE_SCHEMA = "click_id BIGINT, click_us BIGINT"


def _asof_group(key, pdf_iter, state: GroupState):
    """Stream twin of operators/sessionize.asof_click_attribution:
    state per user = the latest click (max (ts, event_id)); each
    purchase is attributed the moment it arrives.  Batch rows sort by
    (ts, is_purchase, event_id) over the chunk concatenation — same
    tie rule as the batch window (equal-ts click attributes, higher
    event_id wins among tied clicks).

    Cross-batch caveats (documented, same class as the sessionizer):
    a click arriving in a LATER trigger than a purchase it should have
    won cannot retract the already-emitted attribution, and a late
    purchase whose only retained click lies in its future is DROPPED
    rather than attributed forward (guard below) — the stream is exact
    for (ts-ordered) arrival, which the file source's modification-time
    ordering provides in these pipelines."""
    import numpy as np

    (user_id,) = key
    if state.exists:
        click_id, click_us = state.get
    else:
        click_id, click_us = None, None

    out_pdf = None
    chunks = [p for p in pdf_iter if len(p)]
    if chunks:
        # Round 6 (guide §4.2): the fold is vectorized.  In the sorted
        # order (ts, is_p, event_id) the in-batch clicks are ascending
        # in (us, eid), so the running-max click before any row is just
        # the LAST click row before it; the effective click for a
        # purchase is the lexicographic max of that and the carried
        # state click — exactly what the scalar loop maintained.
        pdf = pd.concat(chunks, ignore_index=True)
        pdf["is_p"] = (pdf["event_type"] == "purchase").astype(int)
        pdf = pdf.sort_values(["ts", "is_p", "event_id"])
        eids = pdf["event_id"].to_numpy(dtype=np.int64)
        us = (pdf["ts"].astype("int64") // 1_000).to_numpy()
        is_p = pdf["is_p"].to_numpy(dtype=bool)
        idx = np.arange(len(pdf))
        last_click = np.maximum.accumulate(np.where(~is_p, idx, -1))
        p_last = last_click[is_p]
        p_eid, p_us = eids[is_p], us[is_p]
        has_batch = p_last >= 0
        c_eid = np.where(has_batch, eids[np.maximum(p_last, 0)], np.int64(-1))
        c_us = np.where(has_batch, us[np.maximum(p_last, 0)], np.int64(0))
        if click_id is not None:
            # lexicographic (us, eid) compare against the state click
            state_wins = (~has_batch) | (
                (c_us < click_us) | ((c_us == click_us) & (c_eid < click_id))
            )
            c_eid = np.where(state_wins, np.int64(click_id), c_eid)
            c_us = np.where(state_wins, np.int64(click_us), c_us)
            have = np.ones(len(p_eid), dtype=bool)
        else:
            have = has_batch
        keep = have & (c_us <= p_us)
        if keep.any():
            out_pdf = pd.DataFrame(
                {
                    "event_id": p_eid[keep],
                    "user_id": np.full(int(keep.sum()), user_id, np.int64),
                    "ts_us": p_us[keep],
                    "click_id": c_eid[keep],
                    "click_ts_us": c_us[keep],
                }
            )
        # final state click = max(state, all in-batch clicks) — clicks
        # are ascending, so the last one is the in-batch max
        n_clicks = int((~is_p).sum())
        if n_clicks:
            last_idx = idx[~is_p][-1]
            l_eid, l_us = int(eids[last_idx]), int(us[last_idx])
            if click_id is None or (l_us, l_eid) > (click_us, click_id):
                click_id, click_us = l_eid, l_us
    if click_id is not None:
        state.update((click_id, click_us))
    if out_pdf is not None:
        yield out_pdf


def streaming_asof_attribution(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "stream_asof",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming purchase->latest-click attribution via
    applyInPandasWithState; O(1) state per user (one click)."""
    ev = _read_events_stream(spark, input_dir, max_files_per_trigger)
    attributed = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _asof_group,
            outputStructType=_ASOF_OUT_SCHEMA,
            stateStructType=_ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        attributed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
