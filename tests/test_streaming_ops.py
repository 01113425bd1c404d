"""Streaming operators: parity with their batch twins + watermark
late-data semantics.

- hourly windows (stream, update mode) == events_hourly_windows (batch)
- a row arriving later than the watermark allows is DROPPED
- stateful sessionizer (applyInPandasWithState) == batch sessionize
  minus each user's final (still-open) session
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


_EVENTS_STR_SCHEMA = (
    "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _write_aged_events(spark, d, name, rows, age_s):
    """One events parquet file in dir ``d``, mtime backdated by age_s so
    the file-stream source processes files in write order."""
    df = spark.createDataFrame(rows, _EVENTS_STR_SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.coalesce(1).write.parquet(str(d / name))
    for f in os.listdir(d / name):
        if f.endswith(".parquet"):
            shutil.move(str(d / name / f), str(d / f"{name}.parquet"))
    now = time.time()
    os.utime(str(d / f"{name}.parquet"), (now - age_s, now - age_s))


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_streaming_hourly_matches_batch(spark, events_dir, tmp_path):
    from doc_ocr_spark.operators.relational3 import events_hourly_windows
    from doc_ocr_spark.streaming.windows import streaming_hourly_windows

    got = streaming_hourly_windows(spark, events_dir, query_name="hw_parity")
    want = events_hourly_windows(spark, SF_DIR)
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows_set(got, cols) == _rows_set(want, cols)


def test_streaming_watermark_drops_late_row(spark, tmp_path):
    """Append mode: a window is emitted exactly once when the watermark
    passes it, and a row arriving after that is dropped.

    Measured nuance (Spark 4.1): a late row landing in the SAME batch
    that finalizes its window still merges (eviction runs after merge);
    the drop guarantee holds from the next batch on — so the late row
    here arrives one batch after finalization."""
    from doc_ocr_spark.streaming.windows import streaming_hourly_windows

    d = tmp_path / "late_in"
    d.mkdir()

    # batch 0: opens window 00:00 and pushes max event time to 06:00
    _write_aged_events(
        spark, d, "f1",
        [(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 06:00:00", 1, "click", 1.0, "{}")],
        300,
    )
    # batch 1: watermark is now 05:30 -> window 00:00 finalized (n=1)
    _write_aged_events(spark, d, "f2", [(5, "2024-01-01 06:01:00", 1, "click", 1.0, "{}")], 200)
    # batch 2: 00:20 is far behind the watermark -> DROPPED
    _write_aged_events(spark, d, "f3", [(3, "2024-01-01 00:20:00", 1, "click", 1.0, "{}")], 100)

    got = streaming_hourly_windows(
        spark,
        str(d),
        query_name="hw_late",
        watermark="30 minutes",
        max_files_per_trigger=1,
        output_mode="append",
    )
    rows = {(r.win_start, r.n) for r in got.collect()}
    from datetime import datetime, timezone

    w0 = int(datetime(2024, 1, 1, 0, 0, tzinfo=timezone.utc).timestamp())
    assert (w0, 1) in rows      # finalized before the late row
    assert (w0, 2) not in rows  # late row did not resurrect the window


def test_streaming_sessionize_matches_batch_closed_sessions(spark, events_dir):
    from doc_ocr_spark.operators.sessionize import sessionize_events
    from doc_ocr_spark.streaming.windows import streaming_sessionize

    got = streaming_sessionize(spark, events_dir, query_name="sess_parity")
    batch = sessionize_events(spark, SF_DIR)
    # stream emits only CLOSED sessions; each user's last session is
    # still open in the state store
    last = batch.groupBy("user_id").agg(F.max("session_id").alias("session_id"))
    closed = batch.join(last, ["user_id", "session_id"], "left_anti")
    cols = ["user_id", "session_id", "n_events", "start_s", "end_s", "sum_value"]
    assert _rows_set(got, cols) == _rows_set(closed, cols)
    # and state survives across micro-batches: same result with the
    # input split across two files processed in two triggers


def test_streaming_sessionize_group_larger_than_arrow_chunk(spark, tmp_path):
    """A user with >512 events in ONE trigger crosses the Arrow
    maxRecordsPerBatch chunk boundary (512 in session.py).  The events
    are written in DESCENDING ts order, so any per-chunk sort folds
    later events before earlier ones; only a sort over the concatenated
    chunks matches the batch twin."""
    from datetime import datetime, timedelta, timezone

    from doc_ocr_spark.streaming.windows import EVENTS_SCHEMA, streaming_sessionize

    base = datetime(2025, 3, 1, tzinfo=timezone.utc)
    rows = []
    # 1300 events, 100 s apart -> one long session... except every 400th
    # event jumps 400 s, opening a new session.  Written ts-DESCENDING.
    t = base
    for i in range(1300):
        gap = 400 if (i and i % 400 == 0) else 100
        t = t + timedelta(seconds=gap)
        rows.append((i, t, 7, "click", 1.5, None))
    rows.reverse()
    d = tmp_path / "big_user"
    d.mkdir()
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(d / "f")
    )
    flat = tmp_path / "big_flat"
    flat.mkdir()
    for f in os.listdir(d / "f"):
        if f.endswith(".parquet"):
            shutil.move(str(d / "f" / f), str(flat / f))

    got = streaming_sessionize(spark, str(flat), query_name="sess_bigchunk")
    out = sorted(
        (r.session_id, r.n_events, r.sum_value) for r in got.collect()
    )
    # sessions close at each 400 s jump: 3 closed (400 events each),
    # the 4th (100 events) stays open in state
    assert out == [(1, 400, 600.0), (2, 400, 600.0), (3, 400, 600.0)]


def test_streaming_url_dedup_across_batches(spark, tmp_path):
    """transformWithStateInPandas: a url seen in an earlier micro-batch
    is dropped in later ones (incremental-crawl resume semantics);
    within-batch duplicates keep one row too."""
    from doc_ocr_spark.datagen import generate_pages
    from doc_ocr_spark.streaming.dedup import streaming_dedup_urls

    d = tmp_path / "pages_in"
    d.mkdir()
    pages = generate_pages(30, seed=11)
    rows1 = [(p["url"], p["warc_ts"], bytes(p["html"]), p["text"], p["lang"])
             for p in pages[:20]]
    # second file overlaps 10 urls and adds 10 new + an in-batch dup
    rows2 = [(p["url"], p["warc_ts"], bytes(p["html"]), p["text"], p["lang"])
             for p in pages[10:30]] + [
        (pages[10]["url"], pages[10]["warc_ts"], bytes(pages[10]["html"]),
         pages[10]["text"], pages[10]["lang"])
    ]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(d / "f2"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, sub in enumerate(("f1", "f2")):
        for f in os.listdir(d / sub):
            if f.endswith(".parquet"):
                shutil.move(str(d / sub / f), str(flat / f"{sub}.parquet"))
        now = time.time()
        os.utime(str(flat / f"{sub}.parquet"), (now - 100 + i, now - 100 + i))

    got = streaming_dedup_urls(
        spark, str(flat), query_name="url_dedup_t", max_files_per_trigger=1
    )
    urls = [r.url for r in got.collect()]
    assert len(urls) == 30            # one row per distinct url, ever
    assert len(set(urls)) == 30


def test_streaming_url_dedup_representative_is_deterministic(spark, tmp_path):
    """Duplicate urls WITHIN a batch carrying different html must emit a
    deterministic representative (min warc_ts, then min n_bytes) — not
    whichever chunk arrived first."""
    from datetime import datetime, timedelta, timezone

    from doc_ocr_spark.streaming.dedup import streaming_dedup_urls

    base = datetime(2025, 2, 1, tzinfo=timezone.utc)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    rows = [
        ("https://dup.test/a", base + timedelta(hours=2), b"x" * 500, "", "en"),
        ("https://dup.test/a", base, b"y" * 123, "", "en"),          # min ts
        ("https://dup.test/a", base + timedelta(hours=1), b"z" * 9000, "", "en"),
        ("https://dup.test/b", base, b"w" * 77, "", "en"),
    ]
    d = tmp_path / "dup_in"
    d.mkdir()
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(str(d / "f"))
    flat = tmp_path / "dup_flat"
    flat.mkdir()
    for i, f in enumerate(sorted(os.listdir(d / "f"))):
        if f.endswith(".parquet"):
            shutil.move(str(d / "f" / f), str(flat / f"p{i}.parquet"))

    for attempt in range(2):  # rerun: same representative both times
        got = streaming_dedup_urls(
            spark, str(flat), query_name=f"url_dedup_det{attempt}"
        )
        by_url = {r.url: r.n_bytes for r in got.collect()}
        assert by_url == {"https://dup.test/a": 123, "https://dup.test/b": 77}


def test_streaming_native_session_window(spark, events_dir):
    """F.session_window in a STREAM (watermark-gated, append mode):
    sessions finalized by the final watermark must equal the batch
    session_window_events rows whose window end (last event + gap) is
    at or before max_event_time - watermark_delay."""
    from doc_ocr_spark.operators.relational4 import (
        GAP_S,
        session_window_events,
    )
    from doc_ocr_spark.streaming.windows import EVENTS_SCHEMA

    delay_s = 600
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        # same whole-second floor as the batch twin (see relational4)
        .withColumn("ts", F.timestamp_seconds(F.unix_timestamp("ts")))
    )
    agg = (
        ev.withWatermark("ts", f"{delay_s} seconds")
        .groupBy("user_id", F.session_window("ts", f"{GAP_S} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("start_s"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("native_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.start_s, r.n_events)
        for r in spark.table("native_sess").collect()
    }

    batch = session_window_events(spark, SF_DIR).collect()
    max_ts = spark.read.parquet(f"{SF_DIR}/events.parquet").agg(
        F.max(F.unix_timestamp("ts"))
    ).collect()[0][0]
    watermark = max_ts - delay_s
    want = {
        (r.user_id, r.start_s, r.n_events)
        for r in batch
        if r.end_s + GAP_S <= watermark  # window end = last event + gap
    }
    assert want  # the cut must not be vacuous
    assert got == want


def test_asof_attribution_matches_bruteforce_on_adversarial_stream(spark, tmp_path):
    """Union-sort as-of vs a brute-force reference on a corpus with the
    edge cases the provided testdata never hits: a click and a purchase
    at the SAME microsecond (inclusive bound -> attributed), a purchase
    before any click (dropped), users with no clicks at all, and
    interleaved multi-click runs."""
    import datetime as dt

    from doc_ocr_spark.operators.sessionize import asof_click_attribution

    t0 = dt.datetime(2024, 1, 1)

    def row(eid, uid, us, et):
        return (eid, t0 + dt.timedelta(microseconds=us), uid, et, 1.0, "{}")

    rows = [
        row(0, 1, 100, "purchase"),      # before any click -> dropped
        row(1, 1, 200, "click"),
        row(2, 1, 300, "purchase"),      # -> click 1
        row(3, 1, 300_000, "click"),
        row(4, 1, 300_000, "purchase"),  # same ts as click 3 -> inclusive
        row(5, 1, 400_000, "purchase"),  # -> click 3 (latest)
        row(6, 2, 100, "purchase"),      # user without clicks -> dropped
        row(7, 3, 50, "click"),
        row(8, 3, 60, "click"),
        row(9, 3, 70, "purchase"),       # -> click 8, not 7
        row(10, 3, 80, "view"),          # non-participating type
        row(11, 4, 10, "click"),
        row(12, 4, 10, "click"),         # tied clicks -> higher id wins
        row(13, 4, 20, "purchase"),      # -> click 12
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.event_id, r.click_id)
        for r in asof_click_attribution(spark, str(tmp_path)).collect()
    }
    # brute-force reference
    want = set()
    for eid, ts, uid, et, _, _ in rows:
        if et != "purchase":
            continue
        cands = [
            (cts, ceid)
            for ceid, cts, cuid, cet, _, _ in rows
            if cet == "click" and cuid == uid and cts <= ts
        ]
        if cands:
            want.add((eid, max(cands)[1]))
    assert got == want
    assert (13, 12) in got
    assert (0, None) not in got and len(got) == 5


def test_streaming_asof_matches_batch(spark, events_dir):
    from doc_ocr_spark.operators.sessionize import asof_click_attribution
    from doc_ocr_spark.streaming.windows import streaming_asof_attribution

    got = streaming_asof_attribution(spark, events_dir, query_name="asof_parity")
    want = asof_click_attribution(spark, SF_DIR)
    cols = ["event_id", "user_id", "ts_us", "click_id", "click_ts_us"]
    assert _rows_set(got, cols) == _rows_set(want, cols)


def test_streaming_asof_state_carries_click_across_triggers(spark, tmp_path):
    """A click in trigger 1 must attribute a purchase arriving in
    trigger 2 out of the state store (one click per user)."""
    from doc_ocr_spark.streaming.windows import streaming_asof_attribution

    d = tmp_path / "asof_in"
    d.mkdir()
    _write_aged_events(spark, d, "f1", [(1, "2024-01-01 00:00:01", 7, "click", 1.0, "{}")], 300)
    _write_aged_events(
        spark, d, "f2",
        [(2, "2024-01-01 00:10:00", 7, "purchase", 1.0, "{}"),
         (3, "2024-01-01 00:11:00", 8, "purchase", 1.0, "{}")],  # no click
        100,
    )
    got = streaming_asof_attribution(
        spark, str(d), query_name="asof_carry", max_files_per_trigger=1
    )
    rows = {(r.event_id, r.click_id) for r in got.collect()}
    assert rows == {(2, 1)}


def test_streaming_asof_drops_late_purchase_behind_future_click(spark, tmp_path):
    """A late purchase arriving a trigger AFTER a newer click must be
    DROPPED, not attributed forward to a click in its future (the
    as-of invariant click_ts <= purchase_ts is guarded in the group
    kernel)."""
    from doc_ocr_spark.streaming.windows import streaming_asof_attribution

    d = tmp_path / "asof_late"
    d.mkdir()
    _write_aged_events(spark, d, "f1", [(1, "2024-01-01 00:10:00", 7, "click", 1.0, "{}")], 300)
    # purchase ts 00:05 < the only retained click's 00:10
    _write_aged_events(spark, d, "f2", [(2, "2024-01-01 00:05:00", 7, "purchase", 1.0, "{}")], 100)
    got = streaming_asof_attribution(
        spark, str(d), query_name="asof_late", max_files_per_trigger=1
    )
    assert got.collect() == []
