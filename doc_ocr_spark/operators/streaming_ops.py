"""Driver-contract entry for the Structured Streaming path.

``streaming_hourly_agg`` and ``streaming_asof_agg`` each run a REAL
stream (file source over the events parquet, availableNow trigger,
memory sink) to completion and return the sink — so the driver's
DuckDB hash gate checks STREAMING results, not just the batch twins.
The oracles are identical to the batch operators' (events_hourly_windows
/ asof_click_attribution): with all data available at start, a finished
stream must equal the batch result.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession

from doc_ocr_spark.operators.relational3 import HOURLY_SQL
from doc_ocr_spark.operators.sessionize import ASOF_SQL as _ASOF_SQL

_COUNTER = itertools.count()


def _as_stream_dir(sf_dir: str) -> str:
    """The file stream source wants a DIRECTORY of arriving files;
    expose the single events parquet through a symlink dir.

    Key = hash of the resolved absolute path (a flattened path string
    collides: '/d/sf0_1' vs '/d/sf0/1'); lexists so a dangling symlink
    from a regenerated corpus is replaced instead of crashing."""
    import hashlib

    from doc_ocr_spark import staging

    target = os.path.realpath(os.path.join(sf_dir, "events.parquet"))
    key = hashlib.md5(target.encode()).hexdigest()[:16]
    d = os.path.join(staging.stage_root(), "stream", key, "events")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "part-000.parquet")
    if os.path.lexists(link):
        if os.path.realpath(link) != target:
            os.remove(link)
            os.symlink(target, link)
    else:
        os.symlink(target, link)
    return d


def _input_bytes(path: str) -> int:
    """Total data bytes of a parquet file OR directory of part files.
    ``os.path.getsize`` on a directory returns the inode size (~4 KB),
    which would silently pin every windowed-agg stream to the 2-partition
    floor exactly where the sizing rule should scale the count up
    (ADVICE r03) — so directories sum their non-hidden data files."""
    try:
        if os.path.isdir(path):
            return sum(
                e.stat().st_size
                for e in os.scandir(path)
                if e.is_file() and not e.name.startswith((".", "_"))
            )
        return os.path.getsize(path)
    except OSError:
        return 0


class _state_partitions:
    """Size the stream's state-store partition count from the INPUT
    (~32 MB of events per state partition, floored at 2, capped at the
    session default) for the duration of one stream run.  A streaming
    query fixes `spark.sql.shuffle.partitions` as its state partition
    count at START; the session default (sized for the batch suite's
    big shuffles) costs pure task overhead on a small stateful stream —
    measured 3.1 -> 1.6 s per gate run at sf0.01.  At real ingest
    volume the same rule scales the count UP to the session cap.  The
    conf is restored immediately after the stream finishes (the gate
    runs synchronously to completion).

    Applies ONLY to JVM-side stateful streams (the windowed agg).  For
    `applyInPandasWithState` streams the partition count is also the
    PYTHON worker parallelism and the kernel is compute-bound — sizing
    by bytes strangles it (measured at sf0.1: 4.7 s at 2 partitions vs
    1.7 s at the session default), so those gates inherit the session
    setting unchanged."""

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        self.spark = spark
        nbytes = _input_bytes(
            os.path.realpath(os.path.join(sf_dir, "events.parquet"))
        )
        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.target = max(2, min(cap, nbytes // (32 << 20) + 2))

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.target))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def streaming_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc_ocr_spark.streaming.windows import streaming_hourly_windows

    name = f"stream_hourly_gate_{next(_COUNTER)}"
    with _state_partitions(spark, sf_dir):
        return streaming_hourly_windows(
            spark, _as_stream_dir(sf_dir), query_name=name
        )


def streaming_asof_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated stream run of the as-of attribution: with all data
    available at start (one trigger), the finished stream must equal
    the batch union-sort operator, so the batch oracle applies."""
    from doc_ocr_spark.streaming.windows import streaming_asof_attribution

    name = f"stream_asof_gate_{next(_COUNTER)}"
    return streaming_asof_attribution(
        spark, _as_stream_dir(sf_dir), query_name=name
    )


# --------------------------------------------------------------------------
# Streaming URL dedup gate (VERDICT r03 item 2: the stateful dedup
# operator was implemented + unit-tested but never driver-graded).

_DEDUP_URL_MOD = 200  # doc_id % MOD -> url key, so sf0.01's 500 docs
# give ~2.5 duplicate fetches per url and sf0.1's 5000 give ~25
_PAGES_DERIVE_VERSION = 2  # v2: files range-partitioned by warc_ts
_PAGES_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _dedup_pages_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage a deterministic multi-file pages table with DUPLICATE urls
    derived from `documents`: url = docs.test/u{doc_id % MOD},
    warc_ts strictly increasing in doc_id, html = wrapped text.  The
    file stream source needs a directory of parquet files; the staged
    table is keyed on the corpus content fingerprint + the derivation
    constants."""
    from pyspark.sql import functions as F

    from doc_ocr_spark import staging
    from doc_ocr_spark.operators import load

    src = os.path.join(sf_dir, "documents.parquet")
    key = staging.content_key(
        _PAGES_DERIVE_VERSION,
        staging.file_fingerprint(src),
        _DEDUP_URL_MOD,
        _PAGES_EPOCH,
    )

    def build(tmp: str) -> None:
        pages = load(spark, sf_dir, "documents").select(
            F.concat(
                F.lit("https://docs.test/u"),
                (F.col("doc_id") % _DEDUP_URL_MOD).cast("string"),
            ).alias("url"),
            F.timestamp_seconds(F.lit(_PAGES_EPOCH) + F.col("doc_id")).alias(
                "warc_ts"
            ),
            F.encode(
                F.concat(
                    F.lit("<html><body><p>"),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "utf-8",
            ).alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
        # range-partition by warc_ts so the earliest fetch of every url
        # sits in the earliest file: the emitted representative is then
        # the global min whether the availableNow trigger runs one batch
        # (observed default: no rate limit -> allAvailable) or the
        # source ever splits batches in file order
        pages.repartitionByRange(4, "warc_ts").write.parquet(tmp)

    return staging.ensure_staged("dedup_pages", key, build)


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the stateful first-url-wins dedup stream
    (streaming/dedup.py): one availableNow trigger over the staged
    duplicate-url pages table.  With no rate limit the trigger is a
    single micro-batch, so each url group sees every fetch and the
    emitted representative is the GLOBAL min (warc_ts, n_bytes) — which
    the batch twin below computes in plain SQL.  warc_ts increases
    strictly with doc_id, so the representative is simply each url's
    lowest-doc_id fetch.  (Cross-batch first-wins semantics are covered
    by tests/test_streaming_ops.py with maxFilesPerTrigger forcing
    multiple batches.)"""
    from doc_ocr_spark.streaming.dedup import streaming_dedup_urls

    name = f"stream_dedup_gate_{next(_COUNTER)}"
    return streaming_dedup_urls(spark, _dedup_pages_dir(spark, sf_dir), query_name=name)


STREAM_DEDUP_SQL = f"""
WITH pages AS (
  SELECT 'https://docs.test/u' || CAST(doc_id % {_DEDUP_URL_MOD} AS VARCHAR) AS url,
         doc_id,
         CAST(octet_length(encode('<html><body><p>' || text || '</p></body></html>')) AS BIGINT) AS n_bytes
  FROM documents
),
r AS (
  SELECT url, n_bytes,
         row_number() OVER (PARTITION BY url ORDER BY doc_id) AS rn
  FROM pages
)
SELECT url, n_bytes FROM r WHERE rn = 1
"""


ORACLES = {
    "streaming_hourly_agg": HOURLY_SQL,
    "streaming_asof_agg": _ASOF_SQL,
    "streaming_dedup": STREAM_DEDUP_SQL,
}
QUERIES = {
    "streaming_hourly_agg": streaming_hourly_agg,
    "streaming_asof_agg": streaming_asof_agg,
    "streaming_dedup": streaming_dedup,
}
