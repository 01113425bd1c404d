"""Incremental crawl ingest via Structured Streaming.

The reference is strict request/response (SURVEY.md §2.7 'Streaming:
none'); at corpus scale the equivalent of its per-request entry point is
a file-arrival stream: new page parquet files land in a directory, each
micro-batch runs the SAME batch kernel, output and lineage commit
per batch (exactly-once via the streaming checkpoint).

``foreachBatch`` reuses doc_ocr_spark.job.run-style logic, so batch and
streaming share one code path — no second extraction implementation.
Exactly-once = checkpoint (batch replay on crash) + idempotent batch
writes (dynamic overwrite of the batch's own ``batch_id=`` partitions);
see ``process_batch``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from doc_ocr_spark.job import with_bucket
from doc_ocr_spark.kernel import apply_kernel

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def write_extracted_batch(
    batch_df,
    batch_id: int,
    output_dir: str,
    n_buckets: int,
    templates: list[dict] | None = None,
) -> None:
    """One micro-batch: kernel + bucket + IDEMPOTENT write.

    Exactly-once discipline: foreachBatch alone is at-least-once — a
    crash between a plain append and the checkpoint commit replays the
    batch and would DUPLICATE its rows on restart.  The standard fix:
    partition the output by batch_id and make each batch a DYNAMIC
    partition overwrite of its own partitions — a replayed batch then
    replaces its previous (possibly partial) output instead of
    appending beside it (asserted by the replay test in
    tests/test_functions_sources.py).  ``part_bucket`` stays the second
    partition level, so bucket partition-pruning is unchanged for
    downstream consumers."""
    extracted = apply_kernel(
        with_bucket(batch_df, n_buckets).repartition("part_bucket"),
        templates,
    )
    (
        with_bucket(extracted, n_buckets)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "part_bucket")
        .parquet(output_dir)
    )


def start_incremental_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    max_files_per_trigger: int = 8,
    templates: list[dict] | None = None,
):
    """Start the stream; returns the StreamingQuery (caller awaits)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .select("url", "html")
    )

    def process_batch(batch_df, batch_id: int) -> None:
        write_extracted_batch(batch_df, batch_id, output_dir, n_buckets, templates)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
