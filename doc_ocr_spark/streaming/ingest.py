"""Incremental crawl ingest via Structured Streaming.

The reference is strict request/response (SURVEY.md §2.7 'Streaming:
none'); at corpus scale the equivalent of its per-request entry point is
a file-arrival stream: new page parquet files land in a directory, each
micro-batch runs the SAME batch kernel, output and lineage commit
per batch (exactly-once via the streaming checkpoint).

``foreachBatch`` reuses doc_ocr_spark.job.run-style logic, so batch and
streaming share one code path — no second extraction implementation.
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
        extracted = apply_kernel(
            with_bucket(batch_df, n_buckets).repartition("part_bucket"),
            templates,
        )
        (
            with_bucket(extracted, n_buckets)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("part_bucket")
            .parquet(output_dir)
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
