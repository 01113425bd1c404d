"""The batch extraction job: read -> Arrow kernel -> salted repartition
-> partitioned write + per-partition lineage; checkpoint/resume.
(The exchange defaults to AFTER the map-only kernel so the shuffle moves
extracted rows, not raw html — see run_extraction; --exchange pre keeps
the input-side salted repartition for degenerate source layouts.)

Launchable via ``spark-submit --py-files doc_ocr_spark.zip job.py`` or
``python -m doc_ocr_spark.job`` (north_rule: spark-submit --py-files on a
multi-executor cluster).

Partitioning / resume protocol (SURVEY.md §3.5):

- every row gets ``part_bucket = pmod(xxhash64(url), n_buckets)`` — a
  stable, data-independent salt of the url, so bucket membership never
  changes between runs (the precondition for resume)
- output is written ``partitionBy(part_bucket)`` with DYNAMIC partition
  overwrite: only the buckets in this run's data are (re)written, so a
  crash between the data commit and the lineage append cannot
  duplicate a bucket on resume — the rerun replaces the orphaned
  partition instead of appending beside it
- after a successful write, one lineage row per bucket (doc_count,
  bytes_out, extractor_version, wall_ms) is appended to
  ``<output>/_lineage``.  Lineage costs NO second data pass (round-1
  re-read the whole written output — a full extra scan at the design
  point): doc_count comes from the parquet FOOTERS of exactly the
  files this run added (metadata-only reads, distributed), bytes_out
  from their on-disk sizes, and run totals (docs, bytes_in, text
  bytes) ride the write itself via ``Observation``
- ``--resume`` anti-joins pending buckets against committed lineage and
  processes only the remainder — a failed run never recomputes finished
  buckets

Iceberg note: the sandbox has no Iceberg runtime jar; the layout above
(bucketed partition column + lineage-as-manifest) is the parquet
transcription of an Iceberg ``PARTITIONED BY (bucket(N, url))`` table +
snapshot metadata, and ``read_corpus`` in sources/corpus.py tries the
Iceberg catalog first when one is configured.
"""

from __future__ import annotations

import argparse
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from doc_ocr_spark.core.extractor import KERNEL_VERSION
from doc_ocr_spark.kernel import apply_kernel


def lineage_path(output: str) -> str:
    return os.path.join(output, "_lineage")


def completed_buckets(spark: SparkSession, output: str) -> list[int]:
    """Buckets already committed to lineage (empty on first run)."""
    try:
        ldf = spark.read.parquet(lineage_path(output))
    except Exception:
        return []
    return [r.part_bucket for r in ldf.select("part_bucket").distinct().collect()]


def _list_data_files(spark: SparkSession, output: str) -> dict[str, int]:
    """{file path -> size} for committed data files under ``output``
    (any Hadoop-supported filesystem; skips _lineage and non-parquet).
    One recursive listing — the same metadata walk every commit
    protocol performs; an Iceberg catalog would serve it from
    manifests."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(output)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return {}
    out: dict[str, int] = {}
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(".parquet") and "/_lineage/" not in p and "part_bucket=" in p:
            out[p] = int(st.getLen())
    return out


def _bucket_of(path: str) -> int:
    seg = [s for s in path.split("/") if s.startswith("part_bucket=")][-1]
    return int(seg.split("=", 1)[1])


def _lineage_from_files(
    spark: SparkSession, new_files: dict[str, int]
) -> DataFrame:
    """Per-bucket (doc_count, bytes_out) from file METADATA only:
    row counts from parquet footers (a few KB per file, read
    distributed via mapInPandas), bytes from the listing.  Never
    touches row data."""
    import pandas as pd

    rows = [(p, sz, _bucket_of(p)) for p, sz in sorted(new_files.items())]
    fdf = spark.createDataFrame(rows, "path string, fsize long, part_bucket int")

    def _footer_counts(batches):
        import pyarrow.parquet as pq

        def _num_rows(p: str) -> int:
            if p.startswith("file:"):
                return pq.ParquetFile(p[5:]).metadata.num_rows
            if "://" in p:
                # non-local output (hdfs/s3a/...): resolve through
                # pyarrow's filesystem layer — still a footer-only read
                from pyarrow import fs as pafs

                filesystem, path = pafs.FileSystem.from_uri(p)
                with filesystem.open_input_file(path) as f:
                    return pq.ParquetFile(f).metadata.num_rows
            return pq.ParquetFile(p).metadata.num_rows

        for pdf in batches:
            out = []
            for p, sz, b in zip(pdf["path"], pdf["fsize"], pdf["part_bucket"]):
                out.append(
                    {
                        "part_bucket": int(b),
                        "doc_count": int(_num_rows(p)),
                        "bytes_out": int(sz),
                    }
                )
            yield pd.DataFrame(out)

    counted = fdf.mapInPandas(
        _footer_counts, "part_bucket int, doc_count long, bytes_out long"
    )
    return counted.groupBy("part_bucket").agg(
        F.sum("doc_count").alias("doc_count"),
        F.sum("bytes_out").alias("bytes_out"),
    )


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "part_bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


# html blobs above this are "giants": a handful of them landing in one
# bucket would make that task a straggler (SURVEY.md §7.4.2).
GIANT_HTML_BYTES = 1 << 20
_GIANT_SUBSPLITS = 8


def with_skew_split(df: DataFrame) -> DataFrame:
    """Secondary exchange key for giant blobs.

    Normal rows keep skew_sub=0, so each bucket's bulk stays together;
    giant rows fan out over {_GIANT_SUBSPLITS} sub-keys (stable in url —
    a deterministic function, not a random salt, so reruns place rows
    identically).  Used ONLY in the repartition key: output partitioning
    and resume stay at part_bucket granularity.
    """
    return df.withColumn(
        "skew_sub",
        F.when(
            F.length("html") > GIANT_HTML_BYTES,
            F.pmod(F.xxhash64("url", F.lit(1)), F.lit(_GIANT_SUBSPLITS)).cast("int"),
        ).otherwise(F.lit(0)),
    )


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output: str,
    n_buckets: int = 64,
    resume: bool = False,
    templates: list[dict] | None = None,
    exchange: str = "post",
    input_format: str = "parquet",
) -> dict:
    """Returns run metrics (docs, bytes, wall seconds, buckets run).

    ``exchange`` places the one salted shuffle of the job:

    - ``post`` (default): scan -> kernel (map-only, parallel by parquet
      row-group splits, bytes/task bounded by maxPartitionBytes) ->
      repartition the EXTRACTED rows by url-hash bucket -> partitioned
      write.  Shuffles ~4x fewer bytes (extracted text vs raw html) —
      measured 0.57 -> 0.87 scaling efficiency on the 60k-doc bench.
    - ``pre``: repartition the raw corpus by (bucket, giant-blob
      sub-split) before the kernel — for sources whose split layout
      is degenerate (one giant row group / unsplittable files), where
      the explicit url-hash exchange is the only way to spread work.

    ``input_format='warc'`` reads raw WARC/WARC.gz archives
    (sources/warc.py, one task per file — Common Crawl's natural
    parallelism) instead of a parquet pages table; everything
    downstream (kernel, exchange, lineage, resume) is identical.
    """
    t0 = time.monotonic()
    if input_format == "warc":
        from doc_ocr_spark.sources.warc import read_warc

        corpus = read_warc(spark, input_path)
    else:
        corpus = spark.read.parquet(input_path)
    corpus = with_bucket(corpus.select("url", "html"), n_buckets)

    if not resume and completed_buckets(spark, output):
        # the output append would silently duplicate finished buckets
        raise ValueError(
            f"{output} already has committed lineage; pass --resume to "
            "process only pending buckets (or use a fresh output path)"
        )
    done = set(completed_buckets(spark, output)) if resume else set()
    if done:
        corpus = corpus.filter(~F.col("part_bucket").isin([int(b) for b in done]))

    if exchange == "pre":
        # salted exchange of the raw corpus: keyed by the stable
        # url-hash bucket plus the giant-blob sub-split (explicit skew
        # handling — a task never holds more than ~1/8 of a bucket's
        # giants).  n_buckets >> executors so stragglers interleave.
        corpus = with_skew_split(corpus).repartition(
            n_buckets, "part_bucket", "skew_sub"
        )

    extracted = apply_kernel(
        corpus, templates, respread_input=(exchange != "pre")
    )
    # reattach the bucket for partitioned output (stable function of url,
    # so this is a projection, not a join)
    extracted = with_bucket(extracted, n_buckets)
    if exchange == "post":
        # salted exchange of the extracted rows: same bucket key, same
        # output layout/resume granularity, ~4x fewer bytes through the
        # wire; input-side skew is bounded by parquet split bytes.
        extracted = extracted.repartition(n_buckets, "part_bucket")

    # run totals ride the write action itself — no separate agg pass
    obs = Observation("extract_metrics")
    extracted = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum(F.length("extracted_text")).alias("text_bytes"),
    )

    files_before = _list_data_files(spark, output)
    # DYNAMIC partition overwrite, not append: only the buckets present
    # in this run's data (= the pending ones; committed buckets were
    # filtered out above) have their partitions replaced.  This is the
    # crash-window fix: a run that died BETWEEN the data commit and the
    # lineage append leaves orphaned files in uncommitted buckets, and
    # a resume that appended would duplicate every row of those buckets
    # — with the overwrite the rerun replaces the orphans instead
    # (asserted by test_spark_job.py's crash-resume test).  Committed
    # buckets are untouched either way: absent from the written data,
    # their partitions are not rewritten.
    (
        extracted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_bucket")
        .parquet(output)
    )
    metrics = obs.get
    new_files = {
        p: sz
        for p, sz in _list_data_files(spark, output).items()
        if p not in files_before
    }

    # lineage from the committed files' METADATA (written only after a
    # successful output commit -> checkpoint semantics); the round-1
    # version re-read the entire written output here — a second full
    # data pass at the design point
    wall_ms = int((time.monotonic() - t0) * 1000)
    if new_files:
        lineage = (
            _lineage_from_files(spark, new_files)
            .withColumn("extractor_version", F.lit(KERNEL_VERSION))
            .withColumn("wall_ms", F.lit(wall_ms))
            # bytes_in stays in the schema as a nullable long (ADVICE
            # r02): the footer-only lineage path no longer measures it
            # per bucket, but dropping the column made appends to a
            # pre-existing _lineage dir mixed-schema — a later reader
            # selecting bytes_in would get nondeterministic resolution
            .withColumn("bytes_in", F.lit(None).cast("long"))
        )
        lineage.write.mode("append").parquet(lineage_path(output))
    return {
        "docs": metrics["docs"] or 0,
        "bytes": metrics["bytes_in"] or 0,
        "text_bytes": metrics["text_bytes"] or 0,
        "wall_s": wall_ms / 1000.0,
        "buckets_run": n_buckets - len(done),
        "resumed": bool(done),
    }


def main() -> None:
    from doc_ocr_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--exchange", choices=["pre", "post"], default="post")
    ap.add_argument(
        "--input-format", choices=["parquet", "warc"], default="parquet"
    )
    args = ap.parse_args()
    spark = get_spark("doc_ocr_spark.job", master=args.master)
    m = run_extraction(
        spark,
        args.input,
        args.output,
        n_buckets=args.buckets,
        resume=args.resume,
        exchange=args.exchange,
        input_format=args.input_format,
    )
    rate = m["docs"] / m["wall_s"] if m["wall_s"] else 0.0
    print(
        f"extracted {m['docs']} docs ({m['bytes']} bytes) in {m['wall_s']:.1f}s "
        f"= {rate:.1f} docs/s over {m['buckets_run']} buckets"
    )
    spark.stop()


if __name__ == "__main__":
    main()
