"""Distributed-vs-golden byte-identity + checkpoint/resume protocol."""

import os

import pytest
from pyspark.sql import functions as F

from doc_ocr_spark.datagen import write_corpus_parquet
from doc_ocr_spark.golden import compare_to_golden, golden_rows
from doc_ocr_spark.job import completed_buckets, run_extraction
from doc_ocr_spark.kernel import apply_kernel

N_DOCS = 150


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "pages.parquet"
    write_corpus_parquet(str(p), N_DOCS, seed=42)
    return str(p)


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def test_kernel_matches_golden_bytewise(spark, corpus_path):
    golden = golden_rows(N_DOCS, seed=42)
    df = spark.read.parquet(corpus_path)
    out = _rows(apply_kernel(df.repartition(7)))
    assert compare_to_golden(out, golden) == []


def test_kernel_partitioning_invariance(spark, corpus_path):
    """Same result regardless of partition count / input order
    (SURVEY.md §5.2.4 determinism gate)."""
    df = spark.read.parquet(corpus_path)
    a = _rows(apply_kernel(df.repartition(2)))
    b = _rows(apply_kernel(df.orderBy(F.rand(seed=1)).repartition(13)))
    assert compare_to_golden(a, b) == []


def test_job_end_to_end_with_lineage(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    m = run_extraction(spark, corpus_path, out, n_buckets=8)
    assert m["docs"] == N_DOCS
    result = spark.read.parquet(out)
    assert result.count() == N_DOCS
    # lineage: one row per bucket, stats add up
    lin = spark.read.parquet(os.path.join(out, "_lineage"))
    assert lin.count() == 8
    assert lin.agg(F.sum("doc_count")).collect()[0][0] == N_DOCS
    assert set(completed_buckets(spark, out)) == set(range(8))
    # golden identity straight off the committed table
    assert compare_to_golden(_rows(result.drop("part_bucket", "bytes_in", "extractor_version")), golden_rows(N_DOCS)) == []


def test_lineage_costs_no_output_data_read(spark, corpus_path, tmp_path, monkeypatch):
    """Round-1 regression guard: lineage must come from file METADATA
    (footers + listing) and Observation, never from re-reading the
    written output — at the design point that re-read was a second full
    pass over the extracted corpus.  Intercepts DataFrameReader.parquet
    and fails if the output path is ever loaded during the job."""
    from pyspark.sql.readwriter import DataFrameReader

    out = str(tmp_path / "out_noreread")
    real_parquet = DataFrameReader.parquet
    read_paths = []

    def spy(self, *paths, **opts):
        read_paths.extend(paths)
        return real_parquet(self, *paths, **opts)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    m = run_extraction(spark, corpus_path, out, n_buckets=8)
    assert m["docs"] == N_DOCS
    offenders = [
        p for p in read_paths
        if p.startswith(out) and not p.startswith(os.path.join(out, "_lineage"))
    ]
    assert offenders == [], f"job re-read its own output: {offenders}"
    # and the metadata-derived lineage is still exact
    lin = spark.read.parquet(os.path.join(out, "_lineage"))
    assert lin.agg(F.sum("doc_count")).collect()[0][0] == N_DOCS
    assert lin.filter(F.col("bytes_out") <= 0).count() == 0
    per_bucket = {
        r.part_bucket: r.doc_count for r in lin.collect()
    }
    actual = {
        r.part_bucket: r.n
        for r in spark.read.parquet(out)
        .groupBy("part_bucket").agg(F.count("*").alias("n")).collect()
    }
    assert per_bucket == actual


def test_job_resume_skips_completed_buckets(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out2")
    run_extraction(spark, corpus_path, out, n_buckets=8)
    before = spark.read.parquet(out).count()
    m = run_extraction(spark, corpus_path, out, n_buckets=8, resume=True)
    assert m["resumed"] is True
    assert m["docs"] == 0  # nothing left to do
    assert spark.read.parquet(out).count() == before  # no duplicates


def test_job_resume_processes_only_pending(spark, corpus_path, tmp_path):
    """Simulate a mid-run failure: first run covers half the buckets."""
    out = str(tmp_path / "out3")
    df = spark.read.parquet(corpus_path)
    # restrict first run to buckets 0-3 by filtering the input on the
    # same stable hash the job uses
    from doc_ocr_spark.job import with_bucket

    half = with_bucket(df, 8).filter(F.col("part_bucket") < 4).drop("part_bucket")
    half_path = str(tmp_path / "half.parquet")
    half.write.parquet(half_path)
    run_extraction(spark, half_path, out, n_buckets=8)
    done = set(completed_buckets(spark, out))
    assert done and done.issubset(set(range(8)))
    m = run_extraction(spark, corpus_path, out, n_buckets=8, resume=True)
    assert spark.read.parquet(out).count() == N_DOCS
    assert compare_to_golden(
        _rows(
            spark.read.parquet(out).drop("part_bucket", "bytes_in", "extractor_version")
        ),
        golden_rows(N_DOCS),
    ) == []


def test_skew_split_spreads_giants(spark, tmp_path):
    """Explicit skew handling: giant html blobs in ONE url-hash bucket
    must fan out across multiple shuffle partitions, while normal rows
    keep skew_sub=0 (bucket bulk stays together)."""
    from pyspark.sql import functions as F

    from doc_ocr_spark.job import GIANT_HTML_BYTES, with_bucket, with_skew_split

    giant = b"x" * (GIANT_HTML_BYTES + 1)
    rows = [(f"https://g.test/{i}", bytearray(giant)) for i in range(32)]
    rows += [(f"https://n.test/{i}", bytearray(b"<p>small</p>")) for i in range(32)]
    df = with_skew_split(
        with_bucket(
            spark.createDataFrame(rows, "url string, html binary"), 1
        )
    )
    out = df.select(
        "url",
        "part_bucket",
        "skew_sub",
        (F.length("html") > GIANT_HTML_BYTES).alias("is_giant"),
    ).collect()
    subs_giants = {r.skew_sub for r in out if r.is_giant}
    subs_normal = {r.skew_sub for r in out if not r.is_giant}
    assert subs_normal == {0}
    assert len(subs_giants) >= 3  # 32 giants over 8 sub-keys
    # the exchange key spreads giants over distinct partitions
    parts = (
        df.repartition(8, "part_bucket", "skew_sub")
        .withColumn("pid", F.spark_partition_id())
        .filter(F.length("html") > GIANT_HTML_BYTES)
        .select("pid")
        .distinct()
        .count()
    )
    assert parts >= 3


def test_pre_exchange_path_matches_golden(spark, corpus_path, tmp_path):
    """--exchange pre (input-side salted repartition + giant sub-split)
    must produce byte-identical output to the golden run, like the
    default post-kernel exchange."""
    out = str(tmp_path / "out_pre")
    m = run_extraction(spark, corpus_path, out, n_buckets=8, exchange="pre")
    assert m["docs"] == N_DOCS
    result = spark.read.parquet(out)
    assert (
        compare_to_golden(
            _rows(result.drop("part_bucket", "bytes_in", "extractor_version")),
            golden_rows(N_DOCS),
        )
        == []
    )


def test_job_resume_after_crash_between_data_and_lineage(spark, corpus_path, tmp_path):
    """The crash window the dynamic partition overwrite closes: data
    files committed but the lineage append never ran.  A resume must
    REPLACE the orphaned bucket output, not append a duplicate copy."""
    import shutil

    from doc_ocr_spark.job import lineage_path

    out = str(tmp_path / "out4")
    run_extraction(spark, corpus_path, out, n_buckets=8)
    assert spark.read.parquet(out).count() == N_DOCS
    # simulate the crash: wipe the lineage commit, keep the data files
    shutil.rmtree(lineage_path(out))
    assert completed_buckets(spark, out) == []
    m = run_extraction(spark, corpus_path, out, n_buckets=8, resume=True)
    assert m["docs"] == N_DOCS  # everything recomputed...
    assert spark.read.parquet(out).count() == N_DOCS  # ...but not duplicated
    assert compare_to_golden(
        _rows(
            spark.read.parquet(out).drop("part_bucket", "bytes_in", "extractor_version")
        ),
        golden_rows(N_DOCS),
    ) == []
    # lineage recommitted for every bucket
    assert set(completed_buckets(spark, out)) == set(range(8))


def test_job_crash_injected_between_data_commit_and_lineage(
    spark, corpus_path, tmp_path, monkeypatch
):
    """VERDICT r04 item 5: failure INJECTION at the exact boundary the
    dynamic overwrite protects — the run's data write has committed but
    it dies BEFORE the lineage append (injected: the lineage derivation
    raises), on top of partial prior progress (half the buckets already
    committed).  The follow-up resume must neither duplicate the
    orphaned buckets' rows nor drop or recompute the committed ones."""
    from doc_ocr_spark import job as J

    out = str(tmp_path / "out_crash")
    # prior progress: a completed run over the bucket<4 half-corpus
    half = (
        J.with_bucket(spark.read.parquet(corpus_path), 8)
        .filter(F.col("part_bucket") < 4)
        .drop("part_bucket")
    )
    half_path = str(tmp_path / "half_crash.parquet")
    half.write.parquet(half_path)
    run_extraction(spark, half_path, out, n_buckets=8)
    committed = set(completed_buckets(spark, out))
    assert committed == set(range(4))
    n_committed_docs = spark.read.parquet(out).count()

    def _die(*a, **k):
        raise RuntimeError("injected kill between data commit and lineage append")

    monkeypatch.setattr(J, "_lineage_from_files", _die)
    with pytest.raises(RuntimeError, match="injected kill"):
        run_extraction(spark, corpus_path, out, n_buckets=8, resume=True)
    monkeypatch.undo()

    # post-crash state: orphaned data for buckets 4-7, no lineage for them
    assert set(completed_buckets(spark, out)) == committed
    assert spark.read.parquet(out).count() == N_DOCS  # data DID commit

    m = run_extraction(spark, corpus_path, out, n_buckets=8, resume=True)
    # committed buckets were skipped, only the orphaned ones recomputed
    assert m["docs"] == N_DOCS - n_committed_docs
    final = spark.read.parquet(out)
    assert final.count() == N_DOCS  # orphans replaced, not appended-to
    assert final.select("url").distinct().count() == N_DOCS  # nothing dropped
    assert compare_to_golden(
        _rows(final.drop("part_bucket", "bytes_in", "extractor_version")),
        golden_rows(N_DOCS),
    ) == []
    # lineage now covers every bucket exactly once, counts exact
    lin = spark.read.parquet(J.lineage_path(out))
    per_bucket = {r.part_bucket: r.doc_count for r in lin.collect()}
    assert set(per_bucket) == set(range(8))
    actual = {
        r.part_bucket: r.n
        for r in final.groupBy("part_bucket").agg(F.count("*").alias("n")).collect()
    }
    assert per_bucket == actual
