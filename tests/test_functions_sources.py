"""JVM-side normalize functions agree with the Python core; corpus
source round-trips; streaming ingest produces the same rows as batch."""

import pytest
from pyspark.sql import functions as F

from doc_ocr_spark.core.tokens import normalize_text, parse_number
from doc_ocr_spark.functions import normalize_text_col, parse_number_col

SAMPLES = [
    "（Ａ Ｂ）：X",
    "Invoice No: INV-1",
    "合 计（小写）",
    "ＣＮＹ１，２３４.５０",
    "  spaced\tout\ntext  ",
    "",
]

NUMS = ["CNY 1,000.50", "$-12.5", "¥460.54", "junk", "-.", "", "3", "1.5e2"]


def test_normalize_col_matches_core(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = [r.n for r in df.select(normalize_text_col(F.col("s")).alias("n")).collect()]
    want = [normalize_text(s) for s in SAMPLES]
    assert got == want


def test_parse_number_col_matches_core(spark):
    df = spark.createDataFrame([(s,) for s in NUMS], "s string")
    got = [r.n for r in df.select(parse_number_col(F.col("s")).alias("n")).collect()]
    want = [parse_number(s) for s in NUMS]
    # 1.5e2: core strips 'e' -> 1.52; JVM path must agree
    assert got == want


def test_corpus_roundtrip(spark, tmp_path):
    from doc_ocr_spark.datagen import write_corpus_parquet
    from doc_ocr_spark.sources import read_corpus, write_corpus

    src = str(tmp_path / "pages.parquet")
    write_corpus_parquet(src, 50)
    df = read_corpus(spark, src, columns=("url", "html"))
    assert df.columns == ["url", "html"]
    out_ref = str(tmp_path / "bucketed")
    write_corpus(read_corpus(spark, src), out_ref, n_buckets=4, mode="overwrite")
    back = spark.read.parquet(out_ref)
    assert back.count() == 50
    assert back.select("part_bucket").distinct().count() <= 4


def test_streaming_matches_batch(spark, tmp_path):
    from doc_ocr_spark.datagen import write_corpus_parquet
    from doc_ocr_spark.golden import compare_to_golden, golden_rows
    from doc_ocr_spark.streaming import start_incremental_extraction

    indir = tmp_path / "in"
    indir.mkdir()
    # two "crawl drops"
    write_corpus_parquet(str(indir / "drop1.parquet"), 40)
    q = start_incremental_extraction(
        spark,
        str(indir),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        n_buckets=4,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    rows = [
        r.asDict(recursive=True)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .drop("part_bucket", "bytes_in", "extractor_version", "batch_id")
        .collect()
    ]
    assert compare_to_golden(rows, golden_rows(40)) == []
    # restart with no new files: checkpoint prevents reprocessing
    q2 = start_incremental_extraction(
        spark,
        str(indir),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 40


def test_bucket_sql_matches_md5_definition():
    """The portable sampling bucket (first 7 md5 nibbles base-16, mod m)
    must equal the plain-Python definition when evaluated by DuckDB —
    the same SQL text runs verbatim on the Spark side, so this pins the
    cross-engine contract to an independent implementation."""
    import hashlib

    import duckdb

    from doc_ocr_spark.operators.sampling import bucket_sql

    expr = bucket_sql("CAST(x AS STRING)", "salt:")
    for x in [0, 1, 7, 999, 123456789, 10**12]:
        expected = int(hashlib.md5(f"salt:{x}".encode()).hexdigest()[:7], 16) % 1000
        got = duckdb.sql(f"SELECT {expr} FROM (SELECT {x} AS x)").fetchone()[0]
        assert got == expected, (x, got, expected)


def test_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """Checkpoint-replay safety (north rule: resumable without
    recompute-duplication): re-running a batch with the SAME batch_id
    must replace its previous output, not append beside it — the
    dynamic batch_id-partition overwrite in write_extracted_batch."""
    from doc_ocr_spark.datagen import write_corpus_parquet
    from doc_ocr_spark.streaming import write_extracted_batch

    src = tmp_path / "pages.parquet"
    write_corpus_parquet(str(src), 30)
    out = str(tmp_path / "out")
    batch = spark.read.parquet(str(src)).select("url", "html")
    write_extracted_batch(batch, 0, out, n_buckets=4)
    first = spark.read.parquet(out).count()
    # simulated checkpoint replay: the same batch runs again
    write_extracted_batch(batch, 0, out, n_buckets=4)
    again = spark.read.parquet(out)
    assert again.count() == first == 30
    assert again.select("url").distinct().count() == 30
    # a NEW batch still lands beside it (no cross-batch clobber)
    write_extracted_batch(batch.limit(5), 1, out, n_buckets=4)
    assert spark.read.parquet(out).count() == 35


def test_ingest_refuses_legacy_partition_layout(spark, tmp_path):
    """ADVICE r04: restarting a pre-round-4 stream (output partitioned
    by part_bucket only) against the batch_id+part_bucket writer would
    mix two layouts in one dir — unreadable, and replays could not
    overwrite old-layout rows.  The writer must fail fast instead."""
    from doc_ocr_spark.datagen import write_corpus_parquet
    from doc_ocr_spark.streaming import write_extracted_batch

    src = tmp_path / "pages.parquet"
    write_corpus_parquet(str(src), 5)
    batch = spark.read.parquet(str(src)).select("url", "html")
    out = tmp_path / "out"
    (out / "part_bucket=3").mkdir(parents=True)  # legacy top-level layout
    with pytest.raises(RuntimeError, match="legacy part_bucket-only"):
        write_extracted_batch(batch, 0, str(out), n_buckets=2)
    # an output dir in the CURRENT layout (or empty) is accepted
    out2 = str(tmp_path / "out2")
    write_extracted_batch(batch, 0, out2, n_buckets=2)
    assert spark.read.parquet(out2).count() == 5
