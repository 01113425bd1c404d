"""Deterministic corpus-sampling operators: stratified sampling,
train/val/test splits, Gopher-style repetition stats.

A 100-TB training-data pipeline needs *reproducible* sampling — the
split a document lands in must be a pure function of its identity, not
of partitioning, executor count, or RNG state, so re-runs, resumes and
two differently-sized clusters all agree row-for-row. The standard
trick (used by CC-Net / RedPajama-style pipelines) is to hash a stable
key into a bucket in [0, 1000) and compare against per-stratum rates.

Portability discipline: the bucket is the first 7 md5 hex nibbles of a
salted key, recombined base-16 with ``instr``/``substr`` integer
arithmetic only — the exact same SQL text evaluates identically in
Spark and DuckDB (same pattern as the simhash operator,
dedup.py). Everything is JVM-side; no Python UDFs, no shuffle for the
sample/split themselves (map-only filters), one groupBy for the split
census.

Reference tie-in: the reference pipeline has no sampler (it is a
one-request service, app/main.py); this module is part of the
"training-data pipeline" mandate, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from doc_ocr_spark.operators import load, respread
from doc_ocr_spark.operators.dedup import MINHASH_SQL, _SHINGLES_CTE, _shingles
from doc_ocr_spark.operators.textstats import LANG_SQL as LANG_SQL_REF
from doc_ocr_spark.operators.textstats import lang_pred_col

_HEX = "0123456789abcdef"


def bucket_sql(key_sql: str, salt: str, mod: int = 1000) -> str:
    """SQL for a deterministic bucket in [0, mod): first 7 md5 nibbles
    of ``salt || key`` recombined base-16, mod ``mod``.

    The emitted text is valid and value-identical in Spark SQL and
    DuckDB (md5/substr/instr/% behave the same; 28 bits fits INT).
    """
    h = f"md5(concat('{salt}', {key_sql}))"
    nibs = " + ".join(
        f"(instr('{_HEX}', substr({h}, {k + 1}, 1)) - 1) * {16 ** (6 - k)}"
        for k in range(7)
    )
    return f"(({nibs}) % {mod})"


# Per-language keep-rate (per mille): down-sample the over-represented
# languages, keep the tail fully — the usual rebalancing shape.
_RATES = {"en": 250, "zh": 500, "de": 500}
_DEFAULT_RATE = 800

_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{g}' THEN {r}" for g, r in _RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)

_DOC_BUCKET = bucket_sql("CAST(doc_id AS STRING)", "sample:")
_SPLIT_BUCKET = bucket_sql("CAST(doc_id AS STRING)", "split:")


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-stratified down-sample of `documents` by language.

    Map-only: the filter is a pure function of doc_id/lang, so it pushes
    into the scan stage, needs no shuffle, and yields the same kept set
    at any parallelism. ``bucket``/``rate`` are kept in the output so
    the decision is auditable.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", F.expr(_DOC_BUCKET).cast("long"))
        .withColumn("rate", F.expr(_RATE_CASE).cast("long"))
        .where(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "bucket", "rate")
    )


STRATIFIED_SQL = f"""
SELECT doc_id, lang,
       CAST({_DOC_BUCKET} AS BIGINT) AS bucket,
       CAST({_RATE_CASE} AS BIGINT) AS rate
FROM documents
WHERE {_DOC_BUCKET} < {_RATE_CASE}
"""


def corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10 by hash
    bucket, salted independently from the sampler) + per-(lang, split)
    census.

    The census groupBy is the only shuffle and its cardinality is
    |langs| * 3 — trivially broadcastable downstream at any scale.
    """
    docs = load(spark, sf_dir, "documents")
    split = (
        F.when(F.expr(_SPLIT_BUCKET) < 800, "train")
        .when(F.expr(_SPLIT_BUCKET) < 900, "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


SPLITS_SQL = f"""
SELECT lang,
       CASE WHEN {_SPLIT_BUCKET} < 800 THEN 'train'
            WHEN {_SPLIT_BUCKET} < 900 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM documents
GROUP BY 1, 2
"""


# In-row top-bigram count: sort the doc's bigram array, then the most
# frequent bigram's count is the longest run of equal neighbours.  A
# higher-order `aggregate` is interpreted (outside codegen), but per
# the repo's measured HOF rule (BENCH finding #9) that cost is paid
# ONLY where it deletes a shuffle — here it deletes the whole
# (doc_id, bigram) exchange plus the join back, making the operator
# map-only.
_TOP_BIGRAM = """
aggregate(
  array_sort(transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', w[i + 1]))),
  struct(cast(null as string) as prev, 0L as run, 0L as best),
  (acc, x) -> struct(
    x as prev,
    if(x <=> acc.prev, acc.run + 1, 1L) as run,
    greatest(acc.best, if(x <=> acc.prev, acc.run + 1, 1L)) as best),
  acc -> acc.best)
"""


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of words
    covered by the most frequent word 2-gram, and distinct-word ratio.

    Shape at scale: everything is IN-ROW — the top-bigram count is the
    longest equal-run of the doc's sorted bigram array, so the plan is
    a bare scan+project with zero shuffles (plan-shape-tested).  The
    earlier explode + (doc_id, bigram) partial-agg + join form was
    correct but shuffled a row per distinct bigram.  Honest local
    measurement: on single-JVM local[32] the two forms are a wash
    (~6 s either way at the sf1eq point) because an in-process shuffle
    is nearly free while the HOF runs interpreted; the in-row form is
    kept because at cluster scale the exchange costs network+spill
    that grows with data while interpreted eval only costs CPU that
    scales with cores (BENCH finding #9's rule: HOFs exactly where
    they delete a shuffle).  A doc with fewer than 2 words has no
    bigrams and a zero count.
    """
    # round 6: the in-row HOF work runs at scan parallelism; the driver's
    # sf1.0 corpus is one split, which starved the whole operator to one
    # core (2.6 s -> ~0.5 s with the conditional respread).  At corpus
    # scale respread is a structural no-op, so the map-only scale shape
    # stands (plan test allows only the round-robin exchange).
    docs = respread(load(spark, sf_dir, "documents"))
    words = F.split("text", " ")
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    base = docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        words.alias("w"),
    ).withColumn("top_bigram_n", F.expr(_TOP_BIGRAM))
    return base.select(
        "doc_id",
        "n_words",
        "n_distinct",
        "top_bigram_n",
        r6(
            F.col("top_bigram_n").cast("double") * 2 / F.col("n_words")
        ).alias("rep2_ratio"),
        r6(F.col("n_distinct").cast("double") / F.col("n_words")).alias(
            "distinct_ratio"
        ),
    )


REPETITION_SQL = """
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         string_split(text, ' ') AS w
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i + 1])) AS bg
  FROM base
),
top AS (
  SELECT doc_id, max(n) AS top_bigram_n
  FROM (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT base.doc_id, n_words, n_distinct,
       CAST(coalesce(top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       floor(CAST(coalesce(top_bigram_n, 0) AS DOUBLE) * 2 / n_words * 1e6 + 0.5) / 1e6
         AS rep2_ratio,
       floor(CAST(n_distinct AS DOUBLE) / n_words * 1e6 + 0.5) / 1e6
         AS distinct_ratio
FROM base LEFT JOIN top ON base.doc_id = top.doc_id
"""

# Benchmark decontamination: docs with doc_id < BENCH_DOCS stand in
# for the held-out eval set (at corpus scale this is a side input of a
# few thousand documents — always broadcastable).
BENCH_DOCS = 20


def contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus documents sharing >=1 word-shingle with the
    benchmark set, with the shared-shingle count.

    Scale shape: the benchmark shingle set is tiny by construction, so
    the overlap test is a BROADCAST join against the RAW (non-distinct)
    corpus shingle stream — the broadcast join is a map-side filter, so
    the only rows that ever reach an exchange are the matches: dedup to
    per-(doc, shingle) and the doc_id count both run on that far
    smaller set.  (Distincting the corpus stream BEFORE the join would
    shuffle every shingle in the corpus — the join does not push below
    a distinct.)  This is the standard eval-decontamination pass
    (C4/GPT-3 style n-gram overlap), with the n-gram order inherited
    from the dedup module's shingler.
    """
    sh = _shingles(load(spark, sf_dir, "documents"), distinct=False)
    bench = (
        sh.filter(F.col("doc_id") < BENCH_DOCS).select("s").distinct()
    )
    corpus = sh.filter(F.col("doc_id") >= BENCH_DOCS)
    return (
        corpus.join(F.broadcast(bench), "s")
        .select("doc_id", "s")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


CONTAMINATION_SQL = f"""
WITH {_SHINGLES_CTE},
bench AS (SELECT DISTINCT s FROM shingles WHERE doc_id < {BENCH_DOCS})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM shingles JOIN bench USING (s)
WHERE doc_id >= {BENCH_DOCS}
GROUP BY doc_id
"""


# Per-domain cap (RefinedWeb/C4-style): keep at most QUOTA docs per
# source, selected by the deterministic hash order so the kept set is
# unbiased and reproducible.
DOMAIN_QUOTA = 30

_QUOTA_BUCKET = bucket_sql("CAST(doc_id AS STRING)", "quota:", mod=1000000)


def domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the first DOMAIN_QUOTA docs per source in deterministic
    hash order.

    Scale shape: row_number + filter compiles to Spark's
    WindowGroupLimit with a PARTIAL pass before the shuffle — each map
    task forwards at most QUOTA rows per source it sees, so a hot
    domain with millions of pages shuffles O(tasks x QUOTA) rows, not
    its full volume (plan-shape-tested).
    """
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr(_QUOTA_BUCKET).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_QUOTA)
    )


QUOTA_SQL = f"""
SELECT doc_id, source, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_QUOTA_BUCKET}, doc_id) AS rk
  FROM documents
) WHERE rk <= {DOMAIN_QUOTA}
"""

# ---------------------------------------------------------------------------
# Composite curation pipeline

# Drop thresholds (chosen so each rule is live on the synthetic corpus)
CONTAM_MIN = 8  # shared shingles with the benchmark set
REP_MAX = 0.2  # max top-bigram coverage


CURATION_SIGNALS_VERSION = 2  # round 5: + nd_loser (near-dup cluster) signal
_SIGNALS_PARTS = 8  # doc_id-hash partitions of the materialized table


def curation_signals_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE DAG computing every per-doc curation signal column:
    (doc_id, source, keep_id, bucket, rate, lang_pred, n_shared,
    rep2_ratio, in_quota).

    Composition is by doc_id joins of the constituent operators'
    outputs, so each signal keeps its own scale shape (broadcast
    contamination, partial-limit quota — the quota signal JOINS the
    domain_quota operator's output, whose adjacent rk filter is what
    lets Spark plan the WindowGroupLimit partial pass; an inline
    row_number with the comparison buried in a CASE would shuffle a hot
    domain's full volume) and Catalyst stitches them into a single DAG.
    Map-only signals (lang ID, sample bucket/rate, text hash) fold into
    the base scan; only the aggregating signals (dedup keepers,
    contamination, repetition, quota) add their own corpus passes.
    """
    docs = load(spark, sf_dir, "documents")
    keepers = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    base = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.expr(_DOC_BUCKET).cast("long").alias("bucket"),
        F.expr(_RATE_CASE).cast("long").alias("rate"),
        lang_pred_col().alias("lang_pred"),
    ).join(keepers, "h")
    within_quota = domain_quota(spark, sf_dir).select("doc_id").withColumn(
        "in_quota", F.lit(True)
    )
    contam = contamination_flags(spark, sf_dir)
    rep = repetition_stats(spark, sf_dir).select("doc_id", "rep2_ratio")
    # near-dup cluster LOSERS (round 5): the minhash-LSH pair graph's
    # connected components, keeper = min doc_id per cluster — exact
    # dedup alone keeps every perturbed near-copy; this signal lets the
    # decision drop the copies while the keeper survives (the standard
    # exact -> near-dup cascade).  dedup_clusters reads the staged pair
    # table and label-propagates to fixpoint (eager localCheckpoint),
    # so the signals BUILD pays it once like every other signal.
    from doc_ocr_spark.operators.dedup import dedup_clusters

    nd_losers = (
        dedup_clusters(spark, sf_dir)
        .filter(~F.col("is_keeper"))
        .select("doc_id")
        .withColumn("nd_loser", F.lit(True))
    )
    return (
        base.join(contam, "doc_id", "left")
        .join(rep, "doc_id")
        .join(within_quota, "doc_id", "left")
        .join(nd_losers, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "keep_id",
            "bucket",
            "rate",
            "lang_pred",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            "rep2_ratio",
            F.col("in_quota").isNotNull().alias("in_quota"),
            F.col("nd_loser").isNotNull().alias("nd_loser"),
        )
    )


def curation_signals_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the signals table ONCE per corpus (VERDICT r02 item
    2: the curation decision must join a signals table, not re-scan
    `documents` per signal).  The testdata dir is read-only, so the
    table lands in the staging root (``staging.stage_root`` — env-
    overridable; on a cluster point SPARK_GRAFT_STAGE_DIR at shared
    storage); it is written doc_id-hash-partitioned ({_SIGNALS_PARTS}
    parts here — at 100 TB this is a `bucketBy(doc_id)` catalog table
    so the decision join and any doc-keyed consumer are exchange-free).

    The cache key folds the corpus CONTENT fingerprint plus every
    upstream constant that shapes a signal column (sampling buckets and
    rates, lang-ID rule, shingle definition, contamination/quota/
    repetition thresholds) — changing any of them invalidates the table
    without a manual version bump (ADVICE r03)."""
    import os

    from doc_ocr_spark import staging
    from doc_ocr_spark.operators.textstats import LANG_SQL

    src = os.path.join(sf_dir, "documents.parquet")
    key = staging.content_key(
        CURATION_SIGNALS_VERSION,
        _SIGNALS_PARTS,
        staging.file_fingerprint(src),
        _DOC_BUCKET,
        _RATE_CASE,
        LANG_SQL,
        _SHINGLES_CTE,
        BENCH_DOCS,
        CONTAM_MIN,
        REP_MAX,
        DOMAIN_QUOTA,
        _QUOTA_BUCKET,
        _TOP_BIGRAM,
        # the near-dup loser signal inherits every minhash/LSH constant
        # through the generating-SQL text (round 5)
        MINHASH_SQL,
    )

    def build(tmp: str) -> None:
        curation_signals_frame(spark, sf_dir).repartition(
            _SIGNALS_PARTS, "doc_id"
        ).write.mode("overwrite").parquet(tmp)

    return staging.ensure_staged("signals", key, build)


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship curation pass: every document gets a keep/drop
    decision with the FIRST failing rule as its reason:

      benchmark   doc is part of the held-out eval set (never train on it)
      duplicate   exact-dup loser (a lower doc_id has identical text)
      near_duplicate  minhash-LSH cluster loser (round 5: the keeper of
                  each near-dup connected component survives; exact
                  dedup alone keeps every perturbed near-copy)
      contaminated >= CONTAM_MIN shingles shared with the benchmark set
      lang_unknown language ID could not classify
      repetitive  top bigram covers > REP_MAX of the words
      over_quota  beyond the per-source cap
      sampled_out hash-sampled away by the per-lang rate
      kept        survives everything

    Scale shape: the per-doc signal columns are MATERIALIZED once
    (`curation_signals_path`) and the decision is a join of one
    `documents` identity scan against that table (plan-shape-tested:
    exactly two FileScans).  Re-deriving every signal inline cost ~6
    corpus scans per decision run; the signals table pays them once and
    amortizes across decision reruns, threshold sweeps, and any other
    doc-keyed consumer — the standard signals/decision split of
    large-corpus curation pipelines.
    """
    sig = spark.read.parquet(curation_signals_path(spark, sf_dir))
    docs = load(spark, sf_dir, "documents").select("doc_id")
    joined = docs.join(sig, "doc_id")
    reason = (
        F.when(F.col("doc_id") < BENCH_DOCS, "benchmark")
        .when(F.col("doc_id") != F.col("keep_id"), "duplicate")
        .when(F.col("nd_loser"), "near_duplicate")
        .when(F.col("n_shared") >= CONTAM_MIN, "contaminated")
        .when(F.col("lang_pred") == "und", "lang_unknown")
        .when(F.col("rep2_ratio") > REP_MAX, "repetitive")
        .when(~F.col("in_quota"), "over_quota")
        .when(F.col("bucket") >= F.col("rate"), "sampled_out")
        .otherwise("kept")
    )
    return joined.select(
        "doc_id",
        (reason == F.lit("kept")).alias("keep"),
        reason.alias("reason"),
    )


CURATION_SQL = f"""
WITH RECURSIVE rep AS MATERIALIZED ({REPETITION_SQL}),
contam AS MATERIALIZED ({CONTAMINATION_SQL}),
langp AS ({LANG_SQL_REF}),
keepers AS (SELECT md5(text) AS h, min(doc_id) AS keep_id
            FROM documents GROUP BY 1),
mhp AS MATERIALIZED ({MINHASH_SQL}),
nd_edges AS (
  SELECT doc_a AS a, doc_b AS b FROM mhp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM mhp
),
nd_reach(a, b) AS (
  SELECT a, b FROM nd_edges
  UNION
  SELECT r.a, e.b FROM nd_reach r JOIN nd_edges e ON r.b = e.a
),
nd_comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
  FROM nd_reach GROUP BY a
),
nd_losers AS (
  SELECT c.doc_id
  FROM nd_comp c
  JOIN (SELECT cluster_id, min(doc_id) AS nd_keep
        FROM nd_comp GROUP BY cluster_id) k USING (cluster_id)
  WHERE c.doc_id <> k.nd_keep
),
curation_base AS (
  SELECT doc_id, source, md5(text) AS h,
         CAST({_DOC_BUCKET} AS BIGINT) AS bucket,
         CAST({_RATE_CASE} AS BIGINT) AS rate,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_QUOTA_BUCKET}, doc_id) AS rk
  FROM documents
)
SELECT doc_id, reason = 'kept' AS keep, reason FROM (
  SELECT b.doc_id,
    CASE WHEN b.doc_id < {BENCH_DOCS} THEN 'benchmark'
         WHEN b.doc_id <> k.keep_id THEN 'duplicate'
         WHEN n.doc_id IS NOT NULL THEN 'near_duplicate'
         WHEN coalesce(c.n_shared, 0) >= {CONTAM_MIN} THEN 'contaminated'
         WHEN l.lang_pred = 'und' THEN 'lang_unknown'
         WHEN r.rep2_ratio > {REP_MAX} THEN 'repetitive'
         WHEN b.rk > {DOMAIN_QUOTA} THEN 'over_quota'
         WHEN b.bucket >= b.rate THEN 'sampled_out'
         ELSE 'kept' END AS reason
  FROM curation_base b
  JOIN keepers k USING (h)
  LEFT JOIN contam c ON b.doc_id = c.doc_id
  JOIN rep r ON b.doc_id = r.doc_id
  JOIN langp l ON b.doc_id = l.doc_id
  LEFT JOIN nd_losers n ON b.doc_id = n.doc_id
)
"""

ORACLES = {
    "stratified_sample": STRATIFIED_SQL,
    "corpus_splits": SPLITS_SQL,
    "repetition_stats": REPETITION_SQL,
    "contamination_flags": CONTAMINATION_SQL,
    "domain_quota": QUOTA_SQL,
    "corpus_curation": CURATION_SQL,
}

QUERIES = {
    "stratified_sample": stratified_sample,
    "corpus_splits": corpus_splits,
    "repetition_stats": repetition_stats,
    "contamination_flags": contamination_flags,
    "domain_quota": domain_quota,
    "corpus_curation": corpus_curation,
}
