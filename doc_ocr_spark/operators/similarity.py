"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Parity discipline: dot products are summed as scaled longs
(``floor(p * 1e12)`` per element product — exact, order-independent,
and on codegen's primitive fast path; see operators/__init__.py for why
not DECIMAL), so Spark and DuckDB agree bit-for-bit before the final
6-dp rounding (error bound 64e-12 << 1e-6).  The Spark side uses only
built-in expressions (explode + hash agg) — no Python.

- ``ann_cosine_topk``   brute-force cosine top-k (the correctness
  baseline; O(q x n), broadcast the query set)
- ``ann_ivf_bucketed``  IVF-style bucket assignment (the scale path:
  each vector is routed to its nearest centroid; at 100 TB the top-k
  search then touches one bucket instead of the full corpus)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from doc_ocr_spark.operators import load, scaled_long

DIM = 64
N_QUERIES = 8       # vec_id < 8 are the query vectors
N_CENTROIDS = 10    # vec_id < 10 act as IVF centroids
TOP_K = 5

_S = 1e12  # fix-point scale for per-element products (|p| < 1e3)
_S_SQL = "1000000000000.0"
_SM = 1e6  # scale for unbounded-cardinality accumulators (k-means means)
_SM_SQL = "1000000.0"


def _norms(emb: DataFrame) -> DataFrame:
    """(vec_id, nrm) — sqrt of the exact-decimal sum of squares."""
    expl = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"),
        "embedding",
    ).select(
        "vec_id",
        scaled_long(
            F.element_at("embedding", F.col("i")).cast("double")
            * F.element_at("embedding", F.col("i")).cast("double"),
            _S,
        ).alias("sq"),
    )
    return expl.groupBy("vec_id").agg(
        F.sqrt(F.sum("sq").cast("double") / _S).alias("nrm")
    )


def _sims(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cosine sims for the cross product left x right (left is small and
    broadcast).  Columns: qid, cid, sim (rounded 6dp)."""
    l = left.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    r = right.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    pairs = r.crossJoin(F.broadcast(l)).filter(F.col("qid") != F.col("cid"))
    dots = (
        pairs.select(
            "qid",
            "cid",
            "qn",
            "cn",
            F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"),
            "qe",
            "ce",
        )
        .select(
            "qid",
            "cid",
            "qn",
            "cn",
            scaled_long(
                F.element_at("qe", F.col("i")).cast("double")
                * F.element_at("ce", F.col("i")).cast("double"),
                _S,
            ).alias("p"),
        )
        .groupBy("qid", "cid", "qn", "cn")
        .agg(F.sum("p").alias("dot"))
    )
    return dots.select(
        "qid",
        "cid",
        F.round(
            (F.col("dot").cast("double") / _S) / (F.col("qn") * F.col("cn")), 6
        ).alias("sim"),
    )


def _emb_with_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return emb.join(_norms(emb), "vec_id")


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first N_QUERIES vectors."""
    emb = _emb_with_norms(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    sims = _sims(q, emb)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "sim", "rank")
    )


_NORMS_CTE = f"""
expl AS (
  SELECT vec_id, embedding, unnest(generate_series(1, {DIM})) AS i
  FROM embeddings
),
norms AS (
  SELECT vec_id,
         sqrt(CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                            * {_S_SQL}) AS BIGINT)) AS DOUBLE) / {_S_SQL}) AS nrm
  FROM expl GROUP BY vec_id
),
emb AS (SELECT e.vec_id, e.embedding, n.nrm FROM embeddings e JOIN norms n USING (vec_id))
"""


def _sims_sql(left_filter: str) -> str:
    return f"""
pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, q.embedding AS qe, c.embedding AS ce,
         q.nrm AS qn, c.nrm AS cn
  FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
  WHERE q.vec_id {left_filter}
),
pexpl AS (
  SELECT qid, cid, qn, cn, qe, ce, unnest(generate_series(1, {DIM})) AS i
  FROM pairs
),
dots AS (
  SELECT qid, cid, qn, cn,
         sum(CAST(floor(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) * {_S_SQL}) AS BIGINT)) AS dot
  FROM pexpl GROUP BY qid, cid, qn, cn
),
sims AS (
  SELECT qid, cid, round((CAST(dot AS DOUBLE) / {_S_SQL}) / (qn * cn), 6) AS sim
  FROM dots
)
"""


TOPK_SQL = f"""
WITH {_NORMS_CTE}, {_sims_sql(f"< {N_QUERIES}")}
SELECT qid, cid, sim, rank FROM (
  SELECT qid, cid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
  FROM sims
) WHERE rank <= {TOP_K}
"""


def ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF assignment: route every vector to its max-cosine centroid
    (centroids = vec_id < N_CENTROIDS; deterministic stand-in for a
    k-means fit, which would be seeded at corpus scale)."""
    emb = _emb_with_norms(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS)
    sims = _sims(cents, emb)
    w = Window.partitionBy("cid").orderBy(F.col("sim").desc(), F.col("qid").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(
            F.col("cid").alias("vec_id"),
            F.col("qid").alias("bucket"),
            F.col("sim"),
        )
    )


IVF_SQL = f"""
WITH {_NORMS_CTE}, {_sims_sql(f"< {N_CENTROIDS}")}
SELECT cid AS vec_id, qid AS bucket, sim FROM (
  SELECT qid, cid, sim,
         row_number() OVER (PARTITION BY cid ORDER BY sim DESC, qid) AS rank
  FROM sims
) WHERE rank = 1
"""


def ann_nn_within_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, the scale path end-to-end: IVF-assign every
    vector to a bucket, then find each vector's nearest neighbour
    WITHIN its bucket only.  At 100 TB the pair join is bounded by
    bucket size instead of n^2 (the embedding analogue of LSH-banded
    MinHash in dedup.py)."""
    emb = _emb_with_norms(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS)
    asg_w = Window.partitionBy("cid").orderBy(F.col("sim").desc(), F.col("qid").asc())
    assign = (
        _sims(cents, emb)
        .withColumn("rank", F.row_number().over(asg_w))
        .filter(F.col("rank") == 1)
        .select(F.col("cid").alias("vec_id"), F.col("qid").alias("bucket"))
    )
    withb = emb.join(assign, "vec_id")
    left = withb.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    right = withb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
        F.col("bucket").alias("bucket2"),
    )
    pairs = left.join(
        right, (F.col("bucket") == F.col("bucket2")) & (F.col("qid") != F.col("cid"))
    )
    dots = (
        pairs.select(
            "qid", "cid", "qn", "cn", "bucket",
            F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"),
            "qe", "ce",
        )
        .select(
            "qid", "cid", "qn", "cn", "bucket",
            scaled_long(
                F.element_at("qe", F.col("i")).cast("double")
                * F.element_at("ce", F.col("i")).cast("double"),
                _S,
            ).alias("p"),
        )
        .groupBy("qid", "cid", "qn", "cn", "bucket")
        .agg(F.sum("p").alias("dot"))
        .select(
            "qid", "cid", "bucket",
            F.round(
                (F.col("dot").cast("double") / _S) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    nn_w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        dots.withColumn("rank", F.row_number().over(nn_w))
        .filter(F.col("rank") == 1)
        .select(
            F.col("qid").alias("vec_id"), "bucket",
            F.col("cid").alias("nn_id"), "sim",
        )
    )


NN_BUCKET_SQL = f"""
WITH {_NORMS_CTE}, {_sims_sql(f"< {N_CENTROIDS}")},
assign AS (
  SELECT cid AS vec_id, qid AS bucket FROM (
    SELECT qid, cid, sim,
           row_number() OVER (PARTITION BY cid ORDER BY sim DESC, qid) AS rank
    FROM sims
  ) WHERE rank = 1
),
withb AS (SELECT e.vec_id, e.embedding, e.nrm, a.bucket
          FROM emb e JOIN assign a USING (vec_id)),
bpairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, q.bucket,
         q.embedding AS qe, c.embedding AS ce, q.nrm AS qn, c.nrm AS cn
  FROM withb q JOIN withb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
bexpl AS (
  SELECT qid, cid, bucket, qn, cn, qe, ce, unnest(generate_series(1, {DIM})) AS i
  FROM bpairs
),
bdots AS (
  SELECT qid, cid, bucket, qn, cn,
         sum(CAST(floor(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) * {_S_SQL}) AS BIGINT)) AS dot
  FROM bexpl GROUP BY qid, cid, bucket, qn, cn
),
bsims AS (
  SELECT qid, cid, bucket, round((CAST(dot AS DOUBLE) / {_S_SQL}) / (qn * cn), 6) AS sim
  FROM bdots
)
SELECT qid AS vec_id, bucket, cid AS nn_id, sim FROM (
  SELECT qid, cid, bucket, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
  FROM bsims
) WHERE rank = 1
"""

def _hyperplane_signs(n_planes: int, dim: int = DIM, seed: int = 20240816):
    """Deterministic ±1 hyperplane coefficients (seeded stdlib PRNG —
    the k-means-free analogue of fitting random projections; at corpus
    scale these are job config, broadcast like templates)."""
    import random

    out = []
    for j in range(n_planes):
        rng = random.Random(seed + j)
        out.append([1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)])
    return out


N_PLANES = 4
DEDUP_TAU = 0.35
_SIGNS = _hyperplane_signs(N_PLANES)


def embedding_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via hyperplane LSH (SimHash over the
    vector space): bucket = sign bits of 4 random-hyperplane dots, pair
    join WITHIN a bucket only, cosine >= tau verify.  The signed dot is
    summed as scaled longs, so the sign test is an exact integer
    comparison — bucket assignment is bit-identical across engines.

    Scale: the pair join is bounded by bucket size (vs n^2); more planes
    -> smaller buckets; multiple plane-sets OR'd raise recall (classic
    banding), all expressible as unions of this same query."""
    emb = _emb_with_norms(spark, sf_dir)
    expl = emb.select(
        "vec_id",
        "embedding",
        "nrm",
        F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"),
    )
    plane_sums = [
        F.sum(
            scaled_long(
                F.element_at("embedding", F.col("i")).cast("double")
                * F.element_at(
                    F.array(*[F.lit(v) for v in _SIGNS[j]]), F.col("i")
                ),
                _S,
            )
        ).alias(f"d{j}")
        for j in range(N_PLANES)
    ]
    withd = expl.groupBy("vec_id", "nrm").agg(*plane_sums)
    bucket = None
    for j in range(N_PLANES):
        bit = F.when(F.col(f"d{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    buckets = withd.select("vec_id", "nrm", bucket.alias("bucket"))
    withb = load(spark, sf_dir, "embeddings").join(buckets, "vec_id")
    left = withb.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    right = withb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
        F.col("bucket").alias("bucket2"),
    )
    pairs = left.join(
        right, (F.col("bucket") == F.col("bucket2")) & (F.col("qid") < F.col("cid"))
    )
    dots = (
        pairs.select(
            "qid", "cid", "qn", "cn",
            F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"),
            "qe", "ce",
        )
        .select(
            "qid", "cid", "qn", "cn",
            scaled_long(
                F.element_at("qe", F.col("i")).cast("double")
                * F.element_at("ce", F.col("i")).cast("double"),
                _S,
            ).alias("p"),
        )
        .groupBy("qid", "cid", "qn", "cn")
        .agg(F.sum("p").alias("dot"))
        .select(
            "qid", "cid",
            F.round(
                (F.col("dot").cast("double") / _S) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    return dots.filter(F.col("sim") >= DEDUP_TAU).select(
        F.col("qid").alias("vec_a"), F.col("cid").alias("vec_b"), "sim"
    )


def _signs_sql_list(j: int) -> str:
    return "[" + ", ".join(str(v) for v in _SIGNS[j]) + "]"


_PLANE_SUMS_SQL = ",\n         ".join(
    f"sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * sgn{j}[i] * {_S_SQL}) AS BIGINT)) AS d{j}"
    for j in range(N_PLANES)
)
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN d{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(N_PLANES)
)

EMB_DEDUP_SQL = f"""
WITH {_NORMS_CTE},
sgn AS (SELECT {", ".join(f"{_signs_sql_list(j)}::DOUBLE[] AS sgn{j}" for j in range(N_PLANES))}),
hexpl AS (
  SELECT vec_id, embedding, nrm, unnest(generate_series(1, {DIM})) AS i
  FROM emb
),
hdots AS (
  SELECT vec_id, nrm,
         {_PLANE_SUMS_SQL}
  FROM hexpl, sgn GROUP BY vec_id, nrm
),
buckets AS (
  SELECT vec_id, nrm, {_BUCKET_SQL} AS bucket FROM hdots
),
withb AS (
  SELECT e.vec_id, e.embedding, b.nrm, b.bucket
  FROM embeddings e JOIN buckets b USING (vec_id)
),
dpairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         q.embedding AS qe, c.embedding AS ce, q.nrm AS qn, c.nrm AS cn
  FROM withb q JOIN withb c ON q.bucket = c.bucket AND q.vec_id < c.vec_id
),
dexpl AS (
  SELECT qid, cid, qn, cn, qe, ce, unnest(generate_series(1, {DIM})) AS i
  FROM dpairs
),
ddots AS (
  SELECT qid, cid, qn, cn,
         sum(CAST(floor(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) * {_S_SQL}) AS BIGINT)) AS dot
  FROM dexpl GROUP BY qid, cid, qn, cn
)
SELECT qid AS vec_a, cid AS vec_b,
       round((CAST(dot AS DOUBLE) / {_S_SQL}) / (qn * cn), 6) AS sim
FROM ddots
WHERE round((CAST(dot AS DOUBLE) / {_S_SQL}) / (qn * cn), 6) >= {DEDUP_TAU}
"""


N_KMEANS_ROUNDS = 2  # init-assign -> update -> re-assign


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with real Lloyd refinement: seed centroids (vec_id <
    N_CENTROIDS), then iterate [assign -> recompute centroid means].

    Exactness discipline: every float reduction (dots, norms, centroid
    means) is a scaled-long integer sum, and divisions are written in
    one fixed order — so after any number of rounds the assignment is
    bit-identical between Spark and DuckDB (the oracle runs the same
    unrolled iteration).  Work per round: one (vector x centroid x dim)
    join + two aggs, all JVM-side.
    """
    emb = load(spark, sf_dir, "embeddings")
    expl = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"),
        F.element_at("embedding", F.col("i")).cast("double").alias("val"),
    )
    vnorm = expl.groupBy("vec_id").agg(
        F.sqrt(
            F.sum(scaled_long(F.col("val") * F.col("val"), _S)).cast("double") / _S
        ).alias("vn")
    )
    cents = expl.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), "i", F.col("val").alias("cval")
    )

    assign = None
    for _round in range(N_KMEANS_ROUNDS):
        cnorm = cents.groupBy("cid").agg(
            F.sqrt(
                F.sum(scaled_long(F.col("cval") * F.col("cval"), _S)).cast("double")
                / _S
            ).alias("cn")
        )
        dots = (
            expl.join(cents, "i")
            .groupBy("vec_id", "cid")
            .agg(F.sum(scaled_long(F.col("val") * F.col("cval"), _S)).alias("dot"))
        )
        sims = (
            dots.join(vnorm, "vec_id")
            .join(cnorm, "cid")
            .select(
                "vec_id",
                "cid",
                (
                    (F.col("dot").cast("double") / _S) / (F.col("vn") * F.col("cn"))
                ).alias("sim"),
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("sim").desc(), F.col("cid").asc()
        )
        assign = (
            sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "sim")
        )
        if _round < N_KMEANS_ROUNDS - 1:
            # mean accumulator uses the SMALL scale (1e6): unlike every
            # other scaled sum here (bounded by DIM=64 terms), this one
            # adds a term PER ASSIGNED VECTOR — at 1e12 a BIGINT would
            # silently wrap at ~9.2e6 members/centroid in Spark while
            # DuckDB promotes to HUGEINT, breaking engine parity at the
            # 100 TB design point.  1e6 defers overflow to ~9.2e12.
            cents = (
                expl.join(assign.select("vec_id", "cid"), "vec_id")
                .groupBy("cid", "i")
                .agg(
                    (
                        F.sum(scaled_long(F.col("val"), _SM)).cast("double")
                        / F.count(F.lit(1))
                        / _SM
                    ).alias("cval")
                )
            )
    return assign.select(
        "vec_id", F.col("cid").alias("bucket"), F.round("sim", 6).alias("sim")
    )


def _kmeans_sql() -> str:
    rounds = []
    prev_cents = f"""
cents0 AS MATERIALIZED (
  SELECT vec_id AS cid, i, val AS cval FROM expl2 WHERE vec_id < {N_CENTROIDS}
)"""
    ctes = [
        f"""
expl AS (
  SELECT vec_id, unnest(generate_series(1, {DIM})) AS i, embedding AS e
  FROM embeddings
),
expl2 AS MATERIALIZED (SELECT vec_id, i, CAST(e[i] AS DOUBLE) AS val FROM expl),
vnorm AS MATERIALIZED (
  SELECT vec_id,
         sqrt(CAST(sum(CAST(floor(val * val * {_S_SQL}) AS BIGINT)) AS DOUBLE) / {_S_SQL}) AS vn
  FROM expl2 GROUP BY vec_id
),{prev_cents}"""
    ]
    for r in range(N_KMEANS_ROUNDS):
        ctes.append(f"""
cnorm{r} AS MATERIALIZED (
  SELECT cid,
         sqrt(CAST(sum(CAST(floor(cval * cval * {_S_SQL}) AS BIGINT)) AS DOUBLE) / {_S_SQL}) AS cn
  FROM cents{r} GROUP BY cid
),
dots{r} AS MATERIALIZED (
  SELECT e.vec_id, c.cid,
         sum(CAST(floor(e.val * c.cval * {_S_SQL}) AS BIGINT)) AS dot
  FROM expl2 e JOIN cents{r} c USING (i)
  GROUP BY e.vec_id, c.cid
),
assign{r} AS MATERIALIZED (
  SELECT vec_id, cid, sim FROM (
    SELECT d.vec_id, d.cid,
           (CAST(d.dot AS DOUBLE) / {_S_SQL}) / (v.vn * c.cn) AS sim,
           row_number() OVER (PARTITION BY d.vec_id
                              ORDER BY (CAST(d.dot AS DOUBLE) / {_S_SQL}) / (v.vn * c.cn) DESC,
                                       d.cid) AS rn
    FROM dots{r} d JOIN vnorm v USING (vec_id) JOIN cnorm{r} c USING (cid)
  ) WHERE rn = 1
)""")
        if r < N_KMEANS_ROUNDS - 1:
            ctes.append(f"""
cents{r + 1} AS MATERIALIZED (
  SELECT a.cid, e.i,
         CAST(sum(CAST(floor(e.val * {_SM_SQL}) AS BIGINT)) AS DOUBLE) / count(*) / {_SM_SQL} AS cval
  FROM expl2 e JOIN assign{r} a USING (vec_id)
  GROUP BY a.cid, e.i
)""")
        rounds.append(r)
    last = rounds[-1]
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT vec_id, cid AS bucket, round(sim, 6) AS sim FROM assign{last}
"""
    )


KMEANS_SQL = _kmeans_sql()


ORACLES = {
    "ann_cosine_topk": TOPK_SQL,
    "ann_ivf_bucketed": IVF_SQL,
    "ann_nn_within_bucket": NN_BUCKET_SQL,
    "embedding_cosine_dedup": EMB_DEDUP_SQL,
    "ann_ivf_kmeans": KMEANS_SQL,
}

QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_bucketed": ann_ivf_bucketed,
    "ann_nn_within_bucket": ann_nn_within_bucket,
    "embedding_cosine_dedup": embedding_cosine_dedup,
    "ann_ivf_kmeans": ann_ivf_kmeans,
}
