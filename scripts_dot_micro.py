"""Microbench: exact scaled-long dot variants over a synthetic pair set.
Builds ~2e7 (qe, ce) pairs from the sf1.0 embeddings (bucketed mod join)
and times sum(dot) per variant with a noop write."""
import os, sys, time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from doc_ocr_spark.session import get_spark
from doc_ocr_spark.operators.similarity import DIM, _S

spark = get_spark("dot-micro", master="local[32]", shuffle_partitions=32)
emb = spark.read.parquet("/root/testdata/sf1.0/embeddings.parquet")
# 20k vectors -> mod 40 buckets -> 40 * 500^2 = 1e7 pairs
a = emb.select((F.col("vec_id") % 40).alias("k"), F.col("embedding").alias("qe"), F.col("vec_id").alias("qid"))
b = emb.select((F.col("vec_id") % 40).alias("k"), F.col("embedding").alias("ce"), F.col("vec_id").alias("cid"))
pairs = a.repartition(32).join(b, "k").select("qid", "cid", "qe", "ce")
n = pairs.count()
print("pairs:", n, flush=True)

def term(i):
    return F.floor(
        F.element_at("qe", i).cast("double") * F.element_at("ce", i).cast("double") * F.lit(_S)
    ).cast("long")

def groups(g):
    out = []
    for g0 in range(1, DIM + 1, g):
        acc = term(g0)
        for i in range(g0 + 1, min(g0 + g, DIM + 1)):
            acc = acc + term(i)
        out.append(acc)
    return out

def v_inrow(g):
    gs = groups(g)
    acc = gs[0]
    for t in gs[1:]:
        acc = acc + t
    return pairs.select("qid", "cid", acc.alias("dot"))

def v_explode(g):
    return (
        pairs.select("qid", "cid", F.explode(F.array(*groups(g))).alias("p"))
        .groupBy("qid", "cid").agg(F.sum("p").alias("dot"))
    )

def v_zipwith():
    zw = F.aggregate(
        F.zip_with("qe", "ce", lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(_S)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return pairs.select("qid", "cid", zw.alias("dot"))

def v_explode_seq():  # round-2 original: explode(sequence), runtime index
    return (
        pairs.select(
            "qid", "cid",
            F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i"), "qe", "ce",
        )
        .select(
            "qid", "cid",
            F.floor(
                F.element_at("qe", F.col("i")).cast("double")
                * F.element_at("ce", F.col("i")).cast("double") * F.lit(_S)
            ).cast("long").alias("p"),
        )
        .groupBy("qid", "cid").agg(F.sum("p").alias("dot"))
    )

variants = {
    "explode_seq64": v_explode_seq,
    "zipwith": v_zipwith,
    "inrow64": lambda: v_inrow(64),
    "inrow_g8": lambda: v_inrow(8),
    "explode_g16": lambda: v_explode(16),
    "explode_g8": lambda: v_explode(8),
}

def v_nodot():
    return pairs.select("qid", "cid", F.element_at("qe", 1).cast("long").alias("dot"))

variants["nodot"] = v_nodot
variants["inrow64"] = lambda: v_inrow(64)

order = sys.argv[1:] or list(variants)
for name in order:
    df = variants[name]().groupBy().agg(F.sum("dot"))
    for r in range(2):
        spark.sparkContext.setJobDescription(f"{name} r{r}")
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name} run{r}: {time.monotonic()-t0:.2f}s", flush=True)
spark.stop()
