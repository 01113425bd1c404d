"""Classic relational operators over the TPC-H-ish testdata.

These are the relational demos of the reference's implicit operators
(SURVEY.md §2.7): hash aggregation, broadcast joins, window top-1/argmax
(L7), min-by (L9), running aggregates.  Spark side is pure DataFrame API
(whole-stage codegen, no Python in the hot path).

Money sums use the scaled-long discipline (operators/__init__.py):
exact + order-independent like decimals, but on codegen's primitive
fast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from doc_ocr_spark.operators import load, scaled_long, scaled_sum, scaled_sum_sql

_S = 1000000.0  # 1e-6 fix-point for money/quantity sums
_S_SQL = "1000000.0"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (map-side partial agg + exchange
    on the two group keys; fully codegen)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    qty_scaled = F.sum(scaled_long(F.col("l_quantity"), _S))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(qty_scaled.cast("double") / _S, 2).alias("sum_qty"),
            scaled_sum(F.col("l_extendedprice"), _S, 2).alias("sum_base_price"),
            scaled_sum(disc_price, _S, 2).alias("sum_disc_price"),
            scaled_sum(charge, _S, 2).alias("sum_charge"),
            F.round(
                qty_scaled.cast("double") / _S / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(floor(l_quantity * {_S_SQL}) AS BIGINT)) AS DOUBLE) / {_S_SQL}, 2) AS sum_qty,
  {scaled_sum_sql("l_extendedprice", _S_SQL, 2)} AS sum_base_price,
  {scaled_sum_sql("l_extendedprice * (1 - l_discount)", _S_SQL, 2)} AS sum_disc_price,
  {scaled_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", _S_SQL, 2)} AS sum_charge,
  round(CAST(sum(CAST(floor(l_quantity * {_S_SQL}) AS BIGINT)) AS DOUBLE) / {_S_SQL} / count(*), 6) AS avg_qty,
  count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def top1_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 argmax re-expression: top-1 per group via row_number
    (template_matcher.py:27-118's best-scoring template per doc)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


TOP1_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
      FROM orders) WHERE rn = 1
"""


def min_acctbal_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9 min-by re-expression (topmost-line title fallback,
    invoice_rule_extractor.py:624-627)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


MINBY_SQL = """
SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal
FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) rn
      FROM customer) WHERE rn = 1
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + agg with explicit broadcast of the small dims
    (region/nation/customer are tiny at any SF — never shuffle them)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            scaled_sum(rev, _S, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


REVENUE_SQL = f"""
SELECT r_name, n_name,
  {scaled_sum_sql("l_extendedprice * (1 - l_discount)", _S_SQL, 2)} AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (the L20 bounded-neighbour-search frame
    family, rowsBetween analogue)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(scaled_long(F.col("o_totalprice"), _S)).over(w).cast("double")
            / _S,
            2,
        ).alias("running_total"),
    )


RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey,
  round(CAST(sum(CAST(floor(o_totalprice * {_S_SQL}) AS BIGINT)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / {_S_SQL}, 2) AS running_total
FROM orders
"""

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "min_acctbal_customer_per_nation": MINBY_SQL,
    "revenue_by_nation": REVENUE_SQL,
    "running_total_per_customer": RUNNING_SQL,
}

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "min_acctbal_customer_per_nation": min_acctbal_customer_per_nation,
    "revenue_by_nation": revenue_by_nation,
    "running_total_per_customer": running_total_per_customer,
}

# Retired round 5 to free the slot for dedup_span_removal: the
# row_number-top-1 window shape stays registered three times over
# (domain_quota's WindowGroupLimit cap, ann_cosine_topk's top-k,
# tfidf_top_terms' per-doc top-3) and the argmax family via
# min_acctbal's min_by.  Still oracle-gated by
# tests/test_entry_parity.py and selfcheck.py.
RETIRED_ORACLES = {
    "top1_order_per_customer": TOP1_SQL,
}

RETIRED_QUERIES = {
    "top1_order_per_customer": top1_order_per_customer,
}
