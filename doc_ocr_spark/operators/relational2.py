"""Second batch of relational coverage (SURVEY.md §2.7 checklist):
global sort/limit top-k, anti join, rollup/grouping sets, JSON column
functions, set operations.  Same parity discipline as relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_ocr_spark.operators import load, scaled_sum, scaled_sum_sql

_S = 1000000.0
_S_SQL = "1000000.0"


def q3_top_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: join + agg + global ORDER BY/LIMIT top-10
    (deterministic tie-break on the key)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(scaled_sum(rev, _S, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT o_orderkey, o_orderpriority,
  {scaled_sum_sql("l_extendedprice * (1 - l_discount)", _S_SQL, 2)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (the resume protocol's pending-minus-completed shape,
    job.py)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ANTI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) — grouping-sets aggregation; NULL rows are
    the super-aggregates."""
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
        .rollup("r_name", "n_name")
        .agg(scaled_sum(rev, _S, 2).alias("revenue"))
    )


ROLLUP_SQL = f"""
SELECT r_name, n_name,
  {scaled_sum_sql("l_extendedprice * (1 - l_discount)", _S_SQL, 2)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column functions: extract ``$.k`` from the events props
    payload, aggregate per event type (the engine's fields_json column
    gets consumed exactly this way downstream)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


JSON_SQL = """
SELECT event_type,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
  count(*) AS n
FROM events GROUP BY event_type
"""


def multi_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers with 'O'-status orders EXCEPT those with 'F'
    (distinct semantics in both engines)."""
    o = load(spark, sf_dir, "orders")
    with_o = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    with_f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return with_o.exceptAll(with_f).withColumnRenamed("o_custkey", "custkey")


EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def order_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: per customer, the sorted distinct
    set of priorities they ever used + exists/forall predicates
    (the anchor_required/anchor_any all-any semantics of L16 as array
    ops, SURVEY.md §2.7 'set ops')."""
    o = load(spark, sf_dir, "orders")
    pris = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set("o_orderpriority")).alias("priorities")
    )
    return pris.select(
        "o_custkey",
        F.array_join("priorities", ",").alias("priorities_csv"),
        F.exists("priorities", lambda p: p == F.lit("1-URGENT")).alias("any_urgent"),
        F.forall("priorities", lambda p: p != F.lit("5-LOW")).alias("never_low"),
    )


ARRAY_SQL = """
WITH pris AS (
  SELECT o_custkey, list_sort(list_distinct(list(o_orderpriority))) AS priorities
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
  array_to_string(priorities, ',') AS priorities_csv,
  len(list_filter(priorities, p -> p = '1-URGENT')) > 0 AS any_urgent,
  len(list_filter(priorities, p -> p = '5-LOW')) = 0 AS never_low
FROM pris
"""

ORACLES = {
    "q3_top_shipping": Q3_SQL,
    "customers_without_orders": ANTI_SQL,
    "props_json_stats": JSON_SQL,
    "order_priority_profile": ARRAY_SQL,
}

QUERIES = {
    "q3_top_shipping": q3_top_shipping,
    "customers_without_orders": customers_without_orders,
    "props_json_stats": props_json_stats,
    "order_priority_profile": order_priority_profile,
}

# Family-redundant demos retired from the driver registry (the harness
# grades exactly 50 queries — VERDICT r03 item 1): rollup ~ revenue_cube/
# grouping_sets, EXCEPT set-op ~ customer_retention_setops.  Still
# oracle-gated by tests/test_entry_parity.py and selfcheck.py.
RETIRED_ORACLES = {
    "revenue_rollup": ROLLUP_SQL,
    "multi_status_customers": EXCEPT_SQL,
}

RETIRED_QUERIES = {
    "revenue_rollup": revenue_rollup,
    "multi_status_customers": multi_status_customers,
}
