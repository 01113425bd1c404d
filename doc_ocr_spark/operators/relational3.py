"""Third relational coverage batch (SURVEY.md §2.7 checklist gaps):
bounded window frames (the L20 neighbour-search frame made explicit),
exact percentiles, pivot, count-distinct, semi join, event-time tumbling
windows (the batch twin of streaming/windows.py), and CUBE grouping
sets.  Same parity discipline as relational.py — scaled-long sums,
6-dp ratio rounding, total tie-breaks, epoch-second timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from doc_ocr_spark.operators import (
    load,
    respread,
    scaled_long,
    scaled_sum,
    scaled_sum_sql,
)

_S = 1000000.0
_S_SQL = "1000000.0"


def moving_avg_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded window frame (ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING):
    the explicit form of the reference's sum-neighbour search L20
    (invoice_rule_extractor.py:790-842 scans max_lines_up/down around
    the sum row — a bounded rows frame with a stop predicate)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, 2)
    )
    avg5 = F.round(
        F.sum(scaled_long(F.col("o_totalprice"), _S)).over(w).cast("double")
        / _S
        / F.count(F.lit(1)).over(w),
        4,
    )
    return o.select("o_custkey", "o_orderkey", avg5.alias("avg5"))


MOVING_AVG_SQL = f"""
SELECT o_custkey, o_orderkey,
  round(CAST(sum(CAST(floor(o_totalprice * {_S_SQL}) AS BIGINT)) OVER w AS DOUBLE)
        / {_S_SQL} / count(*) OVER w, 4) AS avg5
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
"""


def order_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (sort-based agg).
    Round 6: the partial percentile aggregation buffers every value and
    ran at the scan's 2 splits at sf1.0 (1.4 s straggler task measured)
    — the conditional respread spreads the buffer build across cores."""
    o = respread(load(spark, sf_dir, "orders"))
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 2).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


QUANTILES_SQL = """
SELECT o_orderpriority,
  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
  round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
  count(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (L15's token->column assignment is exactly this: rows
    bucketed into named columns, invoice_rule_extractor.py:700-708)."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


PIVOT_SQL = """
SELECT o_orderpriority,
  count(*) FILTER (o_orderstatus = 'F') AS n_f,
  count(*) FILTER (o_orderstatus = 'O') AS n_o,
  count(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


def orders_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the inverse of the pivot above, run over its
    result: wide status columns back to (priority, status, n) rows via
    Spark's native unpivot (map-side expand, no shuffle added)."""
    piv = orders_status_pivot(spark, sf_dir)
    return piv.unpivot(
        ["o_orderpriority"], ["n_f", "n_o", "n_p"], "status_col", "n"
    ).select(
        "o_orderpriority",
        F.upper(F.substring("status_col", 3, 1)).alias("o_orderstatus"),
        "n",
    )


UNPIVOT_SQL = f"""
SELECT o_orderpriority,
       upper(substr(status_col, 3, 1)) AS o_orderstatus,
       CAST(n AS BIGINT) AS n
FROM ({PIVOT_SQL}) UNPIVOT INCLUDE NULLS (n FOR status_col IN (n_f, n_o, n_p))
"""


def distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (expand + two-phase hash agg; the
    exact companion of approx_count_distinct, which at 100 TB replaces
    this for dashboard-grade answers)."""
    li = respread(load(spark, sf_dir, "lineitem"), min_bytes=24 << 20)
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") >= 5)
    )


DISTINCT_SQL = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_items
FROM lineitem GROUP BY l_suppkey HAVING count(*) >= 5
"""


def active_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one open order.
    Complement of relational2.customers_without_orders (anti)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


SEMI_SQL = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation (F.window — identical
    semantics to the streaming version in streaming/windows.py; this is
    the batch twin the stream is tested against)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            scaled_sum(F.col("value"), _S, 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


HOURLY_SQL = f"""
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS win_start,
       event_type, count(*) AS n,
       {scaled_sum_sql("value", _S_SQL, 4)} AS sum_value
FROM events GROUP BY 1, 2
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id — all 4 grouping
    sets in one pass (partial-agg friendly)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            scaled_sum(F.col("o_totalprice"), _S, 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "total", "n")
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS gid,
       {scaled_sum_sql("o_totalprice", _S_SQL, 2)} AS total,
       count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


ORACLES = {
    "order_quantiles_by_priority": QUANTILES_SQL,
    "orders_status_pivot": PIVOT_SQL,
    "distinct_parts_per_supplier": DISTINCT_SQL,
}

QUERIES = {
    "order_quantiles_by_priority": order_quantiles_by_priority,
    "orders_status_pivot": orders_status_pivot,
    "distinct_parts_per_supplier": distinct_parts_per_supplier,
}

# Family-redundant demos retired from the driver registry (the harness
# grades exactly 50 queries — VERDICT r03 item 1): unpivot is the pivot
# twin, semi-join ~ high_value_customers_in_subquery, and the batch
# hourly window shares its EXACT oracle SQL with the streaming_hourly_agg
# gate (streaming_ops.py) which also exercises F.window semantics.
# Round 5 retires two more twins to free slots for dup_span_flags and
# tfidf_top_terms: revenue_cube (CUBE is grouping-sets-of-all-subsets;
# revenue_grouping_sets keeps the GROUPING SETS + grouping() surface
# registered) and moving_avg_order_price (bounded-frame window; the
# frame family stays registered via running_total_per_customer's
# unbounded frame and running_blocks' frame state machine).
# Still oracle-gated by tests/test_entry_parity.py and selfcheck.py.
RETIRED_ORACLES = {
    "orders_status_unpivot": UNPIVOT_SQL,
    "active_customers_semi": SEMI_SQL,
    "events_hourly_windows": HOURLY_SQL,
    "moving_avg_order_price": MOVING_AVG_SQL,
    "revenue_cube": CUBE_SQL,
}

RETIRED_QUERIES = {
    "orders_status_unpivot": orders_status_unpivot,
    "active_customers_semi": active_customers_semi,
    "events_hourly_windows": events_hourly_windows,
    "moving_avg_order_price": moving_avg_order_price,
    "revenue_cube": revenue_cube,
}
