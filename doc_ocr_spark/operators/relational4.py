"""Fourth relational batch: Spark-native session windows (the built-in
form of the manual lag/cumsum sessionizer), explicit GROUPING SETS, and
an IN-subquery (Catalyst decorrelation).  Parity discipline as always.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_ocr_spark.operators import load, scaled_long, scaled_sum_sql

_S = 1000000.0
_S_SQL = "1000000.0"
GAP = "300 seconds"
GAP_S = 300


def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window — the BUILT-IN gap sessionizer (vs the manual
    lag->flag->cumsum in sessionize.py; both expose L1's y-gap
    clustering over time).

    Boundary semantics (measured on Spark 4.1 against the sf0.1
    fixture): an event at EXACTLY last_ts + gap still MERGES — the
    session end (last + gap) is inclusive for the next event — so the
    SQL split predicate is ``> gap``, same as sessionize_events.

    Timestamps are floored to whole seconds BEFORE windowing so the
    fractional-gap boundary cases (a gap in (300, 301) flooring to
    300) agree exactly with the epoch-seconds oracle — without the
    floor, 2 of 99k sessions diverged at sf0.1.
    """
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts"))
    )
    return (
        e.groupBy("user_id", F.session_window("ts", GAP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(scaled_long(F.col("value"), _S)).cast("double") / _S, 4
            ).alias("sum_value"),
            F.min(F.unix_timestamp("ts")).alias("start_s"),
            F.max(F.unix_timestamp("ts")).alias("end_s"),
        )
        .select("user_id", "start_s", "end_s", "n_events", "sum_value")
    )


SESSION_WINDOW_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
), flagged AS (
  SELECT *,
    CASE WHEN lag(ts_s) OVER w IS NULL THEN 1
         WHEN ts_s - lag(ts_s) OVER w > {GAP_S} THEN 1
         ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
), sid AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, min(ts_s) AS start_s, max(ts_s) AS end_s,
       count(*) AS n_events,
       round(CAST(sum(CAST(floor(value * {_S_SQL}) AS BIGINT)) AS DOUBLE) / {_S_SQL}, 4) AS sum_value
FROM sid GROUP BY user_id, session_id
"""


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) — the general form
    of which rollup/cube are special cases; one pass, two groupings."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS INT) AS gid,
               {scaled_sum_sql("o_totalprice", _S_SQL, 2)} AS total,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS gid,
       {scaled_sum_sql("o_totalprice", _S_SQL, 2)} AS total,
       count(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def high_value_customers_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (Catalyst rewrites to a left-semi join — subquery
    decorrelation, SURVEY.md §4's 'free from Catalyst' row)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    o.createOrReplaceTempView("orders_sq")
    c.createOrReplaceTempView("customer_sq")
    return spark.sql("""
        SELECT c_custkey, c_acctbal
        FROM customer_sq
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders_sq WHERE o_totalprice > 400000
        )
    """)


IN_SUBQUERY_SQL = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers ordering in 1996 INTERSECT/EXCEPT
    those ordering in 1997 — retained vs churned, one labeled union.
    Catalyst compiles INTERSECT/EXCEPT to left-semi / left-anti joins
    over the deduplicated key sets (same machinery the anti-join row
    uses), so both legs broadcast at small SF and shuffle on the key at
    scale."""
    o = load(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = keys(1996), keys(1997)
    retained = y96.intersect(y97).select(
        "o_custkey", F.lit("retained").alias("cohort")
    )
    churned = y96.exceptAll(y97).select(
        "o_custkey", F.lit("churned").alias("cohort")
    )
    return retained.unionAll(churned)


SETOPS_SQL = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
SELECT o_custkey, 'retained' AS cohort FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
UNION ALL
SELECT o_custkey, 'churned' AS cohort FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
"""


ORACLES = {
    "customer_retention_setops": SETOPS_SQL,
    "session_window_events": SESSION_WINDOW_SQL,
    "revenue_grouping_sets": GROUPING_SETS_SQL,
    "high_value_customers_in_subquery": IN_SUBQUERY_SQL,
}

QUERIES = {
    "customer_retention_setops": customer_retention_setops,
    "session_window_events": session_window_events,
    "revenue_grouping_sets": revenue_grouping_sets,
    "high_value_customers_in_subquery": high_value_customers_in_subquery,
}
