"""Sessionization / block-grouping / range-join re-expressions.

These are the relational forms of the reference's order-dependent layout
operators (SURVEY.md §2.5), demonstrated over the ``events`` stream
table:

- L1/L3 (line clustering / gap merge)   -> gap-based sessionization
- L16 (row-group state machine)         -> running-count block ids
- L10 (right-neighbour geometric search)-> bounded range self-join + top-1

All orderings carry a total tie-break (ts, event_id); time arithmetic is
on floor-epoch-seconds so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from doc_ocr_spark.operators import load, scaled_long

_S = 1000000.0
_S_SQL = "1000000.0"
SESSION_GAP_S = 300


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (L1's y-gap clustering over time):
    a new session opens when the gap to the previous event of the same
    user exceeds SESSION_GAP_S.  session id = running count of session
    openers — the standard lag -> flag -> cumulative-sum idiom."""
    e = load(spark, sf_dir, "events").withColumn(
        "ts_s", F.unix_timestamp("ts")
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_s") - F.lag("ts_s").over(order) > SESSION_GAP_S, 1
        ).otherwise(F.lit(0)),
    ).withColumn(
        "new_session",
        F.when(F.lag("ts_s").over(order).isNull(), 1).otherwise(
            F.col("new_session")
        ),
    )
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sid = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_s").alias("start_s"),
        F.max("ts_s").alias("end_s"),
        F.round(
            F.sum(scaled_long(F.col("value"), _S)).cast("double") / _S, 4
        ).alias("sum_value"),
    )


SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, ts, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
), flagged AS (
  SELECT *,
    CASE WHEN lag(ts_s) OVER w IS NULL THEN 1
         WHEN ts_s - lag(ts_s) OVER w > {SESSION_GAP_S} THEN 1
         ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  -- CAST: DuckDB sum(INTEGER) is HUGEINT, which pandas lifts to float64
  -- and the driver's value-hash then mismatches Spark's bigint.
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts_s) AS start_s, max(ts_s) AS end_s,
       round(CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0, 4) AS sum_value
FROM sid GROUP BY user_id, session_id
"""


def running_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L16 block grouping: a block opens at each anchor event
    ('signup'); block id = running count of anchors (the
    `sum(cast(is_anchor as int)) over (order by y)` idiom from
    SURVEY.md §2.5 L16).  Block 0 = rows before the first anchor."""
    e = load(spark, sf_dir, "events")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_block = e.withColumn(
        "block_id",
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).over(run),
    )
    return with_block.groupBy("user_id", "block_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
        F.round(
            F.sum(scaled_long(F.col("value"), _S)).cast("double") / _S, 4
        ).alias("sum_value"),
    )


BLOCKS_SQL = """
WITH b AS (
  SELECT user_id, event_id, event_type, value,
    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS block_id
  FROM events
)
SELECT user_id, block_id, count(*) AS n_events,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
  round(CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0, 4) AS sum_value
FROM b GROUP BY user_id, block_id
"""


def next_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 right-neighbour search as a bounded range self-join: for each
    click, the nearest following purchase by the same user within 600 s
    (band predicate + min-by, exactly the reference's x-gap band +
    leftmost-candidate rule, invoice_rule_extractor.py:574-599)."""
    e = load(spark, sf_dir, "events").withColumn("ts_s", F.unix_timestamp("ts"))
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("click_id"),
        F.col("ts_s").alias("click_s"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_s").alias("buy_s"),
    )
    joined = clicks.join(
        buys,
        (F.col("u") == F.col("u2"))
        & (F.col("buy_s") - F.col("click_s") >= 1)
        & (F.col("buy_s") - F.col("click_s") <= 600),
    )
    w = Window.partitionBy("click_id").orderBy("buy_s", "purchase_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "click_id",
            "purchase_id",
            (F.col("buy_s") - F.col("click_s")).alias("gap_s"),
        )
    )


RANGE_JOIN_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
), j AS (
  SELECT c.event_id AS click_id, p.event_id AS purchase_id,
         p.ts_s - c.ts_s AS gap_s,
         row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts_s, p.event_id) AS rn
  FROM e c JOIN e p
    ON c.user_id = p.user_id
   AND c.event_type = 'click' AND p.event_type = 'purchase'
   AND p.ts_s - c.ts_s BETWEEN 1 AND 600
)
SELECT click_id, purchase_id, gap_s FROM j WHERE rn = 1
"""

def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join in its scalable union-sort form: attribute every
    purchase to the same user's latest click at-or-before it.

    Instead of a (purchase x click) range join — whose candidate count
    explodes with per-user activity — both streams are UNIONed and the
    attribution is a running `last(click_id, ignorenulls)` over one
    (user_id)-partitioned sort: exactly ONE shuffle, no pair blowup,
    state O(1) per user.  Clicks sort before purchases at equal ts
    (inclusive as-of bound); two clicks of one user at the same
    microsecond resolve to the HIGHER event_id (the running last() in
    (ts, event_id) order).  Oracle: DuckDB's native ASOF JOIN over a
    clicks stream pre-deduped to max(event_id) per (user, ts), which
    pins the same tie rule — native ASOF alone leaves ties
    unspecified.  Timestamps are compared and returned at microsecond
    precision.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.col("event_type") == "purchase").cast("int").alias("is_p"),
            F.when(
                F.col("event_type") == "click", F.col("event_id")
            ).alias("c_id"),
            F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("click_id", F.last("c_id", ignorenulls=True).over(w))
        .withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter((F.col("is_p") == 1) & F.col("click_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "click_id",
            F.unix_micros(F.col("click_ts").cast("timestamp")).alias("click_ts_us"),
        )
    )


ASOF_SQL = """
WITH clicks AS (
  -- dedupe to max(event_id) per (user, ts): ASOF JOIN has no tie-break,
  -- and the Spark union-sort resolves equal-ts clicks to the higher id
  SELECT max(event_id) AS event_id, user_id, ts
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purch AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
FROM purch p ASOF JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

ORACLES = {
    "sessionize_events": SESSIONIZE_SQL,
    "running_blocks": BLOCKS_SQL,
    "next_purchase_after_click": RANGE_JOIN_SQL,
    "asof_click_attribution": ASOF_SQL,
}

QUERIES = {
    "sessionize_events": sessionize_events,
    "running_blocks": running_blocks,
    "next_purchase_after_click": next_purchase_after_click,
    "asof_click_attribution": asof_click_attribution,
}
