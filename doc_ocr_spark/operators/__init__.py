"""Relational re-expressions + training-data operators.

Every public function here is ``(spark, sf_dir) -> DataFrame`` and has a
matching DuckDB oracle SQL string (collected by __spark_entry__.py), with
identical column names and explicit rounding/decimal discipline so the
driver's order-insensitive value-hash comparison is exact:

- money/values are summed as DECIMAL(18,x) (exact, order-independent)
  and only converted to rounded DOUBLE at the end
- floating ratios are rounded to 6 dp
- every top-k / argmax has a total deterministic tie-break
- timestamps are returned as epoch seconds (BIGINT)
"""

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
