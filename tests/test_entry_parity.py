"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() in DuckDB at sf0.001 and compare
row count, column names, and an order-insensitive value hash."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.9g}"
    if v is None:
        return "null"
    return f"{type(v).__name__[0]}:{v}"


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon_value(r[i]) for i in idx) for r in rows
    )


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        # rows-only contract: runs, returns rows, stable schema
        assert len(scols) > 0
        assert len(srows) >= 0
        return
    res = ddb.sql(oracle)
    dcols = [c for c in res.columns]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc = _canon_rows(scols, srows)
    dc = _canon_rows(dcols, drows)
    mismatches = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sc[mismatches[0]]!r} duckdb={dc[mismatches[0]]!r}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"url", "extracted_text", "complete"}
