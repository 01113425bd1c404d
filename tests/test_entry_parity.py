"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() in DuckDB at sf0.001 and compare
row count, column names, and an order-insensitive value hash.

The canon deliberately mirrors the driver's pandas-based compare
(``sdf.toPandas()`` vs duckdb ``res.df()``, full-precision values):

- DuckDB HUGEINT materializes as float64 in pandas, so an uncast
  ``sum(INTEGER)`` oracle hashes ``976742.0`` against Spark's bigint
  ``976742`` and MUST fail here, exactly as it fails in the driver
  (round-1 lesson: a fetchall()-based canon silently converted HUGEINT
  to Python int and hid three such bugs).
- Floats are compared at repr() precision, not %.9g.
- Non-scalar cells (list/ndarray/dict) raise — the driver's canon
  dies on them with "unhashable type", so they are a bug, not data.
"""

import math
import os

import duckdb
import numpy as np
import pandas as pd
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
    if isinstance(v, (list, tuple, dict, set, np.ndarray, bytearray)):
        raise TypeError(
            f"non-scalar cell {type(v).__name__} — the driver's pandas "
            "canon cannot hash this; emit scalars (json/md5) instead"
        )
    if v is None or v is pd.NaT:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "b:" + str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "null"  # pandas uses NaN for SQL NULL in float cols
        return f"f:{f!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"y:{v.hex()}"
    return f"{type(v).__name__[0]}:{v}"


def _canon_pdf(pdf: "pd.DataFrame"):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(
        "|".join(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


# Registered AND retired queries stay under the same gate: retirement
# (fitting the driver's 50-slot budget) must never drop a parity check.
def _all_queries():
    return {**entrymod.queries(), **entrymod.retired_queries()}


def _all_oracles():
    return {**entrymod.oracle_sql(), **entrymod.retired_oracle_sql()}


QUERY_NAMES = sorted(_all_queries().keys())


def test_registry_fits_driver_budget():
    """The driver grades exactly 50 queries; every registered entry must
    get a CORRECTNESS row (VERDICT r03 item 1)."""
    qs = entrymod.queries()
    assert len(qs) <= 50, f"registry over the 50-slot budget: {len(qs)}"
    # no name may be both registered and retired
    assert not set(qs) & set(entrymod.retired_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = _all_queries()[name]
    sdf = q(spark, SF_DIR)
    spdf = sdf.toPandas()
    scols = list(spdf.columns)
    oracle = _all_oracles().get(name)
    if oracle is None:
        # rows-only contract: runs, returns rows, stable schema — but the
        # cells must still be driver-canon-safe scalars.
        assert len(scols) > 0
        _canon_pdf(spdf)
        return
    dpdf = ddb.sql(oracle).df()
    dcols = list(dpdf.columns)
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(spdf) == len(dpdf), f"{name}: row count {len(spdf)} vs {len(dpdf)}"
    sc = _canon_pdf(spdf)
    dc = _canon_pdf(dpdf)
    mismatches = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sc[mismatches[0]]!r} duckdb={dc[mismatches[0]]!r}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"url", "extracted_text", "complete"}


def test_every_query_has_an_oracle_and_no_orphans():
    """Driver-contract completeness: every registered query ships an
    oracle (zero rows-only checks), no oracle points at a missing
    query, and the retired sets pair up the same way."""
    q, o = set(entrymod.queries()), set(entrymod.oracle_sql())
    assert q == o, (q - o, o - q)
    rq, ro = set(entrymod.retired_queries()), set(entrymod.retired_oracle_sql())
    assert rq == ro, (rq - ro, ro - rq)
