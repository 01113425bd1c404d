"""Targeted oracle-parity check for a subset of queries (iteration aid;
selfcheck.py remains the full gate).  Usage:
  python scripts_parity_subset.py SF_DIR query [query...]"""
import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

sf_dir = sys.argv[1]
names = sys.argv[2:]

import duckdb

os.environ.setdefault("PARITY_SF_DIR", sf_dir)
import __spark_entry__ as entrymod
from test_entry_parity import TABLES, _canon_pdf
from doc_ocr_spark.session import get_spark

spark = get_spark("parity-subset", master="local[16]", shuffle_partitions=16)
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
oracles = {**entrymod.oracle_sql(), **entrymod.retired_oracle_sql()}
qs = {**entrymod.queries(), **entrymod.retired_queries()}
ok = True
for name in names:
    spdf = qs[name](spark, sf_dir).toPandas()
    dpdf = con.sql(oracles[name]).df()
    match = (
        len(spdf) == len(dpdf)
        and sorted(spdf.columns) == sorted(dpdf.columns)
        and _canon_pdf(spdf) == _canon_pdf(dpdf)
    )
    ok &= match
    print(json.dumps({"query": name, "sf": sf_dir, "spark_rows": len(spdf), "oracle_rows": len(dpdf), "match": match}), flush=True)
spark.stop()
sys.exit(0 if ok else 1)
