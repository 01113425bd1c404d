"""Standalone replica of the driver's correctness gate over ALL
registered queries — run it at any SF dir and it writes one JSON
object per query: rows/schema/value-hash match vs the DuckDB oracle.

Exists because the round-2 driver artifact graded exactly the first 50
of 54 registered queries (CORRECTNESS_r02.json) — this produces the
full-coverage evidence regardless of any harness cap.  The canon is
the same as tests/test_entry_parity.py (which imports nothing from
here; this script imports the test module's helpers so the two can
never drift).

Usage: python selfcheck.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else ""

    import duckdb

    os.environ.setdefault("PARITY_SF_DIR", sf_dir)
    import __spark_entry__ as entrymod
    from test_entry_parity import TABLES, _canon_pdf

    from doc_ocr_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        "doc_ocr_spark-selfcheck",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = {**entrymod.oracle_sql(), **entrymod.retired_oracle_sql()}
    registered = entrymod.queries()
    all_queries = {**registered, **entrymod.retired_queries()}
    results: dict[str, dict] = {}
    t_start = time.monotonic()
    for name, q in all_queries.items():
        row: dict = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "registered": name in registered,
        }
        try:
            spdf = q(spark, sf_dir).toPandas()
            row["spark_rows"] = len(spdf)
            sql = oracles.get(name)
            if sql is None:
                row["err"] = "no_oracle"
            else:
                dpdf = con.sql(sql).df()
                row["oracle_rows"] = len(dpdf)
                row["rows_match"] = len(spdf) == len(dpdf)
                row["schema_match"] = sorted(spdf.columns) == sorted(dpdf.columns)
                row["hash_match"] = _canon_pdf(spdf) == _canon_pdf(dpdf)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = row
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_green": sum(
            1
            for r in results.values()
            if r["rows_match"] and r["schema_match"] and r["hash_match"]
        ),
        "wall_s": round(time.monotonic() - t_start, 1),
        "results": results,
    }
    out = json.dumps(summary, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(out)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
