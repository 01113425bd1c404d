"""Per-query Spark-vs-DuckDB ratio evidence (BENCH/BASELINE.md §4).

The reference publishes no benchmark numbers, so 'matches-or-beats the
reference-equivalent single-node throughput' is evidenced by timing the
SAME query in Spark (steady-state, noop sink) and its oracle SQL in
DuckDB (same parquet inputs, single process) at one SF.  Spark's fixed
local-mode overhead (~0.2-0.5 s scheduler/codegen per query) dominates
small SFs, so the interesting column is the delta over that constant.

Usage: python bench_duckdb_ratio.py [sf_dir]  ->  one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skip = set(os.environ.get("RATIO_SKIP", "").split(",")) - {""}

    import duckdb

    import __spark_entry__ as entry
    from doc_ocr_spark.session import get_spark

    oracles = entry.oracle_sql()
    queries = entry.queries()
    names = sorted(n for n in queries if n in oracles and n not in skip)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    budget = float(os.environ.get("RATIO_BUDGET_S", "120"))

    def _timed_duck(sql: str) -> float | None:
        """One timed run, interrupted past the budget (None = timeout)."""
        import threading

        fired = threading.Event()

        def _interrupt():
            fired.set()
            con.interrupt()

        timer = threading.Timer(budget, _interrupt)
        timer.start()
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            elapsed = time.monotonic() - t0
        except duckdb.InterruptException:
            return None
        finally:
            timer.cancel()
        if fired.is_set():
            # the timer fired AFTER the query finished: swallow the
            # pending interrupt so it cannot abort the NEXT query
            try:
                con.sql("SELECT 1").fetchall()
            except duckdb.InterruptException:
                pass
            return None  # finished only by grace of the race: treat as over budget
        return elapsed

    duck: dict[str, float | None] = {}
    for n in names:
        first = _timed_duck(oracles[n])  # warm (IO cache, catalog)
        if first is None:
            duck[n] = None
            print(f"duckdb timeout (> {budget}s): {n}", file=sys.stderr)
            continue
        second = _timed_duck(oracles[n])
        duck[n] = round(min(first, second if second is not None else first), 4)
        print(f"duckdb {n}: {duck[n]}", file=sys.stderr)

    spark = get_spark("duckdb-ratio")
    sparkt: dict[str, float] = {}
    for n in names:
        queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        sparkt[n] = round(best, 4)
        print(f"spark {n}: {sparkt[n]}", file=sys.stderr)
    spark.stop()

    rows = {
        n: {
            "spark_s": sparkt[n],
            "duckdb_s": duck[n],
            "ratio": (
                round(sparkt[n] / max(duck[n], 1e-4), 2)
                if duck[n] is not None
                else None
            ),
        }
        for n in names
    }
    print(json.dumps({"sf_dir": sf_dir, "queries": rows}))


if __name__ == "__main__":
    main()
