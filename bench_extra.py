"""Focused per-query isolation bench (guide §1.4): times individual
declared queries with the noop sink and captures .explain("formatted")
for plan evidence.  NOT the driver-timed bench — bench.py stays frozen;
this file exists so optimization work can iterate on one query at a
time and commit plan artifacts under plans/r06/.

Usage:
  python bench_extra.py QUERY [QUERY...] [--sf DIR] [--runs N]
                        [--plan plans/r06/suffix]   # dump explain files
One JSON line per query: {"query":..., "sf":..., "runs":[...], "min":...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dump explain to <plan dir>/<query>_<tag>.txt")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from doc_ocr_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "doc_ocr_spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    qs = {**entrymod.queries(), **entrymod.retired_queries()}
    for name in args.queries:
        fn = qs[name]
        df = fn(spark, args.sf)
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(txt)
        if args.runs == 0:
            print(json.dumps({"query": name, "sf": args.sf, "plan_only": True}), flush=True)
            continue
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            # time fn() + write exactly like bench.py's _force(fn(...)):
            # streaming / staged / iterative queries do real work inside
            # the query function itself
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        print(json.dumps({"query": name, "sf": args.sf, "runs": runs, "min": min(runs)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
