"""Controlled A/B for `streaming_asof_agg` wall-time drift (VERDICT r04
item 4): r04 recorded 1.7 -> 1.9-2.9 s across measurement windows,
attributed to python-worker drift.  This pins it down with the two
candidate code levers, interleaved ROUND-ROBIN within one session so VM
window drift hits every arm equally:

- state-partition count (`spark.sql.shuffle.partitions` at stream
  start — also the python-worker parallelism for
  `applyInPandasWithState`): session default (SPARK_GRAFT_CPUS) vs 8
  vs 2.
- arrow transfer batch (`spark.sql.execution.arrow.maxRecordsPerBatch`):
  10k default vs 2k vs 100k.

Both confs are read per query start, so arms can share the session.
Usage: python bench_asof_ab.py [sf_dir] [rounds]  ->  one JSON line,
also written to BENCH/asof_ab_r05.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from doc_ocr_spark.operators import streaming_ops
    from doc_ocr_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "doc_ocr_spark-asof-ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    arms = {
        "default": {},
        "state8": {"spark.sql.shuffle.partitions": "8"},
        "state2": {"spark.sql.shuffle.partitions": "2"},
        "arrow2k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"},
        "arrow100k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "100000"},
    }
    base = {
        "spark.sql.shuffle.partitions": str(cpus),
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    }

    times: dict[str, list[float]] = {a: [] for a in arms}
    # warm-up run (session/codegen/stream-machinery first-run costs)
    streaming_ops.streaming_asof_agg(spark, sf_dir).count()
    for _ in range(rounds):
        for arm, overrides in arms.items():
            for k, v in {**base, **overrides}.items():
                spark.conf.set(k, v)
            t0 = time.monotonic()
            n = streaming_ops.streaming_asof_agg(spark, sf_dir).count()
            times[arm].append(round(time.monotonic() - t0, 3))
    for k, v in base.items():
        spark.conf.set(k, v)
    spark.stop()

    out = {
        "metric": "streaming_asof_agg wall sec by arm (interleaved)",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "rows": n,
        "arms": {
            a: {
                "times": ts,
                "min": min(ts),
                "median": round(statistics.median(ts), 3),
            }
            for a, ts in times.items()
        },
    }
    try:
        with open(os.path.join(REPO, "BENCH", "asof_ab_r05.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
