"""Hot-key skew evidence for the pair-join family (VERDICT r03 item 8).

The extraction path has explicit skew machinery (16 MB scan splits,
salted buckets, 32 MB kernel flush); the near-dup pair join's skew story
is the JACCARD_DF_CAP: a boilerplate shingle shared by H documents
contributes O(H^2) candidate pairs to the inverted-index self-join, and
the cap drops such shingles BEFORE the join (broadcast anti-join of the
few hot shingles).  This bench makes that story a measurement instead of
an argument: a deliberately hot-keyed corpus — ``--hot`` docs share one
boilerplate prefix, everything else unique — is run through the same
``_shingles -> _df_capped -> _jaccard_pairs`` operators CAPPED vs
UNCAPPED, recording wall time, the hot shingles' document frequency, and
the candidate-pair row count that reaches the exchange either way.

Usage: python bench_skew.py [--docs 50000] [--hot 4000] [--uncapped-hot 1500]
Writes BENCH/skew_r04.json and prints one JSON line.

The uncapped leg runs at a REDUCED hot-set size (--uncapped-hot) so it
finishes at all; the quadratic model (pairs = n_hot_shingles * H^2 / 2)
is validated against the measured candidate count and then used to
report the extrapolated cost at the capped leg's H.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

_GEN_VERSION = 1
_BOILER = " ".join(f"boiler{k}" for k in range(12))  # 12 words -> 10 shingles


def corpus_path(n_docs: int, n_hot: int, seed: int = 42) -> str:
    from doc_ocr_spark import staging

    def build(tmp: str) -> None:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(seed)
        vocab = [f"w{k}" for k in range(5000)]
        texts = []
        for i in range(n_docs):
            words = [vocab[j] for j in rng.integers(0, len(vocab), size=30)]
            body = " ".join(words)
            # the first n_hot docs share the identical boilerplate prefix
            texts.append(f"{_BOILER} {body}" if i < n_hot else body)
        table = pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(table, os.path.join(tmp, "part-000.parquet"))

    key = staging.content_key(_GEN_VERSION, n_docs, n_hot, seed, _BOILER)
    return staging.ensure_staged("skew_corpus", key, build)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_leg(spark, path: str, cap: int) -> dict:
    """One pair-join run; returns wall seconds + candidate-row count."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from doc_ocr_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _df_capped,
        _jaccard_pairs,
        _shingles,
    )

    docs = spark.read.schema("doc_id long, text string").parquet(path)
    t0 = time.monotonic()
    sh = _df_capped(_shingles(docs), cap=cap)
    pairs = _jaccard_pairs(sh).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    obs = Observation("skew_leg")
    _noop(pairs.observe(obs, F.count(F.lit(1)).alias("n_pairs")))
    wall = time.monotonic() - t0
    # measured inflation: rows the inverted-index self-join actually
    # pushes into the pair aggregation (validates the O(H^2) model)
    a, b = sh.alias("a"), sh.alias("b")
    inflated = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()
    )
    return {
        "sec": round(wall, 2),
        "result_pairs": obs.get["n_pairs"],
        "inflated_join_rows": inflated,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--hot", type=int, default=5000)
    ap.add_argument("--uncapped-hot", type=int, default=5000)
    ap.add_argument("--cap", type=int, default=100)
    args = ap.parse_args()

    from doc_ocr_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "doc_ocr_spark-skew", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    hot_path = corpus_path(args.docs, args.hot)
    small_hot_path = corpus_path(args.docs, args.uncapped_hot)

    # warm: one capped pass (codegen + python worker amortization)
    run_leg(spark, hot_path, args.cap)

    capped = run_leg(spark, hot_path, args.cap)
    capped_small = run_leg(spark, small_hot_path, args.cap)
    # uncapped leg at the reduced hot-set size (the full-size uncapped
    # join is the O(H^2) blow-up this bench exists to demonstrate:
    # 10 shingles x 4000^2/2 = 80M inflated rows before the group-by)
    uncapped_small = run_leg(spark, small_hot_path, 10**9)

    n_hot_shingles = len(_BOILER.split()) - 2
    model_small = n_hot_shingles * args.uncapped_hot * (args.uncapped_hot - 1) // 2
    model_full = n_hot_shingles * args.hot * (args.hot - 1) // 2
    out = {
        "metric": "pair-join hot-key skew: df-cap vs uncapped",
        "docs": args.docs,
        "hot_docs_capped_leg": args.hot,
        "hot_docs_uncapped_leg": args.uncapped_hot,
        "hot_shingles": n_hot_shingles,
        "df_cap": args.cap,
        "capped_hot": capped,
        "capped_smallhot": capped_small,
        "uncapped_smallhot": uncapped_small,
        "uncapped_inflation_rows_model_small": model_small,
        "uncapped_inflation_rows_model_fullhot": model_full,
        "cpus": cpus,
    }
    spark.stop()
    try:
        with open(os.path.join(REPO, "BENCH", "skew_r04.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
