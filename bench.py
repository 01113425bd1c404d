"""Benchmark harness (driver contract: prints ONE JSON line).

Runs the headline suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``:

- ``extract_corpus``: the north-rule metric — the full extraction
  pipeline (salted repartition -> Arrow kernel -> parquet write) over a
  deterministic synthetic corpus sized to the SF; reports docs/sec and
  bytes/sec alongside wall seconds.
- operator queries from __spark_entry__ (forced with a noop write so
  nothing is collected to the driver).

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <sf>,
         "extract_docs_per_sec": ..., "extract_bytes_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# headline operator queries (subset of __spark_entry__.queries())
HEADLINE = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "running_total_per_customer",
    "sessionize_events",
    "running_blocks",
    "next_purchase_after_click",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash16",
    "fingerprint_winnow",
    "token_count",
    "quality_score",
    "ann_cosine_topk",
    "ann_ivf_bucketed",
    "ann_ivf_kmeans",
    "embedding_cosine_dedup",
    "moving_avg_order_price",
    "order_quantiles_by_priority",
    "distinct_parts_per_supplier",
    "events_hourly_windows",
    "revenue_cube",
    "session_window_events",
    "revenue_grouping_sets",
    "high_value_customers_in_subquery",
    "extract_html_docs",
]

# measured and reported but NOT in the headline total (keeps the
# round-over-round "value" comparable to BENCH_r01's 27-query basis)
EXTRA = [
    "ann_nn_within_bucket",
    "dedup_clusters",
    "extract_invoices",
    "image_decode_features",
    "audio_decode_features",
    "video_frame_sample",
    "stratified_sample",
    "corpus_splits",
    "repetition_stats",
    "contamination_flags",
    "domain_quota",
    "corpus_curation",
    "asof_click_attribution",
    "orders_status_unpivot",
    "streaming_hourly_agg",
    "streaming_asof_agg",
    "streaming_dedup",
    "customer_retention_setops",
    "dup_span_flags",
    "tfidf_top_terms",
    "dedup_span_removal",
]

# synthetic extraction corpus size per SF (docs)
_CORPUS_DOCS = {"0.001": 500, "0.01": 4000, "0.1": 20000, "1eq": 200000}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def corpus_path(n_docs: int, seed: int = 42) -> str:
    """Cache the generated corpus parquet across runs (generation is
    driver-side Python and would otherwise dominate the measurement)."""
    from doc_ocr_spark import staging

    def build(tmp: str) -> None:
        from doc_ocr_spark.datagen import write_corpus_parquet

        write_corpus_parquet(tmp, n_docs, seed=seed)

    return staging.ensure_staged("bench", f"corpus_n{n_docs}_s{seed}", build)


def bench_out_dir(name: str) -> str:
    from doc_ocr_spark import staging

    d = os.path.join(staging.stage_root(), "bench_out", name)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    return d


def warm_up(spark) -> None:
    """Amortize one-time costs before measuring: python-worker daemon
    fork + module imports (first mapInArrow stage) and whole-stage
    codegen compilation (first agg)."""
    from pyspark.sql import functions as F

    from doc_ocr_spark.kernel import apply_kernel

    small = corpus_path(500)
    apply_kernel(spark.read.parquet(small).select("url", "html")).count()
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).agg(
        F.sum(F.col("id").cast("decimal(18,4)"))
    ).write.format("noop").mode("overwrite").save()


def bench_extraction(spark, n_docs: int, out_dir: str) -> dict:
    """Time the end-to-end extraction job body.  Docs/bytes ride the
    write via Observation — no output read-back (mirrors job.py)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from doc_ocr_spark.job import with_bucket
    from doc_ocr_spark.kernel import apply_kernel

    src = corpus_path(n_docs)
    t0 = time.monotonic()
    # post-kernel exchange (job.py default): map-only kernel over
    # row-group splits, then the salted url-hash repartition of the
    # extracted rows (~4x fewer bytes shuffled than raw html)
    corpus = spark.read.parquet(src).select("url", "html")
    extracted = with_bucket(apply_kernel(corpus), 64).repartition(
        64, "part_bucket"
    )
    obs = Observation("bench_metrics")
    extracted = extracted.observe(
        obs, F.count(F.lit(1)).alias("docs"), F.sum("bytes_in").alias("bytes")
    )
    extracted.write.mode("overwrite").parquet(out_dir)
    wall = time.monotonic() - t0
    stats = obs.get
    return {
        "sec": wall,
        "docs": stats["docs"],
        "bytes": stats["bytes"],
        "docs_per_sec": stats["docs"] / wall,
        "bytes_per_sec": (stats["bytes"] or 0) / wall,
    }


def run(sf_dir: str, cpus: int, include_operators: bool = True) -> dict:
    from doc_ocr_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(
        "doc_ocr_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    # retired demos stay benchable so the headline basis and the
    # round-over-round comparisons keep their historical query sets
    queries = {**entrymod.queries(), **entrymod.retired_queries()}
    times: dict[str, float] = {}

    warm_up(spark)
    n_docs = _CORPUS_DOCS.get(sf, 2000)
    ext = bench_extraction(spark, n_docs, bench_out_dir(f"out_{cpus}"))
    times["extract_corpus"] = round(ext["sec"], 3)

    cold: dict[str, float] = {}
    if include_operators:
        # two passes per query: the first run pays whole-stage-codegen
        # JIT compilation (at 100 TB this amortizes to zero — queries
        # run for minutes, not seconds), so the steady-state (2nd) time
        # is the comparable number; cold times are reported alongside.
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.monotonic()
            _force(fn(spark, sf_dir))
            cold[name] = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            _force(fn(spark, sf_dir))
            times[name] = round(time.monotonic() - t0, 3)

    extra: dict[str, float] = {}
    if include_operators:
        for name in EXTRA:
            fn = queries[name]
            _force(fn(spark, sf_dir))  # warm
            t0 = time.monotonic()
            _force(fn(spark, sf_dir))
            extra[name] = round(time.monotonic() - t0, 3)

    spark.stop()
    total = round(sum(times.values()), 3)
    # effective similarity knobs (ADVICE r02: env-read constants must be
    # visible in recorded output, not just in two processes' memories)
    from doc_ocr_spark.operators import similarity as _sim

    return {
        "metric": "headline suite wall time, steady-state (extraction job + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_cold": cold,
        "queries_extra": extra,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        "cpus": cpus,
        "extract_docs": ext["docs"],
        "extract_docs_per_sec": round(ext["docs_per_sec"], 1),
        "extract_bytes_per_sec": round(ext["bytes_per_sec"], 1),
        "knobs": {
            "lsh_planes": _sim.N_PLANES,
            "lsh_bands": _sim.N_BANDS,
            "ivf_centroids": _sim.N_CENTROIDS,
            # round 5: these two moved ann_nn_within_bucket's headline
            # time on purpose (recall 0.24 -> 0.65; finding #30)
            "ivf_nprobe": _sim.N_PROBE,
            "ivf_probe_mode": _sim.IVF_PROBE_MODE,
            "ivf_refine": _sim.IVF_REFINE,
        },
    }


def compact_line(result: dict) -> str:
    """The ONE stdout JSON line, kept well under the driver's ~4 KB tail
    capture (BENCH_r02 lesson: the full r02 line grew past the capture
    window, so the driver recorded ``parsed: null``).  Per-query times
    are merged (headline + extra) at 2 dp; the cold-pass dict and other
    detail live in BENCH/last_run_full.json, committed per run."""
    qs = {k: round(v, 2) for k, v in result["queries"].items()}
    qs.update({k: round(v, 2) for k, v in result.get("queries_extra", {}).items()})
    line = json.dumps(
        {
            "metric": "headline suite steady-state wall sec",
            "value": result["value"],
            "unit": "sec",
            "queries": qs,
            "sf": result["sf"],
            "cpus": result["cpus"],
            "extract_docs_per_sec": result["extract_docs_per_sec"],
            "extract_bytes_per_sec": result["extract_bytes_per_sec"],
            "knobs": result["knobs"],
        },
        separators=(",", ":"),
    )
    if len(line) > 3500:  # hard stop before the tail-capture hazard
        slim = {k: v for k, v in json.loads(line).items() if k != "queries"}
        # explicit marker (ADVICE r03): a consumer must be able to tell
        # 'truncated for the capture window' from 'no per-query data'
        slim["queries_truncated"] = True
        line = json.dumps(slim, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run(sf_dir, cpus)
    full_path = os.path.join(REPO, "BENCH", "last_run_full.json")
    try:
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        with open(full_path, "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass  # read-only checkout must not break the stdout contract
    print(compact_line(result))


if __name__ == "__main__":
    main()
