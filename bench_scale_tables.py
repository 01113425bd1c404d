"""Derive an sf1-equivalent table set from the provided sf0.1 parquet
for BENCHMARKING ONLY (BENCH/BASELINE.md §2b).

The driver ships testdata up to sf0.1, where Spark's fixed local-mode
per-query overhead (~0.3-1 s) dominates most headline queries, making
per-query ratios vs DuckDB uninformative (VERDICT r01 item 10).  This
script unions K key-shifted copies of each provided FACT table — keys
are offset per copy so join fan-outs and group cardinalities scale
linearly, dims (nation/region) stay fixed like real dimension tables.
Copy 0 is byte-identical to the input, so correctness semantics are
untouched; copies >0 reuse the same value distributions but PERTURB the
content payloads deterministically (documents.text gets a one-token
copy suffix with n_chars recomputed; embeddings get a per-copy nudge on
the first coordinate), so cross-copy rows are NEAR-duplicates — the
realistic crawl shape — instead of K-sized exact-dup clusters that
would let the exact-dedup stage collapse the scale-up.  NOT used for
any correctness gate — those run only on the driver-provided tables.

Usage: python bench_scale_tables.py [K] [out_dir]   (default K=10)
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"

# key DOMAINS: every column sharing a domain must shift by the SAME
# offset (max over the whole domain), or FK references dangle in
# copies > 0 (e.g. customers without orders make max(o_custkey) <
# max(c_custkey)) and join fan-out silently deflates
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}
SHIFTS = {}
for dom, cols in DOMAINS.items():
    for t, c in cols:
        SHIFTS.setdefault(t, []).append((c, dom))
DIMS = ["nation", "region"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2:
        out = sys.argv[2]
    else:
        from doc_ocr_spark import staging

        out = os.path.join(staging.stage_root(), "bench_out", "sf1eq")
    os.makedirs(out, exist_ok=True)

    import duckdb

    con = duckdb.connect()
    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
    # one offset per DOMAIN (max across all member columns)
    dom_shift = {}
    for dom, cols in DOMAINS.items():
        m = max(
            con.sql(
                f"SELECT max({c}) FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
            for t, c in cols
        )
        dom_shift[dom] = m + 1

    for t, keys in SHIFTS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        key_dom = dict(keys)
        selects = []
        for c in range(k):
            cols = []
            for row in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall():
                name = row[0]
                if name in key_dom:
                    off = c * dom_shift[key_dom[name]]
                    cols.append(f"CAST({name} + {off} AS BIGINT) AS {name}")
                elif t == "documents" and name == "text" and c > 0:
                    # near-dup, not exact-dup, across copies
                    cols.append(f"text || ' v{c}' AS text")
                elif t == "documents" and name == "n_chars" and c > 0:
                    cols.append(
                        f"CAST(length(text || ' v{c}') AS BIGINT) AS n_chars"
                    )
                elif t == "embeddings" and name == "embedding" and c > 0:
                    cols.append(
                        f"CAST(list_prepend(CAST(embedding[1] + {c} * 0.001 "
                        f"AS FLOAT), embedding[2:]) AS FLOAT[]) AS embedding"
                    )
                else:
                    cols.append(name)
            selects.append(f"SELECT {', '.join(cols)} FROM {src}")
        union = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({union}) TO '{out}/{t}.parquet' "
            "(FORMAT parquet, ROW_GROUP_SIZE 200000)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote sf1-equivalent tables (K={k}) to {out}")


if __name__ == "__main__":
    main()
