"""Golden corpus generation + byte-identity comparison harness.

The golden set is produced by running the SAME core kernel sequentially
(single process, no Spark) — SURVEY.md §7.1: one code path, so
byte-identity between golden and distributed output is structural.
"""

from __future__ import annotations

import json

from doc_ocr_spark.core.extractor import extract_document
from doc_ocr_spark.datagen import generate_pages


def golden_rows(n: int, seed: int = 42) -> list[dict]:
    """Sequential reference run over the synthetic corpus."""
    out = []
    for page in generate_pages(n, seed=seed):
        res = extract_document(page["url"], page["html"])
        out.append(
            {
                "url": res.url,
                "extracted_text": res.extracted_text,
                "spans": [
                    {"field": f, "start": s, "end": e} for (f, s, e) in res.spans
                ],
                "template_name": res.template_name,
                "complete": res.complete,
                "errors": res.errors,
                "fields_json": res.fields_json,
            }
        )
    return out


def _canon(row: dict) -> str:
    """Canonical string for one result row (key-sorted JSON)."""
    return json.dumps(
        {
            "url": row["url"],
            "extracted_text": row["extracted_text"],
            "spans": [
                [s["field"], s["start"], s["end"]] for s in (row["spans"] or [])
            ],
            "template_name": row["template_name"],
            "complete": row["complete"],
            "errors": list(row["errors"] or []),
            "fields_json": row["fields_json"],
        },
        sort_keys=True,
        ensure_ascii=False,
    )


def compare_to_golden(spark_rows: list[dict], golden: list[dict]) -> list[str]:
    """Full-outer comparison by url; returns list of mismatched urls
    (empty == byte-identical)."""
    g = {r["url"]: _canon(r) for r in golden}
    s = {r["url"]: _canon(r) for r in spark_rows}
    bad = sorted(
        set(g) ^ set(s) | {u for u in set(g) & set(s) if g[u] != s[u]}
    )
    return bad
