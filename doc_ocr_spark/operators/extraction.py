"""Extraction-engine queries for the driver contract.

``extract_html_docs`` runs the REAL kernel (htmltok + boilerplate via
mapInArrow) over pages synthesized from the ``documents`` table, with a
SQL oracle: the wrapper HTML is a single <p>, so the classifier's keep
rule reduces to ``n_words > 16`` and the extracted text is exactly the
(already whitespace-canonical) document text.  This puts the actual
Arrow kernel under the driver's DuckDB hash gate.

``extract_invoices`` runs the full template path (match -> fields ->
table -> validate) over datagen's positioned-token invoices; its
sequential state machine is not SQL-expressible, so it ships without an
oracle (driver records the weaker rows-only check; the byte-level gate
for this path is tests/test_spark_job.py's golden comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_ocr_spark.kernel import apply_kernel
from doc_ocr_spark.operators import load


def _pages_from_documents(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.concat(F.lit("https://docs.test/"), F.col("doc_id")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
            ),
            "utf-8",
        ).alias("html"),
    )


def extract_html_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = apply_kernel(_pages_from_documents(docs))
    return out.select("url", "extracted_text", "complete")


EXTRACT_HTML_SQL = """
SELECT 'https://docs.test/' || doc_id AS url,
       CASE WHEN len(string_split(text, ' ')) > 16 THEN text ELSE '' END AS extracted_text,
       len(string_split(text, ' ')) > 16 AS complete
FROM documents
"""


def extract_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-path summary over 200 deterministic synthetic pages
    (families incl. zh invoices, split anchors, multiline rows)."""
    from doc_ocr_spark.datagen import generate_pages

    rows = [
        (p["url"], p["html"]) for p in generate_pages(200, seed=42)
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = apply_kernel(pages)
    return (
        out.groupBy("template_name", "complete")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # coalesce: the oracle counts a null text as 0 chars
            F.sum(F.coalesce(F.length("extracted_text"), F.lit(0))).alias("n_chars"),
        )
    )


INVOICE_COLS = [
    ("template_name", "VARCHAR"),
    ("complete", "BOOLEAN"),
    ("n_docs", "BIGINT"),
    ("n_chars", "BIGINT"),
]


def _invoice_oracle() -> str:
    """VALUES-literal oracle: the 200-page corpus is seeded, so the
    expected aggregate is computable offline by the sequential golden
    path (the same one the byte-identity suite trusts) and frozen into
    SQL — the driver's hash gate then covers the distributed template
    path end-to-end (VERDICT r01 item 2)."""
    from doc_ocr_spark.golden import golden_rows
    from doc_ocr_spark.operators import values_oracle

    agg: dict[tuple, list[int]] = {}
    for r in golden_rows(200, seed=42):
        key = (r["template_name"], bool(r["complete"]))
        a = agg.setdefault(key, [0, 0])
        a[0] += 1
        a[1] += len(r["extracted_text"] or "")
    rows = [
        {"template_name": k[0], "complete": k[1], "n_docs": v[0], "n_chars": v[1]}
        for k, v in agg.items()
    ]
    return values_oracle(INVOICE_COLS, rows)


def _oracles() -> dict[str, str]:
    return {
        "extract_html_docs": EXTRACT_HTML_SQL,
        "extract_invoices": _invoice_oracle(),
    }


ORACLES = _oracles  # lazy: see __spark_entry__.oracle_sql

QUERIES = {
    "extract_html_docs": extract_html_docs,
    "extract_invoices": extract_invoices,
}
