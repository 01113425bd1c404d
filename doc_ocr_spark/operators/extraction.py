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
            F.sum(F.length("extracted_text")).alias("n_chars"),
        )
    )


ORACLES = {
    "extract_html_docs": EXTRACT_HTML_SQL,
    # extract_invoices: no oracle (sequential per-doc state machine;
    # covered by the golden byte-identity suite instead)
}

QUERIES = {
    "extract_html_docs": extract_html_docs,
    "extract_invoices": extract_invoices,
}
