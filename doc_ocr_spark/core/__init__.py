"""Pure-Python extraction core — no Spark imports allowed here.

The same code path generates the golden corpus (sequentially) and runs
inside the distributed Arrow kernel, so byte-identity between the two is
structural (SURVEY.md §7.1 step 2).
"""

from doc_ocr_spark.core.extractor import extract_document, ExtractResult

__all__ = ["extract_document", "ExtractResult"]
