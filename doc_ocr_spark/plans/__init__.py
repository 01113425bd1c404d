from doc_ocr_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
