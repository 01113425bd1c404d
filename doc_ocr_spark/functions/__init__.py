from doc_ocr_spark.functions.normalize import (
    fullwidth_to_halfwidth_col,
    normalize_text_col,
    parse_number_col,
    strip_brackets_col,
)

__all__ = [
    "fullwidth_to_halfwidth_col",
    "strip_brackets_col",
    "normalize_text_col",
    "parse_number_col",
]
