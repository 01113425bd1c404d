"""Spark Column re-expressions of the core scalar functions (F1-F7).

The byte-identity path always uses the Python kernel (SURVEY.md §7.4.5);
these JVM-side equivalents exist for SQL-side filtering/validation where
approximate parity is acceptable and Python would be the slow path.

Each function mirrors its core/tokens.py counterpart:
F1 normalize chain, F2 fullwidth->halfwidth, F3 bracket strip,
F4 number parse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F2 alphabet: U+3000 -> space, U+FF01..FF5E -> cp-0xFEE0 (same table as
# core/tokens.py; precomputed once, translate() is a single JVM pass)
_FW = "　" + "".join(chr(c) for c in range(0xFF01, 0xFF5F))
_HW = " " + "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F))

_BRACKETS = "()（）[]【】"


def fullwidth_to_halfwidth_col(c: Column) -> Column:
    return F.translate(c, _FW, _HW)


def strip_brackets_col(c: Column) -> Column:
    return F.translate(c, _BRACKETS, "")


def normalize_text_col(c: Column) -> Column:
    """F1 chain in the core's exact order: fullwidth -> brackets ->
    whitespace -> lowercase."""
    c = fullwidth_to_halfwidth_col(c)
    c = strip_brackets_col(c)
    c = F.regexp_replace(c, r"\s+", "")
    return F.lower(c)


def parse_number_col(c: Column) -> Column:
    """F4: strip [^0-9.-], try_cast to double; junk -> NULL (the core's
    reject set falls out of try_cast returning NULL on '', '.', '-',
    '-.', '.-')."""
    cleaned = F.regexp_replace(c, r"[^0-9.\-]", "")
    return cleaned.try_cast("double")
