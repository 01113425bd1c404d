"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY.md §4) — its hand-rolled pruning
(region prefilter, matched-page restriction) maps to Catalyst features
we get for free, *if* the plan is expressed declaratively.  These
helpers make that verifiable in tests and during tuning:

- ``pushed_filters``          predicates that reached the parquet scan
- ``read_schema_columns``     columns actually read (column pruning)
- ``wholestage_codegen_spans``codegen stage count (JVM-side coverage)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count WholeStageCodegen stages in the EXECUTED plan.

    Under AQE the final physical plan only exists after execution, so
    this runs the plan (use on small inputs when asserting in tests).
    """
    df.collect()  # a write() would spawn a separate QueryExecution
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
