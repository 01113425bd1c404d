"""Streaming URL dedup — custom stateful operator.

Incremental crawl semantics: a url already extracted in ANY earlier
micro-batch must not be re-extracted.  State = one flag per url key in
the state store; first arrival wins, duplicates (within or across
batches) are dropped.  At corpus scale this is the streaming twin of
the batch job's resume anti-join — state is sharded by the group key
exactly like the batch bucket exchange.

Implementation note: Spark 4.x's successor API
(``transformWithStateInPandas``) requires the protobuf-based streaming
python runner, which is not importable in this environment
(``ImportError: cannot import name 'descriptor' from google.protobuf``),
so this uses ``applyInPandasWithState`` — same state-store semantics,
same sharding.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from doc_ocr_spark.streaming.ingest import PAGES_SCHEMA

_OUT_SCHEMA = "url STRING, n_bytes BIGINT"
_STATE_SCHEMA = "seen BOOLEAN"


def _dedup_group(key, pdf_iter, state: GroupState):
    """Emit the key's first-ever row; drop everything afterwards."""
    if state.exists:
        return
    for pdf in pdf_iter:
        if len(pdf):
            state.update((True,))
            yield pd.DataFrame(
                {"url": [key[0]], "n_bytes": [int(pdf.iloc[0]["n_bytes"])]}
            )
            return


def streaming_dedup_urls(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "stream_url_dedup",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the dedup stream over all available files; returns the memory
    sink with exactly one row per distinct url ever seen."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir).selectExpr(
        "url", "CAST(length(html) AS BIGINT) AS n_bytes"
    )
    deduped = pages.groupBy("url").applyInPandasWithState(
        _dedup_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
