from doc_ocr_spark.streaming.ingest import start_incremental_extraction

__all__ = ["start_incremental_extraction"]
