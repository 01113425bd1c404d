from doc_ocr_spark.streaming.ingest import (
    start_incremental_extraction,
    write_extracted_batch,
)

__all__ = ["start_incremental_extraction", "write_extracted_batch"]
