from doc_ocr_spark.sources.corpus import read_corpus, write_corpus
from doc_ocr_spark.sources.warc import read_warc, write_warc_files

__all__ = ["read_corpus", "write_corpus", "read_warc", "write_warc_files"]
