from doc_ocr_spark.sources.corpus import read_corpus, write_corpus

__all__ = ["read_corpus", "write_corpus"]
