"""doc_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the extraction semantics of the reference
``xinge-ji/doc-ocr`` (single-request FastAPI OCR + template-driven layout
analysis; see SURVEY.md) as a batch pipeline over Common-Crawl-style page
tables ``(url, warc_ts, html, text, lang)``:

- ``core/``       pure-Python, Spark-free extraction kernel (HTML tokenizer,
                  boilerplate classifier, PDF-like layout analysis, template
                  field extraction, validation).  This single module is both
                  the golden-set generator and the distributed kernel.
- ``kernel.py``   Arrow-batch wrapper (``mapInArrow``) around the core.
- ``job.py``      the spark-submit batch job: salted repartition -> kernel ->
                  output + per-partition lineage, checkpoint/resume.
- ``operators/``  relational re-expressions (sessionization, range joins,
                  top-k) and training-data ops (dedup, similarity, textstats).
- ``datagen.py``  deterministic synthetic corpus (fixture families).
"""

__version__ = "0.1.0"
