"""pyspark_text_classification_spark — a PySpark-native text-analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference GLUE text-classification suite
(``/root/reference/``: sst2_test2.py, qqp_test.py, qnli_test.py,
transformers_test.py), re-expressed as a composable library:

- ``session``    — SparkSession factory (AQE, Arrow, sane defaults)
- ``sources``    — schema-declared CSV/TSV + parquet IO, column mapping
- ``functions``  — native column expressions (tokenize, stopwords, vectors,
                   deterministic hashing) — zero Python row UDFs in the core
- ``operators``  — relational ops: cleaning, tokenization, dedup, similarity
                   search, text statistics, aggregates
- ``ml``         — MLlib pipeline builders (featurize/train/evaluate/infer)
- ``streaming``  — Structured Streaming variants of the batch operators
- ``queries``    — the declared, oracle-checkable query registry

Design rules (SURVEY.md §7.1): explicit schemas; native expressions instead
of row UDFs; Arrow always on; AQE instead of hand-tuned shuffle partitions;
no driver-side collect loops in core paths; every deterministic operator has
a DuckDB twin query for correctness hashing.
"""

__version__ = "0.1.0"
