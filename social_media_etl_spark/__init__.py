"""social_media_etl_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(``esteban-mendoza/social-media-etl``) as an idiomatic Spark engine:

- ``session``    — SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``catalog``    — testdata table loading / temp-view registration
- ``operators``  — flatten / normalize / rename / cast / integrity /
                   argmax-with-ties / dedup / similarity (SURVEY.md §2)
- ``functions``  — text analysis + vector math column expressions
- ``sources``    — readers (parquet/json/ndjson/csv/jdbc/rest) and writers
- ``plans``      — the reference's three analytical queries + headline
                   analytics queries over the testdata star schema
- ``streaming``  — Structured Streaming ingest / windowed aggregation
- ``pipeline``   — orchestration driver (ordered stages, retries, gating)
"""

__version__ = "0.1.0"
