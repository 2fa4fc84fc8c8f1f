"""corrie_spark — a PySpark-native analytics/ETL engine with the
capabilities of kak-tus/corrie (reference: /root/reference, v0.4.13),
re-expressed Spark-first and extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Layout:
  session     — tuned SparkSession builder
  tables      — testdata table loaders + schemas
  envelope    — message envelope parse/coercion/DLQ (SURVEY §2.2 M1-M3)
  chtypes     — ClickHouse type-string parser → Spark types (SURVEY §1.3)
  operators/  — batching, dedup, similarity, text, multimodal, totals
  sinks/      — micro-batch writer w/ error isolation + DLQ (SURVEY §2.4)
  sources/    — envelope stream sources (SURVEY §2.1)
  streaming/  — end-to-end StreamingQuery pipeline (SURVEY §3.1)
  queries/    — query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
