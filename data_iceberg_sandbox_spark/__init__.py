"""data_iceberg_sandbox_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the computational surface of
the reference lakehouse sandbox (jean-pasquier/data-iceberg-sandbox,
snapshot at /root/reference): Iceberg-style table lifecycle, batch
transforms, merge/upsert, windowed streaming aggregation, stream-static
enrichment joins, and interactive SQL — all on one SparkSession — plus
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
  session      — SparkSession factory (reference: etl/src/apps/utils/spark_utils.py)
  sources      — testdata registry, CSV seeds, in-memory row sources
  tables       — snapshot-versioned lakehouse table layer (create/append/
                 merge/time-travel/compact/expire; Iceberg-jar optional)
  operators    — batch relational operators + EXT pipeline operators
  functions    — vector / text helper column expressions
  streaming    — Structured Streaming pipelines (fraud alerts MV analog)
  plans        — plan-inspection helpers (explain, pushdown checks)
"""

__version__ = "0.1.0"
