"""soccer_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``oyamecodes/soccer-data-pipeline`` (surveyed in ``SURVEY.md``): JSON
document ingest, normalization, lookup joins, season aggregation and
champion ranking — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns,
event-time windows) designed for 100 TB operation.

Design principles
-----------------
- DataFrame/SQL only; Catalyst owns the physical plan.
- Explicit schemas everywhere (reference README.md:66-84 mandates a
  declared, versioned schema — never ``inferSchema`` in production).
- Broadcast small dimensions, AQE on, partition-pruned parquet layouts.
- Python UDFs only where built-ins genuinely cannot express the
  semantics, and then Arrow-vectorized (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"
