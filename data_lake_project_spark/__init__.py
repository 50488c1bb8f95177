"""data_lake_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``anasbn44/data_lake_project`` (document-analytics data lake:
streaming ingest, batch CSV/HDFS ingest, document ETL with OCR /
table-grid / chart / numeric-fact extraction) as idiomatic Spark
DataFrame / SQL / Structured Streaming operators, plus the
LLM-training-data operators a 100 TB pipeline needs (dedup,
similarity search, multimodal columns, text analysis).

Design principles (see SURVEY.md §7):

- DataFrame-first: every operator is a declarative logical plan;
  Catalyst + Tungsten pick the physical strategy (pushdown, pruning,
  broadcast, AQE skew handling, whole-stage codegen).
- UDFs only where built-ins can't express the semantics, and then
  always Arrow-batched pandas UDFs / applyInPandas.
- No custom Catalyst rules; scale problems (interval joins, near-dup
  candidate generation) are solved with DataFrame-level rewrites
  (bucketing, LSH banding, blocking).
"""

__version__ = "0.1.0"

from data_lake_project_spark.session import get_spark
from data_lake_project_spark.tables import load_table, TABLES

__all__ = ["get_spark", "load_table", "TABLES", "__version__"]
