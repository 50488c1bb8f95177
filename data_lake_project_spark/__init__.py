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

from data_lake_project_spark.lakehouse import (
    BucketedCatalog,
    Lakehouse,
    compact,
    scd2_apply,
    with_ingest_metadata,
)
from data_lake_project_spark.operators.dataset import curate_corpus, hash_split
from data_lake_project_spark.operators.interval import iou_join, time_range_join
from data_lake_project_spark.operators.skew import salted_join
from data_lake_project_spark.pipelines import (
    extract_figures,
    extract_tables,
    extract_text_facts,
    extract_text_facts_multi,
)
from data_lake_project_spark.session import get_spark
from data_lake_project_spark.sources import (
    KeyedTable,
    delta_available,
    read_csv,
    write_csv,
)
from data_lake_project_spark.tables import TABLES, load_table

__all__ = [
    "get_spark",
    "load_table",
    "TABLES",
    "Lakehouse",
    "BucketedCatalog",
    "compact",
    "scd2_apply",
    "with_ingest_metadata",
    "KeyedTable",
    "delta_available",
    "read_csv",
    "write_csv",
    "hash_split",
    "curate_corpus",
    "iou_join",
    "time_range_join",
    "salted_join",
    "extract_tables",
    "extract_text_facts",
    "extract_text_facts_multi",
    "extract_figures",
    "__version__",
]
