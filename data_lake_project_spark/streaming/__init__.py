"""Structured Streaming surface (SURVEY.md §2.8, M3).

Re-expresses the reference's only Spark pipeline — Kafka topic →
cast/from_json/flatten → keyed sink (``spark_stream/spark_stream.py``)
— with the weaknesses fixed (checkpointing, idempotent writes) and
the reference-absent surface added (watermarks, event-time windows,
session windows, streaming dedup).
"""

from data_lake_project_spark.streaming.pipeline import (
    EVENT_SCHEMA,
    file_stream_source,
    kafka_source,
    parse_events,
    read_sink,
    write_idempotent_foreach_batch,
    write_stream_scd2,
)
from data_lake_project_spark.streaming.stateful import (
    funnel_stages,
    running_totals,
)
from data_lake_project_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)

__all__ = [
    "EVENT_SCHEMA",
    "kafka_source",
    "file_stream_source",
    "parse_events",
    "read_sink",
    "write_idempotent_foreach_batch",
    "write_stream_scd2",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_dedup",
    "running_totals",
    "funnel_stages",
]
