"""SparkSession factory with scale-oriented defaults.

The reference creates its session at ``spark_stream/spark_stream.py:185-195``
with nothing but connector config. Here we centralize the settings that
matter at 100 TB:

- AQE on (runtime re-plan: shuffle coalescing, skew-join splitting,
  broadcast conversion after runtime stats).
- Arrow on (pandas UDF batches cross Python<->JVM as columnar Arrow).
- ``spark.sql.shuffle.partitions`` sized to the parallelism at hand;
  on a real cluster this is ~2-3x total executor cores and AQE
  coalesces small partitions back down.
- UTC session timezone so timestamp rendering is deterministic and
  engine-independent (matches the DuckDB oracle's naive timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_lake_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for local runs; on a cluster, leave it to spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 128 MiB input splits: the sweet spot for parquet scan tasks;
        # at 100 TB this yields ~800k tasks, amortized by FAIR pools.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_determinism(spark: SparkSession) -> SparkSession:
    """Session-level settings required for oracle-stable output.

    Safe to call on a session we didn't create (the driver's verify
    session): only sets runtime-mutable confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
