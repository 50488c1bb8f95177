"""Streaming sink micro-bench: rows/s through the checkpointed
idempotent ``foreachBatch`` sink (``write_idempotent_foreach_batch``).

Run: ``python scripts/bench_streaming.py`` (env ``SPARK_GRAFT_SF_DIR``
defaults to /root/testdata/sf0.1). Prints one JSON line; the current
number is recorded in BASELINE.md §streaming so later rounds have a
regression reference.

The measured path is the full sink protocol per micro-batch: plan the
batch, parquet-write its ``__batch=<id>`` subdir, write the commit
marker through the Hadoop FS — i.e. sink overhead, not source speed
(the parquet file stream source feeds ~evenly sized batches).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_project_spark.session import get_spark  # noqa: E402
from data_lake_project_spark.streaming.pipeline import (  # noqa: E402
    read_sink,
    write_idempotent_foreach_batch,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    batches = int(os.environ.get("BENCH_STREAM_BATCHES", "8"))
    spark = get_spark("bench-streaming")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src, out, ckpt = f"{work}/src", f"{work}/out", f"{work}/ckpt"
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_rows = ev.count()
        # split the fixture into `batches` files -> one file per
        # micro-batch via maxFilesPerTrigger
        ev.repartition(batches).write.mode("overwrite").parquet(src)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = write_idempotent_foreach_batch(
            stream, out_dir=out, checkpoint_dir=ckpt, key_cols=["event_id"]
        )
        q.processAllAvailable()
        q.stop()
        elapsed = time.perf_counter() - t0
        written = read_sink(spark, out).count()
        assert written == n_rows, f"sink wrote {written}, expected {n_rows}"

        print(
            json.dumps(
                {
                    "metric": "stream_rows_per_sec",
                    "value": round(n_rows / elapsed, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "batches": batches,
                    "elapsed_sec": round(elapsed, 3),
                    "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
