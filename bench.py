"""Benchmark harness: runs the declared query surface and prints ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}``.

Config via env:
- ``SPARK_GRAFT_SF_DIR``  data dir (default /root/testdata/sf0.1)
- ``SPARK_GRAFT_CPUS``    local[] parallelism (default all cores)
- ``BENCH_RUNS``          timed runs per query (default 1; use 3 for
                          median when establishing BASELINE.md)
- ``BENCH_QUERIES``       comma-separated subset (default: all)

Each query is forced through full materialization with the ``noop``
sink (no driver collect bottleneck, no result truncation) — the same
way a cluster job would be measured.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lake_project_spark.queries import QUERIES
from data_lake_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "1"))
    subset = os.environ.get("BENCH_QUERIES")
    names = subset.split(",") if subset else list(QUERIES)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark("bench")
    # Warm the JVM + EVERY fixture table's parquet footer once so
    # per-query numbers measure the plan, not session startup or
    # first-touch footer loads (round-4 driver sweeps read 3-6x on the
    # suite head q01-q13 purely from this cold tax).
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    # Warm the window-exchange + codegen path (q11-q13 class) with a
    # throwaway ranked scan.
    spark.sql(
        "SELECT max(rn) FROM (SELECT row_number() OVER "
        "(PARTITION BY id % 4 ORDER BY id) AS rn FROM range(1000))"
    ).collect()
    # Warm the hash/codegen expression path: the first md5/xxhash-heavy
    # query in a session pays JIT + codegen compilation that isn't its
    # plan's cost (round-5 driver sweep: the rotated head q46/q47 read
    # 3.7-4.7x their warm medians purely from this — the round-4 suite
    # head tax moved with the head).
    spark.sql(
        "SELECT max(length(m)), bit_xor(xxhash64(m)) FROM "
        "(SELECT md5(cast(id AS string)) AS m FROM range(10000))"
    ).collect()
    # Warm the Python worker pool too: the first pandas-UDF query in a
    # session otherwise eats ~1.5s of daemon/worker spinup that isn't
    # its plan's cost (measured on q28b: 2.2s cold vs 0.7s warm).
    import pandas as _pd  # noqa: F401

    spark.range(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    jvm = spark.sparkContext._jvm
    for name in names:
        fn = QUERIES[name]
        # Collect the previous query's garbage OUTSIDE the timed
        # section: without this, heap pressure left by earlier queries
        # bleeds 5-10x GC stalls into whichever query runs next
        # (measured: q76 14.5s -> 2.8s behind a 0.15s System.gc()).
        jvm.System.gc()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    line = json.dumps(payload)
    print(line)
    # Also persist to a file next to the script: the driver captures
    # stdout and round-3's BENCH artifact lost its head to truncation —
    # the file copy is the untruncatable record.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
    )
    with open(out_path, "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
