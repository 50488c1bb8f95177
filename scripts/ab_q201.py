"""In-process A/B for the q201 text-lane gate: alternate the
pre-trim (no b_sets reuse) and trimmed (b_sets reuse) batch body in
ONE Spark session, interleaved ABAB..., so microVM steal windows hit
both arms equally. Each trial replays the two q201 micro-batches
through gate_and_fold_text_batch against a fresh copy of the base
index.

Usage: python scripts/ab_q201.py [sf_dir] [n_pairs]
"""

from __future__ import annotations

import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_lake_project_spark.operators import dedup_index as DI  # noqa: E402
from data_lake_project_spark.queries import (  # noqa: E402
    _dataset_fingerprint,
    _publish_if_absent,
    load_table,
)
from data_lake_project_spark.session import get_spark  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab_q201")
    d = load_table(spark, sf, "documents")
    docs = d.select("doc_id", "text")
    base_path = (
        f"/tmp/spark_graft_q201_base_{_dataset_fingerprint(sf, 'documents')}"
    )
    _publish_if_absent(
        spark,
        base_path,
        lambda tmp: DI.save_dedup_index(
            DI.build_dedup_index(docs.filter(F.col("doc_id") % 4 == 0)),
            tmp,
        ),
    )
    twins = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" dup")).alias("text"),
    )
    b0 = docs.filter((F.col("doc_id") % 4).isin(1, 2)).localCheckpoint(
        eager=True
    )
    b1 = (
        docs.filter(F.col("doc_id") % 4 == 3)
        .unionByName(twins)
        .localCheckpoint(eager=True)
    )

    def trial(use_reuse: bool) -> float:
        idx_path = tempfile.mkdtemp(prefix="ab_q201_idx_")
        out = tempfile.mkdtemp(prefix="ab_q201_out_")
        shutil.rmtree(idx_path)
        shutil.copytree(base_path, idx_path)
        orig = DI.dedup_against_index
        if not use_reuse:
            # arm A: force the pre-trim body (ignore b_sets)
            def no_reuse(index, batch, threshold=0.5, self_dedup=False,
                         b_sets=None):
                return orig(index, batch, threshold, self_dedup)

            DI.dedup_against_index = no_reuse
        t0 = time.monotonic()
        try:
            DI.gate_and_fold_text_batch(b0, 0, idx_path, out)
            DI.gate_and_fold_text_batch(b1, 1, idx_path, out)
        finally:
            DI.dedup_against_index = orig
            shutil.rmtree(idx_path, ignore_errors=True)
            shutil.rmtree(out, ignore_errors=True)
        return time.monotonic() - t0

    trial(True)  # warm both paths once, untimed
    trial(False)
    a, b = [], []
    for _ in range(n_pairs):
        a.append(trial(False))
        b.append(trial(True))
    print(
        "A pre-trim  :",
        [round(x, 2) for x in a],
        "median",
        round(statistics.median(a), 3),
    )
    print(
        "B b_sets    :",
        [round(x, 2) for x in b],
        "median",
        round(statistics.median(b), 3),
    )
    spark.stop()


if __name__ == "__main__":
    main()
