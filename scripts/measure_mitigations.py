"""Measure the density-mitigation escalations SCALE.md previously
ASSERTED (round-13 verdict #4) on a generated corpus:

(a) q92 / prefix_filter_join: shingle k = 3 (the q92 setting) vs 4
    vs 5 — candidate count and wall time. The in-module escalation
    for a density-bound corpus is "grow the key space"; this stamps
    whether the 31-word fixture vocabulary lets it work.
(b) q160-class linkage: the blocked ``fuzzy_join`` pair generator vs
    the ``sorted_neighborhood_pairs`` alternative — candidate/pair
    counts and wall time on the same corpus.
(c) phash hot-band salting: ``phash_neardup`` with and without
    ``n_salts`` on the corpus rasters — wall time, identical pairs.

Usage: python scripts/measure_mitigations.py [corpus_dir] [runs]
Prints one JSON line per measurement. Run on a QUIET box (no
concurrent Spark); numbers are 'runs'-run medians after one warmup.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from data_lake_project_spark.session import get_spark


def timed(fn, runs):
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        ts.append(time.monotonic() - t0)
    return statistics.median(ts), out


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_gen_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("mitigations")
    docs = spark.read.parquet(f"{corpus}/documents.parquet")

    from data_lake_project_spark.operators import dedup as D

    # (a) q92 candidate curve vs shingle k
    for k in (3, 4, 5):
        sets = D.shingle_sets(docs, k=k).localCheckpoint(eager=True)
        n_cand = D._prefix_candidates(
            sets, (3, 5), "doc_id", "sh", True
        ).count()
        sec, n_pairs = timed(
            lambda s=sets: D.prefix_filter_join(s, threshold=(3, 5)).count(),
            runs,
        )
        print(
            json.dumps(
                {
                    "measure": "q92_prefix_filter_join",
                    "corpus": corpus,
                    "k": k,
                    "candidates": n_cand,
                    "pairs": n_pairs,
                    "sec": round(sec, 2),
                    "runs": runs,
                }
            ),
            flush=True,
        )
        sets.unpersist()

    # (b) q160-class pair generation: blocked fuzzy_join vs SNM
    from data_lake_project_spark.operators.linkage import fuzzy_join

    sec, n_pairs = timed(
        lambda: fuzzy_join(
            docs, ["lang", "source"], "text", "doc_id",
            max_dist=14, prefix_len=24,
        ).count(),
        runs,
    )
    print(
        json.dumps(
            {
                "measure": "q160_pairgen_fuzzy_join_blocked",
                "corpus": corpus,
                "pairs": n_pairs,
                "sec": round(sec, 2),
                "runs": runs,
            }
        ),
        flush=True,
    )
    sec, n_pairs = timed(
        lambda: D.sorted_neighborhood_pairs(
            docs, window=5, jaccard_min=0.5
        ).count(),
        runs,
    )
    print(
        json.dumps(
            {
                "measure": "q160_pairgen_sorted_neighborhood_w5",
                "corpus": corpus,
                "pairs": n_pairs,
                "sec": round(sec, 2),
                "runs": runs,
            }
        ),
        flush=True,
    )

    # (c) phash band self-join: unsalted vs salted on the corpus
    # rasters (the q189 ASCII-raster convention)
    from data_lake_project_spark.multimodal.phash import (
        ahash64,
        phash_neardup,
    )

    rasters = docs.select(
        "doc_id",
        F.encode(
            F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", ""), "UTF-8"
        ).alias("image"),
    ).filter(F.length("image") > 0)
    fps = ahash64(rasters, image_col="image").select(
        "doc_id", "pband0", "pband1", "pband2", "pband3"
    ).localCheckpoint(eager=True)
    for n_salts in (None, 8):
        sec, n_pairs = timed(
            lambda ns=n_salts: phash_neardup(
                fps, max_hamming=3, n_salts=ns
            ).count(),
            runs,
        )
        print(
            json.dumps(
                {
                    "measure": "phash_neardup",
                    "corpus": corpus,
                    "n_salts": n_salts,
                    "pairs": n_pairs,
                    "sec": round(sec, 2),
                    "runs": runs,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
