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
(c2) the same pair on a PLANTED hot band: a slice of the corpus
    fingerprints gets one shared pband0 value (the degenerate
    form-page scenario the module docstring warns about), so the
    band self-join concentrates a quadratic bucket into one
    partition — the case ``n_salts`` exists for.

Usage: python scripts/measure_mitigations.py [corpus_dir] [runs] [legs]
``legs``: comma-separated subset of a,b,c,c2 (default: all).
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
    legs = set(
        (sys.argv[3] if len(sys.argv) > 3 else "a,b,c,c2").split(",")
    )
    spark = get_spark("mitigations")
    docs = spark.read.parquet(f"{corpus}/documents.parquet")

    from data_lake_project_spark.operators import dedup as D

    # (a) q92 candidate curve vs shingle k
    for k in (3, 4, 5) if "a" in legs else ():
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

    if "b" in legs:
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
    for n_salts in (None, 8) if "c" in legs else ():
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

    # (c2) the PLANTED hot band: every doc_id % 10 == 0 fingerprint
    # (~10% of the corpus) shares one pband0 value — the degenerate
    # form-page scenario (one band bucket pairs quadratically and,
    # unsalted, lands in ONE shuffle partition). Other bands stay
    # corpus-random, so verified output stays small; the measurement
    # isolates candidate-bucket skew, which is what n_salts spreads.
    if "c2" in legs:
        for mod in (10, 2):
            hot = fps.withColumn(
                "pband0",
                F.when(
                    F.col("doc_id") % mod == 0, F.lit(4242)
                ).otherwise(F.col("pband0")),
            ).localCheckpoint(eager=True)
            pair_sets = {}
            for n_salts in (None, 8):
                sec, n_pairs = timed(
                    lambda ns=n_salts: phash_neardup(
                        hot, max_hamming=3, n_salts=ns
                    ).count(),
                    runs,
                )
                pair_sets[n_salts] = n_pairs
                print(
                    json.dumps(
                        {
                            "measure": "phash_neardup_hot_band",
                            "corpus": corpus,
                            "hot_fraction": round(1 / mod, 2),
                            "n_salts": n_salts,
                            "pairs": n_pairs,
                            "sec": round(sec, 2),
                            "runs": runs,
                        }
                    ),
                    flush=True,
                )
            assert pair_sets[None] == pair_sets[8], pair_sets
            hot.unpersist()

    # (c3) the same planted-hot-band pair with auto-broadcast OFF:
    # on this box the corpus-side band frame broadcasts (~MBs), so
    # the unsalted join is a broadcast hash join whose hot key is
    # ALREADY spread across the probe side's partitions — no
    # straggler, and salting can only add replication overhead (the
    # honest c2 reading). At 100 TB neither side broadcasts; forcing
    # the shuffle join here measures the actual escalation ladder a
    # cluster runs: AQE skew-join split (the default production
    # answer) vs AQE-off (the genuine one-partition straggler) vs
    # manual salting (the pre-AQE / non-adaptive fallback).
    if "c3" in legs:
        hot = fps.withColumn(
            "pband0",
            F.when(F.col("doc_id") % 2 == 0, F.lit(4242)).otherwise(
                F.col("pband0")
            ),
        ).localCheckpoint(eager=True)

        def _with_conf(pairs_conf, fn):
            saved = {
                k: spark.conf.get(k) for k, _ in pairs_conf
            }
            for k, v in pairs_conf:
                spark.conf.set(k, v)
            try:
                return fn()
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)

        no_bcast = [("spark.sql.autoBroadcastJoinThreshold", "-1")]
        cases = [
            ("shuffle_aqe_skewjoin", no_bcast, None),
            (
                "shuffle_no_aqe",
                no_bcast + [("spark.sql.adaptive.enabled", "false")],
                None,
            ),
            ("shuffle_salted8", no_bcast, 8),
        ]
        pair_sets = {}
        for label, conf, ns in cases:
            sec, n_pairs = _with_conf(
                conf,
                lambda ns=ns: timed(
                    lambda: phash_neardup(
                        hot, max_hamming=3, n_salts=ns
                    ).count(),
                    runs,
                ),
            )
            pair_sets[label] = n_pairs
            print(
                json.dumps(
                    {
                        "measure": "phash_neardup_hot_band_shuffle",
                        "corpus": corpus,
                        "hot_fraction": 0.5,
                        "case": label,
                        "pairs": n_pairs,
                        "sec": round(sec, 2),
                        "runs": runs,
                    }
                ),
                flush=True,
            )
        assert len(set(pair_sets.values())) == 1, pair_sets


if __name__ == "__main__":
    main()
