"""Phase-level profile of q194's per-call cost (round-13 verdict #5:
is the ~7 s sf0.01 stamp per-trigger floor or shaveable work?).

Replays q194's exact steps with a stopwatch between phases:
publish-if-absent base index (amortized), copytree, batch staging
writes, the availableNow stream (both gated-and-folded triggers),
sink read + checkpoint. Also times ONE bare gate_and_fold_batch call
and a bare no-op availableNow foreachBatch stream over the same two
files — the difference between (stream total) and (no-op stream +
2x gate-and-fold) is Structured Streaming scheduling cost.

Usage: python scripts/profile_q194.py [sf_dir] — run on a quiet box.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from data_lake_project_spark.session import get_spark


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile_q194")
    from data_lake_project_spark.multimodal.phash_index import (
        build_phash_index,
        gate_and_fold_batch,
        save_phash_index,
        stream_ingest_with_phash_gate,
    )
    from data_lake_project_spark.queries import (
        _PRINTABLE,
        _SHIFTED,
        _await_stream,
        _dataset_fingerprint,
        _publish_if_absent,
        load_table,
    )

    t = {}

    def mark(name, t0):
        t[name] = round(time.monotonic() - t0, 3)

    # warm the session (q194's bench context is a warm suite)
    load_table(spark, sf, "documents").count()

    t0 = time.monotonic()
    base_path = (
        f"/tmp/spark_graft_phash_base_{_dataset_fingerprint(sf, 'documents')}"
    )
    d = load_table(spark, sf, "documents")
    ascii_txt = F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", "")
    originals = d.select(
        "doc_id", F.encode(ascii_txt, "UTF-8").alias("image")
    ).filter(F.length("image") > 0)
    _publish_if_absent(
        spark,
        base_path,
        lambda tmp: save_phash_index(
            build_phash_index(originals.filter(F.col("doc_id") % 4 == 0)),
            tmp,
        ),
    )
    mark("publish_base", t0)

    t0 = time.monotonic()
    idx_path = tempfile.mkdtemp(prefix="prof_q194_idx_")
    shutil.rmtree(idx_path)
    shutil.copytree(base_path, idx_path)
    mark("copytree", t0)

    t0 = time.monotonic()
    twins = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.encode(
            F.translate(ascii_txt, _PRINTABLE, _SHIFTED), "UTF-8"
        ).alias("image"),
    ).filter(F.length("image") > 0)
    batches = [
        originals.filter((F.col("doc_id") % 4).isin(1, 2)),
        originals.filter(F.col("doc_id") % 4 == 3).unionByName(twins),
    ]
    src = tempfile.mkdtemp(prefix="prof_q194_src_")
    stage = tempfile.mkdtemp(prefix="prof_q194_stage_")
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(f"{stage}/b{i}")
        part = sorted(glob.glob(f"{stage}/b{i}/part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    mark("stage_batches", t0)

    t0 = time.monotonic()
    out = tempfile.mkdtemp(prefix="prof_q194_out_")
    ckpt = tempfile.mkdtemp(prefix="prof_q194_ckpt_")
    q = stream_ingest_with_phash_gate(
        spark.readStream.schema("doc_id long, image binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        idx_path,
        out,
        ckpt,
        available_now=True,
    )
    _await_stream(q)
    mark("stream_gate_fold_2trig", t0)

    t0 = time.monotonic()
    admitted = (
        spark.read.parquet(f"{out}/data")
        .select("doc_id", F.col("__batch").cast("long"))
        .localCheckpoint(eager=True)
    )
    n = admitted.count()
    mark("read_sink", t0)

    # --- decomposition runs -------------------------------------------------
    # bare no-op availableNow stream over the same two files
    t0 = time.monotonic()
    q2 = (
        spark.readStream.schema("doc_id long, image binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(lambda df, bid: None)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="prof_q194_ck2_")
        )
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q2)
    mark("noop_stream_2trig", t0)

    # one bare gate_and_fold_batch on a FRESH index copy (batch 0)
    idx2 = tempfile.mkdtemp(prefix="prof_q194_idx2_")
    shutil.rmtree(idx2)
    shutil.copytree(base_path, idx2)
    out2 = tempfile.mkdtemp(prefix="prof_q194_out2_")
    b0 = spark.read.parquet(os.path.join(src, "00.parquet"))
    t0 = time.monotonic()
    gate_and_fold_batch(b0, 0, idx2, out2)
    mark("one_gate_and_fold", t0)

    for d_ in (idx_path, src, stage, out, ckpt, idx2, out2):
        shutil.rmtree(d_, ignore_errors=True)
    t["admitted_rows"] = n
    t["sf"] = sf
    print(json.dumps(t), flush=True)


if __name__ == "__main__":
    main()
