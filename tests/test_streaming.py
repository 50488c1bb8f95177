"""Batch↔stream equivalence tests (SURVEY.md §5.3): the same input
processed as static files vs a file stream must produce identical
results; the idempotent foreachBatch sink must survive a
checkpoint-lost replay without duplicating rows (fixes reference
Appendix B.7, ``spark_stream/spark_stream.py:217-224``).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_lake_project_spark.streaming import (
    file_stream_source,
    parse_events,
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
    write_idempotent_foreach_batch,
)
from data_lake_project_spark.streaming.pipeline import read_sink, to_silver

EVENTS = [
    {"id": "1", "order_date": "2024-05-01", "product_name": "a", "quantity": "2"},
    {"id": "2", "order_date": "2024-05-01", "product_name": "b", "quantity": "3"},
    {"id": "3", "order_date": "2024-05-02", "product_name": "a", "quantity": "5"},
    {"id": "4", "order_date": "2024-05-03", "product_name": "c", "quantity": "1"},
]


def _write_source(dirpath: str, events: list[dict], files: int = 2) -> None:
    os.makedirs(dirpath, exist_ok=True)
    per = max(1, len(events) // files)
    for i in range(0, len(events), per):
        with open(os.path.join(dirpath, f"chunk_{i}.json"), "w") as fh:
            for e in events[i : i + per]:
                fh.write(json.dumps({"key": e["id"], "value": json.dumps(e)}) + "\n")


def test_parse_events_flattens_and_keeps_malformed(spark):
    raw = spark.createDataFrame(
        [
            ("1", json.dumps(EVENTS[0])),
            ("x", "not json at all"),
        ],
        "key string, value string",
    ).select(F.col("key").cast("binary"), F.col("value").cast("binary"))
    out = parse_events(raw).orderBy("key").collect()
    assert [r.id for r in out] == ["1", None]  # bronze keeps malformed
    silver = to_silver(parse_events(raw)).collect()
    assert len(silver) == 1 and silver[0].quantity == 2


def test_stream_matches_batch_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_source(src, EVENTS)

    q = write_idempotent_foreach_batch(
        to_silver(parse_events(file_stream_source(spark, src))),
        out_dir=out,
        checkpoint_dir=ckpt,
        key_cols=["id"],
    )
    q.processAllAvailable()
    q.stop()

    streamed = read_sink(spark, out)
    batch = to_silver(
        parse_events(
            spark.read.json(src).select(
                F.col("key").cast("binary"), F.col("value").cast("binary")
            )
        )
    )
    assert sorted(streamed.collect()) == sorted(batch.collect())


def test_idempotent_sink_survives_checkpoint_loss(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_source(src, EVENTS)

    pipeline = lambda: write_idempotent_foreach_batch(  # noqa: E731
        to_silver(parse_events(file_stream_source(spark, src))),
        out_dir=out,
        checkpoint_dir=ckpt,
        key_cols=["id"],
    )
    q = pipeline()
    q.processAllAvailable()
    q.stop()
    n_first = read_sink(spark, out).count()

    # lose the checkpoint -> every micro-batch replays with the same
    # batch ids; the committed-batch markers must make them no-ops
    shutil.rmtree(ckpt)
    q = pipeline()
    q.processAllAvailable()
    q.stop()
    n_second = read_sink(spark, out).count()
    assert n_first == n_second == len(EVENTS)


def test_idempotent_sink_survives_lost_marker(spark, tmp_path):
    """The layered protocol's stronger claim: even if a marker never
    made it to disk (crash between data write and marker write), the
    replayed batch OVERWRITES its own subdirectory instead of
    appending — no duplicates, by construction."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_source(src, EVENTS)

    pipeline = lambda: write_idempotent_foreach_batch(  # noqa: E731
        to_silver(parse_events(file_stream_source(spark, src))),
        out_dir=out,
        checkpoint_dir=ckpt,
        key_cols=["id"],
    )
    q = pipeline()
    q.processAllAvailable()
    q.stop()
    n_first = read_sink(spark, out).count()

    # simulate "crash after append, before marker": delete ALL markers
    # and the checkpoint, so every batch replays as if uncommitted
    shutil.rmtree(os.path.join(out, "_committed_batches"))
    shutil.rmtree(ckpt)
    q = pipeline()
    q.processAllAvailable()
    q.stop()
    n_second = read_sink(spark, out).count()
    assert n_first == n_second == len(EVENTS)


@pytest.fixture()
def ts_events(spark):
    rows = [
        ("u1", "2024-05-01 10:00:00", 1.0),
        ("u1", "2024-05-01 10:04:00", 2.0),
        ("u1", "2024-05-01 10:21:00", 4.0),  # > 15 min gap: new session
        ("u2", "2024-05-01 10:02:00", 8.0),
        ("u2", "2024-05-01 11:30:00", 16.0),
    ]
    return spark.createDataFrame(rows, "user_id string, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )


def _stream_from(spark, df, tmp_path, name):
    path = str(tmp_path / name)
    df.select("user_id", F.col("ts").cast("string").alias("ts_s"), "value").coalesce(
        1
    ).write.mode("overwrite").json(path)
    return (
        spark.readStream.schema("user_id string, ts_s string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(path)
        .select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    )


def _run_to_memory(spark, streamed_df, name, mode="complete"):
    q = (
        streamed_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


@pytest.mark.parametrize(
    "agg_fn,kwargs",
    [
        (tumbling_agg, {"duration": "10 minutes"}),
        (sliding_agg, {"duration": "10 minutes", "slide": "5 minutes"}),
        (session_agg, {"gap": "15 minutes"}),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_windowed_agg_stream_equals_batch(spark, tmp_path, ts_events, agg_fn, kwargs):
    aggs = [
        F.sum("value").alias("total"),
        F.count(F.lit(1)).alias("n"),
    ]
    batch = agg_fn(ts_events, "ts", agg_exprs=aggs, keys=["user_id"], **kwargs)
    stream_in = _stream_from(spark, ts_events, tmp_path, f"win_{agg_fn.__name__}")
    streamed = _run_to_memory(
        spark,
        agg_fn(stream_in, "ts", agg_exprs=aggs, keys=["user_id"], **kwargs),
        f"mem_{agg_fn.__name__}",
    )

    def canon(df):
        return sorted(
            (r.win.start, r.win.end, r.user_id, r.total, r.n) for r in df.collect()
        )

    assert canon(batch) == canon(streamed)
    assert len(canon(batch)) > 0


def test_stream_dedup_bounded_state(spark, tmp_path):
    rows = [
        ("k1", "2024-05-01 10:00:00"),
        ("k1", "2024-05-01 10:00:00"),  # exact duplicate
        ("k2", "2024-05-01 10:05:00"),
    ]
    df = spark.createDataFrame(rows, "k string, ts_s string").select(
        "k", F.to_timestamp("ts_s").alias("ts")
    )
    path = str(tmp_path / "dedup_src")
    df.select("k", F.col("ts").cast("string").alias("ts_s")).coalesce(1).write.mode(
        "overwrite"
    ).json(path)
    stream_in = (
        spark.readStream.schema("k string, ts_s string")
        .json(path)
        .select("k", F.to_timestamp("ts_s").alias("ts"))
    )
    deduped = stream_dedup(stream_in, ["k", "ts"], ts_col="ts")
    out = _run_to_memory(spark, deduped, "mem_dedup", mode="append")
    assert sorted(r.k for r in out.collect()) == ["k1", "k2"]


def test_running_totals_state_carries_across_batches(spark, tmp_path):
    from data_lake_project_spark.streaming.stateful import running_totals

    # two files -> two micro-batches (maxFilesPerTrigger=1); the second
    # batch must see state accumulated by the first
    src = str(tmp_path / "stateful_src")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as fh:
        fh.write('{"user_id": "u1", "value": 1.0}\n{"user_id": "u1", "value": 2.0}\n')
        fh.write('{"user_id": "u2", "value": 10.0}\n')
    with open(os.path.join(src, "b2.json"), "w") as fh:
        fh.write('{"user_id": "u1", "value": 4.0}\n')

    stream = (
        spark.readStream.schema("user_id string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("mem_stateful")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("mem_stateful").collect()
    # u1 appears once per batch; the LAST update carries the running sum
    u1 = [r for r in rows if r.key == "u1"]
    assert {(r.total, r.n) for r in u1} >= {(7.0, 3)}, u1
    u2 = [r for r in rows if r.key == "u2"]
    assert (u2[-1].total, u2[-1].n, u2[-1].vmax) == (10.0, 1, 10.0)
    assert not any(r.closed for r in rows)


def test_funnel_stream_equals_batch(spark, tmp_path):
    """The streaming funnel's final per-user state must equal the q69
    batch fold exactly when the stream delivers events in time order —
    state carries across micro-batches (the fixture splits into 4
    time-ordered files), and the strict-after rule matches the batch
    contract."""
    from data_lake_project_spark.queries import QUERIES
    from data_lake_project_spark.streaming.stateful import funnel_stages
    from data_lake_project_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    src = str(tmp_path / "funnel_src")
    # 4 contiguous time slices -> 4 micro-batches in global ts order
    sliced = ev.withColumn(
        "__slice", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, 5):
        sliced.filter(F.col("__slice") == i).drop("__slice").coalesce(
            1
        ).write.mode("append" if i > 1 else "overwrite").parquet(f"{src}/s{i}")
    paths = [f"{src}/s{i}" for i in range(1, 5)]
    merged = str(tmp_path / "funnel_files")
    os.makedirs(merged)
    import glob as _glob
    import shutil as _shutil

    base = 1_700_000_000
    for i, p in enumerate(paths):
        for f in sorted(_glob.glob(f"{p}/part-*.parquet")):
            dst = os.path.join(merged, f"{i:02d}.parquet")
            _shutil.copy(f, dst)
            # the file source orders pickup by modification time; the
            # copies land within one clock tick, so pin distinct
            # ascending mtimes or batch order (and the test) is flaky
            os.utime(dst, (base + i, base + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
    )
    q = (
        funnel_stages(stream)
        .writeStream.format("memory")
        .queryName("mem_funnel")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    updates = spark.table("mem_funnel").collect()
    # funnel depth is monotone, so the snapshot per key is the MAX
    # stage across updates (robust to memory-sink row order)
    final: dict[str, int] = {}
    for r in updates:
        final[r.key] = max(final.get(r.key, 0), r.stage)
    stream_counts: dict[str, int] = {}
    labels = {0: "0_none", 1: "1_view", 2: "2_click", 3: "3_purchase"}
    for stage in final.values():
        lab = labels[stage]
        stream_counts[lab] = stream_counts.get(lab, 0) + 1
    batch_counts = {
        r.stage: r.n_users for r in QUERIES["q69_funnel"](spark, sf).collect()
    }
    assert stream_counts == batch_counts


def test_stream_scd2_equals_batch_and_skips_replay(spark, tmp_path):
    """Streaming SCD2 over 3 time-ordered micro-batches must converge
    to exactly the q67 batch history; re-running the stream with the
    same source but a FRESH checkpoint (worst-case full replay) must
    be a no-op thanks to the committed-batch markers."""
    from data_lake_project_spark.lakehouse import scd2_apply  # noqa: F401
    from data_lake_project_spark.queries import QUERIES
    from data_lake_project_spark.sources import KeyedTable
    from data_lake_project_spark.streaming.pipeline import write_stream_scd2
    from data_lake_project_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    src = str(tmp_path / "scd2_files")
    os.makedirs(src)
    sliced = ev.withColumn(
        "__slice", F.ntile(3).over(Window.orderBy("ts", "event_id"))
    )
    import glob as _glob

    base = 1_700_000_000
    for i in (1, 2, 3):
        part = str(tmp_path / f"s{i}")
        sliced.filter(F.col("__slice") == i).drop("__slice").coalesce(
            1
        ).write.mode("overwrite").parquet(part)
        for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
            dst = os.path.join(src, f"{i:02d}.parquet")
            shutil.copy(f, dst)
            os.utime(dst, (base + i, base + i))

    t = KeyedTable(
        spark,
        str(tmp_path / "scd2t"),
        key_col="__scd_key",
        bucket_by="user_id",
        n_buckets=8,
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_stream_scd2(stream, t, str(tmp_path / "ck1"))
    q.processAllAvailable()
    q.stop()

    def snapshot():
        return sorted(
            (r.user_id, r.version, r.event_type,
             str(r.valid_from)[:19], str(r.valid_to)[:19])
            for r in t.read().collect()
        )

    got = snapshot()
    want = sorted(
        (r.user_id, r.version, r.event_type,
         r.valid_from[:19], str(r.valid_to)[:19] if r.valid_to else "None")
        for r in QUERIES["q67_scd2"](spark, sf).collect()
    )
    got = [(u, v, a, f, to if to != "NaT" else "None") for u, v, a, f, to in got]
    assert got == want

    # full replay with a FRESH checkpoint: content-fingerprint markers
    # make it a no-op (batch ids restart at 0, so an id-keyed marker
    # would be wrong in BOTH directions)
    q2 = write_stream_scd2(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        t,
        str(tmp_path / "ck2"),
    )
    q2.processAllAvailable()
    q2.stop()
    assert snapshot() == [
        (u, v, a, f, to) for u, v, a, f, to in got
    ]

    # the data-loss scenario the fingerprint fixes: ANOTHER fresh
    # checkpoint with one NEW file appended — the new batch reuses
    # batch_id 0..3 but its content is new, so it MUST be applied
    import datetime as dt

    new_user = 999_999
    extra = spark.createDataFrame(
        [
            (10_000_001, dt.datetime(2024, 3, 1), new_user, "view", 1.0, "{}"),
            (10_000_002, dt.datetime(2024, 3, 2), new_user, "click", 1.0, "{}"),
        ],
        ev.schema,
    )
    part = str(tmp_path / "s_extra")
    extra.coalesce(1).write.mode("overwrite").parquet(part)
    for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
        dst = os.path.join(src, "04.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (base + 4, base + 4))
    q3 = write_stream_scd2(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        t,
        str(tmp_path / "ck3"),
    )
    q3.processAllAvailable()
    q3.stop()
    final = snapshot()
    assert len(final) == len(got) + 2  # view (closed) + click (open)
    new_rows = [r for r in final if r[0] == new_user]
    assert [(r[1], r[2]) for r in sorted(new_rows)] == [
        (1, "view"), (2, "click"),
    ]
    # and the pre-existing history is untouched
    assert [r for r in final if r[0] != new_user] == got


def test_events_fixture_stream_equals_batch(spark, tmp_path):
    """Equivalence on the REAL events fixture: tumbling agg over a
    parquet-file stream == the same agg on the batch read."""
    from data_lake_project_spark.tables import load_table

    # watermarks need TIMESTAMP (tz-aware); the loader yields NTZ —
    # cast is exact under the UTC session timezone
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    src = str(tmp_path / "ev_stream")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    aggs = [
        F.sum("value").alias("total"),
        F.count(F.lit(1)).alias("n"),
    ]
    batch = tumbling_agg(ev, "ts", "1 hour", aggs, keys=["user_id"])
    streamed = _run_to_memory(
        spark,
        tumbling_agg(stream, "ts", "1 hour", aggs, keys=["user_id"]),
        "mem_events_fixture",
    )

    def canon(df):
        return sorted(
            (r.win.start, r.win.end, r.user_id, round(r.total, 6), r.n)
            for r in df.collect()
        )

    assert canon(batch) == canon(streamed)
    assert len(canon(batch)) > 10


def test_stream_upsert_into_keyed_table(spark, tmp_path):
    """Reference pipeline shape (Kafka -> keyed Cassandra table):
    stream micro-batches MERGE into a KeyedTable. Later batches win
    per key, and a checkpoint-lost replay converges to the same state
    because MERGE is idempotent - no marker protocol needed."""
    from data_lake_project_spark.sources import KeyedTable
    from data_lake_project_spark.streaming.pipeline import (
        write_stream_upsert,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # two files -> two micro-batches; key 'k1' updated in the second
    os.makedirs(src)
    with open(src + "/f1.json", "w") as fh:
        fh.write('{"k": "k1", "v": 1}\n{"k": "k2", "v": 2}\n')
    with open(src + "/f2.json", "w") as fh:
        fh.write('{"k": "k1", "v": 10}\n{"k": "k3", "v": 3}\n')

    table = KeyedTable(spark, str(tmp_path / "kt"), key_col="k")
    stream = (
        spark.readStream.schema("k string, v int")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = write_stream_upsert(stream, table, ckpt)
    q.processAllAvailable()
    q.stop()
    out = {r.k: r.v for r in table.read().collect()}
    assert out["k2"] == 2 and out["k3"] == 3 and out["k1"] in (1, 10)

    # lost checkpoint -> full replay; keyed state must converge
    shutil.rmtree(ckpt)
    q = write_stream_upsert(
        (
            spark.readStream.schema("k string, v int")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        ),
        table,
        ckpt,
    )
    q.processAllAvailable()
    q.stop()
    out2 = {r.k: r.v for r in table.read().collect()}
    assert len(out2) == 3 and out2["k2"] == 2 and out2["k3"] == 3


def test_keyed_table_compact_buckets(spark, tmp_path):
    from data_lake_project_spark.sources import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "ktc"), key_col="k", n_buckets=4)
    for i in range(4):  # several upserts accrete files per bucket
        t.upsert(
            spark.createDataFrame(
                [(f"key{j}", i) for j in range(16)], "k string, v int"
            )
        )
    before = {r.k: r.v for r in t.read().collect()}
    t.compact()
    after = {r.k: r.v for r in t.read().collect()}
    assert before == after and len(after) == 16
    import pathlib

    for bdir in pathlib.Path(tmp_path / "ktc" / "buckets").iterdir():
        if bdir.is_dir():
            assert len(list(bdir.glob("*.parquet"))) == 1


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Two watermarked file streams joined on key + bounded time
    range produce exactly the batch range-join result (unified API);
    the range bound + watermark are what keep join state finite."""
    import datetime as dt

    from data_lake_project_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m)) for k, m in [(1, 60), (1, 120), (2, 30)]],
        "k long, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [
            (k, base + dt.timedelta(minutes=m), f"e{m}")
            for k, m in [(1, 10), (1, 59), (1, 119), (2, 29), (3, 5)]
        ],
        "k long, rts timestamp, tag string",
    )
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    # Single file per side: multi-file sources + a short watermark
    # would legitimately drop out-of-order rows as late (that's the
    # semantics); here we pin equivalence, so make arrival order
    # deterministic and the watermark generous.
    ldf.coalesce(1).write.parquet(lsrc)
    rdf.coalesce(1).write.parquet(rsrc)
    ls = spark.readStream.schema(ldf.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(lsrc)
    rs = spark.readStream.schema(rdf.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(rsrc)
    q = (
        stream_stream_interval_join(
            ls, rs, on="k", left_ts="lts", right_ts="rts",
            horizon="1 hour", watermark="1 day"
        )
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = sorted(tuple(r) for r in spark.table("ssj").collect())
    batch = sorted(
        tuple(r)
        for r in stream_stream_interval_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            horizon="1 hour", watermark="1 day"
        ).collect()
    )
    assert len(batch) == 4
    assert streamed == batch

def _scd2_file(spark, dirpath, name, rows, schema, mtime):
    """Write one micro-batch parquet file with a pinned mtime."""
    import glob as _glob

    part = dirpath + "__" + name
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(part)
    os.makedirs(dirpath, exist_ok=True)
    for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
        dst = os.path.join(dirpath, f"{name}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (mtime, mtime))


EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def test_scd2_marker_protocol_pending_detection_and_gc(spark, tmp_path):
    """Crash-window detection (round-3 advice): a marker left in
    'pending' state means a prior attempt crashed between MERGE and
    commit — the replayed batch must FAIL for operator repair, never
    silently re-fold. Marker GC prunes only aged committed markers,
    never pending ones."""
    import datetime as dt

    from data_lake_project_spark import fs
    from data_lake_project_spark.sources import KeyedTable
    from data_lake_project_spark.streaming.pipeline import (
        scd2_marker_gc,
        write_stream_scd2,
    )

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    _scd2_file(
        spark, src, "00",
        [(1, t0, 1, "view", 1.0, "{}"),
         (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}")],
        EV_SCHEMA, 1_700_000_000,
    )
    t = KeyedTable(
        spark, str(tmp_path / "t"), key_col="__scd_key",
        bucket_by="user_id", n_buckets=4,
    )
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = write_stream_scd2(stream(), t, str(tmp_path / "ck1"))
    q.processAllAvailable(); q.stop()

    def snapshot():
        return sorted(
            (r.user_id, r.version, r.event_type, str(r.valid_to))
            for r in t.read().collect()
        )

    base = snapshot()
    assert len(base) == 2
    markers = fs.list_statuses(spark, f"{t.path}/_scd2_committed")
    assert len(markers) == 1
    marker = markers[0][0]
    assert fs.read_text(spark, marker).strip() == "committed"

    # committed marker → full replay is a clean no-op
    q2 = write_stream_scd2(stream(), t, str(tmp_path / "ck2"))
    q2.processAllAvailable(); q2.stop()
    assert snapshot() == base

    # pending marker → replay fails loudly instead of re-folding
    fs.write_text(spark, marker, "pending")
    q3 = write_stream_scd2(stream(), t, str(tmp_path / "ck3"))
    with pytest.raises(Exception, match="pending"):
        q3.processAllAvailable()
    q3.stop()
    assert snapshot() == base  # table untouched by the failed replay

    # operator repair: verify + flip back → replays are no-ops again
    fs.write_text(spark, marker, "committed")
    q4 = write_stream_scd2(stream(), t, str(tmp_path / "ck4"))
    q4.processAllAvailable(); q4.stop()
    assert snapshot() == base

    # GC: a committed marker older than the replay horizon is pruned;
    # a pending marker is NEVER pruned regardless of age
    orphan = f"{t.path}/_scd2_committed/9_9_9_9"
    fs.write_text(spark, orphan, "pending")
    _, _, mt = fs.list_statuses(spark, f"{t.path}/_scd2_committed")[0]
    far_future = mt + 10 * 86400 * 1000
    assert scd2_marker_gc(spark, t.path, max_age_s=86400, now_ms=far_future) == 1
    left = [n for n, _, _ in fs.list_statuses(spark, f"{t.path}/_scd2_committed")]
    # list_statuses returns fully-qualified URIs — compare by suffix
    assert [n.split("/")[-1] for n in left] == ["9_9_9_9"]


def test_scd2_corrected_replay_fails_loudly_not_skipped(spark, tmp_path):
    """The fingerprint hashes the FULL event tuple (round-3 advice):
    a replay carrying the same event_ids with corrected payloads must
    NOT be silently swallowed by the marker — it reaches the fold and
    fails on the out-of-order guard (corrections need a rebuild)."""
    import datetime as dt

    from data_lake_project_spark.sources import KeyedTable
    from data_lake_project_spark.streaming.pipeline import write_stream_scd2

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    _scd2_file(
        spark, src, "00",
        [(1, t0, 1, "view", 1.0, "{}"),
         (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}")],
        EV_SCHEMA, 1_700_000_000,
    )
    t = KeyedTable(
        spark, str(tmp_path / "t"), key_col="__scd_key",
        bucket_by="user_id", n_buckets=4,
    )
    q = write_stream_scd2(
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src),
        t, str(tmp_path / "ck1"),
    )
    q.processAllAvailable(); q.stop()
    base = sorted(
        (r.user_id, r.version, r.event_type) for r in t.read().collect()
    )

    # "corrected" replay: same event_ids, different event_type payloads
    src2 = str(tmp_path / "src2")
    _scd2_file(
        spark, src2, "00",
        [(1, t0, 1, "scroll", 1.0, "{}"),
         (2, t0 + dt.timedelta(minutes=1), 1, "buy", 1.0, "{}")],
        EV_SCHEMA, 1_700_000_001,
    )
    q2 = write_stream_scd2(
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src2),
        t, str(tmp_path / "ck2"),
    )
    with pytest.raises(Exception, match="out-of-order"):
        q2.processAllAvailable()
    q2.stop()
    # history not corrupted by the rejected correction
    assert sorted(
        (r.user_id, r.version, r.event_type) for r in t.read().collect()
    ) == base


def test_funnel_shuffled_delivery_is_prefix_monotone(spark, tmp_path):
    """Out-of-order contract (round-3 advice): the funnel is a
    forward-only state machine — a prerequisite stage arriving in a
    LATER batch than a deeper stage it precedes in event time is
    recorded, but the deeper stage is NOT retro-applied. Null-ts/seq
    rows are dropped, not stream-poisoning."""
    import datetime as dt

    from data_lake_project_spark.streaming.stateful import funnel_stages

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    # delivery order: click(t2) | view(t1) + null-ts junk | purchase(t3)
    _scd2_file(spark, src, "00",
               [(2, t0 + dt.timedelta(minutes=2), 1, "click", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_000)
    _scd2_file(spark, src, "01",
               [(1, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
                (9, None, 1, "purchase", 1.0, "{}"),
                (None, t0 + dt.timedelta(minutes=9), 1, "purchase", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_001)
    _scd2_file(spark, src, "02",
               [(3, t0 + dt.timedelta(minutes=3), 1, "purchase", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_002)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        funnel_stages(stream)
        .writeStream.format("memory").queryName("mem_funnel_ooo")
        .outputMode("update").start()
    )
    q.processAllAvailable(); q.stop()
    final: dict[str, int] = {}
    for r in spark.table("mem_funnel_ooo").collect():
        final[r.key] = max(final.get(r.key, 0), r.stage)
    # click arrived before view was recorded → dropped (no retro-apply);
    # view then lands (stage 1); purchase at t3 needs click → still 1.
    # The two null rows were filtered, not crashes.
    assert final == {"1": 1}


def test_kafka_reader_options_contract():
    """Broker-less contract test (round-3 advice, mirroring the Delta
    fake): kafka_source must build exactly the reader options the
    reference pipeline needs (spark_stream.py:206-211) — subscribe,
    bootstrap servers, startingOffsets, failOnDataLoss."""
    from data_lake_project_spark.streaming.pipeline import (
        kafka_reader_options,
    )

    assert kafka_reader_options("broker:29092", "topic-1") == {
        "kafka.bootstrap.servers": "broker:29092",
        "subscribe": "topic-1",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    assert kafka_reader_options(
        "b:9092", "t", starting_offsets="latest", fail_on_data_loss=True
    ) == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "t",
        "startingOffsets": "latest",
        "failOnDataLoss": "true",
    }


def test_funnel_eventtime_shuffled_delivery_equals_batch(spark, tmp_path):
    """The event-time buffered funnel converges to the batch result
    under shuffled delivery WITHIN the lateness horizon — the exact
    scenario where the forward-only funnel (prefix-monotone, pinned
    above) stops at stage 1. Events buffer in state until the
    watermark passes them, then fold in (ts, seq) order."""
    import datetime as dt

    from data_lake_project_spark.streaming.stateful import (
        funnel_stages_eventtime,
    )

    t0 = dt.datetime(2024, 1, 1)
    far = t0 + dt.timedelta(days=1)
    src = str(tmp_path / "src")
    # delivery order: click(t2) | view(t1) | purchase(t3) | flush x2
    _scd2_file(spark, src, "00",
               [(2, t0 + dt.timedelta(minutes=2), 1, "click", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_000)
    _scd2_file(spark, src, "01",
               [(1, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_001)
    _scd2_file(spark, src, "02",
               [(3, t0 + dt.timedelta(minutes=3), 1, "purchase", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_002)
    # flush events: far-future stage events that advance the watermark
    # past t1..t3 (they themselves stay buffered, and a repeat 'view'
    # can never advance an already-open funnel)
    _scd2_file(spark, src, "03",
               [(90, far, 1, "view", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_003)
    _scd2_file(spark, src, "04",
               [(91, far + dt.timedelta(seconds=1), 1, "view", 1.0, "{}")],
               EV_SCHEMA, 1_700_000_004)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        funnel_stages_eventtime(stream, delay="10 minutes")
        .writeStream.format("memory").queryName("mem_funnel_et")
        .outputMode("update").start()
    )
    q.processAllAvailable(); q.stop()
    final: dict[str, int] = {}
    for r in spark.table("mem_funnel_et").collect():
        final[r.key] = max(final.get(r.key, 0), r.stage)
    # batch fold over (t1 view, t2 click, t3 purchase) reaches stage 3;
    # the forward-only funnel on this delivery order stops at 1
    assert final == {"1": 3}


def test_funnel_eventtime_shuffled_fixture_equals_batch(spark, tmp_path):
    """Fixture-scale equivalence under ADVERSARIAL delivery: the
    events table sliced by event_id % 4, slices delivered out of time
    order, lateness horizon covering the full span — the buffered
    funnel's final snapshot must equal the q69 batch fold exactly.
    Event-time timeouts flush every key's buffer once the watermark
    passes (no per-key flush traffic needed)."""
    import datetime as dt
    import glob as _glob

    from data_lake_project_spark.queries import QUERIES
    from data_lake_project_spark.streaming.stateful import (
        funnel_stages_eventtime,
    )
    from data_lake_project_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = 1_700_000_000
    # deliver slices in scrambled order: 2, 0, 3, 1
    for mt, sl in enumerate([2, 0, 3, 1]):
        part = str(tmp_path / f"s{sl}")
        ev.filter(F.col("event_id") % 4 == sl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
            dst = os.path.join(src, f"{mt:02d}.parquet")
            shutil.copy(f, dst)
            os.utime(dst, (base + mt, base + mt))
    # flush: one far-future event advances the global watermark past
    # every fixture event; its own key is excluded from the compare
    far = ev.agg(F.max("ts")).first()[0] + dt.timedelta(days=9000)
    spark.createDataFrame(
        [(99_999_999, far, 999_999, "view", 1.0, "{}")], ev.schema
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "sflush"))
    for f in sorted(_glob.glob(str(tmp_path / "sflush") + "/part-*.parquet")):
        dst = os.path.join(src, "99.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (base + 99, base + 99))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        funnel_stages_eventtime(stream, delay="4000 days")
        .writeStream.format("memory").queryName("mem_funnel_etfix")
        .outputMode("update").start()
    )
    q.processAllAvailable(); q.stop()
    final: dict[str, int] = {}
    for r in spark.table("mem_funnel_etfix").collect():
        final[r.key] = max(final.get(r.key, 0), r.stage)
    final.pop("999999", None)
    stream_counts: dict[str, int] = {}
    labels = {0: "0_none", 1: "1_view", 2: "2_click", 3: "3_purchase"}
    for stage in final.values():
        lab = labels[stage]
        stream_counts[lab] = stream_counts.get(lab, 0) + 1
    batch_counts = {
        r.stage: r.n_users for r in QUERIES["q69_funnel"](spark, sf).collect()
    }
    assert stream_counts == batch_counts


def test_ewma_stream_equals_batch(spark, tmp_path):
    """Streamed EWMA anomalies over time-ordered micro-batches must
    equal the q96 batch residual filter BIT-exactly: the stateful fold
    accumulates the weighted sum in the batch expression's order with
    power-of-two weights, so not even a rounding tolerance is needed."""
    from data_lake_project_spark.operators.timeseries import ewma_residual
    from data_lake_project_spark.streaming.stateful import ewma_anomalies
    from data_lake_project_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    src = str(tmp_path / "ewma_src")
    sliced = ev.withColumn(
        "__slice", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, 5):
        sliced.filter(F.col("__slice") == i).drop("__slice").coalesce(
            1
        ).write.mode("append" if i > 1 else "overwrite").parquet(f"{src}/s{i}")
    merged = str(tmp_path / "ewma_files")
    os.makedirs(merged)
    import glob as _glob
    import shutil as _shutil

    base = 1_700_000_000
    for i in range(4):
        for f in sorted(_glob.glob(f"{src}/s{i + 1}/part-*.parquet")):
            dst = os.path.join(merged, f"{i:02d}.parquet")
            _shutil.copy(f, dst)
            os.utime(dst, (base + i, base + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
    )
    q = (
        ewma_anomalies(stream, threshold=150.0)
        .writeStream.format("memory")
        .queryName("mem_ewma")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r.seq, r.value, r.ewma_prev)
        for r in spark.table("mem_ewma").collect()
    }
    batch = {
        (r.event_id, r.value, r.ewma_prev)
        for r in ewma_residual(ev)
        .filter(F.abs(F.col("resid")) > 150.0)
        .collect()
    }
    assert streamed == batch and batch


def test_stream_ivm_equals_recompute_and_skips_replay(spark, tmp_path):
    """Streaming continuous aggregate: a 3-micro-batch change log
    folded through write_stream_ivm must equal a from-scratch
    recompute of the net changes; a full replay with a fresh
    checkpoint must be a no-op (content markers); keys folded to
    zero disappear from read_ivm but persist as tombstones."""
    import glob as _glob

    from data_lake_project_spark.sources import KeyedTable
    from data_lake_project_spark.streaming.pipeline import (
        read_ivm,
        write_stream_ivm,
    )

    rows = [
        # batch 1: inserts
        (1, "a", 10.0, 1), (2, "a", 20.0, 1), (3, "b", 5.0, 1),
        # batch 2: more inserts + a delete
        (4, "a", 10.0, -1), (5, "c", 7.0, 1), (6, "b", 2.0, 1),
        # batch 3: b drains to zero (tombstone)
        (7, "b", 5.0, -1), (8, "b", 2.0, -1), (9, "c", 1.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "seq int, k string, v double, op int"
    ).coalesce(1)
    src = str(tmp_path / "ivm_files")
    os.makedirs(src)
    base = 1_700_000_000
    for i in (1, 2, 3):
        part = str(tmp_path / f"ivm_s{i}")
        df.filter(
            F.floor(((F.col("seq") - 1) % 9) / 3) == i - 1
        ).drop("seq").coalesce(1).write.mode("overwrite").parquet(part)
        for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
            dst = os.path.join(src, f"{i:02d}.parquet")
            shutil.copy(f, dst)
            os.utime(dst, (base + i, base + i))

    t = KeyedTable(spark, str(tmp_path / "ivmt"), key_col="k", n_buckets=4)
    schema = "k string, v double, op int"

    def run(ck):
        q = write_stream_ivm(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            t,
            str(tmp_path / ck),
            key_col="k",
            count_col="n",
            sum_cols={"v": "sv"},
        )
        q.processAllAvailable()
        q.stop()

    run("ck1")
    got = sorted(
        (r.k, r.n, str(r.sv)) for r in read_ivm(t, "n").collect()
    )
    assert got == [("a", 1, "20.00"), ("c", 2, "8.00")]
    # the drained key is a tombstone in storage, invisible in the view
    raw = {r.k: r.n for r in t.read().collect()}
    assert raw["b"] == 0
    # full replay with a fresh checkpoint: content markers no-op it
    run("ck2")
    assert sorted(
        (r.k, r.n, str(r.sv)) for r in read_ivm(t, "n").collect()
    ) == got


def test_stream_ivm_identical_content_distinct_batches_both_fold(
    spark, tmp_path
):
    """A change log's tuples can legitimately repeat: '+1 (a, 10.0)'
    arriving again in a LATER micro-batch is a real second increment,
    not a replay. The marker key includes the foreachBatch batch_id,
    so two distinct batches with byte-identical content must BOTH
    fold (the content-only fingerprint silently skipped the second
    one — external review finding, round 4)."""
    import glob as _glob

    from data_lake_project_spark.sources import KeyedTable
    from data_lake_project_spark.streaming.pipeline import (
        read_ivm,
        write_stream_ivm,
    )

    df = spark.createDataFrame(
        [("a", 10.0, 1), ("b", 3.0, 1)], "k string, v double, op int"
    ).coalesce(1)
    part = str(tmp_path / "ivm_dup_part")
    df.write.mode("overwrite").parquet(part)
    src = str(tmp_path / "ivm_dup_src")
    os.makedirs(src)
    base = 1_700_000_000
    # the SAME content file twice -> two distinct micro-batches
    for i, f in enumerate(
        sorted(_glob.glob(f"{part}/part-*.parquet")) * 2
    ):
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (base + i, base + i))
    t = KeyedTable(spark, str(tmp_path / "ivm_dup_t"), key_col="k")
    q = write_stream_ivm(
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        t,
        str(tmp_path / "ivm_dup_ck"),
        key_col="k",
        sum_cols={"v": "sv"},
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.k, r.n, str(r.sv)) for r in read_ivm(t, "n").collect()
    )
    assert got == [("a", 2, "20.00"), ("b", 2, "6.00")]


def test_stream_ivm_pending_marker_parks_the_stream(spark, tmp_path):
    """A 'pending' marker (crash between merge start and commit) must
    fail the replayed batch loudly instead of silently re-folding."""
    from data_lake_project_spark import fs
    from data_lake_project_spark.sources import KeyedTable
    from data_lake_project_spark.streaming.pipeline import write_stream_ivm

    df = spark.createDataFrame(
        [("a", 10.0, 1), ("b", 3.0, 1)], "k string, v double, op int"
    )
    src = str(tmp_path / "ivm_pend_src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    t = KeyedTable(spark, str(tmp_path / "ivm_pend_t"), key_col="k")
    # forge the exact content fingerprint the sink would compute,
    # marked pending, as if a prior attempt crashed mid-merge
    fp = df.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(`op`, `k`, `v`))").alias("h"),
    ).first()
    # marker key = batch_id + content fingerprint; a fresh checkpoint
    # reads this single-file source as batch 0
    marker = f"{t.path}/_ivm_committed/b0_{fp['n']}_{fp['h']}"
    fs.write_text(spark, marker, "pending")
    q = write_stream_ivm(
        spark.readStream.schema(df.schema).parquet(src),
        t,
        str(tmp_path / "ivm_pend_ck"),
        key_col="k",
        sum_cols={"v": "sv"},
    )
    with pytest.raises(Exception, match="pending"):
        q.processAllAvailable()
    q.stop()


def test_streaming_ingest_composes_persisted_dedup_and_ann_indexes(
    spark, tmp_path
):
    """The LLM-pipeline serving story end-to-end, streamed: each
    micro-batch of incoming docs is (1) gated against the PERSISTED
    dedup index, (2) survivors folded into it with the O(delta)
    dedup_index_apply — so a later batch duplicating an earlier
    batch's survivor is dropped, (3) survivors' embeddings searched
    against a PERSISTED (static) ANN index. The whole composed path
    must equal the batch twin run over the same micro-batches in the
    same order — including the final maintained index state."""
    import glob as _glob

    from data_lake_project_spark.operators.ann_index import (
        build_ann_index,
        load_ann_index,
        save_ann_index,
        search_ann_index,
    )
    from data_lake_project_spark.operators.dedup_index import (
        build_dedup_index,
        dedup_against_index,
        dedup_index_apply,
        load_dedup_index,
        save_dedup_index,
    )

    def emb(i):
        return [float((i * 7 + j * 3) % 13) for j in range(16)]

    # standing corpus: 10 docs with distinct texts + embeddings
    corpus_rows = [
        (i, f"standing doc number {i} about topic {i} in the lake", emb(i))
        for i in range(1, 11)
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, text string, embedding array<double>"
    )
    ann_path = str(tmp_path / "ann_idx")
    save_ann_index(
        build_ann_index(
            corpus.selectExpr("doc_id AS vec_id", "embedding"),
            kind="ivfpq",
            n_centroids=4,
            m_subspaces=4,
            n_codes=8,
            dim=16,
        ),
        ann_path,
    )

    # two micro-batches: 101 dups standing doc 1; 103 dups batch-1
    # survivor 102 (drop proves the cross-batch fold); 102/104 novel
    b1 = [
        (101, corpus_rows[0][1], emb(101)),
        (102, "a genuinely new document about spark physical plans", emb(102)),
    ]
    b2 = [
        (103, b1[1][1], emb(103)),
        (104, "another novel text on adaptive query execution", emb(104)),
    ]
    schema = "doc_id long, text string, embedding array<double>"

    def run_pipeline(tag, batches_via_stream):
        """Run the composed pipeline; returns (kept ids, ann rows,
        index snapshot). Same logic for stream and batch twins."""
        didx_path = str(tmp_path / f"dedup_idx_{tag}")
        save_dedup_index(
            build_dedup_index(corpus.select("doc_id", "text")), didx_path
        )
        kept_sink = str(tmp_path / f"kept_{tag}")
        ann_sink = str(tmp_path / f"annres_{tag}")

        def handle(batch_df, batch_id):
            s = batch_df.sparkSession
            idx = load_dedup_index(s, didx_path)
            kept = dedup_against_index(
                idx, batch_df.select("doc_id", "text"), threshold=0.5
            )
            kept_full = batch_df.join(kept.select("doc_id"), "doc_id")
            rows = kept_full.collect()  # test-sized; drives emptiness
            if not rows:
                return
            kept_docs = s.createDataFrame(rows, schema)
            dedup_index_apply(
                s, didx_path, kept_docs.select("doc_id", "text")
            )
            kept_docs.select("doc_id").write.mode("append").parquet(
                kept_sink
            )
            search_ann_index(
                load_ann_index(s, ann_path),
                kept_docs.selectExpr("doc_id AS probe_id", "embedding"),
                k=3,
            ).write.mode("append").parquet(ann_sink)

        if batches_via_stream:
            src = str(tmp_path / f"stream_src_{tag}")
            os.makedirs(src)
            base = 1_700_000_000
            for i, rows in enumerate((b1, b2)):
                part = str(tmp_path / f"stage_{tag}_{i}")
                spark.createDataFrame(rows, schema).coalesce(
                    1
                ).write.mode("overwrite").parquet(part)
                for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
                    dst = os.path.join(src, f"{i:02d}.parquet")
                    shutil.copy(f, dst)
                    os.utime(dst, (base + i, base + i))
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(handle)
                .option(
                    "checkpointLocation", str(tmp_path / f"ck_{tag}")
                )
                .start()
            )
            q.processAllAvailable()
            q.stop()
        else:
            for i, rows in enumerate((b1, b2)):
                handle(spark.createDataFrame(rows, schema), i)

        kept = sorted(
            r.doc_id for r in spark.read.parquet(kept_sink).collect()
        )
        ann = sorted(
            tuple(r) for r in spark.read.parquet(ann_sink).collect()
        )
        final = load_dedup_index(spark, didx_path)
        snap = (
            sorted(tuple(r) for r in final.bands.collect()),
            sorted((r[0], tuple(r[1])) for r in final.sets.collect()),
        )
        return kept, ann, snap

    streamed = run_pipeline("s", batches_via_stream=True)
    batched = run_pipeline("b", batches_via_stream=False)
    assert streamed == batched
    # the cross-batch fold did its job: 101 blocked by the standing
    # corpus, 103 blocked by batch-1 survivor 102
    assert streamed[0] == [102, 104]
    # every survivor got k=3 neighbors from the persisted ANN index
    assert len(streamed[1]) == 6


def test_streaming_embedding_ingest_folds_into_persisted_ann_index(
    spark, tmp_path
):
    """Growing-corpus serving loop, streamed: each micro-batch of new
    embeddings is FIRST searched against the persisted ANN index
    (serve-before-ingest — the dedupe/link step a pipeline runs on
    arrivals) and THEN folded in with the O(delta) ann_index_apply,
    so a later batch can retrieve an earlier batch's vectors. Search
    results and the final index must equal the batch twin run over
    the same micro-batches in order."""
    import glob as _glob

    from data_lake_project_spark.operators.ann_index import (
        ann_index_apply,
        build_ann_index,
        load_ann_index,
        save_ann_index,
        search_ann_index,
    )

    def emb(i):
        return [float((i * 5 + j * 7) % 11) for j in range(16)]

    base_rows = [(i, emb(i)) for i in range(20)]
    b1 = [(100, emb(100)), (101, emb(101))]
    b2 = [(102, emb(100)), (103, emb(103))]  # 102 duplicates 100's vector
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(base_rows, schema)

    def run(tag, via_stream):
        path = str(tmp_path / f"grow_ann_{tag}")
        save_ann_index(
            build_ann_index(
                corpus, kind="ivf", n_centroids=4, dim=16
            ),
            path,
        )
        hits_sink = str(tmp_path / f"hits_{tag}")

        def handle(batch_df, batch_id):
            s = batch_df.sparkSession
            rows = batch_df.collect()  # test-sized
            if not rows:
                return
            probes = s.createDataFrame(rows, schema).selectExpr(
                "vec_id AS probe_id", "embedding"
            )
            idx = load_ann_index(s, path)
            search_ann_index(idx, probes, k=3, nprobe=2).write.mode(
                "append"
            ).parquet(hits_sink)
            ann_index_apply(s, path, s.createDataFrame(rows, schema))

        if via_stream:
            src = str(tmp_path / f"grow_src_{tag}")
            os.makedirs(src)
            base = 1_700_000_000
            for i, rows in enumerate((b1, b2)):
                part = str(tmp_path / f"grow_stage_{tag}_{i}")
                spark.createDataFrame(rows, schema).coalesce(
                    1
                ).write.mode("overwrite").parquet(part)
                for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
                    dst = os.path.join(src, f"{i:02d}.parquet")
                    shutil.copy(f, dst)
                    os.utime(dst, (base + i, base + i))
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(handle)
                .option(
                    "checkpointLocation", str(tmp_path / f"gck_{tag}")
                )
                .start()
            )
            q.processAllAvailable()
            q.stop()
        else:
            for i, rows in enumerate((b1, b2)):
                handle(spark.createDataFrame(rows, schema), i)

        hits = sorted(
            tuple(r) for r in spark.read.parquet(hits_sink).collect()
        )
        final = sorted(
            r.vec_id
            for r in load_ann_index(spark, path).codes.select(
                "vec_id"
            ).collect()
        )
        return hits, final

    streamed = run("s", via_stream=True)
    batched = run("b", via_stream=False)
    assert streamed == batched
    # the fold did its job: batch-2's probe 102 (a copy of 100's
    # vector) retrieves batch-1's vector 100 from the grown index
    hit_pairs = {(r[0], r[1]) for r in streamed[0]}
    assert (102, 100) in hit_pairs
    # and the final index holds base + both batches
    assert streamed[1] == sorted(list(range(20)) + [100, 101, 102, 103])


def test_streaming_document_ingest_folds_into_persisted_bm25_index(
    spark, tmp_path
):
    """The lexical-lane twin of the streamed ANN fold test: each
    micro-batch of new documents is FIRST retrieved against the
    persisted BM25 index (serve-before-ingest) and THEN folded in with
    the O(delta) bm25_index_apply, so a later batch's query can hit an
    earlier batch's documents. Search results and the final index must
    equal the batch twin run over the same micro-batches in order —
    with this, all three index lanes (dedup q136, ANN q137, BM25 q150)
    have a streaming equivalence proof."""
    import glob as _glob

    from data_lake_project_spark.operators.retrieval import (
        bm25_index_apply,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
        search_bm25_index,
    )

    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [(i, f"base document number {i} about warehouses") for i in range(10)],
        schema,
    )
    b1 = [(100, "fresh report on supplier quality metrics")]
    b2 = [(101, "follow-up on supplier quality metrics and delays")]
    queries = spark.createDataFrame(
        [(1, "supplier quality metrics")], "query_id int, qtext string"
    )

    def run(tag, via_stream):
        path = str(tmp_path / f"bm25_grow_{tag}")
        save_bm25_index(build_bm25_index(corpus), path)
        hits_sink = str(tmp_path / f"bm25_hits_{tag}")

        def handle(batch_df, batch_id):
            s = batch_df.sparkSession
            rows = batch_df.collect()  # test-sized
            if not rows:
                return
            idx = load_bm25_index(s, path)
            search_bm25_index(idx, queries, k=5).write.mode(
                "append"
            ).parquet(hits_sink)
            bm25_index_apply(s, path, s.createDataFrame(rows, schema))

        if via_stream:
            src = str(tmp_path / f"bm25_src_{tag}")
            os.makedirs(src)
            base = 1_700_000_000
            for i, rows in enumerate((b1, b2)):
                part = str(tmp_path / f"bm25_stage_{tag}_{i}")
                spark.createDataFrame(rows, schema).coalesce(
                    1
                ).write.mode("overwrite").parquet(part)
                for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
                    dst = os.path.join(src, f"{i:02d}.parquet")
                    shutil.copy(f, dst)
                    os.utime(dst, (base + i, base + i))
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(handle)
                .option(
                    "checkpointLocation", str(tmp_path / f"bck_{tag}")
                )
                .start()
            )
            q.processAllAvailable()
            q.stop()
        else:
            for i, rows in enumerate((b1, b2)):
                handle(spark.createDataFrame(rows, schema), i)

        hits = sorted(
            tuple(r) for r in spark.read.parquet(hits_sink).collect()
        )
        final = sorted(
            r.doc_id
            for r in load_bm25_index(spark, path).dl.select(
                "doc_id"
            ).collect()
        )
        return hits, final

    streamed = run("s", via_stream=True)
    batched = run("b", via_stream=False)
    assert streamed == batched
    # batch 2's search (run BEFORE folding batch 2) must retrieve
    # batch 1's doc 100 from the grown index
    hit_docs = {r[1] for r in streamed[0]}
    assert 100 in hit_docs and 101 not in hit_docs
    # the final index holds base + both batches
    assert streamed[1] == sorted(list(range(10)) + [100, 101])


def test_streaming_events_fold_into_persisted_hll_rollup(spark, tmp_path):
    """Sketch-lane streaming equivalence (q151): each micro-batch is
    served against the standing HLL rollup (serve-before-ingest) and
    then folded in with the O(delta) parquet-append
    ``hll_rollup_apply``. Estimate sequences and the final rollup must
    equal the batch twin; a replayed fold and a compaction must both
    be estimate no-ops — the replay safety here comes from sketch
    ALGEBRA (union idempotence), not an anti-join guard. With this,
    all FOUR persisted lifecycles (dedup q136, ANN q137, BM25 q150,
    HLL q151) have streaming proofs."""
    import glob as _glob

    from data_lake_project_spark.operators.sketches import (
        build_hll_rollup,
        compact_hll_rollup,
        hll_rollup_apply,
        load_hll_rollup,
        query_hll_rollup,
        save_hll_rollup,
    )

    schema = "etype string, day string, user_id long"
    base = [("click", "d1", i) for i in range(20)] + [
        ("view", "d1", i) for i in range(5, 15)
    ]
    b1 = [("click", "d2", i) for i in range(10, 30)]
    b2 = [("view", "d2", i) for i in range(25, 40)]
    keys = ["etype", "day"]

    def estimates(rollup):
        return sorted(
            tuple(r) for r in query_hll_rollup(rollup, ["etype"]).collect()
        )

    def run(tag, via_stream):
        path = str(tmp_path / f"hll_grow_{tag}")
        save_hll_rollup(
            build_hll_rollup(
                spark.createDataFrame(base, schema), keys, "user_id"
            ),
            path,
        )
        served = []

        def handle(batch_df, batch_id):
            s = batch_df.sparkSession
            if not batch_df.take(1):
                return
            served.append(estimates(load_hll_rollup(s, path)))
            hll_rollup_apply(s, path, batch_df, keys, "user_id")

        if via_stream:
            src = str(tmp_path / f"hll_src_{tag}")
            os.makedirs(src)
            t0 = 1_700_000_000
            for i, rows in enumerate((b1, b2)):
                part = str(tmp_path / f"hll_stage_{tag}_{i}")
                spark.createDataFrame(rows, schema).coalesce(
                    1
                ).write.mode("overwrite").parquet(part)
                for f in sorted(_glob.glob(f"{part}/part-*.parquet")):
                    dst = os.path.join(src, f"{i:02d}.parquet")
                    shutil.copy(f, dst)
                    os.utime(dst, (t0 + i, t0 + i))
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(handle)
                .option(
                    "checkpointLocation", str(tmp_path / f"hck_{tag}")
                )
                .start()
            )
            q.processAllAvailable()
            q.stop()
        else:
            for i, rows in enumerate((b1, b2)):
                handle(spark.createDataFrame(rows, schema), i)

        return served, estimates(load_hll_rollup(spark, path)), path

    s_served, s_final, s_path = run("s", via_stream=True)
    b_served, b_final, _ = run("b", via_stream=False)
    assert s_served == b_served
    assert s_final == b_final

    # exact in the sparse regime: the folded rollup counts the true
    # distinct sets (click: 0..29 = 30; view: 5..14 ∪ 25..39 = 25)
    assert s_final == [("click", 30), ("view", 25)]

    # replayed fold: estimate no-op by union idempotence
    hll_rollup_apply(
        spark, s_path, spark.createDataFrame(b2, schema), keys, "user_id"
    )
    assert estimates(load_hll_rollup(spark, s_path)) == s_final

    # compaction folds the appended rows to one per key, estimates
    # unchanged, row count shrinks to the key count
    compact_hll_rollup(spark, s_path)
    r = load_hll_rollup(spark, s_path)
    assert estimates(r) == s_final
    assert r.count() == r.select(*keys).distinct().count()


def test_funnel_null_ts_key_still_reports(spark, tmp_path):
    """Round-10 advice: a user whose ONLY funnel-type events carry
    NULL ts must still emit a (key, 0) row — q69's batch fold counts
    that user as 0_none, so dropping the rows before grouping would
    silently shrink the stream's key universe. Null rows are dropped
    INSIDE the stateful fn (they cannot be ordered), the key
    survives."""
    from data_lake_project_spark.streaming.stateful import funnel_stages

    src = str(tmp_path / "null_ts_src")
    spark.createDataFrame(
        [
            ("u_null", None, 1, "view"),
            ("u_null", None, 2, "click"),
            ("u_ok", "2024-01-01 10:00:00", 3, "view"),
            ("u_ok", "2024-01-01 10:05:00", 4, "click"),
        ],
        "user_id string, ts string, event_id long, event_type string",
    ).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "event_type",
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        funnel_stages(stream)
        .writeStream.format("memory")
        .queryName("mem_funnel_null_ts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    final = {
        r.key: r.stage for r in spark.table("mem_funnel_null_ts").collect()
    }
    assert final == {"u_null": 0, "u_ok": 2}
