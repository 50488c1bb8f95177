"""Lakehouse table layout (SURVEY.md §7.1 M2): bronze/silver/gold
medallion zones, DDL-style table ensure, partitioned writes.

Reference analogs: ``setup_cassandra`` keyspace/table DDL
(``spark_stream/spark_stream.py:42-89``) becomes ``ensure_table``;
the /tmp-filesystem handoff between Airflow tasks
(``dags/GetData.py:140-168``) becomes typed zone tables that each
pipeline stage reads from and writes to.

Storage is plain parquet plus a tiny JSON manifest (no Delta jars in
this environment; with delta-spark on the cluster image, ``format``
flips to "delta" and ``ensure_table``/MERGE map onto native DDL —
the interface is the contract, SURVEY.md §7.1 M2).

Scale design:
- every table is hive-partitioned on declared columns, so partition
  pruning applies to any filter on them (`.explain` shows
  ``PartitionFilters``);
- writers use dynamic partition overwrite (only touched partitions
  rewritten), which is how a 100 TB table takes per-day updates
  without a full rewrite;
- zone paths are URI-agnostic (local, ``hdfs://``, ``s3a://``).
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from data_lake_project_spark import fs

ZONES = ("bronze", "silver", "gold")


class Lakehouse:
    """A rooted medallion layout: ``<root>/<zone>/<table>``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # only-touched-partitions overwrite semantics for partitioned
        # writes (the 100 TB-friendly default)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- layout ------------------------------------------------------------

    def path(self, zone: str, table: str) -> str:
        if zone not in ZONES:
            raise ValueError(f"unknown zone {zone!r}; expected one of {ZONES}")
        # posixpath, not os.path: table paths are URIs, never Windows
        # separators, and may carry a scheme.
        return posixpath.join(self.root, zone, table)

    def _manifest(self, zone: str, table: str) -> str:
        return posixpath.join(self.path(zone, table), "_table_manifest.json")

    # -- DDL (S4 analog) ---------------------------------------------------

    def ensure_table(
        self,
        zone: str,
        table: str,
        schema: StructType | str,
        partition_by: list[str] | None = None,
    ) -> None:
        """CREATE TABLE IF NOT EXISTS (``spark_stream.py:71-89``): a
        no-op when the table already exists, otherwise records schema +
        partitioning and writes an empty parquet skeleton so readers
        never race a first writer."""
        if self.exists(zone, table):
            return
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        empty = self.spark.createDataFrame([], schema)
        writer = empty.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(posixpath.join(self.path(zone, table), "data"))
        fs.write_text(
            self.spark,
            self._manifest(zone, table),
            json.dumps(
                {"schema": schema.json(), "partition_by": partition_by or []}
            ),
        )

    def exists(self, zone: str, table: str) -> bool:
        return fs.exists(self.spark, self._manifest(zone, table))

    def partitioning(self, zone: str, table: str) -> list[str]:
        return json.loads(fs.read_text(self.spark, self._manifest(zone, table)))[
            "partition_by"
        ]

    # -- I/O ---------------------------------------------------------------

    def read(self, zone: str, table: str) -> DataFrame:
        # schema comes from the manifest, not footer inference: stable
        # under empty tables (a partitioned empty write has no files)
        # and skips the file-listing schema merge on wide tables
        manifest = json.loads(fs.read_text(self.spark, self._manifest(zone, table)))
        schema = StructType.fromJson(json.loads(manifest["schema"]))
        return self.spark.read.schema(schema).parquet(
            posixpath.join(self.path(zone, table), "data")
        )

    def append(self, zone: str, table: str, df: DataFrame) -> None:
        """Blind append (bronze ingest): at-least-once callers should
        prefer ``upsert_partitions`` or the streaming module's
        idempotent sink."""
        writer = df.write.mode("append")
        parts = self.partitioning(zone, table)
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(posixpath.join(self.path(zone, table), "data"))

    def upsert_partitions(self, zone: str, table: str, df: DataFrame) -> None:
        """Idempotent partition-level upsert: rewrites ONLY the
        partitions present in ``df`` (dynamic partition overwrite).
        Re-running the same load is a no-op in effect — the scalable
        fix for the reference's duplicate-on-retry sink."""
        parts = self.partitioning(zone, table)
        if not parts:
            raise ValueError(
                "upsert_partitions requires a partitioned table; "
                "use KeyedTable.upsert for key-level MERGE"
            )
        df.write.mode("overwrite").partitionBy(*parts).parquet(
            posixpath.join(self.path(zone, table), "data")
        )

    # -- medallion flow ----------------------------------------------------

    def promote(
        self,
        src_zone: str,
        dst_zone: str,
        table: str,
        transform,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run ``transform(df)`` from one zone into the next (e.g.
        bronze→silver typed cast, silver→gold aggregate) and land the
        result. Returns the written DataFrame."""
        out = transform(self.read(src_zone, table))
        self.ensure_table(dst_zone, table, out.schema, partition_by)
        if partition_by:
            self.upsert_partitions(dst_zone, table, out)
        else:
            out.write.mode("overwrite").parquet(
                posixpath.join(self.path(dst_zone, table), "data")
            )
        return out


def with_ingest_metadata(df: DataFrame, source: str) -> DataFrame:
    """Bronze-layer lineage columns every ingest gets: source tag +
    load date (the partition column of choice for 100 TB bronze)."""
    return df.withColumn("_source", F.lit(source)).withColumn(
        "_load_date", F.current_date()
    )


class BucketedCatalog:
    """Bucketed tables for co-located (shuffle-free) joins.

    Spark bucketing pre-shuffles data at WRITE time: a table bucketed
    on its join key by the same bucket count as its join partner makes
    the join a zero-Exchange sort-merge — the single biggest shuffle
    saver for repeated fact⋈fact joins at 100 TB (pay the shuffle
    once at ingest, never per query). Requires a catalog table
    (``saveAsTable``), so this wraps a warehouse location.
    """

    def __init__(self, spark: SparkSession, database: str = "lake"):
        self.spark = spark
        self.database = database
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 16,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Materialize ``df`` bucketed (and optionally sorted) on the
        join key. Sorting within buckets additionally removes the Sort
        from sort-merge joins."""
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(f"{self.database}.{table}")

    def read(self, table: str) -> DataFrame:
        return self.spark.table(f"{self.database}.{table}")

    def drop(self, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.database}.{table}")


def compact(
    spark: SparkSession, path: str, target_files: int | None = None
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (default: sized by data volume at 128 MiB
    per file). Streaming sinks and frequent small appends accrete
    thousands of tiny files; at 100 TB the file-listing alone becomes
    the scan bottleneck. Returns the file count written.

    All filesystem steps go through the Hadoop FileSystem API (``fs``
    module), so the path may be ``hdfs://``/``s3a://`` — not only the
    driver's local disk. The swap protocol never has a moment with
    zero copies of the data on disk (round-1 ADVICE: the old
    rmtree-then-rename lost the table on a crash between the calls):

    1. write compacted copy to ``<path>__compact_tmp``;
    2. rename the live dir aside to ``<path>__compact_old``;
    3. rename tmp into place;
    4. delete the old dir.

    A crash between 2 and 3 leaves no live dir but BOTH complete
    copies on disk — recovery is renaming either back. (On S3, rename
    is copy+delete: correct but slow; the production fix is a table
    format whose manifest pointer flip replaces renames.)
    """
    df = spark.read.parquet(path)
    if target_files is None:
        total_bytes = fs.total_size(spark, path, ".parquet")
        target_files = max(1, total_bytes // (128 * 1024 * 1024))
    base = path.rstrip("/")
    tmp, old = base + "__compact_tmp", base + "__compact_old"
    df.coalesce(int(target_files)).write.mode("overwrite").parquet(tmp)
    fs.delete(spark, old)  # clear any debris from a prior crash
    if not fs.rename(spark, base, old):
        raise IOError(f"compact: could not move {base} aside")
    if not fs.rename(spark, tmp, base):
        # roll back so the table stays live
        fs.rename(spark, old, base)
        raise IOError(f"compact: could not move compacted data into {base}")
    fs.delete(spark, old)
    return int(target_files)


def scd2_apply(
    table,
    updates: DataFrame,
    entity_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> None:
    """Incrementally maintain an SCD2 (type-2 slowly-changing-
    dimension) history from a stream of attribute observations — the
    CDC merge writer every lakehouse dimension needs. Semantics match
    the q67 batch derivation exactly: a new version opens at every
    attribute CHANGE in (ts, seq) order, the previous version closes
    at the change timestamp, only the last version per entity is open
    (``test_scd2_apply_incremental_equals_batch`` pins incremental ==
    batch over split batches).

    ``table`` is a :class:`~data_lake_project_spark.sources.KeyedTable`
    whose MERGE key is the row key ``__scd_key`` (entity@version) and
    whose ``bucket_by`` is the ENTITY — one entity's whole history
    co-locates in one bucket, so each batch:

    1. bucket-prunes the current OPEN intervals of touched entities
       (``read_for`` — O(touched buckets), never a table scan);
    2. folds each entity's batch events against its open interval in
       one ``applyInPandas`` group (state = one open row);
    3. MERGEs the re-closed + newly-opened rows back (O(delta)).

    Contract: per-entity in-order delivery across batches (the same
    contract as any non-watermarked stateful op); within a batch any
    order is fine (the fold sorts). The contract is ENFORCED: a batch
    event whose ``ts`` precedes the entity's open interval's
    ``valid_from`` raises (failing the batch) instead of silently
    folding a corrupted history — the fold only carries the open row,
    so a late event can never be merged retroactively; replay the
    stream from a consistent offset instead. The guard is
    strict-``<`` by design: an event AT the open ``valid_from`` is
    accepted as a legitimate same-timestamp successor (two events in
    one second are ordered by seq within a batch, and the open row
    does not retain its seq to disambiguate across batches) — which
    also means a replayed/corrected batch whose earliest event sits
    exactly at ``valid_from`` folds as a new observation rather than
    raising.

    Output schema: (__scd_key, entity, attr, valid_from, valid_to,
    version) with valid_to NULL on the open interval.
    """
    import pandas as pd

    ents = updates.select(entity_col).distinct()
    existing = table.read_for(ents, keys_col=entity_col)
    if "__scd_key" in existing.columns:
        open_rows = (
            existing.filter(F.col("valid_to").isNull())
            .join(ents, entity_col, "left_semi")
            .select(
                F.col(entity_col),
                F.col(attr_col).alias("__open_attr"),
                F.col("valid_from").alias("__open_from"),
                F.col("version").alias("__open_ver"),
            )
        )
    else:  # first batch, table not created yet
        open_rows = (
            ents.withColumn("__open_attr", F.lit(None).cast("string"))
            .withColumn("__open_from", F.lit(None).cast("timestamp_ntz"))
            .withColumn("__open_ver", F.lit(None).cast("long"))
        )

    tagged = updates.select(entity_col, ts_col, seq_col, attr_col).join(
        open_rows, entity_col, "left"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, seq_col])
        ent = pdf[entity_col].iloc[0]
        cur_attr = pdf["__open_attr"].iloc[0]
        cur_from = pdf["__open_from"].iloc[0]
        cur_ver = pdf["__open_ver"].iloc[0]
        have = pd.notna(cur_ver)
        cur_ver = int(cur_ver) if have else 0
        if have and pd.notna(cur_from):
            first_ts = pdf[ts_col].iloc[0]  # pdf is (ts, seq)-sorted
            if pd.notna(first_ts) and first_ts < cur_from:
                raise ValueError(
                    f"scd2_apply: out-of-order batch for entity {ent!r}:"
                    f" event ts {first_ts} precedes the open interval's"
                    f" valid_from {cur_from}. Per-entity in-order"
                    " delivery across batches is required — the fold"
                    " only carries the open row, so folding this batch"
                    " would silently corrupt the history. Replay from a"
                    " consistent offset instead."
                )
        out: list[tuple] = []
        for row in pdf.itertuples(index=False):
            ts = getattr(row, ts_col)
            attr = getattr(row, attr_col)
            if cur_ver == 0:
                cur_ver, cur_attr, cur_from = 1, attr, ts
            elif attr != cur_attr:
                out.append((ent, cur_attr, cur_from, ts, cur_ver))
                cur_ver, cur_attr, cur_from = cur_ver + 1, attr, ts
        out.append((ent, cur_attr, cur_from, pd.NaT, cur_ver))
        res = pd.DataFrame(
            out,
            columns=[entity_col, attr_col, "valid_from", "valid_to", "version"],
        )
        res.insert(
            0,
            "__scd_key",
            res[entity_col].astype(str) + "@" + res["version"].astype(str),
        )
        return res

    # entity/attr/ts types follow the UPDATE frame's schema — the
    # history table works for string entities, timestamp or long
    # event-time columns, etc., not just the events fixture's shapes
    types = dict(updates.dtypes)
    schema = (
        "__scd_key string, "
        f"{entity_col} {types[entity_col]}, {attr_col} {types[attr_col]}, "
        f"valid_from {types[ts_col]}, valid_to {types[ts_col]}, version long"
    )
    # Eager materialization: upsert evaluates its input TWICE (the
    # touched-bucket collect, then the write); without this the
    # Python fold + open-interval read + join would re-run per pass.
    delta = (
        tagged.groupBy(entity_col)
        .applyInPandas(fold, schema=schema)
        .localCheckpoint(eager=True)
    )
    table.upsert(delta)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Audit diff between two snapshots of a keyed table: one row per
    key present in either side, classified ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` — the reconciliation pass of an
    incremental pipeline (does replaying the CDC stream reproduce the
    batch table?) and the blast-radius report before a MERGE.

    ``compare_cols`` defaults to every shared non-key column; a
    ``changed`` verdict means at least one compared column differs
    under null-safe equality (NULL == NULL holds, NULL != value
    flags).

    Plan shape (100 TB): ONE full outer join shuffled on the key —
    the minimal movement for a keyed diff (each side shuffles once,
    co-partitioned merge). The verdict is a narrow projection; no
    second pass, no driver-side state. Callers wanting only the
    changes filter ``change_type != 'unchanged'`` — Catalyst pushes
    that into the join's output before anything materializes.
    """
    for c in key_cols:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"snapshot_diff: key column {c!r} missing")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    for c in compare_cols:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"snapshot_diff: compare column {c!r} missing")

    o = old.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    verdict = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *key_cols, verdict.alias("change_type")
    )


def cdc_apply(
    log: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    deletes: tuple[str, ...] = ("D",),
) -> DataFrame:
    """Materialize the CURRENT snapshot from a CDC change log — the
    merge-on-read collapse Delta/Hudi/Iceberg run at query time:
    keep, per key, only the latest change (by ``order_cols``, which
    must be a total order within a key — include a sequence column
    to break timestamp ties), and drop the key entirely when that
    latest change is a delete.

    The complement of ``scd2_apply``: SCD2 keeps the full interval
    history, ``cdc_apply`` answers "what does the table look like
    NOW" from the same log. Unlike the SCD2 fold it needs no ordering
    contract across batches — the window sees the whole log, so late
    events land correctly wherever they sort.

    Scale (100 TB of log): ONE keyed shuffle (window on the key,
    sort by the order columns within each key partition) + a narrow
    filter — the canonical distributed argmax. At real scale the log
    is time-partitioned and the window reads only the key's partition
    slice; no driver-side state, no iteration.
    """
    from data_lake_project_spark.functions import reserve_columns

    reserve_columns(log, "cdc_apply", "__rn")
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(~F.col(op_col).isin(*deletes))
        .drop("__rn", op_col)
    )


def ivm_apply(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
    op_col: str = "op",
    keep_zero: bool = False,
) -> DataFrame:
    """Incremental view maintenance for a keyed COUNT/SUM aggregate:
    fold a batch of row-level changes (``op_col`` = +1 insert, -1
    delete) into an existing materialized aggregate WITHOUT touching
    the base data — the O(delta) maintenance step that keeps a gold
    rollup fresh at 100 TB where recompute is a full scan.

    ``base`` holds (key_cols..., count_col, <agg per sum_cols value>)
    — e.g. the output of a previous ``ivm_apply`` or the initial
    groupBy. ``sum_cols`` maps source value columns in ``delta`` to
    their aggregate column names in ``base``; sums are maintained as
    DECIMAL so +x followed by -x restores the exact prior state (a
    float fold would drift and never re-converge). Keys whose count
    reaches zero are DROPPED (not kept as zero rows), matching what a
    recompute would produce — unless ``keep_zero`` is set, which
    keeps them as tombstones for keyed-MERGE storage that cannot
    delete rows (``write_stream_ivm``); a negative count raises at
    read time in
    the caller's integrity checks rather than silently going wrong —
    deletes of never-inserted rows are a data bug upstream.

    Plan: ONE vocabulary-sized partial-agg of the delta + ONE
    full-outer equi-join on the key — the aggregate table never
    rescans its history and the delta never joins the base data.
    """
    sum_cols = sum_cols or {}
    sgn = F.col(op_col).cast("long")
    aggs = [F.sum(sgn).cast("long").alias("__dn")]
    for src, out in sum_cols.items():
        aggs.append(
            F.sum(sgn.cast("decimal(20,2)") * F.col(src).cast("decimal(20,2)"))
            .cast("decimal(38,2)")
            .alias(f"__d_{out}")
        )
    d = delta.groupBy(*key_cols).agg(*aggs)
    merged = base.join(d, key_cols, "full_outer")
    new_n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("__dn"), F.lit(0)
    )
    out_cols = [F.col(c) for c in key_cols] + [
        new_n.cast("long").alias(count_col)
    ]
    for out in sum_cols.values():
        out_cols.append(
            (
                F.coalesce(
                    F.col(out), F.lit(0).cast("decimal(38,2)")
                )
                + F.coalesce(
                    F.col(f"__d_{out}"), F.lit(0).cast("decimal(38,2)")
                )
            )
            .cast("decimal(38,2)")
            .alias(out)
        )
    out = merged.select(*out_cols)
    if keep_zero:
        # tombstone mode for keyed-MERGE storage (no row deletes):
        # zero-count rows persist and the reader filters them out
        return out
    return out.filter(F.col(count_col) != 0)
