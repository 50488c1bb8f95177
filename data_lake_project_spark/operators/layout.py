"""Data-layout operators: space-filling-curve clustering keys.

A 100 TB table filtered on TWO dimensions (customer AND date, page
AND score band) prunes poorly when files are sorted on one of them:
min/max file statistics on the second column span everything. The
Z-order (Morton) key interleaves the bits of both dimensions so
rows close in Z are close in BOTH — range-partitioning (or sorting
files) by the Z-value gives every file a narrow min/max envelope on
each dimension, and ordinary parquet stats pruning then works for
either predicate. This is the layout trick behind Delta's OPTIMIZE
ZORDER BY, expressed as a plain deterministic column any writer can
``repartitionByRange``/``sortWithinPartitions`` on.

Pure integer bit arithmetic — engine-exact, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: x occupies even bit positions, y odd. 2*bits
    must fit a long (bits <= 31). Callers bucket/clip raw values into
    [0, 2^bits) first."""
    if not 1 <= bits <= 31:
        raise ValueError("zvalue: bits must be in [1, 31]")
    z: Column = F.lit(0).cast("long")
    xl = x.cast("long")
    yl = y.cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(xl, i).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * i))
            + F.shiftright(yl, i).bitwiseAND(F.lit(1))
            * F.lit(2 ** (2 * i + 1))
        )
    return z


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    file_shift: int = 22,
) -> DataFrame:
    """The pruning-envelope readout of a Z-order layout: assign each
    row its Z-value and the file it would land in (top bits of Z =
    range-partition bucket), then report per-file row counts and
    min/max envelopes on BOTH dimensions. Narrow envelopes on each
    axis are exactly what makes parquet stats pruning fire for
    either single-column predicate.

    Scale: the Z-value is a pure map; the stats roll-up is one
    partial-agg'd shuffle on the file id (one row per file out). The
    actual write path would ``repartitionByRange(zval)`` with the
    same key — the stats here ARE the min/max parquet footers that
    layout would produce.
    """
    z = zvalue(F.col(x_col), F.col(y_col), bits)
    return (
        df.select(
            F.col(x_col), F.col(y_col), z.alias("zval")
        )
        .withColumn("file_id", F.shiftright(F.col("zval"), file_shift))
        .groupBy("file_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )


def compaction_plan(
    files: DataFrame,
    part_col: str,
    id_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner (the metadata half of Delta's
    OPTIMIZE / Iceberg's rewrite_data_files): within each table
    partition, files under ``target_bytes`` are greedily packed — in
    deterministic id order — into output groups that close once their
    cumulative size reaches the target (next-fit bin packing via a
    window cumulative sum: group = floor(cum_size_before / target)).
    Files already >= target pass through untouched.

    Scale: the input is the FILE INVENTORY (one row per file — a
    metadata table millions of rows at 100 TB, not the data), the
    window is per-partition so packing parallelizes across partitions,
    and the output is one row per rewrite group — the job list a
    compactor executes. Greedy-by-id (not best-fit) is deliberate:
    it is single-pass, stable under appends (new files only ever
    extend the LAST group), and within 2x of optimal bin count.

    Output: (part, group_id, n_files, group_bytes, first_file,
    last_file) for rewrite groups, plus one row per kept-as-is file
    with group_id = -1, plus one row per NULL-size file with
    group_id = -2 (stats not yet collected — surfaced explicitly so
    the plan accounts for every inventory row; silently dropping them
    would let a compactor believe the inventory was fully covered).
    """
    from pyspark.sql import Window

    part = F.col(part_col)
    size = F.col(size_col).cast("long")
    small = files.filter(size < F.lit(target_bytes))
    big = files.filter(size >= F.lit(target_bytes))
    unknown = files.filter(size.isNull())

    w = Window.partitionBy(part).orderBy(F.col(id_col))
    cum_before = F.coalesce(
        F.sum(size).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    planned = small.withColumn(
        # explicit double division (exact for metadata-scale integer
        # operands) so the oracle's CAST-to-DOUBLE twin is bit-identical
        "group_id",
        F.floor(
            cum_before.cast("double") / F.lit(float(target_bytes))
        ).cast("long"),
    )
    groups = planned.groupBy(part.alias("part"), "group_id").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(size).cast("long").alias("group_bytes"),
        F.min(id_col).cast("long").alias("first_file"),
        F.max(id_col).cast("long").alias("last_file"),
    )
    kept = big.select(
        part.alias("part"),
        F.lit(-1).cast("long").alias("group_id"),
        F.lit(1).cast("long").alias("n_files"),
        size.alias("group_bytes"),
        F.col(id_col).cast("long").alias("first_file"),
        F.col(id_col).cast("long").alias("last_file"),
    )
    missing = unknown.select(
        part.alias("part"),
        F.lit(-2).cast("long").alias("group_id"),
        F.lit(1).cast("long").alias("n_files"),
        F.lit(None).cast("long").alias("group_bytes"),
        F.col(id_col).cast("long").alias("first_file"),
        F.col(id_col).cast("long").alias("last_file"),
    )
    return groups.unionByName(kept).unionByName(missing)


def write_zordered(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """The WRITE path for the Z-order layout q104 analyzes: range-
    partition rows on their Morton key and sort within partitions, so
    each output file's parquet footer carries a NARROW min/max
    envelope on BOTH dimensions — which is what makes ordinary
    row-group stats pruning fire for either single-column predicate
    on read. (``OPTIMIZE ZORDER BY``'s effect with plain parquet
    writers.) Callers bucket/clip raw values into [0, 2^bits) first,
    as with :func:`zvalue`.

    Scale: ``repartitionByRange`` samples the Z distribution (one
    skippable pass) and produces size-balanced files regardless of
    key skew; the sort is within-partition only.
    """
    z = zvalue(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
