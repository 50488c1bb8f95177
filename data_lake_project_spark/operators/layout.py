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
