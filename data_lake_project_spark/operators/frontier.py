"""Pareto-frontier (skyline) operator.

The multi-objective shortlist primitive: "every candidate for which no
other candidate is at-least-as-good on both axes and strictly better
on one" — supplier shortlists (cheapest-vs-fastest), doc-curation
trade-offs (quality-vs-length), config sweeps (cost-vs-throughput).
The reference has no skyline op; this extends the analytics surface
the way the sketch/window modules do (SURVEY.md §2 extensions).

Scale design (100 TB): a skyline is a total-order problem, but it
distributes with the classic two-phase recipe — a LOCAL skyline per
hash block first (any point dominated within a block is dominated
globally, so pruning is safe), then the GLOBAL pass over the tiny
union of block survivors. Phase 1 is an ordinary partitioned window
(parallel, range-sort per block); phase 2's single-partition window
only ever sees the survivor set, which for real distributions is
orders of magnitude smaller than the input (worst case — a perfectly
anti-correlated input where everything survives — is the inherent
output size of the operator, not a plan defect).

Dominance test inside a block is two running-max windows over the
integer-scaled minimize-axis ordering:

- ``w1`` = max(maximize-col) over rows STRICTLY cheaper (RANGE frame
  ending 1 before the current key) → dominated if ``w1 >= y``;
- ``w2`` = max(maximize-col) over rows cheaper-or-equal (RANGE to
  CURRENT ROW; the row's own y contributes y, never y-strictly-more)
  → dominated if ``w2 > y``.

Both engines agree exactly: the axes are compared as integers (the
minimize axis is pre-scaled to integer units by the caller), so there
is no float tie ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import reserve_columns

RESERVED = ("__blk", "__w1", "__w2")


def _dominated(min_key, max_col: str) -> F.Column:
    w_strict = (
        Window.partitionBy("__blk")
        .orderBy(min_key)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_incl = (
        Window.partitionBy("__blk")
        .orderBy(min_key)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col(max_col)
    # The strict frame is empty for a block's cheapest row: max() is
    # NULL there and NULL-ORed comparisons would silently drop the
    # row, so coalesce that leg to "not dominated".
    return F.coalesce(F.max(y).over(w_strict) >= y, F.lit(False)) | (
        F.max(y).over(w_incl) > y
    )


def skyline2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    n_blocks: int = 64,
    block_key: str | None = None,
) -> DataFrame:
    """Rows not dominated on (``minimize`` asc, ``maximize`` desc).

    ``minimize`` must be integer-valued (scale prices to cents first)
    so the RANGE frames and tie semantics are exact on every engine.
    ``block_key`` picks the phase-1 hash-block column (defaults to
    ``minimize``; any deterministic column works — blocking only
    affects parallelism, never the result).
    """
    reserve_columns(df, "skyline2d", *RESERVED)
    blk = F.pmod(F.xxhash64(F.col(block_key or minimize)), F.lit(n_blocks))
    local = (
        df.withColumn("__blk", blk)
        .withColumn("__dom", _dominated(F.col(minimize), maximize))
        .filter(~F.col("__dom"))
        .drop("__dom")
    )
    survivors = local.withColumn("__blk", F.lit(0))
    out = (
        survivors.withColumn("__dom", _dominated(F.col(minimize), maximize))
        .filter(~F.col("__dom"))
        .drop("__dom", "__blk")
    )
    return out
