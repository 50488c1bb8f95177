"""Spatial / interval theta-join with grid bucketing (J1).

Reference semantics: ``dags/get_data/tableExtract.py:171-197`` assigns
each OCR text box to a (row, col) table cell when
``IoU(cell, box) > 0.09`` — naively a cross join of cells x boxes with
a geometric predicate.

Scale design: a cross join is O(cells x boxes) and Spark would run it
as BroadcastNestedLoopJoin — fatal at 100 TB. Instead each box is
mapped to the set of grid buckets its bounding rectangle can touch
(``explode(sequence(...))`` over bucket ids in x and y), cells are
mapped to their bucket, and the join becomes an **equi-join on
(bucket_x, bucket_y)** followed by the exact geometric predicate —
shuffle-hash/sort-merge friendly, prunable, AQE-skew-splittable.
Candidate duplicates (a pair meeting in several buckets) are removed
by also requiring the pair to meet in the box's *first* shared
bucket, so no distinct/shuffle is needed afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RECT = ("x1", "y1", "x2", "y2")


def iou(a_prefix: str, b_prefix: str) -> Column:
    """Intersection-over-union of two rectangles given column prefixes.

    Mirrors the arithmetic of ``tableExtract.py:174-188``.
    """
    ax1, ay1, ax2, ay2 = [F.col(f"{a_prefix}{c}") for c in RECT]
    bx1, by1, bx2, by2 = [F.col(f"{b_prefix}{c}") for c in RECT]
    ix = F.greatest(
        F.least(ax2, bx2) - F.greatest(ax1, bx1), F.lit(0).cast("double")
    )
    iy = F.greatest(
        F.least(ay2, by2) - F.greatest(ay1, by1), F.lit(0).cast("double")
    )
    inter = ix * iy
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / (area_a + area_b - inter)


def _bucketed(df: DataFrame, prefix: str, bucket: float) -> DataFrame:
    """Explode each rectangle to every (bx, by) grid bucket it touches."""
    bx1 = F.floor(F.col(f"{prefix}x1") / bucket)
    bx2 = F.floor((F.col(f"{prefix}x2") - F.lit(1e-9)) / bucket)
    by1 = F.floor(F.col(f"{prefix}y1") / bucket)
    by2 = F.floor((F.col(f"{prefix}y2") - F.lit(1e-9)) / bucket)
    return (
        df.withColumn("__bx", F.explode(F.sequence(bx1, F.greatest(bx1, bx2))))
        .withColumn("__by", F.explode(F.sequence(by1, F.greatest(by1, by2))))
        .withColumn("__first_b", F.struct(F.col("__bx"), F.col("__by")))
    )


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    within_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose timestamps lie within ``within_s`` seconds of
    each other — |l - r| <= W — WITHOUT an inequality theta-join.

    Rewrite: both sides bin into width-W buckets on floor(epoch/W);
    the left side explodes into its 3 covering bins (|Δt| ≤ W implies
    the two bins differ by at most 1), and the join is a pure
    equi-join on the bin key with the exact predicate as a residual
    filter. Each qualifying pair meets in EXACTLY one bin (the right
    row's own bin), so no post-join dedup is needed. At scale the
    shuffle is keyed and bounded — candidate count is |left| x
    (right density per 3W window), never |left| x |right|.

    Column names must be disjoint across the two inputs (same
    contract as ``iou_join``), and ``__bin`` is RESERVED — it is the
    internal bucketing key, and an input already carrying it would be
    silently overwritten then dropped. Comparisons use floor-epoch
    seconds on both sides, matching the engine's timestamp->long cast
    semantics. Inner-join semantics (pairs only).
    """
    from data_lake_project_spark.functions import reserve_columns

    if how != "inner":
        raise ValueError(f"time_range_join supports inner, got {how!r}")
    for side, df in (("left", left), ("right", right)):
        reserve_columns(df, f"time_range_join ({side} input)", "__bin")
    w = int(within_s)
    if w < 1:
        raise ValueError(
            f"within_s must be >= 1 second (got {within_s!r}): the bin "
            "width equals the window, and a zero-width bin divides by "
            "zero at execution"
        )
    lsec = F.col(left_ts).cast("timestamp").cast("long")
    rsec = F.col(right_ts).cast("timestamp").cast("long")
    lb = left.withColumn(
        "__bin",
        F.explode(
            F.array(*[F.floor(lsec / w).cast("long") + d for d in (-1, 0, 1)])
        ),
    )
    rb = right.withColumn("__bin", F.floor(rsec / w).cast("long"))
    return lb.join(rb, "__bin").filter(F.abs(rsec - lsec) <= w).drop("__bin")


def iou_join(
    cells: DataFrame,
    boxes: DataFrame,
    bucket: float,
    min_iou: float = 0.09,
    cell_prefix: str = "c_",
    box_prefix: str = "b_",
) -> DataFrame:
    """Join cells x boxes on ``IoU > min_iou`` without a cross join.

    ``cells`` must carry ``{cell_prefix}{x1,y1,x2,y2}`` and ``boxes``
    ``{box_prefix}{x1,y1,x2,y2}``. ``bucket`` is the grid pitch —
    pick it near the median cell size so most rectangles land in
    O(1) buckets.
    """
    c = _bucketed(cells, cell_prefix, bucket)
    b = _bucketed(boxes, box_prefix, bucket).withColumnRenamed(
        "__first_b", "__first_b_box"
    )

    joined = c.join(b, on=["__bx", "__by"], how="inner").filter(
        iou(cell_prefix, box_prefix) > F.lit(min_iou)
    )

    # Deduplicate multi-bucket matches without a shuffle: keep the pair
    # only in the lexicographically-first bucket both rectangles share.
    mx1 = F.greatest(F.col(f"{cell_prefix}x1"), F.col(f"{box_prefix}x1"))
    my1 = F.greatest(F.col(f"{cell_prefix}y1"), F.col(f"{box_prefix}y1"))
    first_shared_x = F.floor(mx1 / F.lit(bucket))
    first_shared_y = F.floor(my1 / F.lit(bucket))
    joined = joined.filter(
        (F.col("__bx") == first_shared_x) & (F.col("__by") == first_shared_y)
    )
    return joined.drop("__bx", "__by", "__first_b", "__first_b_box")


def max_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Sweep-line max-overlap: for each time bucket that carries an
    interval boundary, the maximum number of intervals simultaneously
    open at any boundary event in that bucket — peak concurrent
    sessions / connections / jobs, the capacity-planning readout.

    Closed-interval semantics: at an identical timestamp, starts
    count before ends (delta ordered DESC), so touching intervals
    overlap. Among equal deltas at one timestamp the partial-sum
    multiset is order-invariant, so the per-bucket max is
    deterministic on any engine.

    Scale: the global prefix sum distributes with the same two-phase
    trick as the SNM rank (q98) — per-bucket running sums are an
    ordinary partitioned window (parallel), and the cross-bucket
    carry-in offsets come from ONE tiny window over per-bucket net
    sums (buckets, not rows). Buckets with no boundary events emit no
    row (an interval spanning a silent bucket keeps it at the
    carry-in level — readable from the previous row's output).
    """
    from data_lake_project_spark.functions import reserve_columns

    reserve_columns(
        intervals, "max_concurrency",
        "__t", "__delta", "__bkt", "__run", "__net", "__off",
    )
    s = F.col(start_col).cast("timestamp").cast("long")
    e = F.col(end_col).cast("timestamp").cast("long")
    deltas = intervals.select(
        s.alias("__t"), F.lit(1).alias("__delta")
    ).unionAll(intervals.select(e.alias("__t"), F.lit(-1).alias("__delta")))
    deltas = deltas.withColumn(
        "__bkt", F.floor(F.col("__t") / bucket_s).cast("long")
    )
    run_w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("__t"), F.col("__delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_bucket = deltas.withColumn("__run", F.sum("__delta").over(run_w))
    nets = deltas.groupBy("__bkt").agg(F.sum("__delta").alias("__net"))
    off_w = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = nets.select(
        "__bkt",
        F.coalesce(F.sum("__net").over(off_w), F.lit(0)).alias("__off"),
    )
    return (
        per_bucket.join(F.broadcast(offsets), "__bkt")
        .groupBy("__bkt")
        .agg(
            F.max(F.col("__off") + F.col("__run"))
            .cast("long")
            .alias("max_concurrent")
        )
        .select(F.col("__bkt").alias("bucket"), "max_concurrent")
    )
