"""Planar spatial joins via grid blocking.

The geo/embedding-2D companion to the interval family
(``operators.interval``): points bucket into square grid cells sized
by the search radius, one side probes its 3x3 cell neighborhood, and
an equi-join on the cell key replaces the all-pairs distance scan —
the same bucket-then-verify recipe as ``iou_join``/``time_range_join``
lifted to two dimensions. (For lat/lon at city scale, project to
planar meters first; the blocking is distance-metric-agnostic as long
as the cell size bounds the radius.)

Scale: the candidate set is |left| x (density of right within 9
cells) — linear in the data for bounded density, never |L| x |R|.
Skewed hotspots (one cell holding millions of points) are the salting
candidates, same knob as ``skew.salted_join``. Distance filtering
compares squared distances (IEEE mul/add are correctly rounded), so
the predicate is engine-exact with no sqrt in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_project_spark.functions import reserve_columns


def radius_join(
    left: DataFrame,
    right: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    radius: float = 1.0,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All (left, right) pairs within Euclidean ``radius``: cell =
    (floor(x/r), floor(y/r)); LEFT probes its 9 neighboring cells
    (a bounded literal explode), RIGHT keys by its one home cell, the
    join is a plain equi-join on the cell pair, and the exact
    squared-distance predicate prunes the corner candidates. Each
    qualifying pair appears exactly once (the right point lives in
    one cell; the left point probes 9 DISTINCT cells).

    Column names collide via ``suffixes`` (both sides keep all their
    columns). Rows with NULL coordinates never match.
    """
    if radius <= 0:
        raise ValueError("radius_join: radius must be > 0")
    for side, df in (("left", left), ("right", right)):
        reserve_columns(
            df, f"radius_join ({side} input)", "__cx", "__cy", "__d"
        )
    r = float(radius)
    lx, ly = F.col(x_col), F.col(y_col)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    l_named = left.select(
        *[F.col(c).alias(c + suffixes[0]) for c in left.columns],
        F.explode(offsets).alias("__o"),
        F.floor(lx / r).alias("__cx0"),
        F.floor(ly / r).alias("__cy0"),
    ).select(
        *[F.col(c + suffixes[0]) for c in left.columns],
        (F.col("__cx0") + F.col("__o.dx")).alias("__cx"),
        (F.col("__cy0") + F.col("__o.dy")).alias("__cy"),
    )
    r_named = right.select(
        *[F.col(c).alias(c + suffixes[1]) for c in right.columns],
        F.floor(F.col(x_col) / r).alias("__cx"),
        F.floor(F.col(y_col) / r).alias("__cy"),
    )
    ax, ay = F.col(x_col + suffixes[0]), F.col(y_col + suffixes[0])
    bx, by = F.col(x_col + suffixes[1]), F.col(y_col + suffixes[1])
    dx, dy = ax - bx, ay - by
    return (
        l_named.join(r_named, ["__cx", "__cy"])
        .filter(dx * dx + dy * dy <= F.lit(r * r))
        .drop("__cx", "__cy")
    )
