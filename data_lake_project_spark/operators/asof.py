"""As-of join: for each left row, the latest right row at or before it.

Reference semantics (J2): ``dags/get_data/texteExtract.py:95-111``
associates each VALUE match with the nearest YEAR match at
non-negative distance. Generalized here to the classic time-series
as-of join (each order gets the latest event with ``ts <= order_ts``
for the same key).

Scale design: the naive formulation is a theta-join
(``l.ts >= r.ts``) which Spark can only execute as a broadcast
nested-loop or a sort-merge with range condition — both explode at
100 TB. Instead we use the **union + window** rewrite:

1. tag right rows (marker 0) and left rows (marker 1),
2. union on (key, ts, marker),
3. one window per key ordered by (ts, marker) carries the last seen
   right payload forward (``last(..., ignorenulls=True)``),
4. keep left rows.

Cost: ONE shuffle on the key (same as any grouped op), no row
explosion, and AQE handles key skew. This is the standard
merge-as-of pattern (same idea as pandas ``merge_asof``, expressed
relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    strict: bool = False,
    right_tiebreak: str | None = None,
    within=None,
) -> DataFrame:
    """Left as-of join.

    Every ``left`` row is returned, annotated with the ``right_values``
    columns from the latest ``right`` row where
    ``right[right_time] <= left[left_time]`` (``<`` when ``strict``)
    and ``right[on] == left[on]``; nulls when no such row exists.

    ``on`` is the equality key (e.g. user id); times may be any
    orderable type. ``right_tiebreak`` (a right column, e.g. a unique
    event id) makes the choice among equal-time right rows
    deterministic: the largest tiebreak wins.

    ``within`` (optional): ``(left_time_col, matched_right_time_col)
    -> BooleanColumn`` tolerance predicate — pandas ``merge_asof
    (tolerance=...)`` semantics. The as-of match is still the LATEST
    eligible right row; if that row falls outside the tolerance the
    annotation is nulled (an older row can only be further away, so
    no second lookup is needed). Evaluated per already-matched row —
    zero extra shuffles.
    """
    # Markers order ties: right-before-left for <=, left-before-right for <.
    right_marker, left_marker = (0, 1) if not strict else (1, 0)

    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(right_marker).alias("__m"),
        tb.alias("__tb"),
        F.struct(*[F.col(c) for c in right_values]).alias("__rv"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(left_marker).alias("__m"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__m", F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).withColumn(
        "__last_rv", F.last("__rv", ignorenulls=True).over(w)
    )
    rv = F.col("__last_rv")
    if within is not None:
        unioned = unioned.withColumn(
            "__last_t",
            F.last(
                F.when(F.col("__m") == right_marker, F.col("__t")),
                ignorenulls=True,
            ).over(w),
        )
        rv = F.when(
            F.col("__last_t").isNotNull()
            & within(F.col("__t"), F.col("__last_t")),
            F.col("__last_rv"),
        )

    out = unioned.filter(F.col("__m") == left_marker).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[rv.getField(c).alias(c) for c in right_values],
    )
    return out
