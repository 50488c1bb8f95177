"""Distribution-drift detection between two corpus snapshots.

The monitoring pass a training-data pipeline runs when a new crawl /
ingest lands: did the SOURCE MIX shift (categorical drift — chi-square
over category counts) and did a NUMERIC FEATURE shift (KS statistic
over its empirical CDFs)? Both are exact-arithmetic relational
computations here — integer counts, fixed-order ratio expressions —
so the drift scores are engine-exact and oracle-checkable, unlike
sampled/sketched drift monitors.

Scale:
- chi-square: two vocabulary-sized groupBys + a full-outer join on
  the category key + a broadcast 1-row totals scalar. Nothing
  data-sized shuffles twice.
- KS: counts collapse per DISTINCT value first (vocabulary-sized,
  partial-agg'd), then the global running CDFs use the two-phase
  prefix trick (per-value-block windows + a tiny carry-in offset
  table over block aggregates — same recipe as ``max_concurrency``
  and the SNM rank), never a single-partition sort of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import pround, reserve_columns


def categorical_drift(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    digits: int = 6,
) -> DataFrame:
    """Two-sample chi-square drift per category: with pooled share
    ``p = (o + n) / (T_o + T_n)``, each category contributes
    ``(o - p*T_o)^2 / (p*T_o) + (n - p*T_n)^2 / (p*T_n)``. Large
    contributions localize WHERE the mix moved; the summed statistic
    is the usual homogeneity test value.

    Output: (key, n_old, n_new, share_old, share_new, chi2) —
    categories absent from one side count 0 there (the strongest
    drift signal there is).
    """
    for side, df in (("old", old), ("new", new)):
        reserve_columns(
            df, f"categorical_drift ({side} input)",
            "n_old", "n_new", "share_old", "share_new", "chi2",
            "__to", "__tn",
        )
    o = old.groupBy(key_col).agg(F.count("*").cast("long").alias("n_old"))
    n = new.groupBy(key_col).agg(F.count("*").cast("long").alias("n_new"))
    joined = (
        o.join(n, key_col, "full_outer")
        .na.fill({"n_old": 0, "n_new": 0})
    )
    totals = joined.agg(
        F.sum("n_old").cast("long").alias("__to"),
        F.sum("n_new").cast("long").alias("__tn"),
    )
    j = joined.crossJoin(F.broadcast(totals))
    p = (F.col("n_old") + F.col("n_new")) / (F.col("__to") + F.col("__tn"))
    eo = p * F.col("__to")
    en = p * F.col("__tn")
    chi2 = (F.col("n_old") - eo) * (F.col("n_old") - eo) / eo + (
        F.col("n_new") - en
    ) * (F.col("n_new") - en) / en
    return j.select(
        key_col,
        "n_old",
        "n_new",
        pround(F.col("n_old") / F.col("__to"), digits).alias("share_old"),
        pround(F.col("n_new") / F.col("__tn"), digits).alias("share_new"),
        pround(chi2, digits).alias("chi2"),
    )


def ks_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    block_width: float = 1.0,
    digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic:
    ``max over distinct values v of |F_old(v) - F_new(v)|`` with the
    CDFs evaluated AFTER all ties at ``v`` on both sides (the exact
    two-sample KS convention).

    Returns one row: (n_old, n_new, ks_stat).

    ``block_width`` sets the value-range granularity of the
    distributed prefix blocks; it affects parallelism only, never the
    statistic.
    """
    for side, df in (("old", old), ("new", new)):
        reserve_columns(
            df, f"ks_drift ({side} input)",
            "__v", "__o", "__n", "__blk", "__co", "__cn",
        )
    tagged = old.select(
        F.col(value_col).cast("double").alias("__v"),
        F.lit(1).alias("__o"),
        F.lit(0).alias("__n"),
    ).unionAll(
        new.select(
            F.col(value_col).cast("double").alias("__v"),
            F.lit(0).alias("__o"),
            F.lit(1).alias("__n"),
        )
    )
    per_val = tagged.groupBy("__v").agg(
        F.sum("__o").alias("__o"), F.sum("__n").alias("__n")
    )
    per_val = per_val.withColumn(
        "__blk", F.floor(F.col("__v") / block_width).cast("long")
    )
    run_w = (
        Window.partitionBy("__blk")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = per_val.select(
        "__blk",
        "__v",
        F.sum("__o").over(run_w).alias("__co"),
        F.sum("__n").over(run_w).alias("__cn"),
    )
    nets = per_val.groupBy("__blk").agg(
        F.sum("__o").alias("__o"), F.sum("__n").alias("__n")
    )
    off_w = Window.orderBy("__blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = nets.select(
        "__blk",
        F.coalesce(F.sum("__o").over(off_w), F.lit(0)).alias("__oo"),
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__on"),
    )
    totals = per_val.agg(
        F.sum("__o").cast("long").alias("n_old"),
        F.sum("__n").cast("long").alias("n_new"),
    )
    return (
        runs.join(F.broadcast(offsets), "__blk")
        .crossJoin(F.broadcast(totals))
        .select(
            "n_old",
            "n_new",
            F.abs(
                (F.col("__oo") + F.col("__co")) / F.col("n_old")
                - (F.col("__on") + F.col("__cn")) / F.col("n_new")
            ).alias("__d"),
        )
        .groupBy("n_old", "n_new")
        .agg(pround(F.max("__d"), digits).alias("ks_stat"))
    )
