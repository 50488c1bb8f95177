"""Per-entity time-series operators (EWMA smoothing / anomaly flags).

Extends the event-analytics surface (sessionize q43, funnel q69,
retention q70, resample q78) with the smoothing-and-residual pass a
metrics pipeline runs before alerting: an exponentially weighted
moving average per key and the deviation of each new observation from
it. The reference has no time-series op; this is a SURVEY.md §2
extension in the same spirit as the window/sketch modules.

Engine-exactness: the EWMA here is the FINITE-window form — the K
most recent prior observations, weighted ``alpha^j`` — built from K
explicit ``lag`` columns combined in one fixed-shape expression tree.
With ``alpha`` a power of two the weight products are exact binary
scalings and the left-to-right sum is the same IEEE op sequence on
any engine, so results are bit-identical (no rounding tolerance
needed, unlike a recursive EWMA whose fold order is engine-defined).

Scale (100 TB): one keyed shuffle (partition by entity, sort by
time) serves all K lags and the residual — the same single-window
shape as q12/q13. K is a constant; state per row is K doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import reserve_columns


def ewma_residual(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    k: int = 8,
    alpha: float = 0.5,
) -> DataFrame:
    """Append ``ewma_prev`` (finite-window EWMA of the K prior values)
    and ``resid`` (value - ewma_prev) per row.

    ``seq_col`` breaks timestamp ties so the lag order is total.
    Rows with zero prior observations get NULL ewma/resid. ``alpha``
    should be a power of two for cross-engine bit-exactness.
    """
    reserve_columns(df, "ewma_residual", "ewma_prev", "resid")
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    lags: list[Column] = [
        F.lag(value_col, j + 1).over(w) for j in range(k)
    ]
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for j, lg in enumerate(lags):
        wt = alpha**j
        num = num + F.coalesce(lg, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    ewma = num / F.nullif(den, F.lit(0.0))
    return df.withColumn("ewma_prev", ewma).withColumn(
        "resid", F.col(value_col) - F.col("ewma_prev")
    )
