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

from data_lake_project_spark.functions import pround, reserve_columns


def ewma_residual(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    k: int = 8,
    alpha: float = 0.5,
) -> DataFrame:
    """Append ``ewma_prev`` (finite-window EWMA of the K prior
    NON-NULL values) and ``resid`` (value - ewma_prev) per row.

    ``seq_col`` breaks timestamp ties so the lag order is total.
    Rows with zero prior observations get NULL ewma/resid. NULL
    ``value_col`` rows are passed through with NULL ewma/resid and do
    NOT occupy lag slots — the same skip rule as the streaming twin
    ``streaming.stateful.ewma_anomalies`` (which filters NULL values
    before its ring-buffer fold), so the bit-identical equivalence
    claim holds on null-bearing streams too. ``alpha`` should be a
    power of two for cross-engine bit-exactness.

    .. versionchanged:: round 5
       Previously a NULL-value row OCCUPIED a lag slot (its slot
       contributed nothing but shifted later lags) and output rows
       came out in the window's order. Now NULL rows are skipped
       entirely (stream-twin parity) and the output is the unordered
       union of scored + passthrough rows — order it explicitly.
       Consumers of ``ewma_prev``/``resid`` on null-bearing series get
       different (more useful) values than pre-round-5 callers did.
    """
    reserve_columns(df, "ewma_residual", "ewma_prev", "resid")
    # lag over the null-filtered projection: a NULL value must not
    # shift its successors' lag positions (stream-twin symmetry)
    dense = df.filter(F.col(value_col).isNotNull())
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
    scored = dense.withColumn("ewma_prev", ewma).withColumn(
        "resid", F.col(value_col) - F.col("ewma_prev")
    )
    skipped = (
        df.filter(F.col(value_col).isNull())
        .withColumn("ewma_prev", F.lit(None).cast("double"))
        .withColumn("resid", F.lit(None).cast("double"))
    )
    return scored.unionByName(skipped)


def forward_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    out_col: str = "filled",
) -> DataFrame:
    """Append LOCF (last-observation-carried-forward) gap fill: the
    most recent non-null ``value_col`` at or before each row within
    its entity, NULL until the first observation. The standard
    sparse-to-dense repair for sensor/metric series before windowed
    math.

    One keyed shuffle (partition by entity, sort by time) — the same
    single-window shape as ``ewma_residual``; ``last(..., ignorenulls)``
    over the unbounded-preceding frame is a running O(1)-state scan,
    never a self-join against earlier rows.
    """
    reserve_columns(df, "forward_fill", out_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col, F.last(value_col, ignorenulls=True).over(w)
    )


def autocorrelation(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    max_lag: int = 3,
    scale: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Per-entity sample autocorrelation r_k for k = 1..``max_lag``:

        r_k = sum_t (x_t - m)(x_{t-k} - m) / sum_t (x_t - m)^2

    with ``m`` the entity mean — the seasonality / memory readout of
    a metric series. Everything that depends on accumulation ORDER is
    summed as exact decimals (``scale`` = input decimal places), so
    the statistic is engine-exact: expanding the numerator to
    ``sxy - m*(sa + sb) + n_k*m^2`` leaves only correctly-rounded
    double ops on exact sums. Output: (key, lag, n_pairs, r).

    Scale: ONE keyed window pass materializes all ``max_lag`` lag
    columns (same shuffle as ewma), then one partial-agg'd groupBy
    per entity carries 3 decimals per lag — no self-joins, state per
    row is max_lag values.
    """
    reserve_columns(
        df, "autocorrelation", "lag", "n_pairs", "r",
        *[f"__l{k}" for k in range(1, max_lag + 1)],
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    dec = f"decimal(20,{scale})"
    x = F.col(value_col).cast(dec)
    lagged = df.select(
        key_col,
        x.alias("__x"),
        *[
            F.lag(x, k).over(w).alias(f"__l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum("__x").cast("decimal(38,6)").alias("s"),
        F.sum(F.col("__x") * F.col("__x"))
        .cast("decimal(38,6)")
        .alias("ss"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"__l{k}")
        aggs += [
            F.count(lk).cast("long").alias(f"n{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("__x")))
            .cast("decimal(38,6)")
            .alias(f"sa{k}"),
            F.sum(lk).cast("decimal(38,6)").alias(f"sb{k}"),
            F.sum(F.col("__x") * lk)
            .cast("decimal(38,6)")
            .alias(f"sxy{k}"),
        ]
    per = lagged.groupBy(key_col).agg(*aggs)
    n = F.col("n").cast("double")
    m = F.col("s").cast("double") / n
    # sum (x - m)^2 = ss - 2 m s + n m^2, all from exact sums
    den = (
        F.col("ss").cast("double")
        - F.lit(2.0) * m * F.col("s").cast("double")
        + n * m * m
    )
    rows = []
    for k in range(1, max_lag + 1):
        num = (
            F.col(f"sxy{k}").cast("double")
            - m
            * (
                F.col(f"sa{k}").cast("double")
                + F.col(f"sb{k}").cast("double")
            )
            + F.col(f"n{k}").cast("double") * m * m
        )
        rows.append(
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                F.col(f"n{k}").alias("n_pairs"),
                pround(num / F.nullif(den, F.lit(0.0)), digits).alias("r"),
            )
        )
    return per.select(
        key_col, F.explode(F.array(*rows)).alias("__acf")
    ).select(
        key_col,
        F.col("__acf.lag").alias("lag"),
        F.col("__acf.n_pairs").alias("n_pairs"),
        F.col("__acf.r").alias("r"),
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    scale: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Per-entity CUSUM changepoint: with S_t the running sum of
    deviations from the entity mean, the changepoint is the position
    maximizing |S_t| — the classic single-shift detector for "when
    did this metric's level move". Output: (key, n, cp_ts, cp_seq,
    cusum) — cusum is the signed S at the argmax.

    Engine-exactness: the running sum accumulates exact decimals
    (S_t = dec_cumsum - t * mean recombined in doubles from exact
    totals), so no float fold-order can move the argmax; ties on the
    ROUNDED |S| break toward the earliest (ts, seq).

    Scale: one keyed window pass (running decimal sum + row number)
    + one ``max_by`` agg per entity — no second pass, no self-join.
    """
    reserve_columns(
        df, "cusum_changepoint", "n", "cp_ts", "cp_seq", "cusum",
        "__x", "__cum", "__i", "__s", "__tot", "__cnt",
    )
    dec = f"decimal(20,{scale})"
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    run = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(key_col)
    x = F.col(value_col).cast(dec)
    staged = df.select(
        key_col,
        F.col(ts_col).alias("__ts"),
        F.col(seq_col).alias("__seq"),
        F.sum(x).over(run).cast("decimal(38,6)").alias("__cum"),
        F.row_number().over(w).cast("long").alias("__i"),
        F.sum(x).over(tot).cast("decimal(38,6)").alias("__tot"),
        F.count("*").over(tot).cast("long").alias("__cnt"),
    )
    s = F.col("__cum").cast("double") - F.col("__i").cast(
        "double"
    ) * (F.col("__tot").cast("double") / F.col("__cnt").cast("double"))
    scored = staged.select(
        key_col,
        "__ts",
        "__seq",
        "__cnt",
        pround(s, digits).alias("__s"),
    )
    pick = F.struct(
        F.abs(F.col("__s")).alias("a"),
        (-F.unix_micros(F.col("__ts").cast("timestamp"))).alias("nts"),
        (-F.col("__seq")).alias("nseq"),
    )
    return (
        scored.groupBy(key_col)
        .agg(
            F.max("__cnt").alias("n"),
            F.max_by(F.struct("__ts", "__seq", "__s"), pick).alias("__hit"),
        )
        .select(
            key_col,
            "n",
            F.col("__hit.__ts").alias("cp_ts"),
            F.col("__hit.__seq").alias("cp_seq"),
            F.col("__hit.__s").alias("cusum"),
        )
    )
