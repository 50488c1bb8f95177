"""Approximate/sketch aggregations for interactive profiling at scale.

Exact quantiles or heavy-hitter counts over 100 TB force a full sort
or a giant hash table; the sketch versions are single-pass,
partial-aggregable (map-side combine), and mergeable across
partitions — all built-in Catalyst ImperativeAggregates, exposed here
with the engine's determinism conventions.

- ``approx_quantiles``     — GK-sketch percentiles per group
  (``percentile_approx`` with tunable accuracy).
- ``approx_distinct``      — HyperLogLog++ count per group (rsd knob).
- ``frequent_items``       — heavy hitters above a support threshold.
- ``column_profile``       — one-pass min/max/mean/null-rate/ndv per
  column (the ingest-time data-quality summary a lakehouse bronze
  layer records per load).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.95),
    keys: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles; error ≤ 1/accuracy of rank."""
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    agg = F.percentile_approx(value_col, qarr, F.lit(accuracy)).alias("quantiles")
    g = df.groupBy(*(keys or []))
    return g.agg(agg)


def approx_distinct(
    df: DataFrame,
    col: str,
    keys: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group HyperLogLog++ distinct count (relative std dev rsd)."""
    return df.groupBy(*(keys or [])).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_ndv")
    )


def frequent_items(
    df: DataFrame, col: str, support: float = 0.01
) -> DataFrame:
    """Heavy hitters: values of ``col`` appearing in ≥ ``support``
    fraction of rows (one-pass, per-partition candidate merge)."""
    out = df.freqItems([col], support)
    return out.select(F.explode(F.col(f"{col}_freqItems")).alias(col))


def column_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    include_ndv: bool = True,
) -> DataFrame:
    """One-pass profile per column: rows, nulls, ndv (approx), min,
    max — the bronze-ingest quality summary. Output long form:
    (column, n_rows, n_nulls, approx_ndv, min_str, max_str).

    ``include_ndv=False`` drops the HyperLogLog legs (the profile's
    most expensive aggregates — one sketch buffer per column) for
    callers that only need the exact fields; ``approx_ndv`` is then
    NULL rather than absent so the schema stays stable."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"__n_{c}"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nul_{c}"),
                F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
            ]
        )
        if include_ndv:
            aggs.append(F.approx_count_distinct(c).alias(f"__ndv_{c}"))
    row = df.agg(*aggs).first()
    rows = [
        (
            c,
            row[f"__n_{c}"],
            row[f"__nul_{c}"],
            row[f"__ndv_{c}"] if include_ndv else None,
            row[f"__min_{c}"],
            row[f"__max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows long, n_nulls long, approx_ndv long, "
        "min_str string, max_str string",
    )
