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


JSON_INT_RE = r"^-?[0-9]+$"
JSON_NUM_RE = r"^-?[0-9]+\.[0-9]+$"
JSON_BOOL_RE = r"^(true|false)$"


def infer_json_schema(df: DataFrame, json_col: str) -> DataFrame:
    """Schema inference over a semi-structured JSON string column —
    the landing-zone profiling step that turns "a bag of JSON blobs"
    into a typed ingest contract: per key, how often it appears, how
    its values classify (int / float / bool / null / string), and the
    coarsest type that admits every observed value (mixed int+float →
    double; anything mixed with bool or unclassifiable → string;
    all-null keys stay 'null' for the reviewer to resolve).

    Value text comes from the engine's JSON parser (numbers and
    literals keep their source text), classification is three RE2-safe
    regexes, and every output is an integer count or a CASE over
    counts — fully engine-exact, oracle-checkable against DuckDB's
    ``json_keys``/``json_extract_string``.

    Scale: parse + explode is a pure per-row map (fan-out = keys per
    object); ONE partial-agg'd shuffle on the key — cardinality is
    schema breadth, not data size. The same shape as the vocabulary
    aggregations (q40/q90).
    """
    from data_lake_project_spark.functions import spread

    entries = spread(df).select(
        F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias(
            "key", "value"
        )
    )
    v = F.col("value")
    counts = entries.groupBy("key").agg(
        F.count("*").cast("long").alias("n_present"),
        F.count(F.when(v.isNull(), 1)).cast("long").alias("n_null"),
        F.count(F.when(v.rlike(JSON_INT_RE), 1)).cast("long").alias("n_int"),
        F.count(F.when(v.rlike(JSON_NUM_RE), 1)).cast("long").alias("n_num"),
        F.count(F.when(v.rlike(JSON_BOOL_RE), 1)).cast("long").alias("n_bool"),
        F.count(
            F.when(
                v.isNotNull()
                & ~v.rlike(JSON_INT_RE)
                & ~v.rlike(JSON_NUM_RE)
                & ~v.rlike(JSON_BOOL_RE),
                1,
            )
        )
        .cast("long")
        .alias("n_str"),
    )
    inferred = (
        F.when(F.col("n_str") > 0, "string")
        .when((F.col("n_bool") > 0) & (F.col("n_int") + F.col("n_num") > 0), "string")
        .when(F.col("n_bool") > 0, "boolean")
        .when(F.col("n_num") > 0, "double")
        .when(F.col("n_int") > 0, "bigint")
        .otherwise("null")
    )
    return counts.withColumn("inferred_type", inferred)


def robust_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    c: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier flags — the robust z-score the winsorize op
    (q72) is the blunt cousin of: a row is an outlier when
    ``|x - median| > c * MAD`` within its group (MAD = median absolute
    deviation). Unlike mean/stddev, one wild value cannot drag the
    threshold toward itself, which is exactly what a data-quality
    gate wants on heavy-tailed columns.

    Appends ``grp_median``, ``grp_mad``, ``is_outlier``. Exact
    medians (in-group percentile, q63's semantics) — deterministic
    and oracle-checkable; groups with MAD = 0 flag any deviation
    (strict > keeps exact-constant groups clean).

    Scale: two grouped exact-median passes (each one keyed shuffle,
    group-state-sized output) + two broadcast-sized joins of the tiny
    per-group stats back onto the stream. For very hot groups swap
    the exact median for ``percentile_approx`` — same plan shape.
    """
    from data_lake_project_spark.functions import reserve_columns

    reserve_columns(df, "robust_outliers", "grp_median", "grp_mad",
                    "is_outlier")
    keys = keys or []
    if keys:
        med = df.groupBy(*keys).agg(
            F.median(value_col).alias("grp_median")
        )
        with_med = df.join(F.broadcast(med), keys)
    else:
        med = df.agg(F.median(value_col).alias("grp_median"))
        with_med = df.crossJoin(F.broadcast(med))
    dev = F.abs(F.col(value_col) - F.col("grp_median"))
    if keys:
        mad = with_med.groupBy(*keys).agg(
            F.median(dev).alias("grp_mad")
        )
        full = with_med.join(F.broadcast(mad), keys)
    else:
        mad = with_med.agg(F.median(dev).alias("grp_mad"))
        full = with_med.crossJoin(F.broadcast(mad))
    return full.withColumn(
        "is_outlier",
        F.abs(F.col(value_col) - F.col("grp_median"))
        > F.lit(c) * F.col("grp_mad"),
    )


def count_min_sketch(
    items: DataFrame,
    item_col: str,
    depth: int = 3,
    hex_chars: int = 2,
) -> DataFrame:
    """Count-min sketch of an item stream: ``depth`` independent
    md5-derived hash rows x ``16^hex_chars`` buckets, each cell the
    count of items hashing into it. The mergeable fixed-size
    frequency summary — at 100 TB the sketch is depth x width cells
    per partition, partial-aggregated like any groupBy, while an
    exact count table grows with vocabulary.

    md5 hashing makes the sketch DETERMINISTIC, so estimates (and
    their collision overestimates) are identical on any engine —
    the approximate structure is still exactly oracle-checkable.

    Output: (row, bucket, cnt) — one cell per non-empty bucket.
    """
    cells = items.select(
        F.posexplode(
            F.array(
                *[
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{i}:"),
                                F.col(item_col).cast("string"),
                            )
                        ),
                        1,
                        hex_chars,
                    )
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 3,
    hex_chars: int = 2,
) -> DataFrame:
    """Point-frequency estimates from a :func:`count_min_sketch`:
    min over the ``depth`` rows of the probed cell — an upper bound
    on the true count (collisions only ever inflate). Probes explode
    into (row, bucket) keys and equi-join the sketch; missing cells
    read as 0.

    Output: (item, cms_count).
    """
    pb = probes.select(
        F.col(item_col),
        F.posexplode(
            F.array(
                *[
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{i}:"),
                                F.col(item_col).cast("string"),
                            )
                        ),
                        1,
                        hex_chars,
                    )
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        pb.join(sketch, ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_count")
        )
    )
