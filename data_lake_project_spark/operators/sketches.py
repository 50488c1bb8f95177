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

from data_lake_project_spark.functions import pround


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


# ---------------------------------------------------------------------------
# Mergeable DataSketches rollups (Spark 4's built-in Apache
# DataSketches aggregates). The lifecycle mirrors the persisted
# index lanes (ann_index / dedup_index / retrieval): build the
# per-key sketch table ONCE with a single partial-agg'd corpus pass,
# persist it, fold O(delta) batches in by key-wise union, and answer
# any slice/rollup question from the sketch table alone — the corpus
# is never rescanned. Unlike the positional indexes, replaying a
# delta is SAFE BY ALGEBRA here: HLL/theta union is idempotent on
# identical inputs (register-wise max / hash-set union), so the fold
# needs no anti-join guard. Sketch BYTES are not canonical across
# partitionings (serialization mode depends on merge order) —
# equivalence contracts compare ESTIMATES, never bytes.
# ---------------------------------------------------------------------------


def build_hll_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key HLL sketch of ``value_col``'s distinct set — one
    partial-aggregated pass (map-side sketches merge in the combine,
    the shuffle carries lg_k-sized registers, never values)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def save_hll_rollup(
    rollup: DataFrame, path: str, lg_k: int | None = None
) -> None:
    """Persist the sketch table; when ``lg_k`` is given it is recorded
    in an underscore-prefixed params file inside the directory (Spark's
    parquet reader skips ``_*`` files), so later folds/rebuilds use
    the BUILD-TIME precision instead of trusting a caller default —
    hll_union_agg throws on mixed-lgConfigK sketches, so a mismatched
    fold would leave the whole rollup unreadable."""
    rollup.write.mode("error").parquet(path)
    if lg_k is not None:
        import json

        from data_lake_project_spark import fs

        fs.write_text(
            rollup.sparkSession,
            f"{path.rstrip('/')}/_hll_params.json",
            json.dumps({"lg_k": lg_k}),
        )


def load_hll_rollup(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def stored_hll_lg_k(spark, path: str) -> int | None:
    """The build-time lg_k recorded by :func:`save_hll_rollup`, or
    None for rollups saved without one."""
    import json

    from data_lake_project_spark import fs

    p = f"{path.rstrip('/')}/_hll_params.json"
    if not fs.exists(spark, p):
        return None
    return int(json.loads(fs.read_text(spark, p))["lg_k"])


def fold_hll_rollup(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Fold a new batch into a standing rollup: sketch the delta,
    then key-wise ``hll_union_agg`` with the stored sketches. Cost is
    O(delta) + a rollup-key-sized merge; replaying the same delta is
    a no-op on every estimate (union idempotence)."""
    d = build_hll_rollup(delta, keys, value_col, lg_k)
    return (
        existing.unionByName(d)
        .groupBy(*keys)
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch"))
    )


def query_hll_rollup(
    rollup: DataFrame, group_keys: list[str]
) -> DataFrame:
    """Distinct-count estimates for ANY coarser grouping of a stored
    rollup: union the member sketches per output group and estimate.
    (key-count)-sized input — the 100 TB corpus never re-enters.

    Output: (*group_keys, approx_ndv bigint).
    """
    g = rollup.groupBy(*group_keys) if group_keys else rollup.groupBy()
    return g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch"))
        .cast("long")
        .alias("approx_ndv")
    )


def theta_overlap(
    df: DataFrame, set_col: str, value_col: str
) -> DataFrame:
    """Pairwise distinct-set algebra across the values of ``set_col``
    via theta sketches: |A∩B|, |A∪B|, |A\\B| and a Jaccard estimate
    for every unordered pair — without ever shuffling the raw value
    sets (the exact computation is a self-join of the full data; this
    is one sketch pass + a (k choose 2)-row driver-scale join).

    Output: (set_a, set_b, n_inter, n_union, n_only_a, jaccard_est),
    set_a < set_b.
    """
    sk = df.groupBy(F.col(set_col).alias("set_id")).agg(
        F.theta_sketch_agg(value_col).alias("__sk")
    )
    a = sk.select(
        F.col("set_id").alias("set_a"), F.col("__sk").alias("__ska")
    )
    b = sk.select(
        F.col("set_id").alias("set_b"), F.col("__sk").alias("__skb")
    )
    pairs = a.join(F.broadcast(b), F.col("set_a") < F.col("set_b"))
    inter = F.theta_sketch_estimate(
        F.theta_intersection("__ska", "__skb")
    ).cast("long")
    uni = F.theta_sketch_estimate(F.theta_union("__ska", "__skb")).cast(
        "long"
    )
    only_a = F.theta_sketch_estimate(
        F.theta_difference("__ska", "__skb")
    ).cast("long")
    return pairs.select(
        "set_a",
        "set_b",
        inter.alias("n_inter"),
        uni.alias("n_union"),
        only_a.alias("n_only_a"),
        pround(
            inter.cast("double")
            / F.greatest(uni.cast("double"), F.lit(1.0)),
            4,
        ).alias("jaccard_est"),
    )


def kll_quantile_rollup(
    df: DataFrame,
    key_col: str,
    value_col: str,
    quantiles: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable per-key quantile sketches (KLL over BIGINT values)
    plus a merged ``__all__`` row PROVING mergeability: the global
    quantiles come from folding the per-key sketches pairwise
    (``kll_sketch_merge_bigint`` over the sorted sketch list), not
    from rescanning the data — the continuous-aggregate shape for
    percentile dashboards over 100 TB.

    Output: (key, n bigint, q_<pct> bigint ...) with key='__all__'
    for the merged row.
    """
    vals = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("long").alias("__v"),
    )
    per = vals.groupBy("key").agg(
        F.kll_sketch_agg_bigint("__v").alias("__kll"),
        F.count("*").alias("n"),
    )

    def qcols(sk):
        return [
            F.kll_sketch_get_quantile_bigint(sk, F.lit(float(q)))
            .cast("long")
            .alias(f"q_{int(q * 100)}")
            for q in quantiles
        ]

    per_out = per.select("key", "n", *qcols(F.col("__kll")))
    merged = (
        per.agg(
            F.sort_array(F.collect_list(F.struct("key", "__kll"))).alias(
                "__ks"
            ),
            F.sum("n").alias("n"),
        )
        # empty input: collect_list is [], slice(.., 2, -1) errors and
        # __ks[0] is null — drop the merged row instead (the per-key
        # half is already empty, so the whole result is empty)
        .filter(F.size("__ks") > 0)
        .select(
            F.lit("__all__").alias("key"),
            "n",
            *qcols(
                F.aggregate(
                    F.expr("slice(__ks, 2, greatest(size(__ks) - 1, 0))"),
                    F.col("__ks")[0]["__kll"],
                    lambda acc, x: F.kll_sketch_merge_bigint(
                        acc, x["__kll"]
                    ),
                )
            ),
        )
    )
    return per_out.unionByName(merged)


def hll_rollup_apply(
    spark,
    path: str,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> None:
    """O(delta) fold into a PERSISTED rollup at ``path``: sketch the
    delta and parquet-append its per-key rows. No read-modify-write —
    a key may accumulate multiple sketch rows, and every query path
    (:func:`query_hll_rollup`) already unions rows per output group,
    so duplicates are invisible to estimates. A replayed delta
    appends rows whose union is an estimate no-op (idempotent sketch
    algebra) — the lane needs no replay guard, unlike the positional
    indexes (ann_index/dedup_index, where a replay DUPLICATES rows in
    results). Run :func:`compact_hll_rollup` occasionally to fold
    accumulated rows back to one per key.

    ``lg_k`` is a FALLBACK only: when the rollup was saved with its
    build-time precision (:func:`save_hll_rollup`), the stored value
    wins — a mismatched fold would make every later
    ``hll_union_agg`` throw on mixed-lgConfigK sketches."""
    lg_k = stored_hll_lg_k(spark, path) or lg_k
    build_hll_rollup(delta, keys, value_col, lg_k).write.mode(
        "append"
    ).parquet(path)


def compact_hll_rollup(spark, path: str) -> None:
    """Maintenance fold: rewrite the rollup to ONE sketch row per key
    (union-merging the appended delta rows). Estimates are unchanged
    — pinned by test. The merged table is eagerly materialized
    (``localCheckpoint``) before the overwrite so the write never
    scans the files it is replacing; a cluster deployment would write
    a new versioned directory and swap instead."""
    lg_k = stored_hll_lg_k(spark, path)  # overwrite deletes the dir
    r = load_hll_rollup(spark, path)
    keys = [c for c in r.columns if c != "hll_sketch"]
    merged = (
        r.groupBy(*keys)
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch"))
        .localCheckpoint(eager=True)
    )
    merged.write.mode("overwrite").parquet(path)
    if lg_k is not None:
        import json

        from data_lake_project_spark import fs

        fs.write_text(
            spark,
            f"{path.rstrip('/')}/_hll_params.json",
            json.dumps({"lg_k": lg_k}),
        )
