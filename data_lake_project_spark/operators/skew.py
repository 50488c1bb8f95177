"""Skew-handling joins (salting).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
by default in `session.get_spark`) handles most skew at runtime, but
it only splits *sort-merge* partitions. Salting is the explicit
rewrite for the pathological case — a handful of keys holding a large
share of a 100 TB fact table (the "null key" / "default tenant"
problem) joined against a side too large to broadcast:

- the skewed side gets a deterministic salt in [0, n) appended to its
  key (hash of the full row → uniform spread of each hot key across
  n partitions);
- the other side is replicated n times (explode over the salt range);
- the join runs on (key, salt): every hot key now occupies n shuffle
  partitions instead of one straggler.

Cost: n× replication of the smaller side — choose ``n_salts`` ≈
(hot-key rows / average-partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the ``skewed`` side's hot keys spread over
    ``n_salts`` shuffle partitions. Result is identical to
    ``skewed.join(other, on, how)`` for ``inner``/``left`` joins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join preserves semantics only for inner/left joins "
            f"from the skewed side; got {how!r}"
        )

    s = skewed.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    o = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(o, on=keys + [SALT], how=how).drop(SALT)


def skew_report(
    df: DataFrame,
    keys: list[str],
    hex_chars: int = 1,
    top: int = 10,
) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/agg key: per
    hot key, its row share and the load ratio of the hash bucket it
    lands in versus a perfectly uniform bucket — the number that
    predicts the straggler BEFORE the job runs. Feeds the
    ``n_salts`` choice for :func:`salted_join` (``suggested_salts`` =
    ceil(key rows / average bucket rows)).

    Bucketing uses the first ``hex_chars`` of md5(key) —
    16^hex_chars buckets — as an engine-portable PROXY for the
    runtime hash partitioner (Spark's Murmur3 isn't reproducible in
    an oracle; any uniform hash measures the same skew, because skew
    lives in the KEY COUNTS, not the hash). One partial-agg'd
    shuffle on the key (vocabulary-sized), a tiny scalar total, and
    a top-k — nothing data-sized leaves the executors.

    Output: (key..., n_rows, row_share, bucket, bucket_rows,
    bucket_skew, suggested_salts) for the ``top`` heaviest keys.
    """
    from data_lake_project_spark.functions import pround, reserve_columns

    reserve_columns(
        df, "skew_report",
        "n_rows", "row_share", "bucket", "bucket_rows", "bucket_skew",
        "suggested_salts",
    )
    n_buckets = 16 ** hex_chars
    kc = [F.col(k).cast("string") for k in keys]
    bucket = F.substring(F.md5(F.concat_ws("|", *kc)), 1, hex_chars)
    per_key = (
        df.groupBy(*keys)
        .agg(F.count("*").cast("long").alias("n_rows"))
        .withColumn("bucket", bucket)
    )
    per_bucket = per_key.groupBy("bucket").agg(
        F.sum("n_rows").cast("long").alias("bucket_rows")
    )
    total = per_key.agg(F.sum("n_rows").cast("long").alias("__total"))
    return (
        per_key.join(per_bucket, "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            pround(F.col("n_rows") / F.col("__total"), 6).alias("row_share"),
            "bucket",
            "bucket_rows",
            pround(
                F.col("bucket_rows")
                / (F.col("__total") / F.lit(float(n_buckets))),
                3,
            ).alias("bucket_skew"),
            F.ceil(
                F.col("n_rows")
                / (F.col("__total") / F.lit(float(n_buckets)))
            )
            .cast("long")
            .alias("suggested_salts"),
        )
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )
