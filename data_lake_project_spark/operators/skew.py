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
