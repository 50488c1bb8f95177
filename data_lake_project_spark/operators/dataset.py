"""Dataset management for training pipelines: deterministic splits.

A 100 TB training corpus needs train/val/test assignment that is (a)
stable across runs, engines and cluster sizes, (b) a pure map — no
shuffle, no RNG state, and (c) reproducible from the row alone, so a
re-ingested document lands in the same split forever (no train/test
leakage when the corpus is rebuilt).

Implementation: the first 8 hex chars of ``md5(seed || key)`` are a
uniform 32-bit value; comparing them LEXICOGRAPHICALLY against
precomputed hex thresholds assigns cumulative-weight buckets without
ever converting to integers — the identical expression runs on any
md5-capable engine (DuckDB oracle included).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(name, upper-bound-hex) per split, cumulative order; the last
    split has no bound (catches the remainder, so weights that don't
    sum exactly to 1.0 still partition)."""
    total = sum(weights.values())
    out = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, format(int(cum * 16**8), "08x")))
    out.append((names[-1], ""))
    return out


def split_column(
    key: Column, weights: dict[str, float], seed: str = ""
) -> Column:
    """The split-name expression for a key column."""
    hex8 = F.substring(
        F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8
    )
    expr = None
    bounds = split_thresholds(weights)
    for name, thr in bounds[:-1]:
        cond = hex8 < F.lit(thr)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = bounds[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by content hash of its key.

    Default weights: train 0.8 / val 0.1 / test 0.1. ``seed`` salts
    the hash so independent experiments draw independent splits of
    the same corpus. Pure map — zero shuffle at any scale.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_column(F.col(key_col), weights, seed))
