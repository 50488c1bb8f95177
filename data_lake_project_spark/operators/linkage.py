"""Entity resolution / record linkage: blocked fuzzy matching.

The classic dedup problem the hash/MinHash family can't solve: two
records that refer to the same entity but differ by typos ("Acme Inc"
vs "Acme, Inc.") share no exact hash and often no shingle band. The
standard answer is *blocking* (a cheap deterministic key that any true
match must share) followed by an exact edit-distance verify inside
each block — all-pairs only within a block, never across the corpus.

Reference parity: the reference has no fuzzy matcher; this extends the
dedup family (reference ``spark_stream.py:117-142`` dedups on exact
keys only) to typo-class duplicates, a core training-data curation op.

Scale notes (100 TB):
- The block join is a plain equi-join on the block key: one shuffle of
  each side keyed by block, pairs generated only within a block. Pair
  count is sum(b_i^2) over block sizes — the caller controls blowup by
  making the key finer (more columns, coarser length buckets → finer).
  ``max_block`` makes the contract explicit: if any block exceeds it
  the job fails fast with the offending keys instead of silently
  running a quadratic join.
- ``levenshtein`` runs JVM-side (codegen'd, O(len^2) per pair) on a
  bounded ``prefix_len`` so per-pair cost is a constant, not
  document-length-squared. Spark's 3-arg ``levenshtein(l, r, t)``
  short-circuits above the threshold (returns -1), so the verify cost
  is O(prefix_len * max_dist) per pair, the banded-DP optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    df: DataFrame,
    block_cols: list[str],
    text_col: str,
    id_col: str,
    max_dist: int,
    prefix_len: int = 24,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked fuzzy self-join: pairs (left_id < right_id) inside the
    same block whose ``text_col`` prefixes are within ``max_dist``
    Levenshtein edits.

    Returns (left_id, right_id, dist) with ``dist`` the edit distance
    between the two ``prefix_len``-char prefixes.

    ``max_block``: fail fast (driver-side, one tiny agg job) if any
    block holds more than this many rows — the quadratic-blowup guard.
    """
    for c in (text_col, id_col, *block_cols):
        if c not in df.columns:
            raise ValueError(f"fuzzy_join: column {c!r} not in input")
    if max_dist < 0 or prefix_len <= 0:
        raise ValueError("fuzzy_join: max_dist >= 0 and prefix_len > 0 required")

    side = df.select(
        F.col(id_col).alias("__fid"),
        F.substring(F.col(text_col), 1, prefix_len).alias("__fp"),
        *[F.col(c) for c in block_cols],
    )
    if max_block is not None:
        # Bounded collect: one row per over-limit block key (expected
        # empty; the guard exists to fail loudly, not to sample data).
        big = (
            side.groupBy(*block_cols)
            .count()
            .filter(F.col("count") > max_block)
            .limit(20)
            .collect()
        )
        if big:
            keys = [tuple(r[c] for c in block_cols) for r in big]
            raise ValueError(
                f"fuzzy_join: blocks over max_block={max_block}: {keys} — "
                "refine block_cols before running the quadratic verify"
            )
    left = side.select(
        F.col("__fid").alias("left_id"),
        F.col("__fp").alias("__lp"),
        *[F.col(c) for c in block_cols],
    )
    right = side.select(
        F.col("__fid").alias("right_id"),
        F.col("__fp").alias("__rp"),
        *[F.col(c) for c in block_cols],
    )
    pairs = left.join(right, block_cols).filter(
        F.col("left_id") < F.col("right_id")
    )
    # 3-arg levenshtein: banded DP, returns -1 above threshold.
    dist = F.levenshtein(F.col("__lp"), F.col("__rp"), max_dist)
    return (
        pairs.withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") >= 0)
        .select("left_id", "right_id", "dist")
    )
