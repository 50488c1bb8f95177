"""Privacy-risk auditing: k-anonymity / l-diversity over
quasi-identifiers.

The governance side of the lakehouse next to erasure
(``operators/erasure.py``): before a table is shared or a training
corpus is published, the data owner needs to know how re-identifiable
its rows are. The classic measures (Sweeney, "k-Anonymity: a model
for protecting privacy", IJUFKS 2002; Machanavajjhala et al.,
"l-Diversity", ICDE 2006):

- a row is **k-anonymous** when at least k rows share its
  quasi-identifier (QI) combination — the equivalence class size;
- a class is **l-diverse** when its sensitive attribute takes at
  least l distinct values (a class of 50 rows that all share one
  diagnosis is large but still leaks it).

The report here is the per-class audit frame: one row per QI
equivalence class with its size ``k``, its sensitive-value diversity
``l_div``, and a ``risky`` flag for classes below the k threshold —
the frame a release gate aggregates (max risky rows tolerated = 0)
and an anonymization loop iterates on (generalize the QI, re-audit).

The reference has no privacy operator; this extends its PII scrub
(the engine's q53/q121 redaction lanes) from "find the identifiers"
to "measure what the non-identifiers still leak".

Scale (100 TB): one hash-groupBy on the QI columns with partial
aggregation — the same cost class as any keyed count. The distinct
count is exact (count(DISTINCT)) because the flag is a release gate;
a monitoring deployment swaps in approx_count_distinct per class.
No collect, no skew concern beyond any keyed agg (a single dominant
QI class is itself the audit's finding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k_threshold: int = 5,
) -> DataFrame:
    """Per-equivalence-class k-anonymity / l-diversity audit.

    Output: one row per distinct QI combination —
    (*quasi_cols, k, l_div, risky) with ``k`` the class size,
    ``l_div`` the exact distinct count of ``sensitive_col`` in the
    class, and ``risky = k < k_threshold``. Rows whose QI columns are
    all NULL still form a class (NULL-safe grouping is Spark's and
    SQL's shared GROUP BY semantics), because NULL quasi-identifiers
    are still a linkable pattern.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_report: quasi_cols is empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("long").alias("k"),
            F.countDistinct(sensitive_col).cast("long").alias("l_div"),
        )
        .withColumn("risky", F.col("k") < F.lit(int(k_threshold)))
    )


def k_anonymity_summary(
    report: DataFrame, k_threshold: int = 5
) -> DataFrame:
    """One-row release-gate rollup of :func:`k_anonymity_report`:
    total classes, minimum class size, minimum diversity, number of
    risky classes and the rows they expose. ``k_threshold`` is only
    documentation here — the flag was computed by the report."""
    return report.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("k").cast("long").alias("min_k"),
        F.min("l_div").cast("long").alias("min_l"),
        F.sum(F.when(F.col("risky"), 1).otherwise(0))
        .cast("long")
        .alias("n_risky_classes"),
        F.sum(F.when(F.col("risky"), F.col("k")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
    )
