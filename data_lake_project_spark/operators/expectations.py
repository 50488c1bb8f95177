"""Declarative data-quality expectations (the Deequ/dbt-test shape).

Where ``queries.q59_integrity_checks`` hand-codes one table's checks,
this is the reusable rule engine a lakehouse runs on every ingest:
declare WHAT must hold (non-null, unique, accepted values, ranges,
regex shape, referential integrity) and get back one violations
report — the gate before a bronze batch is promoted to silver.

Scale: every column-local rule family folds into ONE aggregation
pass over the table (a handful of counters per rule — no per-rule
scans); ``unique`` adds an exact distinct count to the same agg;
each ``in_set`` (foreign-key) rule is one left-anti join against the
dimension, broadcast when small. Nothing is row-materialized: the
report is rules-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RULE_KINDS = (
    "not_null",
    "unique",
    "accepted_values",
    "range",
    "matches",
    "in_set",
)


def _violation_expr(rule: tuple) -> Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return F.count(F.when(c.isNull(), 1))
    if kind == "accepted_values":
        allowed = rule[2]
        return F.count(F.when(c.isNotNull() & ~c.isin(list(allowed)), 1))
    if kind == "range":
        lo, hi = rule[2], rule[3]
        return F.count(F.when((c < F.lit(lo)) | (c > F.lit(hi)), 1))
    if kind == "matches":
        return F.count(F.when(c.isNotNull() & ~c.rlike(rule[2]), 1))
    raise ValueError(f"expectations: unknown single-pass rule {kind!r}")


def validate(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Run a ruleset, return the report: one row per rule with
    ``(rule, column, n_rows, n_violations, passed)``.

    Rules (tuples):
    - ``("not_null", col)``
    - ``("unique", col)`` — duplicates = non-null rows minus exact
      distinct values (NULLs are not counted as duplicates)
    - ``("accepted_values", col, [v, ...])``
    - ``("range", col, lo, hi)`` — inclusive bounds
    - ``("matches", col, regex)`` — keep patterns RE2-safe if the
      report is oracle-checked
    - ``("in_set", col, dim_df, dim_col)`` — referential integrity;
      one anti-join per rule (broadcast the dimension when small)
    """
    for r in rules:
        if r[0] not in RULE_KINDS:
            raise ValueError(
                f"expectations: unknown rule kind {r[0]!r} "
                f"(expected one of {RULE_KINDS})"
            )
    single = [r for r in rules if r[0] not in ("in_set", "unique")]
    uniques = [r for r in rules if r[0] == "unique"]
    fks = [r for r in rules if r[0] == "in_set"]

    aggs = [F.count("*").cast("long").alias("__n")]
    for i, r in enumerate(single):
        aggs.append(_violation_expr(r).cast("long").alias(f"__v{i}"))
    for i, r in enumerate(uniques):
        c = F.col(r[1])
        aggs.append(F.count(c).cast("long").alias(f"__un{i}"))
        aggs.append(
            F.count_distinct(c).cast("long").alias(f"__ud{i}")
        )
    one = df.agg(*aggs)

    reports = []
    for i, r in enumerate(single):
        reports.append(
            F.struct(
                F.lit(r[0]).alias("rule"),
                F.lit(r[1]).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
            )
        )
    for i, r in enumerate(uniques):
        reports.append(
            F.struct(
                F.lit("unique").alias("rule"),
                F.lit(r[1]).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col(f"__un{i}") - F.col(f"__ud{i}")).alias(
                    "n_violations"
                ),
            )
        )
    report = one.select(
        F.explode(F.array(*reports)).alias("__r")
    ).select(
        "__r.rule", "__r.column", "__r.n_rows", "__r.n_violations"
    )

    n_rows = df.count() if fks else None  # bounded: one scalar action
    for r in fks:
        _, col, dim_df, dim_col = r
        missing = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(
                F.broadcast(dim_df.select(F.col(dim_col).alias(col))),
                col,
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias("n_violations"))
            .select(
                F.lit("in_set").alias("rule"),
                F.lit(col).alias("column"),
                F.lit(n_rows).cast("long").alias("n_rows"),
                "n_violations",
            )
        )
        report = report.unionByName(missing)
    return report.withColumn(
        "passed", F.col("n_violations") == 0
    )
