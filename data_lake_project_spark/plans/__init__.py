"""Physical-plan inspection & assertions (scale guardrails).

The reference has no optimizer (SURVEY.md §4) — this engine delegates
to Catalyst, so the *contract* worth testing is plan quality: filters
reach the parquet scan, projections prune columns, small dimensions
broadcast, theta-joins never degenerate into cartesian products, and
hot paths stay inside whole-stage codegen. These helpers turn
`.explain("formatted")` output into assertions so a regression that
silently de-optimizes a plan (e.g. a UDF blocking pushdown) fails CI
instead of surfacing as a 100× slowdown at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Raw ``PushedFilters: [...]`` contents of every scan node (one
    string per scan; filter expressions themselves contain commas, so
    callers substring-match rather than split)."""
    return [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df))
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """The struct each scan actually reads (column-pruning witness)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", explain_str(df))


def join_strategies(df: DataFrame) -> list[str]:
    """Join node names in the plan, e.g. BroadcastHashJoin, SortMergeJoin,
    BroadcastNestedLoopJoin, CartesianProduct."""
    plan = explain_str(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def exchange_count(df: DataFrame) -> int:
    """Number of hash/range shuffle exchanges in the plan (lower =
    fewer wide dependencies; broadcast, round-robin ``spread()`` and
    SinglePartition exchanges are not counted).

    Matches BOTH plan syntaxes: simple mode inlines ``Exchange
    hashpartitioning(...)``, formatted mode splits the node into
    ``(N) Exchange`` + an ``Arguments: hashpartitioning(...)`` detail
    line — counting only the simple-mode shape silently returned 0 on
    every formatted plan and made the single-shuffle guardrails
    vacuous (caught when a genuinely-1-shuffle op counted 0).

    Once AQE finalizes a plan (any action ran), explain appends an
    ``== Initial Plan ==`` tree whose nodes ALSO get detail blocks —
    each shuffle would count twice. Only node ids appearing in the
    tree BEFORE that marker (the final plan) are counted."""
    plan = explain_str(df)
    tree = plan.split("== Initial Plan ==", 1)[0]
    # simple mode: partitioning is inline in the (final-plan) tree
    n = len(re.findall(r"\bExchange (?:hash|range)partitioning", tree))
    # formatted mode: map final-tree node ids to their detail blocks
    final_ids = set(re.findall(r"\bExchange \((\d+)\)", tree))
    for m in re.finditer(
        r"^\((\d+)\) Exchange\n(?:(?!\(\d+\) )[^\n]*\n)*?"
        r"Arguments: (?:hash|range)partitioning",
        plan,
        re.M,
    ):
        if m.group(1) in final_ids:
            n += 1
    return n


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans — wide spans mean the expression work
    runs as generated JVM code, not interpreted row-at-a-time.
    Formatted mode tags nodes ``[codegen id : N]``; simple mode wraps
    them in ``WholeStageCodegen (N)`` — accept both."""
    plan = explain_str(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


# -- assertions -----------------------------------------------------------


def assert_pushdown(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears among the scan's pushed filters."""
    pushed = " ; ".join(pushed_filters(df))
    missing = [f for f in fragments if f not in pushed]
    if missing:
        raise AssertionError(
            f"filters not pushed to scan: {missing}; pushed = [{pushed}]"
        )


def assert_pruned(df: DataFrame, must_not_read: list[str]) -> None:
    """Assert no scan reads any of the named columns."""
    schemas = read_schemas(df)
    bad = [c for c in must_not_read for s in schemas if f"{c}:" in s]
    if bad:
        raise AssertionError(
            f"columns not pruned from scan: {sorted(set(bad))}; schemas = {schemas}"
        )


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert the plan contains no cartesian/nested-loop join — the
    failure mode that turns a theta-join into O(n²) at scale."""
    bad = [
        j
        for j in join_strategies(df)
        if j in ("CartesianProduct", "BroadcastNestedLoopJoin")
    ]
    if bad:
        raise AssertionError(f"plan degenerates to {bad}")


def assert_broadcast(df: DataFrame) -> None:
    """Assert at least one join is a broadcast hash join (small-dim
    pattern: no shuffle of the big side)."""
    if "BroadcastHashJoin" not in join_strategies(df):
        raise AssertionError(
            f"no broadcast join in plan; joins = {join_strategies(df)}"
        )
