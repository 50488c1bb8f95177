"""Sweep every declared query's physical plan for scale red flags.

Complements tests/test_plans.py (which pins specific per-operator
plan properties): this is the whole-surface dragnet run after adding
or refactoring queries. Red flags, each of which has bitten a round:

- CartesianProduct / BroadcastNestedLoopJoin — O(n*m) degeneration.
- A Filter whose condition exceeds a size threshold — usually an
  optimizer rule cloning a computed expression tree (the
  InferFiltersFromGenerate incident, SCALE.md §7).
- More than MAX_EXCHANGES data shuffles — a query suddenly picking
  up exchanges it didn't have.
- Python eval nodes (BatchEvalPython / ArrowEvalPython) — a Python
  UDF slipped into a hot path that should be JVM-only.
- A nested-type (array/map/struct) column in a declared query's
  OUTPUT schema — pandas-based result canonicalizers (the external
  verifier's sort_values/hash path) raise ``unhashable type`` on
  list cells, so such a query fails verification even when its
  values are correct (the q55 round-5 incident). Declared outputs
  are scalars-only; emit ``array_join``/``to_json`` projections and
  keep typed nested results on the operator API.
- A Window with an EMPTY partition spec — the whole frame funnels
  through one task (Exchange SinglePartition + single-partition
  WindowExec); fine on an audit-sized frame, a straggler-killer on
  a corpus-sized one. Every deliberate global window is allowlisted
  with its boundedness argument; anything unlisted is a flag.

Usage: python scripts/audit_plans.py [sf_dir]   (exit 1 on any flag)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from data_lake_project_spark.plans import explain_str  # noqa: E402
from data_lake_project_spark.queries import QUERIES  # noqa: E402
from data_lake_project_spark.session import get_spark  # noqa: E402

MAX_FILTER_CHARS = 1500
MAX_EXCHANGES = 6

# Queries where a flagged pattern is expected and understood
# (document the reason when adding one).
FILTER_WIDTH_ALLOWED: set[str] = set()
BNLJ_ALLOWED: set[str] = {
    # Brute-force scoring IS a deliberate broadcast cross product:
    # every probe against every corpus vector, probe side tiny.
    "q22_similarity_topk",
    # ADC scan: tiny per-probe lookup tables broadcast against the
    # encoded corpus — m adds per pair, the PQ payoff.
    "q129_pq_topk",
    # exact retrieval: 3 hash-embedded query vectors broadcast against
    # the chunk stream — the q22 shape over chunk embeddings.
    "q142_chunk_retrieval",
    # 1-row corpus-count literal joined onto per-doc tf counts.
    "q45_tfidf_topterms",
    # 1-row total-count scalar joined onto vocab-sized term counts.
    "q80_heavy_hitters_exact",
    # 1-row vocabulary-size scalar joined onto the occurrence stream.
    "q94_ngram_lm_score",
    # 1-row total-rows scalar joined onto the per-key count table.
    "q106_skew_report",
    # 1-row totals scalar joined onto the category / CDF tables.
    "q109_categorical_drift",
    "q110_ks_drift",
    # 1-row total joined onto the 9-digit count table.
    "q126_benford",
    # 1-row (N, avgdl) corpus-stats scalar joined onto the inverted-
    # index-shaped candidate set; probe side is also a tiny broadcast.
    "q144_bm25_retrieval",
    "q145_hybrid_retrieval",
    # 1-row token-totals scalar joined onto the 64-row bucket table.
    "q147_importance_weights",
    # three 1-row count scalars cross-joined into the one-row report.
    "q148_lsh_quality_report",
    # three 1-row (exact-distinct, tolerance-flag) scalars cross-joined
    # into the one-row HLL tolerance report — the q148 shape.
    "q167_hll_tolerance_report",
    # the q144 scoring shape served from the persisted index — same
    # 1-row (N, avgdl) stats broadcast.
    "q150_bm25_index_search",
    # (k choose 2) pairing of the per-set theta sketches: both sides
    # are set-count-sized (one row per event_type), the '<' pair
    # condition is the deliberate broadcast nested loop.
    "q152_theta_overlap",
    # the q22 brute-force shape over int8 codes: tiny encoded probes
    # broadcast against the encoded corpus scan.
    "q155_int8_topk",
    # same shape served from the persisted codes table.
    "q157_sq_index_search",
    # 1-row max-doc-id scalar broadcast onto the batch derivation.
    "q156_vocab_growth",
    # 1-row basket-count scalar broadcast onto the pair-count table.
    "q159_basket_lift",
}


# Queries allowed a no-partition-spec Window — each entry's comment
# states why the windowed frame is BOUNDED (never corpus-sized), the
# round-10 verdict item #4 contract. Detection: a `(N) Window` detail
# block whose Arguments line has only [exprs], [order] (a partitioned
# window has [exprs], [partition], [order]).
GLOBAL_WINDOW_ALLOWED: set[str] = {
    # vocabulary-sized input: the rank runs on the aggregated term
    # table (~1e3 rows after groupBy(tok)), never corpus rows.
    "q71_boilerplate_scrub",
    # min(count) over the per-stratum COUNT table — rows = #sources
    # (temperature_sample's tiny groupBy(strata) summary).
    "q83_temperature_mix",
    # two-phase skyline: the global pass runs over the per-block
    # survivor union (each block contributes only its own frontier).
    "q95_pareto_frontier",
    # two-phase distributed rank: the cumulative-offset window runs
    # over per-block summaries (one row per block), both phases.
    "q98_sorted_neighborhood",
    # cumulative offsets over per-bucket net-change summaries
    # (one row per time bucket).
    "q107_max_concurrency",
    # cumulative CDF offsets over per-value-block summaries.
    "q110_ks_drift",
    # cumulative weight offsets over per-block summaries.
    "q119_systematic_sample",
    # phase-2 rank over per-block count summaries (q128's equi-depth
    # two-phase pattern).
    "q128_equidepth_hist",
    # running totals over per-BATCH vocabulary summaries — rows =
    # #ingest batches, never tokens.
    "q156_vocab_growth",
    # global ntile over (score, id) — audit-cadence calibration
    # diagram, documented audit-sized contract in
    # dataset.calibration_report (pre-bucket or sample at corpus
    # scale).
    "q181_quality_calibration",
}


def _split_toplevel_lists(s: str) -> list[str]:
    """Split an Arguments payload into its top-level [...] groups."""
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def global_windows(plan: str) -> int:
    """Count Window nodes whose partition spec is empty. The
    Arguments line renders [exprs], [partitionSpec], [orderSpec] with
    empty lists OMITTED, so 2 lists is ambiguous: partitioned-but-
    unordered (second list = plain attributes — fine, it scales) vs
    global-ordered (second list = ordering specs with ASC/DESC — the
    single-partition funnel this check hunts). 1 list = neither
    partition nor order — also global."""
    n = 0
    for m in re.finditer(
        r"^\(\d+\) Window\n(?:(?!\n\().*\n)*?Arguments: (.+)$",
        plan,
        re.MULTILINE,
    ):
        groups = _split_toplevel_lists(m.group(1))
        if len(groups) == 1 or (
            len(groups) == 2
            and re.search(r"\b(ASC|DESC)\b", groups[1])
        ):
            n += 1
    return n


def audit_schema(name: str, schema) -> list[str]:
    """Scalars-only output contract for declared queries (see module
    docstring): flag any top-level nested-type column."""
    from pyspark.sql import types as T

    return [
        f"nested-output-column {f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        flags.append("BroadcastNestedLoopJoin")
    if re.search(r"BatchEvalPython|ArrowEvalPython", plan):
        flags.append("python-udf-node")
    if name not in GLOBAL_WINDOW_ALLOWED:
        n_gw = global_windows(plan)
        if n_gw:
            flags.append(
                f"global-window x{n_gw} (single-partition WindowExec; "
                "allowlist with a boundedness comment if deliberate)"
            )
    n_ex = len(re.findall(r"\bExchange (hash|range)partitioning", plan))
    if n_ex > MAX_EXCHANGES:
        flags.append(f"exchanges={n_ex}>{MAX_EXCHANGES}")
    if name not in FILTER_WIDTH_ALLOWED:
        for m in re.finditer(r"Condition : (.+)", plan):
            if len(m.group(1)) > MAX_FILTER_CHARS:
                flags.append(
                    f"filter-condition {len(m.group(1))} chars "
                    "(cloned expression tree?)"
                )
                break
    return flags


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf)
            plan = explain_str(df)
        except Exception as e:  # noqa: BLE001
            print(f"FLAG {name}: explain failed: {e}")
            bad += 1
            continue
        flags = audit(name, plan) + audit_schema(name, df.schema)
        if flags:
            bad += 1
            print(f"FLAG {name}: {', '.join(flags)}")
        else:
            print(f"ok   {name}")
    print(f"\n{len(QUERIES) - bad} clean, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
