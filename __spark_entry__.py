"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_lake_project_spark``; see SURVEY.md §2
for the operator inventory each query covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lake_project_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped
    multiway join + agg + top-k (q05)."""
    return QUERIES["q05_multiway_join_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query.

    Keys absent here (q32_approx_distinct, q33_lsh_topk, q37_ivf_topk,
    q88_kmeans_clusters, q129_pq_topk, q133_ivfpq_topk,
    q137_ann_index_search, q138_bpe_vocab, q139_semantic_dedup,
    q143_ann_chunk_retrieval) are approximate/iterative operators —
    the driver records a rows-only check; their quality contracts are
    CI-pinned instead (recall floors, inertia monotonicity,
    determinism, persisted-index ≡ inline equality, exact golden vs
    reference BPE, ANN-retrieval recall vs the exact q142).
    """
    return dict(ORACLE)
