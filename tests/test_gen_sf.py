"""scripts/gen_sf.py contract tests — the sf1-class corpus generator
behind the round-13 100x scale evidence (SCALE.md). No Spark: the
generator is numpy/pyarrow; correctness of QUERIES on its output is
covered by the oracle sweep (21/21 at mult=1, SCALE.md round 13)."""

import os
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from gen_sf import generate  # noqa: E402

FIXTURE = "/root/testdata/sf0.001"


def test_gen_sf_schemas_match_fixtures(tmp_path):
    """Every generated table must carry the exact driver-fixture
    column names and arrow types (timestamp[us], float list
    embeddings, int32 keys where the fixtures use int32) — a drifted
    schema would make scale timings incomparable and break
    load_table's assumptions."""
    out = str(tmp_path / "g")
    generate(out, mult=0.02, seed=7)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        fx = pq.read_schema(f"{FIXTURE}/{t}.parquet")
        gen = pq.read_schema(f"{out}/{t}.parquet")
        got = {f.name: str(f.type) for f in gen}
        want = {f.name: str(f.type) for f in fx}
        # embeddings: fixture writes list<element: float>, pyarrow
        # default names the child item — compare normalized
        norm = lambda s: s.replace("element: ", "").replace("item: ", "")  # noqa: E731
        assert {k: norm(v) for k, v in got.items()} == {
            k: norm(v) for k, v in want.items()
        }, t


def test_gen_sf_deterministic_and_shaped(tmp_path):
    """Same (mult, seed) => identical contents; row counts scale with
    mult; the planted near-dup structure exists (some doc pairs share
    a 50-char prefix) and embeddings are unit-norm."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    generate(a, mult=0.05, seed=11)
    generate(b, mult=0.05, seed=11)
    con = duckdb.connect()
    for t in ("documents", "lineitem", "events", "embeddings"):
        ha = con.sql(
            f"SELECT count(*), sum(hash(COLUMNS(*)::VARCHAR)) IS NOT NULL"
            f" FROM read_parquet('{a}/{t}.parquet')"
        ).fetchone()
        diff = con.sql(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{a}/{t}.parquet')"
            f" EXCEPT SELECT * FROM read_parquet('{b}/{t}.parquet'))"
        ).fetchone()[0]
        assert diff == 0, t
        assert ha[0] > 0, t
    n_doc = con.sql(
        f"SELECT count(*) FROM read_parquet('{a}/documents.parquet')"
    ).fetchone()[0]
    assert n_doc == 250  # 5000 * 0.05
    n_dup_pairs = con.sql(
        f"""SELECT count(*) FROM read_parquet('{a}/documents.parquet') x
            JOIN read_parquet('{a}/documents.parquet') y
              ON x.doc_id < y.doc_id
             AND substr(x.text, 1, 50) = substr(y.text, 1, 50)"""
    ).fetchone()[0]
    assert n_dup_pairs >= 5  # ~5% planted near-dups survive at small mult
    bad_norm = con.sql(
        f"""SELECT count(*) FROM read_parquet('{a}/embeddings.parquet')
            WHERE abs(sqrt(list_sum(list_transform(embedding,
                  x -> x::DOUBLE * x))) - 1.0) > 1e-3"""
    ).fetchone()[0]
    assert bad_norm == 0
