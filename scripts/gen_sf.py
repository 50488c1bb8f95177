"""Synthesize an sf1-class corpus for 100x scale evidence.

The driver's fixtures (TESTDATA.md) top out at sf0.1 and are
read-only; the 100 TB story needs at least one measured scale step
BEYOND the 10x differential (round-12 verdict #1). This generator
mirrors the driver tables' statistical shapes — schemas, key ranges,
fan-outs (lineitem ~4 lines/order), value distributions, the
documents table's 31-word vocabulary and its ~5% planted near-dup
mutations (copy an earlier doc, then append "dup" / drop / insert a
word), unit-norm 64-d embeddings with non-geometric labels — at any
multiple of the sf0.1 row counts, so per-query runtimes are
comparable across the family.

Usage:
    python scripts/gen_sf.py OUT_DIR MULT [SEED]

MULT is relative to sf0.1: MULT=10 is sf1 (6M lineitem, 50k docs).
Writes the ten TESTDATA tables as single parquet files (timestamp[us]
columns, like the driver fixtures). Deterministic for a given
(MULT, SEED). Intended target: a /tmp scratch dir — never the
read-only /root/testdata.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dim"]
P_NOUN = ["ring", "bolt", "screw", "cap", "wheel", "cog", "pin", "nut"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]


def _ts_us(days_from: str, day_offsets: np.ndarray) -> pa.Array:
    base = np.datetime64(days_from)
    return pa.array(
        (base + day_offsets.astype("timedelta64[D]")).astype(
            "datetime64[us]"
        )
    )


def _write(out_dir: str, name: str, cols: dict) -> None:
    pq.write_table(
        pa.table(cols), os.path.join(out_dir, f"{name}.parquet")
    )


def generate(out_dir: str, mult: float, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_ord = int(150_000 * mult)
    n_evt = int(100_000 * mult)
    n_user = int(1_500 * mult)
    n_doc = int(5_000 * mult)
    n_vec = int(2_000 * mult)

    _write(
        out_dir,
        "region",
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        },
    )
    _write(
        out_dir,
        "nation",
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        },
    )
    _write(
        out_dir,
        "customer",
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust), pa.int32()
            ),
            "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[
                rng.integers(0, 5, n_cust)
            ],
        },
    )
    _write(
        out_dir,
        "supplier",
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(
                rng.integers(0, 25, n_supp), pa.int32()
            ),
            "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
        },
    )
    _write(
        out_dir,
        "part",
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [
                f"{P_ADJ[(i // 8) % 8]} {P_NOUN[i % 8]}"
                for i in rng.integers(0, 64, n_part)
            ],
            "p_brand": [
                f"Brand#{b}" for b in rng.integers(1, 26, n_part)
            ],
            "p_type": np.array(P_TYPES)[rng.integers(0, 6, n_part)],
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(
                900.0 + (np.arange(n_part) % 1000) * 0.1, 2
            ),
        },
    )

    # orders + lineitem: 1..7 lines per order (avg ~4, the fixture
    # fan-out), shipdate = orderdate + 1..95 days
    odate = rng.integers(0, 2404, n_ord)  # days, 1995-01-01..2001-08-01
    _write(
        out_dir,
        "orders",
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": np.array(["O", "P", "F"])[
                rng.integers(0, 3, n_ord)
            ],
            "o_totalprice": np.round(
                rng.uniform(850, 500_000, n_ord), 2
            ),
            "o_orderdate": _ts_us("1995-01-01", odate),
            "o_orderpriority": np.array(PRIORITIES)[
                rng.integers(0, 5, n_ord)
            ],
        },
    )
    nlines = rng.integers(1, 8, n_ord)
    l_ok = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    n_li = int(l_ok.shape[0])
    l_ln = np.concatenate([np.arange(1, k + 1) for k in nlines])
    _write(
        out_dir,
        "lineitem",
        {
            "l_orderkey": l_ok,
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": pa.array(l_ln, pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(
                rng.uniform(900, 105_000, n_li), 2
            ),
            "l_discount": rng.integers(0, 11, n_li) / 100.0,
            "l_tax": rng.integers(0, 9, n_li) / 100.0,
            "l_returnflag": np.array(["A", "N", "R"])[
                rng.integers(0, 3, n_li)
            ],
            "l_linestatus": np.array(["O", "F"])[
                rng.integers(0, 2, n_li)
            ],
            "l_shipdate": _ts_us(
                "1995-01-01",
                np.repeat(odate, nlines) + rng.integers(1, 96, n_li),
            ),
        },
    )

    # events: 30 days of microsecond timestamps, 5 uniform types,
    # exponential value, {"k": 0..99} props
    ts_us = rng.integers(0, 30 * 86_400_000_000, n_evt)
    ts_us.sort()
    _write(
        out_dir,
        "events",
        {
            "event_id": np.arange(n_evt, dtype=np.int64),
            "ts": pa.array(
                (
                    np.datetime64("2024-01-01")
                    + ts_us.astype("timedelta64[us]")
                ).astype("datetime64[us]")
            ),
            "user_id": rng.integers(0, n_user, n_evt),
            "event_type": np.array(
                ["click", "error", "purchase", "signup", "view"]
            )[rng.integers(0, 5, n_evt)],
            "value": np.round(
                np.clip(rng.exponential(50.0, n_evt), 0, 600), 2
            ),
            "props": [
                '{"k": %d}' % k for k in rng.integers(0, 100, n_evt)
            ],
        },
    )

    # documents: word-soup base + ~5% near-dup mutations of earlier docs
    lens = rng.integers(10, 101, n_doc)
    words = rng.integers(0, len(VOCAB), int(lens.sum()))
    splits = np.cumsum(lens)[:-1]
    texts: list[str] = [
        " ".join(VOCAB[w] for w in chunk)
        for chunk in np.split(words, splits)
    ]
    n_dup = int(0.05 * n_doc)
    # floor the dup-target window at 1 so every chosen i has at least
    # one earlier source doc (n_doc < 10 would make n_doc // 10 == 0,
    # letting i == 0 reach rng.integers(0, 0) below)
    dup_ids = rng.choice(
        np.arange(max(1, n_doc // 10), n_doc), size=n_dup, replace=False
    )
    for i in sorted(dup_ids):
        src = int(rng.integers(0, i))
        toks = texts[src].split()
        mode = int(rng.integers(0, 3))
        if mode == 0:
            toks = toks + ["dup"]
        elif mode == 1 and len(toks) > 10:
            del toks[int(rng.integers(0, len(toks)))]
        else:
            toks.insert(
                int(rng.integers(0, len(toks) + 1)),
                VOCAB[int(rng.integers(0, len(VOCAB)))],
            )
        texts[i] = " ".join(toks)
    _write(
        out_dir,
        "documents",
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, size=n_doc, p=LANG_P),
            "source": [
                f"src{s}" for s in rng.integers(0, 20, n_doc)
            ],
            "n_chars": np.array(
                [len(t) for t in texts], dtype=np.int64
            ),
        },
    )

    # embeddings: unit-norm 64-d float32, labels NOT geometric
    emb = rng.standard_normal((n_vec, 64))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb32 = emb.astype(np.float32)
    _write(
        out_dir,
        "embeddings",
        {
            "vec_id": np.arange(n_vec, dtype=np.int64),
            "embedding": pa.array(
                list(emb32), pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, 10, n_vec), pa.int32()
            ),
        },
    )


if __name__ == "__main__":
    out = sys.argv[1]
    mult = float(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    generate(out, mult, seed)
    print(f"generated mult={mult} corpus at {out}")
