"""Property-based tests (SURVEY.md §5.4): dedup idempotence,
union-count conservation, join-cardinality bounds, top-k symmetry,
grid invariants — hypothesis drives the pure-python cores at full
example counts and the Spark operators at reduced counts (each
example pays a JVM round-trip).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_lake_project_spark.operators.grid import _nms, reconstruct_page

# ---------------------------------------------------------------------------
# pure-python cores: full hypothesis throughput
# ---------------------------------------------------------------------------

rects = st.tuples(
    st.floats(0, 900, allow_nan=False),
    st.floats(0, 1300, allow_nan=False),
    st.floats(1, 100, allow_nan=False),
    st.floats(1, 100, allow_nan=False),
).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3]))


@given(st.lists(rects, min_size=0, max_size=25))
def test_grid_invariants(boxes):
    arr = np.array(boxes, dtype=float).reshape(-1, 4)
    texts = [f"t{i}" for i in range(len(arr))]
    cells = reconstruct_page(arr, texts, page_w=1000.0, page_h=1400.0)
    seen = set()
    for r, c, t in cells:
        assert (r, c) not in seen, "duplicate cell assignment"
        seen.add((r, c))
        assert 0 <= r < len(arr) and 0 <= c < len(arr)
        assert t in texts
    # cell count bounded by rows x cols after NMS
    assert len(cells) <= max(1, len(arr)) ** 2


@given(st.lists(rects, min_size=1, max_size=30))
def test_nms_keeps_non_overlapping_set(boxes):
    arr = np.array(boxes, dtype=float)
    keep = _nms(arr, iou_threshold=0.1)
    assert keep == sorted(keep)  # priority order preserved
    assert len(set(keep)) == len(keep)
    # every kept pair overlaps at most threshold
    for i_idx, i in enumerate(keep):
        for j in keep[i_idx + 1 :]:
            ix1 = max(arr[i, 0], arr[j, 0]); iy1 = max(arr[i, 1], arr[j, 1])
            ix2 = min(arr[i, 2], arr[j, 2]); iy2 = min(arr[i, 3], arr[j, 3])
            inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
            a = (arr[i, 2] - arr[i, 0]) * (arr[i, 3] - arr[i, 1])
            b = (arr[j, 2] - arr[j, 0]) * (arr[j, 3] - arr[j, 1])
            union = a + b - inter
            if union > 0:
                assert inter / union <= 0.1 + 1e-9


# ---------------------------------------------------------------------------
# Spark operators: reduced example counts
# ---------------------------------------------------------------------------

SPARK_SETTINGS = settings(max_examples=8, deadline=None)


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.text("ab", min_size=0, max_size=6)),
        min_size=0,
        max_size=30,
    )
)
def test_exact_dedup_idempotent_and_conserving(spark, rows):
    from data_lake_project_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(rows, "doc_id int, text string") if rows else (
        spark.createDataFrame([], "doc_id int, text string")
    )
    once = exact_dedup(df)
    n_once = once.count()
    assert n_once == df.select("text").distinct().count()
    assert exact_dedup(once.drop("content_hash")).count() == n_once


@SPARK_SETTINGS
@given(
    st.lists(st.integers(0, 10), min_size=0, max_size=20),
    st.lists(st.integers(0, 10), min_size=0, max_size=20),
)
def test_union_count_conservation(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs], "v int")
    b = spark.createDataFrame([(y,) for y in ys], "v int")
    assert a.unionAll(b).count() == len(xs) + len(ys)
    # join-cardinality bound: |A ⋈ B| <= |A| x |B|; equi self-join on
    # key conserves the group-size-square sum
    j = a.join(b, "v")
    assert j.count() <= len(xs) * len(ys)


@SPARK_SETTINGS
@given(
    st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2,
        max_size=8,
    ).filter(lambda vs: all(sum(x * x for x in v) > 1e-6 for v in vs))
)
def test_topk_cosine_symmetry(spark, vecs):
    from data_lake_project_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    probes = corpus.selectExpr("vec_id as probe_id", "embedding")
    out = brute_force_topk(corpus, probes, k=len(vecs)).collect()
    sims = {(r.probe_id, r.vec_id): r.cosine for r in out}
    for (a, b), s in sims.items():
        assert math.isclose(sims[(b, a)], s, abs_tol=1e-9), "cosine not symmetric"
        assert -1.0001 <= s <= 1.0001


@SPARK_SETTINGS
@given(
    st.lists(rects, min_size=1, max_size=10),
    st.lists(rects, min_size=1, max_size=10),
)
def test_iou_join_equals_cross_join_reference(spark, cell_rects, box_rects):
    from data_lake_project_spark.operators.interval import iou, iou_join

    cells = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(cell_rects)],
        "cell_id int, c_x1 double, c_y1 double, c_x2 double, c_y2 double",
    )
    boxes = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(box_rects)],
        "box_id int, b_x1 double, b_y1 double, b_x2 double, b_y2 double",
    )
    fast = {
        (r.cell_id, r.box_id)
        for r in iou_join(cells, boxes, bucket=64.0).collect()
    }
    slow = {
        (r.cell_id, r.box_id)
        for r in cells.crossJoin(boxes).filter(iou("c_", "b_") > 0.09).collect()
    }
    assert fast == slow


@SPARK_SETTINGS
@given(
    st.lists(st.integers(0, 5000), min_size=1, max_size=15),
    st.lists(st.integers(0, 5000), min_size=1, max_size=15),
    st.sampled_from([60, 600, 3600]),
)
def test_time_range_join_equals_cross_join_reference(spark, ls, rs, w):
    """The bin-explode rewrite must return EXACTLY the pairs a naive
    cross join with |Δt| ≤ W keeps — including boundary seconds and
    each pair exactly once (no multi-bin duplicates) — for any epoch
    spread and any bin width."""
    import datetime as dt

    from data_lake_project_spark.operators.interval import time_range_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(ls)],
        "l_id int, l_ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(rs)],
        "r_id int, r_ts timestamp_ntz",
    )
    fast = [
        (r.l_id, r.r_id)
        for r in time_range_join(left, right, "l_ts", "r_ts", w).collect()
    ]
    slow = [
        (li, ri)
        for li, l in enumerate(ls)
        for ri, r in enumerate(rs)
        if abs(l - r) <= w
    ]
    assert sorted(fast) == sorted(slow)  # exact set AND multiplicity


# ---------------------------------------------------------------------------
# sentence segmentation invariants
# ---------------------------------------------------------------------------

# words over a small alphabet, with sentence punctuation appearing both
# attached ("mot.") and standalone (".") plus decimals that must never split
_sentence_words = st.lists(
    st.one_of(
        st.text("abc", min_size=1, max_size=4),
        st.text("abc", min_size=1, max_size=3).map(lambda w: w + "."),
        st.sampled_from(
            [
                ".", "!", "?", "...", "3.5", "1,2%", "a!b",
                # pathological punctuation (round-2 ADVICE): decimals
                # that END a sentence, ellipsis runs, mixed-mark runs,
                # dotted abbreviation-ish tokens, bare integer + "."
                "3.5.", "..", "....", "?!", "..!?", "a.b", "10.", "e4.5!",
            ]
        ),
    ),
    min_size=0,
    max_size=20,
)


@SPARK_SETTINGS
@given(_sentence_words)
def test_split_sentences_invariants(spark, words):
    """For ANY text: (1) sentence tokens concatenate back to the
    punct-separated token stream (nothing lost or duplicated), (2)
    boundary tokens appear only at sentence ends, (3) sent_idx is
    dense from 0 in document order."""
    import re

    from data_lake_project_spark.operators.sentences import (
        BOUNDARY_TOKEN_RE,
        split_sentences,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = sorted(
        (r.sent_idx, r.sentence) for r in split_sentences(df).collect()
    )
    # dense 0-based indices
    assert [i for i, _ in out] == list(range(len(out)))
    # reconstruction: joining all sentences == the normalized stream
    norm = re.sub(r"([.!?]+)(\s|$)", r" \1\2", text)
    expected_tokens = norm.split()
    got_tokens = [t for _, s in out for t in s.split()]
    assert got_tokens == expected_tokens
    # boundary tokens only in final position of their sentence
    bre = re.compile(BOUNDARY_TOKEN_RE)
    for _, s in out:
        toks = s.split()
        for t in toks[:-1]:
            assert not bre.match(t), (s, t)


def test_split_sentences_pathological_punctuation(spark):
    """Deterministic pins for the nastiest shapes: a decimal ENDING a
    sentence ('3.5.') must split after the decimal and keep '3.5'
    intact; ellipsis runs split exactly once; a decimal mid-sentence
    never splits."""
    from data_lake_project_spark.operators.sentences import split_sentences

    cases = {
        # decimal at sentence end: trailing '.' peels off, '3.5' stays
        1: ("growth was 3.5. next year fell", ["growth was 3.5 .", "next year fell"]),
        # ellipsis run is ONE boundary token, one split
        2: ("wait... then go", ["wait ...", "then go"]),
        # decimal mid-sentence: no split
        3: ("rate of 3.5 percent held", ["rate of 3.5 percent held"]),
        # consecutive boundary marks ('?!' is not in the reference
        # boundary set {'.','!','..','...','?'} as a unit — it peels
        # as its own token and only splits if it matches the set)
        4: ("done. . twice", ["done .", ".", "twice"]),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "doc_id int, text string"
    )
    got: dict[int, list[str]] = {}
    for r in split_sentences(df).collect():
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    for k, (_, want) in cases.items():
        assert [s for _, s in sorted(got[k])] == want, (k, sorted(got[k]))


@SPARK_SETTINGS
@given(
    st.lists(
        st.lists(st.sampled_from(["nav", "foot", "aaa", "bb", "c1", "d2"]),
                 min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    )
)
def test_line_dedup_invariants(spark, docs_lines):
    """(1) every kept line is a line of its document, in original
    order; (2) total kept occurrences of a line across the corpus ==
    1 if it was duplicated, == its count if unique (i.e. exactly the
    first occurrence survives); (3) a corpus with all-unique lines
    round-trips unchanged."""
    from data_lake_project_spark.operators.dedup import line_dedup

    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs_lines)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup(df).collect()}
    from collections import Counter

    corpus = Counter(l for ls in docs_lines for l in ls)
    kept = Counter()
    for i, ls in enumerate(docs_lines):
        r = out[i]
        kept_lines = r.clean_text.split("\n") if r.clean_text else []
        kept.update(kept_lines)
        # kept lines are a subsequence of the original lines
        it = iter(ls)
        assert all(any(orig == k for orig in it) for k in kept_lines), (
            ls, kept_lines
        )
        assert r.n_lines == len(ls)
        assert r.n_dup_lines == sum(1 for l in ls if corpus[l] > 1)
    # exactly one survivor per distinct line
    assert set(kept) == set(corpus)
    assert all(v == 1 for v in kept.values())


@SPARK_SETTINGS
@given(
    st.lists(st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
             min_size=1, max_size=40, unique_by=lambda t: t[0])
)
def test_temperature_sample_invariants(spark, rows):
    """Rates are in (0, 1]; the smallest stratum keeps every row;
    output is a subset of input; per-row keep decisions depend only on
    (stratum, key) — dropping other strata doesn't change a stratum's
    sample (given its count stays put)."""
    from data_lake_project_spark.operators.dataset import temperature_sample

    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_sample(df, "src", "doc_id", seed="p").collect()
    in_keys = {(r[0], r[1]) for r in rows}
    assert all((r.doc_id, r.src) in in_keys for r in out)
    assert all(0.0 < r.mix_rate <= 1.0 for r in out)
    from collections import Counter

    counts = Counter(s for _, s in rows)
    smallest = min(counts, key=lambda s: (counts[s], s))
    min_count = counts[smallest]
    kept_small = [r for r in out if counts[r.src] == min_count]
    assert len(kept_small) == sum(
        1 for _, s in rows if counts[s] == min_count
    )


@SPARK_SETTINGS
@given(
    st.lists(st.tuples(st.integers(0, 100), st.integers(1, 30),
                       st.sampled_from(["x", "y"])),
             min_size=1, max_size=30, unique_by=lambda t: t[0])
)
def test_token_budget_quota_invariants(spark, rows):
    """Kept rows are exactly the maximal doc_id-ordered prefix of each
    stratum whose running token sum stays within budget."""
    from data_lake_project_spark.operators.dataset import token_budget_quota
    from pyspark.sql import functions as F

    budget = 40
    df = spark.createDataFrame(rows, "doc_id long, n_toks long, src string")
    out = sorted(
        (r.src, r.doc_id, r.cum_tokens)
        for r in token_budget_quota(
            df, "src", "n_toks", budget, [F.col("doc_id")]
        ).collect()
    )
    expect = []
    from collections import defaultdict

    per = defaultdict(list)
    for did, tok, src in sorted(rows):
        per[src].append((did, tok))
    for src, docs in per.items():
        cum = 0
        for did, tok in docs:
            cum += tok
            if cum > budget:
                break
            expect.append((src, did, cum))
    assert out == sorted(expect)


@SPARK_SETTINGS
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0,
                 max_size=12),
        min_size=1, max_size=8,
    )
)
def test_dup_spans_equals_bruteforce(spark, docs_toks):
    """Differential property: dup_spans == a brute-force python
    reference of the same contract (g-gram occurs >= 2 times in the
    corpus -> anchor; overlapping/adjacent anchors merge to maximal
    islands). A 4-symbol alphabet makes duplicated grams common."""
    from collections import Counter

    from data_lake_project_spark.operators.dedup import dup_spans

    g = 3
    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dup_spans(df, g=g).collect()}

    grams = Counter()
    for ts in docs_toks:
        for p in range(len(ts) - g + 1):
            grams[tuple(ts[p:p + g])] += 1
    for i, ts in enumerate(docs_toks):
        anchors = [
            p for p in range(len(ts) - g + 1)
            if grams[tuple(ts[p:p + g])] >= 2
        ]
        spans = []
        for p in anchors:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + g)
            else:
                spans.append([p, p + g])
        # NOTE: split('', '\s+') yields [''] — an empty doc has 1 token
        n_toks = len(ts) if ts else 1
        r = out[i]
        assert r.n_toks == n_toks, (i, ts, r)
        assert r.n_spans == len(spans), (i, ts, spans, r)
        assert r.dup_tokens == sum(e - s for s, e in spans), (i, ts, spans, r)
        assert r.dup_tokens <= r.n_toks


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(st.sampled_from(["b1", "b2"]),
                  st.text(alphabet="abcx ", min_size=0, max_size=12)),
        min_size=1, max_size=12,
    )
)
def test_fuzzy_join_equals_bruteforce(spark, rows):
    """Differential property: fuzzy_join == all-pairs python
    Levenshtein inside each block, never across blocks."""
    from data_lake_project_spark.operators.linkage import fuzzy_join

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    data = [(i, blk, txt) for i, (blk, txt) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, blk string, name string")
    max_dist, plen = 3, 6
    got = {
        (r.left_id, r.right_id): r.dist
        for r in fuzzy_join(
            df, ["blk"], "name", "id", max_dist=max_dist, prefix_len=plen
        ).collect()
    }
    want = {}
    for i, bi, ti in data:
        for j, bj, tj in data:
            if i < j and bi == bj:
                d = lev(ti[:plen], tj[:plen])
                if d <= max_dist:
                    want[(i, j)] = d
    assert got == want


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_equals_bruteforce(spark, pts):
    from data_lake_project_spark.operators.frontier import skyline2d

    rows = [(i, c, g) for i, (c, g) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, cost long, gain long")
    got = {r.id for r in skyline2d(df, "cost", "gain", n_blocks=3).collect()}
    want = {
        i
        for i, c, g in rows
        if not any(
            c2 <= c and g2 >= g and (c2 < c or g2 > g) for _, c2, g2 in rows
        )
    }
    assert got == want


@SPARK_SETTINGS
@given(
    st.lists(st.integers(0, 50), min_size=0, max_size=120),
    st.integers(4, 16),
    st.integers(0, 3),
)
def test_chunk_documents_lossless_cover(spark, tok_ids, size, ov):
    """Every token appears in some chunk at its original position;
    consecutive chunks overlap by exactly `ov` (except the clipped
    tail); reassembly reproduces the document."""
    from data_lake_project_spark.operators.dataset import chunk_documents

    toks = [f"w{t}" for t in tok_ids]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id int, text string")
    out = sorted(
        chunk_documents(df, chunk_size=size, overlap=ov).collect(),
        key=lambda r: r.chunk_id,
    )
    stride = size - ov
    rebuilt: list[str] = []
    for r in out:
        chunk = r.chunk_text.split(" ") if r.chunk_text else []
        assert len(chunk) == r.n_chunk_toks <= size
        assert chunk == toks[r.chunk_id * stride : r.chunk_id * stride + size]
        rebuilt += chunk if r.chunk_id == 0 else chunk[ov:]
    if toks:
        assert rebuilt == toks
    else:
        assert [r.n_chunk_toks for r in out] == [0]


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 3000)),
        min_size=1,
        max_size=30,
    ),
    st.integers(60, 600),
)
def test_max_concurrency_equals_bruteforce(spark, spans, bucket):
    from pyspark.sql import functions as F

    from data_lake_project_spark.operators.interval import max_concurrency

    iv = [(s, s + d) for s, d in spans]
    df = spark.createDataFrame(iv, "a int, b int").select(
        F.col("a").cast("timestamp").alias("a"),
        F.col("b").cast("timestamp").alias("b"),
    )
    got = {
        r.bucket: r.max_concurrent
        for r in max_concurrency(df, "a", "b", bucket_s=bucket).collect()
    }
    # brute force: concurrency at every boundary point (starts first)
    events = sorted(
        [(s, 1) for s, _ in iv] + [(e, -1) for _, e in iv],
        key=lambda t: (t[0], -t[1]),
    )
    run = 0
    want: dict[int, int] = {}
    for t, d in events:
        run += d
        b = t // bucket
        want[b] = max(want.get(b, run), run)
    assert got == want


@SPARK_SETTINGS
@given(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=30),
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=30),
)
def test_categorical_drift_properties(spark, old, new):
    from data_lake_project_spark.operators.drift import categorical_drift

    if not old or not new:
        return  # chi2 needs mass on both sides
    a = spark.createDataFrame([(k,) for k in old], "k string")
    b = spark.createDataFrame([(k,) for k in new], "k string")
    rows = categorical_drift(a, b, "k").collect()
    # every category from either side appears exactly once
    assert sorted(r.k for r in rows) == sorted(set(old) | set(new))
    # counts are conserved and chi2 contributions are non-negative
    assert sum(r.n_old for r in rows) == len(old)
    assert sum(r.n_new for r in rows) == len(new)
    assert all(r.chi2 >= 0 for r in rows)


@SPARK_SETTINGS
@given(
    st.lists(
        st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 2)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 2)),
        min_size=1,
        max_size=25,
    ),
)
def test_ks_drift_equals_brute_force(spark, xs, ys):
    from data_lake_project_spark.operators.drift import ks_drift

    a = spark.createDataFrame([(v,) for v in xs], "v double")
    b = spark.createDataFrame([(v,) for v in ys], "v double")
    got = ks_drift(a, b, "v", block_width=7.0).first()
    support = sorted(set(xs) | set(ys))
    want = max(
        abs(
            sum(1 for x in xs if x <= v) / len(xs)
            - sum(1 for y in ys if y <= v) / len(ys)
        )
        for v in support
    )
    assert got.n_old == len(xs) and got.n_new == len(ys)
    assert abs(got.ks_stat - want) <= 5e-7  # pround quantization
    assert 0.0 <= got.ks_stat <= 1.0


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.integers(1, 5)),
        min_size=1,
        max_size=40,
    )
)
def test_count_min_upper_bounds_every_probe(spark, items):
    from data_lake_project_spark.operators.sketches import (
        count_min_estimate,
        count_min_sketch,
    )

    flat = [t for t, n in items for _ in range(n)]
    df = spark.createDataFrame([(t,) for t in flat], "tok string")
    sketch = count_min_sketch(df, "tok", depth=3, hex_chars=1)
    probes = spark.createDataFrame(
        [(t,) for t in sorted({t for t, _ in items})], "tok string"
    )
    est = {
        r.tok: r.cms_count
        for r in count_min_estimate(
            sketch, probes, "tok", depth=3, hex_chars=1
        ).collect()
    }
    from collections import Counter

    true = Counter(flat)
    # one-sided error: never underestimates, total mass bounds it
    for t, n in true.items():
        assert n <= est[t] <= len(flat)


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.sampled_from("abcd"),
            st.floats(0, 50, allow_nan=False).map(lambda v: round(v, 2)),
            st.sampled_from([1, -1]),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_ivm_apply_equals_recompute(spark, changes):
    from collections import defaultdict

    from data_lake_project_spark.lakehouse import ivm_apply

    # split the log arbitrarily into base-inserts and a delta batch;
    # guard: a delete with no prior insert is an upstream data bug,
    # so only generate deletes covered by inserts
    inserts = [(k, v, 1) for k, v, op in changes if op == 1]
    seen = defaultdict(int)
    deletes = []
    for k, v, op in changes:
        if op == 1:
            seen[(k, v)] += 1
        elif seen[(k, v)] > 0:
            seen[(k, v)] -= 1
            deletes.append((k, v, -1))
    half = len(inserts) // 2
    base_rows = inserts[:half]
    delta_rows = inserts[half:] + deletes
    if not base_rows and not delta_rows:
        return
    schema = "k string, v double, op int"
    base = (
        spark.createDataFrame(base_rows or [], schema)
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(20,2)"))
            .cast("decimal(38,2)")
            .alias("sv"),
        )
    )
    delta = spark.createDataFrame(delta_rows or [], schema)
    got = {
        r.k: (r.n, str(r.sv))
        for r in ivm_apply(
            base, delta, ["k"], count_col="n", sum_cols={"v": "sv"}
        ).collect()
    }
    net = defaultdict(lambda: [0, 0])
    for k, v, op in base_rows + delta_rows:
        net[k][0] += op
        net[k][1] += op * round(v * 100)
    want = {
        k: (n, f"{cents / 100:.2f}")
        for k, (n, cents) in net.items()
        if n != 0
    }
    assert got == want


# ---------------------------------------------------------------------------
# Round 5: BPE algebra — distributed fold / string-replace tokenizer
# vs the pure-Python reference on arbitrary corpora
# ---------------------------------------------------------------------------

words = st.text(alphabet="abcde", min_size=1, max_size=7)


def _ref_bpe_train(word_counts, k, min_count=2):
    vocab = {}
    for w, n in word_counts.items():
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + n
    merges = []
    for step in range(1, k + 1):
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + n
                )
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((step, a, b, a + b, cnt))
        nv = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


@settings(max_examples=5, deadline=None)
@given(st.lists(words, min_size=1, max_size=30))
def test_bpe_train_matches_reference_on_random_corpora(spark, corpus):
    """The distributed merge loop (weighted pair explode + min-struct
    winner + JVM fold) must equal the reference index-walk BPE on
    ARBITRARY word lists — repeats, overlapping pairs ("aaa"),
    single-char words, tie storms on a 5-letter alphabet."""
    from collections import Counter

    from data_lake_project_spark.operators.bpe import bpe_merges

    docs = spark.createDataFrame(
        [(1, " ".join(corpus))], "doc_id long, text string"
    )
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_merges(docs, k_merges=6).collect()
    ]
    assert got == _ref_bpe_train(Counter(corpus), 6)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(words, min_size=1, max_size=15),
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=2),
            st.text(alphabet="abcde", min_size=1, max_size=2),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_bpe_apply_matches_reference_on_random_merges(
    spark, corpus, merges
):
    """The separator-wrapped string-replace tokenizer must equal the
    reference per-word merge walk for ARBITRARY (even nonsensical)
    merge tables — including merges whose parts never occur, overlap
    ("a","a"), or chain into each other."""
    from collections import Counter

    from data_lake_project_spark.operators.bpe import bpe_apply

    docs = spark.createDataFrame(
        [(1, " ".join(corpus))], "doc_id long, text string"
    )
    got = Counter(r.token for r in bpe_apply(docs, merges).collect())
    want = Counter()
    for w in corpus:
        syms = list(w) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        want.update(syms)
    assert got == want


def _ref_bm25(doc_words, query_words, k1=1.2, b=0.75):
    """Pure-Python BM25 with the operator's EXACT arithmetic: rational
    idf, per-term pround(6), exact-decimal (micro-int) summation,
    final pround(4) — the same IEEE op sequence, so equality is
    bit-for-bit, not approximate."""
    import math

    dl = {i: len(ws) for i, ws in doc_words.items() if ws}
    if not dl:
        return []
    n = float(len(dl))
    avgdl = float(sum(dl.values())) / n
    df = {}
    for ws in doc_words.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    qterms = set(query_words)
    micros = {}
    for i, ws in doc_words.items():
        if not ws:
            continue
        for t in qterms:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            tf_term = (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * (dl[i] / avgdl))
            )
            c = math.floor(idf * tf_term * 1000000.0 + 0.5) / 1000000.0
            micros[i] = micros.get(i, 0) + round(c * 1000000.0)
    out = []
    for i, m in micros.items():
        s = m / 1000000.0
        out.append((i, math.floor(s * 10000.0 + 0.5) / 10000.0))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcde", min_size=1, max_size=3),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=3),
        min_size=1,
        max_size=4,
    ),
)
def test_bm25_matches_reference_on_random_corpora(spark, doc_lists, qws):
    """The distributed BM25 (inverted-index candidate join + decimal
    sums) must equal a pure-Python reference with identical arithmetic
    on arbitrary corpora — repeated terms, empty docs, query terms
    absent from the corpus, tie storms on a 5-letter alphabet."""
    from data_lake_project_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(doc_lists)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, " ".join(qws))], "query_id int, qtext string"
    )
    got = sorted(
        (r.doc_id, r.bm25)
        for r in bm25_topk(docs, q, k=1000).collect()
    )
    want = sorted(
        _ref_bm25({i: ws for i, ws in enumerate(doc_lists)}, qws)
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),
            st.lists(
                st.text(alphabet="abcde", min_size=1, max_size=3),
                min_size=0,
                max_size=10,
            ),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_importance_weights_matches_reference(spark, rows):
    """dataset.importance_weights must equal a pure-Python reference
    with identical arithmetic (md5 buckets, Laplace-smoothed float
    ratio in the same op order, micro-int sums, final pround(4)) on
    arbitrary target/raw splits — including all-target, all-raw and
    empty-doc corpora."""
    import hashlib
    import math

    from data_lake_project_spark.operators.dataset import importance_weights

    n_buckets = 8
    docs = spark.createDataFrame(
        [
            (i, "t" if is_t else "r", " ".join(ws))
            for i, (is_t, ws) in enumerate(rows)
        ],
        "doc_id long, grp string, text string",
    )
    got = sorted(
        (r.doc_id, r.n_toks, r.importance)
        for r in importance_weights(
            docs, F.col("grp") == "t", n_buckets=n_buckets
        ).collect()
    )

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets

    nt, nr = {}, {}
    tot_t = tot_r = 0
    for is_t, ws in rows:
        for w in ws:
            b = bucket(w)
            if is_t:
                nt[b] = nt.get(b, 0) + 1
                tot_t += 1
            else:
                nr[b] = nr.get(b, 0) + 1
                tot_r += 1
    v = float(n_buckets)
    ratio = {}
    for b in set(nt) | set(nr):
        r = ((nt.get(b, 0) + 1.0) / (tot_t + v)) / (
            (nr.get(b, 0) + 1.0) / (tot_r + v)
        )
        ratio[b] = math.floor(r * 1000000.0 + 0.5) / 1000000.0
    want = []
    for i, (is_t, ws) in enumerate(rows):
        if not ws:
            continue
        micros = sum(round(ratio[bucket(w)] * 1000000.0) for w in ws)
        mean = (micros / 1000000.0) / float(len(ws))
        want.append(
            (i, len(ws), math.floor(mean * 10000.0 + 0.5) / 10000.0)
        )
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# Compaction planner (q154) vs a pure-python next-fit reference, and
# int8 scalar-quantization round-trip error bounds (q155)
# ---------------------------------------------------------------------------

_file_sizes = st.lists(
    st.integers(min_value=1, max_value=3000), min_size=1, max_size=40
)


@settings(max_examples=5, deadline=None)
@given(_file_sizes, _file_sizes)
def test_compaction_plan_matches_reference_on_random_inventories(
    spark, sizes_a, sizes_b
):
    from data_lake_project_spark.operators.layout import compaction_plan

    target = 1600
    rows = [("a", i, s) for i, s in enumerate(sizes_a)] + [
        ("b", i, s) for i, s in enumerate(sizes_b)
    ]
    files = spark.createDataFrame(rows, "part string, id long, sz long")
    got = sorted(
        tuple(r)
        for r in compaction_plan(files, "part", "id", "sz", target).collect()
    )
    expected = []
    for part, sizes in (("a", sizes_a), ("b", sizes_b)):
        cum = 0
        groups: dict[int, list] = {}
        for i, s in enumerate(sizes):
            if s >= target:
                expected.append((part, -1, 1, s, i, i))
                continue
            groups.setdefault(cum // target, []).append((i, s))
            cum += s
        for g, members in groups.items():
            expected.append(
                (
                    part,
                    g,
                    len(members),
                    sum(s for _, s in members),
                    min(i for i, _ in members),
                    max(i for i, _ in members),
                )
            )
    assert got == sorted(expected)


_vec = st.lists(
    st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
    min_size=8,
    max_size=8,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_vec, min_size=2, max_size=12))
def test_sq_quantization_roundtrip_error_bound(spark, vecs):
    """Dequantized values stay within one quantization step of the
    input on every dimension — the SQ8 error contract that makes the
    reconstructed-cosine ranking faithful."""
    from data_lake_project_spark.operators.similarity import (
        sq_encode,
        sq_stats,
        _sq_reconstruct,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    mins, maxs = sq_stats(df, "embedding", 8)
    enc = sq_encode(df, mins, maxs)
    rec = {
        r.vec_id: r.rv
        for r in enc.select(
            "vec_id",
            _sq_reconstruct(F.col("codes"), mins, maxs).alias("rv"),
        ).collect()
    }
    orig = {r.vec_id: [float(x) for x in r.embedding] for r in df.collect()}
    for vid, rv in rec.items():
        for d, (xhat, x) in enumerate(zip(rv, orig[vid])):
            step = (maxs[d] - mins[d]) / 255.0
            assert abs(xhat - x) <= step + 1e-9, (vid, d, xhat, x, step)


@settings(max_examples=5, deadline=None)
@given(_file_sizes, _file_sizes)
def test_compaction_plan_is_stable_under_appends(spark, sizes, appended):
    """The docstring's incremental-replan claim, pinned: appending
    files (higher ids) never changes the group assignment of existing
    small files — new files only ever extend the LAST group or open
    new ones."""
    from data_lake_project_spark.operators.layout import compaction_plan

    target = 1600
    rows1 = [("p", i, s) for i, s in enumerate(sizes)]
    rows2 = rows1 + [
        ("p", len(sizes) + i, s) for i, s in enumerate(appended)
    ]
    f1 = spark.createDataFrame(rows1, "part string, id long, sz long")
    f2 = spark.createDataFrame(rows2, "part string, id long, sz long")

    def memberships(files):
        from pyspark.sql import Window
        from pyspark.sql import functions as FF

        plan = compaction_plan(files, "part", "id", "sz", target)
        # recover per-file membership from the plan's group ranges by
        # recomputing: a small file belongs to the group whose
        # [first_file, last_file] range contains it
        out = {}
        groups = [
            (r.group_id, r.first_file, r.last_file)
            for r in plan.filter(FF.col("group_id") >= 0).collect()
        ]
        for fid, sz in [(i, s) for _, i, s in files.collect()]:
            if sz >= target:
                continue
            for g, lo, hi in groups:
                if lo <= fid <= hi:
                    out[fid] = g
                    break
        return out

    m1 = memberships(f1)
    m2 = memberships(f2)
    for fid, g in m1.items():
        assert m2[fid] == g, (fid, g, m2[fid])


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcd"), st.integers(0, 400)),
        min_size=1,
        max_size=300,
    )
)
def test_theta_overlap_exact_below_sampling_threshold(spark, rows):
    """Theta set algebra is EXACT below the sketch's k=4096 sampling
    threshold — pinned on random memberships against python sets."""
    from itertools import combinations

    from data_lake_project_spark.operators.sketches import theta_overlap

    df = spark.createDataFrame(rows, "s string, u long")
    got = {
        (r.set_a, r.set_b): (r.n_inter, r.n_union, r.n_only_a)
        for r in theta_overlap(df, "s", "u").collect()
    }
    sets: dict[str, set] = {}
    for s, u in rows:
        sets.setdefault(s, set()).add(u)
    for a, b in combinations(sorted(sets), 2):
        assert got[(a, b)] == (
            len(sets[a] & sets[b]),
            len(sets[a] | sets[b]),
            len(sets[a] - sets[b]),
        )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=40,
    )
)
def test_connected_components_match_union_find(spark, raw_pairs):
    """Min-label propagation == a pure-python union-find relabeled to
    min-member ids, on random pair graphs (self-loops dropped)."""
    from data_lake_project_spark.operators.dedup import (
        connected_components,
    )

    pairs = [(a, b) for a, b in raw_pairs if a != b]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r.id: r.cluster_id for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    expected = {}
    for members in comps.values():
        lo = min(members)
        for m in members:
            expected[m] = lo
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.sampled_from("abcdef")),
        min_size=1,
        max_size=60,
    )
)
def test_cooccurrence_lift_matches_reference_on_random_baskets(
    spark, rows
):
    from itertools import combinations
    import math

    from data_lake_project_spark.operators.market import (
        cooccurrence_lift,
    )

    df = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.lift)
        for r in cooccurrence_lift(df, "bk", "it", min_support=1).collect()
    }
    baskets: dict[int, set] = {}
    for bk, it in rows:
        baskets.setdefault(bk, set()).add(it)
    n_baskets = len(baskets)
    item_n: dict[str, int] = {}
    pair_n: dict[tuple, int] = {}
    for items in baskets.values():
        for it in items:
            item_n[it] = item_n.get(it, 0) + 1
        for a, b in combinations(sorted(items), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    expected = {
        p: (
            n,
            item_n[p[0]],
            item_n[p[1]],
            math.floor(
                n * n_baskets / (item_n[p[0]] * item_n[p[1]]) * 10000.0
                + 0.5
            )
            / 10000.0,
        )
        for p, n in pair_n.items()
    }
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),   # cohort day
            st.integers(0, 9),   # age
            st.integers(1, 99999),  # value in cents
        ),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_window_cumsum_matches_exact_reference(spark, rows):
    """The q162 pattern pinned on random value streams: a cumulative
    sum kept DECIMAL through the window equals an exact integer-cents
    reference regardless of row order or partitioning — the property
    a double cumsum cannot guarantee across engines."""
    from pyspark.sql import Window

    from data_lake_project_spark.functions import pround

    df = spark.createDataFrame(
        [(c, a, v / 100.0) for c, a, v in rows],
        "cohort long, age long, value double",
    ).repartition(4)
    g = df.groupBy("cohort", "age").agg(
        F.sum(F.col("value").cast("decimal(27,6)")).alias("__v")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r.cohort, r.age): r.cum
        for r in g.select(
            "cohort",
            "age",
            pround(F.sum("__v").over(w).cast("double"), 2).alias("cum"),
        ).collect()
    }
    cents: dict[tuple, int] = {}
    for c, a, v in rows:
        cents[(c, a)] = cents.get((c, a), 0) + v
    import math

    for (c, a) in got:
        exact = sum(v for (cc, aa), v in cents.items() if cc == c and aa <= a)
        expected = math.floor(exact / 100.0 * 100.0 + 0.5) / 100.0
        assert got[(c, a)] == expected, ((c, a), got[(c, a)], expected)


@given(
    exact=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    approx=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30)),
        max_size=40,
        unique=True,
    ),
)
@settings(max_examples=8, deadline=None)
def test_recall_report_invariants_on_random_topk_sets(
    spark, exact, approx
):
    """q163-q166's report arithmetic on arbitrary top-k sets: counts
    equal the set-theoretic truth, n_hit <= min(n_exact, n_approx),
    recall in [0, 1], and probes missing from the approx side
    zero-fill instead of dropping out."""
    from data_lake_project_spark.operators.similarity import recall_report

    e = spark.createDataFrame(exact, "probe_id int, vec_id int")
    a_rows = approx or [(99, 99)]  # createDataFrame rejects empty lists
    a = spark.createDataFrame(a_rows, "probe_id int, vec_id int")
    if not approx:
        a = a.filter("probe_id < 0")
    got = {r.probe_id: r for r in recall_report(e, a).collect()}
    eset, aset = set(exact), set(approx)
    probes = {p for p, _ in eset}
    aprobes = {p for p, _ in aset}
    # one row per probe from EITHER side: approx-only probes surface
    # as n_exact=0 anomaly rows (full_outer contract, round-9)
    assert set(got) == probes | aprobes
    for p in probes | aprobes:
        ne = sum(1 for q, _ in eset if q == p)
        na = sum(1 for q, _ in aset if q == p)
        nh = len({v for q, v in eset if q == p}
                 & {v for q, v in aset if q == p})
        r = got[p]
        assert (r.n_exact, r.n_approx, r.n_hit) == (ne, na, nh)
        assert r.n_hit <= min(r.n_exact, r.n_approx)
        if ne == 0:
            assert r.recall is None  # anomaly row: recall undefined
        else:
            assert 0.0 <= r.recall <= 1.0
            assert abs(r.recall - nh / ne) < 1e-4


@given(
    ranked=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 25)),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    rel=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 25)),
        min_size=1,
        max_size=30,
        unique=True,
    ),
)
@settings(max_examples=8, deadline=None)
def test_ranking_quality_report_matches_python_reference(
    spark, ranked, rel
):
    """q176's nDCG/MRR arithmetic fuzzed against a pure-Python
    reference on arbitrary ranked lists: per-query ranks are
    re-densified 1..n, metrics recomputed with the SAME decimal
    discount constants, every row must agree."""
    from decimal import Decimal

    from data_lake_project_spark.operators.retrieval import (
        dcg_weight_literals,
        ranking_quality_report,
    )

    k = 4
    ws, cums = dcg_weight_literals(k)
    wd = [Decimal(x) for x in ws]
    cd = [Decimal(x) for x in cums]
    # densify ranks per query: items in (query, id) order -> rank 1..n
    by_q: dict[int, list[int]] = {}
    for q, i in sorted(set(ranked)):
        by_q.setdefault(q, []).append(i)
    rows = [
        (q, i, r + 1)
        for q, items in by_q.items()
        for r, i in enumerate(items)
    ]
    results = spark.createDataFrame(
        rows, "query_id int, doc_id int, rk int"
    )
    relevant = spark.createDataFrame(
        sorted(set(rel)), "query_id int, doc_id int"
    )
    got = {
        r.query_id: r
        for r in ranking_quality_report(results, relevant, k=k).collect()
    }
    relset = set(rel)
    rel_by_q: dict[int, set[int]] = {}
    for q, i in relset:
        rel_by_q.setdefault(q, set()).add(i)
    all_q = set(by_q) | set(rel_by_q)
    assert set(got) == all_q
    for q in all_q:
        retrieved = [(r + 1, i) for r, i in enumerate(by_q.get(q, []))][:k]
        relevant_ids = rel_by_q.get(q, set())
        hits = [(r, i) for r, i in retrieved if i in relevant_ids]
        row = got[q]
        assert row.n_relevant == len(relevant_ids)
        assert row.n_retrieved == len(retrieved)
        assert row.n_rel_retrieved == len(hits)
        if hits:
            first = min(r for r, _ in hits)
            assert row.first_rel_rank == first
            exp_rr = math.floor(1.0 / first * 10000.0 + 0.5) / 10000.0
            assert row.rr == exp_rr
            dcg_dec = sum(wd[r - 1] for r, _ in hits)
            exp_dcg = (
                math.floor(float(dcg_dec) * 10000.0 + 0.5) / 10000.0
            )
            assert row.dcg == exp_dcg
        else:
            assert row.first_rel_rank is None
            assert row.rr == 0.0 and row.dcg == 0.0
        if not relevant_ids:
            assert row.ndcg is None
        else:
            idcg = float(cd[min(len(relevant_ids), k) - 1])
            dcg_f = float(sum(wd[r - 1] for r, _ in hits)) if hits else 0.0
            exp_ndcg = math.floor(dcg_f / idcg * 10000.0 + 0.5) / 10000.0
            assert row.ndcg == exp_ndcg
            assert 0.0 <= row.ndcg <= 1.0


@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=30))
@settings(max_examples=8, deadline=None)
def test_id_bucket_expr_stable_across_integer_widths(spark, ids):
    """The erase layout's bucket derivation must agree between the
    write side and a deletion-request frame regardless of integer
    width (xxhash64 is type-sensitive; the string cast is the
    stability contract) — a width-dependent bucket would prune the
    wrong dirs: a silent no-op erase."""
    from data_lake_project_spark.operators.erasure import id_bucket_expr

    rows = [(i,) for i in set(ids)]
    as_long = spark.createDataFrame(rows, "id long")
    as_int = spark.createDataFrame(
        [(i,) for i in set(ids) if i < 2**31], "id int"
    )
    bl = {
        r.id: r.b
        for r in as_long.select(
            "id", id_bucket_expr("id", 8).alias("b")
        ).collect()
    }
    bi = {
        r.id: r.b
        for r in as_int.select(
            "id", id_bucket_expr("id", 8).alias("b")
        ).collect()
    }
    for i, b in bi.items():
        assert bl[i] == b
    assert all(0 <= b < 8 for b in bl.values())


# --------------------------------------------------------------------------
# perceptual hash: python reference vs the Spark expression lane
# --------------------------------------------------------------------------


def _ahash64_ref(buf: bytes):
    """Pure-python reference of multimodal/phash.ahash64: 64 evenly
    spaced byte samples, bit j set iff sample*64 > sum(samples),
    bands = 16-bit little slices."""
    n = len(buf)
    if n == 0:
        return None
    v = [buf[(j * n) // 64] for j in range(64)]
    tot = sum(v)
    bits = [1 if x * 64 > tot else 0 for x in v]
    return [
        sum(bits[16 * b + i] << i for i in range(16)) for b in range(4)
    ]


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=30, deadline=None)
def test_ahash64_matches_python_reference(spark, buf):
    from data_lake_project_spark.multimodal.phash import ahash64

    df = spark.createDataFrame([(1, bytes(buf))], "doc_id long, image binary")
    r = ahash64(df).collect()[0]
    got = (
        None
        if r.pband0 is None
        else [r.pband0, r.pband1, r.pband2, r.pband3]
    )
    assert got == _ahash64_ref(bytes(buf))


@given(
    st.binary(min_size=1, max_size=200),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=25, deadline=None)
def test_ahash64_uniform_shift_invariance_property(spark, buf, delta):
    """(v+d)*64 > tot+64d <=> v*64 > tot — the aHash invariance the
    q189/q191/q192 twins rely on, for ANY raster and shift that does
    not overflow a byte."""
    from data_lake_project_spark.multimodal.phash import ahash64

    shifted = bytes(min(b + delta, 255) for b in buf)
    if any(b + delta > 255 for b in buf):
        return  # clamping breaks uniformity; invariance only without overflow
    df = spark.createDataFrame(
        [(1, bytes(buf)), (2, shifted)], "doc_id long, image binary"
    )
    got = {
        r.doc_id: (r.pband0, r.pband1, r.pband2, r.pband3)
        for r in ahash64(df).collect()
    }
    assert got[1] == got[2]
