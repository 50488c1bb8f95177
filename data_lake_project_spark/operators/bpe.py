"""Distributed BPE (byte-pair encoding) vocabulary learning.

The tokenizer-training step of an LLM data pipeline: learn the merge
table that turns characters into subword units, directly from the
corpus, Spark-first. The classic Sennrich recipe trains on the WORD
VOCABULARY (unique word → count), not the raw corpus — so after ONE
corpus-sized aggregation, every merge iteration runs over
vocabulary-sized data:

- pair counting = explode each word's adjacent symbol pairs weighted
  by the word count → partial-agg'd groupBy (map-side combine; the
  shuffle carries (pair, partial-count) rows, never the corpus);
- the winning pair is a 1-row model-sized collect (count DESC, then
  (left, right) ASC — total order, deterministic ties);
- the merge applies as a JVM ``aggregate`` fold over each symbol
  array (left-to-right non-overlapping, exactly Sennrich's i-walk);
- ``localCheckpoint`` per iteration cuts the growing lineage, the
  same discipline as ``connected_components``/``pagerank``.

At 100 TB: the corpus pass is one shuffle; the word vocabulary is
bounded (natural-language vocabularies grow ~Heaps' law, sublinear in
corpus size) and stays distributed — nothing vocabulary-sized is ever
collected; k merges = k small jobs.

No SQL oracle (iterative, like q88's k-means): correctness is pinned
by an exact golden test against a pure-Python reference BPE
(`tests/test_operators.py::test_bpe_merges_match_reference`), plus
determinism.

Reference parity: the reference has no tokenizer training; this
extends the LLM-pipeline surface (SURVEY.md §2.9) like the
dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lake_project_spark.functions import pround, tokens

END_OF_WORD = "</w>"

_EMPTY_STR_ARRAY = "CAST(array() AS ARRAY<STRING>)"


def word_vocab(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """ONE corpus pass → (word, count) vocabulary, the only
    corpus-sized job in BPE training."""
    w = F.explode(tokens(text_col)).alias("__w")
    out = docs.select(w).filter(F.length("__w") > 0)
    if lowercase:
        out = out.select(F.lower("__w").alias("__w"))
    return out.groupBy("__w").agg(F.count("*").alias("__n"))


def _merge_fold(a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a+b inside ``__syms`` — a linear JVM fold, equivalent to the
    reference implementation's index walk (a just-merged token can
    only absorb the NEXT symbol if it literally equals ``a`` again,
    which the concatenation makes impossible)."""
    merged = a + b
    return F.aggregate(
        "__syms",
        F.expr(_EMPTY_STR_ARRAY),
        lambda out, s: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(out, F.lit(1), F.size(out) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(out, F.array(s))),
    )


def bpe_merges(
    docs: DataFrame,
    k_merges: int = 16,
    text_col: str = "text",
    min_pair_count: int = 2,
    lowercase: bool = True,
    vocab_partitions: int | None = None,
) -> DataFrame:
    """Learn up to ``k_merges`` BPE merges over the corpus.

    Output: (step, left, right, merged, pair_count) — the merge table
    in training order, which IS the tokenizer artifact (applying the
    merges in order tokenizes new text). Words are split to
    characters plus a terminal ``</w>`` marker (the standard
    end-of-word sentinel, so "low"/"lowest" share the stem but not the
    suffix boundary). Stops early when the best remaining pair occurs
    fewer than ``min_pair_count`` times (weighted by word counts;
    overlapping repeats count per position, as in the reference
    implementation).

    Deterministic: winner = max count, ties broken (left, right)
    ascending — a total order, no RNG.

    ``vocab_partitions`` sizes the compacted vocabulary frame each of
    the k iteration jobs runs over. Default: a quarter of
    ``defaultParallelism``, floored at 8 — on local[32] that is the
    measured sweet spot (each merge job schedules a handful of tasks,
    not a corpus-wide wave), and on a 1000-core cluster it scales the
    per-iteration parallelism with the cluster instead of serializing
    a billion-word vocabulary through 8 tasks.
    """
    if k_merges < 1:
        raise ValueError("bpe_merges: k_merges must be >= 1")
    vocab = word_vocab(docs, text_col, lowercase=lowercase)
    # The vocabulary is Heaps'-law sized (orders of magnitude smaller
    # than the corpus): pack it into few partitions so each of the k
    # iteration jobs schedules few tasks, not a corpus-wide task wave.
    if vocab_partitions is None:
        vocab_partitions = max(
            8, docs.sparkSession.sparkContext.defaultParallelism // 4
        )
    cur = (
        vocab.coalesce(vocab_partitions)
        .select(
            F.concat(
                F.split("__w", ""), F.array(F.lit(END_OF_WORD))
            ).alias("__syms"),
            "__n",
        )
        # lazy localCheckpoint: materialized BY the pair-count job of
        # the same iteration (one job per merge instead of two), still
        # cuts the fold-in-fold lineage that would otherwise nest k
        # aggregate expressions deep
        .localCheckpoint(eager=False)
    )

    pair_expr = F.explode(
        F.expr(
            "transform(sequence(0, size(__syms) - 2), "
            "i -> struct(__syms[i] AS a, __syms[i+1] AS b))"
        )
    ).alias("__p")

    merges: list[tuple] = []
    for step in range(1, k_merges + 1):
        top = (
            cur.filter(F.size("__syms") > 1)
            .select(pair_expr, "__n")
            .groupBy("__p.a", "__p.b")
            .agg(F.sum("__n").alias("__cnt"))
            .orderBy(F.col("__cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["__cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["__cnt"])
        merges.append((step, a, b, a + b, cnt))
        cur = cur.select(
            _merge_fold(a, b).alias("__syms"), "__n"
        ).localCheckpoint(eager=False)

    return docs.sparkSession.createDataFrame(
        merges,
        "step int, left string, right string, merged string, "
        "pair_count long",
    )


_SEP = "\x1f"  # unit-separator control char: cannot occur in tokens()
               # output of normal text; stripped defensively anyway


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize text with a FIXED merge table — the serving side of
    :func:`bpe_merges` (tokenizers train once and apply everywhere).
    Output: (id, token) rows, one per subword occurrence, in no
    guaranteed order (aggregate downstream).

    Pure JVM string algebra, zero Python: each word becomes a
    symbol string with every symbol WRAPPED in a separator pair
    (``␟c␟␟h␟…␟</w>␟``), and each merge (a, b) is ONE global
    ``replace('␟a␟␟b␟' → '␟ab␟')``. The wrapping makes the match
    symbol-anchored (a pattern can never match the tail of a longer
    symbol) and makes consecutive merge sites self-delimiting, so
    left-to-right non-overlapping ``replace`` is EXACTLY the BPE
    merge fold (``test_bpe_apply_matches_reference``). Engine-
    portable: DuckDB's ``replace`` has identical semantics, so the
    whole tokenizer is oracle-checkable (q140).

    Scale: narrow per-row map over the exploded word stream — no
    shuffle, no UDF; k merges = k codegen'd string replaces.
    """
    w = F.explode(tokens(text_col)).alias("__w")
    out = docs.select(F.col(id_col), w).filter(F.length("__w") > 0)
    if lowercase:
        out = out.select(id_col, F.lower("__w").alias("__w"))
    # defensively drop any literal separator chars from the input
    clean = F.replace(F.col("__w"), F.lit(_SEP), F.lit(""))
    sym = F.concat(
        F.concat_ws(
            "",
            F.transform(
                F.split(clean, ""), lambda c: F.concat(F.lit(_SEP), c, F.lit(_SEP))
            ),
        ),
        F.lit(_SEP + END_OF_WORD + _SEP),
    )
    for a, b in merges:
        sym = F.replace(
            sym,
            F.lit(_SEP + a + _SEP + _SEP + b + _SEP),
            F.lit(_SEP + a + b + _SEP),
        )
    # strip the outer wraps, split on the inter-symbol double-sep
    toks = F.split(
        F.substring(sym, 2, F.length(sym) - 2), _SEP + _SEP
    )
    return out.select(
        F.col(id_col), F.explode(toks).alias("token")
    )


def subword_compression(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subword compression ratio under a fixed merge
    table: ``n_subtoks / n_chars`` — the tokens-per-character quality
    signal a curation pipeline uses to flag text the tokenizer
    compresses poorly (gibberish, foreign scripts, binary spill all
    tokenize near one subword per character; clean in-domain prose
    compresses far below that). Documents with no tokens get
    ``n_subtoks = 0``; documents with empty text are excluded (no
    denominator).

    Output: (id, n_subtoks, n_chars, compression) — ratio
    ``pround(.., 4)``, char count = ``length(text)``.

    Scale: rides :func:`bpe_apply`'s narrow zero-UDF map plus one
    doc-keyed count shuffle; the length projection never leaves the
    row.
    """
    counts = (
        bpe_apply(docs, merges, text_col=text_col, id_col=id_col)
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_subtoks"))
    )
    base = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    ).filter(F.col("n_chars") > 0)
    return (
        base.join(counts, id_col, "left")
        .na.fill({"n_subtoks": 0})
        .select(
            id_col,
            "n_subtoks",
            "n_chars",
            pround(
                F.col("n_subtoks").cast("double")
                / F.col("n_chars").cast("double"),
                4,
            ).alias("compression"),
        )
    )
