"""Sentence segmentation + sentence-scoped fact extraction.

Reference semantics (``dags/get_data/texteExtract.py``):

- ``custom_seg`` (``:10-23``): a new sentence starts after any token
  in ``{'.', '!', '..', '...', '?'}`` — nothing else splits.
- keyword scoping (``:62-74``): the FIRST sentence containing the
  keyword (case-insensitive substring) is selected, and trimmed to
  start 3 words before the keyword's first word; the value/year/sign
  matcher then runs on that trimmed sentence only.

Tokenization bridge: spaCy separates trailing sentence punctuation
into its own token (``"2015."`` → ``["2015", "."]``), which is what
makes the reference's boundary set work. We reproduce that with a
single regexp pass that splits any trailing ``[.!?]+`` group off a
whitespace token, after which the boundary rule is the *exact*
reference token set. Decimals (``3.5``) and mid-token punctuation
(``production:``) are untouched, as in spaCy. The reference's
``.index()`` crash when the keyword's word carries punctuation
(``"production,"``) is fixed by substring matching — same
fixed-not-copied approach as ``operators/grid.py``.

Scale: one narrow regexp+posexplode pass, one (id)-keyed shuffle to
assemble sentences, then ``textfacts.extract_facts`` which is itself
all JVM expressions. The first-match filter is a min-over-window on
(id), the same bounded pattern as ``keyword_scan``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import contains_ci, tokens

# spaCy-like punct separation: ' \1\2' splits a trailing [.!?]+ group
# into its own whitespace token. No lookaround (RE2-safe, so the same
# pattern runs in DuckDB oracles).
PUNCT_SEP_RE = r"([.!?]+)(\s|$)"

# The reference's exact boundary token set: . .. ... ! ?
BOUNDARY_TOKEN_RE = r"^(?:\.{1,3}|!|\?)$"


def spacyish(col) -> Column:
    """Separate trailing sentence punctuation into standalone tokens
    (the spaCy tokenization the reference's segmenter assumes)."""
    return F.regexp_replace(col, PUNCT_SEP_RE, r" $1$2")


def split_sentences(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sent_idx, sentence) — one row per sentence per document.

    ``sent_idx`` is 0-based document order; ``sentence`` keeps its
    boundary punctuation token (as spaCy's ``sent.text`` does).

    Scale: ZERO shuffles. Everything happens inside the row — boundary
    positions via ``filter(transform(sequence))``, per-sentence token
    slices via ``zip_with(starts, ends)`` — then one ``posexplode``.
    (The first cut posexploded tokens and reassembled sentences with a
    window + groupBy: two full shuffles of every token in the corpus,
    exactly the plan you can't afford at 100 TB.)
    """
    d = docs.select(
        F.col(id_col), tokens(spacyish(F.col(text_col))).alias("__toks")
    )
    n = F.size("__toks")
    # 1-based positions of boundary tokens within the token array
    bidx = F.filter(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(
                F.element_at("__toks", i).rlike(BOUNDARY_TOKEN_RE), i
            ),
        ),
        lambda x: x.isNotNull(),
    )
    d = d.withColumn("__b", bidx)
    # sentence k spans tokens [start_k, end_k] inclusive, where the
    # boundary token ends its own sentence (custom_seg semantics)
    starts = F.concat(
        F.array(F.lit(1)), F.transform("__b", lambda p: p + 1)
    )
    ends = F.concat(F.col("__b"), F.array(n))
    sentences = F.zip_with(
        starts,
        ends,
        lambda s, e: F.when(
            e >= s, F.array_join(F.slice("__toks", s, e - s + 1), " ")
        ),
    )
    out = d.select(
        F.col(id_col),
        F.posexplode(
            F.filter(sentences, lambda x: x.isNotNull() & (x != ""))
        ).alias("sent_idx", "sentence"),
    )
    return out


def keyword_sentence(
    docs: DataFrame,
    keyword: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """First sentence containing ``keyword``, trimmed to start 3 words
    before the keyword (``texteExtract.py:62-74``).

    Output: (id, sent_idx, trimmed_sentence). Documents without a
    match produce no row (the reference returns "Keyword not found").
    If the keyword's first word can't be located as a word substring
    (it spanned a whitespace boundary), the whole sentence is kept
    rather than crashing like the reference's ``.index()``.
    """
    sents = split_sentences(docs, text_col, id_col)
    hit = sents.filter(contains_ci(F.col("sentence"), keyword))
    first = (
        hit.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("sent_idx")
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    kw0 = keyword.split()[0].lower()
    words = F.split(F.col("sentence"), r"\s+")
    # 1-based index of the first word containing the keyword's first
    # word; 0 when absent -> start clamps to 1 (keep whole sentence)
    idx = F.array_position(
        F.transform(words, lambda w_: F.instr(F.lower(w_), F.lit(kw0)) > 0),
        True,
    )
    start = F.greatest(idx - 3, F.lit(1)).cast("int")
    trimmed = F.concat_ws(" ", F.slice(words, start, F.size(words)))
    return first.select(
        id_col, "sent_idx", trimmed.alias("trimmed_sentence")
    )


def sentence_scoped_facts(
    docs: DataFrame,
    keyword: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The reference's full extraction scope: value/year/sign facts
    from the first keyword sentence only, after the 3-words-before
    trim (``texteExtract.py:62-80``) — NOT from the whole page text.

    Output: (id, year, signed_value, v_pos) where v_pos is the token
    position within the trimmed sentence.
    """
    from data_lake_project_spark.operators.textfacts import extract_facts

    scoped = keyword_sentence(docs, keyword, text_col, id_col).select(
        id_col, F.col("trimmed_sentence").alias("text")
    )
    return extract_facts(scoped, text_col="text", id_col=id_col)
