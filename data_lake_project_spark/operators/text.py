"""Text analysis operators (north star + ``texteExtract`` semantics).

All JVM-side expressions — no Python UDFs in this module. Each
operator returns scalar columns so results are oracle-checkable.

- ``token_stats``    — token / distinct-token counts (whitespace +
                       regex tokenizer, BPE-ish word/number/punct split).
- ``numeric_facts``  — count + extraction of number-followed-by-unit
                       spans (``texteExtract.py:27-33`` Matcher semantics).
- ``language_id``    — stopword-hit heuristic over a per-language
                       lexicon (n-gram-free deterministic LID).
- ``quality_score``  — length / punctuation / stopword-ratio composite.
- ``fingerprint``    — md5 content fingerprint of normalized text.
- ``tfidf_top_terms``— per-doc distinctive terms, rational BM25-ish idf.
- ``repetition_stats`` — intra-doc duplicated k-gram fraction.
- ``redact_pii``     — email/URL count + masked-text fingerprint.
- ``posting_lists``  — inverted index: per-term df + bounded postings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import (
    NUMERIC_FACT_RE,
    dec_sum,
    pround,
    spread,
    tokens,
)

# Tiny deterministic stopword lexicons; ordering of dict defines the
# argmax tie-break (first wins).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
    "es": ["el", "la", "y", "los", "de", "un", "una"],
    "de": ["der", "die", "das", "und", "ein", "zu", "von"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"],
}

# BPE-ish pre-tokenizer: words, numbers, or single punctuation marks —
# RE2-safe so the same pattern drives the DuckDB oracle.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, n_distinct, n_bpeish) per document."""
    toks = tokens(F.col(text_col))
    return spread(docs).select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)).alias(
            "n_bpeish"
        ),
    )


def numeric_facts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count of numeric-fact spans (number + unit) per document.

    Reference: spaCy Matcher VALUE pattern, ``texteExtract.py:27-33``.
    """
    return spread(docs).select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(NUMERIC_FACT_RE), 0)
        ).alias("n_facts"),
    )


def language_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-hit language ID: predicted lang = argmax over
    per-language distinct stopword hits; ties break on lexicon order.
    Output: (id, pred_lang, lid_score).
    """
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    best = None
    for lang, score in scores.items():
        entry = F.struct(score.alias("s"), F.lit(lang).alias("l"))
        if best is None:
            best = entry
        else:
            # strictly-greater keeps the earlier language on ties
            best = F.when(score > best.getField("s"), entry).otherwise(best)
    return spread(docs).select(
        F.col(id_col),
        best.getField("l").alias("pred_lang"),
        best.getField("s").cast("int").alias("lid_score"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality: length, mean word length,
    punctuation ratio, stopword ratio → composite in [0, 1].

    Output: (id, n_chars, n_tokens, punct_ratio, stop_ratio, quality).
    """
    txt = F.col(text_col)
    toks = tokens(txt)
    n_tokens = F.size(toks)
    n_chars = F.length(txt)
    n_punct = F.size(F.regexp_extract_all(txt, F.lit(r"[^\w\s]"), 0))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(
        F.filter(
            F.transform(toks, F.lower),
            lambda t: F.array_contains(F.array(*[F.lit(w) for w in all_stop]), t),
        )
    )
    punct_ratio = pround(n_punct / F.greatest(n_chars, F.lit(1)).cast("double"), 4)
    stop_ratio = pround(n_stop / F.greatest(n_tokens, F.lit(1)).cast("double"), 4)
    length_term = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    quality = pround(
        0.5 * length_term + 0.3 * (1.0 - punct_ratio) + 0.2 * stop_ratio, 4
    )
    return spread(docs).select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


def fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized, lowercased
    text (the batch analogue of a rolling document hash).
    Output: (id, fp).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    # No spread(): one regexp + md5 per row is lighter than the
    # repartition shuffle it would buy (shuffle moves the same text
    # bytes the map would read). Measured: spread cost q31 a 2.2x
    # bench regression at sf0.1 for zero map-side win.
    return docs.select(F.col(id_col), F.md5(norm).alias("fp"))


def term_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary: (token, tf, df_docs) — term frequency and
    document frequency per lowercased whitespace token.

    Scale: two-level aggregation keeps every shuffle partial-agg'd —
    (token, doc) counts combine map-side first, then the (token) roll
    -up ships one row per (token, partition). A naive
    ``countDistinct(doc)`` would shuffle the raw exploded token
    stream. The vocabulary (output) is the only thing that grows with
    corpus breadth, not corpus size.
    """
    toks = (
        spread(docs)
        .select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    per_doc = toks.groupBy("tok", id_col).agg(F.count("*").alias("c"))
    return per_doc.groupBy("tok").agg(
        F.sum("c").cast("long").alias("tf"),
        F.count("*").cast("long").alias("df_docs"),
    )


# Character-trigram profiles per language (top distinctive trigrams;
# deterministic, tiny). The n-gram path is robust where stopword LID
# fails (no spaces, short docs); both heuristics compose.
TRIGRAM_PROFILES = {
    "en": ["the", "ing", "and", "ion", "ent", "her", "for", "tha"],
    "fr": ["les", "ent", "des", "ion", "que", "eur", "ait", "our"],
    "es": ["los", "ent", "ado", "que", "cio", "con", "sta", "las"],
    "de": ["der", "ein", "ich", "sch", "und", "die", "che", "ung"],
}


def language_id_ngram(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Char-trigram language ID: predicted lang = argmax over
    per-language profile-trigram hits in the document's trigram set;
    ties break on profile order. All JVM-side: the doc's trigram set
    is built once with ``transform(sequence(...))`` + ``array_distinct``
    and intersected with each tiny profile literal.

    Output: (id, pred_lang_ng, ng_score).
    """
    # Normalized text is materialized as a column BEFORE the trigram
    # lambda: inlining it would re-run the whitespace regex once per
    # trigram position (quadratic in document length).
    d = spread(docs).withColumn(
        "__t", F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    )
    txt = F.col("__t")
    n = F.length(txt)
    grams = F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
                lambda i: txt.substr(i, F.lit(3)),
            )
        ),
    ).otherwise(F.array(txt))
    d = d.withColumn("__g", grams)
    best = None
    for lang, profile in TRIGRAM_PROFILES.items():
        score = F.size(
            F.array_intersect(F.col("__g"), F.array(*[F.lit(g) for g in profile]))
        )
        entry = F.struct(score.alias("s"), F.lit(lang).alias("l"))
        best = entry if best is None else (
            F.when(score > best.getField("s"), entry).otherwise(best)
        )
    return d.select(
        F.col(id_col),
        best.getField("l").alias("pred_lang_ng"),
        best.getField("s").cast("int").alias("ng_score"),
    )


def canonicalize(col: Column) -> Column:
    """Canonical text form for fuzzy-exact dedup: lowercase, strip
    everything but word chars and spaces, collapse runs of whitespace,
    trim. Catches the near-universal crawl dups that differ only in
    case/punctuation/spacing without paying for MinHash."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\w\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def canonical_url(col: Column) -> Column:
    """Canonical URL form for crawl dedup: lowercase, drop the scheme
    and a leading ``www.``, strip ``utm_*`` tracking parameters (the
    analytics noise that makes one page look like many), drop any
    trailing slash on the path. Pure narrow expression.

    Parameter stripping splits the query string and FILTERS the
    parameter array (``p -> NOT startswith(p, 'utm_')``) instead of
    regex-deleting ``utm_[^&]*`` spans: a regex without a boundary
    anchor corrupts parameters that merely CONTAIN 'utm_'
    (``?xutm_a=1`` is not a tracking param), and anchored variants
    need backreferences whose syntax differs between engines — the
    array form is boundary-exact and runs identically in the DuckDB
    oracle (``list_filter``/``starts_with``)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    parts = F.split(c, r"\?", 2)
    path = F.regexp_replace(F.element_at(parts, 1), r"/$", "")
    params = F.filter(
        F.split(F.element_at(parts, 2), "&"),
        lambda p: ~p.startswith("utm_"),
    )
    return F.when(
        (F.size(parts) > 1) & (F.size(params) > 0),
        F.concat(path, F.lit("?"), F.array_join(params, "&")),
    ).otherwise(path)


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Crawl URL dedup: keep the lowest-id row per canonical URL
    (:func:`canonical_url`), count the family. Same single-shuffle
    shape as :func:`~data_lake_project_spark.operators.dedup
    .normalized_dedup` — the canonical form is the shuffle key,
    uniform after canonicalization collapses the tracking-parameter
    fan-out. Output: (id, url, canon_url, n_dups)."""
    from data_lake_project_spark.functions import reserve_columns

    reserve_columns(docs, "url_dedup", "canon_url", "n_dups", "__rn")
    w = Window.partitionBy("canon_url").orderBy(id_col)
    return (
        docs.select(id_col, url_col)
        .withColumn("canon_url", canonical_url(F.col(url_col)))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_dups",
            F.count("*").over(Window.partitionBy("canon_url")).cast("long"),
        )
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(url_col), "canon_url", "n_dups")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k most distinctive terms per document by tf-idf.

    idf is the BM25-style RATIONAL weight ``(N - df + 0.5) /
    (df + 0.5)`` — deliberately no logarithm: +,-,*,/ are IEEE-exact
    and bit-identical on every engine, while ``ln``/``log`` go through
    libm and may differ in the last ulp between JVMs and C engines,
    which would poison a value-hash oracle. Monotone in the same
    direction as log-idf, so rankings agree.

    Plan shape: one exploded (tok, doc) partial-agg'd count, a tok
    roll-up for df (vocabulary-sized), df broadcast-joined back onto
    per-doc counts, then a per-doc top-k window. The only shuffles are
    keyed on tok (uniform) and doc (uniform); the df side is
    vocabulary-sized — small enough to broadcast at any corpus size
    with a bounded vocabulary.

    Output: (id, tok, tf_d, df_docs, tfidf) — tfidf rounded to 4dp
    and ranked (tfidf desc, tok) so float ties cut deterministically.
    """
    toks = (
        spread(docs)
        .select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    # per_doc feeds the df roll-up AND the scoring join — cut once or
    # the token explode+count re-runs per reference (r14 rule)
    per_doc = (
        toks.groupBy(id_col, "tok")
        .agg(F.count("*").cast("long").alias("tf_d"))
        .localCheckpoint(eager=True)
    )
    df_docs = per_doc.groupBy("tok").agg(
        F.count("*").cast("long").alias("df_docs")
    )
    n_docs = docs.agg(F.count("*").cast("double").alias("__n"))
    scored = (
        per_doc.join(F.broadcast(df_docs), "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            pround(
                F.col("tf_d")
                * (F.col("__n") - F.col("df_docs") + F.lit(0.5))
                / (F.col("df_docs") + F.lit(0.5)),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("tok")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(id_col, "tok", "tf_d", "df_docs", "tfidf")
    )


# Deliberately narrow, dialect-portable PII patterns: plain character
# classes only (no \w, no bounded quantifiers), so the identical
# string drives Java regex (Spark) and RE2 (DuckDB oracle) alike.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
URL_RE = r"https?://[^ ]+"


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Intra-document repetition (Gopher/FineWeb-style quality
    signal): the fraction of a document's word ``k``-grams that are
    duplicates of an earlier k-gram in the SAME document. High values
    flag boilerplate/spam/generated loops that corpus-level dedup
    never sees (the doc is globally unique but internally repeated).

    Fully narrow — per-row array expressions, tokenizer hoisted out of
    the lambda (see :func:`~...dedup.shingle_sets` for why), no
    shuffle. Output: (id, n_grams, n_distinct, rep_ratio[4dp]).
    """
    base = spread(docs).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return base.select(
        F.col(id_col), grams.alias("__g")
    ).select(
        F.col(id_col),
        F.size("__g").cast("long").alias("n_grams"),
        F.size(F.array_distinct("__g")).cast("long").alias("n_distinct"),
        pround(
            F.lit(1.0)
            - F.size(F.array_distinct("__g"))
            / F.size("__g").cast("double"),
            4,
        ).alias("rep_ratio"),
    )


# Single-char private-use sentinels: each masked span collapses to one
# char, so counting is length arithmetic (no regex) and the final
# "<EMAIL>"/"<URL>" tokens are literal replaces. PUA chars cannot occur
# in real corpus text.
_PII_S_EMAIL = "\ue000"
_PII_S_URL = "\ue001"


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and mask email/URL spans — the scrubbing pass a training
    corpus runs before packing. Exactly TWO regex passes per document
    (one per pattern): spans are first collapsed to single-char
    sentinels, counts fall out as length arithmetic on the sentinel
    text (cheap, regex-free), and the user-facing mask tokens are
    literal replaces of the sentinels. The old shape ran four regex
    passes (two ``regexp_extract_all`` counts + two masking
    ``regexp_replace``) and was the suite's slowest query.

    Counts reflect spans present in the MASKED output: an email inside
    a URL run is swallowed by the URL mask (matching what the masked
    text actually says) rather than double-counted from the raw text.

    The masked text is fingerprinted (md5) rather than returned,
    keeping operator output scalar and oracle-hashable.

    Output: (id, n_emails, n_urls, redacted_fp).
    """
    t = F.col(text_col)
    m = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, _PII_S_EMAIL), URL_RE, _PII_S_URL
    )
    # __m is projected FIRST and referenced 5x from the parent select:
    # CollapseProject keeps multi-referenced non-trivial expressions in
    # their own Project, so the two regex passes run once per row.
    return (
        spread(docs)
        .select(F.col(id_col), m.alias("__m"))
        .select(
            F.col(id_col),
            (
                F.length("__m")
                - F.length(F.replace(F.col("__m"), F.lit(_PII_S_EMAIL), F.lit("")))
            )
            .cast("long")
            .alias("n_emails"),
            (
                F.length("__m")
                - F.length(F.replace(F.col("__m"), F.lit(_PII_S_URL), F.lit("")))
            )
            .cast("long")
            .alias("n_urls"),
            F.md5(
                F.replace(
                    F.replace(F.col("__m"), F.lit(_PII_S_EMAIL), F.lit("<EMAIL>")),
                    F.lit(_PII_S_URL),
                    F.lit("<URL>"),
                )
            ).alias("redacted_fp"),
        )
    )


def posting_lists(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_k: int = 20,
) -> DataFrame:
    """Inverted index over lowercased whitespace tokens: per term, the
    document frequency and a bounded, sorted sample of posting ids.

    Scale: distinct (tok, id) pairs, ONE shuffle keyed on tok. A
    ``collect_set``-then-slice would buffer every id of a hot term in
    one agg buffer (the classic inverted-index skew point); instead a
    per-term ``row_number`` window ranks ids and only ranks ≤
    ``sample_k`` enter ``collect_list`` (nulls skipped), so no array
    ever exceeds ``sample_k``. df is exact via ``max(rank)``; the
    groupBy after the window reuses the window's tok partitioning —
    Catalyst plans a single exchange. A full posting-list export would
    instead write the exploded (tok, id) pairs as a bucketed table —
    the bounded sample is the queryable summary.

    Output: (tok, df_docs, postings array<long>).
    """
    pairs = (
        spread(docs)
        .select(
            F.explode(
                F.array_distinct(tokens(F.lower(F.col(text_col))))
            ).alias("tok"),
            F.col(id_col),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy("tok").orderBy(id_col)
    ranked = pairs.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy("tok").agg(
        F.max("__rn").cast("long").alias("df_docs"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("__rn") <= sample_k, F.col(id_col))
            )
        ).alias("postings"),
    )


def rare_token_stats(
    docs: DataFrame,
    threshold: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """OOV/rarity quality signal: per doc, how many token OCCURRENCES
    use a corpus-rare token (corpus-wide count <= ``threshold``).

    The integer-count cousin of an n-gram LM perplexity score: a doc
    dense in corpus-rare tokens is either high-value novelty or junk
    (OCR noise, code in a prose corpus, mojibake) — either way the
    mixture wants it surfaced. Rare counts are INTEGERS (exact on any
    engine); the only float is the final rounded ratio, so the score
    is oracle-stable where a log-probability would wobble in the last
    ulp of libm.

    Plan shape (100 TB): one wide shuffle builds the vocabulary
    (partial-agg'd token counts — map-side combine does the heavy
    lifting on repeated tokens); the occurrence stream joins the
    vocab on the token key (both sides shuffle-partitioned by token,
    the standard co-partitioned join). Per-doc roll-up is the second
    keyed shuffle. Nothing driver-sized; the vocab grows with corpus
    BREADTH, not size.
    """
    toks = (
        spread(docs)
        .select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("__vc"))
    return (
        toks.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.count(F.when(F.col("__vc") <= threshold, 1))
            .cast("long")
            .alias("n_rare"),
        )
        .withColumn(
            "rare_frac",
            pround(F.col("n_rare") / F.greatest("n_toks", F.lit(1)), 4),
        )
    )


def ngram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style corpus LM quality score: per doc, the mean add-one
    smoothed bigram log-probability under a model trained on the
    corpus itself (self-scoring — the standard first pass when no
    external KenLM model ships with the pipeline).

    score(doc) = avg over bigram occurrences of
    ``ln((c2(prefix, word) + 1) / (c1(prefix) + V))`` where ``c2`` is
    the corpus bigram count, ``c1`` the prefix continuation total and
    ``V`` the continuation-vocabulary size. Low scores flag docs whose
    word transitions the corpus has rarely seen — mojibake, OCR noise,
    boilerplate soup — the same decision boundary CCNet draws with
    wiki-LM perplexity. Docs with < 2 tokens carry no bigram and drop.

    Plan shape (100 TB): the occurrence stream pre-aggregates to
    (doc, prefix, word, occ_n) in ONE keyed shuffle with map-side
    combine; the model (c2) and its prefix marginal (c1) derive from
    that SAME aggregate (vocabulary-sized, corpus-breadth not
    corpus-size); scoring is two co-partitioned joins on the bigram /
    prefix key plus a broadcast 1-row V. Per-term logprobs sum as
    exact decimals (``dec_sum``) so shuffle order can never wobble
    the mean; the only floats are libm ``ln`` calls on integer ratios.
    No Python UDFs, nothing driver-sized.
    """
    toks = F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != "")
    grams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("prefix"), b.alias("word")),
        ),
    ).otherwise(F.array().cast("array<struct<prefix:string,word:string>>"))
    occ = (
        spread(docs)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, "g.prefix", "g.word")
        .groupBy(id_col, "prefix", "word")
        .agg(F.count("*").alias("__occ_n"))
        # The occurrence stream feeds the model (c2 -> c1 -> model),
        # the vocabulary count AND the scoring join — uncut, the
        # tokenize+bigram explode re-ran once per reference (~5x; no
        # CSE across join branches). One eager cut = one corpus pass
        # (r14 interleaved A/B at sf0.1: 5.97 -> 4.08 s medians; a
        # further c2 cut measured as a wash and was left out). On a
        # cluster flip to reliable checkpoint, as elsewhere.
        .localCheckpoint(eager=True)
    )
    c2 = occ.groupBy("prefix", "word").agg(F.sum("__occ_n").alias("__c2"))
    c1 = c2.groupBy("prefix").agg(F.sum("__c2").alias("__c1"))
    v = c2.select("word").distinct().agg(F.count("*").alias("__v"))
    # Fold the prefix marginal into the (vocabulary-sized) model FIRST
    # so the data-sized occurrence stream is exchanged once, for a
    # single co-partitioned join — not once per model table.
    model = c2.join(c1, "prefix")
    scored = (
        occ.join(model, ["prefix", "word"])
        .crossJoin(F.broadcast(v))
        .withColumn(
            "__lp",
            F.col("__occ_n")
            * F.log((F.col("__c2") + 1) / (F.col("__c1") + F.col("__v"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("__occ_n").cast("long").alias("n_bigrams"),
            dec_sum(F.col("__lp")).alias("__lpsum"),
        )
        .select(
            id_col,
            "n_bigrams",
            pround(F.col("__lpsum") / F.col("n_bigrams"), 6).alias(
                "avg_logprob"
            ),
        )
    )


PHONE_RE = r"[+][0-9]{7,12}"
IDNUM_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_S_PHONE = "\ue002"
_PII_S_ID = "\ue003"


def pii_report(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Typed PII exposure report per group: how many documents carry
    each PII class and how many spans total — the compliance readout
    a corpus owner checks BEFORE deciding what ``redact_pii`` must
    scrub. Types: email, international phone (+digits), SSN-shaped id.

    Same engine-portable sentinel trick as ``redact_pii``: one regex
    pass per type collapses spans to a private-use char (longest/most
    specific pattern first so an email's digits can't re-match as a
    phone), then every count is length arithmetic — no
    ``regexp_extract_all`` arrays, no second regex evaluation. All
    patterns are RE2-safe (no backrefs/lookaround) so the DuckDB
    oracle runs them verbatim.

    Output: (group..., docs_scanned, docs_email, n_email, docs_phone,
    n_phone, docs_id, n_id) — one vocabulary-sized partial-agg'd
    groupBy over a pure narrow map.
    """
    group_cols = group_cols or []
    m = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), EMAIL_RE, _PII_S_EMAIL),
            IDNUM_RE,
            _PII_S_ID,
        ),
        PHONE_RE,
        _PII_S_PHONE,
    )

    def n_of(s: str) -> Column:
        return (
            F.length("__m")
            - F.length(F.replace(F.col("__m"), F.lit(s), F.lit("")))
        ).cast("long")

    staged = spread(docs).select(*group_cols, m.alias("__m")).select(
        *group_cols,
        n_of(_PII_S_EMAIL).alias("__e"),
        n_of(_PII_S_PHONE).alias("__p"),
        n_of(_PII_S_ID).alias("__i"),
    )
    return staged.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("docs_scanned"),
        F.count(F.when(F.col("__e") > 0, 1)).cast("long").alias("docs_email"),
        F.sum("__e").cast("long").alias("n_email"),
        F.count(F.when(F.col("__p") > 0, 1)).cast("long").alias("docs_phone"),
        F.sum("__p").cast("long").alias("n_phone"),
        F.count(F.when(F.col("__i") > 0, 1)).cast("long").alias("docs_id"),
        F.sum("__i").cast("long").alias("n_id"),
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    mask: int = 32,
) -> DataFrame:
    """Content-defined chunking by ROLLING hash — the rsync/LBFS
    boundary trick at token granularity: a chunk boundary falls after
    token i exactly when the hash of the ``window``-token context
    ending at i is ``0 mod mask`` (expected chunk length ~``mask``
    tokens). Because the boundary decision depends ONLY on the local
    window, inserting or deleting text re-chunks the edited
    neighborhood and NOTHING ELSE — unlike fixed-size chunking, where
    one inserted token shifts every later boundary and defeats
    chunk-hash dedup/delta-sync (the CDC self-healing property,
    CI-pinned). The chunk fingerprint table this emits is the unit of
    cross-document duplicate detection at sub-document granularity
    and of delta storage.

    Hash: first 8 md5 hex chars of the space-joined window as a
    BIGINT (the engine's portable-hash idiom — bit-identical in any
    md5-capable engine, no RNG, no seed skew). All positions evaluate
    as one array expression per row; ONE explode emits the chunks —
    zero shuffles before the caller's own aggregation.

    Output: (id, chunk_id, start_tok, n_tokens, chunk_hash) — chunk_id
    0-based in document order, start_tok 1-based, chunk_hash the md5
    of the space-joined chunk text.

    Scale: pure map + one generator; cost is O(tokens) hash
    arithmetic per row. Documents are independent — no skew beyond
    document length itself (bound upstream by the q97-class
    splitter).
    """
    if window < 1 or mask < 1:
        raise ValueError("cdc_chunks: window and mask must be >= 1")
    # The token array is materialized in its OWN Project first: the
    # boundary expression below reads it O(tokens) times via
    # element_at, and referencing the raw split+filter TREE that many
    # times re-tokenizes the string per reference — O(n^2 * len) per
    # row (measured 7.6x at 10x SF before this split; CollapseProject
    # keeps a multi-referenced non-trivial alias un-inlined, the
    # round-3 regex-tree rule).
    base = docs.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda x: x != "").alias(
            "__toks"
        ),
    )
    toks = F.col("__toks")
    n = F.size(toks)

    def win_hash(i):
        # md5 of the window ending at 1-based token position i
        joined = F.concat_ws(
            " ",
            *[
                F.element_at(toks, i - (window - 1) + j)
                for j in range(window)
            ],
        )
        return F.conv(F.substring(F.md5(joined), 1, 8), 16, 10).cast(
            "long"
        )

    # boundary AFTER position i (i >= window so the window is full;
    # never after the last token — that cut is implicit). The n-1 <
    # window guard matters: Spark's sequence(a, b) auto-steps -1 when
    # a > b, which would emit DESCENDING bogus positions for short
    # docs instead of no positions.
    bnd = F.when(
        n - 1 >= window,
        F.filter(
            F.sequence(F.lit(window), n - 1),
            lambda i: F.pmod(win_hash(i), F.lit(mask)) == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(1)), F.transform(bnd, lambda b: b + 1))
    ends = F.concat(bnd, F.array(n))
    spans = F.filter(
        F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))),
        lambda p: p["s"] <= p["e"],
    )
    out = base.select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(spans).alias("chunk_id", "__span"),
    )
    chunk = F.slice(
        F.col("__toks"),
        F.col("__span.s"),
        F.col("__span.e") - F.col("__span.s") + 1,
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("__span.s").cast("long").alias("start_tok"),
        (F.col("__span.e") - F.col("__span.s") + 1)
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )
