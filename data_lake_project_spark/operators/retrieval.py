"""Lexical and hybrid retrieval operators (exact BM25, reciprocal-
rank fusion).

Completes the RAG retrieval ladder (SURVEY.md §2.9 extension):
q142/q143 are the dense (embedding) lanes; BM25 is the lexical lane a
production retrieval stack always runs next to them, and RRF is the
standard zero-tuning way to fuse the two ranked lists (Cormack et
al., "Reciprocal rank fusion outperforms Condorcet and individual
rank learning methods", SIGIR 2009). The reference has no retrieval
operator; this extends its keyword-containment search
(``kpis_search.py:50``) to ranked relevance retrieval.

Engine-exactness: BM25's idf is the RATIONAL form
``(N - df + 0.5) / (df + 0.5)`` — the same no-logarithm choice as
``text.tfidf_top_terms`` (+,-,*,/ are correctly-rounded IEEE ops,
``ln`` goes through libm and may differ in the last ulp between
engines, poisoning a value-hash oracle; the rational weight is
monotone with log-idf so rankings agree). Per-term contributions are
rounded then summed as exact decimals (``dec_sum``) so aggregation
order can never change a score.

Scale (100 TB): the term join is inverted-index shaped — query terms
(a tiny broadcast) equi-join the per-(doc, term) frequency table, so
only documents containing at least one query term are ever scored;
df and corpus stats are vocabulary-/1-row-sized broadcasts. No
all-pairs stage anywhere; the only corpus-sized shuffles are the
(doc, tok) partial-agg'd counts every text operator already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import dec_sum, pround, tokens
from data_lake_project_spark.functions import spread


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Exact BM25 top-k documents per query.

    ``score(q, d) = sum over distinct terms t of q:
    idf(t) * tf(t,d) * (k1+1) / (tf(t,d) + k1*(1 - b + b*dl/avgdl))``
    with the rational idf ``(N - df + 0.5) / (df + 0.5)``. N and
    avgdl are computed over documents with at least one token.
    Deterministic: per-term contributions ``pround(.., 6)`` then
    decimal-summed; final score ``pround(.., 4)``; rank tie-break
    ``(bm25 DESC, doc_id)``.

    Output: (query_id, doc_id, bm25, rk) for the top ``k`` per query.
    """
    toks = (
        spread(docs)
        .select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    per_doc = toks.groupBy(id_col, "tok").agg(
        F.count("*").cast("long").alias("__tf")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").cast("long").alias("__dl"))
    df_docs = per_doc.groupBy("tok").agg(
        F.count("*").cast("long").alias("__df")
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("__n"),
        (
            F.sum("__dl").cast("double") / F.count("*").cast("double")
        ).alias("__avgdl"),
    )
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                tokens(F.lower(F.col(query_text_col)))
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    # constants folded in Python so the Spark literals and the oracle
    # SQL literals parse to the identical doubles
    k1_lit, kplus_lit, b_lit, omb_lit = k1, k1 + 1.0, b, 1.0 - b
    idf = (F.col("__n") - F.col("__df") + F.lit(0.5)) / (
        F.col("__df") + F.lit(0.5)
    )
    tf_term = (F.col("__tf") * F.lit(kplus_lit)) / (
        F.col("__tf")
        + F.lit(k1_lit)
        * (
            F.lit(omb_lit)
            + F.lit(b_lit) * (F.col("__dl") / F.col("__avgdl"))
        )
    )
    contrib = (
        F.broadcast(qterms)
        .join(per_doc, "tok")
        .join(dl, id_col)
        .join(F.broadcast(df_docs), "tok")
        .join(F.broadcast(stats))
        .select(
            query_id_col,
            id_col,
            pround(idf * tf_term, 6).alias("__c"),
        )
    )
    scored = contrib.groupBy(query_id_col, id_col).agg(
        pround(dec_sum(F.col("__c"), 6), 4).alias("bm25")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "bm25", "rk")
    )


def rrf_fuse(
    lane_a: DataFrame,
    lane_b: DataFrame,
    keys: list[str],
    rank_col: str = "rk",
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists: ``rrf = 1/(k0 +
    rank_a) + 1/(k0 + rank_b)``, with a missing lane contributing 0
    (standard RRF over top-k lists). ``keys`` = [group_col, item_col]
    — e.g. ``["query_id", "doc_id"]``; each lane must carry
    ``rank_col`` (1-based within group).

    Deterministic: each 1/(k0+r) division is a single correctly-
    rounded IEEE op, the two-term sum has a fixed written order, and
    the final rank tie-breaks ``(rrf DESC, item)``. Output:
    (*keys, rrf, rk_a, rk_b, rk) — absent-lane ranks reported as 0.

    Scale: both inputs are already top-k-per-group sized (queries x
    k rows) — the fusion join is trivially small whatever the corpus
    was; fuse N lanes by folding this pairwise.
    """
    group_col, item_col = keys
    a = lane_a.select(*keys, F.col(rank_col).alias("__ra"))
    bdf = lane_b.select(*keys, F.col(rank_col).alias("__rb"))
    fused = a.join(bdf, keys, "full_outer").select(
        *keys,
        pround(
            F.coalesce(
                F.lit(1.0) / (F.lit(float(k0)) + F.col("__ra")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(k0)) + F.col("__rb")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
        F.coalesce(F.col("__ra"), F.lit(0)).cast("long").alias("rk_a"),
        F.coalesce(F.col("__rb"), F.lit(0)).cast("long").alias("rk_b"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("rrf").desc(), F.col(item_col)
    )
    return (
        fused.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
