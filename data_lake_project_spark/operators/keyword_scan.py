"""Directional first-match keyword scan (reference
``dags/get_data/kpis_search.py:21-54``).

Reference behavior: iterate pages (optionally last-to-first,
``:25-28``), OCR each, return the FIRST page whose text contains the
keyword case-insensitively (``:50-51``) — an early-exit scan.

Spark mapping: ``filter(contains) → orderBy(page) → limit(1)``.
Catalyst turns this into ``TakeOrderedAndProject`` — every partition
keeps only its best candidate, the driver merges partition winners:
the distributed analogue of early exit, and at 100 TB it reads pages
in parallel instead of serially (strictly better than the reference's
sequential scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_project_spark.functions import contains_ci


def find_first_page(
    pages: DataFrame,
    keyword: str,
    text_col: str = "text",
    page_col: str = "page",
    reverse: bool = False,
) -> DataFrame:
    """First page (per the scan direction) containing ``keyword``.

    ``reverse=True`` mirrors the reference's last-to-first scan for
    documents whose annex tables live at the end
    (``kpis_search.py:25-28``, ``tableExtract.py:285``).
    """
    order = F.col(page_col).desc() if reverse else F.col(page_col).asc()
    return pages.filter(contains_ci(text_col, keyword)).orderBy(order).limit(1)


def find_first_page_per_doc(
    pages: DataFrame,
    keyword: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    page_col: str = "page",
    reverse: bool = False,
) -> DataFrame:
    """Corpus-wide variant: the first matching page of EVERY document
    in one pass (min_by/max_by per doc) — what the per-document loop
    of the reference becomes when 100k documents arrive at once."""
    agg = (
        F.max_by(F.struct(page_col, text_col), F.col(page_col))
        if reverse
        else F.min_by(F.struct(page_col, text_col), F.col(page_col))
    )
    return (
        pages.filter(contains_ci(text_col, keyword))
        .groupBy(doc_col)
        .agg(agg.alias("hit"))
        .select(
            doc_col,
            F.col("hit").getField(page_col).alias(page_col),
            F.col("hit").getField(text_col).alias(text_col),
        )
    )


def find_first_page_per_doc_multi(
    pages: DataFrame,
    keywords: list[str],
    doc_col: str = "doc_id",
    text_col: str = "text",
    page_col: str = "page",
    reverse: bool = False,
) -> DataFrame:
    """Multi-keyword scan in ONE corpus pass.

    The reference loops ``for keyword in keywords`` and re-runs the
    whole PDF scan (and OCR!) per keyword (``rapport_eco.py:59-85``)
    — K full passes. Here the tiny keyword list explodes against each
    page row (a literal-array explode, no join, no broadcast needed),
    the containment filter prunes immediately, and one grouped min/max
    per (doc, keyword) finds every keyword's first page in a single
    scan. Output: (doc, keyword, page, text).
    """
    kws = F.explode(
        F.array(*[F.lit(k) for k in keywords])
    ).alias("keyword")
    tagged = pages.select(doc_col, page_col, text_col, kws).filter(
        contains_ci(F.col(text_col), F.col("keyword"))
    )
    agg = (
        F.max_by(F.struct(page_col, text_col), F.col(page_col))
        if reverse
        else F.min_by(F.struct(page_col, text_col), F.col(page_col))
    )
    return (
        tagged.groupBy(doc_col, "keyword")
        .agg(agg.alias("hit"))
        .select(
            doc_col,
            "keyword",
            F.col("hit").getField(page_col).alias(page_col),
            F.col("hit").getField(text_col).alias(text_col),
        )
    )
