"""End-to-end document pipelines — the engine equivalents of the
reference's entry points, each as ONE lazy Spark plan instead of an
Airflow DAG passing files through /tmp (``dags/GetData.py:129-168``):

- ``extract_tables``     ≙ ``budgetEco.extract_table``
  (``budgetEco.py:72-79`` → ``tableExtract.main:230-279``):
  landing zone → pages → OCR → keyword page scan → table detect →
  crop → crop-text filter → grid reconstruction.
- ``extract_text_facts`` ≙ ``budgetEco.extract_text``
  (``budgetEco.py:81-89`` → ``texteExtract.py:40-129``):
  pages → OCR text → keyword page scan → value/year/sign facts.
- ``extract_figures``    ≙ ``activity_test.extract_Graphes_from_pdf``
  (``activity_test.py:90-119`` → ``graphData.py:53-165``):
  pages → layout detect → Figure blocks → crop → DePlot parse.

Model stages (rasterize/OCR/detect/DePlot) are injectable callables —
deterministic fakes by default (this container has no model
runtimes); on a cluster image with the extras installed the same
pipelines run with real backends. Every intermediate is a DataFrame,
so each stage can be checkpointed to a lakehouse zone
(``lakehouse.Lakehouse``) instead of /tmp files.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_project_spark.multimodal import (
    explode_pages,
    fake_ocr_lines,
    fake_rasterize,
    ocr_pages,
)
from data_lake_project_spark.multimodal.tables import (
    crop_boxes,
    detect_layout,
    detect_tables,
    fake_layout_detect,
    fake_table_detect,
    figure_blocks,
    filter_crops_by_text,
)
from data_lake_project_spark.operators.grid import grid_reconstruct
from data_lake_project_spark.operators.keyword_scan import find_first_page_per_doc
from data_lake_project_spark.operators.textfacts import extract_facts


def _page_text(lines: DataFrame) -> DataFrame:
    """Per-page text in reading order (``ocr.py:58-67`` joined lines)."""
    return lines.groupBy("path", "page").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("y1", "x1", "text"))),
                lambda s: s.getField("text"),
            ),
        ).alias("text")
    )


def extract_tables(
    docs: DataFrame,
    kpi: str,
    search: str,
    reverse: bool = True,
    rasterize: Callable = fake_rasterize,
    ocr: Callable = fake_ocr_lines,
    detector: Callable = fake_table_detect,
) -> DataFrame:
    """Corpus-wide table extraction: for every document, find the
    scan-direction-first page whose text contains ``kpi``, detect
    tables there, keep crops whose text mentions ``search``, and
    reconstruct each as a long-form grid.

    Output: (doc_id, page, row_idx, col_idx, cell_text) — ``doc_id``
    is a stable hash of the document path.
    """
    pages = explode_pages(docs, rasterize=rasterize)
    lines = ocr_pages(pages, ocr=ocr)
    hits = find_first_page_per_doc(
        _page_text(lines), kpi, doc_col="path", reverse=reverse
    ).select("path", "page")

    hit_pages = pages.join(F.broadcast(hits), ["path", "page"])
    crops = filter_crops_by_text(
        crop_boxes(detect_tables(hit_pages, detector=detector)), lines, search
    )
    # OCR lines inside surviving crops feed the grid reconstruction
    in_crop = lines.join(
        F.broadcast(crops.select("path", "page", "x1", "y1", "x2", "y2")),
        ["path", "page"],
    ).filter(
        ((lines.x1 + lines.x2) / 2).between(crops.x1, crops.x2)
        & ((lines.y1 + lines.y2) / 2).between(crops.y1, crops.y2)
    )
    ocr_df = in_crop.select(
        F.abs(F.hash("path")).cast("long").alias("doc_id"),
        "page",
        lines.x1.cast("double").alias("x1"),
        lines.y1.cast("double").alias("y1"),
        lines.x2.cast("double").alias("x2"),
        lines.y2.cast("double").alias("y2"),
        "text",
    )
    return grid_reconstruct(ocr_df)


def extract_text_facts(
    docs: DataFrame,
    keyword: str,
    rasterize: Callable = fake_rasterize,
    ocr: Callable = fake_ocr_lines,
    sentence_scope: bool = True,
) -> DataFrame:
    """Corpus-wide numeric-fact extraction: first page per document
    containing ``keyword`` → facts from that page.

    ``sentence_scope=True`` (default) is the reference's actual
    behavior (``texteExtract.py:60-80``): segment the page, take the
    FIRST sentence containing the keyword, trim 3 words before it,
    run the value/year/sign matcher on that sentence only.
    ``sentence_scope=False`` keeps the round-1 whole-page scope.

    Output: (doc_id=path, year, signed_value, v_pos).
    """
    pages = explode_pages(docs, rasterize=rasterize)
    texts = _page_text(ocr_pages(pages, ocr=ocr))
    hits = find_first_page_per_doc(texts, keyword, doc_col="path")
    page_docs = hits.select("path", "text")
    if sentence_scope:
        from data_lake_project_spark.operators.sentences import (
            sentence_scoped_facts,
        )

        return sentence_scoped_facts(page_docs, keyword, id_col="path")
    return extract_facts(page_docs, id_col="path")


def extract_text_facts_multi(
    docs: DataFrame,
    keywords: list[str],
    rasterize: Callable = fake_rasterize,
    ocr: Callable = fake_ocr_lines,
) -> DataFrame:
    """The reference's multi-keyword report extraction
    (``rapport_eco.py:73-85``: ``for keyword in keywords`` → extract →
    concat with a keyword index) in ONE corpus pass: the reference
    re-rasterizes and re-OCRs the whole PDF once per keyword; here
    pages render once and every keyword's first page falls out of a
    single grouped scan (``find_first_page_per_doc_multi``), then the
    sentence-scoped matcher runs per (doc, keyword) hit.

    Output: (keyword, path, year, signed_value, v_pos).
    """
    from data_lake_project_spark.operators.keyword_scan import (
        find_first_page_per_doc_multi,
    )
    from data_lake_project_spark.operators.sentences import (
        sentence_scoped_facts,
    )

    pages = explode_pages(docs, rasterize=rasterize)
    texts = _page_text(ocr_pages(pages, ocr=ocr))
    hits = find_first_page_per_doc_multi(texts, keywords, doc_col="path")
    out = None
    for kw in keywords:
        # per-keyword trim/matcher on the (already-found) hit pages —
        # the keyword literal drives the trim, so this loop builds one
        # UNION plan over tiny hit sets, not K corpus scans
        part = sentence_scoped_facts(
            hits.filter(F.col("keyword") == kw).select("path", "text"),
            kw,
            id_col="path",
        ).withColumn("keyword", F.lit(kw))
        out = part if out is None else out.unionByName(part)
    return out.select("keyword", "path", "year", "signed_value", "v_pos")


def extract_figures(
    docs: DataFrame,
    rasterize: Callable = fake_rasterize,
    layout: Callable = fake_layout_detect,
) -> DataFrame:
    """Figure crops across the corpus (``graphData.py:92-142``):
    layout-detect every page, keep Figure blocks, emit clamped crop
    rects ready for the chart-to-table model. (The DePlot generate
    step is the model boundary; its OUTPUT parser is
    ``operators.deplot.parse_deplot``.)

    Output: (path, page, det_idx, conf, x1, y1, x2, y2).
    """
    pages = explode_pages(docs, rasterize=rasterize)
    figs = figure_blocks(detect_layout(pages, detector=layout))
    return crop_boxes(figs.withColumn("cls", F.lit(0))).drop("cls")
