"""End-to-end pipeline tests: the reference's entry points
(budgetDag/activity_Dag flows) as single Spark plans with
deterministic fakes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_project_spark.multimodal import explode_pages, fake_rasterize
from data_lake_project_spark.multimodal.tables import detect_layout, figure_blocks
from data_lake_project_spark.pipelines import (
    extract_figures,
    extract_tables,
    extract_text_facts,
)


def _docs(spark, n=4):
    return spark.createDataFrame(
        [(f"doc_{i}.pdf", f"content-{i}".encode()) for i in range(n)],
        "path string, content binary",
    )


def test_extract_tables_end_to_end(spark):
    out = extract_tables(_docs(spark), kpi="cell_", search="cell_")
    pdf = out.toPandas()
    assert set(pdf.columns) == {"doc_id", "page", "row_idx", "col_idx", "cell_text"}
    # fake OCR text always contains "cell_" so every doc has a hit
    # page; docs whose page draws >=1 fake detection produce a grid
    assert 1 <= pdf.doc_id.nunique() <= 4
    # grids are rectangular-ish: indices within fake OCR's 2-4 range
    assert pdf.row_idx.between(0, 4).all() and pdf.col_idx.between(0, 4).all()


def test_extract_tables_no_kpi_match_is_empty(spark):
    out = extract_tables(_docs(spark), kpi="jamais-present", search="x")
    assert out.count() == 0  # B.5 fix: empty, not None/crash


def test_extract_text_facts_runs(spark):
    docs = _docs(spark)
    out = extract_text_facts(docs, keyword="cell_")
    # fake OCR text has no numeric facts -> structurally valid empty
    assert out.columns == ["path", "year", "signed_value", "v_pos"]
    assert out.count() == 0


def test_extract_figures_only_figures_survive(spark):
    docs = _docs(spark)
    figs = extract_figures(docs).toPandas()
    pages = explode_pages(docs, rasterize=fake_rasterize)
    layout = detect_layout(pages).toPandas()
    n_figs = len(layout[(layout.block_type == "Figure") & (layout.conf >= 0.4)])
    assert len(figs) == n_figs
    if len(figs):
        assert (figs.x2 > figs.x1).all() and (figs.y2 > figs.y1).all()


def test_figure_blocks_score_floor(spark):
    pages = explode_pages(_docs(spark), rasterize=fake_rasterize)
    lay = detect_layout(pages)
    kept = figure_blocks(lay, min_conf=0.99).toPandas()
    assert (kept.conf >= 0.99).all()
