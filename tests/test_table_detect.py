"""Tests for the table-detection stage (P5 projection, F11 crop
clamp, P3 crop-text filter, A1 brightness) with deterministic fakes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_project_spark.multimodal import explode_pages, fake_rasterize, ocr_pages
from data_lake_project_spark.multimodal.tables import (
    corner_brightness,
    crop_boxes,
    detect_tables,
    fake_table_detect,
    filter_crops_by_text,
)


def _pages(spark):
    docs = spark.createDataFrame(
        [("a.pdf", b"doc-one-bytes"), ("b.pdf", b"doc-two-bytes")],
        "path string, content binary",
    )
    return explode_pages(docs, rasterize=fake_rasterize)


def test_detect_tables_long_form(spark):
    pages = _pages(spark)
    dets = detect_tables(pages).toPandas()
    # deterministic: same fake weights, same rows
    again = detect_tables(_pages(spark)).toPandas()
    assert sorted(dets.itertuples(index=False)) == sorted(again.itertuples(index=False))
    if len(dets):
        assert ((dets.cx > 0) & (dets.cx < 1)).all()
        assert (dets.conf >= 0.5).all()


def test_crop_boxes_clamp_golden(spark):
    # detection at center (0.5, 0.5), size (1.0, 1.0): with the 2%
    # margin it overflows the page and must clamp to [0, w] x [0, h]
    dets = spark.createDataFrame(
        [("p", 1, 0, 0.5, 0.5, 1.0, 1.0, 0.9, 0, 200, 100),
         ("p", 1, 1, 0.25, 0.25, 0.1, 0.1, 0.9, 0, 200, 100)],
        "path string, page int, det_idx int, cx double, cy double, bw double,"
        " bh double, conf double, cls int, width int, height int",
    )
    out = {r.det_idx: r for r in crop_boxes(dets).collect()}
    assert (out[0].x1, out[0].y1, out[0].x2, out[0].y2) == (0, 0, 200, 100)
    # unclamped: x1 = (0.25 - 0.05 - 0.02) * 200 = 36, x2 = (0.32)*200 = 64
    #            y1 = (0.18) * 100 = 18, y2 = (0.32)*100 = 32
    assert (out[1].x1, out[1].y1, out[1].x2, out[1].y2) == (36, 18, 64, 32)


def test_filter_crops_by_text_contains(spark):
    crops = spark.createDataFrame(
        [("p", 1, 0, 0, 0, 100, 50), ("p", 1, 1, 100, 50, 200, 100)],
        "path string, page int, det_idx int, x1 int, y1 int, x2 int, y2 int",
    )
    lines = spark.createDataFrame(
        [
            ("p", 1, 10, 10, 30, 20, "Table"),
            ("p", 1, 40, 10, 80, 20, "AGRICOLE"),
            ("p", 1, 120, 60, 150, 80, "other"),
        ],
        "path string, page int, x1 int, y1 int, x2 int, y2 int, text string",
    )
    out = filter_crops_by_text(crops, lines, "agricole").collect()
    assert len(out) == 1
    assert out[0].det_idx == 0
    assert out[0].crop_text == "Table AGRICOLE"  # reading order
    # Appendix B.5 fix: no match -> empty DataFrame, never None
    assert filter_crops_by_text(crops, lines, "absent-term").count() == 0


def test_full_detect_crop_filter_pipeline(spark):
    pages = _pages(spark)
    crops = crop_boxes(detect_tables(pages))
    lines = ocr_pages(pages)
    out = filter_crops_by_text(crops, lines, "cell_")
    assert out.count() >= 0  # plumbing: schema stable, runs end-to-end
    assert set(out.columns) == {
        "path", "page", "det_idx", "x1", "y1", "x2", "y2", "crop_text"
    }


def test_corner_brightness_deterministic_flag(spark):
    pages = _pages(spark)
    out = corner_brightness(pages, threshold=100.0).toPandas()
    assert len(out) == pages.count()
    assert set(out.needs_inversion) <= {"true", "false"}
    # threshold semantics: flag iff brightness < threshold
    assert ((out.brightness < 100.0) == (out.needs_inversion == "true")).all()


def test_model_loads_once_per_worker_process(spark, tmp_path):
    """The heavy-model contract: a detector_loader runs AT MOST once
    per Python worker process, never per batch or per row. The loader
    appends its pid to a shared file; distinct pids must equal total
    loads (and be far fewer than rows)."""
    import os

    from data_lake_project_spark.multimodal.tables import detect_tables

    marker = str(tmp_path / "loads.txt")

    def loader():
        with open(marker, "a") as fh:
            fh.write(f"{os.getpid()}\n")
        from data_lake_project_spark.multimodal.tables import (
            fake_table_detect,
        )

        return fake_table_detect

    pages = spark.range(0, 64).selectExpr(
        "concat('p', id) AS path",
        "CAST(id AS INT) AS page",
        "CAST(concat('img', id) AS BINARY) AS image",
        "100 AS width",
        "140 AS height",
    ).repartition(16)

    out = detect_tables(pages, detector_loader=loader)
    n_dets = out.count()

    with open(marker) as fh:
        loads = [ln.strip() for ln in fh if ln.strip()]
    assert loads, "loader never ran"
    # once per process: every load line is a distinct worker pid
    assert len(loads) == len(set(loads)), loads
    # and loading is per-process, not per-row/partition
    assert len(loads) < 64
    # same results as the plain pickled-callable path
    plain = detect_tables(pages).count()
    assert n_dets == plain
