"""Table-detection stage of the document pipeline (reference
``dags/get_data/tableExtract.py:30-91``) and the OCR brightness
pre-check (``dags/get_data/ocr.py:80-89``).

Split of responsibilities, Spark-first:

- model inference (YOLO table detect) is a pluggable per-batch
  callable behind ``mapInPandas`` — deterministic fake in tests,
  real weights as a cluster-image extra (SURVEY.md §7.3 risk 2);
- everything after inference — denormalizing xywhn to pixel boxes,
  the 2% margin, the min/max clamp (F11), the crop-text containment
  filter (P3) — is **pure relational Spark**, JVM-side, codegen'd,
  instead of the reference's per-image numpy loops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DETECTION_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("page", IntegerType()),
        StructField("det_idx", IntegerType()),
        StructField("cx", DoubleType()),  # xywhn: normalized center/size
        StructField("cy", DoubleType()),
        StructField("bw", DoubleType()),
        StructField("bh", DoubleType()),
        StructField("conf", DoubleType()),
        StructField("cls", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def fake_table_detect(image: bytes, width: int, height: int):
    """Deterministic stand-in for the YOLOv5 table detector
    (``tableExtract.py:35-51``): 0-2 normalized xywhn boxes derived
    from the image hash. Returns [(cx, cy, bw, bh, conf, cls)]."""
    h = hashlib.md5(image).digest()
    n = h[0] % 3
    return [
        (
            0.3 + 0.1 * (h[1 + i] % 5),  # cx in [0.3, 0.7]
            0.3 + 0.1 * (h[2 + i] % 5),
            0.2 + 0.05 * (h[3 + i] % 4),  # bw in [0.2, 0.35]
            0.15 + 0.05 * (h[4 + i] % 4),
            round(0.5 + (h[5 + i] % 50) / 100.0, 2),
            0,
        )
        for i in range(n)
    ]


def detect_tables(
    pages: DataFrame,
    detector: Callable[[bytes, int, int], list] = fake_table_detect,
    detector_loader: Callable[[], Callable] | None = None,
) -> DataFrame:
    """P5: run the detector per page image, project each detection to
    a row (long form).

    Two backends: ``detector`` — a light callable pickled with the
    plan (fakes, pure functions); ``detector_loader`` — the
    heavy-model path, resolved through the per-process registry
    (``models.get_model``), so a real YOLO handle loads once per
    Python worker process and is reused across batches and tasks
    (pinned by ``test_model_loads_once_per_worker_process``).
    """
    loader_key = (
        f"table-detector:{detector_loader.__module__}."
        f"{detector_loader.__qualname__}"
        if detector_loader is not None
        else None
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if detector_loader is not None:
            from data_lake_project_spark.multimodal.models import get_model

            det = get_model(loader_key, detector_loader)
        else:
            det = detector
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for i, (cx, cy, bw, bh, conf, cls) in enumerate(
                    det(r["image"], r["width"], r["height"])
                ):
                    rows.append(
                        {
                            "path": r["path"],
                            "page": r["page"],
                            "det_idx": i,
                            "cx": cx,
                            "cy": cy,
                            "bw": bw,
                            "bh": bh,
                            "conf": conf,
                            "cls": cls,
                            "width": r["width"],
                            "height": r["height"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in DETECTION_SCHEMA])

    return pages.mapInPandas(gen, DETECTION_SCHEMA)


def crop_boxes(detections: DataFrame, margin: float = 0.02) -> DataFrame:
    """Denormalize xywhn detections to clamped pixel crop rectangles —
    the reference's margin+clamp arithmetic (``tableExtract.py:69-74``:
    ``max(0, (cx - w/2 - 0.02) * width)`` …) as pure Spark exprs
    (greatest/least = F11)."""
    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    x1 = F.greatest(F.lit(0.0), (F.col("cx") - F.col("bw") / 2 - margin) * w)
    y1 = F.greatest(F.lit(0.0), (F.col("cy") - F.col("bh") / 2 - margin) * h)
    x2 = F.least(w, (F.col("cx") + F.col("bw") / 2 + margin) * w)
    y2 = F.least(h, (F.col("cy") + F.col("bh") / 2 + margin) * h)
    return detections.select(
        "path",
        "page",
        "det_idx",
        "conf",
        "cls",
        F.floor(x1).cast("int").alias("x1"),
        F.floor(y1).cast("int").alias("y1"),
        F.ceil(x2).cast("int").alias("x2"),
        F.ceil(y2).cast("int").alias("y2"),
    )


def filter_crops_by_text(
    crops: DataFrame, ocr_lines: DataFrame, search: str
) -> DataFrame:
    """Keep crops whose contained OCR text mentions ``search``
    case-insensitively (``tableExtract.py:77-79`` OCR'd each crop and
    checked containment; with page-level OCR lines already extracted,
    the equivalent is a containment join: a line belongs to a crop
    when its box center lies inside the crop rectangle).

    Fixes reference Appendix B.5: no match yields an EMPTY result,
    never None. Output: crops + matched text concatenated in reading
    order.
    """
    cx = (F.col("lx1") + F.col("lx2")) / 2
    cy = (F.col("ly1") + F.col("ly2")) / 2
    lines = ocr_lines.select(
        F.col("path").alias("lpath"),
        F.col("page").alias("lpage"),
        F.col("x1").alias("lx1"),
        F.col("y1").alias("ly1"),
        F.col("x2").alias("lx2"),
        F.col("y2").alias("ly2"),
        F.col("text").alias("ltext"),
    )
    joined = crops.join(
        lines,
        (F.col("path") == F.col("lpath"))
        & (F.col("page") == F.col("lpage"))
        & (cx >= F.col("x1"))
        & (cx <= F.col("x2"))
        & (cy >= F.col("y1"))
        & (cy <= F.col("y2")),
    )
    grouped = joined.groupBy("path", "page", "det_idx", "x1", "y1", "x2", "y2").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ly1", "lx1", "ltext"))
                ),
                lambda s: s.getField("ltext"),
            ),
        ).alias("crop_text")
    )
    return grouped.filter(
        F.contains(F.lower(F.col("crop_text")), F.lit(search.lower()))
    )


BRIGHTNESS_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("page", IntegerType()),
        StructField("brightness", DoubleType()),
        StructField("needs_inversion", StringType()),
    ]
)


def corner_brightness(
    pages: DataFrame, threshold: float = 100.0, patch: int = 16
) -> DataFrame:
    """A1: mean-of-corner-means brightness vs threshold
    (``ocr.py:80-89`` sampled 4 corner patches of the page image and
    inverted dark backgrounds before OCR). Decoded pixel access is the
    pluggable part; here the encoded bytes stand in for the raster
    (deterministic, container has no image codecs) — the Spark-side
    contract (per-page scalar, Arrow-batched) is the real thing."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                buf = r["image"]
                corners = [
                    buf[:patch],
                    buf[-patch:],
                    buf[patch : 2 * patch],
                    buf[-2 * patch : -patch],
                ]
                mean = sum(
                    sum(c) / max(len(c), 1) for c in corners
                ) / 4.0
                out.append(
                    {
                        "path": r["path"],
                        "page": r["page"],
                        "brightness": round(mean, 4),
                        "needs_inversion": "true" if mean < threshold else "false",
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in BRIGHTNESS_SCHEMA])

    return pages.mapInPandas(gen, BRIGHTNESS_SCHEMA)


def fake_layout_detect(image: bytes, width: int, height: int):
    """Deterministic stand-in for the Detectron2 PubLayNet layout
    model (``graphData.py:32,92-113``): blocks with a type label from
    the 5-class map {Text, Title, List, Table, Figure}, score >= 0.4.
    Returns [(cx, cy, bw, bh, conf, block_type)]."""
    h = hashlib.md5(b"layout" + image).digest()
    classes = ["Text", "Title", "List", "Table", "Figure"]
    n = 1 + h[0] % 3
    return [
        (
            0.3 + 0.1 * (h[1 + i] % 5),
            0.3 + 0.1 * (h[2 + i] % 5),
            0.2 + 0.05 * (h[3 + i] % 4),
            0.15 + 0.05 * (h[4 + i] % 4),
            round(0.4 + (h[5 + i] % 60) / 100.0, 2),
            classes[h[6 + i] % 5],
        )
        for i in range(n)
    ]


LAYOUT_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("page", IntegerType()),
        StructField("det_idx", IntegerType()),
        StructField("cx", DoubleType()),
        StructField("cy", DoubleType()),
        StructField("bw", DoubleType()),
        StructField("bh", DoubleType()),
        StructField("conf", DoubleType()),
        StructField("block_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def detect_layout(
    pages: DataFrame,
    detector: Callable[[bytes, int, int], list] = fake_layout_detect,
) -> DataFrame:
    """Layout blocks per page (``graphData.py:92-113``), long form."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for i, (cx, cy, bw, bh, conf, btype) in enumerate(
                    detector(r["image"], r["width"], r["height"])
                ):
                    rows.append(
                        {
                            "path": r["path"],
                            "page": r["page"],
                            "det_idx": i,
                            "cx": cx,
                            "cy": cy,
                            "bw": bw,
                            "bh": bh,
                            "conf": conf,
                            "block_type": btype,
                            "width": r["width"],
                            "height": r["height"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in LAYOUT_SCHEMA])

    return pages.mapInPandas(gen, LAYOUT_SCHEMA)


def figure_blocks(layout: DataFrame, min_conf: float = 0.4) -> DataFrame:
    """P7: keep Figure blocks above the score floor
    (``graphData.py:104,117-119`` — reference bug B.5 returned from
    inside the first iteration and missed later figures; here every
    figure survives)."""
    return layout.filter(
        (F.col("block_type") == "Figure") & (F.col("conf") >= min_conf)
    )
