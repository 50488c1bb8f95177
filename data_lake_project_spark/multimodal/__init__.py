"""Multimodal columns (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas UDFs.

Reference analogue: the PDF-bytes → page-images → OCR flow
(``dags/get_data/ocr.py:26-77``, ``GetData.py:46-63``). The heavy
decode libraries (poppler, paddle, torch) are NOT present in this
environment, so the decode step is a pluggable interface with a
deterministic fake for tests (SURVEY.md §7.3 risk 2) — the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and tested.

Scale notes: ``binaryFile`` ingest is driven by
``spark.sql.files.maxPartitionBytes``; page explosion happens
executor-side (never collect blobs to the driver); per-executor model
singletons load once per process, not per batch.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PAGE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("page", IntegerType()),
        StructField("image", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str = "*.pdf"
) -> DataFrame:
    """S11-analog ingest: a landing zone of binary documents becomes
    (path, modificationTime, length, content) — the engine's document
    corpus bronze table (``spark.read.format("binaryFile")``)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


# --------------------------------------------------------------------------
# Pluggable decoders (real impls are optional extras; fakes are
# deterministic so tests and oracles are stable)
# --------------------------------------------------------------------------


def fake_rasterize(content: bytes, dpi: int = 300) -> list[tuple[bytes, int, int]]:
    """Deterministic stand-in for pdf2image ``convert_from_bytes``
    (``ocr.py:26-36``): page count derives from the blob hash, pixels
    from the page index. Returns [(jpeg_bytes, width, height)].
    """
    h = hashlib.md5(content).digest()
    n_pages = 1 + h[0] % 4
    w, hgt = 100 + h[1] % 50, 140 + h[2] % 50
    return [
        (hashlib.md5(content + struct.pack("<i", p)).digest() * 4, w, hgt)
        for p in range(n_pages)
    ]


def real_rasterize(content: bytes, dpi: int = 300):  # pragma: no cover
    """Real decoder (requires poppler + pdf2image — not in this
    container). Same signature as ``fake_rasterize``."""
    raise NotImplementedError(
        "pdf2image/poppler not available; inject fake_rasterize or "
        "install the 'documents' extra on the cluster image"
    )


def explode_pages(
    docs: DataFrame,
    rasterize: Callable[[bytes], list[tuple[bytes, int, int]]] = fake_rasterize,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """S12: PDF bytes → one row per page image, executor-side.

    ``mapInPandas`` streams Arrow batches; each input blob yields
    multiple output rows (UDTF shape), so memory is bounded by batch
    size x max page count, never by document count.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for i, (img, w, h) in enumerate(rasterize(r[content_col])):
                    rows.append(
                        {
                            "path": r[path_col],
                            "page": i + 1,
                            "image": img,
                            "width": w,
                            "height": h,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["path", "page", "image", "width", "height"]
            )

    return docs.select(path_col, content_col).mapInPandas(gen, PAGE_SCHEMA)


OCR_LINE_TYPE = ArrayType(
    StructType(
        [
            StructField("x1", IntegerType()),
            StructField("y1", IntegerType()),
            StructField("x2", IntegerType()),
            StructField("y2", IntegerType()),
            StructField("text", StringType()),
        ]
    )
)


def fake_ocr_lines(image: bytes, width: int, height: int):
    """Deterministic stand-in for the PaddleOCR line model
    (``ocr.py:38-55``): synthesizes a small grid of lines from the
    image hash. Box layout mimics a k x m table so the grid
    reconstruction operator has non-trivial input."""
    h = hashlib.md5(image).digest()
    n_rows, n_cols = 2 + h[0] % 3, 2 + h[1] % 3
    lines = []
    for r in range(n_rows):
        for c in range(n_cols):
            x1 = int(c * width / n_cols) + 2
            y1 = int(r * height / n_rows) + 2
            x2 = int((c + 1) * width / n_cols) - 2
            y2 = int((r + 1) * height / n_rows) - 2
            lines.append((x1, y1, x2, y2, f"cell_{r}_{c}_{h[2] % 10}"))
    return lines


def ocr_pages(
    pages: DataFrame,
    ocr: Callable[[bytes, int, int], list] = fake_ocr_lines,
) -> DataFrame:
    """OCR each page image into an array of line structs, then a
    long-form lines table via ``inline`` (UDF + explode models the
    reference's UDTF-shaped ``ocr_result``, SURVEY.md §2.8)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["path", "page"]].copy()
            out["lines"] = [
                ocr(img, w, h)
                for img, w, h in zip(pdf["image"], pdf["width"], pdf["height"])
            ]
            yield out

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("page", IntegerType()),
            StructField("lines", OCR_LINE_TYPE),
        ]
    )
    with_lines = pages.mapInPandas(gen, schema)
    return with_lines.select(
        "path", "page", F.inline("lines")
    )
