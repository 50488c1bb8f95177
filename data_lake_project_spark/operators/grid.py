"""OCR-box → table-grid reconstruction (reference's largest operator:
``dags/get_data/tableExtract.py:112-200``, 89 LoC).

Reference semantics, preserved exactly (with its latent bugs fixed,
Appendix B):

1. From each OCR line box, derive a full-width *row candidate* and a
   full-height *column candidate* rectangle (``:136-143``).
2. Greedy NMS at IoU 0.1 keeps one candidate per visual row/column
   (``:145-161``, reference used ``tf.image.non_max_suppression``).
3. Sort surviving rows by y, columns by x (``:163-169``).
4. Assign each text box to every (row, col) cell with IoU > 0.09
   (``:171-197``); first match per cell wins (reference iterates
   boxes in order and overwrites only empty cells).
5. Emit the cell grid (``:200`` built a pandas DataFrame).

Spark mapping: the per-page computation is bounded (a page has
O(100) boxes), so it runs as ``applyInPandas`` per (doc, page) group
— numpy inside, Arrow batches across, one shuffle on the group key.
The *output* is relational long-form (doc, page, row, col, text), so
downstream ops (filters, joins to KPI keywords) stay in Catalyst.
At 100 TB: groups are tiny and uniform; the shuffle key
(doc_id, page) is high-cardinality — ideal partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

GRID_SCHEMA = (
    "doc_id long, page int, row_idx int, col_idx int, cell_text string"
)


def _nms(boxes: np.ndarray, iou_threshold: float = 0.1) -> list[int]:
    """Greedy non-maximum suppression over [x1,y1,x2,y2] boxes,
    keeping earlier (higher-priority) boxes — numpy port of the
    ``tf.image.non_max_suppression`` call at ``tableExtract.py:145-161``
    (scores were all 1.0 there, so priority = input order)."""
    if len(boxes) == 0:
        return []
    keep: list[int] = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in range(len(boxes)):
        ok = True
        for j in keep:
            ix1 = max(boxes[i, 0], boxes[j, 0])
            iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2])
            iy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
            union = areas[i] + areas[j] - inter
            if union > 0 and inter / union > iou_threshold:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def reconstruct_page(
    boxes: np.ndarray, texts: list[str], page_w: float, page_h: float
) -> list[tuple[int, int, str]]:
    """Pure-python core (unit-testable without Spark): boxes are
    [n, 4] float [x1,y1,x2,y2]; returns (row_idx, col_idx, text)."""
    if len(boxes) == 0:
        return []
    # 1. row/column candidate rectangles (tableExtract.py:136-143)
    rows_cand = np.column_stack(
        [np.zeros(len(boxes)), boxes[:, 1], np.full(len(boxes), page_w), boxes[:, 3]]
    )
    cols_cand = np.column_stack(
        [boxes[:, 0], np.zeros(len(boxes)), boxes[:, 2], np.full(len(boxes), page_h)]
    )
    # 2. NMS per axis (:145-161)
    keep_r = _nms(rows_cand)
    keep_c = _nms(cols_cand)
    # 3. sort rows by y origin, cols by x origin (:163-169)
    rows = rows_cand[sorted(keep_r, key=lambda i: rows_cand[i, 1])]
    cols = cols_cand[sorted(keep_c, key=lambda i: cols_cand[i, 0])]

    # 4. cell x box IoU > 0.09 assignment, first text wins (:171-197)
    out: dict[tuple[int, int], str] = {}
    for ri, r in enumerate(rows):
        for ci, c in enumerate(cols):
            cell = (c[0], r[1], c[2], r[3])
            cell_area = (cell[2] - cell[0]) * (cell[3] - cell[1])
            for bi, b in enumerate(boxes):
                if (ri, ci) in out:
                    break
                ix1, iy1 = max(cell[0], b[0]), max(cell[1], b[1])
                ix2, iy2 = min(cell[2], b[2]), min(cell[3], b[3])
                inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
                b_area = (b[2] - b[0]) * (b[3] - b[1])
                union = cell_area + b_area - inter
                if union > 0 and inter / union > 0.09:
                    out[(ri, ci)] = texts[bi]
    return [(ri, ci, t) for (ri, ci), t in sorted(out.items())]


def grid_reconstruct(
    ocr_lines: DataFrame,
    page_w: float = 1000.0,
    page_h: float = 1400.0,
) -> DataFrame:
    """Distributed grid reconstruction over an OCR-lines table
    (FIXTURES.md B4 shape: doc_id, page, x1, y1, x2, y2, text).

    Output long-form grid: (doc_id, page, row_idx, col_idx, cell_text).
    """

    def per_page(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        page = pdf["page"].iloc[0]
        pdf = pdf.sort_values(["y1", "x1"]).reset_index(drop=True)
        boxes = pdf[["x1", "y1", "x2", "y2"]].to_numpy(dtype=float)
        cells = reconstruct_page(boxes, list(pdf["text"]), page_w, page_h)
        return pd.DataFrame(
            {
                "doc_id": [doc_id] * len(cells),
                "page": [page] * len(cells),
                "row_idx": [c[0] for c in cells],
                "col_idx": [c[1] for c in cells],
                "cell_text": [c[2] for c in cells],
            }
        )

    return ocr_lines.groupBy("doc_id", "page").applyInPandas(
        per_page, schema=GRID_SCHEMA
    )
