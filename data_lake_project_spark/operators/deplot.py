"""DePlot linearized-table parser (reference
``dags/get_data/activity_test.py:99-112`` and
``notePresentation.py:66-77``).

Input format (produced by the chart-to-table model): one string per
chart, rows separated by ``<0x0A>``, cells by ``|``; line 1 is the
title, line 2 the header, the rest data rows; numeric values use
European decimal commas ("3,5").

All pure string ops → native Spark expressions, no UDF: split /
posexplode / trim / decimal-comma parse. Scale-free (narrow
transforms only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_project_spark.functions import parse_number

ROW_SEP = "<0x0A>"


def parse_deplot(
    charts: DataFrame, text_col: str = "deplot", id_col: str = "chart_id"
) -> DataFrame:
    """Explode each linearized chart string into typed series rows.

    Output: (chart_id, title, series_label, x, value) — one row per
    data cell, ``value`` parsed with decimal-comma semantics
    (``notePresentation.py:73-76``). Cells beyond the header width
    are dropped (reference sliced to header length,
    ``activity_test.py:103-108``).
    """
    lines = F.split(F.col(text_col), F.lit(ROW_SEP))
    d = charts.select(
        F.col(id_col),
        F.trim(F.element_at(lines, 1)).alias("title"),
        F.transform(
            F.element_at(F.transform(F.slice(lines, 2, 1), lambda s: F.split(s, r"\|")), 1),
            lambda c: F.trim(c),
        ).alias("header"),
        F.slice(lines, 3, 10000).alias("data_lines"),
    )
    d = d.select(
        id_col,
        "title",
        "header",
        F.posexplode("data_lines").alias("row_idx", "line"),
    ).select(
        id_col,
        "title",
        "header",
        "row_idx",
        F.transform(F.split("line", r"\|"), lambda c: F.trim(c)).alias("cells"),
    )
    # first cell = x (e.g. the year), remaining cells pair with header[2:]
    return (
        d.select(
            id_col,
            "title",
            F.element_at("cells", 1).alias("x"),
            F.posexplode(
                F.slice("cells", 2, F.greatest(F.size("header") - 1, F.lit(0)))
            ).alias("col_idx", "raw_value"),
            F.col("header"),
        )
        .select(
            id_col,
            "title",
            # header[1] labels the x column; data cell i pairs with
            # header[i+2] (activity_test.py:103-108)
            F.element_at(F.col("header"), F.col("col_idx") + 2).alias(
                "series_label"
            ),
            "x",
            parse_number(F.col("raw_value")).alias("value"),
        )
        .filter(F.col("x") != "")
    )
