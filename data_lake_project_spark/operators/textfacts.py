"""Numeric-fact extraction: value/year/sign association (reference
``dags/get_data/texteExtract.py:40-129``, the spaCy Matcher pipeline).

Reference semantics preserved:

- VALUE spans: number (optional decimal part) followed by a unit in
  ``{%, $, bbl, dollars, millions}`` (``:27-33``).
- YEAR spans: 4-digit years (``:34-38``).
- Association (``:95-111``): each VALUE pairs with the **nearest
  following YEAR** (distance = year_start - value_end, must be >= 0,
  minimal) — an as-of join in token space.
- Sign (``:113-129``): look back up to 25 tokens before the value;
  the closest sentiment word decides "+" ({hausse, augmentation,
  appreciation, excedent, accroissement}) or "-" ({baisse,
  diminution, deficit}).
- Output: per (doc, year) the list of signed value strings
  (``:108-110`` dict) → long form (doc_id, year, signed_value).

Implementation: pure Spark expressions. Spans come from
``regexp_extract_all`` positions — Spark lacks match *positions*, so
spans are located by scanning token arrays (``aggregate`` over
zipped positions), all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lake_project_spark.functions import tokens

POSITIVE = ["hausse", "augmentation", "appreciation", "excedent", "accroissement"]
NEGATIVE = ["baisse", "diminution", "deficit"]

VALUE_TOKEN_RE = r"^[0-9]+(?:[.,][0-9]+)?(?:%|\$|bbl)?$"
UNIT_TOKEN_RE = r"^(?:%|\$|bbl|dollars|millions)$"
YEAR_TOKEN_RE = r"^(?:1[89][0-9]{2}|20[0-9]{2})$"


def _positions(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Tokenize and emit (id, pos, tok) rows — the token-space
    coordinate system every later step joins on."""
    return docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )


def extract_facts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, year, signed_value) rows per ``texteExtract`` semantics."""
    toks = _positions(docs, text_col, id_col)

    is_year = F.col("tok").rlike(YEAR_TOKEN_RE)
    # value token: numeric token whose unit is attached OR whose next
    # token is a unit (spaCy pattern allowed the unit as its own token)
    w_next = Window.partitionBy(id_col).orderBy("pos")
    toks2 = toks.withColumn("next_tok", F.lead("tok").over(w_next))
    is_value = (
        F.col("tok").rlike(VALUE_TOKEN_RE)
        & ~is_year
        & (
            F.col("tok").rlike(r"(?:%|\$|bbl)$")
            | F.coalesce(F.col("next_tok").rlike(UNIT_TOKEN_RE), F.lit(False))
        )
    )

    values = toks2.filter(is_value).select(
        id_col,
        F.col("pos").alias("v_pos"),
        F.concat(
            F.col("tok"),
            F.when(
                F.coalesce(F.col("next_tok").rlike(UNIT_TOKEN_RE), F.lit(False))
                & ~F.col("tok").rlike(r"(?:%|\$|bbl)$"),
                F.concat(F.lit(" "), F.col("next_tok")),
            ).otherwise(F.lit("")),
        ).alias("value_text"),
    )
    years = toks.filter(is_year).select(
        id_col, F.col("pos").alias("y_pos"), F.col("tok").alias("year")
    )

    # nearest FOLLOWING year: distance = y_pos - v_pos >= 0, minimal
    # (texteExtract.py:95-111) — as-of join in token space.
    paired = (
        values.join(years, on=id_col)
        .filter(F.col("y_pos") >= F.col("v_pos"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col, "v_pos").orderBy(
                    F.col("y_pos") - F.col("v_pos"), "y_pos"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # sign from the closest sentiment token within 25 tokens BEFORE the
    # value (texteExtract.py:113-129)
    sentiments = toks.filter(
        F.lower(F.col("tok")).isin(POSITIVE + NEGATIVE)
    ).select(
        id_col,
        F.col("pos").alias("s_pos"),
        F.when(F.lower(F.col("tok")).isin(POSITIVE), F.lit("+"))
        .otherwise(F.lit("-"))
        .alias("sign"),
    )
    # A sentiment only counts when it lies within the 25-token
    # lookback; out-of-window rows degrade to sign=NULL (value still
    # emitted unsigned) rather than dropping the value.
    in_window = (F.col("s_pos") < F.col("v_pos")) & (
        F.col("v_pos") - F.col("s_pos") <= 25
    )
    signed = (
        paired.join(sentiments, on=id_col, how="left")
        .withColumn("sign", F.when(in_window, F.col("sign")))
        .withColumn(
            "srn",
            F.row_number().over(
                Window.partitionBy(id_col, "v_pos").orderBy(
                    F.when(in_window, F.col("v_pos") - F.col("s_pos")).otherwise(
                        F.lit(1_000_000)
                    )
                )
            ),
        )
        .filter(F.col("srn") == 1)
    )

    return signed.select(
        id_col,
        "year",
        F.concat(F.coalesce(F.col("sign"), F.lit("")), F.col("value_text")).alias(
            "signed_value"
        ),
        F.col("v_pos"),
    ).orderBy(id_col, "v_pos")


def facts_by_year(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Reference output shape: year → list of signed values per doc
    (``texteExtract.py:108-110``), values in document order."""
    facts = extract_facts(docs, text_col, id_col)
    return (
        facts.groupBy(id_col, "year")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("v_pos", "signed_value"))
                ),
                lambda s: s.getField("signed_value"),
            ).alias("values")
        )
        .orderBy(id_col, "year")
    )
