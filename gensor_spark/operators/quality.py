"""Repetition-based document quality metrics (Gopher/C4-style filters).

Training-data-pipeline extension (no gensor analogue). The standard
web-corpus quality rules drop documents dominated by repeated n-grams
(boilerplate, keyword stuffing, templated spam). Per doc and n-gram size k:

- ``dup_frac``  — fraction of n-gram *occurrences* that are repeats:
  ``(total - distinct) / total`` (the Rae et al. "duplicate n-gram
  fraction")
- ``top_frac``  — fraction taken by the single most frequent n-gram (the
  "top n-gram fraction" rule)

Shape at scale: explode to ``(doc_id, gram)`` rows, count per (doc, gram),
re-aggregate per doc — two shuffles keyed on composite/doc keys, both
partial-aggregated map-side, everything JVM-side. The alternative (per-row
HOF counting over the gram array) is O(grams²) interpreted-lambda work per
row and loses to the exchange well before web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.functions.text import shingles, tokens


def repetition_stats(docs: DataFrame, k: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc duplicate/top n-gram fractions for one gram size ``k``.

    Docs with fewer than ``k`` tokens have no grams: their fractions are 0
    by the mask-don't-crash convention (kept, never poisoned to null).
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), k)).alias("g"),
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("total_grams"),
        F.count("*").alias("distinct_grams"),
        F.max("c").alias("_top"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("total_grams", F.lit(0)).alias("total_grams"),
            F.coalesce("distinct_grams", F.lit(0)).alias("distinct_grams"),
            F.coalesce(
                (F.col("total_grams") - F.col("distinct_grams")).cast("double")
                / F.col("total_grams"), F.lit(0.0),
            ).alias("dup_frac"),
            F.coalesce(
                F.col("_top").cast("double") / F.col("total_grams"), F.lit(0.0)
            ).alias("top_frac"),
        )
    )
