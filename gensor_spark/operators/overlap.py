"""Cross-source corpus overlap audit: how much of source B is already in A.

Training-data-pipeline extension (no gensor analogue). Before mixing
sources into a training corpus, the pipeline needs the pairwise overlap
structure of their distinct n-gram sets — near-identical sources (a re-crawl,
a filtered subset, a mirrored dump) inflate effective epochs exactly like
document-level duplication, but are invisible to per-document dedup when
the duplicated material is scattered across different documents. The audit
per ordered source pair: ``|A∩B|``, ``|A∪B|``, Jaccard, and the asymmetric
containment ``|A∩B| / |A|`` ("this share of A's distinct grams also occurs
in B" — the signal for "B subsumes A").

Two physical forms, one semantics:

- **exact** (``source_overlap(..., approx=False)``): distinct
  ``(gram, source)`` pairs (shuffle 1, map-side partial distinct), then the
  per-gram source set self-joined into co-occurring ordered pairs — the
  same containment-to-co-occurring-keys shape as ``series_corr``'s bin
  join, never a cartesian — and one count per pair (shuffle 2, narrow
  rows). Per-source totals ride the same distinct frame. DuckDB-oracle-able
  and the correctness anchor.
- **sketch** (``approx=True``, the 100 TB path): one Datasketches **theta
  sketch** per source (a single partial-aggregated shuffle whose output is
  S rows of ≤2^lgk entries each), then every pairwise intersection/union is
  computed from the S sketch rows alone with ``theta_intersection`` /
  ``theta_union`` — the corpus is scanned ONCE regardless of the number of
  pairs, and the pair stage touches kilobytes. Unlike HLL, theta sketches
  support set *intersection* natively, which is why they carry this
  operator. Estimates are exact while sketches are in exact mode (fewer
  than ~2^lgk distinct items per source — pinned in tests); beyond that the
  standard theta error bounds apply.

The pair enumeration is O(S²) on S = #sources, which is a dozen-scale
number in real corpora; both plans keep the corpus-sized stages linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.functions.text import shingles, tokens


def _grams(docs: DataFrame, n: int, text_col: str, source_col: str) -> DataFrame:
    g = F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram")
    return docs.select(F.col(source_col).alias("source"), g)


def source_ngram_sketches(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    source_col: str = "source",
    lgk: int = 12,
) -> DataFrame:
    """One theta sketch of the distinct ``n``-gram set per source.

    Output: ``source, sk (binary), n_grams (estimate)``. The only
    corpus-sized stage of the sketch path — everything downstream reads
    these S rows.
    """
    return (
        _grams(docs, n, text_col, source_col)
        .groupBy("source")
        .agg(F.expr(f"theta_sketch_agg(gram, {lgk})").alias("sk"))
        .withColumn("n_grams", F.expr("theta_sketch_estimate(sk)"))
    )


def source_overlap(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    source_col: str = "source",
    approx: bool = False,
    lgk: int = 12,
) -> DataFrame:
    """Pairwise distinct-n-gram overlap between sources.

    Output (one row per ordered pair ``src_a < src_b``):
    ``src_a, src_b, n_a, n_b, n_inter, n_union, jaccard,
    containment_a, containment_b`` — ``containment_a = n_inter / n_a``.

    ``approx=False`` is the exact two-shuffle plan; ``approx=True`` is the
    single-scan theta-sketch plan (see module docstring). Sources with an
    empty gram set produce no pairs in either mode.
    """
    if approx:
        sk = source_ngram_sketches(docs, n, text_col, source_col, lgk)
        a = sk.select(F.col("source").alias("src_a"),
                      F.col("sk").alias("ska"),
                      F.col("n_grams").alias("n_a"))
        b = sk.select(F.col("source").alias("src_b"),
                      F.col("sk").alias("skb"),
                      F.col("n_grams").alias("n_b"))
        pairs = (
            a.join(b, F.col("src_a") < F.col("src_b"))
            .withColumn("n_inter",
                        F.expr("theta_sketch_estimate("
                               "theta_intersection(ska, skb))"))
            .withColumn("n_union",
                        F.expr("theta_sketch_estimate("
                               "theta_union(ska, skb))"))
        )
    else:
        gs = _grams(docs, n, text_col, source_col).distinct()
        totals = gs.groupBy("source").agg(F.count("*").alias("n_grams"))
        a = gs.select(F.col("source").alias("src_a"), "gram")
        b = gs.select(F.col("source").alias("src_b"), "gram")
        inter = (
            a.join(b, "gram")
            .filter(F.col("src_a") < F.col("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count("*").cast("double").alias("n_inter"))
        )
        # all ordered pairs (zero-overlap pairs included, matching the
        # sketch mode): totals is S rows, so the pair frame is tiny
        ta = totals.select(F.col("source").alias("src_a"),
                           F.col("n_grams").cast("double").alias("n_a"))
        tb = totals.select(F.col("source").alias("src_b"),
                           F.col("n_grams").cast("double").alias("n_b"))
        pairs = (
            ta.join(tb, F.col("src_a") < F.col("src_b"))
            .join(inter, ["src_a", "src_b"], "left")
            .withColumn("n_inter", F.coalesce("n_inter", F.lit(0.0)))
            .withColumn("n_union",
                        F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
    return pairs.select(
        "src_a", "src_b",
        F.col("n_a").cast("double").alias("n_a"),
        F.col("n_b").cast("double").alias("n_b"),
        F.col("n_inter").cast("double").alias("n_inter"),
        F.col("n_union").cast("double").alias("n_union"),
        (F.col("n_inter") / F.col("n_union")).alias("jaccard"),
        (F.col("n_inter") / F.col("n_a")).alias("containment_a"),
        (F.col("n_inter") / F.col("n_b")).alias("containment_b"),
    )
