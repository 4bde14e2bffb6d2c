"""Benchmark decontamination: n-gram overlap against a held-out eval set.

Training-data-pipeline extension (no gensor analogue). Standard practice
before pretraining (GPT-3 appendix C, Gopher §A.3.1, The Pile): any training
document sharing enough word n-grams with an evaluation benchmark is flagged
(and usually dropped) so test questions don't leak into the training corpus.

Semantics here: a document's *distinct* ``n``-grams are intersected with the
union of the benchmark's distinct ``n``-grams; the document is contaminated
when at least ``min_overlap`` grams collide. Distinct-vs-distinct keeps the
metric a set overlap (re-using one gram many times is still one leak) and
matches the shape the published filters use (13-gram collision for GPT-3).

Shape at scale: the corpus side is one explode + per-doc ``distinct`` (a
composite-key partial aggregate); the benchmark side collapses to its
distinct gram set, which is SMALL by construction (benchmarks are thousands
of documents, not billions) and is therefore **broadcast** by default — the
100 TB corpus never shuffles on gram, each executor probes a local hash
set. The hint is a parameter (``broadcast=False``), not an assumption: a
caller whose "benchmark" side is large (e.g. decontaminating against another
big corpus slice) passes ``broadcast=False`` and the identical plan runs as
a shuffle join on the gram key instead of blowing the broadcast limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.functions.text import shingles, tokens


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Per-doc benchmark-overlap stats: ``(doc_id, n_grams, overlap_grams,
    overlap_frac, contaminated)``.

    Docs shorter than ``n`` tokens have no grams — they keep ``n_grams=0``,
    ``overlap_frac=0.0`` and are never contaminated (mask-don't-crash).

    ``broadcast``: hint the benchmark gram set to every executor (the
    default — right for real eval benchmarks, which are thousands of docs).
    Pass ``False`` when the benchmark side is itself corpus-sized; the join
    then shuffles on the gram key instead of broadcasting.
    """

    def gram_rows(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        return df.select(
            *cols,
            F.explode(shingles(tokens(F.col(text_col)), n)).alias("g"),
        ).distinct()

    doc_grams = gram_rows(docs, with_id=True)
    bench_grams = gram_rows(benchmark, with_id=False)

    totals = doc_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    bench_side = F.broadcast(bench_grams) if broadcast else bench_grams
    hits = (
        doc_grams.join(bench_side, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("overlap_grams"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("overlap_grams", F.lit(0)).alias("overlap_grams"),
            F.coalesce(
                F.col("overlap_grams").cast("double") / F.col("n_grams"),
                F.lit(0.0),
            ).alias("overlap_frac"),
            (F.coalesce("overlap_grams", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )
