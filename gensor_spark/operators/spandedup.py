"""Exact-substring span dedup over token arrays (Lee et al. 2022).

Training-data-pipeline extension (no gensor analogue). "Deduplicating
Training Data Makes Language Models Better" (ExactSubstr) removes from the
corpus every ≥k-token substring that appears verbatim more than once —
catching boilerplate, licenses and templated spans that document-level
dedup (MinHash/SimHash, operators/dedup.py) can never see because the
SURROUNDING document differs.

The paper builds a corpus-wide suffix array on one machine; the distributed
re-expression here is the k-gram formulation, and at k-granularity it is
EXACT, not an approximation: a duplicated substring of length L ≥ k covers
exactly its L−k+1 k-grams, each of which is itself duplicated — so the set
of token positions covered by duplicated k-grams equals the set of
positions inside maximal duplicated runs of length ≥ k. Like the paper, ALL
copies are removed (dedup is between-docs AND within-doc: a k-gram repeated
twice inside one document is a duplicate).

Shape at scale (tokens table ``doc_id, tokens array<int>``):

1. k-gram hashing is row-local (array slices → 60-bit md5 ints — 60 bits
   keeps the hash inside a signed BIGINT on both engines; the cross-engine
   ``('0x' || substr(md5(g),1,15))::BIGINT`` contract of the dedup family).
2. ONE partial-agg shuffle on the gram hash counts global occurrences —
   word-count with map-side combine; grams are never materialized as
   strings past the hash.
3. Duplicated hashes (count ≥ 2) join back to the exploded positions
   (second shuffle on the hash) and collapse to a per-doc start-position
   list (third shuffle, on doc_id).
4. The trim itself is row-local pure Catalyst: position i is removed iff
   some duplicated-gram start s satisfies s ≤ i < s+k (an ``exists`` fold
   over the start list per position).

Three linear shuffles total, no UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5int60(s: Column) -> Column:
    """60-bit md5 prefix as BIGINT — bit-identical in Spark and DuckDB
    (``('0x' || substr(md5(x),1,15))::BIGINT``); 32 bits (md5int) collides
    too often for corpus-scale gram counting."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _gram_hashes(tokens: Column, k: int) -> Column:
    """Array of k-gram hashes for a token array (row-local); empty if < k."""
    n = F.size(tokens)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: md5int60(
            F.array_join(F.transform(F.slice(tokens, i, k),
                                     lambda t: t.cast("string")), "_")),
    )
    return F.when(n >= k, make).otherwise(
        F.array().cast("array<bigint>"))


def trim_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Remove every token covered by a corpus-duplicated k-gram.

    Output: ``id_col``, ``tokens`` (trimmed array), ``n_tok`` (trimmed
    length), ``n_removed``. Docs shorter than ``k`` tokens pass through
    untouched (no gram can cover them).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(tokens_col).alias("_toks"))
    grams = base.select(
        "doc_id",
        F.posexplode(_gram_hashes(F.col("_toks"), k)).alias("pos", "h"),
    )
    dup_h = (grams.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
             .where(F.col("c") >= 2).select("h"))
    dup_starts = (
        grams.join(dup_h, "h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("_starts"))
    )
    joined = base.join(dup_starts, "doc_id", "left").withColumn(
        "_starts", F.coalesce(F.col("_starts"),
                              F.array().cast("array<int>")))
    starts = F.col("_starts")
    kept = F.filter(
        F.transform(F.col("_toks"),
                    lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        # position i survives iff NO duplicated gram start covers it
        lambda st: ~F.exists(
            starts, lambda s: (s <= st["i"]) & (st["i"] < s + k)),
    )
    trimmed = F.transform(kept, lambda st: st["t"])
    return joined.select(
        F.col("doc_id").alias(id_col),
        trimmed.alias("tokens"),
        F.size(trimmed).alias("n_tok"),
        (F.size("_toks") - F.size(trimmed)).alias("n_removed"),
    )
