"""Distributed BPE tokenizer training + encoding over the corpus.

The engine's payload IS tokens — this operator closes the loop by learning
the tokenizer itself from the corpus, Spark-first. Classic byte-pair
encoding (Sennrich et al. 2016): start from characters, repeatedly merge
the most frequent adjacent symbol pair. The distributed formulation rests
on the standard observation that BPE trains on the WORD-FREQUENCY table,
not the raw text: after ONE corpus-scale aggregation (word → count), every
merge iteration touches only vocab-sized data.

- ``bpe_train``: corpus scan → word counts (the only pass over raw text;
  partial-agged shuffle at word grain) → N merge rounds, each one
  pair-explode + weighted count + a 1-row argmax collect + an Arrow-kernel
  merge application over the vocab table. The driver loop is inherent to
  the algorithm (each merge depends on the counts AFTER the previous one —
  same sanctioned shape as the k-means and connected-components loops);
  per round the driver sees exactly one (pair, count) row.
  ``localCheckpoint`` every few rounds cuts the growing lineage exactly as
  ``kmeans_centroids`` does. Ties break (count DESC, pair lexicographic) —
  fully deterministic, so two engines (or two runs) learn identical merges.
- ``bpe_encode``: apply the learned ranked merge list to any text — the
  standard greedy lowest-rank-first application, per word, inside a batched
  Arrow kernel with the merge table broadcast (it is vocab-of-merges sized,
  i.e. tiny). Word-level results are computed once per DISTINCT word per
  batch — the Zipf distribution makes that a large constant-factor win.

Scale shape (100 TB): raw text is read once for the word count; the vocab
table (even web-scale: ~10^8 rows) shuffles at word grain per round with
map-side combine on pair counts. ``min_pair_count`` stops training when no
pair clears the floor. Nothing per-round grows with corpus size — only
with vocabulary.

gensor has no tokenizer surface; this extends the training-data-pipeline
family (``functions/text.bpeish_token_count`` estimates token counts with
a fixed heuristic — ``bpe_train`` learns the real segmentation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word sentinel (kept printable & out-of-alphabet for the tests)
EOW = "</w>"


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the corpus — the single raw-text pass."""
    from gensor_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_word(syms: list, pair: tuple[str, str], joined: str) -> list:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ranked merge list [(left, right), ...] (rank = list position).

    Stops early when the best remaining pair's weighted count falls below
    ``min_pair_count``. Deterministic: ties break on the pair itself.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = _words(docs, text_col).select(
        "cnt",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        # adjacent pairs row-locally; a 1-symbol word explodes to nothing
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p").agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        pair = (best[0]["p"]["l"], best[0]["p"]["r"])
        merges.append(pair)
        joined = pair[0] + pair[1]

        schema = T.StructType([
            T.StructField("cnt", T.LongType()),
            T.StructField("syms", T.ArrayType(T.StringType())),
        ])

        def apply_merge(batches, _pair=pair, _joined=joined):
            for pdf in batches:
                pdf["syms"] = [
                    _merge_word(list(s), _pair, _joined) for s in pdf["syms"]
                ]
                yield pdf

        vocab = vocab.mapInPandas(apply_merge, schema)
        if (r + 1) % checkpoint_every == 0:
            # cut the per-round mapInPandas lineage chain (kmeans pattern)
            vocab = vocab.localCheckpoint()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment each document with the learned merges (greedy
    lowest-rank-first — the standard BPE application order). Adds
    ``out_col`` (array<string>); word results are memoized per distinct
    word within each Arrow batch (Zipf makes this the common case)."""
    from gensor_spark.functions.text import tokens

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    with_words = docs.withColumn("__words", tokens(F.col(text_col)))
    schema_w = T.StructType(
        with_words.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def encode(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for words in pdf["__words"]:
                toks: list[str] = []
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, ranks)
                    toks.extend(got)
                out.append(toks)
            pdf[out_col] = out
            yield pdf

    return (
        with_words.mapInPandas(encode, schema_w).drop("__words")
    )
