"""DSIR-style data selection: hashed-n-gram importance resampling.

Training-data-pipeline extension (no gensor analogue). DSIR (Xie et al.,
NeurIPS 2023, "Data Selection for Language Models via Importance
Resampling") selects raw pretraining documents that look like a small
high-quality TARGET corpus: fit bag-of-hashed-n-gram unigram models over
target (``p``) and raw (``q``), weight each raw document by its importance
log-ratio ``log w(d) = Σ_features c_f(d) · (log p_f − log q_f)``, then
sample without replacement with probability ∝ w via the Gumbel top-k
trick. The published recipe hashes word unigrams+bigrams into a fixed
bucket space so both models are dense, tiny and mergeable.

Shape at scale:

- Feature extraction is row-local (tokenize → unigrams + 2-token shingles →
  ``md5int(gram) % n_buckets``), a pure-Catalyst explode.
- Each model fit is ONE partial-agg shuffle on the bucket key — the result
  is ``≤ n_buckets`` rows by construction, independent of corpus size, so
  the joined log-ratio table is always **broadcast** back.
- Per-doc weights: exploded raw features join the broadcast ratio table and
  partial-agg ``sum`` per doc — one linear shuffle on ``doc_id``, the only
  wide op that scales with the corpus.
- Gumbel keys are deterministic (seeded ``md5int`` → uniform → Gumbel), so
  selection is reproducible; the global top-k plans as
  ``TakeOrderedAndProject`` (per-partition heads, no full sort).

Everything is pure Catalyst; no UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gensor_spark.functions.text import md5int, shingles, tokens

#: 2^32 as a double — md5int is uniform on [0, 2^32)
_H_SPACE = float(1 << 32)


def _hashed_features(docs: DataFrame, text_col: str, id_col: str,
                     n_buckets: int) -> DataFrame:
    """(doc_id, bucket) rows: word unigrams + bigrams hashed into buckets."""
    toks = tokens(F.col(text_col))
    grams = F.concat(toks, shingles(toks, 2))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(grams).alias("gram"),
    ).select("doc_id", (md5int(F.col("gram")) % n_buckets).alias("bucket"))


def _bucket_logprobs(feats: DataFrame, n_buckets: int,
                     smoothing: float) -> DataFrame:
    """Add-``smoothing`` smoothed log-probability per bucket (≤ n_buckets
    rows; buckets with zero mass get pure-smoothing mass via the outer join
    downstream)."""
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-raw-document importance log-weight vs the target distribution.

    Returns ``(doc_id, n_feat, logw)``; ``logw`` is the sum over the doc's
    hashed features (with multiplicity) of ``log p_target − log q_raw``,
    both add-``smoothing`` smoothed over the full ``n_buckets`` space.
    Documents with no features get ``logw = 0`` (kept, neutral weight).
    """
    raw_feats = _hashed_features(raw, text_col, id_col, n_buckets)
    tgt_counts = _bucket_logprobs(
        _hashed_features(target, text_col, id_col, n_buckets),
        n_buckets, smoothing).withColumnRenamed("c", "c_p")
    raw_counts = _bucket_logprobs(raw_feats, n_buckets, smoothing) \
        .withColumnRenamed("c", "c_q")

    # totals: 1-row broadcastable aggregates (never collected)
    tot_p = tgt_counts.agg(F.sum("c_p").alias("n_p"))
    tot_q = raw_counts.agg(F.sum("c_q").alias("n_q"))

    # dense log-ratio per OCCUPIED bucket (either side); unseen-in-one-side
    # buckets take pure smoothing mass. Buckets absent from BOTH sides can
    # never be probed by a raw doc, so the outer join over occupied buckets
    # is exact.
    ratio = (
        tgt_counts.join(raw_counts, "bucket", "full_outer")
        .crossJoin(F.broadcast(tot_p))
        .crossJoin(F.broadcast(tot_q))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("c_p"), F.lit(0)) + F.lit(smoothing))
                      / (F.col("n_p") + F.lit(smoothing * n_buckets)))
                - F.log((F.coalesce(F.col("c_q"), F.lit(0)) + F.lit(smoothing))
                        / (F.col("n_q") + F.lit(smoothing * n_buckets)))
            ).alias("logratio"),
        )
    )

    ids = raw.select(F.col(id_col).alias("doc_id"))
    weights = (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_feat"), F.sum("logratio").alias("logw"))
    )
    # left join back so feature-less (empty) docs keep a neutral weight
    return ids.join(weights, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_feat"), F.lit(0)).alias("n_feat"),
        F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
    )


def _gumbel_key(logw: Column, doc_id: Column, seed: int) -> Column:
    """Deterministic Gumbel perturbation: seeded md5 → uniform → Gumbel."""
    u = (md5int(F.concat(F.lit(f"{seed}:"), doc_id.cast("string")))
         + F.lit(0.5)) / F.lit(_H_SPACE)
    return logw - F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 8192,
    smoothing: float = 1.0,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel top-``k`` sample-without-replacement ∝ importance weight.

    Deterministic for a fixed ``seed``. Returns
    ``(rank, doc_id, logw, gumbel_key)`` ordered by descending key; the
    global top-k is a ``TakeOrderedAndProject``-shaped sort-limit (cheap at
    any corpus size), then a single tiny window ranks the k survivors.
    """
    w = dsir_logweights(raw, target, n_buckets, smoothing, text_col, id_col)
    keyed = w.withColumn("gumbel_key",
                         _gumbel_key(F.col("logw"), F.col("doc_id"), seed))
    top = keyed.orderBy(F.col("gumbel_key").desc(), F.col("doc_id")).limit(k)
    from pyspark.sql import Window
    # constant partition key: the window only ever sees the k survivors
    rank = F.row_number().over(
        Window.partitionBy(F.lit(0))
        .orderBy(F.col("gumbel_key").desc(), F.col("doc_id")))
    return top.select(rank.alias("rank"), "doc_id", "logw", "gumbel_key")
