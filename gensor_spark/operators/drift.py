"""Corpus drift detection: is one source / snapshot distributed like the rest?

A training-data pipeline re-crawls and re-ingests continuously; before a new
source (or a new snapshot of an old one) is mixed into the corpus, the
standing question is whether it still *looks like* the corpus — document
lengths, vocabulary. Two standard, complementary measures:

- ``psi_numeric`` — Population Stability Index of a numeric per-doc feature
  (doc length, token count, quality score) for each group vs the rest of the
  corpus. The classic monitoring statistic: PSI = Σ (p_i − q_i)·ln(p_i/q_i)
  over fixed bins; < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted.
- ``vocab_jsd`` — Jensen-Shannon divergence between a group's token unigram
  distribution and the rest of the corpus. Symmetric, bounded by ln 2, and
  defined without smoothing (a token absent on one side contributes exactly
  its other half's ½·ln 2 share), so the statistic is exact and
  engine-reproducible from the counts alone.

The per-series complement (did THIS series' value distribution drift over
time?) is ``operators/seriesstats.ks_split``; these two work at corpus
grain. gensor has no analogue (its analysis surface stops at per-series
trend, ``/root/reference/gensor/analysis/stats.py``) — this is part of the
"operations a large-scale training-data pipeline needs" extension surface.

Scale shape (100 TB): ``psi_numeric`` aggregates the corpus once at
(group, bin) grain — output cardinality ≈ groups × nbins, tiny — with the
1-row global bounds broadcast; ``vocab_jsd`` shuffles at (group, token)
then token grain, with partial aggregation doing the heavy lifting
map-side; per-group totals (small) are broadcast back. Nothing collects at
the driver and no state grows with document count — only with vocabulary
and group count. PSI binning uses pure INTEGER arithmetic
(``(v − lo)·nbins DIV span``) so bin assignment is bit-identical across
engines — no float boundary can disagree between the Spark plan and the
DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LN2 = math.log(2.0)


def psi_numeric(
    df: DataFrame,
    group_col: str,
    value_col: str,
    nbins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI of each group's ``value_col`` distribution vs the rest of the corpus.

    ``value_col`` must be integral (doc length, token count): bins are
    ``((v − min)·nbins) DIV (max − min + 1)`` — exact integer arithmetic,
    identical in any engine. Empty bins are densified so every group scores
    the same ``nbins`` terms; ``eps``-smoothed proportions
    ``p_i = (c_i + eps)/(n + nbins·eps)`` keep ln finite on empty bins.

    Returns one row per group: (group, n_docs, psi).
    """
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(value_col).cast("long").alias("_v")
    )
    bounds = vals.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    binned = vals.join(F.broadcast(bounds)).selectExpr(
        "_g", f"((_v - _lo) * {int(nbins)}) DIV (_hi - _lo + 1) AS _b"
    )
    per_gb = binned.groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_c"))
    # densify: every (group, bin) cell exists, empty cells count 0
    bins = per_gb.sparkSession.range(nbins).select(F.col("id").alias("_b"))
    dense = (
        per_gb.select("_g").distinct()
        .crossJoin(F.broadcast(bins))
        .join(per_gb, ["_g", "_b"], "left")
        .na.fill({"_c": 0})
    )
    # rest-of-corpus count per cell = global bin count − this group's count;
    # all frames below are (groups × nbins)-sized — broadcast freely
    tot_b = dense.groupBy("_b").agg(F.sum("_c").alias("_tc"))
    tot_g = dense.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    n_all = tot_g.agg(F.sum("_ng").alias("_n"))
    smooth = float(nbins) * eps
    p = (F.col("_c") + F.lit(eps)) / (F.col("_ng") + F.lit(smooth))
    q = (F.col("_r") + F.lit(eps)) / (F.col("_nr") + F.lit(smooth))
    return (
        dense.join(F.broadcast(tot_b), "_b")
        .join(F.broadcast(tot_g), "_g")
        .join(F.broadcast(n_all))
        .select(
            "_g", "_c", "_ng",
            (F.col("_tc") - F.col("_c")).alias("_r"),
            # a group that IS the whole corpus has an empty rest side:
            # divide-by-NULL masks its PSI instead of crashing
            F.when(F.col("_n") > F.col("_ng"), F.col("_n") - F.col("_ng"))
            .alias("_nr"),
        )
        .withColumn("_t", (p - q) * F.log(p / q))
        .groupBy(F.col("_g").alias(group_col))
        .agg(F.max("_ng").alias("n_docs"), F.sum("_t").alias("psi"))
    )


def vocab_jsd(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between each group's token unigram
    distribution and the rest of the corpus.

    p = group's distribution, q = rest-of-corpus, m = (p+q)/2;
    JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m). Tokens the group never saw have
    p = 0 and contribute ½·q·ln 2 each — summed in closed form as
    ½·ln 2·(1 − Σ_present q), so the plan only ever materializes cells for
    (group, token) pairs that actually occur. A group that IS the entire
    corpus has no rest side and reports NULL (mask-don't-crash).

    Returns one row per group: (group, n_tokens, jsd).
    """
    toks = df.select(
        F.col(group_col).alias("_g"), F.explode(F.col(tokens_col)).alias("_t")
    )
    gt = toks.groupBy("_g", "_t").agg(F.count(F.lit(1)).alias("_c"))
    return vocab_jsd_from_counts(gt, "_g", "_t", "_c").withColumnRenamed(
        "_g", group_col
    )


def vocab_jsd_from_counts(
    gt: DataFrame,
    group_col: str,
    token_col: str,
    count_col: str,
) -> DataFrame:
    """``vocab_jsd`` over a pre-aggregated (group, token, count) table —
    the entry point for callers that already paid the tokenize+count pass
    (e.g. a shared heavy-hitters job caching the same counts)."""
    gt = gt.select(
        F.col(group_col).alias("_g"),
        F.col(token_col).alias("_t"),
        F.col(count_col).alias("_c"),
    )
    tot_t = gt.groupBy("_t").agg(F.sum("_c").alias("_tc"))
    tot_g = gt.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    n_all = tot_g.agg(F.sum("_ng").alias("_n"))
    m = (F.col("_p") + F.col("_q")) / 2
    cells = (
        gt.join(tot_t, "_t")  # token-key join: vocab-sized, partial-agged
        .join(F.broadcast(tot_g), "_g")
        .join(F.broadcast(n_all))
        .select(
            "_g", "_ng",
            (F.col("_c") / F.col("_ng")).alias("_p"),
            ((F.col("_tc") - F.col("_c"))
             / F.when(F.col("_n") > F.col("_ng"), F.col("_n") - F.col("_ng"))
             ).alias("_q"),
        )
        .select(
            "_g", "_ng", "_q",
            # p > 0 by construction on a present cell; the q-half only
            # contributes where the rest of the corpus also has the token
            (0.5 * F.col("_p") * F.log(F.col("_p") / m)
             + 0.5 * F.coalesce(
                 F.when(F.col("_q") > 0, F.col("_q") * F.log(F.col("_q") / m)),
                 F.lit(0.0),
             )).alias("_j"),
        )
    )
    return (
        cells.groupBy("_g")
        .agg(
            F.max("_ng").alias("n_tokens"),
            # absent-token tail in closed form; NULL _q (no rest side)
            # propagates through sum() only if every cell is NULL, which is
            # exactly the single-group corpus -> NULL jsd
            (F.sum("_j") + 0.5 * LN2 * (1.0 - F.sum("_q"))).alias("jsd"),
        )
    )


def psi_vs_reference(
    df: DataFrame,
    reference: DataFrame,
    group_col: str,
    value_col: str,
    nbins: int = 10,
    eps: float = 1e-6,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """PSI of each group's ``value_col`` distribution against an EXPLICIT
    reference sample — the monitoring form of ``psi_numeric`` (which
    compares vs rest-of-corpus): score today's ingest per source against
    last month's accepted corpus, epoch after epoch, without the baseline
    shifting underneath.

    ``bounds`` fixes the binning domain (lo, hi); default is the
    REFERENCE's min/max — stable across calls with the same reference,
    which is what makes per-epoch readings comparable. Values outside the
    bounds clamp into the edge bins (the standard monitoring convention:
    out-of-range mass is drift evidence, not an error). Same integer-exact
    binning and eps-smoothed PSI as ``psi_numeric``.

    Scale shape: the reference collapses to ``nbins`` counts (one agg,
    broadcast); the scored corpus aggregates once at (group, bin) grain.
    Returns (group, n_docs, psi).
    """
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(value_col).cast("long").alias("_v")
    )
    ref = reference.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("_v")
    )
    if bounds is None:
        b = ref.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    else:
        lo, hi = int(bounds[0]), int(bounds[1])
        if hi < lo:
            raise ValueError(f"bounds hi < lo: {bounds}")
        b = ref.sparkSession.range(1).select(
            F.lit(lo).alias("_lo"), F.lit(hi).alias("_hi"))

    def _bin(frame: DataFrame) -> DataFrame:
        # clamp into the domain, then the integer-exact bin
        return frame.join(F.broadcast(b)).selectExpr(
            *[c for c in frame.columns if c != "_v"],
            f"((least(greatest(_v, _lo), _hi) - _lo) * {int(nbins)})"
            f" DIV (_hi - _lo + 1) AS _b",
        )

    bins = vals.sparkSession.range(nbins).select(F.col("id").alias("_b"))
    ref_counts = (
        _bin(ref).groupBy("_b").agg(F.count(F.lit(1)).alias("_rc"))
        .join(bins, "_b", "right").na.fill({"_rc": 0})
    )
    per_gb = _bin(vals).groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_c"))
    dense = (
        per_gb.select("_g").distinct()
        .crossJoin(F.broadcast(bins))
        .join(per_gb, ["_g", "_b"], "left")
        .na.fill({"_c": 0})
        .join(F.broadcast(ref_counts), "_b")
    )
    tot_g = dense.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    n_ref = ref_counts.agg(F.sum("_rc").alias("_nr"))
    smooth = float(nbins) * eps
    p = (F.col("_c") + F.lit(eps)) / (F.col("_ng") + F.lit(smooth))
    q = (F.col("_rc") + F.lit(eps)) / (F.col("_nr") + F.lit(smooth))
    return (
        dense.join(F.broadcast(tot_g), "_g")
        .join(F.broadcast(n_ref))
        .withColumn("_t", (p - q) * F.log(p / q))
        .groupBy(F.col("_g").alias(group_col))
        .agg(F.max("_ng").alias("n_docs"), F.sum("_t").alias("psi"))
    )
