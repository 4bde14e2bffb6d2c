"""Deterministic stratified sampling / source mixing for training data.

Training-data-pipeline extension (no gensor analogue). Web-scale corpus
assembly re-weights sources ("2 epochs of wiki, 0.3 of common-crawl"): a
per-stratum Bernoulli keep-decision that must be (a) row-local — no shuffle,
no global state, (b) deterministic and seed-stable — re-running the pipeline
or re-processing one partition keeps exactly the same rows (resumability
depends on this), and (c) engine-portable — the DuckDB oracle reproduces the
exact selection, bit for bit.

``hash mod D < rate·D`` over the md5-derived 32-bit hash of ``salt:id``
(functions/text.md5int) gives all three. Nothing here samples with
``rand()`` — nondeterministic sampling breaks checkpoint resume and makes
correctness unverifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gensor_spark.functions.text import md5int

#: hash-space denominator; rates are quantized to 1/DENOM steps (exactly
#: representable on both engines — no float threshold comparisons)
DENOM = 1_000_000


def keep_hash(id_col: Column, salt: str) -> Column:
    """Uniform-ish value in [0, DENOM) from the salted md5 of the id."""
    return F.pmod(md5int(F.concat(F.lit(salt), F.lit(":"),
                                  id_col.cast("string"))), F.lit(DENOM))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source", id_col: str = "doc_id",
                      salt: str = "mix1", default_rate: float = 0.0) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``rates[s]``
    (``default_rate`` for unlisted strata), decided by the salted id hash.

    The rate lookup is a literal MAP (broadcast-free, row-local); the whole
    plan is one filter expression inside whole-stage codegen.
    """
    pairs: list[Column] = []
    for k, v in rates.items():
        pairs += [F.lit(k), F.lit(int(round(v * DENOM)))]
    rate_map = F.create_map(*pairs) if pairs else None
    thresh = (
        F.coalesce(rate_map[F.col(strata_col)],
                   F.lit(int(round(default_rate * DENOM))))
        if rate_map is not None
        else F.lit(int(round(default_rate * DENOM)))
    )
    return df.filter(keep_hash(F.col(id_col), salt) < thresh)


def sample_rates_from_hash(strata_col: Column, salt: str = "rate1",
                           lo: float = 0.1, hi: float = 0.9) -> Column:
    """A deterministic per-stratum rate in [lo, hi) derived from the stratum
    name — handy when exercising the sampler over unbounded stratum sets
    (tests, benchmarks) without enumerating them."""
    span = int(round((hi - lo) * DENOM))
    return (
        F.lit(int(round(lo * DENOM)))
        + F.pmod(md5int(F.concat(F.lit(salt), F.lit(":"), strata_col)),
                 F.lit(span))
    )


def stratified_sample_hash_rates(df: DataFrame, strata_col: str = "source",
                                 id_col: str = "doc_id", salt: str = "mix1",
                                 rate_salt: str = "rate1") -> DataFrame:
    """``stratified_sample`` with the per-stratum rate itself hash-derived —
    fully closed-form, so the oracle needs no rate table."""
    thresh = sample_rates_from_hash(F.col(strata_col), rate_salt)
    return df.filter(keep_hash(F.col(id_col), salt) < thresh)


def quality_weighted_sample(df: DataFrame, weight_col: str,
                            id_col: str = "doc_id", salt: str = "qw1",
                            scale: float = 1.0) -> DataFrame:
    """Keep each row with probability ``min(1, scale·weight)`` — the
    quality-proportional subsampling step of corpus-mixing recipes ("keep
    high-quality documents at full rate, down-sample the tail"), with the
    same determinism contract as ``stratified_sample``: row-local, seed-
    stable, engine-portable (the keep decision is the salted md5 hash
    against a per-row integer threshold).

    ``weight_col`` is any per-row double in [0, 1] — a model score, a
    heuristic quality feature, a length proxy. NULL weights keep nothing
    (mask-don't-crash). ``scale`` rescales in place (e.g. target a fixed
    token budget by setting scale = budget / Σ weight).
    """
    # least() SKIPS null args — guard explicitly so a NULL weight yields a
    # NULL threshold (row filtered out), not least(DENOM, NULL) = keep-all
    thresh = F.when(
        F.col(weight_col).isNotNull(),
        F.least(
            F.lit(DENOM).cast("long"),
            F.round(F.col(weight_col) * F.lit(float(scale)) * DENOM).cast("long"),
        ),
    )
    return df.filter(keep_hash(F.col(id_col), salt) < thresh)


def stratified_exact_k(df: DataFrame, k: int, strata_col: str = "source",
                       id_col: str = "doc_id", salt: str = "ek1",
                       salts: int = 16,
                       order_col: str | None = None) -> DataFrame:
    """EXACTLY ``min(k, |stratum|)`` rows per stratum, deterministic and
    seed-stable — the eval-set / held-out construction primitive where a
    Bernoulli rate (``stratified_sample``) cannot promise exact counts.

    Default selection ranks each stratum by the salted id hash (a
    pseudo-random permutation → uniform without replacement), so adding
    unrelated strata or re-running never changes a stratum's picks, and
    the DuckDB oracle reproduces the selection exactly. With ``order_col``
    the rank is by that column DESCENDING instead (hash as tie-break):
    per-stratum quota with priority — "keep the N best-quality docs per
    source".

    Scale shape: the per-stratum rank is the salted TWO-PHASE top-k (the
    bm25/retrieval pattern) — a partial cut per (stratum, hash-bucket)
    bounds the final per-stratum sort to ``salts * k`` rows, so one hot
    stratum with billions of rows cannot pin a single window task.
    """
    from pyspark.sql import Window

    h = keep_hash(F.col(id_col), salt)
    if order_col is None:
        order = [h.asc(), F.col(id_col).asc()]
    else:
        order = [F.col(order_col).desc_nulls_last(), h.asc(),
                 F.col(id_col).asc()]
    part = Window.partitionBy(
        strata_col, F.pmod(md5int(F.col(id_col).cast("string")),
                           F.lit(salts))).orderBy(*order)
    final = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn("_pr", F.row_number().over(part))
        .where(F.col("_pr") <= k)
        .withColumn("_r", F.row_number().over(final))
        .where(F.col("_r") <= k)
        .drop("_pr", "_r")
    )


def temperature_rates(counts: dict[str, int], alpha: float,
                      budget: int | None = None) -> dict[str, float]:
    """Per-source keep rates for TEMPERATURE-BASED mixing (the multilingual
    LM recipe — mC4/mT5, Arivazhagan et al. 2019): sample source ``s`` with
    probability ``q_s ∝ p_s^alpha`` where ``p_s`` is its corpus share.
    ``alpha=1`` keeps natural proportions; ``alpha→0`` flattens toward
    uniform (up-samples the tail, down-samples the head) — the standard
    fix for head-language/source dominance.

    ``budget`` is the target TOTAL row count; rates are ``q_s·budget/n_s``
    clamped to 1 (this sampler never repeats rows, so a tail source capped
    at 1.0 under-fills its quota rather than over-sampling — callers
    wanting >1 epochs of a tiny source materialize repeats upstream).
    ``budget=None`` targets the full corpus size N (pure re-weighting).
    Pure arithmetic on the per-source counts — unit-testable, engine-free.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if not counts:
        return {}
    total = float(sum(counts.values()))
    if total <= 0:
        return {s: 0.0 for s in counts}
    weights = {s: (n / total) ** alpha if n > 0 else 0.0
               for s, n in counts.items()}
    wsum = sum(weights.values())
    b = float(budget if budget is not None else total)
    return {
        s: min(1.0, (weights[s] / wsum) * b / counts[s]) if counts[s] else 0.0
        for s in counts
    }


def temperature_mix(df: DataFrame, alpha: float, budget: int | None = None,
                    strata_col: str = "source", id_col: str = "doc_id",
                    salt: str = "temp1") -> DataFrame:
    """Temperature-mix the corpus in one pass: per-source counts (one
    partial-agg shuffle over the SOURCE grain — rows out = #sources, the
    one justified driver collect), ``temperature_rates``, then the
    deterministic hash sampler. Same seed-stability/oracle contract as
    ``stratified_sample`` — the selection is a pure function of
    (id, salt, counts).
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        # a NULL stratum cannot be a map key (and matches no map entry
        # anyway): those rows fall to stratified_sample's default_rate=0,
        # i.e. null-source rows are dropped, not crashed on
        if r[0] is not None
    }
    rates = temperature_rates(counts, alpha, budget)
    return stratified_sample(df, rates, strata_col=strata_col,
                             id_col=id_col, salt=salt)
