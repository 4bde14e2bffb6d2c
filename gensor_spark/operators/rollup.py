"""Retention-tier rollups: 1m → 1h → 1d continuous aggregates.

The north rule requires ``count/min/max/mean/last`` per tier, each coarser
tier derivable from the finer one, and incremental maintenance. The trick is
to materialize **partial states**, not finalized values: mean is carried as
``(sum, cnt)`` (never average-of-averages), and ``last`` is carried with its
timestamp so the cascade can ``max_by`` it. All partials are associative and
commutative, which is also what makes the salted two-phase aggregation and
the incremental merge (plans/incremental.py) correct.

gensor analogue: ``Timeseries.resample`` applied at three frequencies
(``/root/reference/gensor/core/base.py:147-170``) — except gensor recomputes
from raw every call, while these tiers compose: 1h is an 8,640× smaller input
read than the raw points when derived from 1m.

Partial-state schema per (doc_id, source, bin_ts)::

    cnt   bigint   -- non-null point count (pandas .count semantics)
    vmin  double
    vmax  double
    vsum  double
    last  double   -- last non-null value in the bin ...
    last_ts timestamp -- ... and when it occurred (cascade orders by this)
    vsumsq double  -- OPTIONAL (with_sumsq=True): Σx², the mergeable
                   -- variance/stddev state (TimescaleDB stats_agg analogue)
    first double   -- OPTIONAL (with_first=True): first non-null value ...
    first_ts timestamp -- ... and when — ``min_by`` merges it, the exact
                   -- mirror of the ``last`` pair; with min/max/last this
                   -- completes the OHLC bar (open=first, close=last)
    vsumcu double  -- OPTIONAL (with_moments=True): Σx³ ...
    vsumqu double  -- ... and Σx⁴ — the mergeable states behind per-bin
                   -- skewness/kurtosis (implies Σx², which they divide by)

``finalize_tier`` turns partials into the user-facing
``count/min/max/mean/last`` frame.

Skew: one hot series (giant token array / hot doc_id) lands every point in
the same ``(doc_id, source)`` hash bucket. The rollup key includes
``bin_ts`` so cardinality is already high, but a single hot *bin* can still
skew the 1d tier; ``rollup_tier(salt=N)`` splits each key N ways on a
deterministic hash of ``seq`` first (map-side partials stay small), then
merges the N sub-partials — classic salted two-phase aggregation. AQE skew
handling covers the join side; this covers the agg side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.resample import bin_ts, freq_to_seconds

PARTIAL_COLS = ("cnt", "vmin", "vmax", "vsum", "last", "last_ts")

#: opt-in partial columns (with_sumsq / with_first / with_moments) — kept
#: out of PARTIAL_COLS, which also names the columns the Iceberg MERGE
#: updates on the standard tier tables
OPT_PARTIAL_COLS = ("vsumsq", "first", "first_ts", "vsumcu", "vsumqu")

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def partial_aggs(v, ts, with_sumsq: bool = False, with_first: bool = False,
                 with_moments: bool = False) -> list:
    """The ONE partial-state aggregate list every producer shares
    (rollup_tier, rollup_calendar, streaming_rollup): a new opt-in partial
    family is added here once and exists in all of them. ``v``/``ts`` are
    the value and event-time Columns."""
    aggs = [
        F.count(v).alias("cnt"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v).alias("vsum"),
        F.max_by(v, F.when(v.isNotNull(), ts)).alias("last"),
        F.max(F.when(v.isNotNull(), ts)).alias("last_ts"),
    ]
    if with_first:
        aggs.append(F.min_by(v, F.when(v.isNotNull(), ts)).alias("first"))
        aggs.append(F.min(F.when(v.isNotNull(), ts)).alias("first_ts"))
    if with_sumsq or with_moments:
        aggs.append(F.sum(v * v).alias("vsumsq"))
    if with_moments:
        d = v.cast("double")
        aggs.append(F.sum(d * d * d).alias("vsumcu"))
        aggs.append(F.sum(d * d * (d * d)).alias("vsumqu"))
    return aggs


def rollup_tier(
    points: DataFrame,
    tier: str = "1m",
    keys: tuple[str, ...] = ("doc_id", "source"),
    salt: int = 0,
    with_sumsq: bool = False,
    with_first: bool = False,
    with_moments: bool = False,
) -> DataFrame:
    """Aggregate the point view into partial states at ``tier`` granularity.

    ``with_sumsq=True`` adds a ``vsumsq`` (sum of squares) partial — the
    mergeable state behind per-bin variance/stddev (TimescaleDB
    ``stats_agg`` analogue). It is associative like every other partial, so
    the cascade and the salted two-phase merge carry it unchanged; for
    integer-valued points (token ids) it is EXACT in doubles at any merge
    order (< 2^53), so cascaded stddev equals direct stddev bit-for-bit.

    ``with_first=True`` adds the ``first``/``first_ts`` pair (``min_by``
    mirror of ``last``) — with min/max/last this completes the OHLC bar
    (open=first, close=last), the classic financial tier rollup.

    ``with_moments=True`` adds Σx³/Σx⁴ (``vsumcu``/``vsumqu``) and implies
    ``vsumsq`` — the mergeable states behind per-bin skewness/kurtosis
    (``finalize_tier``). Plain sums, so every merge path carries them
    unchanged; unlike Σx², Σx⁴ of large token ids exceeds 2^53, so cascaded
    moments match direct ones to float accumulation order (~1 ulp), not
    bit-for-bit — ``finalize_tier`` guards the near-constant bins where
    that matters.
    """
    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    v = F.col("value")
    binned = points.withColumn("bin_ts", bin_ts(F.col("ts"), step))
    partials = partial_aggs(v, F.col("ts"), with_sumsq, with_first,
                            with_moments)

    if salt > 1:
        # two-phase: partial-agg on a salted key, then merge the sub-partials
        salted = binned.withColumn(
            "_salt", F.pmod(F.xxhash64("seq"), F.lit(salt))
        )
        sub = salted.groupBy(*keys, "bin_ts", "_salt").agg(*partials)
        return _merge_partials(sub, [*keys, "bin_ts"])
    return binned.groupBy(*keys, "bin_ts").agg(*partials)


def rollup_docs_arrays(
    docs: DataFrame,
    tier: str = "1m",
    tick_seconds: int = 60,
    epoch0: str = "2024-01-01 00:00:00",
    keys: tuple[str, ...] = ("doc_id", "source"),
    with_sumsq: bool = False,
    with_first: bool = False,
    with_moments: bool = False,
) -> DataFrame:
    """Tier partials straight from the token table — no point-view explode.

    For pre-tokenized docs the timestamp is affine in ``seq`` (ts = epoch0 +
    seq·tick), so a tier bin is exactly a FIXED-SIZE SLICE of the token
    array: bin ``b`` covers ``tokens[b·k : (b+1)·k]`` with ``k = step/tick``.
    All five partials are computed row-locally with array functions (slice/
    array_min/array_max/aggregate/element_at) and only the ~step/tick-times-
    smaller bin rows are ever exploded and shuffled.

    vs ``rollup_tier(docs_to_points(docs))``: identical output partials
    (asserted in tests), but the 100-TB-shape difference is that the raw
    point rows (each carrying the doc_id string!) never exist as rows — at
    tick=1s/1m-tier this is ~60× less JVM row churn and shuffle input, and
    per-doc skew vanishes before the shuffle (a hot doc compresses to its
    bin rows inside its own task). The generic shuffle path remains for
    irregular timestamps (events).
    """
    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    if step % tick_seconds:
        raise ValueError(f"tier step {step}s not a multiple of tick {tick_seconds}s")
    k = step // tick_seconds
    epoch_expr = F.unix_timestamp(F.lit(epoch0).cast("timestamp"))

    n_bins = F.ceil(F.size("tokens") / F.lit(k)).cast("int")
    # stage the chunk slices as a column: each chunk is then a BOUND lambda
    # variable in the aggregate pass below (evaluated once), not an inlined
    # slice expression recomputed per partial
    staged = (
        docs.filter(F.size("tokens") > 0)  # sequence(0,-1) would descend
        .select(
            *keys,
            F.transform(
                F.sequence(F.lit(0), n_bins - 1),
                lambda b: F.slice("tokens", b * k + 1, k),
            ).alias("_chunks"),
        )
    )
    def bin_struct(ch, i):
        fields = [
            F.timestamp_seconds(epoch_expr + i.cast("long") * step).alias("bin_ts"),
            F.size(ch).cast("long").alias("cnt"),
            F.array_min(ch).cast("double").alias("vmin"),
            F.array_max(ch).cast("double").alias("vmax"),
            F.aggregate(ch, F.lit(0.0), lambda acc, x: acc + x).alias("vsum"),
            F.element_at(ch, -1).cast("double").alias("last"),
            F.timestamp_seconds(
                epoch_expr + (i.cast("long") * k + F.size(ch) - 1) * tick_seconds
            ).alias("last_ts"),
        ]
        if with_first:
            fields.append(F.element_at(ch, 1).cast("double").alias("first"))
            fields.append(F.timestamp_seconds(
                epoch_expr + i.cast("long") * k * tick_seconds
            ).alias("first_ts"))
        fields.append(
            F.aggregate(  # cast BEFORE the square: int32·int32 overflows
                ch, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
            ).alias("vsumsq"))
        if with_moments:
            fields.append(F.aggregate(
                ch, F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x * x).alias("vsumcu"))
            fields.append(F.aggregate(
                ch, F.lit(0.0),
                lambda acc, x: acc
                + (x.cast("double") * x) * (x.cast("double") * x),
            ).alias("vsumqu"))
        return F.struct(*fields)

    out_cols = ["_b.bin_ts", "_b.cnt", "_b.vmin", "_b.vmax",
                "_b.vsum", "_b.last", "_b.last_ts"]
    if with_first:
        out_cols += ["_b.first", "_b.first_ts"]
    if with_sumsq or with_moments:
        out_cols.append("_b.vsumsq")
    if with_moments:
        out_cols += ["_b.vsumcu", "_b.vsumqu"]
    return (
        staged.select(*keys, F.explode(F.transform("_chunks", bin_struct)).alias("_b"))
        .select(*keys, *out_cols)
    )


def ragged_bins(pdf, k: int, dtype=None):
    """Per-Arrow-batch ragged-offset prefix sums shared by every affine
    token→bin kernel (``rollup_docs_arrow``, ``rollup_docs_arrow_narrow``,
    ``histquantiles.rollup_hist_docs_arrow``) — ONE owner for the
    empty-doc mask and the doc/bin offset arithmetic, so an edge-case fix
    lands in all three kernels at once.

    Returns ``None`` for an all-empty batch, else the tuple
    ``(keep, flat, lens, nbins, doc_off, bin_off, bin_local, total_bins)``:
    ``keep`` the non-empty-doc mask over the incoming rows, ``flat`` the
    concatenation of the kept token arrays (cast to ``dtype``), ``lens``
    kept doc lengths, ``nbins`` per-doc bin counts at ``k`` ticks per bin,
    ``doc_off``/``bin_off`` exclusive prefix sums, and ``bin_local`` each
    global bin's index within its own doc.
    """
    import numpy as np

    toks = [np.asarray(t, dtype=dtype) for t in pdf["tokens"]]
    lens = np.fromiter((t.size for t in toks), dtype=np.int64,
                       count=len(toks))
    keep = lens > 0
    if not keep.any():
        return None
    toks = [t for t, kp in zip(toks, keep) if kp]
    lens = lens[keep]
    flat = np.concatenate(toks)
    nbins = -(-lens // k)
    doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    bin_off = np.concatenate([[0], np.cumsum(nbins)[:-1]])
    total_bins = int(nbins.sum())
    bin_local = np.arange(total_bins) - np.repeat(bin_off, nbins)
    return keep, flat, lens, nbins, doc_off, bin_off, bin_local, total_bins


def rollup_docs_arrow(
    docs: DataFrame,
    tier: str = "1m",
    tick_seconds: int = 60,
    epoch0_us: int = 1_704_067_200_000_000,
    keys: tuple[str, ...] = ("doc_id", "source"),
    with_sumsq: bool = False,
    with_first: bool = False,
    with_moments: bool = False,
) -> DataFrame:
    """Affine-ts tier partials via a batched numpy kernel (the fast path).

    Same mathematics as ``rollup_docs_arrays`` (a tier bin of a token doc is
    a fixed-size array slice), but executed as ONE set of
    ``ufunc.reduceat`` calls per Arrow batch: all docs' tokens are
    concatenated, global bin boundaries are computed arithmetically, and
    min/max/sum reduce every bin of every doc in single C passes. The bin
    starts tile the flat array exactly (each doc's last bin ends where the
    next doc begins), which is precisely reduceat's segment semantics.

    Why not pure SQL: the higher-order-function variant evaluates an
    interpreted lambda per token (no codegen for HOFs — measured slower
    than exploding 60× more rows through codegen), and the explode variant
    shuffles a row per token. This kernel touches each token once at numpy
    speed and emits only bin rows. Output is bit-identical to
    ``rollup_tier(docs_to_points(docs))`` (sums reduce in seq order) —
    asserted in tests.
    """
    import pandas as pd

    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    if step % tick_seconds:
        raise ValueError(f"tier step {step}s not a multiple of tick {tick_seconds}s")
    k = step // tick_seconds
    import numpy as np

    schema = (
        "doc_id string, source string, bin_ts timestamp, cnt long, "
        "vmin double, vmax double, vsum double, last double, last_ts timestamp"
    )
    if with_first:
        schema += ", first double, first_ts timestamp"
    if with_sumsq or with_moments:
        schema += ", vsumsq double"
    if with_moments:
        schema += ", vsumcu double, vsumqu double"

    def kernel(batches):
        for pdf in batches:
            rb = ragged_bins(pdf, k, dtype=np.float64)
            if rb is None:
                continue
            keep, flat, lens, nbins, doc_off, bin_off, bin_local, total_bins = rb
            starts = np.repeat(doc_off, nbins) + bin_local * k
            ends = np.minimum(starts + k, np.repeat(doc_off + lens, nbins))
            cnt = ends - starts
            vmin = np.minimum.reduceat(flat, starts)
            vmax = np.maximum.reduceat(flat, starts)
            vsum = np.add.reduceat(flat, starts)
            last = flat[ends - 1]
            bin_ts = pd.to_datetime(
                epoch0_us + bin_local * (step * 1_000_000), unit="us"
            )
            last_ts = pd.to_datetime(
                epoch0_us + (bin_local * k + cnt - 1) * (tick_seconds * 1_000_000),
                unit="us",
            )
            out = {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy()[keep], nbins),
                "source": np.repeat(pdf["source"].to_numpy()[keep], nbins),
                "bin_ts": bin_ts,
                "cnt": cnt,
                "vmin": vmin,
                "vmax": vmax,
                "vsum": vsum,
                "last": last,
                "last_ts": last_ts,
            }
            if with_first:
                out["first"] = flat[starts]
                out["first_ts"] = pd.to_datetime(
                    epoch0_us + bin_local * k * (tick_seconds * 1_000_000),
                    unit="us",
                )
            if with_sumsq or with_moments:
                out["vsumsq"] = np.add.reduceat(flat * flat, starts)
            if with_moments:
                # same per-element association as the Catalyst producers:
                # x³ = (x·x)·x, x⁴ = (x·x)·(x·x) — reduceat accumulates
                # left-to-right like F.aggregate, so partials stay bitwise
                sq = flat * flat
                out["vsumcu"] = np.add.reduceat(sq * flat, starts)
                out["vsumqu"] = np.add.reduceat(sq * sq, starts)
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, schema=schema)


def _merge_partials(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Combine partial states — associative, so safe at any nesting level.

    Sumsq-aware: a ``vsumsq`` column, when present, merges as a plain sum —
    so the cascade, the salted two-phase path, the incremental pipeline, and
    the streaming rollup all propagate the variance state without changes.
    """
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("vsum").alias("vsum"),
        F.max_by("last", F.when(F.col("cnt") > 0, F.col("last_ts"))).alias("last"),
        F.max(F.when(F.col("cnt") > 0, F.col("last_ts"))).alias("last_ts"),
    ]
    if "first" in partials.columns:
        aggs.append(F.min_by("first", F.when(F.col("cnt") > 0,
                                             F.col("first_ts"))).alias("first"))
        aggs.append(F.min(F.when(F.col("cnt") > 0,
                                 F.col("first_ts"))).alias("first_ts"))
    if "vsumsq" in partials.columns:
        aggs.append(F.sum("vsumsq").alias("vsumsq"))
    for c in ("vsumcu", "vsumqu"):
        if c in partials.columns:
            aggs.append(F.sum(c).alias(c))
    return partials.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# narrow partial states: the shuffle-width experiment for the wide scaling
# pair (BENCH/BASELINE.md). Same mathematics, narrower physical rows:
# timestamps become int32 ordinals (bin index at the tier's step; last as a
# global tick index), cnt becomes int32, and the extrema/last become float32.
# float32 is LOSSLESS here iff every value is an integer with |v| < 2^24 —
# true for any real tokenizer vocabulary (token ids ≪ 16.7M); the kernel
# asserts it per Arrow batch and aborts rather than silently rounding.
# vsum stays float64 (sums outgrow the 24-bit mantissa immediately).
# ---------------------------------------------------------------------------

NARROW_PARTIAL_COLS = ("cnt", "vmin", "vmax", "vsum", "last", "last_t")


def rollup_docs_arrow_narrow(
    docs: DataFrame,
    tier: str = "1m",
    tick_seconds: int = 60,
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """``rollup_docs_arrow`` with narrow partial rows (see block comment).

    Output: ``(keys…, bin int, cnt int, vmin float, vmax float,
    vsum double, last float, last_t int)`` where ``bin`` is the bin ordinal
    at the tier's step from the affine epoch and ``last_t`` the global tick
    index of the bin's last point. ``widen_partials`` restores the standard
    wide schema bit-identically.
    """
    import numpy as np
    import pandas as pd

    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    if step % tick_seconds:
        raise ValueError(f"tier step {step}s not a multiple of tick {tick_seconds}s")
    k = step // tick_seconds

    schema = (
        "doc_id string, source string, bin int, cnt int, "
        "vmin float, vmax float, vsum double, last float, last_t int"
    )

    def kernel(batches):
        for pdf in batches:
            rb = ragged_bins(pdf, k, dtype=np.float64)
            if rb is None:
                continue
            keep, flat, lens, nbins, doc_off, bin_off, bin_local, total_bins = rb
            starts = np.repeat(doc_off, nbins) + bin_local * k
            ends = np.minimum(starts + k, np.repeat(doc_off + lens, nbins))
            cnt = ends - starts
            vmin = np.minimum.reduceat(flat, starts)
            vmax = np.maximum.reduceat(flat, starts)
            last = flat[ends - 1]
            # f32-exactness check on the per-bin STORED values (tiny
            # arrays), NOT on `flat` — a full-batch pass would allocate a
            # copy of every token. The contract is abort-not-round, so the
            # test is the exact one: every value that will be cast survives
            # a f32 round-trip (catches non-integers like 0.1 that a
            # magnitude-only |v| < 2^24 bound would silently round).
            stored = np.concatenate((vmin, vmax, last))
            if np.any(stored != stored.astype(np.float32).astype(np.float64)):
                raise ValueError(
                    "narrow partials require every stored value (per-bin "
                    "min/max/last) to be exactly float32-representable — "
                    "integers with |v| < 2^24; use rollup_docs_arrow instead"
                )
            yield pd.DataFrame({
                "doc_id": np.repeat(pdf["doc_id"].to_numpy()[keep], nbins),
                "source": np.repeat(pdf["source"].to_numpy()[keep], nbins),
                "bin": bin_local.astype(np.int32),
                "cnt": cnt.astype(np.int32),
                "vmin": vmin.astype(np.float32),
                "vmax": vmax.astype(np.float32),
                "vsum": np.add.reduceat(flat, starts),
                "last": last.astype(np.float32),
                "last_t": (bin_local * k + cnt - 1).astype(np.int32),
            })

    return docs.mapInPandas(kernel, schema=schema)


def _merge_partials_narrow(partials: DataFrame,
                           group_cols: list[str]) -> DataFrame:
    """``_merge_partials`` over the narrow schema (int/float32 preserved)."""
    return partials.groupBy(*group_cols).agg(
        F.sum("cnt").cast("int").alias("cnt"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("vsum").alias("vsum"),
        F.max_by("last", F.when(F.col("cnt") > 0, F.col("last_t"))).alias("last"),
        F.max(F.when(F.col("cnt") > 0, F.col("last_t"))).alias("last_t"),
    )


def cascade_tier_narrow(
    finer: DataFrame,
    finer_tier: str,
    tier: str,
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """``cascade_tier`` on narrow partials: re-bin by integer ordinal.

    ``bin`` ordinals are non-negative in the affine-ts path (ts ≥ epoch0 by
    construction), so floor-div by the step ratio is the exact re-binning.
    """
    finer_step = TIER_SECONDS.get(finer_tier) or freq_to_seconds(finer_tier)
    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    if step % finer_step:
        raise ValueError(f"{tier} not a multiple of {finer_tier}")
    ratio = step // finer_step
    rebinned = finer.withColumn(
        "bin", F.floor(F.col("bin") / ratio).cast("int")
    )
    return _merge_partials_narrow(rebinned, [*keys, "bin"])


def widen_partials(
    narrow: DataFrame,
    tier: str,
    tick_seconds: int,
    epoch0_us: int = 1_704_067_200_000_000,
) -> DataFrame:
    """Narrow partials → the standard wide schema (PARTIAL_COLS + bin_ts).

    Exact inverse of the narrowing: ordinals back to timestamps, extrema
    back to double (lossless — the kernel guaranteed f32-exactness), cnt
    back to long.
    """
    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    other = [c for c in narrow.columns
             if c not in NARROW_PARTIAL_COLS and c != "bin"]
    e0 = F.lit(epoch0_us).cast("long")
    return narrow.select(
        *other,
        F.timestamp_micros(
            e0 + F.col("bin").cast("long") * (step * 1_000_000)
        ).alias("bin_ts"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
        F.col("vsum").alias("vsum"),
        F.col("last").cast("double").alias("last"),
        F.timestamp_micros(
            e0 + F.col("last_t").cast("long") * (tick_seconds * 1_000_000)
        ).alias("last_ts"),
    )


def cascade_tier(
    finer: DataFrame,
    tier: str,
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """Derive a coarser tier from a finer tier's partial states.

    Reads the (much smaller) finer tier instead of raw points — the
    incremental-maintenance property the north rule asks for. Correct because
    every partial is associative; mean in particular is re-derived from
    (vsum, cnt), never averaged across bins.
    """
    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    rebinned = finer.withColumn("bin_ts", bin_ts(F.col("bin_ts"), step))
    return _merge_partials(rebinned, [*keys, "bin_ts"])


def finalize_tier(partials: DataFrame, ddof: int = 1) -> DataFrame:
    """Partial states → user-facing count/min/max/mean/last columns.

    All-null bins (cnt=0) finalize to null aggregates, matching pandas
    ``resample`` NaN semantics for empty/all-NaN bins.

    When the partials carry ``vsumsq`` (``rollup_tier(with_sumsq=True)``),
    also emits ``var``/``std`` at ``ddof`` (default 1, pandas
    ``resample(...).std()`` semantics; ``ddof=0`` for population). Bins with
    ``cnt <= ddof`` finalize to NULL, matching pandas. The textbook
    ``(Σx² − (Σx)²/n) / (n − ddof)`` can go a hair negative in floating
    point on near-constant bins — clamped to 0, never NaN.

    ``first`` partials (``with_first=True``) finalize as ``open`` — with
    min/max/last the row is the bin's OHLC bar.

    Moment partials (``with_moments=True``) finalize as ``skew``/``kurt``
    in the bias-adjusted Fisher-Pearson form pandas/DuckDB report (kurt is
    EXCESS kurtosis). Defined for n ≥ 3 (skew) / n ≥ 4 (kurt); NULL
    otherwise, and NULL on degenerate bins where the central second moment
    has lost ~all significant bits to cancellation (m₂ ≤ 1e-9·Σx²/n —
    covers exactly-constant bins and the near-constant ones where a
    one-pass moment formula, like DuckDB's own, is pure noise).
    """
    nz = F.col("cnt") > 0
    cols = [
        *[c for c in partials.columns
          if c not in PARTIAL_COLS and c not in OPT_PARTIAL_COLS],
        F.col("cnt").alias("count"),
        F.when(nz, F.col("vmin")).alias("min"),
        F.when(nz, F.col("vmax")).alias("max"),
        F.when(nz, F.col("vsum") / F.col("cnt")).alias("mean"),
        F.when(nz, F.col("last")).alias("last"),
    ]
    if "first" in partials.columns:
        cols.append(F.when(nz, F.col("first")).alias("open"))
    if "vsumsq" in partials.columns:
        n = F.col("cnt")
        var = F.greatest(
            (F.col("vsumsq") - F.col("vsum") * F.col("vsum") / n)
            / (n - F.lit(ddof)),
            F.lit(0.0),
        )
        var = F.when(n > ddof, var)
        cols.append(var.alias("var"))
        cols.append(F.sqrt(var).alias("std"))
    if "vsumcu" in partials.columns:
        n = F.col("cnt").cast("double")
        mean = F.col("vsum") / n
        m2 = F.col("vsumsq") / n - mean * mean
        m3 = (F.col("vsumcu") / n - F.lit(3.0) * mean * (F.col("vsumsq") / n)
              + F.lit(2.0) * mean * mean * mean)
        m4 = (F.col("vsumqu") / n - F.lit(4.0) * mean * (F.col("vsumcu") / n)
              + F.lit(6.0) * mean * mean * (F.col("vsumsq") / n)
              - F.lit(3.0) * mean * mean * (mean * mean))
        ok = m2 > F.lit(1e-9) * (F.col("vsumsq") / n)
        skew = (F.sqrt(n * (n - 1)) / (n - 2)) * m3 / F.pow(m2, 1.5)
        kurt = ((n - 1) / ((n - 2) * (n - 3))) * (
            (n + 1) * (m4 / (m2 * m2) - F.lit(3.0)) + F.lit(6.0))
        cols.append(F.when(ok & (F.col("cnt") >= 3), skew).alias("skew"))
        cols.append(F.when(ok & (F.col("cnt") >= 4), kurt).alias("kurt"))
    return partials.select(*cols)


# ---------------------------------------------------------------------------
# calendar tiers: month/quarter/year/week bins are NOT fixed-width, so the
# epoch-floor bin_ts arithmetic cannot express them — but they NEST exactly
# over the 1d tier (every day belongs to one week/month/quarter/year), so a
# calendar rollup is date_trunc + the same associative partial merge, and
# the incremental-maintenance property extends unchanged: the month tier
# cascades from the ~30× smaller 1d tier, never from raw points.
# ---------------------------------------------------------------------------

CALENDAR_UNITS = ("week", "month", "quarter", "year")


def rollup_calendar(
    points: DataFrame,
    unit: str = "month",
    keys: tuple[str, ...] = ("doc_id", "source"),
    with_sumsq: bool = False,
    with_first: bool = False,
    with_moments: bool = False,
) -> DataFrame:
    """Partial states at a CALENDAR granularity, direct from points.

    ``bin_ts`` is ``date_trunc(unit, ts)`` (weeks start Monday — the Spark
    and DuckDB convention both). Same partial schema and flags as
    ``rollup_tier``; prefer ``cascade_calendar`` over a stored 1d tier when
    one exists.
    """
    if unit not in CALENDAR_UNITS:
        raise ValueError(f"unit must be one of {CALENDAR_UNITS}, got {unit!r}")
    binned = points.withColumn("bin_ts", F.date_trunc(unit, F.col("ts")))
    partials = partial_aggs(F.col("value"), F.col("ts"), with_sumsq,
                            with_first, with_moments)
    return binned.groupBy(*keys, "bin_ts").agg(*partials)


#: calendar units a given calendar unit may cascade FROM (week nests in
#: nothing; month in quarter/year; quarter in year)
_CAL_NESTS = {"week": set(), "month": set(), "quarter": {"month"},
              "year": {"month", "quarter"}}


def cascade_calendar(
    finer: DataFrame,
    unit: str = "month",
    keys: tuple[str, ...] = ("doc_id", "source"),
    finer_unit: str | None = None,
) -> DataFrame:
    """Calendar tier from a FINER tier's partials (1d → month, month →
    quarter/year, week from 1d...). Correct only when the finer bins NEST
    inside the calendar unit: every fixed tier that divides a day nests in
    all four units; month nests in quarter/year; week nests in NEITHER
    month nor year (ISO weeks straddle month boundaries). Pass
    ``finer_unit`` (a tier string like '1d' or a calendar unit) to have
    the nesting rule ENFORCED — an illegal pair (e.g. month→week) raises
    instead of silently collapsing every month into the week containing
    its 1st. Without ``finer_unit`` the caller owns the invariant.
    Associativity does the rest; identical output to ``rollup_calendar``
    on the raw points (tested bitwise on tokens).
    """
    if unit not in CALENDAR_UNITS:
        raise ValueError(f"unit must be one of {CALENDAR_UNITS}, got {unit!r}")
    if finer_unit is not None:
        if finer_unit in CALENDAR_UNITS:
            if finer_unit not in _CAL_NESTS[unit]:
                raise ValueError(
                    f"{finer_unit!r} bins do not nest inside {unit!r} bins "
                    f"— cascade {unit!r} from a fixed tier (<= 1d) instead")
        else:
            step = TIER_SECONDS.get(finer_unit) or freq_to_seconds(finer_unit)
            if step > 86_400 or 86_400 % step:
                raise ValueError(
                    f"fixed tier {finer_unit!r} ({step}s) does not divide a "
                    f"day — its bins straddle {unit!r} boundaries")
    rebinned = finer.withColumn("bin_ts", F.date_trunc(unit, F.col("bin_ts")))
    return _merge_partials(rebinned, [*keys, "bin_ts"])
