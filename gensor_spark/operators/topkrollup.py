"""Mergeable top-k heavy-hitter tier rollups: Misra-Gries summaries.

Completes the sketch-tier family next to the numeric partials
(operators/rollup.py), exact histograms (operators/histquantiles.py) and
HLL distinct sketches (operators/distinctrollup.py): "which tokens/values
dominate each bin" has no exact associative partial of bounded size over
an unbounded item domain, but the Misra-Gries summary is the standard
mergeable substitute (Agarwal et al., *Mergeable Summaries*, PODS 2012):
two summaries merge by summing their counters item-wise, subtracting the
(k+1)-th largest combined counter from every survivor and dropping the
non-positive rest. The accumulated subtraction (``err``) bounds the
undercount, so every estimate is a certificate::

    stored_cnt <= true_cnt <= stored_cnt + err        (items kept)
    true_cnt <= err                                    (items dropped)

and any item with true frequency > n/(k+1) is guaranteed kept. The
1m -> 1h -> 1d cascade contract of the continuous-aggregate store
(plans/incremental.py) extends unchanged: coarser tiers merge from finer
sketches without touching raw points.

Everything here is pure Catalyst — the summary is an
``array<struct<cnt,item>>`` column and the MG truncation is a
``sort_array`` / ``slice`` / ``element_at`` / ``transform`` expression
chain; no UDF, no window, no per-row Python. Rollup from raw points is
two partial-aggregated shuffles (item-grain counts, then bin-grain
collect); a cascade/merge is the same two shuffles at sketch grain.

At 100 TB: each bin row carries at most k counter structs regardless of
bin cardinality, so the cascade shuffles only ``bins x k`` rows (the same
>=60:1 reduction as the numeric tiers); the item-grain count stage is the
classic word-count shape with map-side partial aggregation, and the
fine-grain (1m) truncation means the per-bin exact-count state never
outlives one stage. In the common test/ops regime where a bin holds <= k
distinct items the summary IS the exact per-bin count table (``err`` = 0)
— proven against DuckDB in tests/test_topkrollup.py.

No reference analogue: gensor keeps whole series in pandas memory and has
no frequency sketches; this extends its tier/retention design
(gensor/core/timeseries.py resample semantics) to unbounded item domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.rollup import TIER_SECONDS, bin_ts, freq_to_seconds

KEYS = ("doc_id", "source")


def _step(tier: str) -> int:
    return TIER_SECONDS.get(tier) or freq_to_seconds(tier)


def _truncate(sorted_col, k: int):
    """MG truncation of a cnt-desc-sorted ``array<struct<cnt,item>>``:
    returns (survivors, decrement). Subtracting the (k+1)-th largest count
    from the top k and dropping non-positives is exactly one merge step of
    the Misra-Gries summary."""
    dec = F.coalesce(
        F.try_element_at(sorted_col, F.lit(k + 1))["cnt"], F.lit(0)
    )
    kept = F.filter(
        F.transform(
            F.slice(sorted_col, 1, k),
            lambda x: F.struct(
                (x["cnt"] - dec).alias("cnt"), x["item"].alias("item")
            ),
        ),
        lambda x: x["cnt"] > 0,
    )
    return kept, dec


def rollup_topk(
    points: DataFrame,
    tier: str = "1m",
    of: str = "value",
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
    k: int = 32,
) -> DataFrame:
    """Misra-Gries top-k summary of ``of`` per (keys, tier bin).

    Output: ``keys..., bin_ts, hh array<struct<cnt:long,item>>, err long``
    with ``hh`` sorted count-descending (ties broken item-descending by
    the struct sort — deterministic). NULL items are ignored (COUNT
    semantics). Feed to ``cascade_topk`` for coarser tiers,
    ``merge_topk`` for cross-contribution merges and ``finalize_topk``
    for readable ranked rows. When a bin holds <= k distinct items the
    summary is the exact count table and ``err`` is 0.
    """
    binned = (
        points.filter(F.col(of).isNotNull())
        .withColumn("bin_ts", bin_ts(F.col(ts_col), _step(tier)))
    )
    counted = binned.groupBy(*keys, "bin_ts", of).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grouped = counted.groupBy(*keys, "bin_ts").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("cnt"), F.col(of).alias("item"))),
            asc=False,
        ).alias("_all")
    )
    kept, dec = _truncate(F.col("_all"), k)
    return grouped.select(
        *keys, "bin_ts", kept.alias("hh"), dec.cast("long").alias("err")
    )


def _merge(summaries: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Associative MG merge of summary rows sharing ``group_cols``:
    item-wise counter sum, then one truncation; ``err`` accumulates every
    input's err plus the merge decrement. A sentinel NULL-item entry
    carries each input row's err through the same explode/sum pipeline so
    no join is needed."""
    item_t = summaries.schema["hh"].dataType.elementType["item"].dataType
    sentinel = F.array(
        F.struct(
            F.col("err").cast("long").alias("cnt"),
            F.lit(None).cast(item_t).alias("item"),
        )
    )
    exploded = summaries.select(
        *group_cols, F.explode(F.concat(F.col("hh"), sentinel)).alias("e")
    ).select(*group_cols, F.col("e.item").alias("item"),
             F.col("e.cnt").alias("cnt"))
    summed = exploded.groupBy(*group_cols, "item").agg(
        F.sum("cnt").alias("cnt")
    )
    grouped = summed.groupBy(*group_cols).agg(
        F.coalesce(
            F.sum(F.when(F.col("item").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("_base_err"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("item").isNotNull(),
                    F.struct(F.col("cnt"), F.col("item")),
                )
            ),
            asc=False,
        ).alias("_all"),
    )
    kept, dec = _truncate(F.col("_all"), k)
    return grouped.select(
        *group_cols,
        kept.alias("hh"),
        (F.col("_base_err") + dec).cast("long").alias("err"),
    )


def cascade_topk(
    finer: DataFrame,
    tier: str,
    keys: tuple[str, ...] = KEYS,
    k: int = 32,
) -> DataFrame:
    """Coarser-tier summaries from finer-tier summaries — never re-reads
    raw points. One MG merge step per coarse bin; the certificate bounds
    survive because ``err`` accumulates sub-bin errs plus the decrement."""
    rebinned = finer.withColumn("bin_ts", bin_ts(F.col("bin_ts"), _step(tier)))
    return _merge(rebinned, [*keys, "bin_ts"], k)


def merge_topk(
    partials: DataFrame, group_cols: list[str], k: int = 32
) -> DataFrame:
    """Merge same-bin summary rows from multiple contributions (the
    store's cross-batch read-side merge — associative, order-free)."""
    return _merge(partials, group_cols, k)


def finalize_topk(partials: DataFrame, top: int | None = None) -> DataFrame:
    """Summaries -> readable ranked rows: one row per kept item with
    ``rank`` (1 = most frequent), ``cnt`` (guaranteed lower bound) and
    ``cnt_hi`` (= cnt + err, guaranteed upper bound). ``top`` optionally
    keeps only the first ``top`` ranks per bin. A bin whose summary is
    empty (every counter cancelled — e.g. >k items all equally frequent)
    still emits one row with NULL rank/item so its ``err`` certificate
    ("no item exceeds err here") survives into the readable view."""
    hh = F.col("hh") if top is None else F.slice(F.col("hh"), 1, top)
    other = [c for c in partials.columns if c not in ("hh", "err")]
    return partials.select(
        *other,
        F.col("err"),
        F.posexplode_outer(hh).alias("_pos", "_e"),
    ).select(
        *other,
        F.col("err"),
        (F.col("_pos") + 1).alias("rank"),
        F.col("_e.item").alias("item"),
        F.col("_e.cnt").alias("cnt"),
        (F.col("_e.cnt") + F.col("err")).alias("cnt_hi"),
    )
