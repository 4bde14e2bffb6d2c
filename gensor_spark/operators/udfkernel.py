"""Batched per-series kernel runner: mapInPandas without per-group batches.

``applyInPandas`` ships every group as its own Arrow batch. With web-scale
shapes — millions of short series (events at sf0.1: ~13 rows/series) — the
JVM↔Python crossing count equals the group count and overhead swamps the
kernel (measured 33s for a Hampel pass whose numpy work is milliseconds).

``per_series_map`` keeps the same per-group semantics but crosses the
boundary once per ~10k-row Arrow batch: repartition by the series key, sort
within partitions by (key, seq), stream batches, and handle groups that
straddle batch boundaries with a carry-over buffer. The user kernel still
sees one complete, seq-sorted pandas DataFrame per series.

This is the engine's pattern for every "per-series imperative" operator
(Hampel, LOF, Box-Cox MLE, codecs) — the only sanctioned JVM↔Python
crossings, always Arrow-batched, never per row, never per tiny group.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

KEYS = ("doc_id", "source")


def per_series_map(
    points: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    keys: tuple[str, ...] = KEYS,
    sort_col: str = "seq",
) -> DataFrame:
    """Apply ``fn`` to each complete series, batching many series per crossing.

    ``fn`` receives one seq-sorted DataFrame per series and returns a
    DataFrame conforming to ``schema``. Output order is unspecified (as with
    any shuffle-backed operator).
    """
    key_list = list(keys)
    # Python kernel stages are CPU-bound — size their parallelism by CORES,
    # never by bytes. Two traps conspire to serialize them otherwise
    # (measured: a 1s-parallel kernel ran 26s on 2 tasks): (1) AQE coalesces
    # exchanges by size, so a small-but-CPU-heavy input collapses to 1-2
    # tasks; (2) when the input already comes out of a window/agg clustered
    # on the SAME keys, Catalyst drops a plain repartition(keys) as
    # redundant — hash(keys, anyN) satisfies the clustering — leaving the
    # upstream byte-coalesced exchange in charge. Repartitioning by an
    # explicit count on a DERIVED key expression (xxhash64 of the keys —
    # same co-location guarantee, different expression) survives both:
    # REPARTITION_BY_NUM is exempt from AQE coalescing and the expression
    # never matches the upstream clustering.
    from pyspark.sql import functions as F

    n = points.sparkSession.sparkContext.defaultParallelism
    parted = points.repartition(n, F.xxhash64(*keys)).sortWithinPartitions(
        *keys, sort_col
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame | None = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            # rows of the final key may continue in the next batch — hold them
            last = pdf.iloc[-1]
            is_last_key = pd.Series(True, index=pdf.index)
            for k in key_list:
                is_last_key &= pdf[k] == last[k]
            complete, buf = pdf[~is_last_key], pdf[is_last_key]
            if len(complete):
                out = [fn(g) for _, g in complete.groupby(key_list, sort=False)]
                yield pd.concat(out, ignore_index=True)
        if buf is not None and len(buf):
            out = [fn(g) for _, g in buf.groupby(key_list, sort=False)]
            yield pd.concat(out, ignore_index=True)

    return parted.mapInPandas(run, schema=schema)
