"""Deterministic synthetic ``docs`` token table (the engine's primary input).

Schema mandated by the driver (``BASELINE.json`` → ``input_hint``)::

    docs(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

Each row is one pre-tokenized training sequence; under the time-series
mapping (SURVEY.md §1.2) a row is one series: the gensor ``Timeseries``
(``/root/reference/gensor/core/timeseries.py:20-48``) becomes
``(doc_id, source)`` plus the token array as the value stream.

Generation is fully distributed and deterministic: ``spark.range`` gives the
doc index; a per-doc ``numpy.random.Generator`` seeded with
``(seed, doc_index)`` produces the tokens inside ``mapInPandas`` (Arrow
batches, vectorized numpy — no per-row Python UDFs). The same rows come out
for a given ``(seed, n_docs, ...)`` regardless of cluster size or partition
count, which is what makes the N-vs-4N scaling benchmark apples-to-apples.

Skew: ``source`` follows a zipf-ish distribution over ``n_sources`` and a
configurable fraction of "hot" docs get ``hot_factor``× longer token arrays —
this is the hot-series skew the salted repartitioning (operators/rollup.py)
exists to kill.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

_SOURCE_WEIGHTS_POWER = 1.6  # zipf exponent for the source distribution


def _gen_batch(
    idx: np.ndarray,
    seed: int,
    min_tok: int,
    max_tok: int,
    n_sources: int,
    vocab: int,
    hot_fraction: float,
    hot_factor: int,
) -> pd.DataFrame:
    """Vectorized generation of one Arrow batch of docs from doc indexes."""
    # per-doc RNG streams: independent of partitioning, stable under reorder
    root = np.random.SeedSequence(seed)
    out_tokens: list[np.ndarray] = []
    n = len(idx)

    # doc-level draws from a single batch RNG seeded per doc for determinism;
    # spawn_key=(doc_index,) makes each doc's stream independent of the batch
    lens = np.empty(n, dtype=np.int64)
    srcs = np.empty(n, dtype=np.int64)
    src_ranks = np.arange(1, n_sources + 1, dtype=np.float64)
    src_p = src_ranks ** (-_SOURCE_WEIGHTS_POWER)
    src_p /= src_p.sum()
    for i, d in enumerate(idx):
        rng = np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, int(d)]))
        ln = int(rng.integers(min_tok, max_tok + 1))
        if hot_fraction > 0 and rng.random() < hot_fraction:
            ln *= hot_factor
        src = int(rng.choice(n_sources, p=src_p))
        toks = rng.integers(0, vocab, size=ln, dtype=np.int32)
        lens[i] = ln
        srcs[i] = src
        out_tokens.append(toks)
    return pd.DataFrame(
        {
            "doc_id": [f"doc_{int(d):012d}" for d in idx],
            "tokens": out_tokens,
            "n_tok": lens.astype(np.int32),
            "source": [f"src_{s:02d}" for s in srcs],
        }
    )


def synth_docs(
    spark: SparkSession,
    n_docs: int = 1000,
    seed: int = 42,
    min_tok: int = 16,
    max_tok: int = 512,
    n_sources: int = 5,
    vocab: int = 50_000,
    hot_fraction: float = 0.0,
    hot_factor: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic docs table; same rows for same seed at any parallelism."""
    rng_conf = (seed, min_tok, max_tok, n_sources, vocab, hot_fraction, hot_factor)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), *rng_conf)

    base = spark.range(0, n_docs, numPartitions=num_partitions)
    return base.mapInPandas(gen, schema=DOCS_SCHEMA)
