"""Deterministic global shuffle + shard planning: DuckDB oracle + contracts.

The oracle recomputes the salted-md5 permutation, the exclusive prefix sum
and both shard-assignment modes in DuckDB SQL and compares doc-for-doc —
the portable-hash contract means the permutation itself (not just shapes)
is verified. Determinism contracts: assignments are invariant under input
repartitioning, re-runs produce byte-equal manifests, and a new seed
produces a genuinely different permutation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.shards import (
    assign_shards,
    shard_manifest,
    write_shards,
)

SEED, T, D = "s1", 700, 16


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ((i * 37) % 113) + (250 if i % 29 == 0 else 0), f"src{i % 3}")
            for i in range(200)]  # every 29th doc oversized (budget straddle)
    # a few zero-length docs exercise the "empty doc still owns a slot at
    # its offset" contract
    rows = [(i, 0 if i % 41 == 0 else n, s) for (i, n, s) in rows]
    return spark.createDataFrame(rows, "doc_id long, n_tok long, source string")


def _oracle(pdf, per: int, by_tokens: bool):
    con = duckdb.connect()
    con.register("docs", pdf)
    length = "n_tok" if by_tokens else "1"
    return con.sql(f"""
        WITH d AS (
          SELECT doc_id, n_tok,
                 md5('{SEED}:' || CAST(doc_id AS VARCHAR)) AS k
          FROM docs),
        o AS (SELECT *, k || ':' || CAST(doc_id AS VARCHAR) AS ord FROM d),
        p AS (SELECT *,
                COALESCE(SUM({length}) OVER (
                  ORDER BY ord
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS goff
              FROM o)
        SELECT doc_id, CAST(goff // {per} AS BIGINT) AS shard,
               CAST(goff % {per} AS BIGINT) AS shard_pos
        FROM p ORDER BY doc_id
    """).fetchall()


@pytest.mark.parametrize("by_tokens", [True, False])
def test_assignment_matches_duckdb_oracle(spark, docs, by_tokens):
    kw = ({"tokens_per_shard": T} if by_tokens else {"docs_per_shard": D})
    got = (
        assign_shards(docs, seed=SEED, n_buckets=8, **kw)
        .select("doc_id", "shard", "shard_pos")
        .orderBy("doc_id")
        .collect()
    )
    want = _oracle(docs.toPandas(), T if by_tokens else D, by_tokens)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_manifest_matches_duckdb_oracle(spark, docs):
    assigned = assign_shards(docs, tokens_per_shard=T, seed=SEED, n_buckets=8)
    got = shard_manifest(assigned).orderBy("shard").collect()
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = con.sql(f"""
        WITH d AS (
          SELECT doc_id, n_tok,
                 md5('{SEED}:' || CAST(doc_id AS VARCHAR)) AS k
          FROM docs),
        o AS (SELECT *, k || ':' || CAST(doc_id AS VARCHAR) AS ord FROM d),
        p AS (SELECT *,
                COALESCE(SUM(n_tok) OVER (
                  ORDER BY ord
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS goff
              FROM o)
        SELECT goff // {T} AS shard, COUNT(*) AS n_docs,
               SUM(n_tok) AS n_tokens, MIN(ord) AS first_key,
               MAX(ord) AS last_key,
               SUM(('0x' || substr(k, 1, 8))::BIGINT) AS content_sum
        FROM p GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_docs_mode_shard_sizes_exact(spark, docs):
    assigned = assign_shards(docs, docs_per_shard=D, seed=SEED, n_buckets=8)
    sizes = {r["shard"]: r["n_docs"]
             for r in shard_manifest(assigned).collect()}
    n = docs.count()
    full, rem = divmod(n, D)
    for s in range(full):
        assert sizes[s] == D
    if rem:
        assert sizes[full] == rem


def test_tokens_mode_budget_bounds(spark, docs):
    # every shard but the last holds >= T tokens only through its straddling
    # last doc; the budget is overshot by at most that one doc (bounded skew)
    assigned = assign_shards(docs, tokens_per_shard=T, seed=SEED, n_buckets=8)
    rows = shard_manifest(assigned).orderBy("shard").collect()
    max_doc = docs.agg(F.max("n_tok")).first()[0]
    for r in rows[:-1]:
        assert r["n_tokens"] >= 1          # non-empty
        assert r["n_tokens"] < T + max_doc  # overshoot bounded by one doc
    # shards are contiguous spans of the permutation
    for a, b in zip(rows, rows[1:]):
        assert a["last_key"] <= b["first_key"]


def test_parallelism_invariance(spark, docs):
    a = assign_shards(docs, tokens_per_shard=T, seed=SEED, n_buckets=4)
    b = assign_shards(docs.repartition(13), tokens_per_shard=T, seed=SEED,
                      n_buckets=9)
    left = {r["doc_id"]: (r["shard"], r["shard_pos"])
            for r in a.select("doc_id", "shard", "shard_pos").collect()}
    right = {r["doc_id"]: (r["shard"], r["shard_pos"])
             for r in b.select("doc_id", "shard", "shard_pos").collect()}
    assert left == right


def test_seed_changes_permutation(spark, docs):
    a = assign_shards(docs, docs_per_shard=D, seed="s1", n_buckets=8)
    b = assign_shards(docs, docs_per_shard=D, seed="s2", n_buckets=8)
    pa = [r["doc_id"] for r in a.orderBy("shard", "shard_pos").collect()]
    pb = [r["doc_id"] for r in b.orderBy("shard", "shard_pos").collect()]
    assert sorted(pa) == sorted(pb)
    assert pa != pb


def test_write_shards_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    assigned = assign_shards(docs, tokens_per_shard=T, seed=SEED, n_buckets=8)
    m1 = write_shards(assigned, out).orderBy("shard").collect()
    back = spark.read.parquet(f"{out}/data")
    # partition column round-trips and every doc kept its shard
    joined = (back.select("doc_id", F.col("shard").cast("long").alias("s2"))
              .join(assigned.select("doc_id", "shard"), "doc_id"))
    assert joined.filter(F.col("s2") != F.col("shard")).count() == 0
    assert back.count() == docs.count()
    # deterministic re-run: byte-equal manifest (idempotent overwrite)
    m2 = write_shards(assigned, out).orderBy("shard").collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    stored = spark.read.parquet(f"{out}/manifest").orderBy("shard").collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in m2]


def test_mode_arg_validation(spark, docs):
    with pytest.raises(ValueError):
        assign_shards(docs)
    with pytest.raises(ValueError):
        assign_shards(docs, tokens_per_shard=10, docs_per_shard=10)
