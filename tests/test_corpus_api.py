"""Corpus facade: every verb delegates to its audited operator.

The pins here are facade==operator (same rows) and pipeline-composition
sanity — the operators themselves carry the oracles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gensor_spark.api import Corpus


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        [(i, "the quick brown fox jumps over the lazy dog near the river "
             f"bank while document {i} adds its own distinct tail content",
          "wiki") for i in range(10)]
        + [(100 + i, "the quick brown fox jumps over the lazy dog near the "
                     "river bank while document 100 adds its own distinct "
                     "tail content", "crawl") for i in range(3)]  # exact dups
        + [(200, "contact me at bob@example.com for details about the "
                 "project timeline and the quarterly budget review notes",
            "crawl")]
        + [(300, "x", "junk")]  # gated out
    )
    return Corpus(spark.createDataFrame(
        rows, "doc_id long, text string, source string"))


def test_scrub_and_gate(corpus):
    scrubbed = corpus.scrub()
    row = scrubbed.df.filter("doc_id = 200").collect()[0]
    assert "bob@example.com" not in row["text"] and row["n_pii"] >= 1
    gated = corpus.gate(min_chars=20)
    ids = {r.doc_id for r in gated.df.select("doc_id").collect()}
    assert 300 not in ids and 1 in ids


def test_dedup_exact_and_near(corpus):
    d = corpus.dedup_exact()
    # the three identical crawl docs collapse to the min-id keeper
    ids = {r.doc_id for r in d.df.select("doc_id").collect()}
    assert 100 in ids and 101 not in ids and 102 not in ids
    nd = corpus.dedup_near(threshold=0.9)
    assert nd.df.count() <= corpus.df.count()


def test_decontaminate_and_overlap(spark, corpus):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river "
             "bank while document 1 adds its own distinct tail content")],
        "doc_id long, text string")
    clean = corpus.decontaminate(bench, n=8)
    assert clean.df.filter("doc_id = 1").count() == 0   # leaked doc dropped
    assert clean.df.filter("doc_id = 200").count() == 1
    ov = corpus.overlap(n=3).collect()
    # 'junk' ("x") has an empty 3-gram set → no pairs for it, by design
    assert {(r["src_a"], r["src_b"]) for r in ov} == {("crawl", "wiki")}


def test_mix_and_select(corpus):
    mixed = corpus.mix(rates={"wiki": 1.0, "crawl": 0.0})
    srcs = {r.source for r in mixed.df.select("source").distinct().collect()}
    assert srcs == {"wiki"}
    with pytest.raises(ValueError):
        corpus.mix()
    tm = corpus.mix(temperature=0.5)
    assert 0 < tm.df.count() <= corpus.df.count()
    like = corpus.select_like(corpus, k=5)
    assert like.df.count() == 5


def test_tokenize_pack_shard(corpus, tmp_path):
    vocab = corpus.train_unigram(vocab_size=60, max_piece_len=5,
                                 seed_factor=2, em_iters=1, max_rounds=2)
    enc = corpus.tokenize(vocab)
    assert {"pieces", "token_ids", "n_pieces"} <= set(enc.columns)
    assert enc.count() == corpus.df.count()
    packed = corpus.pack(seq_len=64)
    assert packed.select(F.sum("n_in_chunk")).first()[0] > 0
    sh = corpus.shard(docs_per_shard=6)
    assert sh.count() == corpus.df.count()
    manifest = corpus.write_shards(str(tmp_path / "sh"), docs_per_shard=6)
    assert manifest.count() >= 2


def test_search_and_prepare(spark, corpus):
    q = spark.createDataFrame([(0, "quarterly budget review")],
                              "query_id long, query_text string")
    hits = corpus.search(q, k=3).collect()
    assert hits and hits[0]["doc_id"] == 200
    kept, rep = corpus.prepare(scrub=True, near_dedup=True,
                               minhash_threshold=0.9, temperature=0.8,
                               report=True)
    assert rep["input"] == corpus.df.count()
    assert 0 < kept.df.count() <= corpus.df.count()
    assert isinstance(kept, Corpus)


def test_perplexity_models(corpus):
    for model in ("uni", "bi", "kn"):
        out = corpus.perplexity(model)
        assert out.count() == corpus.df.count()
    with pytest.raises(ValueError):
        corpus.perplexity("markov")


def test_c4_clean(corpus):
    out = corpus.c4_clean()
    assert set(out.df.columns) == set(corpus.df.columns)
