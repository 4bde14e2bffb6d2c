"""Distributed BPE training/encoding (operators/bpe.py) vs an independent
pure-Python Sennrich reference: identical learned merges, identical
segmentation, structural invariants."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from gensor_spark.operators.bpe import EOW, bpe_encode, bpe_train

SF = "/root/testdata/sf0.001"


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _ref_train(texts: list[str], n_merges: int, min_count: int = 2):
    """Independent reference: the textbook word-frequency BPE loop."""
    vocab = Counter()
    for t in texts:
        for w in _tok(t):
            vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        joined = a + b
        new_vocab: Counter = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def _ref_encode(word: str, merges) -> list[str]:
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cands = [(ranks[(syms[i], syms[i + 1])], i)
                 for i in range(len(syms) - 1)
                 if (syms[i], syms[i + 1]) in ranks]
        if not cands:
            break
        _, i = min(cands)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").limit(120).cache()
    texts = [r.text for r in df.select("text").collect()]
    yield df, texts
    df.unpersist()


def test_bpe_train_matches_reference(spark, corpus):
    df, texts = corpus
    got = bpe_train(df, n_merges=40)
    want = _ref_train(texts, 40)
    assert got == want
    assert len(got) == 40  # the fixture corpus supports 40 full merges


def test_bpe_encode_matches_reference_and_reconstructs(spark, corpus):
    df, texts = corpus
    merges = bpe_train(df, n_merges=30)
    out = bpe_encode(df, merges).select("doc_id", "text", "bpe_tokens").collect()
    assert len(out) == df.count()
    for r in out:
        want = []
        for w in _tok(r.text):
            want.extend(_ref_encode(w, merges))
        assert list(r.bpe_tokens) == want
        # reconstruction invariant: stripping EOW splits back to the words
        joined = "".join(r.bpe_tokens)
        assert joined == "".join(w + EOW for w in _tok(r.text))


def test_bpe_compresses(spark, corpus):
    """More merges -> fewer tokens per doc, never more; and real compression
    vs character count on natural-ish text."""
    from pyspark.sql import functions as F

    df, _ = corpus
    m10 = bpe_train(df, n_merges=10)
    m40 = bpe_train(df, n_merges=40)
    assert m40[:10] == m10  # merge list is prefix-stable
    n10 = bpe_encode(df, m10).select(F.sum(F.size("bpe_tokens"))).first()[0]
    n40 = bpe_encode(df, m40).select(F.sum(F.size("bpe_tokens"))).first()[0]
    n0 = bpe_encode(df, []).select(F.sum(F.size("bpe_tokens"))).first()[0]
    assert n40 < n10 < n0


def test_bpe_min_count_stops_early(spark):
    df = spark.createDataFrame(
        [(0, "zq xv"), (1, "pk wm")], "doc_id long, text string")
    # every adjacent pair occurs once: nothing clears min_pair_count=2
    assert bpe_train(df, n_merges=5, min_pair_count=2) == []
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)
