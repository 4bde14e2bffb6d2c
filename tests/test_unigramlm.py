"""Unigram-LM tokenizer: enumeration oracle + EM/pruning/encode contracts.

The forward-backward expected counts are verified against brute-force
enumeration of EVERY segmentation (exponential, fine on short words) —
a structurally independent computation of the same posterior. Viterbi is
pinned to the enumerated maximum. The distributed EM round is compared to
a local replay over the word-count table; training contracts: likelihood
monotonicity, planted-morpheme recovery, char coverage, encode totality
(UNK fallback), and partitioning invariance.
"""

from __future__ import annotations

import math

import pytest

from gensor_spark.operators.unigramlm import (
    _em_round,
    _forward_backward,
    _viterbi,
    _words,
    unigram_encode,
    unigram_train,
)


def _enumerate_segs(word, vocab, max_len):
    if not word:
        return [[]]
    out = []
    for L in range(1, min(max_len, len(word)) + 1):
        p = word[:L]
        if p in vocab:
            for rest in _enumerate_segs(word[L:], vocab, max_len):
                out.append([p] + rest)
    return out


def _brute_expected(word, cnt, logp, max_len):
    segs = _enumerate_segs(word, logp, max_len)
    if not segs:
        return {}, 0.0
    probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(probs)
    ec: dict = {}
    for s, pr in zip(segs, probs):
        for p in s:
            ec[p] = ec.get(p, 0.0) + cnt * pr / z
    return ec, cnt * math.log(z)


VOCAB = {"a": -2.0, "b": -2.2, "c": -2.5, "ab": -1.5, "bc": -1.7,
         "abc": -1.2, "ca": -2.1, "cab": -1.9}


@pytest.mark.parametrize("word", ["abc", "abcabc", "cabca", "bca", "a",
                                  "ababab", "ccc"])
def test_forward_backward_matches_enumeration(word):
    got, ll = _forward_backward(word, 3.0, VOCAB, max_len=3)
    want, wll = _brute_expected(word, 3.0, VOCAB, max_len=3)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12)
    assert ll == pytest.approx(wll, rel=1e-12)


@pytest.mark.parametrize("word", ["abc", "abcabc", "cabca", "ababab"])
def test_viterbi_matches_enumerated_max(word):
    pieces, score = _viterbi(word, VOCAB, max_len=3, unk_lp=-50.0)
    assert "".join(pieces) == word
    segs = _enumerate_segs(word, VOCAB, 3)
    best = max(sum(VOCAB[p] for p in s) for s in segs)
    assert score == pytest.approx(best, rel=1e-12)


def test_viterbi_unk_and_ban():
    # 'z' is out-of-vocab: rides through as a single UNK char
    pieces, _ = _viterbi("azb", VOCAB, max_len=3, unk_lp=-50.0)
    assert "".join(pieces) == "azb" and "z" in pieces
    # banning the full-span piece forces the alternative segmentation
    pieces, score = _viterbi("abc", VOCAB, max_len=3, unk_lp=-50.0,
                             ban_full="abc")
    assert pieces != ["abc"] and "".join(pieces) == "abc"
    segs = [s for s in _enumerate_segs("abc", VOCAB, 3) if s != ["abc"]]
    assert score == pytest.approx(
        max(sum(VOCAB[p] for p in s) for s in segs), rel=1e-12)


@pytest.fixture(scope="module")
def docs(spark):
    # planted morphology: 'sunshine'/'rainfall' composed of reusable parts
    rows = []
    for i in range(30):
        rows.append((f"d{i}", "sunshine rainfall sunny rainy shine fall "
                              "sun rain sunshine rainfall"))
    rows.append(("dx", "misc extra words appear here too"))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_seed_vocab_multiset_matches_enumeration(spark):
    # pins the seed substring MULTISET against a Python enumeration —
    # words shorter than a piece length L must contribute each substring
    # exactly once per position (sequence(1,0) descending-range regression:
    # 'ab' at max_piece_len=4 used to emit 'ab' five times instead of once)
    from gensor_spark.operators.unigramlm import _seed_vocab

    wc = [("ab", 3.0), ("a", 2.0), ("abcd", 1.0), ("xyz", 4.0)]
    words = spark.createDataFrame(wc, "w string, cnt double")
    max_piece_len = 4
    want: dict = {}
    for w, c in wc:
        for L in range(1, max_piece_len + 1):
            for i in range(len(w) - L + 1):
                p = w[i:i + L]
                want[p] = want.get(p, 0.0) + c
    got = _seed_vocab(words, n_seed=10_000, max_piece_len=max_piece_len)
    assert got == want
    # the advice repro directly: a lone short word seeds itself ONCE
    got1 = _seed_vocab(
        spark.createDataFrame([("ab", 1.0)], "w string, cnt double"),
        n_seed=100, max_piece_len=4)
    assert got1 == {"ab": 1.0, "a": 1.0, "b": 1.0}


def test_em_round_matches_local_replay(spark, docs):
    words = _words(docs, "text")
    wc = [(r["w"], float(r["cnt"])) for r in words.collect()]
    # seed = chars + a few multi-char pieces
    chars = sorted({c for w, _ in wc for c in w})
    vocab = {c: 1.0 for c in chars}
    for p in ("sun", "rain", "shine", "fall", "ny"):
        vocab[p] = 5.0
    total = sum(vocab.values())
    logp = {p: math.log(c / total) for p, c in vocab.items()}
    got_counts, got_ll = _em_round(words.repartition(7), logp, 8)
    want: dict = {}
    want_ll = 0.0
    for w, c in wc:
        ec, ll = _forward_backward(w, c, logp, 8)
        want_ll += ll
        for p, v in ec.items():
            want[p] = want.get(p, 0.0) + v
    assert set(got_counts) == set(want)
    for p in want:
        assert got_counts[p] == pytest.approx(want[p], rel=1e-9)
    assert got_ll == pytest.approx(want_ll, rel=1e-9)


def test_train_recovers_morphemes_and_improves_likelihood(spark, docs):
    words = _words(docs, "text").localCheckpoint()
    logp = unigram_train(docs, vocab_size=40, max_piece_len=8,
                         seed_factor=3, em_iters=2, max_rounds=6)
    # coverage: every training char kept
    chars = {c for r in words.collect() for c in r["w"]}
    assert chars <= set(logp)
    assert len(logp) <= 40 + len(chars)
    # the planted morphemes (or their whole words) survive pruning
    multi = {p for p in logp if len(p) > 1}
    assert any(m in multi for m in
               ("sunshine", "rainfall", "sun", "rain", "shine", "fall"))
    # EM improves likelihood round over round on a fixed vocab
    _, ll1 = _em_round(words, logp, 8)
    counts, _ = _em_round(words, logp, 8)
    total = sum(counts.values())
    logp2 = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    _, ll2 = _em_round(words, logp2, 8)
    # tolerance absorbs the required-char floor's ~1e-12-relative mass shift
    assert ll2 >= ll1 - 1e-6


def test_encode_totality_and_compression(spark, docs):
    logp = unigram_train(docs, vocab_size=40, max_piece_len=8,
                         seed_factor=3, em_iters=2, max_rounds=6)
    enc = unigram_encode(docs, logp, max_piece_len=8)
    out = {r["doc_id"]: r for r in enc.collect()}
    assert len(out) == docs.count()
    # round-trip: pieces concatenate to the tokenized text
    from gensor_spark.functions.text import tokens
    from pyspark.sql import functions as F
    toks = {r["doc_id"]: r["t"] for r in
            docs.select("doc_id",
                        F.concat_ws("", tokens(F.col("text"))).alias("t"))
            .collect()}
    for did, r in out.items():
        assert "".join(r["pieces"]) == toks[did]
    # the morpheme-rich docs compress below character count
    d0 = out["d0"]
    assert d0["n_pieces"] < len(toks["d0"])
    # UNK totality: unseen chars ride through
    zdocs = spark.createDataFrame([("z1", "sunshine zebraz")],
                                  "doc_id string, text string")
    zr = unigram_encode(zdocs, logp, max_piece_len=8).collect()[0]
    assert "".join(zr["pieces"]) == "sunshinezebraz"


def test_encode_token_ids(spark, docs):
    from gensor_spark.operators.unigramlm import unigram_encode as enc
    from gensor_spark.operators.unigramlm import vocab_ids

    logp = unigram_train(docs, vocab_size=30, max_piece_len=6,
                         seed_factor=2, em_iters=1, max_rounds=3)
    ids = vocab_ids(logp)
    # deterministic, dense from 1, UNK reserved at 0
    assert sorted(ids.values()) == list(range(1, len(logp) + 1))
    out = enc(docs.limit(3), logp, max_piece_len=6, emit_ids=True).collect()
    inv = {v: k for k, v in ids.items()}
    for r in out:
        assert len(r["token_ids"]) == r["n_pieces"]
        # ids decode back to the pieces (no UNK expected on training text)
        assert [inv[t] for t in r["token_ids"]] == r["pieces"]
    # unseen char → id 0
    z = spark.createDataFrame([("z", "qqq@")],
                              "doc_id string, text string")
    zr = enc(z, logp, max_piece_len=6, emit_ids=True).collect()[0]
    assert 0 in zr["token_ids"] or all(p in ids for p in zr["pieces"])


def test_train_partitioning_invariance(spark, docs):
    a = unigram_train(docs, vocab_size=30, max_piece_len=6,
                      seed_factor=2, em_iters=1, max_rounds=3)
    b = unigram_train(docs.repartition(11), vocab_size=30, max_piece_len=6,
                      seed_factor=2, em_iters=1, max_rounds=3)
    assert set(a) == set(b)
    for p in a:
        assert a[p] == pytest.approx(b[p], rel=1e-9)


def test_arg_validation(spark, docs):
    with pytest.raises(ValueError):
        unigram_train(docs, vocab_size=1)
