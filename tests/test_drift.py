"""Corpus drift operators (operators/drift.py): numpy brute-force parity,
exactness fixtures, mask semantics, plan guards, and the merged
vocab_topk driver slot."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.functions import text as T
from gensor_spark.operators.drift import psi_numeric, vocab_jsd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    yield df
    df.unpersist()


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


# ---------------------------------------------------------------- psi_numeric

def test_psi_matches_bruteforce(spark, docs):
    nb, eps = 10, 1e-6
    got = psi_numeric(docs, "source", "n_chars", nbins=nb).toPandas()
    pdf = docs.toPandas().dropna(subset=["n_chars"])
    lo, hi = int(pdf.n_chars.min()), int(pdf.n_chars.max())
    b = ((pdf.n_chars.astype(np.int64) - lo) * nb) // (hi - lo + 1)
    checked = 0
    for g in pdf.source.unique():
        cg = np.array([((pdf.source == g) & (b == i)).sum() for i in range(nb)], float)
        cr = np.array([((pdf.source != g) & (b == i)).sum() for i in range(nb)], float)
        p = (cg + eps) / (cg.sum() + nb * eps)
        q = (cr + eps) / (cr.sum() + nb * eps)
        want = float(((p - q) * np.log(p / q)).sum())
        row = got[got.source == g].iloc[0]
        assert row["n_docs"] == int(cg.sum())
        np.testing.assert_allclose(row["psi"], want, rtol=1e-12)
        checked += 1
    assert checked >= 10


def test_psi_flags_a_shifted_group(spark):
    """Planted drift: one source's lengths live in a disjoint range — its
    PSI must dwarf the in-distribution sources'."""
    rng = np.random.RandomState(3)
    rows = []
    for g in ("a", "b", "c"):
        for v in rng.randint(100, 200, 300):
            rows.append((g, int(v)))
    for v in rng.randint(800, 900, 300):  # the drifted source
        rows.append(("drifted", int(v)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["source", "n"]))
    out = {r["source"]: r["psi"] for r in psi_numeric(df, "source", "n").collect()}
    # vs-rest semantics: the drifted source also lifts a/b/c's readings (it
    # pollutes THEIR rest side), so the discriminating signal is relative
    assert out["drifted"] > 5.0
    assert out["drifted"] > 3 * max(out[g] for g in ("a", "b", "c"))


def test_psi_single_group_masks(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"source": ["only"] * 5, "n": [1, 2, 3, 4, 5]})
    )
    row = psi_numeric(df, "source", "n").collect()[0]
    assert row["psi"] is None  # no rest-of-corpus side: mask, don't crash


def test_psi_rejects_bad_nbins(spark, docs):
    with pytest.raises(ValueError):
        psi_numeric(docs, "source", "n_chars", nbins=1)


# ------------------------------------------------------------------ vocab_jsd

def test_jsd_matches_bruteforce(spark, docs):
    got = vocab_jsd(
        docs.select("source", T.tokens(F.col("text")).alias("toks")),
        "source", "toks",
    ).toPandas()
    pdf = docs.toPandas()
    cnt_all: Counter = Counter()
    cnt_g: dict[str, Counter] = {}
    for _, r in pdf.iterrows():
        ts = _tok(r.text)
        cnt_all.update(ts)
        cnt_g.setdefault(r.source, Counter()).update(ts)
    n = sum(cnt_all.values())
    checked = 0
    for g, cg in cnt_g.items():
        ng = sum(cg.values())
        nr = n - ng
        want = 0.0
        for t, c in cnt_all.items():
            p = cg.get(t, 0) / ng
            q = (c - cg.get(t, 0)) / nr
            m = (p + q) / 2
            if p > 0:
                want += 0.5 * p * math.log(p / m)
            if q > 0:
                want += 0.5 * q * math.log(q / m)
        row = got[got.source == g].iloc[0]
        assert row["n_tokens"] == ng
        np.testing.assert_allclose(row["jsd"], want, rtol=1e-9, atol=1e-12)
        checked += 1
    assert checked >= 10


def test_jsd_disjoint_vocab_is_exactly_ln2(spark):
    """A source sharing no token with the rest sits at JSD's upper bound
    ln 2 — and the closed-form absent-token tail makes it EXACT."""
    pdf = pd.DataFrame({
        "source": ["x"] * 3 + ["rest"] * 5,
        "toks": [["alpha", "beta"], ["beta"], ["alpha"]]
        + [["one", "two"], ["two"], ["three"], ["one"], ["three", "two"]],
    })
    got = vocab_jsd(spark.createDataFrame(pdf), "source", "toks").toPandas()
    for g in ("x", "rest"):
        np.testing.assert_allclose(
            got[got.source == g].jsd.iloc[0], math.log(2.0), rtol=0, atol=1e-15
        )


def test_jsd_single_group_masks(spark):
    pdf = pd.DataFrame({"source": ["only", "only"], "toks": [["a", "b"], ["a"]]})
    row = vocab_jsd(spark.createDataFrame(pdf), "source", "toks").collect()[0]
    assert row["jsd"] is None


def test_drift_plans_stay_jvm_side(spark, docs):
    for df in (
        psi_numeric(docs, "source", "n_chars"),
        vocab_jsd(docs.select("source", T.tokens(F.col("text")).alias("toks")),
                  "source", "toks"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


# ------------------------------------------------- merged vocab_topk slot

def test_registry_vocab_slot_matches_oracle(spark):
    from gensor_spark.queries_text import SQL_VOCAB_TOPK, q_vocab_topk
    from tests.driver_compare import compare, run_oracle

    out = q_vocab_topk(spark, SF)
    assert out.columns == ["method", "key", "cnt", "stat"]
    methods = {r[0] for r in out.select("method").distinct().collect()}
    assert methods == {"topk", "psi", "jsd"}
    compare(out, run_oracle(SQL_VOCAB_TOPK, SF), "vocab_topk")
