"""SAX symbolic representation: published-table breakpoints, loop-reference
parity, z-normalization invariance, motif grouping."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.sax import (
    sax_breakpoints,
    sax_motif_candidates,
    sax_words,
)


def _ref_sax(values, w, a):
    """Independent loop reference: z-norm -> integer-grid PAA -> symbols."""
    v = np.asarray(values, dtype=float)
    mu, sd = v.mean(), v.std()  # ddof=0, matching paa_sketch
    n = len(v)
    # same bin rule as paa_sketch: bin = rank*w DIV n, mean per bin,
    # then z-normalize the SKETCH (paa_sketch normalizes the sketch array)
    bins = (np.arange(n) * w) // n
    paa = np.array([v[bins == b].mean() for b in range(w)])
    mu, sd = paa.mean(), paa.std()
    paa = (paa - mu) / sd if sd > 0 else paa * 0.0
    bps = sax_breakpoints(a)
    return [int(np.sum([paa[i] >= bp for bp in bps])) for i in range(w)]


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(3)
    rows = []
    base = np.sin(np.linspace(0, 4 * np.pi, 64))
    for sid, (scale, shift, noise) in enumerate(
            [(1.0, 0.0, 0.0), (5.0, 100.0, 0.0), (1.0, 0.0, 0.4), (1.0, -3.0, 0.0)]):
        v = base * scale + shift + rng.normal(0, noise, 64) * (noise > 0)
        for i, x in enumerate(v):
            rows.append((f"s{sid}", "src", i, float(x)))
    # a ramp: clearly different word from the sine family
    for i in range(64):
        rows.append(("ramp", "src", i, float(i)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "seq", "value"]))


def test_breakpoints_match_published_table():
    # Lin et al. 2003, Table 3 (a = 3, 4, 5)
    assert np.allclose(sax_breakpoints(3), [-0.43, 0.43], atol=5e-3)
    assert np.allclose(sax_breakpoints(4), [-0.6745, 0.0, 0.6745], atol=1e-4)
    assert np.allclose(
        sax_breakpoints(5), [-0.84, -0.25, 0.25, 0.84], atol=5e-3)
    with pytest.raises(ValueError):
        sax_breakpoints(1)


def test_symbols_match_loop_reference(spark, series_df):
    w, a = 8, 4
    got = {r.sid: list(r.symbols)
           for r in sax_words(series_df, w=w, alphabet_size=a).collect()}
    pdf = series_df.toPandas().sort_values("seq")
    for sid in ("s0|src", "s2|src", "ramp|src"):
        doc = sid.split("|")[0]
        vals = pdf[pdf.doc_id == doc]["value"].to_numpy()
        assert got[sid] == _ref_sax(vals, w, a), sid


def test_znorm_invariance_and_word_rendering(spark, series_df):
    out = {r.sid: r.word
           for r in sax_words(series_df, w=8, alphabet_size=4).collect()}
    # scaled+shifted copies of the same sine share the exact word
    assert out["s0|src"] == out["s1|src"] == out["s3|src"]
    assert out["ramp|src"] != out["s0|src"]
    assert set(out["ramp|src"]) <= set("abcd") and len(out["ramp|src"]) == 8
    # monotone ramp renders as a nondecreasing word
    assert list(out["ramp|src"]) == sorted(out["ramp|src"])


def test_motif_candidates_group_identical_words(spark, series_df):
    groups = sax_motif_candidates(series_df, w=8, alphabet_size=4).collect()
    sine = [g for g in groups
            if set(g.sids) >= {"s0|src", "s1|src", "s3|src"}]
    assert len(sine) == 1 and sine[0].n_series >= 3
    assert all(g.n_series >= 2 for g in groups)


def test_plan_single_shuffle_no_python(spark, series_df):
    plan = (sax_words(series_df, w=8, alphabet_size=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    # symbol mapping adds no exchange beyond paa_sketch's own
    assert plan.count("Exchange") <= 3
