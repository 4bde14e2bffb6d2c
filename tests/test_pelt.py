"""PELT: pruning-losslessness vs unpruned exhaustive DP, planted shifts,
penalty monotonicity, distributed==kernel parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.pelt import (
    _seg_cost_factory,
    pelt_changepoints,
    pelt_changepoints_np,
)


def _optimal_unpruned(values, penalty):
    """O(n²) exhaustive optimal-partition DP — no pruning, ground truth."""
    n = len(values)
    cost = _seg_cost_factory(np.asarray(values, dtype=float))
    f = [-penalty] + [np.inf] * n
    prev = [0] * (n + 1)
    for t in range(1, n + 1):
        for s in range(t):
            c = f[s] + cost(s, t) + penalty
            if c < f[t]:
                f[t], prev[t] = c, s
    cps, t = [], n
    while t > 0:
        s = prev[t]
        if s > 0:
            cps.append(s)
        t = s
    return sorted(cps), f[n]


def test_pelt_pruning_is_lossless_randomized():
    rng = np.random.default_rng(17)
    for trial in range(30):
        n = int(rng.integers(5, 120))
        v = rng.normal(0, 1, n)
        # plant 0-3 shifts
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(1, n))
            v[p:] += rng.normal(0, 4)
        pen = float(rng.uniform(1.0, 25.0))
        got = pelt_changepoints_np(v, pen)
        want, _ = _optimal_unpruned(v, pen)
        assert got == want, (trial, n, pen)


def test_pelt_finds_planted_shifts_exactly():
    v = np.concatenate([np.zeros(40), np.full(40, 8.0), np.full(40, -5.0)])
    assert pelt_changepoints_np(v, penalty=10.0) == [40, 80]
    # huge penalty: no changepoints; tiny shifts under penalty: none
    assert pelt_changepoints_np(v, penalty=1e9) == []
    assert pelt_changepoints_np(np.zeros(50), penalty=1.0) == []


def test_pelt_penalty_monotonicity():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, 200)
    v[60:] += 3.0
    v[150:] -= 2.5
    n_small = len(pelt_changepoints_np(v, 5.0))
    n_big = len(pelt_changepoints_np(v, 50.0))
    assert n_small >= n_big >= 1


def test_pelt_distributed_matches_kernel(spark):
    rng = np.random.default_rng(9)
    frames = []
    for d in range(6):
        n = 80 + d * 15
        v = rng.normal(0, 1, n)
        if d % 2 == 0:
            v[n // 2:] += 6.0
        v[3] = np.nan  # NaNs dropped before detection
        frames.append(pd.DataFrame({
            "doc_id": f"d{d}", "source": "s", "seq": np.arange(n), "value": v,
        }))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    out = pelt_changepoints(df, penalty=12.0).toPandas()
    for d in range(6):
        sub = pdf[pdf.doc_id == f"d{d}"].sort_values("seq")
        clean = sub[sub.value.notna()]
        want = pelt_changepoints_np(clean["value"].to_numpy(float), 12.0)
        mine = out[(out.doc_id == f"d{d}") & (out.cp_index >= 0)]
        assert sorted(mine["cp_index"]) == want, d
        # cp_seq maps ordinal -> original seq across the dropped NaN
        seqs = clean["seq"].to_numpy()
        assert sorted(mine["cp_seq"]) == [int(seqs[i]) for i in want]
        summary = out[(out.doc_id == f"d{d}") & (out.cp_index == -1)]
        assert len(summary) == 1
        assert summary["n_segments"].iloc[0] == len(want) + 1


def test_pelt_summary_row_for_short_series(spark):
    df = spark.createDataFrame(
        [("tiny", "s", 0, 1.0)], "doc_id string, source string, seq long, value double")
    out = pelt_changepoints(df, penalty=5.0).collect()
    assert len(out) == 1 and out[0].cp_index == -1 and out[0].n_segments == 1
