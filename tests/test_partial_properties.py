"""Property-based pins for the partial-state algebra (hypothesis).

The entire tier store rests on one claim: merging partials over ANY
partition of the rows equals the single-pass aggregate. The example-based
suites pin specific splits (batch, salt, cascade, stream epochs); these
properties pin ARBITRARY splits over arbitrary value sequences — NaNs,
all-NaN groups, constants, negative values, extreme magnitudes.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# value sequences: finite doubles of mixed magnitude, with Nones (SQL NULL)
vals = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=40,
)
cuts = st.lists(st.integers(min_value=0, max_value=39), max_size=4)


def _partial(seq_vals):
    """Single-pass partial state of [(ts_ordinal, value)] — the pure-python
    mirror of rollup_tier's aggregate list."""
    nn = [(t, v) for t, v in seq_vals if v is not None]
    if not nn:
        return dict(cnt=0, vmin=None, vmax=None, vsum=None, last=None,
                    last_ts=None, first=None, first_ts=None, vsumsq=None)
    vs = [v for _, v in nn]
    return dict(
        cnt=len(nn),
        vmin=min(vs), vmax=max(vs), vsum=sum(vs),
        last=max(nn, key=lambda p: p[0])[1],
        last_ts=max(t for t, _ in nn),
        first=min(nn, key=lambda p: p[0])[1],
        first_ts=min(t for t, _ in nn),
        vsumsq=sum(v * v for v in vs),
    )


def _merge(a, b):
    """The pure-python mirror of _merge_partials for one bin."""
    if a["cnt"] == 0:
        return dict(b)
    if b["cnt"] == 0:
        return dict(a)
    lo, hi = (a, b) if a["first_ts"] <= b["first_ts"] else (b, a)
    el, eh = (a, b) if a["last_ts"] >= b["last_ts"] else (b, a)
    return dict(
        cnt=a["cnt"] + b["cnt"],
        vmin=min(a["vmin"], b["vmin"]), vmax=max(a["vmax"], b["vmax"]),
        vsum=a["vsum"] + b["vsum"],
        last=el["last"], last_ts=el["last_ts"],
        first=lo["first"], first_ts=lo["first_ts"],
        vsumsq=a["vsumsq"] + b["vsumsq"],
    )


def _close(x, y):
    if x is None or y is None:
        return x is None and y is None
    return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=300, deadline=None)
@given(vals, cuts)
def test_any_partition_merges_to_single_pass(values, cut_points):
    seq = list(enumerate(values))
    whole = _partial(seq)
    pieces, prev = [], 0
    for c in sorted({min(c, len(seq)) for c in cut_points}):
        pieces.append(seq[prev:c])
        prev = c
    pieces.append(seq[prev:])
    acc = _partial([])
    for p in pieces:
        acc = _merge(acc, _partial(p))
    for k in whole:
        if k in ("cnt", "last_ts", "first_ts"):
            assert acc[k] == whole[k], k
        else:
            assert _close(acc[k], whole[k]), (k, acc[k], whole[k])


@settings(max_examples=300, deadline=None)
@given(vals, vals)
def test_merge_is_commutative(a_vals, b_vals):
    """Partial merge must not care which side is 'left' — ties broken by
    timestamp, never by argument order (disjoint ordinals here, as in
    disjoint batches)."""
    a = _partial(list(enumerate(a_vals)))
    b = _partial([(len(a_vals) + i, v) for i, v in enumerate(b_vals)])
    ab, ba = _merge(a, b), _merge(b, a)
    for k in ab:
        if k in ("cnt", "last_ts", "first_ts"):
            assert ab[k] == ba[k], k
        else:
            assert _close(ab[k], ba[k]), k


import pytest

_ANCHOR_CASES = [
    [1.0, 2.0, 3.0],
    [None, 5.0, None, -2.5, 0.0],
    [None, None],               # all-NULL bin
    [7.0] * 6,                  # constant
    [-1e6, 1e6, 3.14159],
    [42.0],                     # singleton
    [0.0, -0.0, None, 1e-12],
]


@pytest.mark.parametrize("values", _ANCHOR_CASES)
def test_python_mirror_matches_spark(spark, values):
    """Anchor the pure-python mirror to the real operators (the mirror is
    only evidence if it equals the Spark semantics it mirrors)."""
    import pandas as pd

    from gensor_spark.operators.rollup import finalize_tier, rollup_tier

    rows = [("a", "s", i,
             (pd.Timestamp("2024-01-01")
              + pd.Timedelta(seconds=i)).to_pydatetime(), v)
            for i, v in enumerate(values)]
    pts = spark.createDataFrame(
        rows,
        "doc_id string, source string, seq long, ts timestamp, value double")
    got = finalize_tier(
        rollup_tier(pts, "1h", with_first=True, with_sumsq=True),
        ddof=0).toPandas().iloc[0]
    want = _partial(list(enumerate(values)))
    assert got["count"] == want["cnt"]
    for g, w in (("min", "vmin"), ("max", "vmax"), ("open", "first"),
                 ("last", "last")):
        gv = None if pd.isna(got[g]) else float(got[g])
        assert _close(gv, want[w]), (g, gv, want[w])
