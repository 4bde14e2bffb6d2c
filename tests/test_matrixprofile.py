"""Matrix profile (operators/matrixprofile.py): STOMP vs a brute-force
z-normalized nearest-neighbor reference, behavioral motif/discord checks,
and a full DuckDB SQL oracle replaying the definition on the driver
testdata (the lag-product window formulation)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.matrixprofile import (
    _dp_kernel,
    _mp_kernel,
    matrix_profile,
    pattern_search,
    top_discords,
    top_motifs,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# brute-force reference (the definition, no recursion)
# --------------------------------------------------------------------------

def _znorm_dist(a: np.ndarray, b: np.ndarray) -> float:
    m = len(a)
    sa, sb = a.std(), b.std()
    fa, fb = sa <= 1e-13 * max(abs(a.mean()), 1.0), sb <= 1e-13 * max(abs(b.mean()), 1.0)
    if fa and fb:
        return 0.0
    if fa or fb:
        return math.sqrt(m)
    za, zb = (a - a.mean()) / sa, (b - b.mean()) / sb
    return float(np.sqrt(((za - zb) ** 2).sum()))


def _brute(x: np.ndarray, m: int, excl: int):
    n = len(x)
    p = n - m + 1
    mp = np.full(p, np.nan)
    mpi = np.full(p, -1, dtype=np.int64)
    valid = [np.isfinite(x[i:i + m]).all() for i in range(p)]
    for i in range(p):
        if not valid[i]:
            continue
        ds = np.full(p, np.inf)
        for j in range(p):
            if abs(j - i) <= excl or not valid[j]:
                continue
            ds[j] = _znorm_dist(x[i:i + m], x[j:j + m])
        dmin = ds.min()
        if np.isfinite(dmin):
            mp[i] = dmin
            mpi[i] = int(np.nonzero(ds <= dmin + 1e-9)[0][0])
    return mp, mpi


def test_kernel_matches_brute_force():
    rng = np.random.default_rng(11)
    for n, m in [(40, 5), (64, 8), (25, 4)]:
        x = rng.normal(0, 1, n).cumsum()
        excl = max(1, math.ceil(m / 4))
        mp, mpi = _mp_kernel(x, m, excl, 1e-9)
        bmp, bmpi = _brute(x, m, excl)
        np.testing.assert_allclose(mp, bmp, rtol=1e-9, atol=1e-9)
        np.testing.assert_array_equal(mpi, bmpi)


def test_kernel_nan_windows_invalid():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 30)
    x[10] = np.nan
    mp, mpi = _mp_kernel(x, 4, 1, 1e-9)
    # windows 7..10 contain the NaN → no profile, never a neighbor
    for i in range(7, 11):
        assert np.isnan(mp[i]) and mpi[i] == -1
    bmp, bmpi = _brute(x, 4, 1)
    np.testing.assert_allclose(mp, bmp, rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(mpi, bmpi)


def test_kernel_constant_series():
    x = np.full(12, 7.5)
    mp, mpi = _mp_kernel(x, 4, 1, 1e-9)
    # every subsequence flat → distance 0, neighbor = smallest non-trivial j
    np.testing.assert_allclose(mp, 0.0)
    assert mpi[0] == 2 and mpi[5] == 0


def test_kernel_short_series_all_null():
    mp, mpi = _mp_kernel(np.arange(4.0), 4, 1, 1e-9)
    assert len(mp) == 1 and np.isnan(mp[0]) and mpi[0] == -1


def test_discord_found_at_implanted_anomaly(spark):
    t = np.arange(200)
    x = np.sin(2 * np.pi * t / 20)
    x[100:108] += np.array([0, 3, -3, 4, -4, 3, -3, 0])  # shape anomaly
    pdf = pd.DataFrame(
        {"doc_id": "s", "source": "a", "seq": t, "value": x})
    mp = matrix_profile(spark.createDataFrame(pdf), m=16)
    top = top_discords(mp, k=1).collect()[0]
    assert 88 <= top["pos"] <= 108


def test_motif_links_implanted_pattern(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, 300) * 5
    pat = np.sin(np.linspace(0, 3 * np.pi, 24))
    x[40:64] = pat
    x[200:224] = pat  # exact repeat far away
    pdf = pd.DataFrame(
        {"doc_id": "s", "source": "a", "seq": np.arange(300), "value": x})
    mp = matrix_profile(spark.createDataFrame(pdf), m=24)
    top = top_motifs(mp, k=1).collect()[0]
    assert {top["pos"], top["mp_index"]} == {40, 200}
    assert top["mp"] < 1e-4  # exact repeat up to QT-recursion float noise


def test_max_points_tail(spark):
    pdf = pd.DataFrame({
        "doc_id": "s", "source": "a", "seq": np.arange(100),
        "value": np.sin(np.arange(100) / 3.0),
    })
    full = matrix_profile(spark.createDataFrame(pdf), m=8)
    assert full.count() == 93
    tail = matrix_profile(spark.createDataFrame(pdf), m=8, max_points=50)
    assert tail.count() == 43  # 50 - 8 + 1, positions tail-relative


# --------------------------------------------------------------------------
# DuckDB SQL oracle on the driver testdata (the same comparison the driver
# would run if the 50-entry oracle window had a free slot)
# --------------------------------------------------------------------------

def _oracle_sql(sf_dir: str, m: int, excl: int) -> str:
    return f"""
    WITH pts AS (
      SELECT user_id::VARCHAR AS doc_id, event_type AS source, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) - 1 AS seq
      FROM read_parquet('{sf_dir}/events.parquet')
    ),
    win AS (
      SELECT doc_id, source, i, mu, sig,
             (sig <= 1e-13 * greatest(abs(mu), 1.0)) AS flat
      FROM (
        SELECT doc_id, source, seq AS i,
               avg(value) OVER w AS mu,
               stddev_pop(value) OVER w AS sig,
               count(*) OVER w AS c
        FROM pts
        WINDOW w AS (PARTITION BY doc_id, source ORDER BY seq
                     ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)
      ) WHERE c = {m}
    ),
    prod AS (
      SELECT p.doc_id, p.source, p.seq AS t, q.seq - p.seq AS lag,
             p.value * q.value AS pv
      FROM pts p JOIN pts q
        ON q.doc_id = p.doc_id AND q.source = p.source AND q.seq > p.seq
    ),
    qt AS (
      SELECT doc_id, source, lag, t AS i,
             sum(pv) OVER w AS qt, count(*) OVER w AS c
      FROM prod
      WINDOW w AS (PARTITION BY doc_id, source, lag ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)
    ),
    pair AS (
      SELECT q.doc_id, q.source, q.i, q.i + q.lag AS j,
             CASE WHEN wa.flat AND wb.flat THEN 0.0
                  WHEN wa.flat OR wb.flat THEN sqrt({m}::DOUBLE)
                  ELSE sqrt(greatest(2.0 * {m} * (1.0 -
                    (q.qt - {m} * wa.mu * wb.mu) / ({m} * wa.sig * wb.sig)),
                    0.0)) END AS d
      FROM qt q
      JOIN win wa ON wa.doc_id = q.doc_id AND wa.source = q.source
                 AND wa.i = q.i
      JOIN win wb ON wb.doc_id = q.doc_id AND wb.source = q.source
                 AND wb.i = q.i + q.lag
      WHERE q.c = {m} AND q.lag > {excl}
    ),
    sym AS (
      SELECT doc_id, source, i AS pos, j AS nn, d FROM pair
      UNION ALL
      SELECT doc_id, source, j AS pos, i AS nn, d FROM pair
    ),
    mins AS (
      SELECT doc_id, source, pos, min(d) AS dmin
      FROM sym GROUP BY 1, 2, 3
    ),
    chosen AS (
      SELECT b.doc_id, b.source, b.pos, any_value(m.dmin) AS mp,
             min(b.nn) AS mp_index
      FROM sym b JOIN mins m USING (doc_id, source, pos)
      WHERE b.d <= m.dmin + 1e-9
      GROUP BY 1, 2, 3
    )
    SELECT w.doc_id, w.source, w.i AS pos,
           round(c.mp + 1e-9, 6) AS mp, c.mp_index
    FROM win w
    LEFT JOIN chosen c
      ON c.doc_id = w.doc_id AND c.source = w.source AND c.pos = w.i
    ORDER BY w.doc_id, w.source, pos
    """


def test_matches_duckdb_oracle_on_testdata(spark):
    import __spark_entry__ as E

    got = (
        E.queries()["matrix_profile"](spark, SF)
        .orderBy("doc_id", "source", "pos")
        .toPandas()
    )
    exp = duckdb.connect().execute(_oracle_sql(SF, 6, 2)).df()
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got["doc_id"], exp["doc_id"])
    np.testing.assert_array_equal(got["pos"], exp["pos"])
    np.testing.assert_allclose(
        got["mp"].to_numpy(dtype=float), exp["mp"].to_numpy(dtype=float),
        rtol=0, atol=1.1e-6, equal_nan=True,
    )
    gi = got["mp_index"].to_numpy(dtype=float)
    ei = exp["mp_index"].to_numpy(dtype=float)
    np.testing.assert_array_equal(np.isnan(gi), np.isnan(ei))
    np.testing.assert_array_equal(gi[~np.isnan(gi)], ei[~np.isnan(ei)])


# --------------------------------------------------------------------------
# pattern search (MASS distance profile)
# --------------------------------------------------------------------------

def test_dp_kernel_matches_brute_force():
    rng = np.random.default_rng(13)
    x = rng.normal(0, 1, 50).cumsum()
    q = rng.normal(0, 1, 7)
    d = _dp_kernel(x, q)
    for i in range(len(x) - 7 + 1):
        assert math.isclose(d[i], _znorm_dist(q, x[i:i + 7]),
                            rel_tol=1e-9, abs_tol=1e-9)


def test_dp_kernel_nan_and_flat():
    x = np.array([1.0, 2.0, np.nan, 4.0, 5.0, 5.0, 5.0, 5.0, 9.0, 1.0])
    q = np.array([1.0, 2.0, 3.0])
    d = _dp_kernel(x, q)
    assert np.isnan(d[0]) and np.isnan(d[1]) and np.isnan(d[2])
    assert math.isclose(d[4], math.sqrt(3))  # flat window vs non-flat query


def test_pattern_found_at_any_scale_and_offset(spark):
    rng = np.random.default_rng(7)
    q = np.sin(np.linspace(0, 2 * np.pi, 12))
    frames = []
    for d_i, (a, b, at) in enumerate([(1.0, 0.0, 30), (250.0, 1000.0, 70)]):
        x = rng.normal(0, 1, 120) * 4
        x[at:at + 12] = a * q + b  # same SHAPE, wildly different scale
        frames.append(pd.DataFrame({
            "doc_id": f"d{d_i}", "source": "s",
            "seq": np.arange(120), "value": x}))
    pts = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    hits = (
        pattern_search(pts, q, max_dist=0.01)
        .orderBy("doc_id").collect()
    )
    assert [(h["doc_id"], h["pos"]) for h in hits] == [("d0", 30), ("d1", 70)]


def test_per_series_k_cut(spark):
    pdf = pd.DataFrame({
        "doc_id": "s", "source": "a", "seq": np.arange(60),
        "value": np.sin(np.arange(60) / 2.0),
    })
    pts = spark.createDataFrame(pdf)
    q = np.sin(np.arange(8) / 2.0)
    full = pattern_search(pts, q).toPandas()
    cut = pattern_search(pts, q, per_series_k=5).toPandas()
    assert len(full) == 53 and len(cut) == 5
    # the kept five are exactly the five smallest distances
    np.testing.assert_allclose(
        np.sort(cut["dist"]), np.sort(full["dist"])[:5], rtol=1e-12)


def _pattern_oracle_sql(sf_dir: str, q: list[float]) -> str:
    m = len(q)
    vals = ", ".join(f"({k}, {v!r}::DOUBLE)" for k, v in enumerate(q))
    return f"""
    WITH pts AS (
      SELECT user_id::VARCHAR AS doc_id, event_type AS source, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) - 1 AS seq
      FROM read_parquet('{sf_dir}/events.parquet')
    ),
    q(k, qv) AS (VALUES {vals}),
    qs AS (SELECT avg(qv) AS mq, stddev_pop(qv) AS sq FROM q),
    win AS (
      SELECT doc_id, source, i, mu, sig,
             (sig <= 1e-13 * greatest(abs(mu), 1.0)) AS flat
      FROM (
        SELECT doc_id, source, seq AS i,
               avg(value) OVER w AS mu,
               stddev_pop(value) OVER w AS sig,
               count(*) OVER w AS c
        FROM pts
        WINDOW w AS (PARTITION BY doc_id, source ORDER BY seq
                     ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)
      ) WHERE c = {m}
    ),
    qt AS (
      SELECT p.doc_id, p.source, p.seq - q.k AS pos,
             sum(p.value * q.qv) AS qt, count(*) AS c
      FROM pts p JOIN q ON p.seq - q.k >= 0
      GROUP BY 1, 2, 3
    ),
    dist AS (
      SELECT w.doc_id, w.source, w.i AS pos,
             CASE WHEN w.flat THEN sqrt({m}::DOUBLE)
                  ELSE sqrt(greatest(2.0 * {m} * (1.0 -
                    (t.qt - {m} * qs.mq * w.mu) / ({m} * qs.sq * w.sig)),
                    0.0)) END AS dist
      FROM win w
      JOIN qt t ON t.doc_id = w.doc_id AND t.source = w.source
               AND t.pos = w.i AND t.c = {m}
      CROSS JOIN qs
    )
    SELECT doc_id, source, pos, round(dist + 1e-9, 6) AS dist
    FROM dist ORDER BY doc_id, source, pos
    """


def test_pattern_search_matches_duckdb_oracle(spark):
    import __spark_entry__ as E

    got = (
        E.queries()["pattern_search"](spark, SF)
        .orderBy("doc_id", "source", "pos")
        .toPandas()
    )
    from gensor_spark.queries import PATTERN_QUERY
    exp = duckdb.connect().execute(
        _pattern_oracle_sql(SF, list(PATTERN_QUERY))).df()
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got["doc_id"], exp["doc_id"])
    np.testing.assert_array_equal(got["pos"], exp["pos"])
    np.testing.assert_allclose(
        got["dist"].to_numpy(dtype=float), exp["dist"].to_numpy(dtype=float),
        rtol=0, atol=1.1e-6)
