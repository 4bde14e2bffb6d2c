"""Streaming drift monitor vs the batch psi_vs_reference on the same input,
plus batch-operator semantics: pinned-bounds clamping, reference parity."""

from __future__ import annotations

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.drift import psi_vs_reference
from gensor_spark.streaming.drift_stream import drift_monitor_stream


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    yield str(src), str(out)
    shutil.rmtree(tmp_path, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


# ------------------------------------------------- batch psi_vs_reference

def test_psi_vs_reference_matches_numpy(spark):
    rng = np.random.RandomState(5)
    ref = _docs(spark, [(i, "r", int(v))
                        for i, v in enumerate(rng.randint(100, 300, 400))])
    cur_rows = [(1000 + i, "a" if i % 2 else "b", int(v))
                for i, v in enumerate(rng.randint(100, 300, 300))]
    cur = _docs(spark, cur_rows)
    nb, eps = 10, 1e-6
    got = {r[0]: (r["n_docs"], r["psi"])
           for r in psi_vs_reference(cur, ref, "source", "n_chars",
                                     nbins=nb).collect()}
    rv = np.array([r[2] for r in ref.collect()])
    lo, hi = rv.min(), rv.max()

    def binv(v):
        return ((min(max(v, lo), hi) - lo) * nb) // (hi - lo + 1)

    rc = np.bincount([binv(v) for v in rv], minlength=nb).astype(float)
    for g in ("a", "b"):
        gv = [v for _, s, v in cur_rows if s == g]
        gc = np.bincount([binv(v) for v in gv], minlength=nb).astype(float)
        p = (gc + eps) / (gc.sum() + nb * eps)
        q = (rc + eps) / (rc.sum() + nb * eps)
        want = float(((p - q) * np.log(p / q)).sum())
        assert got[g][0] == len(gv)
        np.testing.assert_allclose(got[g][1], want, rtol=1e-12)


def test_psi_vs_reference_clamps_out_of_range(spark):
    """Values outside the pinned bounds land in edge bins (drift evidence,
    not an error) — and a shifted current sample scores high."""
    ref = _docs(spark, [(i, "r", 100 + (i % 50)) for i in range(200)])
    far = _docs(spark, [(500 + i, "x", 10_000 + i) for i in range(100)])
    row = psi_vs_reference(far, ref, "source", "n_chars").collect()[0]
    assert row["psi"] > 5.0  # all mass clamped into the top edge bin
    same = psi_vs_reference(
        _docs(spark, [(900 + i, "y", 100 + (i % 50)) for i in range(200)]),
        ref, "source", "n_chars").collect()[0]
    assert same["psi"] < 0.05


def test_psi_vs_reference_guards(spark):
    ref = _docs(spark, [(0, "r", 10)])
    with pytest.raises(ValueError, match="nbins"):
        psi_vs_reference(ref, ref, "source", "n_chars", nbins=1)
    with pytest.raises(ValueError, match="bounds"):
        psi_vs_reference(ref, ref, "source", "n_chars", bounds=(5, 1))


# ------------------------------------------------------ streaming monitor

def test_stream_drift_equals_batch(spark, dirs):
    src, out = dirs
    rng = np.random.RandomState(9)
    ref = _docs(spark, [(i, "r", int(v))
                        for i, v in enumerate(rng.randint(50, 150, 300))])
    cur_rows = [(1000 + i, "a" if i % 3 else "drifted",
                 int(v) if i % 3 else int(v) + 400)
                for i, v in enumerate(rng.randint(50, 150, 240))]
    cur = _docs(spark, cur_rows)
    cur.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(cur.schema).parquet(src)
    q = drift_monitor_stream(stream, ref, out, trigger_once=True)
    q.awaitTermination(120)

    back = spark.read.parquet(f"{out}/data")
    assert "epoch" in back.columns
    got = {r["source"]: (r["n_docs"], r["psi"]) for r in back.collect()}
    lo_hi = ref.agg(F.min("n_chars"), F.max("n_chars")).first()
    want = {r["source"]: (r["n_docs"], r["psi"])
            for r in psi_vs_reference(
                cur, ref, "source", "n_chars",
                bounds=(lo_hi[0], lo_hi[1])).collect()}
    assert set(got) == {"a", "drifted"}
    for g in got:
        assert got[g][0] == want[g][0]
        np.testing.assert_allclose(got[g][1], want[g][1], rtol=1e-12)
    assert got["drifted"][1] > 10 * got["a"][1]


def test_stream_drift_epoch_replay_idempotent(spark, dirs):
    """Re-running the monitor over the same input (fresh checkpoint, same
    out dir) overwrites the same epoch partition — no duplicate rows."""
    src, out = dirs
    cur = _docs(spark, [(i, "a", 100 + i) for i in range(50)])
    ref = _docs(spark, [(900 + i, "r", 100 + i) for i in range(50)])
    cur.write.mode("overwrite").parquet(src)

    for attempt in range(2):
        stream = spark.readStream.schema(cur.schema).parquet(src)
        q = drift_monitor_stream(stream, ref, out, trigger_once=True)
        q.awaitTermination(120)
        shutil.rmtree(f"{out}/_checkpoints", ignore_errors=True)

    back = spark.read.parquet(f"{out}/data").toPandas()
    assert len(back) == 1  # one source, one epoch row — not two
    assert back["n_docs"].iloc[0] == 50


def test_stream_drift_empty_reference_raises(spark, dirs):
    src, out = dirs
    cur = _docs(spark, [(0, "a", 10)])
    cur.write.mode("overwrite").parquet(src)
    empty = spark.createDataFrame(
        [], "doc_id long, source string, n_chars long")
    stream = spark.readStream.schema(cur.schema).parquet(src)
    with pytest.raises(ValueError, match="reference"):
        drift_monitor_stream(stream, empty, out)
