"""Shared fixtures: one SparkSession per test run, deterministic inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gensor_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gensor_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_small(spark):
    from gensor_spark.sources.synth import synth_docs

    return synth_docs(spark, n_docs=40, seed=7, min_tok=8, max_tok=200).cache()


@pytest.fixture(scope="session")
def points_pdf() -> pd.DataFrame:
    """Deterministic multi-series point set with gaps + nulls, as pandas.

    Mirrors the reference conftest style (synthetic series with known shape,
    /root/reference/tests/conftest.py) but multi-series and with in-band NaN
    gaps, which gensor treats as legal (compensation.py:117-124).
    """
    rng = np.random.default_rng(42)
    frames = []
    for d in range(4):
        n = 500 + d * 37
        # irregular timestamps: minute grid with dropped stretches
        base = pd.date_range("2024-01-01", periods=n * 2, freq="min", tz="UTC")
        keep = rng.random(n * 2) < 0.55
        ts = base[keep][:n]
        vals = rng.normal(100, 5, size=len(ts))
        vals[rng.random(len(ts)) < 0.05] = np.nan
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": f"doc_{d}",
                    "source": f"src_{d % 2}",
                    "seq": np.arange(len(ts)),
                    "ts": ts,
                    "value": vals,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="session")
def points_sdf(spark, points_pdf):
    sdf = spark.createDataFrame(points_pdf)
    return sdf.cache()
