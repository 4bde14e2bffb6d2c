"""Z-order clustered writes (plans/zorder.py): interleave parity vs a
Python reference and measured row-group pruning on both dimensions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gensor_spark.plans.zorder import rank_scale, write_zordered, zvalue


def _morton_ref(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zvalue_matches_python_reference(spark):
    rng = np.random.RandomState(4)
    a = rng.randint(0, 1 << 16, 200)
    b = rng.randint(0, 1 << 16, 200)
    df = spark.createDataFrame(
        pd.DataFrame({"a": a, "b": b})
    ).withColumn("z", zvalue(["a", "b"], bits=16))
    got = df.orderBy("a", "b").toPandas()
    want = [_morton_ref([x, y], 16) for x, y in zip(got["a"], got["b"])]
    np.testing.assert_array_equal(got["z"].to_numpy(), want)


def test_zvalue_guards():
    with pytest.raises(ValueError, match="1-4"):
        zvalue([])
    with pytest.raises(ValueError, match="fit a long"):
        zvalue(["a", "b", "c"], bits=21)


def test_rank_scale_uniform_even_under_skew(spark):
    """A zipf-skewed column still fills the [0, 2^bits) grid ~uniformly."""
    rng = np.random.RandomState(7)
    raw = rng.zipf(1.3, 4000).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"v": raw}))
    out = rank_scale(df, "v", bits=4, out="s").groupBy("s").count().toPandas()
    assert len(out) == 16  # every cell occupied
    assert out["count"].max() <= out["count"].min() + 1  # rank -> exact balance


def _rg_overlap_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] stats overlap [lo, hi]."""
    total = overlap = 0
    for piece in pq.ParquetDataset(path).fragments:
        md = piece.metadata
        ci = {md.schema.column(i).name: i for i in range(len(md.schema.names))}
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci[col]).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                overlap += 1
    assert total >= 16, f"need enough row groups to measure, got {total}"
    return overlap / total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The measured claim: a point-ish predicate on EITHER dimension
    overlaps a small fraction of row groups in the z-ordered layout, while
    a single-column sort only prunes its own dimension."""
    rng = np.random.RandomState(11)
    n = 200_000
    pdf = pd.DataFrame({
        "series": rng.randint(0, 1000, n).astype(np.int64),
        "epoch_min": rng.randint(0, 50_000, n).astype(np.int64),
        "value": rng.normal(0, 1, n),
    })
    df = spark.createDataFrame(pdf)
    # small row groups so the stats grid is fine enough to measure pruning
    opts = {"parquet.block.size": 32 * 1024, "parquet.page.size": 8 * 1024}

    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["series", "epoch_min"], n_files=64,
                   writer_options=opts)

    tpath = str(tmp_path / "time_sorted")
    w = (df.repartitionByRange(64, "epoch_min")
           .sortWithinPartitions("epoch_min").write.mode("overwrite"))
    for k, v in opts.items():
        w = w.option(k, v)
    w.parquet(tpath)

    # predicate windows ~1% of each domain
    f_series_z = _rg_overlap_fraction(zpath, "series", 500, 509)
    f_time_z = _rg_overlap_fraction(zpath, "epoch_min", 25_000, 25_499)
    f_series_t = _rg_overlap_fraction(tpath, "series", 500, 509)
    f_time_t = _rg_overlap_fraction(tpath, "epoch_min", 25_000, 25_499)

    # time-sorted layout: perfect on time, useless on series
    assert f_time_t < 0.1
    assert f_series_t > 0.9
    # z-ordered: BOTH dimensions prune substantially (measured ~0.23 each)
    assert f_series_z < 0.4
    assert f_time_z < 0.4
    # and the layout is invisible to readers: same rows back
    assert spark.read.parquet(zpath).count() == n
    got = spark.read.parquet(zpath).agg(F.sum("series"), F.sum("epoch_min")).collect()[0]
    assert got[0] == int(pdf["series"].sum()) and got[1] == int(pdf["epoch_min"].sum())


def test_write_zordered_drops_helper_columns(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame({"a": np.arange(100, dtype=np.int64),
                      "b": np.arange(100, dtype=np.int64)[::-1],
                      "v": np.ones(100)}))
    p = str(tmp_path / "zw")
    write_zordered(df, p, ["a", "b"], n_files=2)
    back = spark.read.parquet(p)
    assert sorted(back.columns) == ["a", "b", "v"]
