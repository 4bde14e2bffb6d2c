"""Streaming packing: epoch-split == single-pass, token conservation,
chunk-boundary exactness vs a sequential reference."""

from __future__ import annotations

import shutil
import time

import numpy as np
import pandas as pd
import pytest

from gensor_spark.streaming.packing_stream import streaming_pack

SEQ = 16


def _mk_docs(n=40, seed=2):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = rng.integers(0, 1000, rng.integers(1, 30)).astype(int).tolist()
        rows.append({
            "doc_id": f"d{i:03d}",
            "source": "sA" if i % 3 else "sB",
            "ts": pd.Timestamp("2024-01-01", tz="UTC")
                  + pd.Timedelta(minutes=i),
            "tokens": toks,
        })
    return pd.DataFrame(rows)


def _reference(pdf, source):
    sub = pdf[pdf.source == source].sort_values(["ts", "doc_id"])
    flat = [t for toks in sub["tokens"] for t in toks]
    n_full = len(flat) // SEQ
    chunks = [flat[i * SEQ:(i + 1) * SEQ] for i in range(n_full)]
    return chunks, flat[n_full * SEQ:]


def _run(spark, pdf, tmp_path, qname, n_files):
    d = tmp_path / f"in_{qname}"
    d.mkdir()
    for i, idx in enumerate(np.array_split(pdf.index, n_files)):
        spark.createDataFrame(pdf.loc[idx]).coalesce(1) \
            .write.mode("overwrite").parquet(str(d / f"p{i}"))
        src = next((d / f"p{i}").glob("*.parquet"))
        shutil.copy(src, d / f"{i}_{src.name}")
        shutil.rmtree(d / f"p{i}")
        time.sleep(1.05)
    stream = (spark.readStream.schema(spark.createDataFrame(pdf).schema)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    out = streaming_pack(stream, seq_len=SEQ)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(qname)
         .option("checkpointLocation", str(tmp_path / f"ck_{qname}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return (spark.sql(f"select * from {qname}").toPandas()
            .sort_values(["source", "chunk_seq"]).reset_index(drop=True))


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_pack_matches_sequential_reference(spark, tmp_path, n_files):
    pdf = _mk_docs()
    got = _run(spark, pdf, tmp_path, f"pack{n_files}", n_files)
    for src in ("sA", "sB"):
        want, remainder = _reference(pdf, src)
        mine = got[got.source == src]
        assert list(mine["chunk_seq"]) == list(range(len(want)))
        assert [list(c) for c in mine["tokens"]] == want
        # conservation: emitted + carried == ingested
        ingested = sum(len(t) for t in pdf[pdf.source == src]["tokens"])
        emitted = sum(len(c) for c in mine["tokens"])
        assert emitted + len(remainder) == ingested
        assert all(len(c) == SEQ for c in mine["tokens"])


def test_stream_pack_rejects_bad_seq_len(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        streaming_pack(df, seq_len=0)
