"""Ingestion parity vs the reference's bundled van Essen Diver exports.

The sample files ship with the reference (`/root/reference/gensor/testdata/`
— real Diver-Office exports the reference's own tests parse,
`tests/conftest.py:162-204`). Golden values below are hand-read from the
files; the reference's parsing semantics (header fields, regex metadata,
tz-to-UTC, data-block slicing) are documented in SURVEY.md §2.1.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.sources.csvfiles import read_plain, read_vanessen

REF_DATA = "/root/reference/gensor/testdata"
PB01A = f"{REF_DATA}/PB01A_moni_AV319_220427183019_AV319.csv"
BARO = f"{REF_DATA}/Barodiver_220427183008_BY222.csv"
PLAIN = f"{REF_DATA}/PB02A_plain.csv"


@pytest.fixture(scope="module")
def pb01a(spark):
    return read_vanessen(spark, PB01A).cache()


def test_vanessen_metadata_extraction(pb01a):
    row = pb01a.first()
    # location pattern [A-Za-z]{2}\d{2}[A-Za-z] over "PB01A_moni_AV319"
    assert row.location == "PB01A"
    # serial pattern over "..00-AV319  219."
    assert row.sensor == "AV319"


def test_vanessen_channels_and_counts(pb01a):
    per_var = {r.variable: r.cnt for r in
               pb01a.groupBy("variable").agg(F.count("*").alias("cnt")).collect()}
    assert set(per_var) == {"pressure", "temperature"}
    # equal-length channels from one data block
    assert per_var["pressure"] == per_var["temperature"]
    assert per_var["pressure"] > 15_000


def test_vanessen_tz_to_utc_and_values(pb01a):
    """File declares UTC+2; first data line is 2020/07/04 06:00:00 local."""
    first = (pb01a.filter("variable = 'pressure'").orderBy("ts").first())
    assert pd.Timestamp(first.ts) == pd.Timestamp("2020-07-04 04:00:00")
    assert first.value == pytest.approx(1242.625)
    last = (pb01a.filter("variable = 'pressure'").orderBy(F.desc("ts")).first())
    assert pd.Timestamp(last.ts) == pd.Timestamp("2022-03-30 09:00:00")
    assert last.value == pytest.approx(1284.392)


def test_vanessen_units_vocabulary(pb01a):
    units = {r.variable: r.unit for r in
             pb01a.select("variable", "unit").distinct().collect()}
    assert units == {"pressure": "cmh2o", "temperature": "degc"}


def test_vanessen_directory_scan(spark):
    """A directory of exports parses distributed, one series set per file."""
    both = read_vanessen(spark, f"{REF_DATA}/*AV319.csv")
    assert both.select("path").distinct().count() == 1
    all_exports = read_vanessen(spark, f"{REF_DATA}/*_*2.csv")  # BY222 baro
    assert all_exports.filter("location = 'Barodiver'").count() > 0


def test_plain_csv_with_kwargs(spark):
    out = read_plain(spark, PLAIN, location="PB02A", sensor="XX000").cache()
    assert out.filter("location = 'PB02A'").count() == out.count()
    first = out.filter("variable = 'pressure'").orderBy("ts").first()
    assert first.value == pytest.approx(1332.108)
    assert pd.Timestamp(first.ts) == pd.Timestamp("2020-07-04 06:00:00")
    # 14005 lines = 1 header + 14003 data + 1 END-OF-DATA footer (the same
    # line gensor drops via skipfooter=1, parse/plain.py:28)
    assert out.filter("variable = 'pressure'").count() == 14_003


def test_detect_encoding_heuristics():
    from gensor_spark.sources.csvfiles import detect_encoding

    assert detect_encoding("plain ascii header".encode()) == "utf-8"
    assert detect_encoding("Température = 12°C".encode("utf-8")) == "utf-8"
    assert detect_encoding("﻿Location = X".encode("utf-8")) == "utf-8-sig"
    assert detect_encoding("Location = X\n".encode("utf-16")) == "utf-16-le"
    assert detect_encoding("Location = X\n".encode("utf-16-be")) == "utf-16-be"
    # BOM-less utf-16 (the null-stripe heuristic)
    assert detect_encoding("Date/time,Pressure\n".encode("utf-16-le")) == "utf-16-le"
    assert detect_encoding("Date/time,Pressure\n".encode("utf-16-be")) == "utf-16-be"
    # 0x93/0x94 smart quotes exist in cp1252, are C1 controls in latin-1
    assert detect_encoding(b"Comment = \x93gr\xf6\xdfe\x94") == "cp1252"
    # bare accented latin-1 with no C1 bytes
    assert detect_encoding(b"Temp\xe9rature = 12\xb0C") == "latin-1"
    # multibyte char cut at the sniff boundary is still utf-8
    two_byte = "é".encode("utf-8")
    assert detect_encoding(b"x" * 1023 + two_byte, num_bytes=1024) == "utf-8"


@pytest.mark.parametrize("encoding", ["cp1252", "utf-16", "utf-8-sig"])
def test_vanessen_mutated_encodings_parse_identically(spark, tmp_path, encoding):
    """Reference parity for detect_encoding (gensor/parse/utils.py:112-125):
    the same Diver export re-encoded as cp1252 / UTF-16 / BOM'd UTF-8 parses
    to the same golden values as the original bytes."""
    text = open(PB01A, "rb").read().decode("utf-8")
    if encoding == "cp1252":
        # add a header line holding cp1252-only smart quotes (0x93/0x94)
        text = text.replace("Location", "Comment = “müt”\nLocation", 1)
    mutated = tmp_path / f"PB01A_{encoding}.csv"
    # the file carries a few U+FFFD mojibake chars in free-text header
    # fields; 'replace' maps them to '?' without touching the data block
    mutated.write_bytes(text.encode(encoding, errors="replace"))

    out = read_vanessen(spark, str(mutated))
    first = out.filter("variable = 'pressure'").orderBy("ts").first()
    assert first.location == "PB01A"
    assert first.sensor == "AV319"
    assert pd.Timestamp(first.ts) == pd.Timestamp("2020-07-04 04:00:00")
    assert first.value == pytest.approx(1242.625)


def test_vanessen_feeds_resample(spark, pb01a):
    """EP1 → EP2: parsed points flow straight into the engine's operators."""
    from gensor_spark.operators.resample import resample

    pts = (pb01a.filter("variable = 'pressure'")
           .select(F.col("location").alias("doc_id"),
                   F.col("sensor").alias("source"), "ts", "value"))
    hourly = resample(pts, "d", aggs="mean", dense=False)
    assert hourly.count() > 600  # ~635 days of data
