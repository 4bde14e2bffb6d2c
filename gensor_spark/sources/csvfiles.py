"""Distributed van Essen Diver / plain CSV ingestion (gensor EP1, Spark-first).

The reference parses one file at a time in-process (`gensor/io/read.py:22-80`,
`gensor/parse/vanessen.py:15-119`, `gensor/parse/plain.py:11-61`). The
distributed shape: ``spark.read.text(paths, wholetext=True)`` gives one row
per file (these exports are small — the scale axis is *many files*), and the
per-file imperative parsing (header fields, regex metadata, data-block
slicing, delimiter sniffing, timezone fixing) runs as an Arrow-batched
``mapInPandas`` over (path, text) rows — many files per Python crossing,
embarrassingly parallel, no driver involvement.

Semantics mirrored from the reference:
- labelled ``key = value`` header fields, first occurrence wins
  (`parse/utils.py:81-109`);
- location / serial-number / timezone extracted from their *fields* with the
  reference's default patterns, falling back to the verbatim field value
  (`parse/vanessen.py:40-80`);
- data block sliced between the ``Date/time`` line and ``END OF DATA FILE``
  (end marker optional), delimiter sniffed from {',', ';', tab}
  (`parse/utils.py:21-59`);
- naive timestamps localized to the file's ``UTC±n`` zone then converted to
  UTC (`parse/utils.py:128-143`);
- channel columns become long rows ``(location, sensor, ts, variable, unit,
  value)`` with the reference's variable/unit vocabulary (`config.py:10-17`).

Encoding: chardet isn't available in this container; ``detect_encoding``
replicates its behavior on the encodings Diver exports occur in (BOMs,
utf-16 null stripes, utf-8 trial, cp1252-vs-latin-1 codepage discrimination
— covers the cp1252 ``°C`` in the wild samples). ``spark.read.text`` assumes
UTF-8, so the binary-faithful route used here is
``spark.read.format('binaryFile')``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

POINT_SCHEMA = (
    "path string, location string, sensor string, ts timestamp, "
    "variable string, unit string, value double"
)

#: reference defaults (gensor/parse/vanessen.py:40-47)
SERIAL_RE = r"[A-Za-z]{1,2}\d{3,4}"
LOCATION_RE = r"[A-Za-z]{2}\d{2}[A-Za-z]{1}|Barodiver"
TZ_RE = r"UTC[+-]?\d+"

#: gensor/config.py:10-17 vocabulary
VARIABLE_UNITS = {
    "pressure": "cmh2o",
    "temperature": "degc",
    "conductivity": "ms-cm",
}

_HEADER_FIELD_RE = re.compile(r"^\s{0,4}([A-Za-z][A-Za-z /.]*?)\s*[=:]\s*(.+?)\s*$")


_BOMS = (
    # utf-32 BOMs are supersets of the utf-16 ones — test first
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def detect_encoding(raw: bytes, num_bytes: int = 1024) -> str:
    """Sniff the encoding from the first ``num_bytes`` bytes.

    Parity target: the reference's chardet call
    (``/root/reference/gensor/parse/utils.py:112-125``) on the encodings
    Diver exports actually appear in — utf-8 (± BOM), utf-16 (Windows
    logger software), cp1252/latin-1 (accented site names). Heuristics, in
    order: explicit BOMs; the utf-16 null-byte stripe (ASCII text in utf-16
    puts a NUL in every other byte — with no BOM a strict utf-8 decode would
    "succeed" on it, so this must come first); strict utf-8 trial; else an
    8-bit codepage — cp1252 when any byte falls in 0x80-0x9f (printable
    there, C1 controls in latin-1), latin-1 otherwise.
    """
    head = raw[:num_bytes]
    for bom, enc in _BOMS:
        if head.startswith(bom):
            return enc
    if len(head) >= 4:
        even_nul = head[::2].count(0) / max(len(head[::2]), 1)
        odd_nul = head[1::2].count(0) / max(len(head[1::2]), 1)
        if odd_nul > 0.3 and even_nul < 0.05:
            return "utf-16-le"
        if even_nul > 0.3 and odd_nul < 0.05:
            return "utf-16-be"
    try:
        head.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError as e:
        if e.start >= len(head) - 3:
            return "utf-8"  # multibyte sequence cut at the sniff boundary
    if any(0x80 <= b <= 0x9F for b in head):
        return "cp1252"
    return "latin-1"


def _decode(raw: bytes) -> str:
    enc = detect_encoding(raw)
    try:
        # utf-16-le/be decode the BOM itself to U+FEFF — strip it
        return raw.decode(enc).lstrip("\ufeff")
    except UnicodeDecodeError:
        # sniff was over the first 1KB only; never fail outright
        return raw.decode("latin-1")


def _header_fields(text: str) -> dict[str, str]:
    """Labelled header fields, first occurrence wins; stop at the data block."""
    fields: dict[str, str] = {}
    for line in text.splitlines():
        if line.lstrip().startswith("Date/time"):
            break
        m = _HEADER_FIELD_RE.match(line)
        if m:
            key = m.group(1).strip()
            fields.setdefault(key, m.group(2).strip())
    return fields


def _pick(pattern: str, raw: str | None) -> str | None:
    if not raw:
        return None
    m = re.search(pattern, raw)
    return m.group() if m else raw


def _sniff_delim(line: str) -> str:
    counts = {d: line.count(d) for d in (",", ";", "\t")}
    return max(counts, key=counts.get)


def _data_block(text: str) -> tuple[list[str], list[str]]:
    """(column header cells, data lines) between Date/time and END OF DATA."""
    lines = text.splitlines()
    start = next(
        (i for i, ln in enumerate(lines) if ln.lstrip().startswith("Date/time")),
        None,
    )
    if start is None:
        return [], []
    end = next(
        (i for i in range(start + 1, len(lines))
         if lines[i].startswith("END OF DATA FILE")),
        len(lines),
    )
    delim = _sniff_delim(lines[start])
    header = [c.strip() for c in lines[start].split(delim)]
    data = [ln for ln in lines[start + 1 : end] if ln.strip()]
    return header, data


def _variable_of(col_header: str) -> tuple[str, str]:
    name = re.split(r"[\[(]", col_header, 1)[0].strip().lower()
    unit = VARIABLE_UNITS.get(name, "unknown")
    return name, unit


def _tz_offset_hours(tz_string: str | None) -> int:
    if not tz_string:
        return 0
    m = re.search(r"UTC([+-]?\d+)", tz_string)
    return int(m.group(1)) if m else 0


def _parse_one(path: str, text: str) -> pd.DataFrame | None:
    fields = _header_fields(text)
    location = _pick(LOCATION_RE, fields.get("Location"))
    sensor = _pick(SERIAL_RE, fields.get("Serial number"))
    tz_off = _tz_offset_hours(_pick(TZ_RE, fields.get("Instrument number")))

    header, data = _data_block(text)
    if not data:
        return None
    delim = _sniff_delim(data[0])
    cells = [ln.split(delim) for ln in data]
    ncol = len(header) if header else len(cells[0])
    frames = []
    ts = pd.to_datetime([c[0].strip() for c in cells], format="%Y/%m/%d %H:%M:%S",
                        errors="coerce")
    ts = ts - pd.Timedelta(hours=tz_off)  # localize file tz → UTC
    for j in range(1, ncol):
        col_name = header[j] if j < len(header) else f"col{j}"
        variable, unit = _variable_of(col_name)
        vals = pd.to_numeric(
            [c[j].strip() if j < len(c) else None for c in cells], errors="coerce"
        )
        frames.append(pd.DataFrame({
            "path": path,
            "location": location,
            "sensor": sensor,
            "ts": ts,
            "variable": variable,
            "unit": unit,
            "value": vals,
        }))
    out = pd.concat(frames, ignore_index=True)
    return out[out["ts"].notna()]


def read_vanessen(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of Diver-Office exports → long point DataFrame.

    One task per file group; all parsing Arrow-batched. Output is the long
    point view keyed by (location=doc_id-like, sensor) — feed it straight to
    the resample/compensation operators.
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p, raw in zip(pdf["path"], pdf["content"]):
                parsed = _parse_one(p, _decode(bytes(raw)))
                if parsed is not None:
                    outs.append(parsed)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return files.mapInPandas(parse, schema=POINT_SCHEMA)


def read_plain(spark: SparkSession, path: str, location: str | None = None,
               sensor: str | None = None, timezone: str = "UTC") -> DataFrame:
    """Headerless-metadata CSV (gensor `parse_plain`): caller supplies
    location/sensor (the reference takes them as kwargs too). The data-block
    parser is shared — a plain file is a data block starting at line one."""
    from pyspark.sql import functions as F

    out = read_vanessen(spark, path)
    if location is not None:
        out = out.withColumn("location", F.coalesce("location", F.lit(location)))
    if sensor is not None:
        out = out.withColumn("sensor", F.coalesce("sensor", F.lit(sensor)))
    off = _tz_offset_hours(timezone)
    if off:
        out = out.withColumn(
            "ts", F.col("ts") - F.expr(f"INTERVAL {off} HOURS")
        )
    return out
