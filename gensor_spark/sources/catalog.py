"""Per-series metadata catalog: the engine's ``read_from_sql`` lookup surface.

gensor keeps a ``__timeseries_metadata`` table and selects series by ILIKE
patterns on location/variable plus equality filters on fields inside a JSON
``extra`` column (``/root/reference/gensor/db/connection.py:94-144``,
driven from ``read_from_sql`` at ``gensor/io/read.py:83-187``). This module
is the distributed analogue:

- ``series_catalog`` derives one metadata row per series from the raw table
  (at real scale this is a maintained Iceberg side table — here it is a
  single aggregate over the events, which is also how it would be
  *bootstrapped*): key columns, time coverage, point count, and the JSON
  ``extra`` payload carried by the series' first event.
- ``catalog_filter`` applies the reference's lookup semantics: ILIKE on the
  identity columns, equality on ``get_json_object(extra, '$.field')`` —
  JSON extraction is a JVM-side Catalyst expression, no UDF.
- ``select_series`` turns the filtered catalog back into row selection via a
  broadcast LEFT SEMI join — the distributed version of gensor's
  per-series ``SELECT * FROM <table>`` loop, one scan instead of N queries.

Scale shape: the catalog is tiny relative to the data (one row per series),
so it always broadcasts; the raw scan is pruned by the semi join's pushed
keys and never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def series_catalog(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    value_col: str = "value",
    extra_col: str = "props",
    order_col: str = "event_id",
) -> DataFrame:
    """One metadata row per series: coverage, count, and the ``extra`` JSON.

    ``extra`` is the JSON payload of the series' first event (deterministic:
    ordered by ``(ts, order_col)``), mirroring how gensor stores a
    logger/installation ``extra`` blob per timeseries row
    (``gensor/db/connection.py:38-58``).
    """
    first_w = W.partitionBy(*keys).orderBy(ts_col, order_col)
    firsts = (
        events.withColumn("_rn", F.row_number().over(first_w))
        .filter(F.col("_rn") == 1)
        .select(*keys, F.col(extra_col).alias("extra"))
    )
    agg = events.groupBy(*keys).agg(
        F.min(ts_col).alias("start"),
        F.max(ts_col).alias("end"),
        F.count(value_col).alias("n_points"),
    )
    return agg.join(firsts, list(keys))


def catalog_filter(
    catalog: DataFrame,
    ilike: dict[str, str] | None = None,
    extra: dict[str, object] | None = None,
    where: Column | None = None,
) -> DataFrame:
    """gensor's metadata lookup: ILIKE patterns + JSON ``extra`` equality.

    ``ilike`` maps identity columns to SQL ILIKE patterns
    (``connection.py:114-121``); ``extra`` maps JSON field names to required
    values (``connection.py:122-131``); ``where`` admits arbitrary extra
    predicates (e.g. range filters on extracted fields).
    """
    out = catalog
    for col, pat in (ilike or {}).items():
        out = out.filter(F.col(col).cast("string").ilike(pat))
    for field, val in (extra or {}).items():
        out = out.filter(
            F.get_json_object("extra", f"$.{field}") == F.lit(str(val))
        )
    if where is not None:
        out = out.filter(where)
    return out


def select_series(
    rows: DataFrame,
    catalog: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Rows belonging to the catalog's series — broadcast semi join.

    The reference loops ``SELECT * FROM <series table>`` per catalog hit
    (``io/read.py:150-187``); distributed, the filtered catalog broadcasts
    and one scan of the raw table keeps only matching series.
    """
    return rows.join(F.broadcast(catalog.select(*keys)), list(keys), "left_semi")
