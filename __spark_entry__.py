"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship 1h tier rollup on sf0.001;
``queries()``/``oracle_sql()`` enumerate the implemented operators from
SURVEY.md §2, each checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 1h retention-tier rollup (count/min/max/mean/last) on sf0.001."""
    from gensor_spark.queries import _q_rollup

    return _q_rollup("1h")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gensor_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gensor_spark.queries import ORACLES

    return dict(ORACLES)
