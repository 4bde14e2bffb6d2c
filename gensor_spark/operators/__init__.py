from gensor_spark.operators.points import (
    docs_to_points,
    points_to_docs,
    events_to_points,
    POINTS_COLUMNS,
)
from gensor_spark.operators.resample import resample, FREQ_SECONDS
from gensor_spark.operators.rollup import rollup_tier, cascade_tier, finalize_tier

__all__ = [
    "docs_to_points",
    "points_to_docs",
    "events_to_points",
    "POINTS_COLUMNS",
    "resample",
    "FREQ_SECONDS",
    "rollup_tier",
    "cascade_tier",
    "finalize_tier",
]
