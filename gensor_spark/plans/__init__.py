from gensor_spark.plans.bucketing import read_bucketed, write_bucketed
from gensor_spark.plans.incremental import TierPipeline, read_range

__all__ = ["TierPipeline", "read_range", "read_bucketed", "write_bucketed"]
