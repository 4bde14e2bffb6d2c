from gensor_spark.plans.bucketing import read_bucketed, write_bucketed
from gensor_spark.plans.incremental import TierPipeline

__all__ = ["TierPipeline", "read_bucketed", "write_bucketed"]
