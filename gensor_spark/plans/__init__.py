from gensor_spark.plans.incremental import TierPipeline

__all__ = ["TierPipeline"]
