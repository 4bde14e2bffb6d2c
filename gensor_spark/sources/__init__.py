from gensor_spark.sources.synth import synth_docs, DOCS_SCHEMA
from gensor_spark.sources.tables import load_table, register_views

__all__ = ["synth_docs", "DOCS_SCHEMA", "load_table", "register_views"]
