from datapipeline_spark.sketch.cm import build_cm_sketch, cm_estimate

__all__ = ["build_cm_sketch", "cm_estimate"]
