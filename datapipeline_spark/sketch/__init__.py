from datapipeline_spark.sketch.cm import build_cm_sketch, cm_estimate, cm_inner_product
from datapipeline_spark.sketch.mg import heavy_hitters, mg_candidates
from datapipeline_spark.sketch.hll import (
    corrected_estimate,
    hll_estimate,
    hll_merge,
    hll_overlap,
    hll_registers,
)

__all__ = [
    "build_cm_sketch",
    "cm_estimate",
    "cm_inner_product",
    "heavy_hitters",
    "mg_candidates",
    "corrected_estimate",
    "hll_estimate",
    "hll_merge",
    "hll_overlap",
    "hll_registers",
]
