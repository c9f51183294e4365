from datapipeline_spark.dataset.series import encode_series_id_expr, project_series
from datapipeline_spark.dataset.sample import assemble_samples
from datapipeline_spark.dataset.scaler import apply_scaler, fit_scaler
from datapipeline_spark.dataset.split import (
    hash_split_label,
    route_folds,
    stratified_exact_split,
    time_split_label,
)
from datapipeline_spark.dataset.postprocess import (
    column_coverage,
    conform_columns,
    drop_rows_by_coverage,
    select_columns_by_coverage,
)
from datapipeline_spark.dataset.metadata import collect_series_metadata, coverage_stats
from datapipeline_spark.dataset.negatives import negative_samples

__all__ = [
    "negative_samples",
    "stratified_exact_split",
    "encode_series_id_expr",
    "project_series",
    "assemble_samples",
    "fit_scaler",
    "apply_scaler",
    "time_split_label",
    "hash_split_label",
    "route_folds",
    "column_coverage",
    "conform_columns",
    "drop_rows_by_coverage",
    "select_columns_by_coverage",
    "collect_series_metadata",
    "coverage_stats",
]
