from datapipeline_spark.streaming.ops import (
    cadence_assembly_stream,
    dedupe_stream,
    expectations_sink,
    idempotent_batch_sink,
    interval_join_stream,
    near_dup_filter_stream,
    profile_stream,
    use_rocksdb_state_store,
    rolling_mean_stream,
    sessionize_stream,
    sequence_windows_stream,
    stream_jsonl_source,
)

__all__ = [
    "cadence_assembly_stream",
    "dedupe_stream",
    "expectations_sink",
    "idempotent_batch_sink",
    "interval_join_stream",
    "near_dup_filter_stream",
    "profile_stream",
    "use_rocksdb_state_store",
    "rolling_mean_stream",
    "sessionize_stream",
    "sequence_windows_stream",
    "stream_jsonl_source",
]
