from datapipeline_spark.io.writers import (
    compact_files,
    materialize,
    run_output_path,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
    write_pickle,
    write_stdout,
)

__all__ = [
    "write_jsonl",
    "write_csv",
    "write_parquet",
    "write_orc",
    "compact_files",
    "write_pickle",
    "write_stdout",
    "materialize",
    "run_output_path",
]
