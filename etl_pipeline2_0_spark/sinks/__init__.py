from etl_pipeline2_0_spark.sinks.load import (
    load_outputs,
    write_csv,
    write_metadata_json,
    write_rowstore,
    write_schema_json,
)

__all__ = [
    "load_outputs",
    "write_csv",
    "write_schema_json",
    "write_metadata_json",
    "write_rowstore",
]
