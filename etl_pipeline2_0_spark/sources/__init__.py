from etl_pipeline2_0_spark.sources.documents import (
    documents_from_strings,
    read_documents,
    read_documents_stream,
)
from etl_pipeline2_0_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "read_documents",
    "read_documents_stream",
    "documents_from_strings",
    "load_table",
    "load_tables",
    "TABLES",
]
