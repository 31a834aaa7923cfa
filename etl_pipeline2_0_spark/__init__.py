"""etl_pipeline2_0_spark — a PySpark-native analytics engine with the
capabilities of the reference project Riya17171/ETL-PIPELINE2.0.

The reference (see SURVEY.md) is a single-process pandas ETL pipeline that
ingests mixed-format text documents (HTML + JSON + plain text + base64
interleaved in one file), detects/extracts each content type, flattens JSON,
infers a dynamic schema, normalizes to one rectangular table, and loads to
CSV/JSON/row-store sinks, with batch / watch / HTTP entry points.

This package re-expresses every one of those capabilities Spark-first:

- ``sources``    — whole-file text reads (batch + Structured Streaming),
                   testdata table loaders.
- ``operators``  — content detection (E1–E5), record extraction (E6–E11),
                   normalization (P1–P3, U1, W1, F9) and the dynamic schema
                   report (A4).  All native DataFrame expressions; no UDF in
                   the hot path.
- ``sinks``      — CSV / schema-JSON / metadata-JSON / row-store (S5–S8).
- ``functions``  — scale extensions: text analysis, dedup (exact, MinHash-LSH,
                   SimHash, n-gram Jaccard), embedding similarity search,
                   multimodal binary-column plumbing.
- ``plans``      — relational capability queries over the TPC-H-ish testdata.
- ``streaming``  — watch mode as a Structured Streaming file source.
"""

from etl_pipeline2_0_spark.session import get_spark

__all__ = ["get_spark"]
