"""CSV-sink rendering parity: ``_csv_safe`` vs Python's repr of a list,
which is what the reference's pandas ``to_csv`` emits for list cells
(reference etl_pipeline.py:289-292)."""

from __future__ import annotations

from etl_pipeline2_0_spark.sinks.load import _csv_safe


def _render(spark, value, ddl):
    df = spark.createDataFrame([(value,)], f"v {ddl}")
    return _csv_safe(df).collect()[0]["v"]


def test_csv_safe_matches_python_repr_for_plain_strings(spark):
    vals = ["a", "b c", ""]
    assert _render(spark, vals, "array<string>") == repr(vals)


def test_csv_safe_renders_null_elements_as_none(spark):
    # concat_ws silently DROPPED null elements before; pandas prints None.
    assert _render(spark, ["a", None, "b"], "array<string>") == repr(
        ["a", None, "b"]
    )
    assert _render(spark, [1, None, 3], "array<int>") == repr([1, None, 3])


def test_csv_safe_escapes_quotes_like_repr(spark):
    for vals in (
        ["it's"],                 # repr switches to double quotes
        ['say "hi"'],             # double quotes → single-quoted wrapper
        ["both ' and \""],        # both → single-quoted, ' escaped
        ["back\\slash"],          # backslash escaped
    ):
        assert _render(spark, vals, "array<string>") == repr(vals)


def test_csv_safe_renders_booleans_python_style(spark):
    assert _render(spark, [True, False, None], "array<boolean>") == repr(
        [True, False, None]
    )


def test_csv_safe_null_array_stays_null(spark):
    assert _render(spark, None, "array<string>") is None


def test_write_shards_caps_records_per_file(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from etl_pipeline2_0_spark.sinks.load import write_shards

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = str(tmp_path / "shards")
    write_shards(df, out, max_records_per_file=128, order_cols=["doc_id"])
    files = sorted(glob.glob(out + "/*.parquet"))
    assert files, "no shard files written"
    sizes = [pq.read_metadata(f).num_rows for f in files]
    assert all(s <= 128 for s in sizes), sizes
    assert sum(sizes) == 1000
    # rows inside each shard are ordered (sortWithinPartitions applied)
    for f in files[:3]:
        col = pq.read_table(f, columns=["doc_id"]).column(0).to_pylist()
        assert col == sorted(col)
