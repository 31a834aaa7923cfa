"""Detector tests (E1–E5) against the F-MIX golden and edge fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline2_0_spark.operators.detect import detect_blocks
from tests.conftest import (
    EXPECTED_HTML_RECORDS,
    EXPECTED_JSON_RECORDS,
    EXPECTED_TEXT_RECORDS,
    GOLDEN_HTML,
)


def _detect_one(spark, doc: str):
    df = spark.createDataFrame([("d0", doc)], "doc_id string, content string")
    return detect_blocks(df).first()


def test_golden_counts(spark, golden_doc):
    row = _detect_one(spark, golden_doc)
    assert len(row["html_blocks"]) == EXPECTED_HTML_RECORDS
    assert len(row["json_blocks"]) == EXPECTED_JSON_RECORDS
    assert len(row["text_blocks"]) == EXPECTED_TEXT_RECORDS
    assert len(row["b64_blocks"]) == 0


def test_overlapping_html_patterns(spark):
    # The full <html> doc plus its inner <p> and <body> all match (FIXTURES.md).
    row = _detect_one(spark, GOLDEN_HTML)
    blocks = row["html_blocks"]
    assert len(blocks) == 3
    assert blocks[0].startswith("<html>") and blocks[0].endswith("</html>")
    assert any(b.startswith("<p>") for b in blocks)
    assert any(b.startswith("<body") for b in blocks)


def test_longest_first_removal_keeps_text_clean(spark):
    # Inner matches must not break outer-block removal: no tag fragments
    # may leak into residual text (SURVEY.md §7 wrinkle 1).
    doc = GOLDEN_HTML + "\nplain line one is long enough\n"
    row = _detect_one(spark, doc)
    assert row["text_blocks"] == ["plain line one is long enough"]


def test_invalid_json_falls_through_to_text(spark):
    # F-BADJSON: brace-balanced but unparseable → not a json record; the
    # line becomes residual text.
    doc = '{"a": unquoted}\nsome long enough text line\n'
    row = _detect_one(spark, doc)
    assert row["json_blocks"] == []
    assert '{"a": unquoted}' in row["text_blocks"]
    assert "some long enough text line" in row["text_blocks"]


def test_depth_two_json_and_array_elements(spark):
    # Depth-≤2 objects match whole; a top-level array is matched
    # object-by-object (SURVEY.md §7 wrinkle 5).
    nested = '{"a": {"b": 1}, "c": "x"}'
    arr = '[{"p": 1}, {"p": 2}]'
    row = _detect_one(spark, nested + "\n" + arr + "\n")
    assert nested in row["json_blocks"]
    assert '{"p": 1}' in row["json_blocks"]
    assert '{"p": 2}' in row["json_blocks"]
    assert nested.replace('"', "") not in row["text_blocks"]


def test_base64_detection(spark):
    # F-B64: data-URI image, data-URI text, and a bare ≥64-char token.
    # All three patterns capture the PAYLOAD (group 1, reference
    # etl_pipeline.py:93-102 re.findall semantics), so the same payload
    # appearing as an image URI, a text URI, and bare dedups to ONE entry.
    b64 = "QUJDREVGR0hJSktMTU5PUFFSU1RVVldYWVphYmNkZWZnaGlqa2xtbm9wcXJzdHV2d3h5ejAxMjM0NTY3ODk="
    doc = "\n".join(
        [
            f"data:image/png;base64,{b64}",
            f"data:text/plain;base64,{b64}",
            b64,
        ]
    )
    row = _detect_one(spark, doc)
    assert row["b64_blocks"] == [b64]


def test_base64_distinct_payloads_counted_separately(spark):
    # Different payloads stay distinct entries.
    p1 = "A" * 64
    p2 = "B" * 64
    row = _detect_one(spark, f"data:image/png;base64,{p1}\n{p2}\n")
    assert sorted(row["b64_blocks"]) == [p1, p2]


def test_dedup_is_order_preserving(spark):
    # Duplicate blocks collapse to the first occurrence, preserving order —
    # the deterministic replacement for the reference's set() dedup.
    doc = '{"x": 1}\nfiller text line here\n{"x": 1}\n{"y": 2}'
    row = _detect_one(spark, doc)
    assert row["json_blocks"] == ['{"x": 1}', '{"y": 2}']


def test_detection_is_pure_projection(spark, golden_doc):
    # Scale guard: detection must not introduce a shuffle (no Exchange in
    # the plan) — it is a per-document narrow transform.
    df = spark.createDataFrame([("d0", golden_doc)], "doc_id string, content string")
    plan = detect_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
