"""API-layer parity: process_payload = the reference's POST /process body."""

from __future__ import annotations

from etl_pipeline2_0_spark.api import process_payload


def test_blank_payload_rejected(spark):
    out = process_payload(spark, "   \n ")
    assert out == {"success": False, "error": "Empty input data"}


def test_payload_roundtrip(spark):
    payload = (
        '{"name": "Widget", "price": 9.99, "tags": ["a", "b"]}\n'
        "a plain text line long enough to keep\n"
    )
    out = process_payload(spark, payload)
    assert out["success"] is True
    json_rows = [r for r in out["data"] if r["type"] == "json"]
    text_rows = [r for r in out["data"] if r["type"] == "text"]
    assert len(json_rows) == 1 and len(text_rows) == 1
    row = json_rows[0]
    assert row["name"] == "Widget" and row["price"] == 9.99
    assert row["tags"] == ["a", "b"]          # lists pass through (app.py:105)
    assert text_rows[0]["name"] is None        # NaN -> None (app.py:110)
    assert out["types"]["tags"] == "array"     # app.py:85 semantics
    assert out["types"]["price"] == "number"
    assert out["types"]["type"] == "string"
    assert all(r["total_items"] == 2 for r in out["data"])
    assert "name" in out["schema"]
