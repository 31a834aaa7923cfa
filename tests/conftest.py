"""Shared pytest fixtures: one SparkSession per test session, golden fixtures.

The golden mixed-format document below is OUR OWN fixture, authored to the
F-MIX specification in FIXTURES.md (1 HTML doc whose overlapping detector
patterns yield 3 html records, 9 JSON objects across 4 record schemas, 15
qualifying plain-text lines, 0 base64) — not a copy of the reference's
sample file.  Expected goldens: 27 normalized rows, total_items=27,
17 table columns, 18 schema-report fields.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")

TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_pipeline2_0_spark.session import get_spark

    spark = get_spark(app_name="etl-pipeline2.0-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA_SF


# --- F-MIX golden document (FIXTURES.md) ------------------------------------

GOLDEN_HTML = (
    "<html><head><title>Company Dashboard</title></head>"
    "<body><h1>Quarterly Overview</h1>"
    "<p>Numbers for the fourth quarter are tracked below.</p>"
    '<a href="https://example.test/report">Full report</a></body></html>'
)

GOLDEN_JSON_LINES = [
    '{"employee_id": 101, "name": "Dana Fox", "department": "Engineering", "salary": 85000}',
    '{"employee_id": 102, "name": "Sam Reed", "department": "Marketing", "salary": 67000}',
    '{"employee_id": 103, "name": "Kim Park", "department": "Engineering", "salary": 92000}',
    '{"project": "AI Analytics", "status": "in_progress", "completion": 0.75, "team_size": 12}',
    '{"project": "Data Lake", "status": "planned", "completion": 0.1, "team_size": 5}',
    '{"maintenance_id": "M001", "type": "scheduled", "duration_hours": 2, "impact": "high"}',
    '{"budget_category": "Engineering", "amount": 500000, "quarter": "Q4"}',
    '{"budget_category": "Marketing", "amount": 150000, "quarter": "Q4"}',
    '{"budget_category": "Operations", "amount": 220000, "quarter": "Q4"}',
]

GOLDEN_TEXT_LINES = [
    "Quarterly report notes for internal review.",
    "Engineering headcount grew by six people.",
    "Marketing launched two campaigns this quarter.",
    "Operations reduced cloud spend by twelve percent.",
    "The data platform migration finished on schedule.",
    "Customer satisfaction scores improved again.",
    "Hiring pipeline remains strong across teams.",
    "Infrastructure costs are tracked weekly now.",
    "Security audit completed with no critical findings.",
    "The annual offsite is planned for early spring.",
    "Vendor contracts were renegotiated in October.",
    "New analytics dashboards shipped to all teams.",
    "Employee onboarding time dropped to five days.",
    "Documentation coverage reached ninety percent.",
    "Next planning cycle starts in two weeks.",
]

# Interleave like a real mixed export: html, then json groups separated by
# text paragraphs.  Short filler lines (≤5 chars trimmed) must NOT become
# text records.
GOLDEN_DOCUMENT = "\n".join(
    [GOLDEN_HTML, ""]
    + GOLDEN_JSON_LINES[:3]
    + [""]
    + GOLDEN_TEXT_LINES[:4]
    + ["ok", "--"]  # too short → dropped by the >5-char filter
    + GOLDEN_JSON_LINES[3:5]
    + GOLDEN_TEXT_LINES[4:7]
    + [GOLDEN_JSON_LINES[5]]
    + GOLDEN_TEXT_LINES[7:11]
    + GOLDEN_JSON_LINES[6:9]
    + GOLDEN_TEXT_LINES[11:15]
)

EXPECTED_HTML_RECORDS = 3  # full <html>…</html> + inner <p>…</p> + <body>…</body>
EXPECTED_JSON_RECORDS = 9
EXPECTED_TEXT_RECORDS = 15
EXPECTED_ROWS = EXPECTED_HTML_RECORDS + EXPECTED_JSON_RECORDS + EXPECTED_TEXT_RECORDS

# 14 data fields: F-EMP(4) + F-PROJ(4) + F-MAINT(3: `type` key is overwritten
# by the engine tag) + F-BUDGET(3)
EXPECTED_DATA_FIELDS = sorted(
    [
        "employee_id", "name", "department", "salary",
        "project", "status", "completion", "team_size",
        "maintenance_id", "duration_hours", "impact",
        "budget_category", "amount", "quarter",
    ]
)
EXPECTED_TABLE_COLUMNS = ["type", "source_index", "total_items"] + EXPECTED_DATA_FIELDS


@pytest.fixture(scope="session")
def golden_doc() -> str:
    return GOLDEN_DOCUMENT
