"""Content-type detection (reference operators E1–E5, SURVEY.md §2.2).

Reference behavior being re-expressed (citations into /root/reference):

- E1 ``detect_content_types``  etl_pipeline.py:57-115 — partition a document
  into ``{html, json, text, base64}`` block lists via ordered regex passes.
- E2 HTML block detector       etl_pipeline.py:66-79 — five DOTALL+IGNORECASE
  patterns, deduplicated.
- E3 JSON detector+validator   etl_pipeline.py:81-90 — depth-≤2 brace-balanced
  candidates, then a parse-validity filter, order-preserving dedup.
- E4 Base64 detector           etl_pipeline.py:92-102 — data-URI image/text
  forms plus a generic ≥64-char token (never decoded).
- E5 Residual-text splitter    etl_pipeline.py:104-113 — delete every detected
  HTML/JSON block from the document, split on newlines, keep trimmed lines
  longer than 5 chars.

Everything here is a native Spark expression — ``regexp_extract_all``,
``array_distinct``, ``try_parse_json``, higher-order ``aggregate`` /
``filter`` / ``transform`` — so detection runs inside whole-stage codegen
with zero Python in the loop, and filters/pruning push down around it.

Deterministic-semantics decision (SURVEY.md §7 wrinkle 1): the reference
dedups with ``set()`` and removes blocks in set-iteration order, which is
nondeterministic across processes and lets an inner overlapping HTML match
break the outer match's removal.  We pin the deterministic variant:
first-seen pattern-major order for dedup, and longest-first removal for the
residual-text step (outer blocks removed before inner ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# E2 — five overlapping HTML patterns, case-insensitive + DOTALL via inline
# flags (Java regex dialect; `(?is)` matches Python's re.I | re.S).
HTML_PATTERNS = [
    r"(?is)<html[^>]*>.*?</html>",
    r"(?is)<!DOCTYPE[^>]*>.*?</html>",
    r"(?is)<div[^>]*>.*?</div>",
    r"(?is)<p[^>]*>.*?</p>",
    r"(?is)<body[^>]*>.*?</body>",
]

# E3 — brace-balanced JSON object candidates up to nesting depth 2.  Objects
# nested deeper are not matched whole; top-level arrays are matched
# object-by-object (faithful to the reference's documented behavior).
JSON_CANDIDATE_PATTERN = r"\{(?:[^{}]|(?:\{[^{}]*\}))*\}"

# E4 — base64 forms: image data-URI, text data-URI, generic long token.  The
# reference's patterns (etl_pipeline.py:93-97) carry a capture group and go
# through re.findall, which returns GROUP 1 — i.e. the data-URI forms emit
# the bare payload, not the whole `data:...` match — so the payload of a
# data-URI also matched by the generic ≥64-char pattern dedups to ONE entry.
# We extract group 1 to match those observable counts.  The generic pattern
# intentionally false-positives on any 64+-char base64-ish token, matching
# the reference's behavior.
BASE64_PATTERNS = [
    r"data:image/[^;]+;base64,([A-Za-z0-9+/=]+)",
    r"data:text/[^;]+;base64,([A-Za-z0-9+/=]+)",
    r"([A-Za-z0-9+/]{64,}={0,2})",
]

MIN_TEXT_LINE_LEN = 5  # P4: keep residual lines with len(trim(x)) > 5


def _extract_all_distinct(col: Column, patterns: list[str]) -> Column:
    """All matches of every pattern, first-seen-order deduplicated.

    ``array_distinct`` keeps first occurrence — the deterministic replacement
    for the reference's order-destroying ``list(set(...))``.
    """
    arrays = [F.regexp_extract_all(col, F.lit(p), F.lit(0)) for p in patterns]
    combined = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
    return F.array_distinct(combined)


def html_blocks(doc: Column) -> Column:
    """E2: array of detected HTML block strings."""
    return _extract_all_distinct(doc, HTML_PATTERNS)


def json_blocks(doc: Column) -> Column:
    """E3: array of *valid* JSON object strings (candidates that parse).

    Validity via ``try_parse_json`` (Spark 4 variant parser) — the native
    equivalent of the reference's ``json.loads`` try/except filter; invalid
    candidates fall through to the text residual.
    """
    candidates = _extract_all_distinct(doc, [JSON_CANDIDATE_PATTERN])
    return F.filter(candidates, lambda x: F.try_parse_json(x).isNotNull())


def base64_blocks(doc: Column) -> Column:
    """E4: array of detected base64 payloads (detection only, never decoded).

    Extracts capture group 1 of each pattern — the payload — mirroring the
    reference's ``re.findall`` group semantics (etl_pipeline.py:93-102), so
    a data-URI payload and the same token caught by the generic pattern
    count once after dedup.
    """
    arrays = [F.regexp_extract_all(doc, F.lit(p), F.lit(1)) for p in BASE64_PATTERNS]
    return F.array_distinct(F.concat(*arrays))


def text_lines(doc: Column, html: Column, json_: Column) -> Column:
    """E5: residual text lines after removing every detected HTML/JSON block.

    Blocks are removed longest-first so outer blocks are deleted before the
    inner overlapping matches they contain — the pinned deterministic fix for
    the reference's set-order removal (SURVEY.md §7 wrinkle 1).
    """
    blocks = F.concat(html, json_)
    longest_first = F.array_sort(
        blocks,
        lambda l, r: F.when(F.length(l) > F.length(r), F.lit(-1))
        .when(F.length(l) < F.length(r), F.lit(1))
        .otherwise(F.lit(0)),
    )
    residual = F.aggregate(longest_first, doc, lambda acc, b: F.replace(acc, b, F.lit("")))
    trimmed = F.transform(F.split(residual, "\n"), lambda x: F.trim(x))
    return F.filter(trimmed, lambda x: F.length(x) > MIN_TEXT_LINE_LEN)


def detect_blocks(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """E1: add per-kind block arrays to a one-row-per-document DataFrame.

    Input: any DataFrame with a string ``content_col``.  Output adds
    ``html_blocks``, ``json_blocks``, ``b64_blocks``, ``text_blocks``
    (all ``array<string>``).  Runs as pure codegen'd expressions: one narrow
    projection, no shuffle, scales linearly with document count.
    """
    doc = F.col(content_col)
    out = docs.withColumns(
        {
            "html_blocks": html_blocks(doc),
            "json_blocks": json_blocks(doc),
            "b64_blocks": base64_blocks(doc),
        }
    )
    return out.withColumn(
        "text_blocks", text_lines(doc, F.col("html_blocks"), F.col("json_blocks"))
    )
