"""SQL-callable function surface (SURVEY.md §2.10).

The reference has no user extensibility — every transform is a hard-coded
method.  The rebuild CREATES that surface: the engine's scalar functions are
registered as SQL scalar UDFs (``CREATE TEMPORARY FUNCTION ... RETURN
<expression>``), so a SQL-only user can call ``word_count(text)`` or
``lang_id(text)`` from ``spark.sql`` with zero Python on the executor path —
the bodies are pure Catalyst expressions, inlined and codegen'd like any
built-in.

``tests/test_sql_registry.py`` pins each SQL function ≡ its DataFrame-API
twin in ``functions.text`` / ``operators.extract``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_pipeline2_0_spark.functions.text import EN_STOPWORDS, LANG_MARKERS

_WORD_COUNT_BODY = r"size(filter(split({s}, '\\s+'), t -> length(t) > 0))"

_TOKENS_BODY = r"filter(split(lower({s}), '\\W+'), t -> length(t) > 0)"


def _lang_id_body(s: str) -> str:
    scores = {
        lang: (
            rf"size(regexp_extract_all(lower({s}), "
            rf"'\\b({'|'.join(markers)})\\b', 0))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(scores.values())})"
    case = f"CASE WHEN {best} = 0 THEN 'und' "
    for lang in ("en", "es", "fr", "de"):
        case += f"WHEN {scores[lang]} = {best} THEN '{lang}' "
    return case + "END"


def _stopword_ratio_body(s: str) -> str:
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = _TOKENS_BODY.format(s=s)
    return (
        f"CASE WHEN size({toks}) = 0 THEN 0.0 ELSE "
        f"size(filter({toks}, t -> t IN ({stops}))) / size({toks}) END"
    )


FUNCTIONS: dict[str, str] = {
    # name: (signature, body) rendered below
    "word_count": (
        "(s STRING) RETURNS INT RETURN " + _WORD_COUNT_BODY.format(s="s")
    ),
    "title_of": "(s STRING) RETURNS STRING RETURN substring(s, 1, 50)",
    "fingerprint": "(s STRING) RETURNS STRING RETURN md5(s)",
    "lang_id": "(s STRING) RETURNS STRING RETURN " + _lang_id_body("s"),
    "punct_ratio": (
        "(s STRING) RETURNS DOUBLE RETURN "
        r"CASE WHEN length(regexp_replace(s, '\\s+', '')) = 0 THEN 0.0 "
        r"ELSE (length(regexp_replace(s, '\\s+', '')) - "
        r"length(regexp_replace(regexp_replace(s, '\\s+', ''), '\\W', ''))) "
        r"/ length(regexp_replace(s, '\\s+', '')) END"
    ),
    "stopword_ratio": (
        "(s STRING) RETURNS DOUBLE RETURN " + _stopword_ratio_body("s")
    ),
    "html_title": (
        "(s STRING) RETURNS STRING RETURN "
        r"trim(regexp_extract(s, '(?is)<title[^>]*>(.*?)</title>', 1))"
    ),
    "strip_html": (
        "(s STRING) RETURNS STRING RETURN "
        r"regexp_replace(regexp_replace(s, "
        r"'(?is)<(script|style)[^>]*>.*?</\\1>', ' '), '(?s)<[^>]+>', ' ')"
    ),
    "source_index": (
        "(kind STRING, idx INT) RETURNS STRING RETURN concat_ws('_', kind, idx)"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine scalar as a session-scoped SQL function.

    Returns the registered names (for discovery/HELP surfaces).
    """
    for name, rest in FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{rest}")
    return list(FUNCTIONS)
