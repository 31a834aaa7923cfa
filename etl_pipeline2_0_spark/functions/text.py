"""Text analysis for large-scale training-data pipelines.

Beyond-reference extensions (mandated by the build brief): language ID,
quality scoring, token counting, document fingerprinting — each a pure
native-expression column function over a string column, so the whole suite
runs inside whole-stage codegen at scan speed.  Designed for the
``documents`` table (``doc_id, text, lang, source, n_chars``) but applicable
to any string column.

The reference's own text surface (F1/F2/F3 whitespace tokenize, trim/length,
substring — etl_pipeline.py:112,124,157-158) is subsumed by ``token_count``
and ``title_of``.

Every function here has an exact ANSI-SQL twin used by the DuckDB oracle
(see ``__spark_entry__.oracle_sql``), so semantics are pinned cross-engine:
word chars are ASCII ``\\w``, tokens are lowercased ``\\W+`` splits with
empties removed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic.  ASCII-only on purpose: identical regex semantics in Java
# (Spark) and RE2 (DuckDB).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una"],
    "fr": ["le", "la", "les", "des", "et", "que", "dans", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "eine", "mit", "zu"],
}

EN_STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column) -> Column:
    """Lowercased word tokens: split on non-word runs, empties removed."""
    return F.filter(
        F.split(F.lower(col), r"\W+"), lambda t: F.length(t) > 0
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (reference A3 semantics: ``len(s.split())``).

    ``trim``+``split`` is NOT equivalent: SQL TRIM strips only spaces (not
    ``\\n``/``\\t``), and splitting a whitespace-edged string yields empty
    edge tokens — both found by the hypothesis property test.  Filtering
    empties reproduces Python's no-arg ``split`` exactly.
    """
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0))


def title_of(col: Column, max_len: int = 50) -> Column:
    """Reference E9: first ``max_len`` chars as a display title."""
    return F.substring(col, 1, max_len)


def _marker_hits(col: Column, markers: list[str]) -> Column:
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-marker hit counts."""
    return {lang: _marker_hits(col, m) for lang, m in LANG_MARKERS.items()}


def lang_id(col: Column) -> Column:
    """Predicted language: argmax of marker hits, 'und' when all zero.

    Deterministic tiebreak: fixed language order en > es > fr > de (first
    max wins), mirrored exactly in the oracle SQL's CASE chain.
    """
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # Build the CASE from the last language backwards so earlier languages
    # win ties (first-max-wins in en, es, fr, de order).
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def punct_ratio(col: Column) -> Column:
    """Fraction of non-space characters that are not word characters."""
    compact = F.regexp_replace(col, r"\s+", "")
    n = F.length(compact)
    word_chars = F.length(F.regexp_replace(compact, r"\W", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - word_chars) / n)


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are English stopword markers."""
    toks = tokens(col)
    stops = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in EN_STOPWORDS]))
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(stops / F.size(toks))


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total / F.size(toks))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards normal-length tokens and a
    sane stopword share, penalizes punctuation soup.  A simple, fully
    SQL-expressible stand-in for trained quality classifiers."""
    length_term = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    return F.round((length_term + stop_term + punct_term) / 3, 6)


def winnow_fingerprints(col: Column, k: int = 8, window: int = 4) -> Column:
    """Winnowing document fingerprints (the rolling-hash scheme from
    Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS fingerprint): hash
    every character k-gram, slide a window of ``window`` hashes, keep each
    window's minimum, dedupe.

    Guarantees: any shared substring of length ≥ k+window-1 between two
    documents yields ≥1 shared fingerprint, and fingerprint density is
    ~2/(window+1) of the k-grams — a tunable sketch whose size tracks
    document length, not corpus size.  Pure native expressions: the whole
    computation is one codegen'd projection, no shuffle, no UDF.
    """
    n_grams = F.greatest(F.length(col) - F.lit(k - 1), F.lit(0))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: F.xxhash64(F.substring(col, F.lit(0) + i, k)),
    )
    n_windows = F.greatest(n_grams - F.lit(window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(gram_hashes, j, window)),
    )
    return F.when(n_grams == 0, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(mins)
    )


def fingerprint_md5(col: Column) -> Column:
    """Exact-content fingerprint (byte-identical across engines)."""
    return F.md5(col)


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-approximating token estimate: word tokens + digit runs +
    punctuation marks each count; long words count ceil(len/6) subwords.
    Cheap, deterministic, SQL-mirrorable — useful for budget estimation."""
    toks = tokens(col)
    subwords = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(6.0)).cast("int"),
    )
    punct = F.length(F.regexp_replace(col, r"[\w\s]", ""))
    return subwords + punct


# ------------------------------------------------------------ PII scrub -----

# Patterns chosen to behave identically under Java regex (Spark) and RE2
# (DuckDB/production scrubbers): no backrefs, no lookaround.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails, phone numbers, and IPv4 addresses with typed tags.

    Order matters: emails first (their local parts can contain digits and
    dots that the narrower patterns would partially eat).  Pure
    ``regexp_replace`` chain — JVM-side, no UDF, scales linearly.
    """
    out = col
    for pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def repetition_stats(df, text_col: str, id_col: str):
    """Per-document token-repetition signals for quality filtering.

    Returns (id, n_tokens, n_distinct, rep_ratio, top_share): rep_ratio is
    the fraction of tokens that are repeats of an earlier token;
    top_share the share of the single most frequent token.  High values
    flag boilerplate/spam — a standard pretraining-corpus filter.

    Scale: explode → two hash aggregates keyed on (id, token) then (id);
    partials combine map-side, so the shuffle carries per-doc distinct
    tokens, not the raw token stream.
    """
    per_tok = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_tok.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("c").cast("double")
        ).alias("rep_ratio"),
        (F.max("c") / F.sum("c").cast("double")).alias("top_share"),
    )


def tfidf_top_terms(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
):
    """Per-document top-k terms by smoothed TF-IDF:
    ``tf · (ln((N+1)/(df+1)) + 1)`` — the standard sklearn-style smoothing,
    exactly replayable in SQL (the DuckDB twin mirrors it term for term).

    Relational shape for scale: one explode → (doc, term) counts (map-side
    combine on the (doc, term) shuffle), document frequency from a second
    small aggregate over distinct (doc, term) — NO self-join — and the
    corpus size N via a broadcast crossJoin of a 1-row aggregate (never a
    global window).  Ranking is a window partitioned BY DOCUMENT, ordered
    by the 6dp-ROUNDED score (ln differs by 1 ULP across libm
    implementations; rounding before ranking keeps cross-engine rank
    assignment deterministic) with the term as tiebreak.
    """
    from pyspark.sql.window import Window

    term_rows = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = term_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select("doc_id", "term", "score", "rnk")
    )
