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
from pyspark.sql.window import Window

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
    # Explicit class == Java \s exactly ([ \t\n\x0B\f\r]); spelled out
    # because RE2's \s (the DuckDB twins) excludes VT — the clean_text
    # divergence class, closed corpus-wide in r9.
    return F.size(
        F.filter(F.split(col, r"[ \t\n\r\x0B\x0C]+"), lambda t: F.length(t) > 0)
    )


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
    compact = F.regexp_replace(col, r"[ \t\n\r\x0B\x0C]+", "")
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
    punct = F.length(F.regexp_replace(col, r"[\w \t\n\r\x0B\x0C]", ""))
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


def tfidf_cosine_pairs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 256,
    min_cosine: float = 0.5,
):
    """Doc-doc cosine similarity over sparse TF-IDF vectors (same smoothed
    idf as ``tfidf_top_terms``): pairs with cosine ≥ ``min_cosine``.

    Relational shape: one shared-term postings equi-join prunes the pair
    space (docs sharing no surviving term never meet); norms are per-doc
    aggregates; no cross join.

    ``max_df`` is an absolute VOCABULARY cap (sklearn's max_df semantics,
    applied before weights AND norms): a term with document frequency df
    contributes df²/2 rows to the postings self-join, so one
    stopword-grade term with df=n is a quadratic blowup — on exactly the
    terms TF-IDF weights toward zero anyway.  The cap bounds join fan-out
    at |vocab|·max_df²/2, the same degenerate-key discipline as LSH's
    ``max_bucket_size`` and jaccard's ``max_doc_freq``.  Pass ``None``
    to disable (exact over the full vocabulary — small corpora only).
    """
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        df_t = df_t.where(F.col("df") <= max_df)
    w = F.col("tf") * (
        F.log((F.col("n_docs") + 1) * F.lit(1.0) / (F.col("df") + 1)) + 1.0
    )
    weighted = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", w.alias("w"))
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = weighted.select(F.col("doc_id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = weighted.select(F.col("doc_id").alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
        )
        .where(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def bpe_train_merges(
    df,
    text_col: str = "text",
    n_merges: int = 8,
    max_word_types: int = 512,
):
    """Learn the first ``n_merges`` BPE merge rules from a corpus — the
    canonical tokenizer-training operator (Sennrich et al. 2016, public),
    expressed so the WHOLE loop carries an exact ANSI-SQL twin.

    Output: (step, pair, merged, pair_cnt) — one row per learned merge,
    ``pair`` as ``left·right``, ``merged`` the fused symbol, ``pair_cnt``
    the frequency-weighted adjacent-pair count that won the step
    (ties broken lexicographically on the pair for cross-engine
    determinism).

    Scale shape: the only full-corpus work is the word-frequency count
    (one explode → map-side-combined groupBy).  BPE itself runs on the
    word-TYPE table — bounded at ``max_word_types`` rows by a TakeOrdered
    cut (count desc, word asc), so the k-iteration merge loop costs
    k × O(max_word_types) regardless of corpus size; this is exactly how
    production BPE trainers operate (on the word-frequency dict, not the
    raw corpus).  Each iteration is fully declarative — pair explode →
    weighted count → 1-row argmax → broadcast crossJoin + literal
    replace — no driver-side collect anywhere.

    Portability: word symbol sequences are encoded as strings with a
    DOUBLE-separator ('a··b··c', padded '·a··b··c·').  Merging pair (a,b)
    is then the LITERAL replace of '·a··b·' with '·ab·', which is
    boundary-safe (a multi-char symbol ending in 'a' can never false-
    match, the pad dot guards both sides) and overlap-correct for
    adjacent repeats ('·a··b··a··b·' → '·ab··ab·': consuming one pad dot
    leaves the next occurrence intact).  Literal left-to-right
    replace-all behaves identically in Spark's JVM and DuckDB —
    no regex engine semantics involved.  Symbols never contain '·'
    (words are ``\\W+``-tokenized, merges concatenate).
    """
    merges, _, _ = _bpe_loop(df, text_col, n_merges, max_word_types)
    return merges.select(
        "step",
        "pair",
        F.replace(F.col("pair"), F.lit("·"), F.lit("")).alias("merged"),
        "pair_cnt",
    )


def bpe_segment_words(
    df,
    text_col: str = "text",
    n_merges: int = 8,
    max_word_types: int = 512,
):
    """BPE APPLIED: the word-type table after ``n_merges`` learned merges —
    each word with its final subword segmentation (the train→apply
    companion of ``bpe_train_merges``; the training loop's terminal state
    IS the segmentation, no separate encode pass needed).

    Output: (word, pieces — space-joined subwords, n_pieces, cnt).
    Same scale/portability story as ``bpe_train_merges``.
    """
    _, words, _ = _bpe_loop(df, text_col, n_merges, max_word_types)
    pieces = F.replace(
        F.expr("trim(BOTH '·' FROM sym)"), F.lit("··"), F.lit(" ")
    )
    return words.select(
        "word",
        pieces.alias("pieces"),
        F.size(F.split(pieces, " ")).cast("int").alias("n_pieces"),
        "cnt",
    )


def bpe_encode_docs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    max_word_types: int = 512,
    carry_cols: tuple = (),
):
    """Corpus-level BPE encoding stats: per document, the word count and
    the BPE piece count under the ``n_merges``-rule tokenizer trained on
    the same corpus — the number that actually prices a training corpus
    (tokens-after-BPE, not whitespace words).

    Words outside the trained word-type table (beyond ``max_word_types``)
    fall back to CHARACTER pieces (length of the word) — the standard
    worst-case for an untrained word, and exactly what a byte/char-level
    fallback produces before any merges apply to it.

    Output: (doc_id, *carry_cols, n_words, n_pieces).  ``carry_cols``
    names per-document columns (e.g. ``source``) carried through the
    explode and the per-doc aggregate so downstream grouping (tokenizer
    fertility by source) needs no second join against the corpus.

    Scale: the segmentation table is ≤``max_word_types`` rows — broadcast
    into one explode→join→aggregate pass over the corpus; no shuffle
    other than the per-doc aggregate (map-side combinable).
    """
    seg = bpe_segment_words(df, text_col, n_merges, max_word_types).select(
        "word", F.col("n_pieces").alias("_vocab_pieces")
    )
    doc_words = df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in carry_cols],
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    return (
        doc_words.join(F.broadcast(seg), "word", "left")
        .groupBy("doc_id", *carry_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(
                F.coalesce(F.col("_vocab_pieces"), F.length("word"))
            ).cast("bigint").alias("n_pieces"),
        )
    )


def _bpe_word_table(df, text_col: str, max_word_types: int):
    """The ONE full-corpus pass of BPE training: word-frequency count +
    the bounded TakeOrdered word-type cut (count desc, word asc) with
    the padded double-separator symbol encoding.  Everything after this
    frame is corpus-size-independent (≤ ``max_word_types`` rows)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(max_word_types)
        .select(
            "word",
            F.concat(
                F.lit("·"),
                F.array_join(F.expr("regexp_extract_all(word, '.', 0)"), "··"),
                F.lit("·"),
            ).alias("sym"),
            "cnt",
        )
    )


def _bpe_loop(
    df,
    text_col: str,
    n_merges: int,
    max_word_types: int,
    snapshot_steps: "tuple[int, ...]" = (),
):
    """Shared BPE core: returns (merges frame, final word-type frame,
    snapshots) — ``snapshots`` maps each requested step count in
    ``snapshot_steps`` (0 = the pre-merge character split) to that
    step's word-type frame.

    r17 optimization (guide §1.2/§5): the merge loop runs DRIVER-LOCAL
    on the collected bounded word-type table.  The only full-corpus work
    — the word count + TakeOrdered cut (``_bpe_word_table``) — stays
    distributed; the k-iteration loop then operates on ≤
    ``max_word_types`` rows, for which the previous declarative
    formulation paid 2 Spark jobs (argmax aggregate + checkpointed
    replace) of scheduling/codegen per iteration, ~1.4 s of the 1.8 s
    query at sf0.1.  This is the sentencepiece architecture: corpus
    statistics distributed, merge loop on the frequency dict.  The
    collect is bounded-by-design (same class as the centroid-sample
    collect sites).  Semantics are IDENTICAL to the declarative loop —
    the same padded-string symbol encoding, the same left-to-right
    non-overlapping literal replace (Python ``str.replace`` ≡ Java
    ``String.replace``), the same (pair_cnt desc, pair asc) argmax
    tie-break (Python code-point order ≡ Spark UTF8 binary order — UTF-8
    preserves code-point order), the same empty-``best`` passthrough
    when the corpus runs out of pairs — proven by the unchanged DuckDB
    twins at all three SFs.
    """
    spark = df.sparkSession
    merge_rows, table, snaps = _bpe_loop_local(
        df, text_col, n_merges, max_word_types, snapshot_steps
    )
    w_schema = "word string, sym string, cnt bigint"
    merges = spark.createDataFrame(
        merge_rows, "step int, pair string, pair_cnt bigint"
    )
    words = spark.createDataFrame(table, w_schema)
    snapshots = {
        k: spark.createDataFrame(t, w_schema) for k, t in snaps.items()
    }
    return merges, words, snapshots


def _bpe_loop_local(
    df,
    text_col: str,
    n_merges: int,
    max_word_types: int,
    snapshot_steps: "tuple[int, ...]" = (),
):
    """The driver-local BPE core behind :func:`_bpe_loop`: returns plain
    Python ``(merge_rows, table, snapshots)`` where ``table`` /
    snapshot values are lists of (word, sym, cnt)."""
    rows = _bpe_word_table(df, text_col, max_word_types).collect()
    table = [(r["word"], r["sym"], r["cnt"]) for r in rows]

    snapshots = {}
    if 0 in snapshot_steps:
        snapshots[0] = list(table)
    merge_rows: list = []
    for step in range(1, n_merges + 1):
        pair_cnt: dict = {}
        for _, sym, cnt in table:
            syms = sym.strip("·").split("··")
            for i in range(len(syms) - 1):
                p = syms[i] + "·" + syms[i + 1]
                pair_cnt[p] = pair_cnt.get(p, 0) + cnt
        if pair_cnt:
            # argmax: pair_cnt desc, pair asc — identical to the
            # orderBy(desc, asc).limit(1) of the declarative loop
            best_pair = min(pair_cnt, key=lambda p: (-pair_cnt[p], p))
            merge_rows.append((step, best_pair, pair_cnt[best_pair]))
            src = "·" + best_pair.replace("·", "··") + "·"
            dst = "·" + best_pair.replace("·", "") + "·"
            table = [(w, s.replace(src, dst), c) for (w, s, c) in table]
        # with no winning pair the symbols pass through unchanged and no
        # merge row is emitted for this step (the declarative loop's
        # empty-best LEFT-join behavior)
        if step in snapshot_steps:
            snapshots[step] = list(table)
    return merge_rows, table, snapshots


def bpe_fertility_curve(
    df,
    text_col: str = "text",
    ks: "tuple[int, ...]" = (0, 2, 4, 8),
    max_word_types: int = 512,
):
    """BPE merge-budget SIZING curve — fertility (pieces per word
    occurrence) after each merge-count checkpoint in ``ks``, from ONE
    training run: the compression-vs-merges table a tokenizer-budget
    decision reads next to ``vocab_oov_curve`` (how many merges are
    still buying compression) — the eighth measured sizing curve.
    k = 0 is the pre-merge character split (fertility = mean word
    length), so the curve always starts at the no-tokenizer ceiling.

    Exactness: per-checkpoint totals are integer sums over the bounded
    word-type frame (count·pieces with pieces an exact split length);
    fertility is one exact-integer division — tolerance-free oracle
    (the unrolled-CTE BPE twin exposes every intermediate word frame).

    Output: (n_merges, n_word_types, total_words, total_pieces,
    fertility), one row per k, ordered.

    Scale: the training loop is corpus-size-independent after the
    bounded word-type cut (the ``bpe_train_merges`` story); snapshots
    reuse the loop's per-step lazy checkpoints, so the curve costs one
    training run plus |ks| bounded aggregates.
    """
    # r17 optimization (guide §1.2/§5): the snapshots are driver-local
    # bounded tables since the _bpe_loop port; the per-k aggregates are
    # plain sums over ≤ max_word_types rows — |ks| Spark jobs of
    # scheduling for trivial data otherwise.  Null semantics of the
    # former F.sum over an empty frame (NULL, count 0) are preserved.
    _, _, snaps = _bpe_loop_local(
        df, text_col, max(int(k) for k in ks), max_word_types,
        snapshot_steps=tuple(int(k) for k in ks),
    )
    rows = []
    for k in sorted(int(k) for k in ks):
        table = snaps[k]
        if table:
            total_words = sum(c for _, _, c in table)
            total_pieces = sum(
                c * len(s.strip("·").split("··")) for _, s, c in table
            )
            fertility = total_pieces / total_words
        else:
            total_words = total_pieces = fertility = None
        rows.append((k, len(table), total_words, total_pieces, fertility))
    return df.sparkSession.createDataFrame(
        rows,
        "n_merges int, n_word_types bigint, total_words bigint, "
        "total_pieces bigint, fertility double",
    ).orderBy("n_merges")


def corpus_vocab(df, text_col: str = "text", vocab_size: int = 512):
    """Top-``vocab_size`` corpus vocabulary by token frequency.

    Ties at the frequency boundary break lexicographically (ORDER BY total
    DESC, tok) so the cut is deterministic cross-engine.  Shape for scale:
    one explode → token-count aggregate (map-side combine; the shuffle
    carries distinct tokens, not the raw stream) → ``TakeOrderedAndProject``
    for the bounded top-V (never a full sort).  The result is ≤``vocab_size``
    rows — broadcastable by construction at any corpus size.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.col("total").desc(), F.col("tok"))
        .limit(vocab_size)
    )


def vocab_oov_curve(
    df,
    text_col: str = "text",
    vocab_sizes: "tuple[int, ...]" = (64, 256, 1024, 4096),
    max_n: int = 1,
):
    """Vocabulary-size SIZING curve — the V-sweep complement of
    :func:`oov_stats` (one V) and the seventh measured sizing curve
    (bloom_fpr / cms_error / lsh_geometry / cdc_dedup /
    contamination_ngram / semdedup_eps): per candidate top-V cut, how
    many token OCCURRENCES the vocabulary covers and the OOV rate — the
    table a tokenizer-budget decision reads before committing a vocab
    size.

    Exactness: frequencies are integer counts; the V cut breaks ties
    deterministically (freq DESC, token ASC — the ``corpus_vocab``
    convention); covered@V is a conditional integer sum over the
    bounded top-max(V) frame; oov_rate is one exact-integer division —
    tolerance-free oracle.

    Output: (vocab_size, n_types, total_tokens, covered_tokens,
    oov_rate), one row per V, ordered; n_types / total_tokens repeat
    (report-table convention).

    ``max_n`` sizes the vocabulary UNIT: 1 counts word types only;
    n > 1 adds word 2..n-grams as candidate vocabulary entries
    (underscore-joined), the standard move when the word-type
    inventory is too small for the V grid under study — n-gram types
    grow the stratum multiplicatively while staying honestly derived
    from the corpus.

    Scale: ONE explode → token-frequency aggregate (map-side combine;
    the shuffle carries distinct tokens), then
    ``TakeOrderedAndProject`` for the bounded top-max(V) (never a full
    vocab sort) — the only window runs over that ≤max(V)-row frame.
    The sweep is |V| conditional sums over it plus a literal fan-out.
    The n-gram expansion is per-row array arithmetic (zip_with over
    two slices), no extra pass or shuffle.
    """
    top_v = max(int(v) for v in vocab_sizes)
    # Materialize the token array once (r17 fix — the n-gram slices
    # referenced the tokenizer expression ~2(max_n-1)+1 times per row,
    # re-running the regex split each time).
    df = df.select(tokens(F.col(text_col)).alias("_units"))
    units = F.col("_units")
    if max_n > 1:
        grams = [units]
        for _ in range(2, max_n + 1):
            prev = grams[-1]
            grams.append(
                F.zip_with(
                    F.slice(
                        prev, 1, F.greatest(F.size(prev) - 1, F.lit(0))
                    ),
                    F.slice(
                        units,
                        len(grams) + 1,
                        F.greatest(F.size(units) - len(grams), F.lit(0)),
                    ),
                    lambda a, b: F.concat_ws("_", a, b),
                )
            )
        units = F.concat(*grams)
    freq = (
        df.select(F.explode(units).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    ).localCheckpoint(eager=False)
    tot = freq.agg(
        F.sum("f").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    top = freq.orderBy(F.col("f").desc(), F.col("tok")).limit(top_v)
    # partition-less window is bounded BY CONSTRUCTION (≤ top_v rows
    # post-limit) — the portable_centroids exception class
    w = Window.orderBy(F.col("f").desc(), F.col("tok"))
    ranked = top.withColumn("rn", F.row_number().over(w))
    sums = ranked.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("rn") <= int(v), F.col("f"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"c{v}")
            for v in vocab_sizes
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(int(v)).cast("int").alias("vocab_size"),
                F.col(f"c{v}").alias("covered"),
            )
            for v in vocab_sizes
        ]
    )
    return (
        tot.crossJoin(F.broadcast(sums))
        .select("n_types", "total_tokens", F.explode(rows).alias("r"))
        .select(
            F.col("r.vocab_size").alias("vocab_size"),
            "n_types",
            "total_tokens",
            F.col("r.covered").alias("covered_tokens"),
            (
                (F.col("total_tokens") - F.col("r.covered"))
                / F.col("total_tokens")
            ).alias("oov_rate"),
        )
        .orderBy("vocab_size")
    )


def oov_stats(df, text_col: str = "text", group_col: str = "source",
              vocab_size: int = 512):
    """Per-group out-of-vocabulary rate against the corpus top-V vocabulary.

    The standard tokenizer-coverage report for a pretraining mix: build the
    corpus vocabulary once (``corpus_vocab`` — bounded, broadcast), then
    measure what fraction of each group's token OCCURRENCES falls outside
    it.  Returns (group, total_tokens, oov_tokens, oov_rate).

    Scale: the (group, tok) aggregate combines map-side so the shuffle is
    per-group distinct tokens; the vocab side of the join is ≤V rows and
    broadcast — no second full-corpus shuffle.
    """
    tok_counts = (
        df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(group_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = corpus_vocab(df, text_col, vocab_size).select("tok", F.lit(1).alias("in_v"))
    return (
        tok_counts.join(F.broadcast(vocab), "tok", "left")
        .groupBy(group_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("oov_tokens"),
            F.round(
                F.sum(
                    F.when(F.col("in_v").isNull(), F.col("cnt")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("cnt"),
                6,
            ).alias("oov_rate"),
        )
    )


def quality_gate(df, text_col: str = "text", id_col: str = "doc_id",
                 lang: str = "en", min_quality: float = 0.5,
                 min_tokens: int = 20):
    """The composed training-data quality gate: language + heuristic
    quality + length floor in ONE narrow projection-and-filter pass.

    Every term is a pure stateless column expression, so the same function
    applies unchanged to a batch frame or a ``readStream`` frame (streamed
    micro-batches produce exactly the rows the batch run would — pinned by
    tests/test_streaming_windows.py).  Returns
    (id, pred_lang, n_tokens, quality) for survivors.
    """
    t = F.col(text_col)
    return (
        df.select(
            F.col(id_col),
            lang_id(t).alias("pred_lang"),
            token_count(t).cast("bigint").alias("n_tokens"),
            quality_score(t).alias("quality"),
        )
        .where(
            (F.col("pred_lang") == lang)
            & (F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
        )
    )


def tokenize_ids(df, text_col: str = "text", id_col: str = "doc_id",
                 vocab_size: int = 512, unk_id: int = 0):
    """Vocabulary-id encoding — the tokenization step of training-data prep:
    ids 1..V assigned to the corpus top-V tokens by (frequency DESC, token
    ASC), out-of-vocabulary occurrences mapped to ``unk_id``.

    Returns (id, n_tokens, token_ids: array<int>) in original token order.
    Docs with zero tokens (empty/NULL text) produce no row, mirroring
    ``char_bigram_lm_scores``.

    Scale: the id-rank window runs over the ≤``vocab_size``-row vocabulary
    (bounded by construction — a single tiny partition is fine and
    intentional there); encoding is a broadcast left join over the exploded
    stream; re-assembly is ONE doc-keyed aggregate — ``collect_list`` of
    (pos, id) structs sorted per group, never a global sort.
    """
    from pyspark.sql.window import Window

    vocab = corpus_vocab(df, text_col, vocab_size)
    wv = Window.orderBy(F.col("total").desc(), F.col("tok"))
    vocab_ids = vocab.select(
        "tok", F.row_number().over(wv).cast("int").alias("tid")
    )
    toks_pos = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    enc = toks_pos.join(F.broadcast(vocab_ids), "tok", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce("tid", F.lit(int(unk_id))).cast("int").alias("tid"),
    )
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s["tid"],
        ).alias("token_ids"),
    )


def quantile_filter_stats(df, score_col, group_col: str = "source",
                          q: float = 0.25):
    """Per-group adaptive quality gate: keep rows at or above the group's
    ``q``-quantile of ``score_col``; report threshold and kept rate.

    Fixed global thresholds over a heterogeneous mix either gut clean
    sources or let noisy ones through — per-source quantile cutoffs are the
    standard fix.  Exact percentile with linear interpolation (same
    definition as DuckDB ``quantile_cont``), rounded to 6 dp.

    Returns (group, threshold, n_total, n_kept, kept_rate).

    Scale: the quantile aggregate reduces to #groups rows (broadcast), the
    verdicts are one conditional-aggregation pass over the corpus — two
    passes total, no window, no sort.
    """
    scored = df.select(F.col(group_col), score_col.alias("score"))
    thr = scored.groupBy(group_col).agg(
        F.percentile("score", q).alias("thr")
    ).withColumnRenamed(group_col, "__g")
    return (
        # Null-safe join: groupBy keeps a NULL group key, so the join back
        # must too (same class as the pack_sequences NULL-key fix).
        scored.join(
            F.broadcast(thr), F.col(group_col).eqNullSafe(F.col("__g"))
        )
        .drop("__g")
        .groupBy(group_col)
        .agg(
            F.round(F.max("thr"), 6).alias("threshold"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("score") >= F.col("thr"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_kept"),
            F.round(
                F.sum(
                    F.when(F.col("score") >= F.col("thr"), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("kept_rate"),
        )
    )


def char_bigram_lm_scores(df, text_col: str = "text", id_col: str = "doc_id",
                          prefix_len: int = 200, train_df=None):
    """Per-document mean log-probability under a corpus character-bigram LM
    with add-one smoothing — the CCNet/KenLM-style perplexity proxy, built
    from the corpus itself with no external model.

    ``train_df`` (default: ``df`` itself) supplies the corpus the model
    tables are built from, enabling the leakage-free composition: train
    the LM on the ``train`` split, score the held-out split.  Bigrams or
    contexts the training corpus never saw score with zero counts — the
    add-one smoothing already covers them (ln(1 / alpha) at worst).

    Low (very negative) scores flag gibberish/binary-ish text whose
    character transitions don't match the corpus; a standard pretraining
    quality signal.  Only the first ``prefix_len`` chars contribute, which
    bounds per-doc cost and is how production scorers sample long docs.

    Returns (id, n_bigrams, avg_logp) for docs with ≥2 chars in the prefix;
    ``avg_logp = avg(ln((count(bigram)+1) / (count(context)+alphabet)))``
    rounded to 6 dp, where ``alphabet`` is the corpus-wide distinct count
    of bigram-second characters.

    Scale: exactly TWO corpus passes.  The bigram explode (a narrow flatMap
    bounded at ``prefix_len``×corpus) feeds one (bigram → count) aggregate;
    the context counts and the alphabet size are then derived from that
    ≤|alphabet|²-row table — never from a second corpus scan — and all
    three model tables broadcast into the scoring pass, which adds NO
    full-size shuffle (the per-doc aggregate combines map-side).  The docs
    frame is rebalanced to the default parallelism BEFORE the 200×
    amplification so a few large input splits (or a post-filter skew)
    can't serialize the explode.
    """
    def _bigrams(frame):
        d = (
            frame.select(
                F.col(id_col),
                F.lower(F.substring(F.col(text_col), 1, prefix_len)).alias("t"),
            )
            .where(F.length("t") >= 2)
            .repartition(
                frame.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
            )
        )
        return d.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("t") - 1)).alias("i"),
            "t",
        ).select(
            F.col(id_col),
            F.expr("substring(t, i, 2)").alias("big"),
            F.expr("substring(t, i, 1)").alias("ctx"),
        )

    bg = _bigrams(df)
    bg_train = bg if train_df is None else _bigrams(train_df)
    # big_counts feeds THREE consumers (the scoring join, the context
    # rollup, the alphabet count) — a diamond, but deliberately WITHOUT
    # a checkpoint barrier: every consumer sits above the identical
    # (bigram → count) shuffle, and AQE's runtime stage reuse dedupes
    # identical canonical exchanges even though the plan TEXT prints
    # four corpus scans and no ReusedExchange node.  Measured with the
    # status tracker at sf0.1: 67 executed tasks without a barrier vs
    # 70 with one, while localCheckpoint roughly doubled the wall time
    # of every LM-scorer query (extra jobs + lost codegen fusion).
    # Barriers pay off only for diamonds that diverge BEFORE their
    # first exchange (the llm_pipeline case); count executed tasks,
    # not plan-text scans, before adding one.
    big_counts = bg_train.groupBy("big").agg(F.count(F.lit(1)).alias("bc"))
    ctx_counts = big_counts.groupBy(
        F.substring("big", 1, 1).alias("ctx")
    ).agg(F.sum("bc").alias("cc"))
    alpha = big_counts.select(
        F.countDistinct(F.substring("big", 2, 1)).alias("alpha")
    )
    # LEFT joins: under a held-out train_df the scored side can carry
    # bigrams/contexts the model never saw — they smooth to count 0.
    # (For the self-trained default every key matches, so left ≡ inner.)
    return (
        bg.join(F.broadcast(big_counts), "big", "left")
        .join(F.broadcast(ctx_counts), "ctx", "left")
        .crossJoin(F.broadcast(alpha))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(
                        (F.coalesce(F.col("bc"), F.lit(0)) + F.lit(1.0))
                        / (F.coalesce(F.col("cc"), F.lit(0)) + F.col("alpha"))
                    )
                ),
                6,
            ).alias("avg_logp"),
        )
    )


def kneser_ney_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    train_df=None,
):
    """Per-document mean log-probability under an interpolated Kneser-Ney
    word-bigram LM (Kneser & Ney 1995; Chen & Goodman 1998 §2.7 — the
    smoothing family KenLM implements, which CCNet/LLaMA use for
    perplexity filtering).  The add-k char-bigram proxy
    (``char_bigram_lm_scores``) over-penalizes rare-but-real words; KN's
    continuation probability fixes exactly that, making this the higher
    -fidelity quality scorer of the two.

        P(w2|w1) = max(c(w1,w2) − D, 0) / c(w1)
                 + D · N1+(w1,•) / c(w1) · P_cont(w2)
        P_cont(w2) = (N1+(•,w2) + 1) / (B + V + 1)

    where ``D`` is the absolute discount, ``N1+`` are the distinct-
    follower / distinct-predecessor type counts, ``B`` the number of
    distinct bigram types and ``V`` the training vocabulary; P_cont is
    add-one smoothed over the type space so out-of-vocabulary words and
    unseen contexts stay finite (an unseen context backs off to P_cont
    alone — the standard interpolated-KN unigram fallback).

    ``train_df`` (default: ``df`` itself) supplies the training corpus,
    enabling leakage-free train-on-A / score-B composition; every unseen
    bigram/context/word path above is then exercised.

    Scale shape: ONE training-corpus aggregate (the bigram count table,
    vocab²-bounded and in practice Zipf-small) — the context, continuation
    and total tables all derive from it, never from a second corpus scan —
    then one scoring pass joining the model tables back (broadcast here;
    at 100 TB a word-bigram table can exceed broadcast, in which case the
    same plan runs as a shuffle equi-join on w1/w2 — the keys are already
    right).  Token arrays materialize in their own projection (the
    lambda-inlining O(tokens²) trap).

    Output: (doc_id, n_bigrams, avg_logp) for docs with ≥ 2 tokens,
    rounded to 6 dp.
    """
    d = float(discount)
    if not 0.0 <= d <= 1.0:
        raise ValueError(f"discount must be in [0, 1], got {discount}")

    def _bigram_rows(frame):
        tokd = frame.select(
            F.col(id_col).alias("doc_id"),
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"),
                lambda t: F.length(t) > 0,
            ).alias("_toks"),
        )
        c = F.col("_toks")
        n = F.size(c)
        pairs = F.when(
            n < 2, F.array().cast("array<struct<w1:string,w2:string>>")
        ).otherwise(
            F.zip_with(
                F.slice(c, 1, n - 1),
                F.slice(c, 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        )
        return tokd.select("doc_id", F.explode(pairs).alias("p")).select(
            "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )

    bg = _bigram_rows(df)
    if train_df is None:
        # Self-trained: bg feeds the model build AND the scoring pass —
        # barrier the diamond so the tokenize+explode runs once.
        bg = bg.localCheckpoint(eager=False)
        bg_train = bg
    else:
        bg_train = _bigram_rows(train_df)
    bc = bg_train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("bc")
    )
    # bc feeds four consumers (scoring join, context, continuation,
    # totals) — one barrier materializes the only training-corpus-wide
    # aggregate exactly once.
    bc = bc.localCheckpoint(eager=False)
    ctx = bc.groupBy("w1").agg(
        F.sum("bc").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1w"),
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1c"))
    tot = bc.agg(
        F.count(F.lit(1)).cast("bigint").alias("B"),
        F.countDistinct("w2").cast("bigint").alias("V"),
    )
    scored = (
        bg.join(F.broadcast(bc), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(cont), "w2", "left")
        .crossJoin(F.broadcast(tot))
    )
    pcont = (F.coalesce(F.col("n1c"), F.lit(0)) + F.lit(1.0)) / (
        F.col("B") + F.col("V") + F.lit(1.0)
    )
    p_seen = (
        F.greatest(
            F.coalesce(F.col("bc"), F.lit(0)) - F.lit(d), F.lit(0.0)
        )
        / F.col("c1")
        + F.lit(d) * F.col("n1w") / F.col("c1") * pcont
    )
    prob = F.when(F.col("c1").isNull(), pcont).otherwise(p_seen)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg(F.log(prob)), 6).alias("avg_logp"),
    )


def clean_text(col: Column) -> Column:
    """Standard corpus text normalization: collapse whitespace runs
    (space/tab/newline/CR/VT/FF) to single spaces, strip the remaining
    C0/DEL control characters, trim edges.

    Whitespace collapses FIRST so a CR/LF between words becomes a space
    (stripping first would weld the words together); the control-char
    class then only needs the non-whitespace C0 range.  Pure regexp chain
    — codegen'd, no UDF, and expressible verbatim in any RE2/Java-regex
    engine (the ANSI twin uses the identical patterns with the 'g' flag).

    The whitespace class is EXPLICIT ([ \\t\\n\\r\\x0B\\x0C]) rather than
    ``\\s`` because Java's ``\\s`` includes vertical tab (0x0B) while
    RE2's does not — with ``\\s+`` the Spark side would collapse VT to a
    space but a RE2-backed oracle (DuckDB) would pass it through, a
    silent one-character divergence the r8 advisor caught.

    Known (deliberate) edge: a control character FLANKED by whitespace
    (``"a \\x1f b"``) leaves two adjacent spaces after the control is
    stripped, so the function is not idempotent on such inputs —
    hypothesis found ``"0\\r\\x1f\\r0" → "0  0"`` in r18.  Fixing the
    order would change every declared text query's oracled output, so
    the behavior is pinned as-is (both engines compute it identically);
    tests/test_properties.py asserts idempotence on control-free inputs
    and this exact quirk on the flanked-control class.
    """
    collapsed = F.regexp_replace(col, r"[ \t\n\r\x0B\x0C]+", " ")
    stripped = F.regexp_replace(collapsed, r"[\x00-\x08\x0E-\x1F\x7F]", "")
    return F.trim(stripped)


def gopher_quality_flags(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
):
    """The Gopher rule battery (Rae et al. 2021, "Scaling Language Models:
    ... Gopher", Table A1): the classic heuristic document filter every
    large text corpus build runs before model-based scoring.  Defaults are
    the paper's published thresholds.

    Rules, each surfaced as a metric column so filter audits can report
    per-rule attrition (the ``filter_audit`` pattern):
      - word count within [min_words, max_words]
      - mean word length within [3, 10]
      - symbol-to-word ratio (# or ellipsis) ≤ 0.1
      - ≤ 90% of lines start with a bullet
      - ≤ 30% of lines end with an ellipsis
      - ≥ 80% of words contain an alphabetic character
      - ≥ 2 distinct members of the 8-word English stopword probe

    ``keep`` ANDs all rules, comparing the ROUNDED metrics so the DuckDB
    twin decides identically at float boundaries.  One narrow
    projection — no shuffle, no UDF; at 100 TB this runs at scan speed.

    Output: (doc_id, n_words, mean_word_len, symbol_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    n_stopword_hits, keep).
    """
    t = F.col(text_col)
    # Whitespace words on the RAW text, per the paper and the twin's
    # regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+') — NOT the
    # lowercased \W+ tokens() split (on punctuated text the two diverge
    # in n_words / mean_word_len / alpha_word_frac; advisor r10 high).
    # Materialized once in a base projection (the multiply-referenced
    # alias survives CollapseProject — the documented lambda-inlining
    # discipline) so the split runs once per row, not once per metric.
    base = df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        F.filter(
            F.split(t, r"[ \t\n\r\x0B\x0C]+"), lambda x: F.length(x) > 0
        ).alias("_toks"),
        F.split(t, "\n").alias("_lines"),
        F.filter(
            F.split(F.lower(t), r"\W+"), lambda x: F.length(x) > 0
        ).alias("_wtoks"),
    )
    toks = F.col("_toks")
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    mean_len = F.round(
        F.when(n_words == 0, F.lit(0.0)).otherwise(total_len / n_words), 6
    )
    sym = F.size(
        F.regexp_extract_all(F.col("_t"), F.lit(r"(#|\.\.\.|…)"), F.lit(0))
    )
    symbol_ratio = F.round(
        F.when(n_words == 0, F.lit(0.0)).otherwise(sym / n_words), 6
    )
    lines = F.col("_lines")
    n_lines = F.size(lines)  # split never yields an empty array
    bullet_frac = F.round(
        # [ \t]* matches the twin's [ \x09]* exactly; Java \s would also
        # eat \r/\x0B/\f and diverge on \r\n-ended lines.
        F.size(F.filter(lines, lambda l: l.rlike(r"^[ \t]*[-*•]")))
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        # \z not $: Java's $ also matches BEFORE a final \r line
        # terminator (so "...\r" would count); RE2's $ (the twin) is
        # end-of-text only.  Found by the punctuated-corpus parity test.
        F.size(
            F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)\z"))
        )
        / n_lines,
        6,
    )
    alpha_frac = F.round(
        F.when(n_words == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))) / n_words
        ),
        6,
    )
    probe = F.array(
        *[F.lit(s) for s in ["the", "be", "to", "of", "and", "that", "have", "with"]]
    )
    n_stop = F.size(F.array_intersect(F.array_distinct(F.col("_wtoks")), probe))
    out = base.select(
        F.col("doc_id"),
        n_words.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("bigint").alias("n_stopword_hits"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_stopword_hits") >= min_stopword_hits),
    )


def _hashed_unigram_rows(
    df, text_col: str, id_col: str, num_buckets: int
):
    """One (doc_id, bucket) row per token OCCURRENCE, buckets from the
    repo's portable md5-hex15 scheme (the ``hashed_ngram_features``
    convention, unigrams only — fastText's default word features).
    Tokenization runs ONCE per doc in its own projection (the
    lambda-inlining trap, see mixing._ngrams_of)."""
    tokd = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\W+"),
            lambda t: F.length(t) > 0,
        ).alias("_toks"),
    )
    return tokd.select(
        "doc_id", F.explode("_toks").alias("_t")
    ).select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(F.md5("_t"), 1, 15), 16, 10).cast("bigint"),
            F.lit(num_buckets),
        ).alias("bucket"),
    )


def quality_classifier_scores(
    df,
    pos_df,
    neg_df,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    smoothing: float = 1.0,
):
    """Seed-trained quality classifier (the CCNet / LLaMA curation move:
    Wenzek et al. 2020 §4.4, Touvron et al. 2023 train a fastText-style
    linear model on a "looks like Wikipedia" seed and keep high-scoring
    pages).  Multinomial Naive Bayes over hashed unigram counts IS a
    linear classifier of that shape, and its training is pure counting —
    so both train and inference stay in native aggregates:

        score(x) = ln(n_pos/n_neg)                       (doc prior)
                 + Σ_tok [ ln p(b(tok)|pos) − ln p(b(tok)|neg) ]

    with add-``smoothing`` estimates over ``num_buckets`` hashed buckets,
    trained on ``pos_df`` (quality seed) vs ``neg_df`` (raw/reject seed).
    ``label`` = score > 0.  Docs with zero tokens score exactly the
    prior (no evidence either way).

    Scale shape: training is one side-tagged union aggregate bounded by
    ``num_buckets`` rows (the dsir_log_weights idiom); the learned
    log-odds table BROADCASTS onto a single exploded corpus pass — the
    scored corpus never shuffles wider than the per-doc sum, and the
    seeds are read once each regardless of corpus size.

    Returns (doc_id, n_features, score, label).
    """
    pos = _hashed_unigram_rows(pos_df, text_col, id_col, num_buckets)
    neg = _hashed_unigram_rows(neg_df, text_col, id_col, num_buckets)
    dist = (
        pos.select("bucket", F.lit(1).alias("is_p"), F.lit(0).alias("is_n"))
        .unionAll(
            neg.select(
                "bucket", F.lit(0).alias("is_p"), F.lit(1).alias("is_n")
            )
        )
        .groupBy("bucket")
        .agg(F.sum("is_p").alias("c_pos"), F.sum("is_n").alias("c_neg"))
        .localCheckpoint(eager=False)  # feeds totals AND the odds table
    )
    totals = dist.agg(
        F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg")
    )
    priors = pos_df.select(F.lit(1).alias("is_p")).unionAll(
        neg_df.select(F.lit(0).alias("is_p"))
    ).agg(
        F.log(
            F.sum("is_p").cast("double")
            / F.sum(F.lit(1) - F.col("is_p")).cast("double")
        ).alias("log_prior")
    )
    a = float(smoothing)
    b = float(num_buckets)
    odds = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_pos") + a) / (F.col("t_pos") + a * b))
            - F.log((F.col("c_neg") + a) / (F.col("t_neg") + a * b))
        ).alias("log_odds"),
    )
    feats = _hashed_unigram_rows(df, text_col, id_col, num_buckets)
    scored = (
        feats.join(F.broadcast(odds), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.sum("log_odds").alias("evidence"),
        )
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(priors))
        .select(
            "doc_id",
            F.coalesce("n_features", F.lit(0)).cast("bigint").alias(
                "n_features"
            ),
            F.round(
                F.col("log_prior") + F.coalesce("evidence", F.lit(0.0)), 6
            ).alias("score"),
        )
        .withColumn("label", F.col("score") > 0)
    )


C4_BADWORDS = ("badword1", "badword2")  # stand-in for the blocklist C4 cites


def c4_quality_flags(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    badwords: tuple[str, ...] = C4_BADWORDS,
):
    """The C4 cleaning rule battery (Raffel et al. 2020 §2.2): line rules
    — keep only lines that end in terminal punctuation (. ! ? ") AND
    contain ≥ ``min_words_per_line`` words — plus page rules — drop any
    page with fewer than ``min_sentences`` sentences, containing
    "lorem ipsum", a curly brace ``{``, or a blocklisted word.  The
    blocklist ships as a tiny neutral placeholder (the paper points at an
    external list; pass your own).

    Returns per-doc metrics + verdict, the ``gopher_quality_flags``
    shape: (doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, has_badword, keep, clean_text) where ``clean_text`` is
    the retained lines rejoined (what C4 would actually train on; ''
    when keep is false semantics are left to the caller — the column
    always holds the line-filtered text so rule attribution stays
    visible).

    Scale: pure narrow projections off ONE line split materialized per
    doc — no shuffle, no UDF; runs at scan speed like the Gopher
    battery.  Sentences are counted as terminal-punctuation runs on the
    raw page (the paper's sentence proxy at corpus scale).
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
    lower = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    word_n = lambda c: F.size(
        F.filter(
            F.split(c, r"[ \t\r\x0B\x0C]+"), lambda t: F.length(t) > 0
        )
    )
    line_ok = lambda ln: (
        F.rtrim(ln).rlike('[.!?"]$') & (word_n(ln) >= min_words_per_line)
    )
    kept = F.filter(lines, line_ok)
    badword_hit = None
    for w in badwords:
        hit = F.contains(lower, F.lit(w))
        badword_hit = hit if badword_hit is None else (badword_hit | hit)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        F.size(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"[.!?]"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ).cast("bigint").alias("n_sentences"),
        F.contains(lower, F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains(
            F.coalesce(F.col(text_col), F.lit("")), F.lit("{")
        ).alias("has_brace"),
        (badword_hit if badword_hit is not None else F.lit(False)).alias(
            "has_badword"
        ),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
        & ~F.col("has_badword")
        & (F.col("n_kept_lines") > 0),
    )


def zipf_token_stats(
    df,
    text_col: str = "text",
    top_k: int = 100,
):
    """Zipf rank–frequency observability: the ``top_k`` most frequent
    tokens with rank, count, corpus frequency share, and the fitted
    log-log slope (OLS of ln(count) on ln(rank) over the top-k — a
    healthy natural-language corpus sits near −1; synthetic or
    templated text shows up immediately as a flat or convex curve).

    Scale: one token-count aggregate (map-side combinable), a bounded
    top-k (TakeOrdered, never a global sort), and the regression runs
    over k rows.  Ties break lexicographically so ranks — and therefore
    the slope — are deterministic across engines.

    Returns (rank, token, cnt, frac, slope) — ``slope`` repeated on
    every row (crossJoin-agg broadcast, the total_items_window idiom).
    """
    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    counts = counts.localCheckpoint(eager=False)  # feeds top-k AND total
    total = counts.agg(F.sum("cnt").cast("double").alias("_tot"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(top_k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("token"))
            ).cast("bigint"),
        )
    )
    slope = top.agg(
        F.round(
            F.covar_pop(F.log("rank"), F.log("cnt"))
            / F.var_pop(F.log("rank")),
            6,
        ).alias("slope")
    )
    return (
        top.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(slope))
        .select(
            "rank",
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("_tot"), 6).alias("frac"),
            "slope",
        )
    )


def heaps_vocab_growth(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
):
    """Heaps'-law observability: vocabulary growth as the corpus is
    consumed in ``id_col`` order, reported at ``n_buckets`` checkpoints —
    a healthy natural corpus grows types ∝ tokens^β with β ≈ 0.4–0.6;
    templated or looping text flattens immediately, runaway vocabularies
    (OCR noise, binary spill) curve upward.

    Bucketing is a monotone function of the id against its broadcast
    max (one bounded aggregate — never a global row_number), so the
    curve is deterministic and the assignment is a narrow projection.
    A token TYPE counts as new in the first bucket it appears in
    (min-bucket aggregate over the token table — one shuffle bounded by
    vocabulary size); the cumulative curve is a window over the
    ``n_buckets``-row result, not the corpus.

    Returns (bucket, n_docs, n_tokens, cum_tokens, new_types,
    cum_types) — one row per non-empty bucket.
    """
    mx = df.agg(
        (F.max(F.col(id_col)).cast("double") + 1.0).alias("_mx")
    )
    base = df.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.floor(
                F.col(id_col).cast("double") * n_buckets / F.col("_mx")
            ).cast("int"),
            F.lit(n_buckets - 1),
        ).alias("bucket"),
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\W+"),
            lambda t: F.length(t) > 0,
        ).alias("_toks"),
    )
    base = base.localCheckpoint(eager=False)  # feeds doc stats AND types
    per_bucket = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("_toks")).cast("bigint").alias("n_tokens"),
    )
    first_seen = (
        base.select("bucket", F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_bucket.join(first_seen, "bucket", "left")
        .withColumn("new_types", F.coalesce("new_types", F.lit(0)))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .withColumn("cum_types", F.sum("new_types").over(w).cast("bigint"))
        .select(
            "bucket", "n_docs", "n_tokens", "cum_tokens",
            "new_types", "cum_types",
        )
    )


def gopher_repetition_flags(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top_ngram_char_frac: tuple = ((2, 0.20), (3, 0.18), (4, 0.16)),
    max_dup_ngram_char_frac: tuple = (
        (5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10),
    ),
):
    """The MassiveText repetition filter battery (Rae et al. 2021 Table A1,
    the repetition half — ``gopher_quality_flags`` is the quality half).
    Defaults are the paper's published thresholds.

    Per-document metrics, each also surfaced as a column for per-rule
    attrition audits:
      - ``dup_line_frac`` / ``dup_para_frac``: fraction of line/paragraph
        OCCURRENCES that repeat an earlier identical unit
        ((n − n_distinct) / n).  Lines split on ``\\n``, paragraphs on
        ``\\n\\n``, empties dropped.
      - ``dup_line_char_frac`` / ``dup_para_char_frac``: fraction of unit
        characters in those repeated occurrences (Σ(c−1)·len / Σ c·len).
      - ``top_{2,3,4}gram_char_frac``: characters covered by the single
        most frequent n-gram (count · len(gram) / doc chars), per the
        paper's definition.
      - ``dup_{5..10}gram_char_frac``: occurrence-weighted share of n-gram
        characters belonging to grams seen ≥2× (Σ_{c≥2} c·len / Σ c·len).
        The paper de-duplicates overlapping character POSITIONS; this is
        the standard relational reimplementation (occurrence-weighted,
        overlaps counted per occurrence) — slightly stricter, and exactly
        replayable in SQL, which the positional scan is not.

    ``keep`` ANDs all 13 rules on the 6dp-ROUNDED metrics so the DuckDB
    twin decides identically at float boundaries.

    Scale shape: ONE explode over a per-doc struct stream
    (lines ∪ paragraphs ∪ n-grams for every configured n, ~Σn ≈ 9× the
    token stream) → hash aggregate on (doc, kind, unit) (map-side combine
    collapses repeats before the shuffle) → hash aggregate on (doc, kind)
    → conditional-aggregate pivot on doc.  Token/line/paragraph arrays are
    materialized ONCE in their own projection (multiply-referenced aliases
    survive CollapseProject — the documented lambda-inlining discipline);
    n-grams build by zip_with against shifted arrays, never per-position
    re-tokenization.  A per-doc sentinel unit keeps empty documents in the
    output without a re-join against the input.

    The ONE shuffle moves raw documents, not units: base is hash-
    partitioned by doc_id BEFORE the explode, and doc_id-partitioning
    satisfies the clustered-distribution requirement of all three
    downstream aggregates (their grouping keys all contain doc_id), so
    the ~9×-token unit stream never crosses the network — at 100 TB the
    difference between shuffling the corpus once and shuffling nine
    token-streams' worth of n-grams three times.
    """
    top_ns = dict(max_top_ngram_char_frac)
    dup_ns = dict(max_dup_ngram_char_frac)
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("_chars"),
        F.filter(
            F.split(t, "\n"), lambda x: F.length(x) > 0
        ).alias("_lines"),
        F.filter(
            F.split(t, "\n\n"), lambda x: F.length(x) > 0
        ).alias("_paras"),
        F.filter(
            F.split(t, r"[ \t\n\r\x0B\x0C]+"), lambda x: F.length(x) > 0
        ).alias("_toks"),
    ).repartition("doc_id")

    # Incremental gram ladder: the (n+1)-gram array is the n-gram array
    # zip_with'd against the n-shifted token array, so the whole 2..10
    # family costs max_n−1 passes (not Σ(n−1) independent rebuilds with
    # quadratic re-concatenation).  Each level is its own projection
    # alias referenced twice (next level + the unit stream), which
    # survives CollapseProject — the documented lambda-inlining
    # discipline.  Null tail slots propagate down the ladder and are
    # filtered per level.
    ns = sorted({*top_ns, *dup_ns})
    for n in range(2, max(ns) + 1):
        prev = F.col(f"_g{n - 1}") if n > 2 else F.col("_toks")
        base = base.select(
            "*",
            F.zip_with(
                prev,
                F.slice(F.col("_toks"), n, F.size(F.col("_toks")) + 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ).alias(f"_g{n}"),
        )

    def _grams(n: int) -> Column:
        return F.filter(F.col(f"_g{n}"), lambda x: x.isNotNull())

    def _tagged(kind: str, arr: Column) -> Column:
        return F.transform(
            arr,
            lambda x: F.struct(
                F.lit(kind).alias("kind"), x.alias("unit")
            ),
        )

    units = F.concat(
        # Sentinel: one unit per doc, matched by no metric — keeps docs
        # with no lines/tokens in the pivot without an extra join.
        F.array(
            F.struct(F.lit("_").alias("kind"), F.lit("").alias("unit"))
        ),
        _tagged("L", F.col("_lines")),
        _tagged("P", F.col("_paras")),
        *[
            _tagged(f"g{n}", _grams(n))
            for n in sorted({*top_ns, *dup_ns})
        ],
    )
    ex = base.select(
        "doc_id", "_chars", F.explode(units).alias("u")
    )
    per_unit = ex.groupBy(
        "doc_id",
        F.col("u.kind").alias("kind"),
        F.col("u.unit").alias("unit"),
    ).agg(F.count(F.lit(1)).alias("c"), F.max("_chars").alias("_chars"))
    ulen = F.length(F.col("unit"))
    per_kind = per_unit.groupBy("doc_id", "kind").agg(
        F.sum("c").alias("n_units"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * ulen).alias("all_chars"),
        F.sum((F.col("c") - 1) * ulen).alias("rep_chars"),
        F.sum(
            F.when(F.col("c") >= 2, F.col("c") * ulen).otherwise(0)
        ).alias("dup_occ_chars"),
        F.max(F.col("c") * ulen).alias("top_chars"),
        F.max("_chars").alias("doc_chars"),
    )

    def _kind_frac(kind: str, num: Column, den: Column) -> Column:
        frac = F.when(den > 0, num / den).otherwise(F.lit(0.0))
        return F.round(
            F.coalesce(
                F.max(F.when(F.col("kind") == kind, frac)), F.lit(0.0)
            ),
            6,
        )

    aggs = [
        _kind_frac(
            "L", (F.col("n_units") - F.col("n_distinct")).cast("double"),
            F.col("n_units").cast("double"),
        ).alias("dup_line_frac"),
        _kind_frac(
            "L", F.col("rep_chars").cast("double"),
            F.col("all_chars").cast("double"),
        ).alias("dup_line_char_frac"),
        _kind_frac(
            "P", (F.col("n_units") - F.col("n_distinct")).cast("double"),
            F.col("n_units").cast("double"),
        ).alias("dup_para_frac"),
        _kind_frac(
            "P", F.col("rep_chars").cast("double"),
            F.col("all_chars").cast("double"),
        ).alias("dup_para_char_frac"),
    ]
    for n in sorted(top_ns):
        aggs.append(
            _kind_frac(
                f"g{n}", F.col("top_chars").cast("double"),
                F.col("doc_chars").cast("double"),
            ).alias(f"top_{n}gram_char_frac")
        )
    for n in sorted(dup_ns):
        aggs.append(
            _kind_frac(
                f"g{n}", F.col("dup_occ_chars").cast("double"),
                F.col("all_chars").cast("double"),
            ).alias(f"dup_{n}gram_char_frac")
        )
    out = per_kind.groupBy("doc_id").agg(*aggs)
    keep = (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_para_frac") <= max_dup_para_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("dup_para_char_frac") <= max_dup_para_char_frac)
    )
    for n, th in top_ns.items():
        keep = keep & (F.col(f"top_{n}gram_char_frac") <= th)
    for n, th in dup_ns.items():
        keep = keep & (F.col(f"dup_{n}gram_char_frac") <= th)
    return out.withColumn("keep", keep)


def entropy_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy (nats) of the character and token
    distributions — the standard cheap detector for encoded blobs
    (base64/hex runs score HIGH char entropy with LOW token entropy) and
    degenerate repetition (both LOW).  Characters are the non-whitespace
    stream; tokens are whitespace words.

    Output: (doc_id, n_chars, n_tokens, char_entropy, token_entropy),
    entropies 6dp-rounded via H = ln(n) − Σ c·ln(c) / n over the unit
    counts, so the DuckDB twin replays it term for term.

    Scale shape: same skeleton as ``gopher_repetition_flags`` — ONE
    shuffle of raw documents (hash by doc_id, pre-explode), one explode
    of a tagged unit stream (chars ∪ tokens), two partition-local hash
    aggregates, conditional-aggregate pivot.  A per-doc sentinel unit
    keeps empty documents in the output.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.regexp_replace(t, r"[ \t\n\r\x0B\x0C]+", ""), ""),
            lambda x: F.length(x) > 0,
        ).alias("_chars"),
        F.filter(
            F.split(t, r"[ \t\n\r\x0B\x0C]+"), lambda x: F.length(x) > 0
        ).alias("_toks"),
    ).repartition("doc_id")
    units = F.concat(
        F.array(
            F.struct(F.lit("_").alias("kind"), F.lit("").alias("unit"))
        ),
        F.transform(
            F.col("_chars"),
            lambda x: F.struct(F.lit("C").alias("kind"), x.alias("unit")),
        ),
        F.transform(
            F.col("_toks"),
            lambda x: F.struct(F.lit("T").alias("kind"), x.alias("unit")),
        ),
    )
    ex = base.select("doc_id", F.explode(units).alias("u"))
    per_unit = ex.groupBy(
        "doc_id",
        F.col("u.kind").alias("kind"),
        F.col("u.unit").alias("unit"),
    ).agg(F.count(F.lit(1)).alias("c"))
    per_kind = per_unit.groupBy("doc_id", "kind").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("clnc"),
    )

    def _kind(kind: str, expr):
        return F.coalesce(
            F.max(F.when(F.col("kind") == kind, expr)), F.lit(0.0)
        )

    ent = F.when(
        F.col("n") > 0,
        F.log(F.col("n").cast("double")) - F.col("clnc") / F.col("n"),
    ).otherwise(F.lit(0.0))
    return per_kind.groupBy("doc_id").agg(
        _kind("C", F.col("n").cast("double")).cast("bigint").alias("n_chars"),
        _kind("T", F.col("n").cast("double")).cast("bigint").alias("n_tokens"),
        F.round(_kind("C", ent), 6).alias("char_entropy"),
        F.round(_kind("T", ent), 6).alias("token_entropy"),
    )


def cavnar_trenkle_langid(
    df,
    train_df=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    profile_size: int = 100,
    doc_profile_size: int = 20,
    prefix_len: int = 300,
):
    """TRAINED language identification by character-trigram rank profiles
    (Cavnar & Trenkle 1994, "N-Gram-Based Text Categorization" — the
    classic out-of-place method behind textcat/langdetect lineages),
    complementing the fixed-marker heuristic ``lang_id``.

    Training: per label, count trigrams over the lowercased ``prefix_len``
    -char prefix, keep the ``profile_size`` most frequent as a RANK
    profile (1 = most frequent; ties broken by gram ascending, mirrored
    in the oracle).  Classification: build each doc's own
    ``doc_profile_size``-gram rank profile the same way, score every
    language by the out-of-place distance

        dist(doc, L) = Σ_g |rank_doc(g) − rank_L(g)|,

    charging ``profile_size`` for grams absent from L's profile; predict
    the argmin (ties → label ascending).

    ``train_df`` (default ``df``) supplies the labeled training slice —
    pass a disjoint slice for honest held-out accuracy.

    Scale shape: the language profiles are a ≤ n_langs·profile_size-row
    BROADCAST; doc profiles are a bounded top-k per doc (one aggregate +
    one window over doc_id-partitioned data); scoring is doc_profile ×
    n_langs (a constant fan-out, not a shuffle) with a broadcast-hash
    join against the profiles.  Docs with no trigram in the prefix are
    excluded (no profile exists).

    Output: (doc_id, <label_col>, pred_lang, dist) — one row per doc with
    its true label carried through for confusion rollups.
    """
    from pyspark.sql.window import Window

    def _grams(frame, keep_label: bool):
        cols = [F.col(id_col).alias("doc_id")] + (
            [F.col(label_col).alias("_lab")] if keep_label else []
        )
        d = frame.select(
            *cols,
            F.lower(F.substring(F.col(text_col), 1, prefix_len)).alias("t"),
        ).where(F.length("t") >= 3)
        return d.select(
            *[c for c in ("doc_id", "_lab") if keep_label or c == "doc_id"],
            F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"),
            "t",
        ).select(
            *[c for c in ("doc_id", "_lab") if keep_label or c == "doc_id"],
            F.expr("substring(t, i, 3)").alias("gram"),
        )

    tr = train_df if train_df is not None else df
    lang_counts = (
        _grams(tr, keep_label=True)
        .groupBy("_lab", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_lang = Window.partitionBy("_lab").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    lang_prof = (
        lang_counts.withColumn("rank_lang", F.row_number().over(w_lang))
        .where(F.col("rank_lang") <= profile_size)
        .select(F.col("_lab").alias("cand_lang"), "gram", "rank_lang")
    )
    langs = lang_prof.select("cand_lang").distinct()

    doc_counts = (
        _grams(df, keep_label=False)
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    doc_prof = (
        doc_counts.withColumn("rank_doc", F.row_number().over(w_doc))
        .where(F.col("rank_doc") <= doc_profile_size)
        .select("doc_id", "gram", "rank_doc")
    )
    dist = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lang_prof), ["cand_lang", "gram"], "left")
        .groupBy("doc_id", "cand_lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("rank_doc") - F.col("rank_lang")),
                    F.lit(profile_size),
                )
            )
            .cast("bigint")
            .alias("dist")
        )
    )
    w_pick = Window.partitionBy("doc_id").orderBy(
        F.col("dist").asc(), F.col("cand_lang").asc()
    )
    picked = (
        dist.withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "dist")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(label_col))
        .join(picked, "doc_id")
        .select("doc_id", label_col, "pred_lang", "dist")
    )


def threshold_sweep(
    df,
    score_col: str,
    weight_col: str | None = None,
    n_steps: int = 10,
    step: float = 0.1,
):
    """Filter-calibration curve: for every candidate threshold t in
    {0, step, 2·step, …, (n_steps−1)·step}, how many documents (and how
    much token mass) a ``score >= t`` filter would KEEP.  This is the
    sweep every curation run tunes its quality gate against (e.g. the
    FineWeb-Edu classifier-threshold study) — computing it per-threshold
    with separate passes is the naive O(n_steps · corpus) plan.

    Scale shape: ONE corpus pass into a ≤ n_steps+1-row bucket histogram
    (scores quantize to integer micro-units so bucket edges align with
    thresholds EXACTLY — ``floor(q·10)`` in doubles misbuckets boundary
    scores like 0.3 whose double is just below the decimal literal),
    then the cumulative kept-counts come from a window over that tiny
    aggregate.  The corpus is never rescanned per threshold.

    ``weight_col`` (e.g. a token count) adds kept-mass columns; omitted,
    only doc counts are emitted.  Scores must lie in [0, n_steps·step).

    Output: (threshold, n_docs, frac_docs[, n_weight, frac_weight]),
    fractions rounded to 6 dp.
    """
    unit = int(round(step * 1_000_000))
    micro = F.round(F.col(score_col) * 1_000_000).cast("bigint")
    bucket = F.least(
        F.floor(micro / unit).cast("int"), F.lit(n_steps - 1)
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("_w"))
    hist = df.select(
        bucket.alias("_b"), *([F.col(weight_col)] if weight_col else [])
    ).groupBy("_b").agg(*aggs)
    from pyspark.sql.window import Window

    # kept at threshold k = everything in buckets >= k: a suffix sum
    # over the tiny histogram + the grand total for fractions.
    w = Window.orderBy(F.col("_b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "_b",
        F.sum("_n").over(w).alias("_kept"),
        *([F.sum("_w").over(w).alias("_kept_w")] if weight_col else []),
    )
    tot = hist.agg(
        F.sum("_n").alias("_tot"),
        *([F.sum("_w").alias("_tot_w")] if weight_col else []),
    )
    # Every threshold 0..n_steps-1 must appear even when its bucket is
    # empty: kept(k) = kept of the smallest non-empty bucket >= k.
    grid = (
        df.sparkSession.range(n_steps)
        .select(F.col("id").cast("int").alias("_k"))
    )
    filled = (
        grid.join(cum, grid["_k"] <= cum["_b"], "left")
        .groupBy("_k")
        .agg(
            F.max("_kept").alias("_kept"),
            *([F.max("_kept_w").alias("_kept_w")] if weight_col else []),
        )
    )
    out_cols = [
        F.round(F.col("_k") * F.lit(float(step)), 6).alias("threshold"),
        F.coalesce(F.col("_kept"), F.lit(0)).alias("n_docs"),
    ]
    sel = filled.crossJoin(F.broadcast(tot))
    out_cols.append(
        F.round(
            F.coalesce(F.col("_kept"), F.lit(0)) / F.col("_tot"), 6
        ).alias("frac_docs")
    )
    if weight_col is not None:
        out_cols += [
            F.coalesce(F.col("_kept_w"), F.lit(0)).alias("n_weight"),
            F.round(
                F.coalesce(F.col("_kept_w"), F.lit(0)) / F.col("_tot_w"), 6
            ).alias("frac_weight"),
        ]
    return sel.select(*out_cols)


def moore_lewis_select(
    df,
    target_df,
    general_df=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 200,
    threshold: float = 0.0,
):
    """Moore–Lewis cross-entropy-difference data selection (Moore &
    Lewis 2010, "Intelligent Selection of Language Model Training Data"
    — the classic in-domain selection recipe; XenC / modern "domain
    upsampling" pipelines implement exactly this): score every candidate
    document under an IN-DOMAIN LM trained on ``target_df`` and a
    GENERAL LM trained on ``general_df`` (default: the candidate corpus
    itself), and keep documents whose per-token log-probability delta

        ce_delta = logp_target − logp_general

    clears ``threshold`` — text that looks more like the target domain
    than like the background corpus.  The perplexity-space complement of
    ``dsir_log_weights`` (hashed n-gram importance ratios): DSIR weights
    by feature-count ratios, Moore–Lewis by LM score difference; both
    select FOR a target slice.

    Both LMs are the corpus-trained char-bigram model of
    ``char_bigram_lm_scores`` (add-one smoothing, ``prefix_len``-bounded
    scoring), so the whole operator stays relational and carries an
    exact DuckDB twin.

    Scale shape: two bounded model-table builds (each one aggregate over
    its training slice, ≤ |alphabet|² rows, broadcast back) + ONE
    scoring pass per model over the candidates; the join of the two
    score tables is id-keyed.  No full-size shuffle beyond the per-doc
    aggregates.

    Output: (id, n_bigrams, logp_target, logp_general, ce_delta, keep)
    for candidates with ≥ 2 chars in the prefix; ce_delta rounded 6 dp.
    """
    sc_t = char_bigram_lm_scores(
        df, text_col, id_col, prefix_len, train_df=target_df
    ).select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.col("avg_logp").alias("logp_target"),
    )
    sc_g = char_bigram_lm_scores(
        df, text_col, id_col, prefix_len,
        train_df=general_df if general_df is not None else df,
    ).select(F.col(id_col), F.col("avg_logp").alias("logp_general"))
    delta = F.round(F.col("logp_target") - F.col("logp_general"), 6)
    return (
        sc_t.join(sc_g, id_col)
        .select(
            id_col,
            "n_bigrams",
            "logp_target",
            "logp_general",
            delta.alias("ce_delta"),
            (delta >= F.lit(float(threshold))).alias("keep"),
        )
    )


def filter_ablation(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    min_distinct_pct: int = 40,
    min_mean_wordlen_tenths: int = 44,
    min_chars: int = 200,
):
    """Quality-filter ABLATION matrix — the table a pipeline owner reads
    before composing gates (the C4/Gopher-paper ablation convention):
    for each of four deterministic filters, how many docs it kills, how
    many it ALONE kills (its marginal value — a filter with zero unique
    kills is redundant given the others), and the union kill count.

    Filters (every threshold an exact integer cross-multiplication — no
    float comparisons, so the oracle is tolerance-free):
      - ``few_words``: word count < ``min_words``
      - ``low_diversity``: 100·distinct_words < ``min_distinct_pct``·words
      - ``short_words``: 10·token_chars < ``min_mean_wordlen_tenths``·words
        (mean word length below the threshold tenths)
      - ``short_doc``: char length < ``min_chars``

    Output: (filter, n_docs, n_fail, n_unique_fail, n_fail_any,
    pct_fail) — one row per filter; n_docs / n_fail_any repeat (the
    report-table convention); pct_fail is the exact-ratio double,
    emitted unrounded.

    Scale: ONE corpus pass computing four integer stats per doc
    (map-side, no shuffle), one global aggregate (nine conditional
    sums), then the filter sweep explodes a 4-element literal over the
    single summary row — corpus-independent after the first aggregate.
    No window, no join.
    """
    toks = tokens(F.col(text_col))
    stats = df.select(
        F.size(toks).cast("bigint").alias("nw"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("nd"),
        F.length(F.col(text_col)).cast("bigint").alias("nc"),
        F.length(F.regexp_replace(F.col(text_col), r"\W", "")).cast(
            "bigint"
        ).alias("tc"),
    )
    f1 = F.col("nw") < min_words
    f2 = F.lit(100) * F.col("nd") < F.lit(min_distinct_pct) * F.col("nw")
    f3 = (
        F.lit(10) * F.col("tc")
        < F.lit(min_mean_wordlen_tenths) * F.col("nw")
    )
    f4 = F.col("nc") < min_chars
    flags = stats.select(
        f1.alias("f1"), f2.alias("f2"), f3.alias("f3"), f4.alias("f4")
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    only = {
        "f1": F.col("f1") & ~F.col("f2") & ~F.col("f3") & ~F.col("f4"),
        "f2": F.col("f2") & ~F.col("f1") & ~F.col("f3") & ~F.col("f4"),
        "f3": F.col("f3") & ~F.col("f1") & ~F.col("f2") & ~F.col("f4"),
        "f4": F.col("f4") & ~F.col("f1") & ~F.col("f2") & ~F.col("f3"),
    }
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        cnt(F.col("f1") | F.col("f2") | F.col("f3") | F.col("f4")).alias(
            "n_any"
        ),
        *[cnt(F.col(f)).alias(f"n_{f}") for f in ("f1", "f2", "f3", "f4")],
        *[cnt(only[f]).alias(f"u_{f}") for f in ("f1", "f2", "f3", "f4")],
    )
    names = {
        "f1": "few_words",
        "f2": "low_diversity",
        "f3": "short_words",
        "f4": "short_doc",
    }
    rows = F.array(
        *[
            F.struct(
                F.lit(names[f]).alias("filter"),
                F.col(f"n_{f}").alias("n_fail"),
                F.col(f"u_{f}").alias("n_unique_fail"),
            )
            for f in ("f1", "f2", "f3", "f4")
        ]
    )
    return (
        agg.select("n_docs", "n_any", F.explode(rows).alias("r"))
        .select(
            F.col("r.filter").alias("filter"),
            "n_docs",
            F.col("r.n_fail").alias("n_fail"),
            F.col("r.n_unique_fail").alias("n_unique_fail"),
            F.col("n_any").alias("n_fail_any"),
            (F.col("r.n_fail") / F.col("n_docs")).alias("pct_fail"),
        )
        .orderBy("filter")
    )


def blocklist_screen(
    df,
    terms: "tuple[str, ...]",
    text_col: str = "text",
    group_col: str = "source",
):
    """Blocklist screen — the C4 §2.2 "bad words" gate (Raffel et al.
    2020 drop any page containing a listed word; the RefinedWeb/FineWeb
    pipelines keep the same gate with tuned lists): per group, how many
    documents a word-boundary blocklist kills, plus the hit volume —
    the calibration table read before committing a list.

    A hit is a whole TOKEN equal to a blocklist term after the corpus
    tokenization (lowercase, ``\\W+`` splits) — the word-boundary
    convention, so "sort" never fires inside "resorting".  All outputs
    are exact integers (kill_rate is the exact-ratio double).

    Output: (group, n_docs, n_killed, kill_rate, total_hits), ordered.

    Scale: ONE corpus pass — per-row hits are a bounded array filter
    against the inlined term list (no explode, no join), then one
    map-side-combined aggregate on the group key.  A production-sized
    blocklist (10k+ terms) would broadcast-join the exploded token
    table or compile an Aho-Corasick regex instead; the plan shape
    (narrow map + one small aggregate) is the same.
    """
    lowered = tuple(t.lower() for t in terms)
    toks = tokens(F.col(text_col))
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*lowered))
    )
    per_doc = df.select(
        F.col(group_col).alias("grp"), hits.alias("hits")
    )
    return (
        per_doc.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_killed"),
            F.sum("hits").cast("bigint").alias("total_hits"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_killed",
            (F.col("n_killed") / F.col("n_docs")).alias("kill_rate"),
            "total_hits",
        )
        .orderBy(group_col)
    )


def heavy_hitter_phrases(
    df,
    n: int = 8,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus-wide top repeated phrases — the memorization/boilerplate
    screen (Lee et al. 2022 §5 and Carlini et al. 2023 both key their
    analyses on high-document-frequency long n-grams: boilerplate,
    licenses, templates — exactly what a dedup pass should have
    removed and a memorization audit looks for): the ``top_k``
    word ``n``-grams by DISTINCT-document frequency, with total
    occurrence counts.

    Complements ``shingle_df_histogram`` (hashed shingles, histogram
    only) by emitting the actual offending PHRASES, and
    ``gopher_repetition`` (per-doc, intra-doc) with the corpus-wide
    cross-doc view.

    Output: (rank, phrase, n_docs, n_occurrences), rank 1..top_k by
    n_docs desc (phrase tiebreak).

    Scale: one explode to the (doc, phrase) stream, one exact
    (phrase → distinct-doc, occurrence) aggregate (the distinct is a
    two-level aggregate on the phrase key — map-side partial combine),
    then TakeOrdered for the bounded top-k; the rank window runs over
    that ≤top_k-row frame.  At 100 TB the phrase key would be
    pre-hashed for the shuffle and the string re-attached from a
    one-pass sample join; the shape is identical.
    """
    # Materialize the token array ONCE in its own projection (the
    # documented lambda-inlining discipline, r17 fix): referencing the
    # tokenizer expression inside the per-position transform lambda
    # re-ran the regex split PER GRAM POSITION.
    toks_df = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_ws")
    )
    ws = F.col("_ws")
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = toks_df.select(
        F.col(id_col), F.explode(grams).alias("phrase")
    )
    # Explicit two-level aggregate instead of countDistinct+count in one
    # agg: the single-agg form plans an Expand that DOUBLES the exploded
    # (doc, 8-gram-string) stream before the shuffle (one copy per
    # aggregate branch); per-(phrase, doc) partial aggregation first,
    # then the per-phrase rollup, shuffles each distinct (phrase, doc)
    # pair once (r17 optimization, guide §2.3 — shuffle fewer bytes).
    # n_docs = count of (phrase, doc) groups ≡ countDistinct(doc);
    # n_occurrences = sum of per-doc occurrence counts ≡ count(*).
    agg = (
        exploded.groupBy("phrase", id_col)
        .agg(F.count(F.lit(1)).alias("_occ"))
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_occ").cast("bigint").alias("n_occurrences"),
        )
    )
    top = agg.orderBy(
        F.col("n_docs").desc(), F.col("phrase")
    ).limit(top_k)
    # bounded-frame window (≤ top_k rows post-limit)
    win = Window.orderBy(F.col("n_docs").desc(), F.col("phrase"))
    return top.withColumn("rank", F.row_number().over(win)).select(
        "rank", "phrase", "n_docs", "n_occurrences"
    )


def distinct_ngrams(
    df,
    ns: "tuple[int, ...]" = (1, 2, 3),
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct-n diversity table (the distinct-1/2 metric of Li et al.
    2016, generalised by the Texygen suite of Zhu et al. 2018) — THE
    standard mode-collapse screen for generated/synthetic data pools:
    per ``group_col`` and n-gram order, the share of n-gram TOKENS that
    are distinct TYPES, next to the hapax share (types seen exactly
    once).  A synthetic source whose distinct_ratio sits far below the
    organic sources' is recycling templates; read next to
    ``heavy_hitter_phrases`` (which names the offending phrases) and
    ``gopher_repetition`` (the intra-doc view).

    Output: one row per (group, n) — (group, n, total_ngrams,
    distinct_ngrams, distinct_ratio, singleton_ratio); ratios are
    single divisions of exact integer counts (unrounded, the
    kanon_audit convention), singleton_ratio = hapax types / types.

    Scale: ONE corpus pass — every order's grams emit from one
    tokenize via a tagged flatten, so the doc scan is not repeated per
    n.  Two-level exact aggregate: (group, n, gram) counts with
    map-side partial combine (the shuffle carries one long per
    distinct gram, the same key shape heavy_hitter_phrases ships),
    then the bounded (group, n) rollup.  No window, no join, no
    collect; at 100 TB the gram key would be pre-hashed (xxhash64)
    for the shuffle — counts are unchanged because only identity,
    not the string, matters here.
    """
    # Materialize the token array ONCE in its own projection (the
    # documented lambda-inlining discipline, r17 fix): referencing the
    # tokenizer expression inside the per-position transform lambdas
    # re-ran the regex split PER GRAM POSITION — ~600 tokenizations per
    # 200-word doc; measured 14.1 s -> 1.5 s at sf0.1.
    toks_df = df.select(
        F.col(group_col).alias("grp"), tokens(F.col(text_col)).alias("_ws")
    )
    ws = F.col("_ws")

    # closure factory: a 2-param lambda would trip F.transform's
    # (element, index) arity detection and bind the index to n
    def _tag(n):
        return lambda i: F.struct(
            F.lit(int(n)).cast("int").alias("n"),
            F.concat_ws(" ", F.slice(ws, i, n)).alias("gram"),
        )

    tagged = F.flatten(
        F.array(
            *[
                F.when(
                    F.size(ws) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                        _tag(n),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<n:int,gram:string>>")
                )
                for n in ns
            ]
        )
    )
    exploded = toks_df.select(
        "grp", F.explode(tagged).alias("_t")
    ).select("grp", F.col("_t.n").alias("n"), F.col("_t.gram").alias("gram"))
    counts = exploded.groupBy("grp", "n", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    return (
        counts.groupBy("grp", "n")
        .agg(
            F.sum("_c").cast("bigint").alias("total_ngrams"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_ngrams"),
            F.sum(F.when(F.col("_c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("_hapax"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "total_ngrams",
            "distinct_ngrams",
            (
                F.col("distinct_ngrams")
                / F.greatest(F.col("total_ngrams"), F.lit(1))
            ).alias("distinct_ratio"),
            (
                F.col("_hapax")
                / F.greatest(F.col("distinct_ngrams"), F.lit(1))
            ).alias("singleton_ratio"),
        )
    )


def boilerplate_strip(
    df,
    df_ratio: float = 0.5,
    min_docs: int = 2,
    line_sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
):
    """Per-source boilerplate-line removal — the CCNet/RefinedWeb
    pre-dedup pass (Wenzek et al. 2020 §3.1 strip the most frequent
    paragraphs per shard; Penedo et al. 2023 apply the same
    line-frequency rule before MinHash): a line is boilerplate inside
    its source when it appears in ≥ ``min_docs`` documents AND its
    document-frequency ratio within that source reaches ``df_ratio`` —
    navigation chrome, cookie banners, license headers, footers.
    Cross-source collisions stay (a line common in src A but rare in
    src B survives in B, matching the per-shard convention).

    Documents reassemble from their surviving lines in original order
    (position-sorted ordered concat); a fully-boilerplate document
    comes back as an empty string, not NULL — it is still a corpus row.

    Output: (id, group, n_lines, n_boiler_lines, clean_text).

    Scale: one posexplode to the line stream, one exact distinct-doc
    aggregate on the (source, line) key (at 100 TB the key would be the
    line's 64-bit hash with strings never shuffled — same shape), the
    per-source doc totals are a bounded BROADCAST, the boilerplate
    verdict rejoins the line stream as a (source, line) equi-join, and
    the reassembly is one per-doc aggregate (array_sort of bounded
    per-doc line lists, no window).
    """
    lines = df.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias(
            "pos", "line"
        ),
    )
    grp = df.groupBy(group_col).agg(
        F.countDistinct(id_col).alias("_n_docs_grp")
    )
    line_df = lines.groupBy(group_col, "line").agg(
        F.countDistinct(id_col).alias("_line_docs")
    )
    boiler = (
        line_df.join(F.broadcast(grp), group_col)
        .where(
            (F.col("_line_docs") >= F.lit(int(min_docs)))
            & (
                F.col("_line_docs") * F.lit(1.0) / F.col("_n_docs_grp")
                >= F.lit(float(df_ratio))
            )
        )
        .select(group_col, "line", F.lit(True).alias("_is_boiler"))
    )
    marked = lines.join(boiler, [group_col, "line"], "left")
    return (
        marked.groupBy(id_col, group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                F.col("_is_boiler").isNotNull().cast("bigint")
            ).alias("n_boiler_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_is_boiler").isNull(),
                                F.struct(
                                    F.col("pos").alias("p"),
                                    F.col("line").alias("l"),
                                ),
                            )
                        )
                    ),
                    lambda x: x["l"],
                ),
                line_sep,
            ).alias("clean_text"),
        )
        .select(
            id_col, group_col, "n_lines", "n_boiler_lines", "clean_text"
        )
    )


def quality_length_bias(
    df,
    bucket_tokens: int = 16,
    max_bucket: int = 8,
    threshold: float = 0.5,
    text_col: str = "text",
    checkpoint: bool = True,
) -> DataFrame:
    """Length-bias audit of the quality gate — the known failure mode
    of quality classifiers (Gopher §A.2 and the DCLM ablations both
    note quality signals correlate with document length; a gate that
    kills short docs for being SHORT, not bad, silently reshapes the
    length distribution): per token-length bucket, the mean composite
    quality score DECOMPOSED into its explicit length term vs its
    content-only terms (stopword + punctuation), next to the kill rate
    at the production threshold.

    Reading it: if kill_rate falls with length while
    mean_content_score is flat, the gate is length-biased — raise the
    threshold on the content terms instead, or length-normalize.

    Exactness: every per-row term quantizes to micro-unit BIGINTs
    before the bucket sums (order-free); means/rates are single
    divisions.  The kill verdict compares the round-6 composite to the
    threshold — exactly ``corpus_filter``'s gate.

    Output: (bucket, tok_lo, n_docs, share, mean_score,
    mean_length_term, mean_content_score, kill_rate), ordered by
    bucket; bucket = min(tokens div bucket_tokens, max_bucket).

    Scale: ONE narrow corpus pass into a map-side-combined aggregate
    on the bounded bucket key; the bounded (≤ max_bucket+1 row)
    aggregate is lazily checkpointed so the grand-total branch reads
    it instead of re-scanning the corpus (checkpoint=False un-blinds
    plan tests); the 1-row total broadcasts back for the share.  No
    join with the corpus, no window.
    """
    t = F.col(text_col)
    score = quality_score(t)
    length_term = F.least(token_count(t) / F.lit(100.0), F.lit(1.0))
    content = (
        F.least(stopword_ratio(t) * 4, F.lit(1.0))
        + (F.lit(1.0) - F.least(punct_ratio(t) * 4, F.lit(1.0)))
    ) / 2
    bucket = F.least(
        F.floor(token_count(t) / F.lit(int(bucket_tokens))),
        F.lit(int(max_bucket)),
    ).cast("bigint")
    rows = df.select(
        bucket.alias("bucket"),
        F.round(score * F.lit(1_000_000.0)).cast("bigint").alias("s_u"),
        F.round(length_term * F.lit(1_000_000.0))
        .cast("bigint")
        .alias("l_u"),
        F.round(content * F.lit(1_000_000.0)).cast("bigint").alias("c_u"),
        (score < F.lit(float(threshold))).cast("bigint").alias("kill"),
    )
    agg = rows.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("s_u").alias("_ss"),
        F.sum("l_u").alias("_sl"),
        F.sum("c_u").alias("_sc"),
        F.sum("kill").alias("_k"),
    )
    if checkpoint:
        agg = agg.localCheckpoint(eager=False)
    tot = agg.agg(F.sum("n_docs").alias("_t"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.col("bucket") * F.lit(int(bucket_tokens))).alias("tok_lo"),
            "n_docs",
            F.round(F.col("n_docs") * F.lit(1.0) / F.col("_t"), 6).alias(
                "share"
            ),
            F.round(
                F.col("_ss") / F.lit(1_000_000.0) / F.col("n_docs"), 6
            ).alias("mean_score"),
            F.round(
                F.col("_sl") / F.lit(1_000_000.0) / F.col("n_docs"), 6
            ).alias("mean_length_term"),
            F.round(
                F.col("_sc") / F.lit(1_000_000.0) / F.col("n_docs"), 6
            ).alias("mean_content_score"),
            F.round(F.col("_k") * F.lit(1.0) / F.col("n_docs"), 6).alias(
                "kill_rate"
            ),
        )
        .orderBy("bucket")
    )
