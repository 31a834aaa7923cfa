"""Training-data-pipeline queries: dedup, text analysis, similarity search,
multimodal plumbing, and the document-extraction pipeline over the driver's
``documents`` / ``embeddings`` tables.

Same conventions as ``plans.relational``: every SQL-expressible query has an
exact DuckDB twin (identical aliases; rounding before comparison; integer
sums cast to BIGINT because DuckDB widens to HUGEINT).  Queries that depend
on engine-specific hashing (xxhash64 LSH, SimHash) or pandas UDFs have no
SQL twin — the driver records the weaker rows-only check for those, and the
pytest suite pins their semantics instead.

Subset filters (``doc_id % 10 = 0`` etc.) keep pairwise oracles cheap at any
scale factor while leaving the Spark plan shape identical to the full run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline2_0_spark.functions import (
    dedup,
    multimodal,
    retrieval,
    similarity,
    text,
)
from etl_pipeline2_0_spark.pipeline import transform_documents
from etl_pipeline2_0_spark.sources.tables import load_table

# ------------------------------------------------------------- exact dedup -


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).select("doc_id", "content_hash")


SQL_DEDUP_EXACT = (
    "SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash "
    "FROM documents GROUP BY md5(text)"
)


def q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Prefix-keyed grouping so the synthetic corpus (no exact dups) still
    # produces non-trivial duplicate groups.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 20).alias("text")
    )
    return dedup.duplicate_groups(docs)


SQL_DUP_GROUPS = """
SELECT md5(SUBSTRING(text, 1, 20)) AS content_hash, COUNT(*) AS dup_count,
       MIN(doc_id) AS keeper_id
FROM documents GROUP BY md5(SUBSTRING(text, 1, 20)) HAVING COUNT(*) > 1
"""


# ----------------------------------------------------------- n-gram dedup -


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return dedup.jaccard_pairs(docs, k=3, threshold=0.01).select(
        "id_a", "id_b", "jaccard"
    )


SQL_NGRAM_JACCARD = r"""
WITH docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents WHERE doc_id % 10 = 0
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM toks
), sh0 AS (
  SELECT id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.01
"""


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # xxhash64-based — no DuckDB twin; pytest pins recall vs exact Jaccard.
    # Full corpus (no subset): 8 bands × 2 rows ≈ 90% recall at J=0.5
    # (empirically 100% on this corpus — near-dups are all high-J) while the
    # J≈0.01 noise floor collides at ~8e-4, so candidates stay ~linear.
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(
        docs, k=3, num_hashes=16, bands=8, threshold=0.5
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pandas-UDF SimHash — no DuckDB twin.  max_hamming=3 (the family
    # default and the portable twin's setting): the earlier radius-20
    # geometry violated the pigeonhole exactness precondition
    # (max_hamming < blocks) that hamming_pairs now enforces.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return dedup.simhash_near_duplicates(docs, max_hamming=3, blocks=4)


# ------------------------------------------------------------- similarity -


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 8), k=5)


SQL_ANN_TOPK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
scored AS (
  SELECT query_id, a.vec_id AS neighbor_id,
    ROUND(list_inner_product(qv, a.v) /
      (SQRT(list_inner_product(qv, qv)) * SQRT(list_inner_product(a.v, a.v))), 6)
      AS cosine_sim
  FROM e a CROSS JOIN q WHERE a.vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine_sim,
  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rnk
FROM scored QUALIFY rnk <= 5
"""


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k-NN weak supervision over the embeddings table's label column:
    # majority label of each query's 5 exact cosine neighbors.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_label_vote(emb, emb.where(F.col("vec_id") < 8), k=5)


SQL_KNN_LABEL_VOTE = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
scored AS (
  SELECT query_id, a.vec_id AS neighbor_id, a.label AS nbr_label,
    ROUND(list_inner_product(qv, a.v) /
      (SQRT(list_inner_product(qv, qv)) * SQRT(list_inner_product(a.v, a.v))), 6)
      AS cosine_sim
  FROM e a CROSS JOIN q WHERE a.vec_id <> query_id
), topk AS (
  SELECT query_id, nbr_label
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM scored)
  WHERE rnk <= 5
), votes AS (
  SELECT query_id, nbr_label, COUNT(*) AS votes
  FROM topk GROUP BY query_id, nbr_label
)
SELECT query_id, CAST(nbr_label AS BIGINT) AS pred_label, votes
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY votes DESC, nbr_label ASC NULLS LAST) AS r
      FROM votes)
WHERE r = 1
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic RP-LSH.  The md5-derived plane coefficients (r8) are
    # reproducible in ANSI SQL, so this has a full DuckDB twin: the oracle
    # recomputes the signatures via the same md5 formula and applies the
    # bit-match filter directly (banding is pigeonhole-lossless w.r.t.
    # that filter, so the naive form is the same result set).
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.rp_lsh_topk(
        emb, emb.where(F.col("vec_id") < 8), k=5, min_bit_matches=10
    )


# Signature CTE shared by the LSH twins: sig[p] = sign bit of the dot
# product against plane p, coeff(p, i) exactly as similarity._rp_plane_coeffs
# computes it driver-side (same md5, same 60-bit hex prefix, same IEEE
# double ops; list_reduce is the same left fold as Spark's F.aggregate).
_SQL_SIG_CTE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sig AS (
  SELECT vec_id, v,
    list_transform(range(16), p ->
      CASE WHEN list_reduce(
        list_transform(v, (x, i) ->
          x * ((CAST('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
                 CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) % 2000003)
               / 1000001.5 - 1)),
        (a, b) -> a + b) >= 0
      THEN 1 ELSE 0 END) AS sig
  FROM e
),
q AS (SELECT vec_id AS query_id, v AS qv, sig AS qsig FROM sig WHERE vec_id < 8),
lsh_scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
    ROUND(list_inner_product(qv, c.v) /
      (SQRT(list_inner_product(qv, qv)) * SQRT(list_inner_product(c.v, c.v))), 6)
      AS cosine_sim
  FROM sig c CROSS JOIN q
  WHERE c.vec_id <> query_id
    AND length(list_filter(range(16), p -> qsig[p + 1] = c.sig[p + 1])) >= 10
),
lsh_topk AS (
  SELECT query_id, neighbor_id, cosine_sim,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rnk
  FROM lsh_scored QUALIFY rnk <= 5
)
"""

SQL_ANN_LSH_TOPK = _SQL_SIG_CTE + """
SELECT query_id, neighbor_id, cosine_sim, rnk FROM lsh_topk
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ANN quality metric: per-query recall@k of the LSH candidate path
    # against the exact cosine ground truth — converts the hashed family's
    # quality from "shape pinned" to "measured" (and, with the md5-portable
    # planes, the whole metric is DuckDB-oracle-able).  Deterministic: both
    # sides share the fixed hashing and the (sim desc, neighbor_id) tiebreak.
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = similarity.rp_lsh_topk(emb, q, k=5, min_bit_matches=10).select(
        "query_id", "neighbor_id"
    )
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0), 6).alias(
                "recall_at_k"
            ),
        )
    )


SQL_ANN_RECALL = _SQL_SIG_CTE + """
, exact_topk AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT query_id, c.vec_id AS neighbor_id,
      ROUND(list_inner_product(qv, c.v) /
        (SQRT(list_inner_product(qv, qv)) * SQRT(list_inner_product(c.v, c.v))), 6)
        AS cosine_sim,
      ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY ROUND(list_inner_product(qv, c.v) /
          (SQRT(list_inner_product(qv, qv)) * SQRT(list_inner_product(c.v, c.v))), 6)
          DESC, c.vec_id) AS rnk
    FROM e c CROSS JOIN q WHERE c.vec_id <> query_id
  ) WHERE rnk <= 5
),
hits AS (
  SELECT l.query_id, COUNT(*) AS n_hits
  FROM lsh_topk l JOIN exact_topk x
    ON l.query_id = x.query_id AND l.neighbor_id = x.neighbor_id
  GROUP BY l.query_id
)
SELECT q.query_id, ROUND(COALESCE(n_hits, 0) / 5.0, 6) AS recall_at_k
FROM q LEFT JOIN hits ON q.query_id = hits.query_id
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF coarse-quantized ANN — xxhash64-seeded centroids → no DuckDB twin;
    # pytest pins recall vs the exact brute-force baseline.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.where(F.col("vec_id") < 8), k=5, n_centroids=16, n_probe=4
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 4 == 0)
    # min_bit_matches=0 → exact pairwise within the subset (the LSH pruning
    # path is exercised by q_ann_lsh_topk; here the oracle needs exactness).
    return similarity.embedding_near_duplicates(
        emb, threshold=0.3, min_bit_matches=0
    )


SQL_EMBED_NEARDUP = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id % 4 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_inner_product(a.v, b.v) /
    (SQRT(list_inner_product(a.v, a.v)) * SQRT(list_inner_product(b.v, b.v))), 6)
    AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_inner_product(a.v, b.v) /
  (SQRT(list_inner_product(a.v, a.v)) * SQRT(list_inner_product(b.v, b.v))) >= 0.3
"""


# ----------------------------------------------------------- text analysis -

_MARKER_SQL = {
    lang: "|".join(markers) for lang, markers in text.LANG_MARKERS.items()
}


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(text.lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_LANG_ID_COUNTS = rf"""
WITH scored AS (
  SELECT
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["en"]})\b')) AS en,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["es"]})\b')) AS es,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["fr"]})\b')) AS fr,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["de"]})\b')) AS de
  FROM documents
)
SELECT CASE
    WHEN GREATEST(en, es, fr, de) = 0 THEN 'und'
    WHEN en = GREATEST(en, es, fr, de) THEN 'en'
    WHEN es = GREATEST(en, es, fr, de) THEN 'es'
    WHEN fr = GREATEST(en, es, fr, de) THEN 'fr'
    ELSE 'de' END AS pred_lang,
  COUNT(*) AS n_docs
FROM scored GROUP BY 1
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        text.token_count(t).cast("bigint").alias("n_tokens"),
        F.round(text.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(text.stopword_ratio(t), 6).alias("stopword_ratio"),
        text.quality_score(t).alias("quality"),
    )


_STOPS_SQL = ", ".join(f"'{s}'" for s in text.EN_STOPWORDS)

SQL_QUALITY_SCORES = rf"""
WITH base AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                    x -> length(x) > 0)) AS n_tokens,
    regexp_replace(text, '[ \x09\x0A\x0D\x0B\x0C]+', '', 'g') AS compact,
    list_filter(regexp_split_to_array(lower(text), '\W+'),
                x -> length(x) > 0) AS toks
  FROM documents
), ratios AS (
  SELECT doc_id, n_tokens,
    CASE WHEN LENGTH(compact) = 0 THEN 0.0
         ELSE (LENGTH(compact) - LENGTH(regexp_replace(compact, '\W', '', 'g')))
              / LENGTH(compact) END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, x -> x IN ({_STOPS_SQL}))) / len(toks)
         END AS stopword_ratio
  FROM base
)
SELECT doc_id, n_tokens,
  ROUND(punct_ratio, 6) AS punct_ratio,
  ROUND(stopword_ratio, 6) AS stopword_ratio,
  ROUND((LEAST(n_tokens / 100.0, 1.0) + LEAST(stopword_ratio * 4, 1.0)
         + (1.0 - LEAST(punct_ratio * 4, 1.0))) / 3, 6) AS quality
FROM ratios
"""


def q_token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = text.token_count(F.col("text"))
    return (
        docs.select("source", wc.alias("wc"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("wc").alias("total_tokens"),
            (F.sum("wc").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        )
    )


SQL_TOKEN_STATS_BY_SOURCE = r"""
WITH t AS (
  SELECT source,
    len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                    x -> length(x) > 0)) AS wc
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(wc) AS BIGINT) AS total_tokens,
  CAST(SUM(wc) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM t GROUP BY source
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.fingerprint_md5(F.col("text")).alias("fingerprint")
    )


SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling-hash (winnowing, SIGMOD'03) copy detection with the portable
    # md5-prefix gram hash, so the ENTIRE pipeline — gram hashing, sliding
    # window min, doc-frequency skew guard, pair join — replays exactly in
    # DuckDB SQL (window functions over unnested grams).
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return dedup.winnow_overlap_pairs(
        docs, k=8, window=4, min_shared=5, max_doc_freq=10, portable_hash=True
    )


SQL_WINNOW_OVERLAP = """
WITH d AS (
  SELECT doc_id AS id, text FROM documents
  WHERE doc_id % 10 = 0 AND LENGTH(text) >= 8
), grams AS (
  SELECT id, i - 1 AS pos, substring(md5(substring(text, i, 8)), 1, 16) AS h
  FROM d, UNNEST(generate_series(1, GREATEST(LENGTH(text) - 7, 1))) AS t(i)
), wins AS (
  SELECT id, pos,
         MIN(h) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY id) AS n_grams
  FROM grams
), fps AS (
  SELECT DISTINCT id, fp FROM wins WHERE pos <= GREATEST(n_grams - 4, 0)
), filt AS (
  SELECT id, fp FROM (
    SELECT id, fp, COUNT(*) OVER (PARTITION BY fp) AS df FROM fps
  ) WHERE df <= 10
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
FROM filt a JOIN filt b ON a.fp = b.fp AND a.id < b.id
GROUP BY a.id, b.id
HAVING COUNT(*) >= 5
"""


def q_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BPE-ish token count (word pieces + length penalty) — native regex,
    # the pretraining cost estimator run per document.
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.bpe_ish_token_count(F.col("text")).cast("bigint").alias("bpe_tokens"),
    )


SQL_BPE_TOKEN_ESTIMATE = r"""
WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\W+'), x -> length(x) > 0) AS toks,
    LENGTH(regexp_replace(text, '[\w \x09\x0A\x0D\x0B\x0C]', '', 'g')) AS punct
  FROM documents
)
SELECT doc_id,
  CAST(list_sum(list_transform(toks, x -> CAST(CEIL(LENGTH(x) / 6.0) AS INT)))
       + punct AS BIGINT) AS bpe_tokens
FROM t
"""


# -------------------------------------------------------------- multimodal -


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Binary-column plumbing: opaque bytes + typed metadata struct
    # (n_bytes, checksum) — the schema every image/audio table shares.
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, content_col="text", id_col="doc_id")
    return media.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


SQL_MULTIMODAL_META = (
    "SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n_bytes, "
    "md5(text) AS checksum FROM documents"
)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapInPandas decode plumbing (deterministic fake decoder).  ORACLED
    # since r15: the payload is the document's UTF-8 bytes and the corpus
    # is ASCII (verified at every SF), so every emitted stat — byte
    # sum/min/max as code points, head hex, unrounded exact-ratio mean —
    # is reproducible in ANSI SQL; the Arrow plumbing is what the Spark
    # side exercises.
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, content_col="text", id_col="doc_id")
    return multimodal.fake_decode_features(media)


SQL_MEDIA_FEATURES = r"""
WITH pos AS (
  SELECT doc_id AS media_id, text,
         unnest(range(length(text))) AS i
  FROM documents
), per AS (
  SELECT media_id,
         CAST(SUM(unicode(substr(text, i + 1, 1))) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n,
         MIN(unicode(substr(text, i + 1, 1))) AS mn,
         MAX(unicode(substr(text, i + 1, 1))) AS mx
  FROM pos GROUP BY media_id
)
SELECT d.doc_id AS media_id,
       CAST(length(d.text) AS BIGINT) AS n_bytes,
       COALESCE(p.s / p.n, 0.0) AS byte_mean,
       CAST(COALESCE(p.mn, 0) AS INT) AS byte_min,
       CAST(COALESCE(p.mx, 0) AS INT) AS byte_max,
       lower(hex(encode(substr(d.text, 1, 8)))) AS head_hex
FROM documents d
LEFT JOIN per p ON p.media_id = d.doc_id
"""


# --------------------------------------------- document extraction pipeline -


def q_extract_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship A2 aggregate (items_by_type) over the
    document pipeline applied to the ``documents`` table as a corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), F.col("text").alias("content")
    )
    normalized, _ = transform_documents(spark, docs, with_report=False)
    return normalized.groupBy("type").agg(F.count(F.lit(1)).alias("n_records"))


# The synthetic corpus contains no HTML/JSON/base64 (word-soup text), so the
# pipeline's output is exactly the >5-char text-line records — asserted by
# this oracle; the mixed-format paths are pinned by the pytest goldens.
SQL_EXTRACT_DOC_STATS = (
    "SELECT 'text' AS type, COUNT(*) AS n_records FROM documents "
    "WHERE LENGTH(TRIM(text)) > 5"
)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII scrub (email/phone/IPv4 → typed tags).  The synthetic corpus has
    # no PII, so the query plants deterministic doc_id-derived PII first —
    # both engines build the identical input string, so the oracle checks
    # the actual redaction behavior, not a no-op.
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.substring("text", 1, 80),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0.7 tel 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-1234"),
    )
    return docs.select(
        "doc_id", text.redact_pii(planted).alias("redacted")
    )


SQL_PII_REDACT = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        SUBSTRING(text, 1, 80) || ' contact user' || CAST(doc_id AS VARCHAR)
          || '@mail.example.com or 10.' || CAST(doc_id % 200 AS VARCHAR)
          || '.0.7 tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
          || '-1234',
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
FROM documents
"""


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token-repetition quality signal (boilerplate/spam filter): fraction
    # of repeated tokens and top-token share per document.  Ratios divide
    # identical integers in both engines — exact, no tolerance needed.
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_stats(docs, "text", "doc_id")


SQL_REPETITION_SCORE = """
WITH cnt AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE) AS rep_ratio,
       MAX(c) / CAST(SUM(c) AS DOUBLE) AS top_share
FROM cnt GROUP BY doc_id
"""


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Web-corpus URL normalization: parse host/path/query-param, strip the
    # www. prefix, group by registrable domain — the dedup/attribution key
    # for crawled corpora.  URLs are synthesized deterministically from
    # (source, doc_id, lang) so both engines parse identical inputs;
    # parse_url is JVM-native, the oracle re-derives with RE2 regexes.
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("lang"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    return (
        docs.select(
            "doc_id",
            F.regexp_replace(host, r"^www\.", "").alias("domain"),
            F.parse_url(url, F.lit("PATH")).alias("path"),
            F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("ref_param").alias("n_langs"),
            F.min("path").alias("first_path"),
        )
    )


SQL_URL_NORMALIZE = r"""
WITH parsed AS (
  SELECT doc_id,
    regexp_replace(
      regexp_extract('https://www.' || source || '.example.com/docs/'
                       || CAST(doc_id AS VARCHAR) || '?ref=' || lang,
                     'https?://([^/?#]+)', 1),
      '^www\.', '') AS domain,
    regexp_extract('https://www.' || source || '.example.com/docs/'
                     || CAST(doc_id AS VARCHAR) || '?ref=' || lang,
                   'https?://[^/?#]+(/[^?#]*)', 1) AS path,
    lang AS ref_param
  FROM documents
)
SELECT domain, COUNT(*) AS n_urls,
       COUNT(DISTINCT ref_param) AS n_langs,
       MIN(path) AS first_path
FROM parsed GROUP BY domain
"""


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benchmark decontamination: every 97th doc plays the eval set; its
    # 3-token shingle containment against the rest of the corpus flags
    # leaked eval content.  Containment (not Jaccard) because a short eval
    # doc embedded in one long training doc is exactly the leak hunted.
    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return dedup.contamination_check(corpus, eval_set, k=3)


SQL_CONTAMINATION_CHECK = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM tok
), sh3 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh3 WHERE shingle IS NOT NULL
), corpus_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 <> 0
), eval_sh AS (
  SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 97 = 0
)
SELECT eval_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       ROUND(SUM(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS containment
FROM eval_sh e LEFT JOIN corpus_sh c USING (shingle)
GROUP BY eval_id
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental dedup: the %5==0 slice plays the NEW crawl batch, the rest
    # the existing corpus.  The generator's dup pairs are uniform over
    # doc_id, so ~2/5 of them straddle this split — non-vacuous at every SF.
    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    return dedup.jaccard_pairs_incremental(new_batch, corpus, k=3, threshold=0.3)


SQL_DEDUP_INCREMENTAL = r"""
WITH docs AS (
  SELECT doc_id AS id, doc_id % 5 = 0 AS is_new, lower(text) AS t FROM documents
), toks AS (
  SELECT id, is_new,
         list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, is_new, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM toks
), sh0 AS (
  SELECT id, is_new,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, is_new, shingle FROM sh0 WHERE shingle IS NOT NULL
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT n.id AS new_id, c.id AS corpus_id, COUNT(*) AS n_common
  FROM sh n JOIN sh c ON n.shingle = c.shingle
  WHERE n.is_new AND NOT c.is_new
  GROUP BY n.id, c.id
)
SELECT new_id, corpus_id,
       ROUND(n_common * 1.0 / (sn.n + sc.n - n_common), 6) AS jaccard
FROM inter JOIN sizes sn ON new_id = sn.id JOIN sizes sc ON corpus_id = sc.id
WHERE n_common * 1.0 / (sn.n + sc.n - n_common) >= 0.3
"""


# ------------------------------------------------- dedup clustering / tfidf -


def q_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Near-duplicate PAIRS → duplicate CLUSTERS: connected components over
    # the n-gram Jaccard graph (iterative min-label propagation; the DuckDB
    # twin computes the same fixpoint with a recursive CTE).
    # Subset is doc_id % 3 == 2: the generator's dup pairs are uniform over
    # doc_id, so a 1/3 subset keeps both endpoints of ~1/9 of pairs — 3-4
    # pairs at sf<=0.01, 26 at sf0.1 (the old %10 subset kept ZERO pairs
    # at driver scale, making the fixpoint check vacuous).
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 2)
    pairs = dedup.jaccard_pairs(docs, k=3, threshold=0.3)
    return dedup.connected_components(pairs)


SQL_DUP_COMPONENTS = r"""
WITH RECURSIVE docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents WHERE doc_id % 3 = 2
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM toks
), sh0 AS (
  SELECT id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.3
), und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, label) AS (
  SELECT DISTINCT src, src FROM und
  UNION
  SELECT u.src, r.label FROM reach r JOIN und u ON u.dst = r.node
)
SELECT node, CAST(MIN(label) AS BIGINT) AS component
FROM reach GROUP BY node
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    return text.tfidf_top_terms(docs, top_k=3)


SQL_TFIDF_TOP_TERMS = r"""
WITH docs AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id % 25 = 0
), toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), term_rows AS (
  SELECT doc_id, unnest(toks) AS term FROM toks
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM term_rows GROUP BY doc_id, term
), docfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM docs
), scored AS (
  SELECT doc_id, term,
         ROUND(tf * (ln((n_docs + 1) * 1.0 / (df + 1)) + 1.0), 6) AS score
  FROM tf JOIN docfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, score, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= 3
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Real-decoder demonstration: synthesize a deterministic 4x4 24-bit BMP
    # per embedding row (pixel bytes from the vector values), decode with
    # the built-in pure-Python BMP parser, aggregate the decoded facts.
    # Pandas-UDF payload synthesis → no DuckDB twin (rows-only check);
    # the decoder itself is golden-tested against independently built BMPs.
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 8 == 0)

    def make(batches):
        import numpy as np
        import pandas as pd

        from etl_pipeline2_0_spark.functions.multimodal import encode_bmp

        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                arr = np.clip(
                    np.asarray(vec, dtype=float)[:48] * 127 + 128, 0, 255
                ).astype(np.uint8)
                payloads.append(encode_bmp(np.resize(arr, (4, 4, 3))))
            yield pd.DataFrame({"media_id": pdf["vec_id"], "payload": payloads})

    media = emb.select("vec_id", "embedding").mapInPandas(
        make, "media_id long, payload binary"
    )
    return (
        multimodal.decode_image(media)
        .groupBy("format", "width", "height", "bits_per_pixel", "mode")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.avg("mean_luma"), 4).alias("avg_luma"),
        )
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Video-pipeline demonstration: synthesize a deterministic 6-frame BMPS
    # container per embedding row (frame pixels from vector slices), sample
    # every 2nd frame with the real container parser, aggregate the decoded
    # frame facts.  Pandas-UDF synthesis → rows-only (golden-pinned).
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 16 == 0)

    def make(batches):
        import numpy as np
        import pandas as pd

        from etl_pipeline2_0_spark.functions.multimodal import encode_bmp, encode_bmps

        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                arr = np.clip(
                    np.asarray(vec, dtype=float) * 127 + 128, 0, 255
                ).astype(np.uint8)
                frames = [
                    encode_bmp(np.resize(arr[j * 8 :], (2, 2, 3)))
                    for j in range(6)
                ]
                payloads.append(encode_bmps(frames))
            yield pd.DataFrame({"media_id": pdf["vec_id"], "payload": payloads})

    media = emb.select("vec_id", "embedding").mapInPandas(
        make, "media_id long, payload binary"
    )
    return (
        multimodal.sample_frames(media, every_nth=2)
        .groupBy("frame_idx", "width", "height")
        .agg(F.count(F.lit(1)).alias("n_frames_kept"))
    )


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The composed training-data quality gate (each term is individually
    # oracled; this query pins the composition).  Shared with the streaming
    # path: text.quality_gate is pure narrow expressions, batch ≡ stream.
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_gate(docs, "text", "doc_id")


SQL_CORPUS_FILTER = rf"""
WITH base AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                    x -> length(x) > 0)) AS n_tokens,
    regexp_replace(text, '[ \x09\x0A\x0D\x0B\x0C]+', '', 'g') AS compact,
    list_filter(regexp_split_to_array(lower(text), '\W+'),
                x -> length(x) > 0) AS toks,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["en"]})\b')) AS en,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["es"]})\b')) AS es,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["fr"]})\b')) AS fr,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["de"]})\b')) AS de
  FROM documents
), scored AS (
  SELECT doc_id, n_tokens,
    CASE
      WHEN GREATEST(en, es, fr, de) = 0 THEN 'und'
      WHEN en = GREATEST(en, es, fr, de) THEN 'en'
      WHEN es = GREATEST(en, es, fr, de) THEN 'es'
      WHEN fr = GREATEST(en, es, fr, de) THEN 'fr'
      ELSE 'de' END AS pred_lang,
    CASE WHEN LENGTH(compact) = 0 THEN 0.0
         ELSE (LENGTH(compact) - LENGTH(regexp_replace(compact, '\W', '', 'g')))
              / LENGTH(compact) END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, x -> x IN ({_STOPS_SQL}))) / len(toks)
         END AS stopword_ratio
  FROM base
), q AS (
  SELECT doc_id, pred_lang, n_tokens,
    ROUND((LEAST(n_tokens / 100.0, 1.0) + LEAST(stopword_ratio * 4, 1.0)
           + (1.0 - LEAST(punct_ratio * 4, 1.0))) / 3, 6) AS quality
  FROM scored
)
SELECT doc_id, pred_lang, n_tokens, quality
FROM q WHERE pred_lang = 'en' AND quality >= 0.5 AND n_tokens >= 20
"""


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The near-dup pipeline's END PRODUCT: the post-dedup corpus — every
    # doc except non-representative members of near-duplicate clusters
    # (keep the min-id doc per component).  pairs → components → anti-join.
    # %3==2 subset (not %10): keeps dup-pair endpoints so the anti-join
    # actually drops rows at driver scale — see q_dup_components.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 2)
    pairs = dedup.jaccard_pairs(docs, k=3, threshold=0.3)
    comp = dedup.connected_components(pairs)
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti").select("doc_id")


SQL_DEDUP_CANONICAL = r"""
WITH RECURSIVE docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents WHERE doc_id % 3 = 2
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM toks
), sh0 AS (
  SELECT id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.3
), und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, label) AS (
  SELECT DISTINCT src, src FROM und
  UNION
  SELECT u.src, r.label FROM reach r JOIN und u ON u.dst = r.node
), comp AS (
  SELECT node, MIN(label) AS component FROM reach GROUP BY node
)
SELECT d.id AS doc_id FROM docs d
WHERE d.id NOT IN (SELECT node FROM comp WHERE node <> component)
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-aware canonicalization: same pairs→components machinery as
    # dedup_canonical, but the keeper is the LONGEST cluster member (token
    # count, id tiebreak) — the curation-grade "keep the best copy" rule
    # rather than the arbitrary min-id.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 2)
    return dedup.dedup_keep_best(
        docs.select("doc_id", "text"), k=3, threshold=0.3
    ).select(
        "doc_id",
        F.col("component").cast("bigint").alias("component"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "keep",
    )


SQL_DEDUP_KEEP_BEST = r"""
WITH RECURSIVE docs AS (
  SELECT doc_id AS id, lower(text) AS t, text AS raw FROM documents
  WHERE doc_id % 3 = 2
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM toks
), sh0 AS (
  SELECT id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.3
), und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, label) AS (
  SELECT DISTINCT src, src FROM und
  UNION
  SELECT u.src, r.label FROM reach r JOIN und u ON u.dst = r.node
), comp AS (
  SELECT node, MIN(label) AS component FROM reach GROUP BY node
), wc AS (
  SELECT id, len(list_filter(regexp_split_to_array(raw, '[ \x09\x0A\x0D\x0B\x0C]+'),
                             x -> length(x) > 0)) AS n_tokens
  FROM docs
), allc AS (
  SELECT d.id, COALESCE(c.component, d.id) AS component
  FROM docs d LEFT JOIN comp c ON d.id = c.node
), ranked AS (
  SELECT f.id, f.component, w.n_tokens,
         ROW_NUMBER() OVER (PARTITION BY f.component
                            ORDER BY w.n_tokens DESC, f.id) AS rn
  FROM allc f JOIN wc w ON f.id = w.id
)
SELECT id AS doc_id, CAST(component AS BIGINT) AS component,
       CAST(n_tokens AS INT) AS n_tokens, rn = 1 AS keep
FROM ranked
"""


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus-level repeated-span removal (C4/RefinedWeb boilerplate op):
    # 3-word spans occurring in > 5 distinct docs are dropped from every
    # document; survivors reassembled in order.  See functions/dedup.py
    # dedup_spans for the scale design (no word-level shuffle; two
    # span-text-keyed shuffles total).
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_spans(
        docs.select("doc_id", "text"), k_words=3, max_doc_freq=5
    )


SQL_DEDUP_SPANS = r"""
WITH parts AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), spans AS (
  SELECT doc_id, seq.s AS span_id,
         array_to_string(w[(seq.s*3+1):(seq.s*3+3)], ' ') AS span_text
  FROM parts,
       unnest(range(0, greatest(CAST(ceil(len(w) / 3.0) AS BIGINT), 1))) AS seq(s)
), freq AS (
  SELECT span_text, COUNT(DISTINCT doc_id) AS df FROM spans GROUP BY span_text
), flagged AS (
  SELECT spans.doc_id, spans.span_id, spans.span_text, freq.df
  FROM spans JOIN freq USING (span_text)
)
SELECT doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN df > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       COALESCE(
         string_agg(CASE WHEN df <= 5 THEN span_text END, ' ' ORDER BY span_id),
         ''
       ) AS kept_text
FROM flagged
GROUP BY doc_id
"""


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-substring dedup (Lee et al. 2022): erase every token covered
    # by an 8-token run that also appears verbatim in another document —
    # all copies scrubbed, token-granular, df >= 2.  The distributed
    # k-gram formulation of the paper's suffix-array scan; see
    # functions/dedup.py dedup_substrings for the scale design.
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_substrings(docs.select("doc_id", "text"), k=8)


def _sql_dedup_substrings(k: int = 8) -> str:
    # Generated so ``k`` is single-sourced with the registry call.
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''),
                     '[ \\x09\\x0A\\x0D\\x0B\\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), grams AS (
  SELECT doc_id, s,
         array_to_string(toks[s : s + {k} - 1], ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(range(1, len(toks) - {k} + 2)) AS s
        FROM base WHERE len(toks) >= {k})
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), covered AS (
  SELECT DISTINCT doc_id, s + i AS pos
  FROM (SELECT doc_id, s, unnest(range(0, {k})) AS i
        FROM grams JOIN dup USING (gram))
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM base
), kept AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(t.tok, ' ' ORDER BY t.pos) AS kept_text
  FROM tok_rows t ANTI JOIN covered c
    ON t.doc_id = c.doc_id AND t.pos = c.pos
  GROUP BY t.doc_id
)
SELECT b.doc_id,
       CAST(len(b.toks) AS BIGINT) AS n_tokens,
       CAST(len(b.toks) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(k.kept_text, '') AS kept_text
FROM base b LEFT JOIN kept k USING (doc_id)
"""


SQL_DEDUP_SUBSTRINGS = _sql_dedup_substrings()


def q_dedup_spans_intra(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Within-document repeated-span trimming (template/nav-block removal):
    # keep the first occurrence of each 2-word span per doc.  Doc-keyed
    # shuffles only — see functions/dedup.py dedup_spans_intra.
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_spans_intra(docs.select("doc_id", "text"), k_words=2)


SQL_DEDUP_SPANS_INTRA = r"""
WITH parts AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), spans AS (
  SELECT doc_id, seq.s AS span_id,
         array_to_string(w[(seq.s*2+1):(seq.s*2+2)], ' ') AS span_text
  FROM parts,
       unnest(range(0, greatest(CAST(ceil(len(w) / 2.0) AS BIGINT), 1))) AS seq(s)
), first AS (
  SELECT doc_id, span_text, MIN(span_id) AS first_id, COUNT(*) AS n_occ
  FROM spans GROUP BY doc_id, span_text
)
SELECT doc_id,
       CAST(SUM(n_occ) AS BIGINT) AS n_spans,
       COUNT(*) AS n_unique,
       COALESCE(string_agg(span_text, ' ' ORDER BY first_id), '') AS dedup_text
FROM first
GROUP BY doc_id
"""


def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pretraining dataset mixing: resample the corpus toward a target
    # language distribution (en-heavy) with deterministic md5-threshold
    # sampling.  See functions/mixing.py for the scale design.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.mix_sources(
        docs,
        weights={"en": 0.5, "es": 0.15, "fr": 0.15, "de": 0.1, "zh": 0.1},
        total_rows=250,
        key_col="lang",
    )


SQL_MIX_SOURCES = r"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_group FROM documents GROUP BY lang
), rated AS (
  SELECT d.doc_id, d.lang,
         least(1.0,
               CASE d.lang
                 WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.15
                 WHEN 'de' THEN 0.1 WHEN 'zh' THEN 0.1 ELSE 0.0
               END * 250.0 / c.n_group) AS rate
  FROM documents d JOIN counts c USING (lang)
)
SELECT doc_id, lang, ROUND(rate, 6) AS keep_rate
FROM rated
WHERE '0' || substr(md5(doc_id || ':' || lang), 1, 15)
      < lpad(lower(to_hex(CAST(floor(rate * 1152921504606846976) AS BIGINT))), 16, '0')
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sequence packing: documents streamed in doc_id order within each
    # source, packed into ~256-token training sequences via the two-level
    # (bucketed) exclusive prefix sum — no single-source window partition.
    # bucket_width=1024 exercises the multi-bucket carry path even at the
    # small test SFs; the output is bucket-width-invariant.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.pack_sequences(docs, budget_tokens=256, bucket_width=1024)


SQL_PACK_SEQUENCES = r"""
WITH toks AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                         x -> length(x) > 0)) AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(floor(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
           AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, pack_id
"""


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic global corpus shuffle: md5-hash rank + rank%16 shard
    # assignment — a narrow projection, no Spark shuffle at all (the one
    # real shuffle happens at write time, partitioned by shard_id).
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return mixing.shuffle_shards(docs, n_shards=16)


SQL_SHUFFLE_SHARDS = """
SELECT doc_id, h AS shuffle_rank, CAST(h % 16 AS INT) AS shard_id
FROM (SELECT doc_id,
             CAST('0x' || substr(md5(doc_id || ':'), 1, 15) AS BIGINT) AS h
      FROM documents)
"""


def q_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pipeline observability: per-source breakdown of WHY documents fail
    # the corpus_filter quality gates (non-English / low quality / too
    # short) plus the survivors.  One narrow conditional-aggregation pass
    # over the same gate expressions corpus_filter applies — no extra
    # scan, no shuffle beyond the #sources-sized groupBy.
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    gates = docs.select(
        "source",
        (text.lang_id(t) != "en").alias("fail_lang"),
        (text.quality_score(t) < 0.5).alias("fail_quality"),
        (text.token_count(t) < 20).alias("fail_length"),
    )
    return gates.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("fail_lang").cast("bigint")).alias("n_fail_lang"),
        F.sum(F.col("fail_quality").cast("bigint")).alias("n_fail_quality"),
        F.sum(F.col("fail_length").cast("bigint")).alias("n_fail_length"),
        F.sum(
            (~F.col("fail_lang") & ~F.col("fail_quality") & ~F.col("fail_length"))
            .cast("bigint")
        ).alias("n_pass_all"),
    )


SQL_FILTER_AUDIT = rf"""
WITH base AS (
  SELECT source,
    len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                    x -> length(x) > 0)) AS n_tokens,
    regexp_replace(text, '[ \x09\x0A\x0D\x0B\x0C]+', '', 'g') AS compact,
    list_filter(regexp_split_to_array(lower(text), '\W+'),
                x -> length(x) > 0) AS toks,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["en"]})\b')) AS en,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["es"]})\b')) AS es,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["fr"]})\b')) AS fr,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["de"]})\b')) AS de
  FROM documents
), scored AS (
  SELECT source, n_tokens,
    CASE WHEN GREATEST(en, es, fr, de) = 0 THEN 'und'
         WHEN en = GREATEST(en, es, fr, de) THEN 'en'
         WHEN es = GREATEST(en, es, fr, de) THEN 'es'
         WHEN fr = GREATEST(en, es, fr, de) THEN 'fr'
         ELSE 'de' END AS pred_lang,
    CASE WHEN LENGTH(compact) = 0 THEN 0.0
         ELSE (LENGTH(compact) - LENGTH(regexp_replace(compact, '\W', '', 'g')))
              / LENGTH(compact) END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, x -> x IN ({_STOPS_SQL}))) / len(toks)
         END AS stopword_ratio
  FROM base
), gates AS (
  SELECT source,
    (pred_lang <> 'en') AS fail_lang,
    (ROUND((LEAST(n_tokens / 100.0, 1.0) + LEAST(stopword_ratio * 4, 1.0)
            + (1.0 - LEAST(punct_ratio * 4, 1.0))) / 3, 6) < 0.5) AS fail_quality,
    (n_tokens < 20) AS fail_length
  FROM scored
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN fail_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_lang,
  CAST(SUM(CASE WHEN fail_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_quality,
  CAST(SUM(CASE WHEN fail_length THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_length,
  CAST(SUM(CASE WHEN NOT fail_lang AND NOT fail_quality AND NOT fail_length
           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM gates
GROUP BY source
"""


# ------------------------------------------------- vocabulary / OOV rate -


def q_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenizer-coverage report: corpus top-V vocabulary (bounded,
    # broadcast) then per-source OOV occurrence rate.  V=16 against the
    # synthetic corpus's 31-token vocabulary so the OOV tail is non-trivial
    # at every SF.
    docs = load_table(spark, sf_dir, "documents")
    return text.oov_stats(docs, "text", "source", vocab_size=16)


SQL_VOCAB_OOV = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS tok
  FROM documents
), tc AS (
  SELECT source, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
), gc AS (
  SELECT tok, CAST(SUM(cnt) AS BIGINT) AS total FROM tc GROUP BY 1
), vocab AS (
  SELECT tok FROM gc ORDER BY total DESC, tok LIMIT 16
)
SELECT tc.source,
  CAST(SUM(cnt) AS BIGINT) AS total_tokens,
  CAST(SUM(CASE WHEN v.tok IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS oov_tokens,
  ROUND(SUM(CASE WHEN v.tok IS NULL THEN cnt ELSE 0 END) * 1.0 / SUM(cnt), 6)
    AS oov_rate
FROM tc LEFT JOIN vocab v ON tc.tok = v.tok
GROUP BY tc.source
"""


# --------------------------------------------- per-source quantile gate -


def q_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Adaptive quality gate: per-source 25th-percentile token-count
    # threshold, then kept/total under it — fixed global cutoffs either gut
    # clean sources or let noisy ones through.
    docs = load_table(spark, sf_dir, "documents")
    return text.quantile_filter_stats(
        docs, text.token_count(F.col("text")), "source", q=0.25
    )


SQL_QUANTILE_FILTER = r"""
WITH scored AS (
  SELECT source,
         len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                         x -> length(x) > 0)) AS score
  FROM documents
), thr AS (
  SELECT source, quantile_cont(score, 0.25) AS thr FROM scored GROUP BY 1
)
SELECT s.source,
  ROUND(MAX(t.thr), 6) AS threshold,
  COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN s.score >= t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  ROUND(SUM(CASE WHEN s.score >= t.thr THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
    AS kept_rate
FROM scored s JOIN thr t ON s.source IS NOT DISTINCT FROM t.source
GROUP BY s.source
"""


# ------------------------------------------- char-bigram LM quality proxy -


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet/KenLM-style perplexity proxy from a corpus-trained character
    # bigram LM with add-one smoothing; first 200 chars per doc.  The LM
    # tables broadcast (≤|alphabet|² rows) so scoring adds no full shuffle.
    docs = load_table(spark, sf_dir, "documents")
    return text.char_bigram_lm_scores(docs, "text", "doc_id", prefix_len=200)


SQL_LM_SCORE = r"""
WITH d AS (
  SELECT doc_id, lower(substring(text, 1, 200)) AS t FROM documents
  WHERE length(substring(text, 1, 200)) >= 2
), bg AS (
  -- DuckDB's generate_series cannot lateral-reference d.t; a fixed
  -- 1..prefix_len-1 series + length filter is equivalent.
  SELECT doc_id, substring(t, CAST(i AS INT), 2) AS big,
         substring(t, CAST(i AS INT), 1) AS ctx
  FROM d CROSS JOIN (SELECT unnest(range(1, 200)) AS i) s
  WHERE i <= length(t) - 1
), bc AS (
  SELECT big, COUNT(*) AS bc FROM bg GROUP BY 1
), cc AS (
  SELECT ctx, COUNT(*) AS cc FROM bg GROUP BY 1
), a AS (
  SELECT COUNT(DISTINCT substring(big, 2, 1)) AS alpha FROM bg
)
SELECT bg.doc_id,
  COUNT(*) AS n_bigrams,
  ROUND(AVG(ln((bc.bc + 1.0) / (cc.cc + a.alpha))), 6) AS avg_logp
FROM bg JOIN bc USING (big) JOIN cc ON bg.ctx = cc.ctx CROSS JOIN a
GROUP BY bg.doc_id
"""


# ----------------------------------------------- SemDeDup semantic dedup -


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup-style cluster-scoped embedding dedup (pandas-UDF centroid
    # assignment — no DuckDB twin; value-pinned by goldens).  Threshold
    # 0.35 because the synthetic embeddings top out at cosine ≈0.51 (same
    # reason q_embed_neardup probes at 0.3).
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, threshold=0.35, n_centroids=16)


# -------------------------------------------------- vocab-id tokenization -


def q_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Vocabulary-id encoding with V=16 (matching q_vocab_oov) so UNK=0
    # appears; the id array serializes to a canonical CSV string for the
    # cross-engine value hash (same convention as collect_values).
    docs = load_table(spark, sf_dir, "documents")
    out = text.tokenize_ids(docs, "text", "doc_id", vocab_size=16)
    return out.select(
        "doc_id",
        "n_tokens",
        F.concat_ws(
            ",", F.transform(F.col("token_ids"), lambda x: x.cast("string"))
        ).alias("token_ids"),
    )


SQL_TOKENIZE_IDS = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS ts
  FROM documents
), toks AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS ord
  FROM base
), gc AS (
  SELECT tok, COUNT(*) AS total FROM toks GROUP BY 1
), vocab AS (
  SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY total DESC, tok) AS INT) AS tid
  FROM (SELECT tok, total FROM gc ORDER BY total DESC, tok LIMIT 16) v
)
SELECT t.doc_id,
  COUNT(*) AS n_tokens,
  array_to_string(list(COALESCE(vb.tid, 0) ORDER BY t.ord), ',') AS token_ids
FROM toks t LEFT JOIN vocab vb ON t.tok = vb.tok
GROUP BY t.doc_id
"""


# ---------------------------------------------- dedup-rate observability -


def q_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Curation observability: per-source exact-duplication rate over a
    # 20-char prefix key (the synthetic corpus has no full-text dups, same
    # device as q_dup_groups).  One (source, key) aggregate with map-side
    # combine, then a #sources-row rollup — no join, no window.
    docs = load_table(spark, sf_dir, "documents")
    per_key = (
        docs.select("source", F.md5(F.substring("text", 1, 20)).alias("k"))
        .groupBy("source", "k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_key.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.round(
            (F.sum("c") - F.count(F.lit(1))).cast("double") / F.sum("c"), 6
        ).alias("dup_rate"),
    )


SQL_DEDUP_RATE_REPORT = """
WITH per_key AS (
  SELECT source, md5(SUBSTRING(text, 1, 20)) AS k, COUNT(*) AS c
  FROM documents GROUP BY 1, 2
)
SELECT source,
  CAST(SUM(c) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_unique,
  ROUND((SUM(c) - COUNT(*)) * 1.0 / SUM(c), 6) AS dup_rate
FROM per_key GROUP BY source
"""


# ------------------------------------------------- curriculum bucketing -


def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Easy→hard curriculum assignment by token count, quintile buckets —
    # thresholds reduce to one broadcast row, assignment is narrow; the
    # 100 TB ordering story is partition-by-bucket + hash rank, never a
    # global sort.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.curriculum_buckets(
        docs, text.token_count(F.col("text")).cast("double"), "doc_id",
        n_buckets=5,
    )


SQL_CURRICULUM_BUCKETS = r"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                              x -> length(x) > 0)) AS DOUBLE) AS score
  FROM documents
), thr AS (
  SELECT quantile_cont(score, [0.2, 0.4, 0.6, 0.8]) AS thrs FROM scored
)
SELECT doc_id, score,
  CAST(COALESCE(len(list_filter(thrs, t -> score >= t)), 0) AS INT) AS bucket
FROM scored CROSS JOIN thr
"""


# ----------------------------------------------- perceptual image dedup -


def _bmp_media_from_emb(emb: DataFrame) -> DataFrame:
    # Render any (vec_id, embedding) frame to BMP payload bytes — the
    # shared tail of _synth_bmp_media and the planted-pair recall row.
    def make(batches):
        import numpy as np
        import pandas as pd

        from etl_pipeline2_0_spark.functions.multimodal import encode_bmp

        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                arr = np.clip(
                    np.asarray(vec, dtype=float)[:48] * 127 + 128, 0, 255
                ).astype(np.uint8)
                payloads.append(encode_bmp(np.resize(arr, (4, 4, 3))))
            yield pd.DataFrame({"media_id": pdf["vec_id"], "payload": payloads})

    return emb.select("vec_id", "embedding").mapInPandas(
        make, "media_id long, payload binary"
    )


def _synth_bmp_media(spark: SparkSession, sf_dir: str, modulo: int) -> DataFrame:
    # Deterministic BMP synthesis from embedding rows (q_media_decode's
    # device): similar vectors render to similar 4x4 images, so the
    # perceptual-hash family has genuine near-dups to find.
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % modulo == 0
    )
    return _bmp_media_from_emb(emb)


def q_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Image-side corpus dedup: classic pHash (luma -> 32x32 -> DCT-II ->
    # 8x8 median bits) in one Arrow pass, then the SimHash pigeonhole
    # chunk equi-join at Hamming <= 6 (blocks=8 keeps the recall guarantee
    # through distance 7).  Pandas-UDF hashing -> no DuckDB twin;
    # value-pinned by goldens at three SFs.
    media = _synth_bmp_media(spark, sf_dir, modulo=2)
    return multimodal.image_near_duplicates(media, max_hamming=6, blocks=8)


def _wav_media_from_emb(emb: DataFrame) -> DataFrame:
    # Render any (vec_id, embedding) frame to WAV payload bytes — the
    # shared tail of _synth_wav_media and the planted-pair recall row.
    def make(batches):
        import struct

        import numpy as np
        import pandas as pd

        def encode_wav(rate, samples):
            data = np.asarray(samples, dtype="<i2").tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            return (
                b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )

        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                arr = np.asarray(vec, dtype=float)
                samples = np.clip(
                    np.repeat(arr, 16) * 8000, -32768, 32767
                ).astype(np.int16)
                payloads.append(encode_wav(8000, samples))
            yield pd.DataFrame({"media_id": pdf["vec_id"], "payload": payloads})

    return emb.select("vec_id", "embedding").mapInPandas(
        make, "media_id long, payload binary"
    )


def _synth_wav_media(spark: SparkSession, sf_dir: str, modulo: int) -> DataFrame:
    # Deterministic WAV synthesis from embedding rows: each value held for
    # 16 samples at 8 kHz (a step waveform — similar vectors sound alike),
    # so the spectral-fingerprint family has genuine near-dups to find.
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % modulo == 0
    )
    return _wav_media_from_emb(emb)


def q_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Audio-side corpus dedup: spectral band-energy fingerprint in one
    # Arrow pass, pigeonhole chunk equi-join at Hamming <= 6 (blocks=8
    # keeps exact recall through distance 7).  Pandas-UDF hashing -> no
    # DuckDB twin; value-pinned by goldens at three SFs.
    media = _synth_wav_media(spark, sf_dir, modulo=2)
    return multimodal.audio_near_duplicates(media, max_hamming=6, blocks=8)


def q_video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Video-side corpus dedup: 4-frame BMPS containers synthesized from
    # embedding quarters (similar vectors -> similar frames), then clips
    # sharing >=2 perceptually-near frames (frame pHash Hamming <= 6,
    # blocks=8).  Pandas-UDF stages -> no DuckDB twin; golden-pinned.
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 2 == 0)

    def make(batches):
        import numpy as np
        import pandas as pd

        from etl_pipeline2_0_spark.functions.multimodal import (
            encode_bmp,
            encode_bmps,
        )

        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                arr = np.asarray(vec, dtype=float)
                frames = []
                for f in range(4):
                    seg = np.clip(
                        arr[f * 16 : (f + 1) * 16] * 127 + 128, 0, 255
                    ).astype(np.uint8)
                    frames.append(encode_bmp(np.resize(seg, (4, 4, 3))))
                payloads.append(encode_bmps(frames))
            yield pd.DataFrame({"media_id": pdf["vec_id"], "payload": payloads})

    media = emb.select("vec_id", "embedding").mapInPandas(
        make, "media_id long, payload binary"
    )
    return multimodal.video_near_duplicates(
        media, every_nth=1, frame_max_hamming=6, min_common_frames=2
    )


def q_multimodal_neardup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Measured recall row for the multimodal near-dup family (the last
    # approximate family without a quality metric, r14 verdict item 2):
    # real BMP/WAV bytes are synthesized, DECODED (parse_bmp/parse_wav in
    # one Arrow pass), dHashed from exact pixel-channel / PCM16 sample
    # values, then the family's shared pigeonhole chunk equi-join
    # (dedup.hamming_pairs geometry: max_hamming=6, blocks=8 — the exact
    # configuration image_phash/audio_fp/video_phash_neardup run) is
    # measured against exact all-pairs Hamming ground truth.  Fully
    # oracled: dHash bits are comparisons of integers the synthesis
    # derives deterministically from the embeddings table, so the DuckDB
    # twin reproduces signature, truth, and candidates end-to-end —
    # unlike the float-DCT pHash values (golden-pinned ×3 SF), whose
    # CANDIDATE MACHINERY this row certifies.
    #
    # Truth is PLANTED (the retrieval_ndcg convention): every 16th base
    # vector re-renders under id+10^7 with dims 2 and 3 swapped — a
    # deterministic perturbation that flips at most the three dHash bits
    # whose comparisons touch those dims, so each (original, copy) pair
    # sits within Hamming 3 ≤ 6 in BOTH modalities and the truth set is
    # non-vacuous at every SF (the organic corpus has no dHash-near
    # pairs — 47/63-bit signatures are far more discriminative than the
    # 4×4 pHash the trio runs on).
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 2 == 0)
    e = F.col("embedding")
    swapped = F.transform(
        e,
        lambda x, i: (
            F.when(i == F.lit(2), F.element_at(e, 4))
            .when(i == F.lit(3), F.element_at(e, 3))
            .otherwise(x)
        ),
    )
    planted = emb.where(F.col("vec_id") % 16 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        swapped.alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted)
    img_sig = multimodal.media_dhash(_bmp_media_from_emb(aug), kind="image")
    aud_sig = multimodal.media_dhash(
        _wav_media_from_emb(aug), kind="audio", stride=16
    )
    img = dedup.hamming_recall(
        img_sig, id_col="media_id", sig_col="sig",
        max_hamming=6, blocks=8, sig_bits=48,
    ).select(F.lit("image").alias("modality"), "*")
    aud = dedup.hamming_recall(
        aud_sig, id_col="media_id", sig_col="sig",
        max_hamming=6, blocks=8, sig_bits=64,
    ).select(F.lit("audio").alias("modality"), "*")
    return img.unionByName(aud).orderBy("modality")


# The twin rebuilds the dHash signatures from the SAME arithmetic the
# media synthesis + decode chain performs: BMP channel bytes are
# floor(clip(e[i]*127+128, 0, 255)) (numpy uint8 truncation ≡ FLOOR on
# the clipped non-negative double), WAV PCM16 step values are
# trunc(clip(e[i]*8000, -32768, 32767)) (int16 truncation toward zero ≡
# TRUNC) — bit i of the signature is v_i > v_{i+1}.  Truth is exact
# all-pairs popcount; candidates are the pigeonhole chunk equi-join at
# the same geometry (8 chunks of 6 bits over the 48-bit image dHash,
# 8×8 over the 64-bit audio dHash).
SQL_MULTIMODAL_NEARDUP_RECALL = r"""
WITH base0 AS (
  SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id % 2 = 0
), base AS (
  SELECT id, e FROM base0
  UNION ALL
  SELECT id + 10000000,
         list_concat(list_concat(e[1:2], [e[4], e[3]]), e[5:len(e)])
  FROM base0 WHERE id % 16 = 0
), imgv AS (
  SELECT id, i,
         CAST(FLOOR(LEAST(GREATEST(CAST(e[i+1] AS DOUBLE)*127 + 128, 0), 255)) AS BIGINT) AS v
  FROM base, range(0, 48) t(i)
), audv AS (
  SELECT id, i,
         CAST(TRUNC(LEAST(GREATEST(CAST(e[i+1] AS DOUBLE)*8000, -32768), 32767)) AS BIGINT) AS v
  FROM base, range(0, 64) t(i)
), sigs AS (
  SELECT 'image' AS modality, a.id,
         CAST(COALESCE(SUM(CASE WHEN a.v > b.v THEN (CAST(1 AS BIGINT) << a.i) ELSE 0 END), 0) AS BIGINT) AS sig,
         6 AS chunk_bits
  FROM imgv a JOIN imgv b ON a.id = b.id AND b.i = a.i + 1
  GROUP BY a.id
  UNION ALL
  SELECT 'audio' AS modality, a.id,
         CAST(COALESCE(SUM(CASE WHEN a.v > b.v THEN (CAST(1 AS BIGINT) << a.i) ELSE 0 END), 0) AS BIGINT) AS sig,
         8 AS chunk_bits
  FROM audv a JOIN audv b ON a.id = b.id AND b.i = a.i + 1
  GROUP BY a.id
), truth AS (
  SELECT a.modality, COUNT(*) AS n_true_pairs
  FROM sigs a JOIN sigs b
    ON a.modality = b.modality AND a.id < b.id
  WHERE bit_count(xor(a.sig, b.sig)) <= 6
  GROUP BY a.modality
), chunks AS (
  SELECT modality, id, sig, i AS ci,
         (sig >> (i * chunk_bits)) & ((CAST(1 AS BIGINT) << chunk_bits) - 1) AS cv
  FROM sigs, range(0, 8) t(i)
), cand AS (
  SELECT DISTINCT a.modality, a.id AS ia, b.id AS ib, a.sig AS sa, b.sig AS sb
  FROM chunks a JOIN chunks b
    ON a.modality = b.modality AND a.ci = b.ci AND a.cv = b.cv AND a.id < b.id
), cm AS (
  SELECT modality,
         COUNT(*) AS n_candidate_pairs,
         CAST(SUM(CASE WHEN bit_count(xor(sa, sb)) <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_found
  FROM cand GROUP BY modality
), items AS (
  SELECT modality, COUNT(*) AS n_items FROM sigs GROUP BY modality
)
SELECT i.modality,
       i.n_items,
       COALESCE(t.n_true_pairs, 0) AS n_true_pairs,
       COALESCE(c.n_candidate_pairs, 0) AS n_candidate_pairs,
       COALESCE(c.n_pairs_found, 0) AS n_pairs_found,
       CASE WHEN COALESCE(t.n_true_pairs, 0) > 0
            THEN COALESCE(c.n_pairs_found, 0) / t.n_true_pairs END AS recall,
       CASE WHEN COALESCE(t.n_true_pairs, 0) > 0
            THEN COALESCE(c.n_candidate_pairs, 0) / t.n_true_pairs END AS candidates_per_true
FROM items i
LEFT JOIN truth t USING (modality)
LEFT JOIN cm c USING (modality)
ORDER BY i.modality
"""


# ------------------------------------------------------ retrieval (RAG) ---


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Context-window chunking: 32-token chunks, 8-token overlap.  Subset
    # keeps the oracle cheap; the Spark plan shape (narrow, shuffle-free)
    # is identical on the full corpus.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    return retrieval.chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)


SQL_CHUNK_DOCUMENTS = r"""
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents WHERE doc_id % 25 = 0
), starts AS (
  SELECT doc_id, toks,
         unnest(range(0, len(toks), 24)) AS start,
         generate_subscripts(range(0, len(toks), 24), 1) - 1 AS chunk_id
  FROM docs WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(start AS BIGINT) AS start_token,
       CAST(len(toks[start + 1 : start + 32]) AS BIGINT) AS n_tokens,
       array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
FROM starts
"""


# The bench/driver query set: fixed term lists drawn from the synthetic
# corpus vocabulary (a query workload is external input by nature; literals
# keep both engines bit-identical).
_BM25_QUERIES = [
    (0, ["spark", "join"]),
    (1, ["window", "agg", "stream"]),
    (2, ["merge", "sort"]),
    (3, ["data", "table", "scan"]),
]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return retrieval.bm25_topk(docs, _BM25_QUERIES, top_k=5)


SQL_BM25_TOPK = r"""
WITH q(query_id, term) AS (
  VALUES (0, 'spark'), (0, 'join'),
         (1, 'window'), (1, 'agg'), (1, 'stream'),
         (2, 'merge'), (2, 'sort'),
         (3, 'data'), (3, 'table'), (3, 'scan')
), base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents WHERE doc_id % 5 = 0
), lens AS (
  SELECT doc_id, len(toks) AS dl FROM base
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
), postings AS (
  SELECT b.doc_id, t.term, COUNT(*) AS tf
  FROM base b, unnest(b.toks) AS u(term)
  JOIN (SELECT DISTINCT term FROM q) t ON u.term = t.term
  GROUP BY b.doc_id, t.term
), df AS (
  SELECT term, COUNT(*) AS df FROM postings GROUP BY term
), scored AS (
  SELECT q.query_id, p.doc_id,
         ROUND(SUM(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (p.tf * 2.2)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
         ), 6) AS score
  FROM postings p
  JOIN q ON p.term = q.term
  JOIN df ON p.term = df.term
  JOIN lens l ON p.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
), ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
SELECT CAST(query_id AS INT) AS query_id, doc_id, score,
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
"""


# ------------------------------------------------------- snapshot diff ----


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Crawl-over-crawl delta: snapshot A drops doc_id % 11 = 3 (docs that
    # will look "added" in B), snapshot B drops doc_id % 13 = 5 ("removed")
    # and rewrites text for doc_id % 17 = 0 ("changed"); everything else is
    # "unchanged" and filtered out of the report.
    docs = load_table(spark, sf_dir, "documents")
    snap_a = docs.where(F.col("doc_id") % 11 != 3)
    snap_b = docs.where(F.col("doc_id") % 13 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return dedup.snapshot_diff(snap_a, snap_b).where(F.col("status") != "unchanged")


SQL_SNAPSHOT_DIFF = """
WITH a AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS hash_a
  FROM documents WHERE doc_id % 11 <> 3
), b AS (
  SELECT doc_id,
         md5(COALESCE(CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
                           ELSE text END, '')) AS hash_b
  FROM documents WHERE doc_id % 13 <> 5
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN hash_a <> hash_b THEN 'changed'
            ELSE 'unchanged' END AS status,
       hash_a, hash_b
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE (CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN hash_a <> hash_b THEN 'changed'
            ELSE 'unchanged' END) <> 'unchanged'
"""


def q_similar_docs_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hybrid more-like-this: BM25 over each query doc's top-5 tf terms
    # fused with exact cosine over its embedding via RRF (k=60).
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return retrieval.similar_docs_rrf(
        docs, emb, n_queries=8, top_m_terms=5, k_each=10, top_k=5
    )


SQL_SIMILAR_DOCS_RRF = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), qtf AS (
  SELECT doc_id AS query_id, u.term, COUNT(*) AS tf
  FROM base, unnest(toks) AS u(term)
  WHERE doc_id < 8 GROUP BY doc_id, u.term
), qterms AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY tf DESC, term) AS r
    FROM qtf
  ) WHERE r <= 5
), lens AS (
  SELECT doc_id, len(toks) AS dl FROM base
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
), postings AS (
  SELECT b.doc_id, t.term, COUNT(*) AS tf
  FROM base b, unnest(b.toks) AS u(term)
  JOIN (SELECT DISTINCT term FROM qterms) t ON u.term = t.term
  GROUP BY b.doc_id, t.term
), df AS (
  SELECT term, COUNT(*) AS df FROM postings GROUP BY term
), bm25 AS (
  SELECT q.query_id, p.doc_id,
         ROUND(SUM(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (p.tf * 2.2)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
         ), 6) AS score
  FROM postings p
  JOIN qterms q ON p.term = q.term
  JOIN df ON p.term = df.term
  JOIN lens l ON p.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
), lex AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM bm25 QUALIFY rnk <= 10
), lexx AS (
  SELECT * FROM lex WHERE query_id <> doc_id
), e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
), cos AS (
  SELECT query_id, a.vec_id AS doc_id,
    ROUND(list_inner_product(qv, a.v) /
      (SQRT(list_inner_product(qv, qv)) * SQRT(list_inner_product(a.v, a.v))), 6)
      AS sim
  FROM e a CROSS JOIN q WHERE a.vec_id <> query_id
), sem AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id) AS rnk
  FROM cos QUALIFY rnk <= 10
), unioned AS (
  SELECT query_id, doc_id, rnk FROM lexx
  UNION ALL
  SELECT query_id, doc_id, rnk FROM sem
), fused AS (
  SELECT query_id, doc_id,
         ROUND(SUM(CAST(1 AS DOUBLE) / (60 + rnk)), 6) AS rrf_score
  FROM unioned GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS INT) AS rnk
FROM fused QUALIFY rnk <= 5
"""


def q_assign_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic train/val/test assignment over the corpus.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.assign_splits(docs).select("doc_id", "split")


def _sql_assign_splits() -> str:
    # The twin's CASE bounds come from the same helper the Spark op uses,
    # so both engines compare bit-identical hex literals.
    from etl_pipeline2_0_spark.functions.mixing import split_thresholds

    pairs = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    whens = "\n            ".join(
        f"WHEN hx < '{bound}' THEN '{name}'" for name, bound in pairs[:-1]
    )
    return f"""
WITH h AS (
  SELECT doc_id,
         '0' || substring(md5(CAST(doc_id AS VARCHAR) || ':'), 1, 15) AS hx
  FROM documents
)
SELECT doc_id,
       CASE {whens}
            ELSE '{pairs[-1][0]}' END AS split
FROM h
"""


SQL_ASSIGN_SPLITS = _sql_assign_splits()


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF quality metric: per-query recall@k of the coarse-quantized probe
    # path vs the exact cosine ground truth — the IVF twin of ann_recall
    # (which measures the LSH path).  The xxhash64-seeded centroids make
    # the ranking deterministic but not ANSI-expressible -> rows-only,
    # value-pinned by goldens at three SFs.
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = similarity.ivf_topk(
        emb, q, k=5, n_centroids=16, n_probe=4
    ).select("query_id", "neighbor_id")
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0), 6).alias(
                "recall_at_k"
            ),
        )
    )


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Positional-index phrase retrieval: documents containing the exact
    # adjacent token phrase "table part" with occurrence counts — the
    # positional primitive bm25's bag-of-terms ranking cannot express.
    from etl_pipeline2_0_spark.functions import retrieval

    docs = load_table(spark, sf_dir, "documents")
    return retrieval.phrase_match(docs, ["table", "part"])


SQL_PHRASE_MATCH = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS l
  FROM documents
), postings AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
), p0 AS (
  SELECT doc_id, pos FROM postings WHERE tok = 'table'
), p1 AS (
  SELECT doc_id, pos FROM postings WHERE tok = 'part'
)
SELECT p0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM p0 JOIN p1 ON p0.doc_id = p1.doc_id AND p1.pos = p0.pos + 1
GROUP BY p0.doc_id
"""


def q_temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mT5/XLM-R temperature sampling weights over per-source token masses
    # (α=0.5): the principled "up-sample low-resource sources" rule whose
    # output feeds mix_sources.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.temperature_mix_weights(docs, alpha=0.5, epoch_docs=10_000)


SQL_TEMPERATURE_MIX_WEIGHTS = r"""
WITH sizes AS (
  SELECT source,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                                  x -> length(x) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), powered AS (
  SELECT source, n_tokens, POW(CAST(n_tokens AS DOUBLE), 0.5) AS p FROM sizes
), tot AS (
  SELECT SUM(p) AS t FROM powered
)
SELECT source, n_tokens, ROUND(p / t, 6) AS weight,
       CAST(FLOOR(10000 * p / t) AS BIGINT) AS expected_docs
FROM powered CROSS JOIN tot
"""


def q_embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EMBEDDING-space drift: PSI over portable-IVF cluster occupancy — the
    # semantic companion of corpus_drift_psi's token-length drift.  The
    # reference snapshot (even vec_ids) trains the md5-portable centroids;
    # the "current" snapshot (odd vec_ids, dimension 0 shifted +1.0 — a
    # deterministic direction change, since global scaling would be
    # cosine-invariant) is assigned to the SAME centroids, and occupancy
    # histograms feed the shared PSI core (functions/dq.psi_from_bins).
    # Catches what length/token stats cannot: topical/representational
    # shift between crawls at any corpus size (both snapshots reduce to
    # 16-bin histograms).
    from etl_pipeline2_0_spark.functions.dq import psi_from_bins

    emb = load_table(spark, sf_dir, "embeddings")
    ref = emb.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    cur = emb.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x + F.lit(1.0)).otherwise(
                x.cast("double")
            ),
        ).alias("c_vec"),
    )
    cents = similarity.portable_centroids(ref, 16)
    a_bins = similarity.portable_assign(ref, cents).select(
        F.lit("all").alias("source"), F.col("cluster").alias("bin")
    )
    b_bins = similarity.portable_assign(cur, cents).select(
        F.lit("all").alias("source"), F.col("cluster").alias("bin")
    )
    return psi_from_bins(a_bins, b_bins)


SQL_EMBEDDING_DRIFT_PSI = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ref AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
cur AS (
  SELECT vec_id,
         list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x + 1.0 ELSE x END)
           AS v
  FROM e WHERE vec_id % 2 = 1
), h AS (
  SELECT vec_id, v,
         CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)
           AS hh
  FROM ref
), cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY hh, vec_id) AS INT) AS centroid_id,
         v AS cv
  FROM h
  QUALIFY centroid_id <= 16
), assign_a AS (
  SELECT a.vec_id, c.centroid_id AS cluster
  FROM ref a CROSS JOIN cents c
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY a.vec_id
      ORDER BY ROUND(list_inner_product(a.v, c.cv) /
                     (SQRT(list_inner_product(a.v, a.v))
                      * SQRT(list_inner_product(c.cv, c.cv))), 6) DESC,
               c.centroid_id) = 1
), assign_b AS (
  SELECT b.vec_id, c.centroid_id AS cluster
  FROM cur b CROSS JOIN cents c
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY b.vec_id
      ORDER BY ROUND(list_inner_product(b.v, c.cv) /
                     (SQRT(list_inner_product(b.v, b.v))
                      * SQRT(list_inner_product(c.cv, c.cv))), 6) DESC,
               c.centroid_id) = 1
), tagged AS (
  SELECT 'a' AS snap, cluster FROM assign_a
  UNION ALL
  SELECT 'b' AS snap, cluster FROM assign_b
), counts AS (
  SELECT cluster AS bin,
         SUM(CASE WHEN snap = 'a' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN snap = 'b' THEN 1 ELSE 0 END) AS cb
  FROM tagged GROUP BY cluster
), tot AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS k FROM counts
)
SELECT 'all' AS source,
       ROUND(SUM(((cb + 0.5) / (nb + 0.5 * k) - (ca + 0.5) / (na + 0.5 * k))
                 * ln(((cb + 0.5) / (nb + 0.5 * k))
                      / ((ca + 0.5) / (na + 0.5 * k)))), 6) AS psi,
       CAST(MAX(k) AS BIGINT) AS n_bins
FROM counts CROSS JOIN tot
"""


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The canonical tokenizer-training op: first 8 BPE merge rules learned
    # from the documents corpus (word-frequency dict bounded at 512 types).
    # Fully declarative k-iteration loop, exact k-CTE DuckDB twin — see
    # functions/text.bpe_train_merges for the double-separator literal-
    # replace encoding that makes the merge step engine-portable.
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_train_merges(docs, n_merges=8, max_word_types=512)


def _sql_bpe_ctes(n_merges: int = 8, max_word_types: int = 512) -> str:
    # Generated k-block CTE chain mirroring the Spark loop iteration for
    # iteration: pairs -> weighted argmax (count desc, pair asc) -> literal
    # double-separator replace.  words CTEs are MATERIALIZED: DuckDB
    # inlines multi-referenced CTEs by default, which re-evaluates the
    # chain exponentially in k (measured: k=6 already 4.7 s at sf0.001,
    # materialized k=8 is 0.1 s).
    parts = [
        rf"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS word
  FROM documents
), words0 AS MATERIALIZED (
  SELECT word,
         '·' || array_to_string(regexp_extract_all(word, '.'), '··') || '·'
           AS sym,
         cnt
  FROM (
    SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
    ORDER BY cnt DESC, word LIMIT {max_word_types}
  )
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""", pairs{i} AS (
  SELECT unnest(list_transform(
           generate_series(1, len(string_split(trim(sym, '·'), '··')) - 1),
           j -> string_split(trim(sym, '·'), '··')[j] || '·'
                || string_split(trim(sym, '·'), '··')[j + 1])) AS pair,
         cnt
  FROM words{i - 1}
), best{i} AS (
  SELECT {i} AS step, pair, SUM(cnt) AS pair_cnt
  FROM pairs{i} GROUP BY pair
  ORDER BY pair_cnt DESC, pair LIMIT 1
), words{i} AS MATERIALIZED (
  SELECT word,
         CASE WHEN (SELECT pair FROM best{i}) IS NULL THEN sym
              ELSE replace(sym,
                '·' || replace((SELECT pair FROM best{i}), '·', '··') || '·',
                '·' || replace((SELECT pair FROM best{i}), '·', '') || '·')
         END AS sym,
         cnt
  FROM words{i - 1}
)"""
        )
    return "".join(parts)


def _sql_bpe_train(n_merges: int = 8, max_word_types: int = 512) -> str:
    union = "\n  UNION ALL\n  ".join(
        f"SELECT step, pair, pair_cnt FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        _sql_bpe_ctes(n_merges, max_word_types)
        + f"""
SELECT CAST(step AS INT) AS step, pair,
       replace(pair, '·', '') AS merged,
       CAST(pair_cnt AS BIGINT) AS pair_cnt
FROM (
  {union}
)"""
    )


SQL_BPE_TRAIN_MERGES = _sql_bpe_train()


def q_bpe_segment_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BPE applied: the word-type table's final segmentation after the 8
    # learned merges (train→apply pair with q_bpe_train_merges — the
    # training loop's terminal state IS the segmentation).
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_segment_words(docs, n_merges=8, max_word_types=512)


def _sql_bpe_segment(n_merges: int = 8, max_word_types: int = 512) -> str:
    return (
        _sql_bpe_ctes(n_merges, max_word_types)
        + f"""
SELECT word,
       replace(trim(sym, '·'), '··', ' ') AS pieces,
       CAST(len(string_split(replace(trim(sym, '·'), '··', ' '), ' '))
            AS INT) AS n_pieces,
       CAST(cnt AS BIGINT) AS cnt
FROM words{n_merges}"""
    )


SQL_BPE_SEGMENT_WORDS = _sql_bpe_segment()


def q_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus pricing under the trained tokenizer: per-doc word count and
    # BPE piece count (vocab words use their segmentation; OOV words fall
    # back to character pieces) — train→apply→encode, end to end.
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_encode_docs(docs, n_merges=8, max_word_types=512)


def _sql_bpe_encode(n_merges: int = 8, max_word_types: int = 512) -> str:
    return (
        _sql_bpe_ctes(n_merges, max_word_types)
        + f""", seg AS (
  SELECT word,
         len(string_split(replace(trim(sym, '·'), '··', ' '), ' '))
           AS vocab_pieces
  FROM words{n_merges}
), doc_words AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                            x -> length(x) > 0)) AS word
  FROM documents
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(COALESCE(vocab_pieces, length(word))) AS BIGINT) AS n_pieces
FROM doc_words LEFT JOIN seg USING (word)
GROUP BY doc_id"""
    )


SQL_BPE_ENCODE_DOCS = _sql_bpe_encode()


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenizer fertility by source: average BPE pieces per word under the
    # corpus-trained tokenizer — a standard corpus-quality / language-
    # coverage signal (gibberish and out-of-domain text fragment into many
    # pieces; well-covered text approaches 1 piece/word).  Pure
    # composition: bpe_encode_docs carries ``source`` through its one
    # corpus pass (carry_cols) → one per-source aggregate — no second
    # join against the corpus (the DuckDB twin always worked this way).
    docs = load_table(spark, sf_dir, "documents")
    enc = text.bpe_encode_docs(
        docs, n_merges=8, max_word_types=512, carry_cols=("source",)
    )
    return (
        enc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.round(F.sum("n_pieces") / F.sum("n_words"), 6).alias("fertility"),
        )
    )


def _sql_tokenizer_fertility(n_merges: int = 8, max_word_types: int = 512) -> str:
    return (
        _sql_bpe_ctes(n_merges, max_word_types)
        + f""", seg AS (
  SELECT word,
         len(string_split(replace(trim(sym, '·'), '··', ' '), ' '))
           AS vocab_pieces
  FROM words{n_merges}
), doc_words AS (
  SELECT doc_id, source,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                            x -> length(x) > 0)) AS word
  FROM documents
), enc AS (
  SELECT doc_id, source,
         COUNT(*) AS n_words,
         SUM(COALESCE(vocab_pieces, length(word))) AS n_pieces
  FROM doc_words LEFT JOIN seg USING (word)
  GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       ROUND(SUM(n_pieces) * 1.0 / SUM(n_words), 6) AS fertility
FROM enc GROUP BY source"""
    )


SQL_TOKENIZER_FERTILITY = _sql_tokenizer_fertility()


def q_ann_ivf_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF under the md5-portable relational construction (hash-sampled
    # centroids, windowed argmax assignment) — graduates the IVF family
    # from rows-only to a full DuckDB oracle, the rp_lsh/MinHash/SimHash
    # portability move applied to coarse quantization.  The xxhash64+Lloyd
    # ivf_topk stays the production fast path.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk_portable(
        emb, emb.where(F.col("vec_id") < 8), k=5, n_centroids=16, n_probe=4
    )


# Shared portable-IVF construction (see similarity.ivf_topk_portable):
# centroids = the 16 corpus vectors with smallest md5-hex15(id), numbered
# in hash order; assignment/probes by 6dp-rounded cosine with centroid-id
# tiebreak; probes equi-join the assignment on cluster.
_SQL_IVF_PORTABLE_CTE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
h AS (
  SELECT vec_id, v,
         CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)
           AS hh
  FROM e
), cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY hh, vec_id) AS INT) AS centroid_id,
         v AS cv
  FROM h
  QUALIFY centroid_id <= 16
), assign_scored AS (
  SELECT a.vec_id AS neighbor_id, a.v, c.centroid_id,
         ROUND(list_inner_product(a.v, c.cv) /
               (SQRT(list_inner_product(a.v, a.v))
                * SQRT(list_inner_product(c.cv, c.cv))), 6) AS sim
  FROM e a CROSS JOIN cents c
), assigned AS (
  SELECT neighbor_id, v, centroid_id AS cluster
  FROM assign_scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY neighbor_id
                             ORDER BY sim DESC, centroid_id) = 1
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
), probe_scored AS (
  SELECT query_id, qv, c.centroid_id,
         ROUND(list_inner_product(qv, c.cv) /
               (SQRT(list_inner_product(qv, qv))
                * SQRT(list_inner_product(c.cv, c.cv))), 6) AS sim
  FROM q CROSS JOIN cents c
), probes AS (
  SELECT query_id, qv, centroid_id AS cluster
  FROM probe_scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, centroid_id) <= 4
), ivf_scored AS (
  SELECT p.query_id, a.neighbor_id,
         ROUND(list_inner_product(p.qv, a.v) /
               (SQRT(list_inner_product(p.qv, p.qv))
                * SQRT(list_inner_product(a.v, a.v))), 6) AS cosine_sim
  FROM probes p JOIN assigned a USING (cluster)
  WHERE a.neighbor_id <> p.query_id
), ivf_topk AS (
  SELECT query_id, neighbor_id, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rnk
  FROM ivf_scored
  QUALIFY rnk <= 5
)
"""

SQL_ANN_IVF_TOPK_PORTABLE = _SQL_IVF_PORTABLE_CTE + """
SELECT query_id, neighbor_id, cosine_sim, rnk FROM ivf_topk
"""


def q_ann_ivf_recall_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Recall@k of the PORTABLE IVF path vs the exact cosine ground truth —
    # the measured-quality metric for the oracled IVF construction (the
    # ann_recall pattern), itself fully oracled: quantization quality is
    # now externally checkable end-to-end, not just shape-pinned.
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = similarity.ivf_topk_portable(
        emb, q, k=5, n_centroids=16, n_probe=4
    ).select("query_id", "neighbor_id")
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0), 6).alias(
                "recall_at_k"
            ),
        )
    )


SQL_ANN_IVF_RECALL_PORTABLE = _SQL_IVF_PORTABLE_CTE + """
, exact_topk AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT query_id, a.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
             ROUND(list_inner_product(qv, a.v) /
               (SQRT(list_inner_product(qv, qv))
                * SQRT(list_inner_product(a.v, a.v))), 6) DESC,
             a.vec_id) AS INT) AS rnk
    FROM e a CROSS JOIN q WHERE a.vec_id <> query_id
  ) WHERE rnk <= 5
), hits AS (
  SELECT i.query_id, COUNT(*) AS n_hits
  FROM ivf_topk i JOIN exact_topk x
    ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
  GROUP BY i.query_id
)
SELECT q.query_id,
       ROUND(COALESCE(n_hits, 0) / 5.0, 6) AS recall_at_k
FROM q LEFT JOIN hits ON q.query_id = hits.query_id
"""


def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # clean_text over deterministically-dirtied corpus text (the synthetic
    # corpus is already clean, so the query injects tabs/newlines/control
    # chars to prove the semantics end-to-end on both engines).
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit(" \t"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("\x01x\n\ny\x7f "),
        F.lit("\x0bz  "),  # VT exercises the explicit whitespace class
    )
    return docs.select(
        "doc_id",
        F.length(dirty).cast("bigint").alias("dirty_len"),
        text.clean_text(dirty).alias("clean"),
    ).withColumn(
        "n_removed", (F.col("dirty_len") - F.length("clean")).cast("bigint")
    )


SQL_TEXT_CLEAN = r"""
WITH dirty AS (
  SELECT doc_id,
         ' ' || chr(9) || COALESCE(text, '')
             || chr(1) || 'x' || chr(10) || chr(10) || 'y' || chr(127) || ' '
             || chr(11) || 'z  '
             AS d
  FROM documents
), cleaned AS (
  SELECT doc_id, CAST(length(d) AS BIGINT) AS dirty_len,
         trim(regexp_replace(
                regexp_replace(d, '[ \x09\x0A\x0D\x0B\x0C]+', ' ', 'g'),
                '[\x00-\x08\x0E-\x1F\x7F]', '', 'g')) AS clean
  FROM dirty
)
SELECT doc_id, dirty_len, clean,
       CAST(dirty_len - length(clean) AS BIGINT) AS n_removed
FROM cleaned
"""


def q_minhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The portable-hash MinHash pipeline: identical plan shape to
    # minhash_pairs (banded equi-join, semi-join-pruned verify) but with
    # the md5-hex15 hash family, so the WHOLE shingle->minhash->band->
    # verify pipeline carries an exact DuckDB twin — the rows-only
    # minhash_pairs keeps the fast xxhash64 family; this query proves the
    # pipeline's logic end-to-end against ANSI SQL.
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(
        docs, k=3, num_hashes=16, bands=8, threshold=0.5, portable=True
    )


def _sql_minhash_portable(
    num_hashes: int = 16, bands: int = 8, threshold: float = 0.5,
    max_bucket: int = 1000,
) -> str:
    # Generated so the per-permutation md5 literals and band slicing match
    # the Spark op exactly for any geometry.
    r = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(CAST('0x' || substring(md5('{j}:' || b), 1, 15) AS BIGINT)) AS s{j}"
        for j in range(num_hashes)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT id, {bi} AS band, md5("
        + " || ',' || ".join(f"CAST(s{bi * r + o} AS VARCHAR)" for o in range(r))
        + ") AS bucket FROM sig"
        for bi in range(bands)
    )
    return rf"""
WITH docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM toks
), sh0 AS (
  SELECT id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), base AS (
  SELECT id, substring(md5(shingle), 1, 15) AS b FROM sh
), sig AS (
  SELECT id,
         {mins}
  FROM base GROUP BY id
), banded0 AS (
{band_selects}
), banded AS (
  SELECT id, band, bucket FROM (
    SELECT id, band, bucket,
           COUNT(*) OVER (PARTITION BY band, bucket) AS bn
    FROM banded0
  ) WHERE bn <= {max_bucket}
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
), scored AS (
  SELECT id_a, id_b,
         ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= {threshold}
"""


SQL_MINHASH_PAIRS_PORTABLE = _sql_minhash_portable()


def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Peak concurrent 5-minute sessions per event type (sweep-line over
    # derived [ts, ts+5min) intervals, two-level distributed prefix sum).
    from etl_pipeline2_0_spark.functions import intervals

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    return intervals.max_concurrency(iv, key_cols=["event_type"])


SQL_MAX_CONCURRENCY = """
WITH iv AS (
  SELECT event_type, ts AS s, ts + INTERVAL 5 MINUTE AS e
  FROM events WHERE ts IS NOT NULL
), deltas AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv
), run AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS c
  FROM deltas
)
SELECT event_type, CAST(MAX(c) AS BIGINT) AS max_concurrent
FROM run GROUP BY event_type
"""


def q_corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distribution drift between two corpus snapshots: Population Stability
    # Index (public credit-scoring/ML-monitoring metric) of the per-source
    # token-count distribution, over fixed-width bins with Laplace
    # smoothing.  Snapshot B is derived deterministically (doc_id % 13 = 5
    # dropped; text doubled for doc_id % 7 = 0 — a real length shift), the
    # same synthesis convention as snapshot_diff.
    #
    # PSI = sum over bins (q - p) * ln(q / p), with p/q the smoothed bin
    # shares ((c + 0.5) / (N + 0.5 * K), K = bins observed for the source).
    #
    # Scale: both snapshots reduce to (source, bin) counts in ONE
    # conditional aggregate over the tagged union; per-source totals are a
    # tiny broadcast; the PSI sum is over ≤ #bins rows per source.
    from etl_pipeline2_0_spark.functions.dq import corpus_drift_psi

    docs = load_table(spark, sf_dir, "documents")
    snap_b = docs.where(F.col("doc_id") % 13 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    return corpus_drift_psi(docs, snap_b)


SQL_CORPUS_DRIFT_PSI = r"""
WITH a AS (
  SELECT source,
         LEAST(CAST(floor(len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                                          x -> length(x) > 0)) / 8) AS INT),
               15) AS bin
  FROM documents
), b AS (
  SELECT source,
         LEAST(CAST(floor(len(list_filter(regexp_split_to_array(
                  CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text
                       ELSE text END, '[ \x09\x0A\x0D\x0B\x0C]+'),
                  x -> length(x) > 0)) / 8) AS INT),
               15) AS bin
  FROM documents WHERE doc_id % 13 <> 5
), tagged AS (
  SELECT source, bin, 'a' AS snap FROM a
  UNION ALL
  SELECT source, bin, 'b' AS snap FROM b
), counts AS (
  SELECT source, bin,
         SUM(CASE WHEN snap = 'a' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN snap = 'b' THEN 1 ELSE 0 END) AS cb
  FROM tagged GROUP BY source, bin
), totals AS (
  SELECT source, SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS k_bins
  FROM counts GROUP BY source
)
SELECT c.source,
       ROUND(SUM(((cb + 0.5) / (nb + 0.5 * k_bins) - (ca + 0.5) / (na + 0.5 * k_bins))
                 * ln(((cb + 0.5) / (nb + 0.5 * k_bins))
                      / ((ca + 0.5) / (na + 0.5 * k_bins)))), 6) AS psi,
       CAST(MAX(k_bins) AS BIGINT) AS n_bins
FROM counts c JOIN totals t ON c.source = t.source
GROUP BY c.source
"""


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Data-quality observability: events whose value is a >3-sigma outlier
    # within its event type.  Moments come from DECIMAL-exact sums (the
    # house decimal-aggregation rule): sum and sum-of-squares over
    # DECIMAL(18,2)/DECIMAL(38,4) are order-independent and bit-identical
    # across engines, so the doubles derived from them (mean, variance, z)
    # are too — a raw double stddev would be shuffle-order-dependent.
    ev = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).alias("s1"),
        F.sum((d * d).cast("decimal(38,4)")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (F.col("s2").cast("double") - F.col("n") * mean * mean) / (
        F.col("n") - 1
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("z"),
        )
    )


SQL_VALUE_OUTLIERS = """
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS s1,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
                  AS DECIMAL(38,4))) AS s2
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       ROUND((value - CAST(s1 AS DOUBLE) / n)
             / sqrt((CAST(s2 AS DOUBLE) - n * (CAST(s1 AS DOUBLE) / n)
                                            * (CAST(s1 AS DOUBLE) / n))
                    / (n - 1)), 6) AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE ABS((value - CAST(s1 AS DOUBLE) / n)
          / sqrt((CAST(s2 AS DOUBLE) - n * (CAST(s1 AS DOUBLE) / n)
                                         * (CAST(s1 AS DOUBLE) / n))
                 / (n - 1))) > 3.0
"""


def q_lm_score_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leakage-free LM scoring: train the bigram LM on the deterministic
    # 'train' split (assign_splits) and score only the held-out docs —
    # the split-discipline composition a real quality pipeline runs.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    split = mixing.assign_splits(docs)
    train = split.where(F.col("split") == "train")
    heldout = split.where(F.col("split") != "train")
    return text.char_bigram_lm_scores(
        heldout, "text", "doc_id", prefix_len=200, train_df=train
    )


def _sql_lm_score_heldout() -> str:
    from etl_pipeline2_0_spark.functions.mixing import split_thresholds

    (_, t_train), *_ = split_thresholds(
        {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return rf"""
WITH split AS (
  SELECT doc_id, text,
         ('0' || substring(md5(CAST(doc_id AS VARCHAR) || ':'), 1, 15))
           < '{t_train}' AS is_train
  FROM documents
), d_tr AS (
  SELECT doc_id, lower(substring(text, 1, 200)) AS t FROM split
  WHERE is_train AND length(substring(text, 1, 200)) >= 2
), d_ho AS (
  SELECT doc_id, lower(substring(text, 1, 200)) AS t FROM split
  WHERE NOT is_train AND length(substring(text, 1, 200)) >= 2
), bg_tr AS (
  SELECT substring(t, CAST(i AS INT), 2) AS big,
         substring(t, CAST(i AS INT), 1) AS ctx
  FROM d_tr CROSS JOIN (SELECT unnest(range(1, 200)) AS i) s
  WHERE i <= length(t) - 1
), bg AS (
  SELECT doc_id, substring(t, CAST(i AS INT), 2) AS big,
         substring(t, CAST(i AS INT), 1) AS ctx
  FROM d_ho CROSS JOIN (SELECT unnest(range(1, 200)) AS i) s
  WHERE i <= length(t) - 1
), bc AS (
  SELECT big, COUNT(*) AS bc FROM bg_tr GROUP BY 1
), cc AS (
  SELECT ctx, COUNT(*) AS cc FROM bg_tr GROUP BY 1
), a AS (
  SELECT COUNT(DISTINCT substring(big, 2, 1)) AS alpha FROM bg_tr
)
SELECT bg.doc_id,
  COUNT(*) AS n_bigrams,
  ROUND(AVG(ln((COALESCE(bc.bc, 0) + 1.0) / (COALESCE(cc.cc, 0) + a.alpha))), 6)
    AS avg_logp
FROM bg LEFT JOIN bc USING (big) LEFT JOIN cc ON bg.ctx = cc.ctx CROSS JOIN a
GROUP BY bg.doc_id
"""


SQL_LM_SCORE_HELDOUT = _sql_lm_score_heldout()


def q_moore_lewis(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Moore-Lewis 2010 cross-entropy-difference selection: in-domain LM
    # trained on the src0 slice (the DSIR target convention), general LM
    # on the whole corpus; keep candidates whose per-char logp delta
    # clears 0 — the perplexity-space complement of dsir_weights.
    docs = load_table(spark, sf_dir, "documents")
    return text.moore_lewis_select(
        docs, docs.where(F.col("source") == "src0"),
        prefix_len=200, threshold=0.0,
    )


SQL_MOORE_LEWIS = r"""
WITH d_all AS (
  SELECT doc_id, source, lower(substring(text, 1, 200)) AS t
  FROM documents
  WHERE length(substring(text, 1, 200)) >= 2
), bg AS (
  SELECT doc_id, source,
         substring(t, CAST(i AS INT), 2) AS big,
         substring(t, CAST(i AS INT), 1) AS ctx
  FROM d_all CROSS JOIN (SELECT unnest(range(1, 200)) AS i) s
  WHERE i <= length(t) - 1
), bg_t AS MATERIALIZED (
  SELECT big, ctx FROM bg WHERE source = 'src0'
), bc_t AS (SELECT big, COUNT(*) AS bc FROM bg_t GROUP BY 1),
cc_t AS (SELECT ctx, COUNT(*) AS cc FROM bg_t GROUP BY 1),
a_t AS (SELECT COUNT(DISTINCT substring(big, 2, 1)) AS alpha FROM bg_t),
bc_g AS (SELECT big, COUNT(*) AS bc FROM bg GROUP BY 1),
cc_g AS (SELECT ctx, COUNT(*) AS cc FROM bg GROUP BY 1),
a_g AS (SELECT COUNT(DISTINCT substring(big, 2, 1)) AS alpha FROM bg),
scored AS (
  SELECT bg.doc_id,
    COUNT(*) AS n_bigrams,
    ROUND(AVG(ln((COALESCE(t.bc, 0) + 1.0)
                 / (COALESCE(ct.cc, 0) + a_t.alpha))), 6) AS logp_target,
    ROUND(AVG(ln((COALESCE(g.bc, 0) + 1.0)
                 / (COALESCE(cg.cc, 0) + a_g.alpha))), 6) AS logp_general
  FROM bg
  LEFT JOIN bc_t t USING (big)
  LEFT JOIN cc_t ct ON bg.ctx = ct.ctx
  LEFT JOIN bc_g g ON bg.big = g.big
  LEFT JOIN cc_g cg ON bg.ctx = cg.ctx
  CROSS JOIN a_t CROSS JOIN a_g
  GROUP BY bg.doc_id
)
SELECT doc_id, n_bigrams, logp_target, logp_general,
       ROUND(logp_target - logp_general, 6) AS ce_delta,
       ROUND(logp_target - logp_general, 6) >= 0.0 AS keep
FROM scored
"""


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Column-profiling observability: per-column null count, exact distinct
    # count, and null fraction for the documents table, long format.
    #
    # Shape: one column-pruned aggregate PER COLUMN, unioned — each scan
    # reads exactly its own parquet column (total I/O = the table once),
    # and there is no Expand blow-up from stacking countDistincts into a
    # single aggregate.  Wide values (text) are md5'd BEFORE the distinct
    # so the shuffle carries 32-byte digests, never document bodies —
    # the exact_dedup discipline applied to profiling.
    docs = load_table(spark, sf_dir, "documents")

    def prof(col: str, hashed: bool = False):
        v = F.md5(F.col(col)) if hashed else F.col(col)
        return docs.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.count_distinct(v).alias("n_distinct"),
        )

    parts = [
        prof("doc_id"),
        prof("text", hashed=True),
        prof("lang"),
        prof("source"),
        prof("n_chars"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
    )


SQL_PROFILE_COLUMNS = """
WITH p AS (
  SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
         SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS n_nulls,
         COUNT(DISTINCT doc_id) AS n_distinct
  FROM documents
  UNION ALL
  SELECT 'text', COUNT(*),
         SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT md5(text))
  FROM documents
  UNION ALL
  SELECT 'lang', COUNT(*),
         SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT lang)
  FROM documents
  UNION ALL
  SELECT 'source', COUNT(*),
         SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT source)
  FROM documents
  UNION ALL
  SELECT 'n_chars', COUNT(*),
         SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT n_chars)
  FROM documents
)
SELECT col_name, n_rows, CAST(n_nulls AS BIGINT) AS n_nulls, n_distinct,
       ROUND(n_nulls * 1.0 / n_rows, 6) AS null_frac
FROM p
"""


def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dedup-quality metric: recall of the (portable-hash) MinHash-LSH
    # pipeline against the exact n-gram-Jaccard ground truth at the same
    # threshold — the ann_recall pattern applied to the dedup family, and
    # fully oracled because both sides are.  Subset keeps the exact
    # all-pairs ground truth affordable at any SF; band geometry
    # (16 hashes x 8 bands of 2) puts expected recall >= 0.9 at J = 0.5.
    # Subset %2 (not the usual %10): the planted near-dup pairs land on
    # random id pairs, and %2 is the sparsest subset that still catches
    # true pairs at EVERY SF incl. the driver's sf0.01 (6 there) — %10
    # leaves sf0.01 with zero true pairs and a vacuous metric.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 0)
    truth = dedup.jaccard_pairs(docs, k=3, threshold=0.5).select("id_a", "id_b")
    found = dedup.minhash_near_duplicates(
        docs, k=3, num_hashes=16, bands=8, threshold=0.5, portable=True
    ).select("id_a", "id_b")
    return truth.crossJoin(
        F.broadcast(
            truth.join(found, ["id_a", "id_b"], "semi")
            .agg(F.count(F.lit(1)).alias("n_found"))
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"),
        F.max("n_found").cast("bigint").alias("n_recalled"),
        F.round(
            F.max("n_found") / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
        ).alias("recall"),
    )


SQL_MINHASH_RECALL = (
    _sql_minhash_portable()
    .replace("FROM documents\n", "FROM documents WHERE doc_id % 2 = 0\n", 1)
    .rstrip()
    .replace(
        ")\nSELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5",
        """), found AS (
  SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5
), truth AS (
  SELECT id_a, id_b FROM scored_truth WHERE jaccard_true >= 0.5
), agg AS (
  SELECT COUNT(*) AS n_true_pairs,
         SUM(CASE WHEN EXISTS (SELECT 1 FROM found f
                               WHERE f.id_a = truth.id_a
                                 AND f.id_b = truth.id_b)
                  THEN 1 ELSE 0 END) AS n_recalled
  FROM truth
)
SELECT CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_recalled AS BIGINT) AS n_recalled,
       ROUND(n_recalled * 1.0 / GREATEST(n_true_pairs, 1), 6) AS recall
FROM agg""",
    )
    .replace(
        "), cand AS (",
        """), truth_inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), scored_truth AS (
  SELECT id_a, id_b,
         ROUND(n_common * 1.0 / (sa2.n + sb2.n - n_common), 6) AS jaccard_true
  FROM truth_inter
  JOIN (SELECT id, COUNT(*) AS n FROM sh GROUP BY id) sa2 ON id_a = sa2.id
  JOIN (SELECT id, COUNT(*) AS n FROM sh GROUP BY id) sb2 ON id_b = sb2.id
), cand AS (""",
    )
)


def q_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dup-cluster observability: the size distribution of near-duplicate
    # clusters (how much of the corpus is pairwise dups vs big template
    # families — the number that decides dedup strategy at scale).
    comps = q_dup_components(spark, sf_dir)
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
        )
    )


SQL_DUP_CLUSTER_STATS = f"""
WITH comp AS ({SQL_DUP_COMPONENTS}),
sizes AS (
  SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size, COUNT(*) AS n_clusters
FROM sizes GROUP BY cluster_size
"""


def q_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Label-quality metric: does the 5-NN majority label agree with each
    # query's OWN label?  (Self is excluded from the neighbor set, so this
    # is honest leave-one-out agreement — the standard probe for label
    # noise in embedding space.)
    emb = load_table(spark, sf_dir, "embeddings")
    preds = similarity.knn_label_vote(emb, emb.where(F.col("vec_id") < 8), k=5)
    truth = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").cast("bigint").alias("true_label"),
    )
    return preds.join(truth, "query_id").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        ).cast("bigint").alias("n_correct"),
        F.round(
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            )
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


SQL_KNN_ACCURACY = f"""
WITH pred AS ({SQL_KNN_LABEL_VOTE}),
truth AS (
  SELECT vec_id AS query_id, CAST(label AS BIGINT) AS true_label
  FROM embeddings WHERE vec_id < 8
)
SELECT COUNT(*) AS n_queries,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS accuracy
FROM pred JOIN truth USING (query_id)
"""


def q_simhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SimHash near-dup under the md5-portable native-expression hasher:
    # same pigeonhole chunk equi-join as simhash_pairs, but the WHOLE
    # pipeline (hash, ±1 votes, signature, banding, Hamming verify) is
    # ANSI-expressible — graduating the SimHash family to a full oracle
    # (the xxhash64+numpy simhash_pairs stays the fast path).
    # max_hamming=3 with blocks=4 satisfies the pigeonhole EXACTNESS
    # precondition (max_hamming < blocks, dedup.hamming_pairs) — the r8
    # advisor caught that the earlier max_hamming=8 setting silently
    # missed pairs at distance 4-8 whose differing bits straddled all
    # four chunks.  3 is also the family default (simhash_near_duplicates
    # and the Manku et al. 64-bit setting), so fast path and portable
    # oracle now share the same distance semantics.
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.simhash60_portable(docs)
    return dedup.hamming_pairs(
        sigs, id_col="id", sig_col="simhash", max_hamming=3, blocks=4
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_simhash_portable(max_hamming: int = 8, blocks: int = 4) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(60)
    )
    assemble = "\n           + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(60)
    )
    bits_per = 64 // blocks
    mask = (1 << bits_per) - 1
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT id, {c} AS chunk_idx,"
        f" (simhash >> {c * bits_per}) & {mask} AS chunk_val FROM sig"
        for c in range(blocks)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS tok
  FROM documents
), hashes AS (
  SELECT id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
), votes AS (
  SELECT id,
         {votes}
  FROM hashes GROUP BY id
), sig AS (
  SELECT id,
         CAST({assemble}
           AS BIGINT) AS simhash
  FROM votes
), banded AS (
{band_selects}
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a
  JOIN banded b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val AND a.id < b.id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
FROM cand JOIN sig sa ON id_a = sa.id JOIN sig sb ON id_b = sb.id
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
"""


SQL_SIMHASH_PAIRS_PORTABLE = _sql_simhash_portable(max_hamming=3, blocks=4)


def q_assign_splits_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leakage-safe (group-aware) splitting: hash the SOURCE, not the doc,
    # so every doc of a domain lands in the same split — near-dups within
    # a domain can't straddle train/val (standard ML-hygiene variant;
    # same assign_splits machinery with the group as the hash key).
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.assign_splits(
        docs, weights={"train": 0.8, "val": 0.2}, id_col="source"
    ).select("doc_id", "source", "split")


def _sql_assign_splits_grouped() -> str:
    from etl_pipeline2_0_spark.functions.mixing import split_thresholds

    (_, t_train), _ = split_thresholds({"train": 0.8, "val": 0.2})
    return f"""
SELECT doc_id, source,
       CASE WHEN '0' || substring(md5(CAST(source AS VARCHAR) || ':'), 1, 15)
                 < '{t_train}'
            THEN 'train' ELSE 'val' END AS split
FROM documents
"""


SQL_ASSIGN_SPLITS_GROUPED = _sql_assign_splits_grouped()


def q_pack_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialized packing: same 256-token packs as pack_sequences, plus
    # the concatenated training sequence per pack.  Subset keeps the
    # string-heavy oracle cheap; assignment logic is identical to the
    # full-corpus pack_sequences (shared _assign_packs).
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return mixing.pack_texts(docs, budget_tokens=256)


SQL_PACK_TEXTS = r"""
WITH toks AS (
  SELECT source, doc_id, text,
         len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                         x -> length(x) > 0)) AS n_tokens
  FROM documents WHERE doc_id % 5 = 0
), packed AS (
  SELECT source, doc_id, text, n_tokens,
         CAST(floor(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
           AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       string_agg(text, ' ' ORDER BY doc_id) AS seq_text
FROM packed
GROUP BY source, pack_id
"""


def q_interleave_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ratio-faithful interleaving keys over three weighted sources; the
    # remaining sources take the minimum weight.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1", "src2")
    )
    return mixing.interleave_key(
        docs, {"src0": 2.0, "src1": 1.0, "src2": 0.5}
    ).select("doc_id", "source", "src_rank", "ileave_key")


SQL_INTERLEAVE_KEY = """
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'),
                                           1, 15) AS BIGINT),
                    doc_id
         ) AS src_rank
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
)
SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
       ROUND(src_rank / (CASE source WHEN 'src0' THEN 2.0
                                     WHEN 'src1' THEN 1.0
                                     ELSE 0.5 END), 6) AS ileave_key
FROM ranked
"""


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Curation signal: per-document novelty = fraction of its distinct
    # shingles appearing in NO other document (1.0 = fully novel content,
    # ~0 = boilerplate).  One shingle explode -> doc-freq aggregate ->
    # per-doc conditional aggregate; the shuffle carries 8-byte shingle
    # hashes (the jaccard_pairs discipline), never shingle text.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    sh = (
        docs.select(
            F.col("doc_id"),
            F.explode(dedup.token_shingles(F.col("text"), 3)).alias("shingle"),
        )
        .select("doc_id", F.xxhash64("shingle").alias("h"))
    )
    freq = sh.groupBy("h").agg(F.count_distinct("doc_id").alias("df"))
    return (
        sh.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )


SQL_DOC_NOVELTY = r"""
WITH docs AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id % 5 = 0
), toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(t, '\W+'),
                             x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM toks
), sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL
), freq AS (
  SELECT shingle, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY shingle
)
SELECT sh.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       ROUND(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS novelty
FROM sh JOIN freq USING (shingle)
GROUP BY sh.doc_id
"""


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Referential-integrity audit: orphan counts for the star schema's
    # child->parent keys — the data-quality gate a warehouse runs after
    # every load.  Each pair is one LEFT ANTI join on the key (digest-size
    # shuffle; the parent side reduces to distinct keys first).
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    def audit(child, ckey, parent, pkey, name):
        orphans = child.select(F.col(ckey)).join(
            parent.select(F.col(pkey).alias(ckey)).distinct(), ckey, "anti"
        )
        return child.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_child"),
        ).crossJoin(
            F.broadcast(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
        )

    pairs = [
        audit(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        audit(li, "l_partkey", part, "p_partkey", "lineitem->part"),
        audit(li, "l_suppkey", supp, "s_suppkey", "lineitem->supplier"),
        audit(orders, "o_custkey", cust, "c_custkey", "orders->customer"),
    ]
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    return out.select(
        "relation",
        "n_child",
        "n_orphans",
        F.round(F.col("n_orphans") / F.col("n_child"), 6).alias("orphan_frac"),
    )


SQL_FK_INTEGRITY = """
WITH a AS (
  SELECT 'lineitem->orders' AS relation,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
  UNION ALL
  SELECT 'lineitem->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem->supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'orders->customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
)
SELECT relation, n_child, n_orphans,
       ROUND(n_orphans * 1.0 / n_child, 6) AS orphan_frac
FROM a
"""


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lexical document similarity: cosine over sparse TF-IDF vectors (the
    # classic IR doc-doc similarity) — completes the similarity triple
    # next to set-based Jaccard and embedding cosine.  Same idf form as
    # tfidf_top_terms.  Relational shape: one shared-term equi-join prunes
    # the pair space (docs sharing no term never meet); norms are per-doc
    # aggregates; no cross join.
    #
    # max_df VOCABULARY cap (the r8 verdict's one weak flag): a term with
    # document frequency df contributes df²/2 rows to the postings join,
    # so one stopword-grade term with df=n is a quadratic blowup — on
    # exactly the terms TF-IDF weights near zero anyway.  Terms past the
    # absolute cap are pruned from the vocabulary BEFORE weights/norms
    # (sklearn's max_df semantics), bounding join fan-out at
    # |vocab|·max_df² — the same degenerate-key discipline as LSH's
    # max_bucket_size (dedup.py) and jaccard's max_doc_freq.  256 is
    # above any fixture-scale df (sf≤0.01 results are bit-identical to
    # the uncapped form — property-pinned in test_functions.py) and
    # bounds the worst term at 32k pair rows at any corpus size.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return text.tfidf_cosine_pairs(
        docs, text_col="text", id_col="doc_id", max_df=256, min_cosine=0.5
    )


SQL_TFIDF_COSINE_PAIRS = r"""
WITH docs AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id % 10 = 0
), term_rows AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(t, '\W+'),
                                    x -> length(x) > 0)) AS term
  FROM docs
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM term_rows GROUP BY doc_id, term
), n AS (
  SELECT COUNT(*) AS n_docs FROM docs
), dft AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
  HAVING COUNT(*) <= 256
), weighted AS (
  SELECT doc_id, term,
         tf * (ln((n_docs + 1) * 1.0 / (df + 1)) + 1.0) AS w
  FROM tf JOIN dft USING (term) CROSS JOIN n
), norms AS (
  SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM weighted GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
  FROM weighted a JOIN weighted b
    ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), scored AS (
  SELECT id_a, id_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots
  JOIN norms na ON id_a = na.doc_id
  JOIN norms nb ON id_b = nb.doc_id
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.5
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR importance log-weights (Xie et al. 2023): hashed unigram+bigram
    # features, target = the src0 slice (the "domain" being selected for),
    # raw = the whole corpus.  Portable md5 buckets → full DuckDB twin.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.dsir_log_weights(
        docs, docs.where(F.col("source") == "src0"), num_buckets=2048
    )


# Shared DSIR CTE chain: portable md5-hex15 bucket of every unigram and
# bigram OCCURRENCE (counts matter — no DISTINCT), add-1-smoothed
# target/raw log-ratio per bucket, per-doc feature-sum.
_SQL_DSIR_CTES = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM toks
), bigrams AS (
  SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w AS g
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), grams AS (
  SELECT doc_id, tok AS g FROM tok_rows
  UNION ALL
  SELECT doc_id, g FROM bigrams WHERE g IS NOT NULL
), feats AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % 2048 AS bucket
  FROM grams
), raw_c AS (
  SELECT bucket, COUNT(*) AS c_raw FROM feats GROUP BY bucket
), tgt_c AS (
  SELECT bucket, COUNT(*) AS c_tgt
  FROM feats JOIN documents USING (doc_id)
  WHERE source = 'src0' GROUP BY bucket
), dist AS (
  SELECT COALESCE(r.bucket, t.bucket) AS bucket,
         COALESCE(c_raw, 0) AS c_raw, COALESCE(c_tgt, 0) AS c_tgt
  FROM raw_c r FULL OUTER JOIN tgt_c t ON r.bucket = t.bucket
), tot AS (
  SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM dist
), ratio AS (
  SELECT bucket,
         ln((c_tgt + 1.0) / (t_tgt + 2048.0))
           - ln((c_raw + 1.0) / (t_raw + 2048.0)) AS log_ratio
  FROM dist CROSS JOIN tot
), weights AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_features,
         ROUND(SUM(log_ratio), 6) AS log_weight
  FROM feats JOIN ratio USING (bucket)
  GROUP BY doc_id
)
"""

SQL_DSIR_WEIGHTS = _SQL_DSIR_CTES + "SELECT * FROM weights"


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR's resampling step: 100 docs without replacement ∝ exp(weight)
    # via deterministic-portable Gumbel-top-k (md5-uniform noise).
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.dsir_gumbel_sample(
        docs, docs.where(F.col("source") == "src0"), k=100, num_buckets=2048
    )


def _sql_dsir_sample(salt: str = "", k: int = 100) -> str:
    # Generated from the SAME salt and hex15 space the Spark side uses
    # (mixing._HEX15_SPACE) — one source of truth, so changing either in
    # mixing.dsir_gumbel_sample can't silently break the twin (advisor
    # r10).  ``salt`` must be SQL-literal-safe (registry uses default "").
    from etl_pipeline2_0_spark.functions.mixing import _HEX15_SPACE

    space = float(_HEX15_SPACE) + 2.0
    return _SQL_DSIR_CTES + f"""
SELECT doc_id, log_weight,
       ROUND(log_weight - ln(-ln(
         (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{salt}'),
               1, 15) AS BIGINT) + 1.0) / {space:.1f}
       )), 6) AS sample_key
FROM weights
ORDER BY sample_key DESC, doc_id
LIMIT {k}
"""


SQL_DSIR_SAMPLE = _sql_dsir_sample()


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Gopher heuristic rule battery (Rae et al. 2021 Table A1) at the
    # paper's published thresholds — per-doc metrics + keep verdict.
    from etl_pipeline2_0_spark.functions import text

    docs = load_table(spark, sf_dir, "documents")
    return text.gopher_quality_flags(docs)


SQL_GOPHER_RULES = r"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks,
         string_split(text, chr(10)) AS lines,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS wtoks
  FROM documents
), metrics AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         ROUND(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE list_sum(list_transform(toks, x -> length(x))) * 1.0
                    / len(toks) END, 6) AS mean_word_len,
         ROUND(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE len(regexp_extract_all(text, '(#|\.\.\.|…)')) * 1.0
                    / len(toks) END, 6) AS symbol_ratio,
         ROUND(len(list_filter(lines,
                 l -> regexp_matches(l, '^[ \x09]*[-*•]'))) * 1.0
               / len(lines), 6) AS bullet_line_frac,
         ROUND(len(list_filter(lines,
                 l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) * 1.0
               / len(lines), 6) AS ellipsis_line_frac,
         ROUND(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE len(list_filter(toks,
                      w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
                    / len(toks) END, 6) AS alpha_word_frac,
         CAST(len(list_intersect(list_distinct(wtoks),
              ['the','be','to','of','and','that','have','with']))
              AS BIGINT) AS n_stopword_hits
  FROM base
)
SELECT *,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1
        AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8
        AND n_stopword_hits >= 2) AS keep
FROM metrics
"""


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Product-quantization ANN (Jégou et al. 2011) under the repo's
    # portable construction: md5-hash-sampled codewords, relational
    # argmin encoding, ADC scoring that scans only the M-codes table —
    # the compression path that makes billion-vector ANN feasible.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_topk(
        emb, emb.where(F.col("vec_id") < 8), k=5,
        n_subspaces=16, n_codes=64, dim=64,
    )


# Shared PQ CTE chain (mirrors similarity.pq_codebook/pq_encode/pq_topk):
# seeds = smallest-md5 corpus rows; codebook = their 4×16-dim slices;
# encoding = per (vector, subspace) argmin-L2 codeword; ADC = query-to-
# codeword partial distances summed over subspaces via the (m, code) join.
_SQL_PQ_CTES = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
h AS (
  SELECT vec_id, v,
         CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)
           AS hh
  FROM e
), seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY hh, vec_id) AS INT) AS code, v
  FROM h
  QUALIFY code <= 64
), ms AS (
  SELECT unnest(range(1, 17)) AS m
), cb AS (
  SELECT m, code, v[(m - 1) * 4 + 1 : m * 4] AS cw
  FROM seeds CROSS JOIN ms
), sub AS (
  SELECT vec_id, m, v[(m - 1) * 4 + 1 : m * 4] AS sub
  FROM e CROSS JOIN ms
), enc_scored AS (
  SELECT vec_id, m, code,
         ROUND(list_inner_product(sub, sub) + list_inner_product(cw, cw)
               - 2 * list_inner_product(sub, cw), 6) AS d
  FROM sub JOIN cb USING (m)
), codes AS (
  SELECT vec_id, m, code FROM enc_scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, code) = 1
), dtab AS (
  SELECT s.vec_id AS query_id, s.m, cb.code,
         ROUND(list_inner_product(s.sub, s.sub)
               + list_inner_product(cb.cw, cb.cw)
               - 2 * list_inner_product(s.sub, cb.cw), 6) AS pd
  FROM sub s JOIN cb ON s.m = cb.m
  WHERE s.vec_id < 8
), pq_scored AS (
  SELECT d.query_id, c.vec_id AS neighbor_id, ROUND(SUM(pd), 6) AS adc_dist
  FROM codes c JOIN dtab d ON c.m = d.m AND c.code = d.code
  WHERE c.vec_id <> d.query_id
  GROUP BY d.query_id, c.vec_id
), pq_topk AS (
  SELECT query_id, neighbor_id, adc_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_dist, neighbor_id) AS INT) AS rnk
  FROM pq_scored
  QUALIFY rnk <= 5
)
"""

SQL_ANN_PQ_TOPK = _SQL_PQ_CTES + """
SELECT query_id, neighbor_id, adc_dist, rnk FROM pq_topk
"""


def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Recall@5 of the PQ/ADC path vs the EXACT L2 top-k (PQ's native
    # metric) — the measured-quality companion, fully oracled like
    # ann_ivf_recall_portable.
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    qs = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        )
        .crossJoin(F.broadcast(qs))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(similarity.l2sq(F.col("qv"), F.col("cv")), 6).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d"), F.col("neighbor_id"))
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id")
    )
    approx = similarity.pq_topk(
        emb, q, k=5, n_subspaces=16, n_codes=64, dim=64
    ).select("query_id", "neighbor_id")
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0), 6
            ).alias("recall_at_k"),
        )
    )


SQL_ANN_PQ_RECALL = _SQL_PQ_CTES + """
, exact_topk AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             ROUND(list_inner_product(q.v, q.v)
                   + list_inner_product(a.v, a.v)
                   - 2 * list_inner_product(q.v, a.v), 6),
             a.vec_id) AS INT) AS rnk
    FROM e a CROSS JOIN (SELECT vec_id, v FROM e WHERE vec_id < 8) q
    WHERE a.vec_id <> q.vec_id
  ) WHERE rnk <= 5
), hits AS (
  SELECT p.query_id, COUNT(*) AS n_hits
  FROM pq_topk p JOIN exact_topk x
    ON p.query_id = x.query_id AND p.neighbor_id = x.neighbor_id
  GROUP BY p.query_id
)
SELECT q.vec_id AS query_id,
       ROUND(COALESCE(n_hits, 0) / 5.0, 6) AS recall_at_k
FROM (SELECT vec_id FROM e WHERE vec_id < 8) q
LEFT JOIN hits ON q.vec_id = hits.query_id
"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-min-sketch heavy hitters: the exact top-20 corpus tokens with
    # their sketch estimates side by side — the accuracy harness for the
    # fixed-memory frequency pass that would feed the dedup doc-freq caps
    # at 100 TB (the hll_accuracy pattern, applied to frequencies).
    from etl_pipeline2_0_spark.functions import sketches

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\W+"), lambda t: F.length(t) > 0
            )
        ).alias("item")
    )
    sk = sketches.cms_sketch(occ, depth=4, width=256)
    exact = (
        occ.groupBy(F.col("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("item"))
        .limit(20)
    )
    est = sketches.cms_estimate(exact.select("item"), sk, depth=4, width=256)
    return exact.join(est, "item").select(
        F.col("item").alias("token"), "exact_cnt", "cms_est"
    )


SQL_CMS_HEAVY_HITTERS = r"""
WITH occ AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS tok
  FROM documents
), rows_ AS (
  SELECT unnest([0, 1, 2, 3]) AS row
), cells AS (
  SELECT row,
         CAST('0x' || substring(md5(CAST(row AS VARCHAR) || ':' || tok),
                                1, 15) AS BIGINT) % 256 AS bucket
  FROM occ CROSS JOIN rows_
), sketch AS (
  SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY row, bucket
), exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM occ GROUP BY tok
  QUALIFY ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, tok) <= 20
), probes AS (
  SELECT tok, exact_cnt, row,
         CAST('0x' || substring(md5(CAST(row AS VARCHAR) || ':' || tok),
                                1, 15) AS BIGINT) % 256 AS bucket
  FROM exact CROSS JOIN rows_
)
SELECT tok AS token, exact_cnt, MIN(cnt) AS cms_est
FROM probes JOIN sketch USING (row, bucket)
GROUP BY tok, exact_cnt
"""


def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decontamination at sketch scale: the eval set (every 97th doc, the
    # contamination_check convention) ships as a ≤4096-row Bloom-bit
    # relation instead of its shingle set; each training doc reports its
    # shingle count, the bloom-flagged count, and the EXACT contaminated
    # count side by side — the false-positive overhead is the visible
    # difference, and false negatives are structurally impossible.
    from etl_pipeline2_0_spark.functions import sketches

    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    # Both shingle frames feed two consumers each (eval: bloom bits + the
    # exact side; corpus: the candidate set + the per-doc rollup) — lazy
    # barriers materialize each tokenizer pass once (the jaccard_pairs
    # discipline; measured ~2× on this query at sf0.1).
    eval_sh = (
        eval_set.select(
            F.explode(dedup.token_shingles(F.col("text"), 3)).alias("item")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    pairs = corpus.select(
        "doc_id", F.explode(dedup.token_shingles(F.col("text"), 3)).alias("item")
    ).localCheckpoint(eager=False)
    bloom = sketches.bloom_build(eval_sh, num_hashes=4, num_bits=4096)
    verdicts = sketches.bloom_probe(
        pairs.select("item").distinct(), bloom, num_hashes=4, num_bits=4096
    )
    exact = eval_sh.withColumn("_in_eval", F.lit(1))
    return (
        pairs.join(verdicts, "item")
        .join(exact.select("item", "_in_eval"), "item", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("maybe_present"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_bloom_flagged"),
            F.sum(F.coalesce(F.col("_in_eval"), F.lit(0)))
            .cast("bigint")
            .alias("n_exact_contaminated"),
        )
    )


SQL_BLOOM_CONTAMINATION = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM tok
), sh0 AS (
  SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w || ' '
           || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL
), eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
), pairs AS (
  SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0
), rows_ AS (
  SELECT unnest([0, 1, 2, 3]) AS row
), bloom AS (
  SELECT DISTINCT
         CAST('0x' || substring(md5(CAST(row AS VARCHAR) || ':' || shingle),
                                1, 15) AS BIGINT) % 4096 AS bit
  FROM eval_sh CROSS JOIN rows_
), cand AS (
  SELECT DISTINCT shingle FROM pairs
), probes AS (
  SELECT shingle, row,
         CAST('0x' || substring(md5(CAST(row AS VARCHAR) || ':' || shingle),
                                1, 15) AS BIGINT) % 4096 AS bit
  FROM cand CROSS JOIN rows_
), verdicts AS (
  SELECT c.shingle,
         COALESCE(h.n_set, 0) = 4 AS maybe_present
  FROM cand c LEFT JOIN (
    SELECT shingle, COUNT(*) AS n_set
    FROM probes JOIN bloom USING (bit)
    GROUP BY shingle
  ) h ON c.shingle = h.shingle
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN v.maybe_present THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_flagged,
       CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_contaminated
FROM pairs p
JOIN verdicts v ON p.shingle = v.shingle
LEFT JOIN eval_sh e ON p.shingle = e.shingle
GROUP BY p.doc_id
"""


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Split-leakage audit: assign the standard deterministic train/val/
    # test splits, then measure each VAL doc's shingle containment against
    # the TRAIN side — near-dup leakage across the split boundary is
    # exactly what makes validation loss lie.  Pure composition:
    # assign_splits → contamination_check, both already oracled.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    s = mixing.assign_splits(docs)
    train = s.where(F.col("split") == "train")
    val = s.where(F.col("split") == "val")
    return dedup.contamination_check(train, val, k=3).select(
        F.col("eval_id").alias("doc_id"),
        "n_shingles",
        "n_contaminated",
        "containment",
    )


def _sql_split_leakage() -> str:
    from etl_pipeline2_0_spark.functions.mixing import split_thresholds

    pairs = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    whens = "\n            ".join(
        f"WHEN hx < '{bound}' THEN '{name}'" for name, bound in pairs[:-1]
    )
    return f"""
WITH s AS (
  SELECT doc_id, text,
         CASE {whens}
              ELSE '{pairs[-1][0]}' END AS split
  FROM (
    SELECT doc_id, text,
           '0' || substring(md5(CAST(doc_id AS VARCHAR) || ':'), 1, 15) AS hx
    FROM documents
  )
), tok AS (
  SELECT doc_id, split,
         list_filter(regexp_split_to_array(lower(text), '\\W+'),
                     x -> length(x) > 0) AS toks
  FROM s WHERE split IN ('train', 'val')
), tok_rows AS (
  SELECT doc_id, split, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM tok
), sh3 AS (
  SELECT doc_id, split,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), sh AS (
  SELECT DISTINCT doc_id, split, shingle FROM sh3 WHERE shingle IS NOT NULL
), train_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE split = 'train'
), val_sh AS (
  SELECT doc_id, shingle FROM sh WHERE split = 'val'
)
SELECT v.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       ROUND(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS containment
FROM val_sh v LEFT JOIN train_sh t USING (shingle)
GROUP BY v.doc_id
"""


SQL_SPLIT_LEAKAGE = _sql_split_leakage()


def q_gopher_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-rule attrition for the Gopher battery (the filter_audit pattern):
    # how many docs each rule rejects, individually and overall — the
    # number a corpus build actually tunes against.  One conditional
    # aggregate over the flags frame; no second corpus pass.
    from etl_pipeline2_0_spark.functions import text

    flags = text.gopher_quality_flags(load_table(spark, sf_dir, "documents"))
    c = lambda cond, name: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)  # noqa: E731
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        c(~((F.col("n_words") >= 50) & (F.col("n_words") <= 100000)), "fail_word_count"),
        c(~((F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)), "fail_mean_word_len"),
        c(F.col("symbol_ratio") > 0.1, "fail_symbol_ratio"),
        c(F.col("bullet_line_frac") > 0.9, "fail_bullet_lines"),
        c(F.col("ellipsis_line_frac") > 0.3, "fail_ellipsis_lines"),
        c(F.col("alpha_word_frac") < 0.8, "fail_alpha_words"),
        c(F.col("n_stopword_hits") < 2, "fail_stopwords"),
        c(~F.col("keep"), "n_rejected"),
        F.round(F.avg(F.when(F.col("keep"), 1.0).otherwise(0.0)), 6).alias("keep_rate"),
    )


def _sql_gopher_audit() -> str:
    metrics = SQL_GOPHER_RULES.strip()
    return f"""
WITH flags AS ({metrics})
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN NOT (n_words >= 50 AND n_words <= 100000)
                THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
       CAST(SUM(CASE WHEN NOT (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
       CAST(SUM(CASE WHEN symbol_ratio > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_symbol_ratio,
       CAST(SUM(CASE WHEN bullet_line_frac > 0.9 THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_bullet_lines,
       CAST(SUM(CASE WHEN ellipsis_line_frac > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_ellipsis_lines,
       CAST(SUM(CASE WHEN alpha_word_frac < 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_alpha_words,
       CAST(SUM(CASE WHEN n_stopword_hits < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_stopwords,
       CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
       ROUND(AVG(CASE WHEN keep THEN 1.0 ELSE 0.0 END), 6) AS keep_rate
FROM flags
"""


SQL_GOPHER_AUDIT = _sql_gopher_audit()


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet's defining move (Wenzek et al. 2020): partition each LANGUAGE
    # by LM perplexity into head/middle/tail terciles — head feeds
    # training, tail gets dropped or down-weighted.  Pure composition of
    # oracled primitives: char-bigram lm_score + lang_id + per-group
    # exact percentiles (the quantile_filter idiom).  Bucket decisions
    # compare 6dp-ROUNDED score vs 6dp-ROUNDED thresholds so both
    # engines agree at boundaries.
    docs = load_table(spark, sf_dir, "documents")
    scored = text.char_bigram_lm_scores(docs, "text", "doc_id", prefix_len=200)
    langs = docs.select("doc_id", text.lang_id(F.col("text")).alias("lang"))
    j = scored.join(langs, "doc_id").select("doc_id", "lang", "avg_logp")
    thr = j.groupBy("lang").agg(
        F.round(F.percentile("avg_logp", 2.0 / 3), 6).alias("t_head"),
        F.round(F.percentile("avg_logp", 1.0 / 3), 6).alias("t_mid"),
    )
    return j.join(F.broadcast(thr), "lang").select(
        "doc_id",
        "lang",
        "avg_logp",
        F.when(F.col("avg_logp") >= F.col("t_head"), "head")
        .when(F.col("avg_logp") >= F.col("t_mid"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


SQL_CCNET_BUCKETS = rf"""
WITH d AS (
  SELECT doc_id, lower(substring(text, 1, 200)) AS t FROM documents
  WHERE length(substring(text, 1, 200)) >= 2
), bg AS (
  SELECT doc_id, substring(t, CAST(i AS INT), 2) AS big,
         substring(t, CAST(i AS INT), 1) AS ctx
  FROM d CROSS JOIN (SELECT unnest(range(1, 200)) AS i) s
  WHERE i <= length(t) - 1
), bc AS (
  SELECT big, COUNT(*) AS bc FROM bg GROUP BY 1
), cc AS (
  SELECT ctx, COUNT(*) AS cc FROM bg GROUP BY 1
), a AS (
  SELECT COUNT(DISTINCT substring(big, 2, 1)) AS alpha FROM bg
), scores AS (
  SELECT bg.doc_id,
         ROUND(AVG(ln((bc.bc + 1.0) / (cc.cc + a.alpha))), 6) AS avg_logp
  FROM bg JOIN bc USING (big) JOIN cc ON bg.ctx = cc.ctx CROSS JOIN a
  GROUP BY bg.doc_id
), lang_scored AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["en"]})\b')) AS en,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["es"]})\b')) AS es,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["fr"]})\b')) AS fr,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["de"]})\b')) AS de
  FROM documents
), langs AS (
  SELECT doc_id, CASE
      WHEN GREATEST(en, es, fr, de) = 0 THEN 'und'
      WHEN en = GREATEST(en, es, fr, de) THEN 'en'
      WHEN es = GREATEST(en, es, fr, de) THEN 'es'
      WHEN fr = GREATEST(en, es, fr, de) THEN 'fr'
      ELSE 'de' END AS lang
  FROM lang_scored
), j AS (
  SELECT s.doc_id, l.lang, s.avg_logp
  FROM scores s JOIN langs l USING (doc_id)
), thr AS (
  SELECT lang,
         ROUND(quantile_cont(avg_logp, 2.0 / 3), 6) AS t_head,
         ROUND(quantile_cont(avg_logp, 1.0 / 3), 6) AS t_mid
  FROM j GROUP BY 1
)
SELECT j.doc_id, j.lang, j.avg_logp,
       CASE WHEN j.avg_logp >= t.t_head THEN 'head'
            WHEN j.avg_logp >= t.t_mid THEN 'middle'
            ELSE 'tail' END AS bucket
FROM j JOIN thr t USING (lang)
"""


# ------------------------------------------------ line-level exact dedup -


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MassiveText/RefinedWeb exact line dedup: boilerplate lines (shared
    # across >1 distinct docs) removed from every doc, order-preserving
    # reassembly.  The synthetic corpus has no cross-doc duplicate lines
    # (verified), so this row proves the split→count→anti-join→rebuild
    # plan parity end-to-end; the drop path is pinned by the planted
    # boilerplate fixtures in tests/test_functions.py.
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_lines(docs)


SQL_DEDUP_LINES = r"""
WITH ls AS (
  SELECT doc_id, string_split(text, chr(10)) AS arr FROM documents
), lines AS (
  SELECT doc_id, unnest(arr) AS line, generate_subscripts(arr, 1) AS pos
  FROM ls
), hot AS (
  SELECT line FROM lines WHERE length(trim(line)) >= 10
  GROUP BY line HAVING COUNT(DISTINCT doc_id) > 1
), kept AS (
  SELECT doc_id, pos, line FROM lines
  WHERE line NOT IN (SELECT line FROM hot)
), tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines FROM lines GROUP BY 1
), reb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY 1
)
SELECT t.doc_id, t.n_lines,
       CAST(t.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
       COALESCE(r.text, '') AS text
FROM tot t LEFT JOIN reb r USING (doc_id)
"""


# ------------------------------------- seed-trained quality classifier -


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet/LLaMA-style seed classifier: src0 docs as the quality seed,
    # src1 as the reject seed, hashed-unigram NB log-odds over the whole
    # corpus.  Portable md5-hex15 buckets → exact DuckDB twin.
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_classifier_scores(
        docs,
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") == "src1"),
        num_buckets=4096,
    )


SQL_QUALITY_CLASSIFIER = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), feats AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(unnest(toks)), 1, 15) AS BIGINT)
           % 4096 AS bucket
  FROM toks
), pos_c AS (
  SELECT bucket, COUNT(*) AS c_pos
  FROM feats JOIN documents USING (doc_id)
  WHERE source = 'src0' GROUP BY 1
), neg_c AS (
  SELECT bucket, COUNT(*) AS c_neg
  FROM feats JOIN documents USING (doc_id)
  WHERE source = 'src1' GROUP BY 1
), dist AS (
  SELECT COALESCE(p.bucket, n.bucket) AS bucket,
         COALESCE(c_pos, 0) AS c_pos, COALESCE(c_neg, 0) AS c_neg
  FROM pos_c p FULL OUTER JOIN neg_c n ON p.bucket = n.bucket
), tot AS (
  SELECT SUM(c_pos) AS t_pos, SUM(c_neg) AS t_neg FROM dist
), prior AS (
  SELECT ln(SUM(CASE WHEN source = 'src0' THEN 1.0 ELSE 0 END)
            / SUM(CASE WHEN source = 'src1' THEN 1.0 ELSE 0 END))
           AS log_prior
  FROM documents
), odds AS (
  SELECT bucket,
         ln((c_pos + 1.0) / (t_pos + 4096.0))
           - ln((c_neg + 1.0) / (t_neg + 4096.0)) AS log_odds
  FROM dist CROSS JOIN tot
), scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
         SUM(log_odds) AS evidence
  FROM feats JOIN odds USING (bucket) GROUP BY 1
)
SELECT d.doc_id, COALESCE(s.n_features, 0) AS n_features,
       ROUND(p.log_prior + COALESCE(s.evidence, 0.0), 6) AS score,
       ROUND(p.log_prior + COALESCE(s.evidence, 0.0), 6) > 0 AS label
FROM documents d LEFT JOIN scored s USING (doc_id) CROSS JOIN prior p
"""


# --------------------------------------------- DoReMi domain reweighting -

# One source of truth for the EG hyperparameters: the Spark call and the
# generated twin both read these (the advisor-r10 DSIR-salt lesson).
_DOREMI = {"steps": 10, "eta": 1.0, "smooth": 0.01}


def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.doremi_weights(docs, **_DOREMI)


def _sql_doremi_weights(steps: int, eta: float, smooth: float) -> str:
    # The LM-score CTEs are SQL_LM_SCORE's, re-inlined (the CCNet twin
    # pattern); the EG loop is a k-step MATERIALIZED CTE chain (the BPE
    # twin lesson: DuckDB inlines multi-referenced CTEs exponentially
    # otherwise).  exp() runs once in `base`; the loop itself is pure
    # rational arithmetic, so the engines agree at 6 dp.
    chain = []
    prev = "w0"
    for i in range(1, steps + 1):
        chain.append(
            f""", w{i} AS MATERIALIZED (
  SELECT domain, loss, excess, nd, boost,
         (1.0 - {smooth}) * w * boost / SUM(w * boost) OVER ()
           + {smooth} / nd AS w
  FROM {prev}
)"""
        )
        prev = f"w{i}"
    steps_sql = "".join(chain)
    return rf"""
WITH d AS (
  SELECT doc_id, lower(substring(text, 1, 200)) AS t FROM documents
  WHERE length(substring(text, 1, 200)) >= 2
), bg AS (
  SELECT doc_id, substring(t, CAST(i AS INT), 2) AS big,
         substring(t, CAST(i AS INT), 1) AS ctx
  FROM d CROSS JOIN (SELECT unnest(range(1, 200)) AS i) s
  WHERE i <= length(t) - 1
), bc AS (
  SELECT big, COUNT(*) AS bc FROM bg GROUP BY 1
), cc AS (
  SELECT ctx, COUNT(*) AS cc FROM bg GROUP BY 1
), a AS (
  SELECT COUNT(DISTINCT substring(big, 2, 1)) AS alpha FROM bg
), scores AS (
  SELECT bg.doc_id,
         ROUND(AVG(ln((bc.bc + 1.0) / (cc.cc + a.alpha))), 6) AS avg_logp
  FROM bg JOIN bc USING (big) JOIN cc ON bg.ctx = cc.ctx CROSS JOIN a
  GROUP BY bg.doc_id
), dom AS (
  SELECT source AS domain, AVG(-avg_logp) AS loss
  FROM scores JOIN documents USING (doc_id) GROUP BY 1
), base AS MATERIALIZED (
  SELECT domain, loss,
         GREATEST(loss - MIN(loss) OVER (), 0.0) AS excess,
         CAST(COUNT(*) OVER () AS DOUBLE) AS nd,
         exp({eta} * GREATEST(loss - MIN(loss) OVER (), 0.0)) AS boost
  FROM dom
), w0 AS MATERIALIZED (
  SELECT domain, loss, excess, nd, boost, 1.0 / nd AS w FROM base
){steps_sql}
SELECT domain, ROUND(loss, 6) AS loss, ROUND(excess, 6) AS excess,
       ROUND(w, 6) AS weight
FROM {prev}
"""


SQL_DOREMI_WEIGHTS = _sql_doremi_weights(**_DOREMI)


# ------------------------------------------------- C4 rule battery -------

# The deterministic "dirtying" recipe (the q_text_clean precedent): the
# synthetic corpus has no punctuation, braces, or blocklist hits, so the
# raw battery would be constant — the advisor-r10 lesson that invisible
# rule paths hide divergence.  Literal-replace + doc_id-keyed injections
# (identical expressions in both engines) give every C4 rule real
# variance: multi-line docs, mid-text sentences, terminal-punct endings,
# braces, "lorem ipsum", a blocklisted word.
def _c4_dirty_col() -> F.Column:
    t0 = F.coalesce(F.col("text"), F.lit(""))
    t1 = F.replace(t0, F.lit(" merge "), F.lit("\n"))
    t2 = F.replace(t1, F.lit(" spark "), F.lit(". spark "))
    t3 = F.concat(
        t2, F.when(F.col("doc_id") % 3 == 0, F.lit(".")).otherwise(F.lit(""))
    )
    t4 = F.when(F.col("doc_id") % 17 == 0, F.concat(t3, F.lit(" {"))).otherwise(t3)
    t5 = F.when(
        F.col("doc_id") % 23 == 0, F.concat(F.lit("lorem ipsum "), t4)
    ).otherwise(t4)
    return F.when(
        F.col("doc_id") % 29 == 0, F.concat(t5, F.lit(" badword1"))
    ).otherwise(t5)


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The C4 cleaning battery (Raffel et al. 2020 §2.2) over the dirtied
    # corpus: line-level terminal-punctuation + ≥5-word retention, page
    # rules (≥3 sentences, lorem ipsum, brace, blocklist).
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", _c4_dirty_col()
    )
    return text.c4_quality_flags(docs)


SQL_C4_RULES = r"""
WITH dirty AS (
  SELECT doc_id,
    CASE WHEN doc_id % 29 = 0 THEN t5 || ' badword1' ELSE t5 END AS t
  FROM (
    SELECT doc_id,
      CASE WHEN doc_id % 23 = 0 THEN 'lorem ipsum ' || t4 ELSE t4 END AS t5
    FROM (
      SELECT doc_id,
        CASE WHEN doc_id % 17 = 0 THEN t3 || ' {' ELSE t3 END AS t4
      FROM (
        SELECT doc_id,
          t2 || CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END AS t3
        FROM (
          SELECT doc_id,
            replace(replace(COALESCE(text, ''), ' merge ', chr(10)),
                    ' spark ', '. spark ') AS t2
          FROM documents
        )
      )
    )
  )
), m AS (
  SELECT doc_id,
    CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
    list_filter(
      string_split(t, chr(10)),
      ln -> regexp_matches(rtrim(ln), '[.!?"]$')
            AND len(list_filter(
                  regexp_split_to_array(ln, '[ \t\r\x0B\x0C]+'),
                  w -> length(w) > 0)) >= 5
    ) AS kept,
    CAST(len(list_filter(regexp_split_to_array(t, '[.!?]'),
                         s -> length(trim(s)) > 0)) AS BIGINT)
      AS n_sentences,
    contains(lower(t), 'lorem ipsum') AS has_lorem,
    contains(t, '{') AS has_brace,
    (contains(lower(t), 'badword1') OR contains(lower(t), 'badword2'))
      AS has_badword
  FROM dirty
)
SELECT doc_id, n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       n_sentences, has_lorem, has_brace, has_badword,
       COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
       (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
        AND NOT has_badword AND len(kept) > 0) AS keep
FROM m
"""


# --------------------------------------------- Zipf rank-frequency -------


def q_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.zipf_token_stats(docs, top_k=100)


SQL_ZIPF_STATS = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS token
  FROM documents
), c AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1
), t AS (
  SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c
), top AS (
  SELECT token, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
           AS rank
  FROM c ORDER BY cnt DESC, token LIMIT 100
), s AS (
  SELECT ROUND(covar_pop(ln(rank), ln(cnt)) / var_pop(ln(rank)), 6)
           AS slope
  FROM top
)
SELECT rank, token, cnt, ROUND(cnt / t.tot, 6) AS frac, s.slope
FROM top CROSS JOIN t CROSS JOIN s
"""


# --------------------------------------------- packing-efficiency audit --


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.pack_efficiency(docs, budget_tokens=256, bucket_width=1024)


SQL_PACK_EFFICIENCY = r"""
WITH toks AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                         x -> length(x) > 0)) AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(floor(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
           AS BIGINT) AS pack_id
  FROM toks
), packs AS (
  SELECT source, pack_id, SUM(n_tokens) AS pack_tokens,
         SUM(n_tokens) / 256.0 AS fill
  FROM packed GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(fill), 6) AS avg_fill,
       ROUND(quantile_cont(fill, 0.1), 6) AS p10_fill,
       ROUND(quantile_cont(fill, 0.9), 6) AS p90_fill,
       ROUND(AVG(CASE WHEN fill > 1.0 THEN 1.0 ELSE 0.0 END), 6)
         AS overflow_frac,
       CAST(SUM(GREATEST(256 - pack_tokens, 0)) AS BIGINT)
         AS underfill_tokens
FROM packs GROUP BY 1
"""


# ------------------------------------------------ Heaps' vocab growth ----


def q_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.heaps_vocab_growth(docs, n_buckets=10)


SQL_HEAPS_GROWTH = r"""
WITH mx AS (
  SELECT CAST(MAX(doc_id) AS DOUBLE) + 1.0 AS m FROM documents
), base AS (
  SELECT LEAST(CAST(floor(CAST(doc_id AS DOUBLE) * 10 / mx.m) AS INT), 9)
           AS bucket,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents CROSS JOIN mx
), per_bucket AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
  FROM base GROUP BY 1
), first_seen AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM (
    SELECT tok, MIN(bucket) AS bucket
    FROM (SELECT bucket, unnest(toks) AS tok FROM base)
    GROUP BY 1
  ) GROUP BY 1
)
SELECT p.bucket, p.n_docs, p.n_tokens,
       CAST(SUM(p.n_tokens) OVER (ORDER BY p.bucket) AS BIGINT)
         AS cum_tokens,
       COALESCE(f.new_types, 0) AS new_types,
       CAST(SUM(COALESCE(f.new_types, 0)) OVER (ORDER BY p.bucket)
         AS BIGINT) AS cum_types
FROM per_bucket p LEFT JOIN first_seen f USING (bucket)
"""


# ------------------------------------- Gopher repetition battery ---------


# Deterministic repetition dirt (the c4_rules lesson: the synthetic corpus
# is single-line and near-duplicate-free, so every rule path needs planted
# variance): ' table ' → blank line (paragraph breaks), ' merge ' →
# newline (line breaks), every 7th doc re-appends its first line (dup
# lines), every 13th its first paragraph (dup paragraphs), every 5th a
# 12-word phrase TWICE (dup 5..10-grams within one doc).
_REP_PHRASE = (
    " alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
)


def _rep_dirty_col() -> F.Column:
    t0 = F.coalesce(F.col("text"), F.lit(""))
    t1 = F.replace(t0, F.lit(" table "), F.lit("\n\n"))
    t2 = F.replace(t1, F.lit(" merge "), F.lit("\n"))
    t3 = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(t2, F.lit("\n"), F.element_at(F.split(t2, "\n"), 1)),
    ).otherwise(t2)
    t4 = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(t3, F.lit("\n\n"), F.element_at(F.split(t3, "\n\n"), 1)),
    ).otherwise(t3)
    return F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(t4, F.lit(_REP_PHRASE), F.lit(_REP_PHRASE)),
    ).otherwise(t4)


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The MassiveText repetition battery (Rae et al. 2021 Table A1,
    # repetition half) at the paper's thresholds, over the dirtied corpus.
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", _rep_dirty_col()
    )
    return text.gopher_repetition_flags(docs)


def _sql_rep_gram_branch(n: int) -> str:
    return f"""
  SELECT doc_id, doc_chars, 'g{n}' AS kind,
         unnest(list_transform(range(1, greatest(len(toks) - {n} + 2, 1)),
                i -> array_to_string(toks[i:i + {n - 1}], ' '))) AS unit
  FROM base"""


SQL_GOPHER_REPETITION = (
    r"""
WITH dirty AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0
         THEN t4 || '"""
    + _REP_PHRASE
    + _REP_PHRASE
    + r"""' ELSE t4 END AS t
  FROM (
    SELECT doc_id,
      CASE WHEN doc_id % 13 = 0
           THEN t3 || chr(10) || chr(10)
                || string_split(t3, chr(10) || chr(10))[1]
           ELSE t3 END AS t4
    FROM (
      SELECT doc_id,
        CASE WHEN doc_id % 7 = 0
             THEN t2 || chr(10) || string_split(t2, chr(10))[1]
             ELSE t2 END AS t3
      FROM (
        SELECT doc_id,
          replace(replace(COALESCE(text, ''),
                          ' table ', chr(10) || chr(10)),
                  ' merge ', chr(10)) AS t2
        FROM documents
      )
    )
  )
), base AS MATERIALIZED (
  SELECT doc_id, length(t) AS doc_chars,
         list_filter(string_split(t, chr(10)),
                     x -> length(x) > 0) AS lines,
         list_filter(string_split(t, chr(10) || chr(10)),
                     x -> length(x) > 0) AS paras,
         list_filter(regexp_split_to_array(t, '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM dirty
), units AS (
  SELECT doc_id, doc_chars, '_' AS kind, '' AS unit FROM base
  UNION ALL
  SELECT doc_id, doc_chars, 'L', unnest(lines) FROM base
  UNION ALL
  SELECT doc_id, doc_chars, 'P', unnest(paras) FROM base
"""
    + "".join(
        "  UNION ALL" + _sql_rep_gram_branch(n) + "\n"
        for n in range(2, 11)
    )
    + r"""), per_unit AS (
  SELECT doc_id, kind, unit, COUNT(*) AS c, MAX(doc_chars) AS doc_chars
  FROM units GROUP BY 1, 2, 3
), per_kind AS (
  SELECT doc_id, kind,
         SUM(c) AS n_units,
         COUNT(*) AS n_distinct,
         SUM(c * length(unit)) AS all_chars,
         SUM((c - 1) * length(unit)) AS rep_chars,
         SUM(CASE WHEN c >= 2 THEN c * length(unit) ELSE 0 END)
           AS dup_occ_chars,
         MAX(c * length(unit)) AS top_chars,
         MAX(doc_chars) AS doc_chars
  FROM per_unit GROUP BY 1, 2
), pivoted AS (
  SELECT doc_id,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'L' THEN
      CASE WHEN n_units > 0
           THEN (n_units - n_distinct) * 1.0 / n_units ELSE 0.0 END
      END), 0.0), 6) AS dup_line_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'L' THEN
      CASE WHEN all_chars > 0
           THEN rep_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_line_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'P' THEN
      CASE WHEN n_units > 0
           THEN (n_units - n_distinct) * 1.0 / n_units ELSE 0.0 END
      END), 0.0), 6) AS dup_para_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'P' THEN
      CASE WHEN all_chars > 0
           THEN rep_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_para_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g2' THEN
      CASE WHEN doc_chars > 0
           THEN top_chars * 1.0 / doc_chars ELSE 0.0 END
      END), 0.0), 6) AS top_2gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g3' THEN
      CASE WHEN doc_chars > 0
           THEN top_chars * 1.0 / doc_chars ELSE 0.0 END
      END), 0.0), 6) AS top_3gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g4' THEN
      CASE WHEN doc_chars > 0
           THEN top_chars * 1.0 / doc_chars ELSE 0.0 END
      END), 0.0), 6) AS top_4gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g5' THEN
      CASE WHEN all_chars > 0
           THEN dup_occ_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_5gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g6' THEN
      CASE WHEN all_chars > 0
           THEN dup_occ_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_6gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g7' THEN
      CASE WHEN all_chars > 0
           THEN dup_occ_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_7gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g8' THEN
      CASE WHEN all_chars > 0
           THEN dup_occ_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_8gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g9' THEN
      CASE WHEN all_chars > 0
           THEN dup_occ_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_9gram_char_frac,
    ROUND(COALESCE(MAX(CASE WHEN kind = 'g10' THEN
      CASE WHEN all_chars > 0
           THEN dup_occ_chars * 1.0 / all_chars ELSE 0.0 END
      END), 0.0), 6) AS dup_10gram_char_frac
  FROM per_kind GROUP BY 1
)
SELECT *,
       (dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
        AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
        AND top_2gram_char_frac <= 0.20
        AND top_3gram_char_frac <= 0.18
        AND top_4gram_char_frac <= 0.16
        AND dup_5gram_char_frac <= 0.15
        AND dup_6gram_char_frac <= 0.14
        AND dup_7gram_char_frac <= 0.13
        AND dup_8gram_char_frac <= 0.12
        AND dup_9gram_char_frac <= 0.11
        AND dup_10gram_char_frac <= 0.10) AS keep
FROM pivoted
"""
)


# ------------------------------------------------ UniMax allocation ------


def q_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UniMax (Chung et al. 2023): epoch-capped waterfilling of a one-epoch
    # token budget across languages.  At these corpus shares (en ≈ 2.7×
    # the others) the four small languages hit the 1.2-epoch cap and
    # English absorbs the remaining budget — the cut lands mid-list, so
    # both branches of the closed form carry driver rows.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.unimax_allocation(
        docs, group_col="lang", budget_frac=1.0, epoch_cap=1.2
    )


SQL_UNIMAX_ALLOC = r"""
WITH per AS (
  SELECT lang AS grp,
         CAST(SUM(len(list_filter(
             regexp_split_to_array(COALESCE(text, ''),
                                   '[ \x09\x0A\x0D\x0B\x0C]+'),
             x -> length(x) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total,
         CAST(COUNT(*) AS INT) AS L
  FROM per
), flagged AS (
  SELECT *,
         (cap_tokens * (L - idx + 1) <= B - cum_before) AS flag
  FROM (
    SELECT grp, n_tokens, L,
           1.2 * n_tokens AS cap_tokens,
           1.0 * total AS B,
           CAST(ROW_NUMBER() OVER (ORDER BY 1.2 * n_tokens, grp) AS INT)
             AS idx,
           COALESCE(SUM(1.2 * n_tokens) OVER (
               ORDER BY 1.2 * n_tokens, grp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
             AS cum_before
    FROM per CROSS JOIN tot
  )
), cut AS (
  SELECT MIN(CASE WHEN NOT flag THEN idx END) AS f FROM flagged
), pool AS (
  SELECT SUM(CASE WHEN f IS NULL OR idx < f
                  THEN cap_tokens ELSE 0.0 END) AS spent_caps,
         CAST(SUM(CASE WHEN f IS NOT NULL AND idx >= f
                       THEN 1 ELSE 0 END) AS INT) AS n_uncapped
  FROM flagged CROSS JOIN cut
)
SELECT grp AS lang, n_tokens,
       ROUND(cap_tokens, 6) AS cap_tokens,
       ROUND(CASE WHEN f IS NULL OR idx < f THEN cap_tokens
                  WHEN n_uncapped > 0
                  THEN (B - spent_caps) / n_uncapped
                  ELSE 0.0 END, 6) AS alloc_tokens,
       ROUND(CASE WHEN n_tokens > 0 THEN
               (CASE WHEN f IS NULL OR idx < f THEN cap_tokens
                     WHEN n_uncapped > 0
                     THEN (B - spent_caps) / n_uncapped
                     ELSE 0.0 END) / n_tokens
             ELSE 0.0 END, 6) AS epochs,
       (f IS NULL OR idx < f) AS capped
FROM flagged CROSS JOIN cut CROSS JOIN pool
"""


# ------------------------------------------------- entropy stats ---------


def q_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Char/token Shannon entropy per doc — the cheap encoded-blob /
    # degenerate-repetition detector.
    docs = load_table(spark, sf_dir, "documents")
    return text.entropy_stats(docs)


SQL_ENTROPY_STATS = r"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
             regexp_replace(COALESCE(text, ''),
                            '[ \x09\x0A\x0D\x0B\x0C]+', '', 'g'), ''),
             x -> length(x) > 0) AS chars,
         list_filter(regexp_split_to_array(COALESCE(text, ''),
                                           '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), units AS (
  SELECT doc_id, '_' AS kind, '' AS unit FROM base
  UNION ALL SELECT doc_id, 'C', unnest(chars) FROM base
  UNION ALL SELECT doc_id, 'T', unnest(toks) FROM base
), per_unit AS (
  SELECT doc_id, kind, unit, COUNT(*) AS c FROM units GROUP BY 1, 2, 3
), per_kind AS (
  SELECT doc_id, kind, SUM(c) AS n,
         SUM(c * ln(c)) AS clnc
  FROM per_unit GROUP BY 1, 2
)
SELECT doc_id,
  CAST(COALESCE(MAX(CASE WHEN kind = 'C' THEN n END), 0) AS BIGINT)
    AS n_chars,
  CAST(COALESCE(MAX(CASE WHEN kind = 'T' THEN n END), 0) AS BIGINT)
    AS n_tokens,
  ROUND(COALESCE(MAX(CASE WHEN kind = 'C' THEN
    CASE WHEN n > 0 THEN ln(n) - clnc / n ELSE 0.0 END END), 0.0), 6)
    AS char_entropy,
  ROUND(COALESCE(MAX(CASE WHEN kind = 'T' THEN
    CASE WHEN n > 0 THEN ln(n) - clnc / n ELSE 0.0 END END), 0.0), 6)
    AS token_entropy
FROM per_kind GROUP BY 1
"""


# ------------------------------------------- language-ID confusion -------


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Confusion audit of the n-gram language detector against the
    # labeled lang column: per (true, predicted) counts, per-true-lang
    # recall share, and the corpus-wide accuracy — the DQ rollup that
    # tells a curation run its language router is drifting.
    docs = load_table(spark, sf_dir, "documents")
    cm = (
        docs.select(
            F.col("lang"), text.lang_id(F.col("text")).alias("pred_lang")
        )
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    per_true = cm.groupBy("lang").agg(F.sum("n_docs").alias("_tl"))
    tot = cm.agg(
        F.sum("n_docs").cast("double").alias("_n"),
        F.sum(
            F.when(F.col("lang") == F.col("pred_lang"), F.col("n_docs"))
            .otherwise(F.lit(0))
        ).cast("double").alias("_ok"),
    )
    return (
        cm.join(F.broadcast(per_true), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            F.round(F.col("n_docs") / F.col("_tl"), 6).alias("frac_of_true"),
            F.round(F.col("_ok") / F.col("_n"), 6).alias("overall_accuracy"),
        )
    )


SQL_LANGID_CONFUSION = rf"""
WITH scored AS (
  SELECT lang,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["en"]})\b')) AS en,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["es"]})\b')) AS es,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["fr"]})\b')) AS fr,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["de"]})\b')) AS de
  FROM documents
), pred AS (
  SELECT lang, CASE
      WHEN GREATEST(en, es, fr, de) = 0 THEN 'und'
      WHEN en = GREATEST(en, es, fr, de) THEN 'en'
      WHEN es = GREATEST(en, es, fr, de) THEN 'es'
      WHEN fr = GREATEST(en, es, fr, de) THEN 'fr'
      ELSE 'de' END AS pred_lang
  FROM scored
), cm AS (
  SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY 1, 2
), per_true AS (
  SELECT lang, SUM(n_docs) AS tl FROM cm GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_docs) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN lang = pred_lang THEN n_docs ELSE 0 END)
              AS DOUBLE) AS ok
  FROM cm
)
SELECT cm.lang, cm.pred_lang, cm.n_docs,
       ROUND(cm.n_docs * 1.0 / per_true.tl, 6) AS frac_of_true,
       ROUND(tot.ok / tot.n, 6) AS overall_accuracy
FROM cm JOIN per_true USING (lang) CROSS JOIN tot
"""


# ------------------------------------------ data-constrained planner -----


def q_data_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Muennighoff et al. 2023 repeat-decay planner at 4 requested epochs
    # and the paper's fitted R* = 15.4.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.data_budget_plan(
        docs, group_col="source", epochs=4.0, r_star=15.4
    )


SQL_DATA_BUDGET_PLAN = r"""
WITH per AS (
  SELECT source,
         CAST(SUM(len(list_filter(
             regexp_split_to_array(COALESCE(text, ''),
                                   '[ \x09\x0A\x0D\x0B\x0C]+'),
             x -> length(x) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
)
SELECT source, n_tokens,
       ROUND(4.0 * n_tokens, 6) AS requested_tokens,
       ROUND(1.0 * n_tokens
             + n_tokens * 15.4 * (1.0 - exp(-(4.0 - 1.0) / 15.4)), 6)
         AS effective_tokens,
       ROUND((1.0 * n_tokens
              + n_tokens * 15.4 * (1.0 - exp(-(4.0 - 1.0) / 15.4)))
             / (4.0 * n_tokens), 6) AS efficiency
FROM per
"""


# ----------------------------------------------- stratified sample -------


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic 40-per-language quota sample (md5-rank draw) —
    # distinct from the TPC-H part-table stratified_sample entry.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.stratified_sample(
        docs, group_col="lang", quota=40
    )


SQL_QUOTA_SAMPLE = r"""
SELECT lang, doc_id, CAST(ROW_NUMBER() OVER (
         PARTITION BY lang
         ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'), doc_id
       ) AS INT) AS rnk
FROM documents
QUALIFY rnk <= 40
"""


# ----------------------------------------------- D4 prototypicality ------


def q_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D4 prototype pruning (Tirumala et al. 2023) under the md5-portable
    # IVF construction: drop the 20% most-prototypical of each cluster.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.prototypicality(emb, n_centroids=16, drop_frac=0.2)


SQL_PROTOTYPICALITY = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
h AS (
  SELECT vec_id, v,
         CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)
           AS hh
  FROM e
), cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY hh, vec_id) AS INT) AS centroid_id,
         v AS cv
  FROM h
  QUALIFY centroid_id <= 16
), assign_scored AS (
  SELECT a.vec_id, c.centroid_id,
         ROUND(list_inner_product(a.v, c.cv) /
               (SQRT(list_inner_product(a.v, a.v))
                * SQRT(list_inner_product(c.cv, c.cv))), 6) AS sim
  FROM e a CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, centroid_id AS cluster, sim
  FROM assign_scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, centroid_id) = 1
), ranked AS (
  SELECT vec_id, cluster, sim AS proto_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY cluster
              ORDER BY sim DESC, vec_id) AS INT) AS proto_rank,
         CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT)
           AS cluster_size
  FROM assigned
)
SELECT *,
       ROUND(proto_rank * 1.0 / cluster_size, 6) AS proto_pct,
       (ROUND(proto_rank * 1.0 / cluster_size, 6) > 0.2) AS keep
FROM ranked
"""


# -------------------------------------------- domain concentration -------


def q_domain_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One-row concentration dashboard over per-source token shares:
    # HHI, entropy, effective domains, Gini, top share.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.domain_concentration(docs, group_col="source")


SQL_DOMAIN_CONCENTRATION = r"""
WITH per AS (
  SELECT source AS grp,
         CAST(SUM(len(list_filter(
             regexp_split_to_array(COALESCE(text, ''),
                                   '[ \x09\x0A\x0D\x0B\x0C]+'),
             x -> length(x) > 0))) AS DOUBLE) AS n_tokens
  FROM documents GROUP BY 1
), tot AS (
  SELECT SUM(n_tokens) AS total FROM per
), ranked AS (
  SELECT n_tokens / total AS p,
         CAST(ROW_NUMBER() OVER (ORDER BY n_tokens / total, grp)
              AS DOUBLE) AS i
  FROM per CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       ROUND(SUM(p * p), 6) AS hhi,
       ROUND(-SUM(p * ln(p)), 6) AS entropy,
       ROUND(exp(-SUM(p * ln(p))), 6) AS effective_groups,
       ROUND((2 * SUM(i * p) - (COUNT(*) + 1)) / COUNT(*), 6) AS gini,
       ROUND(MAX(p), 6) AS top_share
FROM ranked
"""


# ------------------------------------------- edit-distance near-dup ------


def q_edit_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PassJoin edit-distance self-join (Li et al. 2011) over 24-char doc
    # prefixes: all pairs within Levenshtein distance 2, candidates from
    # the chunk/substring equi-join, exact-verified.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 24).alias("text")
    )
    return dedup.edit_distance_pairs(docs, max_dist=2)


SQL_EDIT_NEARDUP = r"""
WITH s AS MATERIALIZED (
  SELECT doc_id, substring(text, 1, 24) AS s,
         length(substring(text, 1, 24)) AS L
  FROM documents
  WHERE length(substring(text, 1, 24)) >= 3
), chunks AS (
  SELECT doc_id AS id_a, i, L AS grid_len,
         substring(s, CAST(floor((i - 1) * L / 3) AS INT) + 1,
                   CAST(floor(i * L / 3) AS INT)
                   - CAST(floor((i - 1) * L / 3) AS INT)) AS piece
  FROM s CROSS JOIN (SELECT unnest(range(1, 4)) AS i)
), subs AS (
  SELECT doc_id AS id_b, i, lp AS grid_len,
         substring(s, q, CAST(floor(i * lp / 3) AS INT)
                          - CAST(floor((i - 1) * lp / 3) AS INT)) AS piece
  FROM s
  CROSS JOIN (SELECT unnest(range(1, 4)) AS i)
  CROSS JOIN (SELECT unnest(range(-2, 3)) AS dl)
  CROSS JOIN (SELECT unnest(range(-2, 3)) AS dq)
  , LATERAL (SELECT L + dl AS lp) t1
  , LATERAL (SELECT CAST(floor((i - 1) * lp / 3) AS INT) + 1 + dq AS q) t2
  WHERE lp >= 3
    AND q >= 1
    AND CAST(floor(i * lp / 3) AS INT)
        - CAST(floor((i - 1) * lp / 3) AS INT) >= 1
    AND q + (CAST(floor(i * lp / 3) AS INT)
             - CAST(floor((i - 1) * lp / 3) AS INT)) - 1 <= L
), cand AS (
  SELECT DISTINCT LEAST(c.id_a, u.id_b) AS id_a,
                  GREATEST(c.id_a, u.id_b) AS id_b
  FROM chunks c JOIN subs u
    ON c.i = u.i AND c.grid_len = u.grid_len AND c.piece = u.piece
  WHERE c.id_a <> u.id_b
)
SELECT cand.id_a, cand.id_b,
       CAST(levenshtein(a.s, b.s) AS INT) AS dist
FROM cand
JOIN s a ON a.doc_id = cand.id_a
JOIN s b ON b.doc_id = cand.id_b
WHERE abs(a.L - b.L) <= 2 AND levenshtein(a.s, b.s) <= 2
"""


# ---------------------------------------------- histogram quantiles ------


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quantiles of l_extendedprice from a 128-bin mergeable histogram
    # sketch — the fixed-memory alternative to the exact percentile
    # aggregate (error ≤ one bin width, pinned by test).
    from etl_pipeline2_0_spark.functions import sketches

    li = load_table(spark, sf_dir, "lineitem")
    sk = sketches.hist_sketch(li, "l_extendedprice", 900.0, 105000.0, 128)
    return sketches.hist_quantiles(sk, 900.0, 105000.0, 128)


SQL_HIST_QUANTILES = r"""
WITH binned AS (
  SELECT LEAST(GREATEST(CAST(floor(
           (CAST(l_extendedprice AS DOUBLE) - 900.0)
           / ((105000.0 - 900.0) / 128)) AS INT), 0), 127) AS bin
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), sk AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM sk
), cum AS (
  SELECT bin, cnt,
         CAST(SUM(cnt) OVER (ORDER BY bin) AS DOUBLE) AS cum
  FROM sk
), qs AS (
  SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q
), hit AS (
  SELECT q, bin, cnt, cum - cnt AS cum_before, n
  FROM cum CROSS JOIN tot CROSS JOIN qs
  WHERE cum >= q * n
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q ORDER BY bin) = 1
)
SELECT q,
       ROUND(900.0 + (bin + (q * n - cum_before) / cnt)
             * ((105000.0 - 900.0) / 128), 6) AS estimate
FROM hit
"""


# ------------------------------------------------ k-center coreset -------


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Greedy farthest-point k-center selection (Gonzalez 1985) over the
    # embeddings corpus — the diversity-sampling coreset baseline.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kcenter_coreset(emb, k=6)


def _sql_kcenter(k: int = 6) -> str:
    # k-step materialized CTE chain (the BPE-twin pattern: multi-
    # referenced iterative CTEs must be AS MATERIALIZED or DuckDB
    # inlines them exponentially).  Each step excludes the just-picked
    # id, mirroring the engine exactly.
    def cos(row: str, cent: str) -> str:
        return (
            f"ROUND(1 - list_inner_product({row}.v, {cent}.cv)"
            f" / (SQRT(list_inner_product({row}.v, {row}.v))"
            f" * SQRT(list_inner_product({cent}.cv, {cent}.cv))), 6)"
        )

    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id,"
        " CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "h AS (SELECT vec_id, v, CAST('0x' ||"
        " substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
        " AS hh FROM e)",
        "c1 AS MATERIALIZED (SELECT vec_id, v AS cv FROM h"
        " QUALIFY ROW_NUMBER() OVER (ORDER BY hh, vec_id) = 1)",
        "d1 AS MATERIALIZED (SELECT e.vec_id, e.v,"
        f" {cos('e', 'c1')} AS md"
        " FROM e CROSS JOIN c1 WHERE e.vec_id <> c1.vec_id)",
    ]
    for j in range(2, k + 1):
        parts.append(
            f"c{j} AS MATERIALIZED (SELECT vec_id, v AS cv, md"
            f" FROM d{j - 1}"
            " QUALIFY ROW_NUMBER() OVER (ORDER BY md DESC, vec_id) = 1)"
        )
        if j < k:
            parts.append(
                f"d{j} AS MATERIALIZED (SELECT d.vec_id, d.v,"
                f" LEAST(d.md, {cos('d', f'c{j}')}) AS md"
                f" FROM d{j - 1} d CROSS JOIN c{j}"
                f" WHERE d.vec_id <> c{j}.vec_id)"
            )
    selects = [
        "SELECT CAST(1 AS INT) AS rnk, vec_id,"
        " CAST(0.0 AS DOUBLE) AS sel_dist FROM c1"
    ] + [
        f"SELECT CAST({j} AS INT), vec_id, md FROM c{j}"
        for j in range(2, k + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


SQL_KCENTER_CORESET = _sql_kcenter(6)


# ------------------------------------------------- retrieval pairs -------


def q_retrieval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Contrastive training-pair mining for retriever models (the DPR /
    # sentence-transformers recipe, public): per query, BM25 rank the
    # corpus, take the top ranks as positives and a deterministic
    # deeper-rank band as HARD negatives (lexically related but
    # non-top — the negatives that actually teach a dense retriever).
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    ranked = retrieval.bm25_topk(docs, _BM25_QUERIES, top_k=25)
    return ranked.where(
        (F.col("rnk") <= 2) | ((F.col("rnk") >= 20) & (F.col("rnk") <= 25))
    ).select(
        "query_id",
        "doc_id",
        "score",
        "rnk",
        F.when(F.col("rnk") <= 2, F.lit("pos"))
        .otherwise(F.lit("neg"))
        .alias("label"),
    )


# Reuse the BM25 CTE chain verbatim; only the final projection differs.
SQL_RETRIEVAL_PAIRS = (
    SQL_BM25_TOPK.rsplit("SELECT CAST(query_id AS INT)", 1)[0]
    + """SELECT CAST(query_id AS INT) AS query_id, doc_id, score,
       CAST(rnk AS INT) AS rnk,
       CASE WHEN rnk <= 2 THEN 'pos' ELSE 'neg' END AS label
FROM ranked WHERE rnk <= 2 OR (rnk >= 20 AND rnk <= 25)
"""
)


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Measured ranking quality for the lexical retriever — the row the
    # r13 verdict flagged as the last approximate family without one:
    # nDCG@5 + MRR@5 of bm25_topk against a PLANTED graded truth,
    # rel(q, d) = #distinct query terms contained in d (deterministic,
    # engine-portable, and exactly the containment signal BM25 is
    # supposed to surface — the gap between 1.0 and the measured nDCG
    # is tf/length normalization reordering equal-containment docs).
    # Same corpus subset, query workload, and k as q_bm25_topk, so the
    # two rows read together.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    ranked = retrieval.bm25_topk(docs, _BM25_QUERIES, top_k=5)
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id int, term string",
    )
    rel = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(text.tokens(F.col("text")))).alias(
                "term"
            ),
        )
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    return retrieval.ranking_quality(ranked, rel, k=5)


# Reuse the BM25 CTE chain, then grade against term containment.
SQL_RETRIEVAL_NDCG = (
    SQL_BM25_TOPK.rsplit("SELECT CAST(query_id AS INT)", 1)[0]
    + """, rel AS (
  SELECT q.query_id, d.doc_id, COUNT(DISTINCT q.term) AS rel
  FROM base d, unnest(d.toks) AS u(term)
  JOIN q ON u.term = q.term
  GROUP BY q.query_id, d.doc_id
), dcg AS (
  SELECT r.query_id,
         SUM((POW(2.0, COALESCE(rel.rel, 0)) - 1)
             / log2(r.rnk + 1.0)) AS dcg,
         MIN(CASE WHEN COALESCE(rel.rel, 0) > 0 THEN r.rnk END) AS frr
  FROM ranked r
  LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
  WHERE r.rnk <= 5
  GROUP BY r.query_id
), ideal AS (
  SELECT query_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS irnk
  FROM rel WHERE rel > 0
), idcg AS (
  SELECT query_id,
         SUM(CASE WHEN irnk <= 5
                  THEN (POW(2.0, rel) - 1) / log2(irnk + 1.0) END) AS idcg,
         COUNT(*) AS n_relevant
  FROM ideal GROUP BY query_id
)
SELECT CAST(i.query_id AS INT) AS query_id,
       CAST(i.n_relevant AS BIGINT) AS n_relevant,
       ROUND(CASE WHEN i.idcg > 0
                  THEN COALESCE(d.dcg, 0) / i.idcg ELSE 0 END, 6) AS ndcg,
       ROUND(COALESCE(1.0 / d.frr, 0), 6) AS mrr
FROM idcg i LEFT JOIN dcg d ON i.query_id = d.query_id
"""
)


def q_rrf_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ranking quality of the HYBRID retriever: nDCG@5 + MRR@5 of the
    # RRF-fused more-like-this ranking against a semantic graded truth —
    # rel = 11 − exact-cosine rank for each query doc's true top-10
    # neighbors.  Measures how much semantic ordering survives fusion
    # with the lexical ranker (the deliberate tension: the lexical half
    # pulls the list toward term overlap; this row quantifies the cost
    # in the fused list — the hybrid-retriever tuning number).
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    fused = retrieval.similar_docs_rrf(
        docs, emb, n_queries=8, top_m_terms=5, k_each=10, top_k=5
    )
    sem = similarity.cosine_topk(
        emb, emb.where(F.col("vec_id") < 8), k=10, id_col="vec_id"
    )
    rel = sem.select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        (F.lit(11) - F.col("rnk")).alias("rel"),
    )
    return retrieval.ranking_quality(fused, rel, k=5)


# Reuse the full hybrid-RRF CTE chain; grade the fused list against the
# cosine ranking already computed in its `sem` CTE.
SQL_RRF_NDCG = (
    SQL_SIMILAR_DOCS_RRF.rsplit("SELECT query_id, doc_id, rrf_score", 1)[0]
    + """, fused_rnk AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id) AS rnk
  FROM fused QUALIFY rnk <= 5
), rel AS (
  SELECT query_id, doc_id, CAST(11 - rnk AS DOUBLE) AS rel FROM sem
), dcg AS (
  SELECT r.query_id,
         SUM((POW(2.0, COALESCE(rel.rel, 0)) - 1)
             / log2(r.rnk + 1.0)) AS dcg,
         MIN(CASE WHEN COALESCE(rel.rel, 0) > 0 THEN r.rnk END) AS frr
  FROM fused_rnk r
  LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
  GROUP BY r.query_id
), ideal AS (
  SELECT query_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS irnk
  FROM rel WHERE rel > 0
), idcg AS (
  SELECT query_id,
         SUM(CASE WHEN irnk <= 5
                  THEN (POW(2.0, rel) - 1) / log2(irnk + 1.0) END) AS idcg,
         COUNT(*) AS n_relevant
  FROM ideal GROUP BY query_id
)
SELECT CAST(i.query_id AS INT) AS query_id,
       CAST(i.n_relevant AS BIGINT) AS n_relevant,
       ROUND(CASE WHEN i.idcg > 0
                  THEN COALESCE(d.dcg, 0) / i.idcg ELSE 0 END, 6) AS ndcg,
       ROUND(COALESCE(1.0 / d.frr, 0), 6) AS mrr
FROM idcg i LEFT JOIN dcg d ON i.query_id = d.query_id
"""
)


def q_minhash_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The complement of minhash_recall: what fraction of the LSH
    # pipeline's reported pairs are TRUE near-dups (exact Jaccard >= t).
    # Because the pipeline exact-verifies every candidate, precision is
    # 1.0 BY CONTRACT — this row is the external trip-wire that flips
    # the moment a future change ships estimate-only pairs (the failure
    # mode that silently deletes non-duplicates at 100 TB).  The
    # variance-bearing companion is minhash_band_efficiency (candidate
    # selectivity).  Same subset, geometry, and portable hashes as the
    # recall metric, so the numbers are directly comparable.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 0
    )
    truth = dedup.jaccard_pairs(docs, k=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    found = dedup.minhash_near_duplicates(
        docs, k=3, num_hashes=16, bands=8, threshold=0.5, portable=True
    ).select("id_a", "id_b")
    return found.crossJoin(
        F.broadcast(
            found.join(truth, ["id_a", "id_b"], "semi")
            .agg(F.count(F.lit(1)).alias("n_correct"))
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_found"),
        F.max("n_correct").cast("bigint").alias("n_correct"),
        F.round(
            F.max("n_correct") / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
        ).alias("precision"),
    )


# Same CTE chain as the recall twin; only the outer aggregate flips
# (count over FOUND, membership probe against TRUTH).
SQL_MINHASH_PRECISION = SQL_MINHASH_RECALL.replace(
    """), agg AS (
  SELECT COUNT(*) AS n_true_pairs,
         SUM(CASE WHEN EXISTS (SELECT 1 FROM found f
                               WHERE f.id_a = truth.id_a
                                 AND f.id_b = truth.id_b)
                  THEN 1 ELSE 0 END) AS n_recalled
  FROM truth
)
SELECT CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_recalled AS BIGINT) AS n_recalled,
       ROUND(n_recalled * 1.0 / GREATEST(n_true_pairs, 1), 6) AS recall
FROM agg""",
    """), agg AS (
  SELECT COUNT(*) AS n_found,
         SUM(CASE WHEN EXISTS (SELECT 1 FROM truth t
                               WHERE t.id_a = found.id_a
                                 AND t.id_b = found.id_b)
                  THEN 1 ELSE 0 END) AS n_correct
  FROM found
)
SELECT CAST(n_found AS BIGINT) AS n_found,
       CAST(n_correct AS BIGINT) AS n_correct,
       ROUND(n_correct * 1.0 / GREATEST(n_found, 1), 6) AS precision
FROM agg""",
)
assert SQL_MINHASH_PRECISION != SQL_MINHASH_RECALL


def q_minhash_band_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Band-geometry observability: how many LSH candidate pairs survive
    # exact verification.  minhash_precision pins the verified OUTPUT at
    # 1.0 (the pipeline contract); this measures the CANDIDATE stream's
    # selectivity — the number that says whether bands are too loose
    # (verification compute wasted) or too tight (recall at risk) before
    # a 100 TB run.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 0
    )
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 3, 16, True)
    cand = dedup.lsh_candidate_pairs(sigs, 8, 2, 1000, True)
    verified = dedup.minhash_near_duplicates(
        docs, k=3, num_hashes=16, bands=8, threshold=0.5, portable=True
    )
    return (
        cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        .crossJoin(
            F.broadcast(
                verified.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_verified")
                )
            )
        )
        .select(
            "n_candidates",
            "n_verified",
            F.round(
                F.col("n_verified")
                / F.greatest(F.col("n_candidates"), F.lit(1)),
                6,
            ).alias("efficiency"),
        )
    )


SQL_MINHASH_BAND_EFFICIENCY = (
    _sql_minhash_portable()
    .replace("FROM documents\n", "FROM documents WHERE doc_id % 2 = 0\n", 1)
    .rstrip()
    .replace(
        ")\nSELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5",
        """), agg AS (
  SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM scored WHERE jaccard >= 0.5) AS n_verified
)
SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_verified AS BIGINT) AS n_verified,
       ROUND(n_verified * 1.0 / GREATEST(n_candidates, 1), 6) AS efficiency
FROM agg""",
    )
)
assert "n_candidates" in SQL_MINHASH_BAND_EFFICIENCY


def q_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The third leg of the LSH quality tripod: recall/precision measure
    # the banded BLOCKING; this calibrates the ESTIMATOR — per exact-J
    # decile, how many candidate pairs' signature-agreement estimate
    # (matches/16) stays within 1, 2, 4 hash-agreements of exact
    # Jaccard.  All-integer identities (|err| <= t/H <=>
    # |matches*un - H*inter| <= t*un) -> tolerance-free oracle.  Same
    # %2 subset and portable md5 hashes as the recall/precision rows.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 0
    )
    return dedup.minhash_estimator_error(docs, k=3, num_hashes=16)


def _sql_minhash_est_error(num_hashes: int = 16) -> str:
    # Generated so the per-permutation md5 literals match
    # dedup.minhash_signatures(portable=True) for any H.
    mins = ",\n         ".join(
        f"MIN(CAST('0x' || substring(md5('{j}:' || b), 1, 15) AS BIGINT)) AS s{j}"
        for j in range(num_hashes)
    )
    eqsum = " + ".join(
        f"CASE WHEN a.s{j} = b.s{j} THEN 1 ELSE 0 END"
        for j in range(num_hashes)
    )
    return rf"""
WITH docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents WHERE doc_id % 2 = 0
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM toks
), sh0 AS (
  SELECT id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), base AS (
  SELECT id, substring(md5(shingle), 1, 15) AS b FROM sh
), sig AS (
  SELECT id,
         {mins}
  FROM base GROUP BY id
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS nc
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), scored AS (
  SELECT i.id_a, i.id_b, i.nc, sa.n + sb.n - i.nc AS un
  FROM inter i
  JOIN sizes sa ON i.id_a = sa.id
  JOIN sizes sb ON i.id_b = sb.id
  WHERE 10 * i.nc >= sa.n + sb.n - i.nc
), m AS (
  SELECT s.nc, s.un, ({eqsum}) AS matches
  FROM scored s JOIN sig a ON a.id = s.id_a JOIN sig b ON b.id = s.id_b
)
SELECT CAST((10 * nc) // un AS INT) AS j_bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN ABS(matches * un - {num_hashes} * nc) <= 1 * un THEN 1 ELSE 0 END) AS BIGINT) AS within_1,
       CAST(SUM(CASE WHEN ABS(matches * un - {num_hashes} * nc) <= 2 * un THEN 1 ELSE 0 END) AS BIGINT) AS within_2,
       CAST(SUM(CASE WHEN ABS(matches * un - {num_hashes} * nc) <= 4 * un THEN 1 ELSE 0 END) AS BIGINT) AS within_4
FROM m GROUP BY 1 ORDER BY 1
"""


SQL_MINHASH_EST_ERROR = _sql_minhash_est_error()


def q_anneal_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-phase (pretrain + anneal) mix allocation: 90% of a 1M-token
    # budget token-proportional across all sources, the final 10% only
    # on sources whose mean lexical-diversity quality beats the corpus
    # mean — the public midtraining-anneal recipe as one corpus pass +
    # bounded-frame arithmetic, every number exact-integer.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.anneal_mix_plan(docs, budget_tokens=1_000_000, anneal_pct=10)


SQL_ANNEAL_MIX_PLAN = r"""
WITH per_doc AS (
  SELECT source AS grp,
         len(list_filter(regexp_split_to_array(lower(text), '\W+'),
                         x -> length(x) > 0)) AS nw,
         len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\W+'),
                                       x -> length(x) > 0))) AS nd
  FROM documents
), pd AS (
  SELECT grp, nw,
         CASE WHEN nw > 0 THEN (1000 * nd) // nw ELSE 0 END AS q_pm
  FROM per_doc
), per AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nw) AS BIGINT) AS n_tokens,
         CAST(SUM(q_pm) AS BIGINT) AS su
  FROM pd GROUP BY grp
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_tokens,
         CAST(SUM(su) AS BIGINT) AS t_su,
         CAST(SUM(n_docs) AS BIGINT) AS t_docs
  FROM per
), flagged AS (
  SELECT p.grp, p.n_docs, p.n_tokens, p.su, t.t_tokens,
         (p.su * t.t_docs >= t.t_su * p.n_docs) AS hq
  FROM per p, tot t
), hqt AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN hq THEN n_tokens ELSE 0 END), 0) AS BIGINT)
           AS hq_tokens
  FROM flagged
), alloc AS (
  SELECT f.grp, f.n_docs, f.n_tokens,
         f.su / f.n_docs AS mean_quality_pm,
         f.hq,
         CAST((900000 * f.n_tokens) // f.t_tokens AS BIGINT) AS main_tokens,
         CAST(CASE WHEN f.hq AND h.hq_tokens > 0
                   THEN (100000 * f.n_tokens) // h.hq_tokens
                   ELSE 0 END AS BIGINT) AS anneal_tokens
  FROM flagged f, hqt h
)
SELECT grp AS source, n_docs, n_tokens, mean_quality_pm,
       hq AS is_high_quality, main_tokens, anneal_tokens,
       main_tokens + anneal_tokens AS total_tokens
FROM alloc
ORDER BY grp
"""


def q_semdedup_eps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SemDeDup threshold sizing sweep: per candidate eps, vectors
    # the cluster-scoped keep-lowest-id rule would drop — the sixth
    # measured sizing curve, fully oracled via the portable coarse
    # quantizer the cluster_profile/prototypicality family proves.
    # eps grid sits where THIS corpus's cosine mass lives (max pairwise
    # cosine ~0.51 on the synthetic embeddings — the production default
    # (0.7..0.95) would sweep an all-zero curve); the mechanics are
    # threshold-independent.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semdedup_eps_curve(
        emb, n_centroids=16, eps_values=(0.2, 0.3, 0.4, 0.5)
    )


# Reuse the portable centroid/assignment CTEs verbatim; the tail builds
# cluster-scoped lower-id pairs, each vector's max cosine, and the eps
# sweep over one summary row.
SQL_SEMDEDUP_EPS_CURVE = _SQL_IVF_PORTABLE_CTE.split("), q AS (")[0] + """), pairs AS (
  SELECT b.neighbor_id AS id_b,
         ROUND(list_inner_product(a.v, b.v) /
               (SQRT(list_inner_product(a.v, a.v))
                * SQRT(list_inner_product(b.v, b.v))), 6) AS cs
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
), best AS (
  SELECT id_b, MAX(cs) AS mx FROM pairs GROUP BY id_b
), agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM assigned) AS n_vecs,
         CAST(COALESCE(SUM(CASE WHEN mx >= 0.2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d0,
         CAST(COALESCE(SUM(CASE WHEN mx >= 0.3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d1,
         CAST(COALESCE(SUM(CASE WHEN mx >= 0.4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d2,
         CAST(COALESCE(SUM(CASE WHEN mx >= 0.5 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d3
  FROM best
)
SELECT v.eps, a.n_vecs, v.nd AS n_dropped,
       a.n_vecs - v.nd AS n_kept,
       v.nd / a.n_vecs AS drop_rate
FROM agg a, LATERAL (
  VALUES (0.2, a.d0), (0.3, a.d1), (0.4, a.d2), (0.5, a.d3)
) v(eps, nd)
ORDER BY v.eps
"""


def q_embed_norm_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-vector normalization-drift histogram: squared-L2 buckets in
    # hundredths from exact micro-unit integer sums — the per-vector
    # complement of embed_dim_stats, read before any cosine operator.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embed_norm_hist(emb)


SQL_EMBED_NORM_HIST = r"""
WITH s AS (
  SELECT CAST(list_sum(
           list_transform(embedding,
             x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                  * CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
         ) AS BIGINT) AS sq
  FROM embeddings
), b AS (
  SELECT sq // 10000000000 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_vectors,
         MIN(sq) AS min_sq_u,
         MAX(sq) AS max_sq_u
  FROM s GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       bucket / 100.0 AS sq_norm_lo,
       n_vectors,
       min_sq_u,
       max_sq_u,
       n_vectors / (SELECT SUM(n_vectors) FROM b) AS share
FROM b
ORDER BY bucket
"""


def q_pack_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The context-length sizing sweep for sequence packing: padding +
    # straddle + fill at 256/512/1024/2048-token contexts from ONE
    # prefix-sum pass (pack_id = prev div budget shares the prefix sum
    # across budgets) — the ninth measured sizing curve.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.pack_waste_curve(docs, budgets=(256, 512, 1024, 2048))


SQL_PACK_WASTE_CURVE = r"""
WITH toks AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                         x -> length(x) > 0)) AS n_tokens
  FROM documents
), pv AS (
  SELECT source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM toks
), per AS (
  SELECT v.b AS budget_tokens, source,
         CAST(floor(prev / v.b) AS BIGINT) AS pack_id,
         CAST(SUM(n_tokens) AS BIGINT) AS pt
  FROM pv, (VALUES (256), (512), (1024), (2048)) v(b)
  GROUP BY 1, 2, 3
)
SELECT CAST(budget_tokens AS INT) AS budget_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(pt) AS BIGINT) AS total_tokens,
       CAST(SUM(GREATEST(budget_tokens - pt, 0)) AS BIGINT) AS underfill_tokens,
       CAST(SUM(GREATEST(pt - budget_tokens, 0)) AS BIGINT) AS overflow_tokens,
       SUM(pt) / (COUNT(*) * CAST(budget_tokens AS DOUBLE)) AS fill_rate
FROM per
GROUP BY budget_tokens
ORDER BY budget_tokens
"""


def q_bpe_fertility_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The BPE merge-budget sizing curve: fertility after 0/2/4/8 merges
    # from ONE training run (k=0 = the character-split ceiling) — the
    # eighth measured sizing curve, next to vocab_oov_curve on the
    # tokenizer-budget decision.
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_fertility_curve(docs, ks=(0, 2, 4, 8))


def _sql_bpe_fertility_curve(
    ks: "tuple[int, ...]" = (0, 2, 4, 8), max_word_types: int = 512
) -> str:
    # The unrolled BPE CTE chain exposes every intermediate word frame —
    # the curve is a UNION of bounded aggregates over words{k}.
    union = "\n  UNION ALL\n  ".join(
        f"SELECT CAST({k} AS INT) AS n_merges,"
        f" CAST(COUNT(*) AS BIGINT) AS n_word_types,"
        f" CAST(SUM(cnt) AS BIGINT) AS total_words,"
        f" CAST(SUM(cnt * len(string_split(trim(sym, '·'), '··'))) AS BIGINT)"
        f" AS total_pieces"
        f" FROM words{k}"
        for k in sorted(int(k) for k in ks)
    )
    return (
        _sql_bpe_ctes(max(int(k) for k in ks), max_word_types)
        + f"""
SELECT n_merges, n_word_types, total_words, total_pieces,
       total_pieces / total_words AS fertility
FROM (
  {union}
)
ORDER BY n_merges
"""
    )


SQL_BPE_FERTILITY_CURVE = _sql_bpe_fertility_curve()


def q_vocab_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The vocabulary-budget sizing sweep: covered token mass + OOV rate
    # per top-V cut of the corpus vocabulary — the seventh measured
    # sizing curve; deterministic frequency-desc/token tiebreak, exact
    # integer sums, tolerance-free oracle.  V grid 4/8/16/32 because the
    # synthetic corpus draws from ~31 word TYPES (the production default
    # 64..4096 would sweep an all-zero curve); the mechanics are
    # V-independent.
    docs = load_table(spark, sf_dir, "documents")
    return text.vocab_oov_curve(docs, vocab_sizes=(4, 8, 16, 32))


SQL_VOCAB_OOV_CURVE = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS tok
  FROM documents
), freq AS (
  SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(f) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM freq
), top AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok ASC) AS rn
  FROM freq
  QUALIFY rn <= 32
), s AS (
  SELECT
    CAST(COALESCE(SUM(CASE WHEN rn <= 4 THEN f END), 0) AS BIGINT) AS c4,
    CAST(COALESCE(SUM(CASE WHEN rn <= 8 THEN f END), 0) AS BIGINT) AS c8,
    CAST(COALESCE(SUM(CASE WHEN rn <= 16 THEN f END), 0) AS BIGINT) AS c16,
    CAST(COALESCE(SUM(CASE WHEN rn <= 32 THEN f END), 0) AS BIGINT) AS c32
  FROM top
)
SELECT v.vocab_size, t.n_types, t.total_tokens,
       v.c AS covered_tokens,
       (t.total_tokens - v.c) / t.total_tokens AS oov_rate
FROM s, tot t, LATERAL (
  VALUES (CAST(4 AS INT), s.c4), (CAST(8 AS INT), s.c8),
         (CAST(16 AS INT), s.c16), (CAST(32 AS INT), s.c32)
) v(vocab_size, c)
ORDER BY v.vocab_size
"""


def q_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-filter ablation matrix: per-filter kill counts, UNIQUE
    # (marginal) kills, and the union kill — the table that justifies
    # keeping or dropping each gate before composing a filter chain.
    # Every threshold is an integer cross-multiplication; every output
    # an integer count (pct as the exact-ratio double) — tolerance-free.
    docs = load_table(spark, sf_dir, "documents")
    return text.filter_ablation(docs)


SQL_FILTER_ABLATION = r"""
WITH s AS (
  SELECT len(list_filter(regexp_split_to_array(lower(text), '\W+'),
                         x -> length(x) > 0)) AS nw,
         len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\W+'),
                                       x -> length(x) > 0))) AS nd,
         length(text) AS nc,
         length(regexp_replace(text, '\W', '', 'g')) AS tc
  FROM documents
), flags AS (
  SELECT (nw < 30) AS f1,
         (100 * nd < 40 * nw) AS f2,
         (10 * tc < 44 * nw) AS f3,
         (nc < 200) AS f4
  FROM s
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN f1 OR f2 OR f3 OR f4 THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
         CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n_f1,
         CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n_f2,
         CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n_f3,
         CAST(SUM(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n_f4,
         CAST(SUM(CASE WHEN f1 AND NOT f2 AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u_f1,
         CAST(SUM(CASE WHEN f2 AND NOT f1 AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u_f2,
         CAST(SUM(CASE WHEN f3 AND NOT f1 AND NOT f2 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u_f3,
         CAST(SUM(CASE WHEN f4 AND NOT f1 AND NOT f2 AND NOT f3 THEN 1 ELSE 0 END) AS BIGINT) AS u_f4
  FROM flags
)
SELECT v.filter, a.n_docs, v.n_fail, v.n_unique_fail,
       a.n_any AS n_fail_any,
       v.n_fail / a.n_docs AS pct_fail
FROM agg a, LATERAL (
  VALUES ('few_words', a.n_f1, a.u_f1),
         ('low_diversity', a.n_f2, a.u_f2),
         ('short_words', a.n_f3, a.u_f3),
         ('short_doc', a.n_f4, a.u_f4)
) v(filter, n_fail, n_unique_fail)
ORDER BY v.filter
"""


# ------------------------------------- interpolated Kneser-Ney LM scoring -


def q_kn_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Interpolated Kneser-Ney word-bigram LM (the KenLM/CCNet smoothing
    # family) trained LEAKAGE-FREE on the non-src0 slice, scoring the
    # WHOLE corpus — so the unseen-bigram / unseen-context / OOV fallback
    # paths are all exercised by the oracle, not just the seen path.
    docs = load_table(spark, sf_dir, "documents")
    return text.kneser_ney_scores(
        docs, train_df=docs.where(F.col("source") != "src0")
    )


SQL_KN_SCORE = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), tok_rows AS (
  SELECT doc_id, source, unnest(toks) AS tok,
         generate_subscripts(toks, 1) AS ord
  FROM toks
), bg AS (
  SELECT doc_id, source, tok AS w1,
         LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
  FROM tok_rows
), bg2 AS (
  SELECT doc_id, source, w1, w2 FROM bg WHERE w2 IS NOT NULL
), bc AS (
  SELECT w1, w2, COUNT(*) AS bc
  FROM bg2 WHERE source <> 'src0' GROUP BY 1, 2
), ctx AS (
  SELECT w1, SUM(bc) AS c1, COUNT(*) AS n1w FROM bc GROUP BY 1
), cont AS (
  SELECT w2, COUNT(*) AS n1c FROM bc GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS b_types, COUNT(DISTINCT w2) AS v FROM bc
), probs AS (
  SELECT g.doc_id,
         CASE WHEN x.c1 IS NULL
              THEN (COALESCE(n.n1c, 0) + 1.0) / (t.b_types + t.v + 1.0)
              ELSE GREATEST(COALESCE(b.bc, 0) - 0.75, 0.0) / x.c1
                   + 0.75 * x.n1w / x.c1
                     * ((COALESCE(n.n1c, 0) + 1.0) / (t.b_types + t.v + 1.0))
         END AS prob
  FROM bg2 g
  LEFT JOIN bc b USING (w1, w2)
  LEFT JOIN ctx x USING (w1)
  LEFT JOIN cont n USING (w2)
  CROSS JOIN tot t
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln(prob)), 6) AS avg_logp
FROM probs GROUP BY doc_id
"""


# --------------------------- Cavnar-Trenkle trained language-ID confusion -


def q_langid_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trained char-trigram rank-profile language ID (Cavnar & Trenkle
    # 1994) with an honest held-out split: profiles train on even
    # doc_ids, odd doc_ids are classified; output is the held-out
    # confusion matrix over (true, predicted) labels.
    docs = load_table(spark, sf_dir, "documents")
    pred = text.cavnar_trenkle_langid(
        docs.where(F.col("doc_id") % 2 == 1),
        train_df=docs.where(F.col("doc_id") % 2 == 0),
    )
    return pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


SQL_LANGID_RANK = r"""
WITH pref AS (
  SELECT doc_id, lang, lower(substring(text, 1, 300)) AS t
  FROM documents WHERE length(lower(substring(text, 1, 300))) >= 3
), grams AS (
  SELECT doc_id, lang, substring(t, i, 3) AS gram
  FROM pref, LATERAL (
    SELECT unnest(generate_series(1, length(t) - 2)) AS i
  )
), lang_counts AS (
  SELECT lang AS cand_lang, gram, COUNT(*) AS cnt
  FROM grams WHERE doc_id % 2 = 0 GROUP BY 1, 2
), lang_prof AS (
  SELECT cand_lang, gram,
         ROW_NUMBER() OVER (PARTITION BY cand_lang
                            ORDER BY cnt DESC, gram ASC) AS rank_lang
  FROM lang_counts
  QUALIFY rank_lang <= 100
), langs AS (
  SELECT DISTINCT cand_lang FROM lang_prof
), doc_counts AS (
  SELECT doc_id, gram, COUNT(*) AS cnt
  FROM grams WHERE doc_id % 2 = 1 GROUP BY 1, 2
), doc_prof AS (
  SELECT doc_id, gram,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram ASC) AS rank_doc
  FROM doc_counts
  QUALIFY rank_doc <= 20
), dist AS (
  SELECT d.doc_id, l.cand_lang,
         SUM(COALESCE(ABS(d.rank_doc - p.rank_lang), 100)) AS dist
  FROM doc_prof d
  CROSS JOIN langs l
  LEFT JOIN lang_prof p
    ON p.cand_lang = l.cand_lang AND p.gram = d.gram
  GROUP BY 1, 2
), picked AS (
  SELECT doc_id, cand_lang AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY dist ASC, cand_lang ASC) AS rn
  FROM dist
  QUALIFY rn = 1
)
SELECT doc.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM documents doc JOIN picked p USING (doc_id)
GROUP BY 1, 2
"""


# ------------------------------------------ MMR diverse top-k selection --


def q_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Maximal Marginal Relevance (Carbonell & Goldstein 1998): diverse
    # top-6 against the vec_id-0 query embedding at the canonical
    # lambda = 0.7; candidates are the rest of the embeddings table.
    from etl_pipeline2_0_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.mmr_select(
        emb.where(F.col("vec_id") != 0),
        emb.where(F.col("vec_id") == 0),
        k=6,
        lam=0.7,
    )


def _sql_mmr(k: int = 6, lam: float = 0.7) -> str:
    # k-step materialized CTE chain (the kcenter-twin pattern).  The
    # (1 - lam) literal is emitted via repr from the SAME Python float
    # the Spark side uses, so e.g. lam=0.7 yields 0.30000000000000004 in
    # BOTH engines — a hand-written 0.3 would silently diverge at 6 dp.
    lam_r, one_m_lam_r = repr(float(lam)), repr(1.0 - float(lam))

    def cos(row: str, cent: str, cv: str = "cv") -> str:
        return (
            f"ROUND(list_inner_product({row}.v, {cent}.{cv})"
            f" / (SQRT(list_inner_product({row}.v, {row}.v))"
            f" * SQRT(list_inner_product({cent}.{cv}, {cent}.{cv}))), 6)"
        )

    score = f"ROUND({lam_r} * rel - {one_m_lam_r} * ms, 6)"
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id,"
        " CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "q AS (SELECT v AS cv FROM e WHERE vec_id = 0)",
        "p AS MATERIALIZED (SELECT e.vec_id, e.v,"
        f" {cos('e', 'q')} AS rel"
        " FROM e CROSS JOIN q WHERE e.vec_id <> 0)",
        "c1 AS MATERIALIZED (SELECT vec_id, v AS cv, rel FROM p"
        " QUALIFY ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) = 1)",
        "d1 AS MATERIALIZED (SELECT p.vec_id, p.v, p.rel,"
        f" {cos('p', 'c1')} AS ms"
        " FROM p CROSS JOIN c1 WHERE p.vec_id <> c1.vec_id)",
    ]
    for j in range(2, k + 1):
        parts.append(
            f"c{j} AS MATERIALIZED (SELECT vec_id, v AS cv, rel,"
            f" {score} AS score FROM d{j - 1}"
            f" QUALIFY ROW_NUMBER() OVER (ORDER BY {score} DESC, vec_id)"
            " = 1)"
        )
        if j < k:
            parts.append(
                f"d{j} AS MATERIALIZED (SELECT d.vec_id, d.v, d.rel,"
                f" GREATEST(d.ms, {cos('d', f'c{j}')}) AS ms"
                f" FROM d{j - 1} d CROSS JOIN c{j}"
                f" WHERE d.vec_id <> c{j}.vec_id)"
            )
    selects = [
        "SELECT CAST(1 AS INT) AS rnk, vec_id, rel AS relevance,"
        f" ROUND({lam_r} * rel, 6) AS score FROM c1"
    ] + [
        f"SELECT CAST({j} AS INT), vec_id, rel, score FROM c{j}"
        for j in range(2, k + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


SQL_MMR_SELECT = _sql_mmr(6, 0.7)


# ---------------------------------- cross-corpus MinHash decontamination -


def q_minhash_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GPT-3/Llama-style fuzzy decontamination: even doc_ids play the
    # training corpus, odd doc_ids the eval/benchmark set; banded MinHash
    # LSH between the two sides, exact-Jaccard verified (md5-portable
    # hash family end-to-end -> full DuckDB twin).
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_decontaminate(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        num_hashes=16,
        bands=8,
        threshold=0.5,
        portable=True,
    )


def _sql_minhash_decontam(
    num_hashes: int = 16, bands: int = 8, threshold: float = 0.5,
    max_bucket: int = 1000,
) -> str:
    # Same generated signature/banding CTEs as _sql_minhash_portable
    # (one geometry, one hash family); the pair join becomes even-side ×
    # odd-side instead of canonical self-join, and the bucket cap counts
    # across BOTH sides (= the whole corpus, since the sides partition it).
    r = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(CAST('0x' || substring(md5('{j}:' || b), 1, 15) AS BIGINT)) AS s{j}"
        for j in range(num_hashes)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT id, {bi} AS band, md5("
        + " || ',' || ".join(f"CAST(s{bi * r + o} AS VARCHAR)" for o in range(r))
        + ") AS bucket FROM sig"
        for bi in range(bands)
    )
    return rf"""
WITH docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'), x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord FROM toks
), sh0 AS (
  SELECT id, tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), base AS (
  SELECT id, substring(md5(shingle), 1, 15) AS b FROM sh
), sig AS (
  SELECT id,
         {mins}
  FROM base GROUP BY id
), banded0 AS (
{band_selects}
), banded AS (
  SELECT id, band, bucket FROM (
    SELECT id, band, bucket,
           COUNT(*) OVER (PARTITION BY band, bucket) AS bn
    FROM banded0
  ) WHERE bn <= {max_bucket}
), cand AS (
  SELECT DISTINCT e.id AS eval_id, t.id AS train_id
  FROM banded t
  JOIN banded e ON t.band = e.band AND t.bucket = e.bucket
  WHERE t.id % 2 = 0 AND e.id % 2 = 1
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT c.eval_id, c.train_id, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.id = c.train_id
  JOIN sh b ON b.id = c.eval_id AND b.shingle = a.shingle
  GROUP BY c.eval_id, c.train_id
), scored AS (
  SELECT eval_id, train_id,
         ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON train_id = sa.id
  JOIN sizes sb ON eval_id = sb.id
)
SELECT eval_id, train_id, jaccard FROM scored WHERE jaccard >= {threshold}
"""


SQL_MINHASH_DECONTAM = _sql_minhash_decontam()


# ------------------------------------------- per-domain quality rollup ---


def q_domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RefinedWeb/FineWeb-style DOMAIN-granularity triage: per-source
    # volume, mean composite quality, exact-dup rate, and a flagged
    # verdict (below-median quality or dup rate > 0.2).
    from etl_pipeline2_0_spark.functions import dq

    docs = load_table(spark, sf_dir, "documents")
    return dq.domain_quality_rollup(docs)


SQL_DOMAIN_QUALITY_ROLLUP = rf"""
WITH base AS (
  SELECT doc_id, source, md5(text) AS h,
    len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                    x -> length(x) > 0)) AS n_tokens,
    regexp_replace(text, '[ \x09\x0A\x0D\x0B\x0C]+', '', 'g') AS compact,
    list_filter(regexp_split_to_array(lower(text), '\W+'),
                x -> length(x) > 0) AS toks
  FROM documents
), ratios AS (
  SELECT doc_id, source, h, n_tokens,
    CASE WHEN LENGTH(compact) = 0 THEN 0.0
         ELSE (LENGTH(compact) - LENGTH(regexp_replace(compact, '\W', '', 'g')))
              / LENGTH(compact) END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, x -> x IN ({_STOPS_SQL}))) / len(toks)
         END AS stopword_ratio
  FROM base
), scored AS (
  SELECT doc_id, source, h, n_tokens,
    ROUND((LEAST(n_tokens / 100.0, 1.0) + LEAST(stopword_ratio * 4, 1.0)
           + (1.0 - LEAST(punct_ratio * 4, 1.0))) / 3, 6) AS quality
  FROM ratios
), per_dom AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         ROUND(AVG(quality), 6) AS avg_quality,
         ROUND(1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*), 6) AS dup_rate
  FROM scored GROUP BY source
), med AS (
  SELECT quantile_cont(avg_quality, 0.5) AS m FROM per_dom
)
SELECT source, n_docs, n_tokens, avg_quality, dup_rate,
       (avg_quality < med.m OR dup_rate > 0.2) AS flagged
FROM per_dom CROSS JOIN med
"""


# ------------------------------------------ filter threshold calibration -


def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-gate calibration curve (the FineWeb-Edu threshold-study
    # shape): docs and token mass kept at every candidate quality
    # threshold 0.0 .. 0.9, from ONE corpus pass + a 10-row sweep.
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        text.quality_score(F.col("text")).alias("q"),
        text.token_count(F.col("text")).alias("tc"),
    )
    return text.threshold_sweep(scored, "q", weight_col="tc")


SQL_THRESHOLD_SWEEP = rf"""
WITH base AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                    x -> length(x) > 0)) AS n_tokens,
    regexp_replace(text, '[ \x09\x0A\x0D\x0B\x0C]+', '', 'g') AS compact,
    list_filter(regexp_split_to_array(lower(text), '\W+'),
                x -> length(x) > 0) AS toks
  FROM documents
), ratios AS (
  SELECT doc_id, n_tokens,
    CASE WHEN LENGTH(compact) = 0 THEN 0.0
         ELSE (LENGTH(compact) - LENGTH(regexp_replace(compact, '\W', '', 'g')))
              / LENGTH(compact) END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, x -> x IN ({_STOPS_SQL}))) / len(toks)
         END AS stopword_ratio
  FROM base
), scored AS (
  SELECT n_tokens AS tc,
    ROUND((LEAST(n_tokens / 100.0, 1.0) + LEAST(stopword_ratio * 4, 1.0)
           + (1.0 - LEAST(punct_ratio * 4, 1.0))) / 3, 6) AS q
  FROM ratios
), hist AS (
  SELECT LEAST(CAST(FLOOR(CAST(ROUND(q * 1000000) AS BIGINT) / 100000)
                    AS INT), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(tc) AS BIGINT) AS w
  FROM scored GROUP BY 1
), cum AS (
  SELECT b,
         SUM(n) OVER (ORDER BY b DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS kept,
         SUM(w) OVER (ORDER BY b DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS kept_w
  FROM hist
), tot AS (
  SELECT SUM(n) AS tot_n, SUM(w) AS tot_w FROM hist
), grid AS (
  SELECT unnest(generate_series(0, 9)) AS k
), filled AS (
  SELECT g.k, MAX(c.kept) AS kept, MAX(c.kept_w) AS kept_w
  FROM grid g LEFT JOIN cum c ON g.k <= c.b
  GROUP BY g.k
)
SELECT ROUND(CAST(k AS DOUBLE) * 0.1, 6) AS threshold,
       CAST(COALESCE(kept, 0) AS BIGINT) AS n_docs,
       ROUND(COALESCE(kept, 0) * 1.0 / tot_n, 6) AS frac_docs,
       CAST(COALESCE(kept_w, 0) AS BIGINT) AS n_weight,
       ROUND(COALESCE(kept_w, 0) * 1.0 / tot_w, 6) AS frac_weight
FROM filled CROSS JOIN tot
"""


# --------------------------------------- T5 span-corruption construction -


def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T5 denoising-objective example construction (Raffel et al. 2020
    # §3.1.4): deterministic md5-placed corruption spans -> sentinel
    # inputs + ordered targets, 5% density, spans of 1-3 tokens.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.span_corrupt(docs, density=0.05, max_span=3)


SQL_SPAN_CORRUPT = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), rows0 AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM toks WHERE len(toks) > 0
), marked AS (
  SELECT doc_id, pos, tok,
    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
          CAST(pos AS VARCHAR) || ':s:'), 1, 15) AS BIGINT) % 1000000)
      < 50000 AS is_start,
    1 + (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
          CAST(pos AS VARCHAR) || ':l:'), 1, 15) AS BIGINT) % 3) AS span_len
  FROM rows0
), cov AS (
  SELECT doc_id, pos, tok,
    COALESCE(MAX(CASE WHEN is_start THEN pos + span_len END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) > pos,
             FALSE) AS covered
  FROM marked
), sp AS (
  SELECT doc_id, pos, tok, covered,
    covered AND NOT COALESCE(
      LAG(covered) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
      AS new_span
  FROM cov
), numbered AS (
  SELECT doc_id, pos, tok, covered, new_span,
    CAST(SUM(CASE WHEN new_span THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS INT) AS span_k
  FROM sp
), pieces AS (
  SELECT doc_id, pos, new_span,
    CASE WHEN NOT covered THEN tok
         WHEN new_span THEN '<extra_id_' || CAST(span_k AS VARCHAR) || '>'
    END AS p_in,
    CASE WHEN new_span
           THEN '<extra_id_' || CAST(span_k AS VARCHAR) || '> ' || tok
         WHEN covered THEN tok
    END AS p_tg
  FROM numbered
), agg AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN new_span THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
    COALESCE(string_agg(p_in, ' ' ORDER BY pos)
               FILTER (WHERE p_in IS NOT NULL), '') AS inputs,
    COALESCE(string_agg(p_tg, ' ' ORDER BY pos)
               FILTER (WHERE p_tg IS NOT NULL), '') AS tg
  FROM pieces GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_spans, inputs,
       CASE WHEN n_spans = 0 THEN ''
            ELSE tg || ' <extra_id_' || CAST(n_spans AS VARCHAR) || '>'
       END AS targets
FROM agg
"""


def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k-anonymity audit (Sweeney 2002) over the release-reviewer quasi-
    # identifiers (lang, source, 256-char length bucket): equivalence-
    # class sizes from ONE corpus aggregate, then the k sweep runs over
    # the bounded class frame — the residual re-identification risk
    # table next to pii_redact's direct-identifier scrub.
    from etl_pipeline2_0_spark.functions import dq

    docs = load_table(spark, sf_dir, "documents")
    return dq.kanon_audit(docs)


SQL_KANON_AUDIT = r"""
WITH cls AS (
  SELECT lang, source, CAST(FLOOR(n_chars / 256.0) AS BIGINT) AS bkt,
         CAST(COUNT(*) AS BIGINT) AS s
  FROM documents GROUP BY 1, 2, 3
), sweep AS (
  SELECT s, k
  FROM cls CROSS JOIN (SELECT UNNEST([2, 5, 10, 20]) AS k)
)
SELECT CAST(k AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN s < k THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k,
       CAST(SUM(CASE WHEN s < k THEN s ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       SUM(CASE WHEN s < k THEN s ELSE 0 END) * 1.0
         / GREATEST(SUM(s), 1) AS pct_rows_below
FROM sweep GROUP BY k
"""


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Datasheet-style report card (Gebru et al. 2021): volume, token-
    # length quantiles, exact-dup rate, language/source shares, mean
    # heuristic quality — one narrow projection + four bounded
    # aggregates, unioned into a tidy (section, metric, scope, value).
    from etl_pipeline2_0_spark.functions import dq

    docs = load_table(spark, sf_dir, "documents")
    return dq.dataset_card(docs)


SQL_DATASET_CARD = rf"""
WITH raw AS (
  SELECT source AS src, text,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["en"]})\b')) AS en,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["es"]})\b')) AS es,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["fr"]})\b')) AS fr,
    len(regexp_extract_all(lower(text), '\b({_MARKER_SQL["de"]})\b')) AS de,
    len(list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                    x -> length(x) > 0)) AS tc,
    LENGTH(text) AS nc,
    md5(text) AS h,
    regexp_replace(text, '[ \x09\x0A\x0D\x0B\x0C]+', '', 'g') AS compact,
    list_filter(regexp_split_to_array(lower(text), '\W+'),
                x -> length(x) > 0) AS toks
  FROM documents
), base AS MATERIALIZED (
  SELECT src,
    CASE
      WHEN GREATEST(en, es, fr, de) = 0 THEN 'und'
      WHEN en = GREATEST(en, es, fr, de) THEN 'en'
      WHEN es = GREATEST(en, es, fr, de) THEN 'es'
      WHEN fr = GREATEST(en, es, fr, de) THEN 'fr'
      ELSE 'de' END AS lang,
    tc, nc, h,
    (LEAST(tc / 100.0, 1.0)
     + LEAST((CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE len(list_filter(toks, x -> x IN ({_STOPS_SQL})))
                        * 1.0 / len(toks) END) * 4, 1.0)
     + (1.0 - LEAST((CASE WHEN LENGTH(compact) = 0 THEN 0.0
                          ELSE (LENGTH(compact)
                                - LENGTH(regexp_replace(compact, '\W', '',
                                                        'g')))
                               * 1.0 / LENGTH(compact) END) * 4, 1.0))
    ) / 3 AS q
  FROM raw
), agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(tc) AS DOUBLE) AS tok,
         CAST(SUM(nc) AS DOUBLE) AS nchr,
         ROUND(AVG(tc), 6) AS avg_tc,
         ROUND(1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*), 6) AS dup,
         ROUND(AVG(q), 6) AS mq,
         ROUND(quantile_cont(tc, 0.25), 6) AS p25,
         ROUND(quantile_cont(tc, 0.5), 6) AS p50,
         ROUND(quantile_cont(tc, 0.75), 6) AS p75,
         ROUND(quantile_cont(tc, 0.95), 6) AS p95
  FROM base
), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM base)
SELECT 'volume' AS section, 'n_docs' AS metric, 'corpus' AS scope,
       n AS value FROM agg
UNION ALL SELECT 'volume', 'n_tokens', 'corpus', tok FROM agg
UNION ALL SELECT 'volume', 'n_chars', 'corpus', nchr FROM agg
UNION ALL SELECT 'length', 'mean_doc_tokens', 'corpus', avg_tc FROM agg
UNION ALL SELECT 'length', 'p25_tokens', 'corpus', p25 FROM agg
UNION ALL SELECT 'length', 'p50_tokens', 'corpus', p50 FROM agg
UNION ALL SELECT 'length', 'p75_tokens', 'corpus', p75 FROM agg
UNION ALL SELECT 'length', 'p95_tokens', 'corpus', p95 FROM agg
UNION ALL SELECT 'dedup', 'exact_dup_rate', 'corpus', dup FROM agg
UNION ALL SELECT 'quality', 'mean_quality', 'corpus', mq FROM agg
UNION ALL
SELECT 'volume', 'doc_share', src,
       ROUND(COUNT(*) * 1.0 / (SELECT t FROM tot), 6)
FROM base GROUP BY src
UNION ALL
SELECT 'language', 'doc_share', lang,
       ROUND(COUNT(*) * 1.0 / (SELECT t FROM tot), 6)
FROM base GROUP BY lang
"""


def q_sft_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SFT packing with loss-mask accounting: hash-cut (prompt, response)
    # examples packed to ~256 tokens per source, each pack reporting its
    # masked vs loss-bearing token split.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.sft_pack(docs, budget_tokens=256)


SQL_SFT_PACK = r"""
WITH toks AS (
  SELECT source, doc_id,
         list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), ex AS (
  SELECT source, doc_id, len(toks) AS n,
         GREATEST(1, CAST(FLOOR(len(toks) / 4.0) AS INT)) AS lo
  FROM toks WHERE len(toks) >= 2
), cut AS (
  SELECT source, doc_id, n,
         lo + CAST((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                || ':cut:'), 1, 15) AS BIGINT)
                % GREATEST(n - 2 * lo + 1, 1)) AS INT) AS n_prompt
  FROM ex
), packed AS (
  SELECT source, doc_id, n, n_prompt, n - n_prompt AS n_resp,
         CAST(floor(COALESCE(SUM(n) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
           AS BIGINT) AS pack_id
  FROM cut
)
SELECT source, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_examples,
       CAST(SUM(n) AS BIGINT) AS pack_tokens,
       CAST(SUM(n_prompt) AS BIGINT) AS prompt_tokens,
       CAST(SUM(n_resp) AS BIGINT) AS response_tokens,
       ROUND(SUM(n_resp) * 1.0 / SUM(n), 6) AS loss_frac
FROM packed GROUP BY source, pack_id
"""


def q_chat_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-turn conversation assembly: fixed-size id blocks as
    # conversations, turns ordered by id, alternating user/assistant
    # roles, role-tagged rendering, per-role loss-mask accounting.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.chat_assemble(docs, turns_per_conv=4)


_SQL_CHAT_TURNS = r"""
WITH t AS (
  SELECT source, doc_id,
         CAST(FLOOR(doc_id / 4.0) AS BIGINT) AS conv_id,
         COALESCE(text, '') AS txt,
         len(list_filter(regexp_split_to_array(COALESCE(text, ''),
             '[ \x09\x0A\x0D\x0B\x0C]+'), x -> length(x) > 0)) AS nt
  FROM documents
), turns AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY conv_id
                                    ORDER BY doc_id) AS INT) AS turn_idx
  FROM t
), tagged AS (
  SELECT conv_id, turn_idx, source, nt, turn_idx % 2 = 1 AS is_user,
         (CASE WHEN turn_idx % 2 = 1 THEN '<|user|>'
               ELSE '<|assistant|>' END)
         || (CASE WHEN length(txt) > 0 THEN ' ' || txt ELSE '' END) AS tg
  FROM turns
), conv AS (
  SELECT conv_id,
         MIN(CASE WHEN turn_idx = 1 THEN source END) AS source,
         CAST(COUNT(*) AS BIGINT) AS n_turns,
         CAST(SUM(nt + 1) AS BIGINT) AS conv_tokens,
         CAST(SUM(CASE WHEN is_user THEN nt + 1 ELSE 1 END) AS BIGINT)
           AS masked_tokens,
         CAST(SUM(CASE WHEN NOT is_user THEN nt ELSE 0 END) AS BIGINT)
           AS loss_tokens,
         string_agg(tg, ' ' ORDER BY turn_idx) AS rendered
  FROM tagged GROUP BY conv_id
)
"""

SQL_CHAT_ASSEMBLE = (
    _SQL_CHAT_TURNS
    + """SELECT conv_id, source, n_turns, conv_tokens, masked_tokens,
       loss_tokens, rendered
FROM conv
"""
)


def q_chat_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Conversations packed whole under a 512-token budget per source,
    # each pack reporting its role-mask split (masked + loss = tokens).
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.chat_pack(docs, turns_per_conv=4, budget_tokens=512)


SQL_CHAT_PACK = (
    _SQL_CHAT_TURNS
    + """, packed AS (
  SELECT *, CAST(floor(COALESCE(SUM(conv_tokens) OVER (
      PARTITION BY source ORDER BY conv_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)
    AS BIGINT) AS pack_id
  FROM conv
)
SELECT source, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_conversations,
       CAST(SUM(n_turns) AS BIGINT) AS n_turns,
       CAST(SUM(conv_tokens) AS BIGINT) AS pack_tokens,
       CAST(SUM(masked_tokens) AS BIGINT) AS masked_tokens,
       CAST(SUM(loss_tokens) AS BIGINT) AS loss_tokens,
       ROUND(SUM(loss_tokens) * 1.0 / SUM(conv_tokens), 6) AS loss_frac
FROM packed GROUP BY source, pack_id
"""
)


def q_ul2_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UL2 mixture-of-denoisers (Tay et al. 2022): R (T5 spans at
    # 0.15/3), X (extreme at 0.5/8), S (prefix-LM cut in the middle
    # half), hash-assigned per doc with the paradigm token prepended.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.ul2_mix(docs)


def _sql_ul2_span_chain(tag: str, mode: int, thr: int, span_mod: int) -> str:
    # One span-corruption CTE chain (the SQL_SPAN_CORRUPT structure)
    # restricted to the docs hash-assigned to ``mode``, with the
    # density/span literals parameterized; CTE names suffixed by tag.
    lookback = span_mod - 1
    return f"""toks{tag} AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \\x09\\x0A\\x0D\\x0B\\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
  WHERE (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':ul2:'),
              1, 15) AS BIGINT) % 3) = {mode}
), rows{tag} AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM toks{tag} WHERE len(toks) > 0
), marked{tag} AS (
  SELECT doc_id, pos, tok,
    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
          CAST(pos AS VARCHAR) || ':s:'), 1, 15) AS BIGINT) % 1000000)
      < {thr} AS is_start,
    1 + (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
          CAST(pos AS VARCHAR) || ':l:'), 1, 15) AS BIGINT) % {span_mod})
      AS span_len
  FROM rows{tag}
), cov{tag} AS (
  SELECT doc_id, pos, tok,
    COALESCE(MAX(CASE WHEN is_start THEN pos + span_len END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN {lookback} PRECEDING AND CURRENT ROW) > pos,
             FALSE) AS covered
  FROM marked{tag}
), sp{tag} AS (
  SELECT doc_id, pos, tok, covered,
    covered AND NOT COALESCE(
      LAG(covered) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
      AS new_span
  FROM cov{tag}
), numbered{tag} AS (
  SELECT doc_id, pos, tok, covered, new_span,
    CAST(SUM(CASE WHEN new_span THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS INT) AS span_k
  FROM sp{tag}
), pieces{tag} AS (
  SELECT doc_id, pos, new_span,
    CASE WHEN NOT covered THEN tok
         WHEN new_span THEN '<extra_id_' || CAST(span_k AS VARCHAR) || '>'
    END AS p_in,
    CASE WHEN new_span
           THEN '<extra_id_' || CAST(span_k AS VARCHAR) || '> ' || tok
         WHEN covered THEN tok
    END AS p_tg
  FROM numbered{tag}
), agg{tag} AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN new_span THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
    COALESCE(string_agg(p_in, ' ' ORDER BY pos)
               FILTER (WHERE p_in IS NOT NULL), '') AS inputs,
    COALESCE(string_agg(p_tg, ' ' ORDER BY pos)
               FILTER (WHERE p_tg IS NOT NULL), '') AS tg
  FROM pieces{tag} GROUP BY doc_id
)"""


def _sql_ul2_mix(
    r_density: float = 0.15, r_span: int = 3,
    x_density: float = 0.5, x_span: int = 8,
) -> str:
    from etl_pipeline2_0_spark.functions.mixing import rate_to_units

    r_thr = rate_to_units(r_density, 1_000_000)
    x_thr = rate_to_units(x_density, 1_000_000)
    return (
        "WITH "
        + _sql_ul2_span_chain("r", 0, r_thr, r_span)
        + ",\n"
        + _sql_ul2_span_chain("x", 1, x_thr, x_span)
        + r""",
s_toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
  WHERE (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':ul2:'),
              1, 15) AS BIGINT) % 3) = 2
), s_rows AS (
  SELECT doc_id, toks, len(toks) AS n,
         GREATEST(1, CAST(FLOOR(len(toks) / 4.0) AS INT)) AS lo
  FROM s_toks WHERE len(toks) >= 2
), s_cut AS (
  SELECT doc_id, toks, n,
         lo + CAST((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                || ':cut:'), 1, 15) AS BIGINT)
                % GREATEST(n - 2 * lo + 1, 1)) AS INT) AS cut
  FROM s_rows
)
SELECT doc_id, 'r' AS denoiser, n_tokens, n_spans,
       '[R] ' || inputs AS inputs,
       CASE WHEN n_spans = 0 THEN ''
            ELSE tg || ' <extra_id_' || CAST(n_spans AS VARCHAR) || '>'
       END AS targets
FROM aggr
UNION ALL
SELECT doc_id, 'x' AS denoiser, n_tokens, n_spans,
       '[X] ' || inputs AS inputs,
       CASE WHEN n_spans = 0 THEN ''
            ELSE tg || ' <extra_id_' || CAST(n_spans AS VARCHAR) || '>'
       END AS targets
FROM aggx
UNION ALL
SELECT doc_id, 's' AS denoiser, CAST(n AS BIGINT) AS n_tokens,
       CAST(0 AS BIGINT) AS n_spans,
       '[S] ' || array_to_string(toks[1:cut], ' ') AS inputs,
       array_to_string(toks[cut + 1:n], ' ') AS targets
FROM s_cut
"""
    )


SQL_UL2_MIX = _sql_ul2_mix()


# ------------------------------ unigram-LM tokenizer training (Kudo 2018) -


def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SentencePiece-family unigram-LM vocabulary, Viterbi hard-EM over
    # the bounded word-type table (2 EM rounds, pieces <= 4 chars,
    # vocab 200 + all single chars).
    from etl_pipeline2_0_spark.functions import unigram

    docs = load_table(spark, sf_dir, "documents")
    return unigram.unigram_train(
        docs, vocab_size=200, em_iters=2, max_piece_len=4,
        max_word_types=256, max_word_len=12,
    )


def _sql_unigram_train(
    vocab_size: int = 200,
    em_iters: int = 2,
    max_piece_len: int = 4,
    max_word_types: int = 256,
    max_word_len: int = 12,
) -> str:
    # The Spark side folds the Viterbi DP JVM-side; this twin unrolls the
    # SAME recurrence as max_word_len argmax CTEs (forward) plus
    # max_word_len backpointer hops (backward) per EM round — identical
    # 6 dp rounding, identical (cost desc, span-len desc, piece asc)
    # tie-break, so values agree exactly.  Multi-referenced CTEs are
    # MATERIALIZED (the BPE-twin lesson: DuckDB inlines them
    # exponentially otherwise).
    L = max_word_len
    parts = [
        r"""wt AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                              x -> length(x) > 0)) AS word
    FROM documents
  ) WHERE length(word) <= """ + str(L) + f"""
  GROUP BY word ORDER BY freq DESC, word ASC LIMIT {max_word_types}
)""",
        f"""spans AS MATERIALIZED (
  SELECT word, freq, i, j, substring(word, i + 1, j - i) AS piece
  FROM (
    SELECT word, freq, unnest(generate_series(0, length(word) - 1)) AS i
    FROM wt
  ), LATERAL (
    SELECT unnest(generate_series(i + 1,
                                  LEAST(i + {max_piece_len},
                                        length(word)))) AS j
  )
)""",
        """cand0 AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c FROM spans GROUP BY piece
)""",
        "ncand AS (SELECT COUNT(*) AS n FROM cand0)",
    ]
    for it in range(1, em_iters + 1):
        prev = f"cand{it - 1}"
        parts += [
            f"tot{it} AS (SELECT SUM(c) AS t FROM {prev})",
            f"""probs{it} AS MATERIALIZED (
  SELECT piece, ROUND(ln((c + 1.0) / (t + n)), 6) AS logp
  FROM {prev} CROSS JOIN tot{it} CROSS JOIN ncand
)""",
            f"""sp{it} AS MATERIALIZED (
  SELECT s.word, s.i, s.j, s.piece, p.logp
  FROM spans s JOIN probs{it} p USING (piece)
)""",
            f"""bu{it}_0 AS MATERIALIZED (
  SELECT word, 0 AS pos, 0.0 AS cost,
         CAST(NULL AS INT) AS bp_i, CAST(NULL AS VARCHAR) AS bp_piece
  FROM wt
)""",
        ]
        for j in range(1, L + 1):
            parts += [
                f"""b{it}_{j} AS MATERIALIZED (
  SELECT word, {j} AS pos, cost, i AS bp_i, piece AS bp_piece FROM (
    SELECT s.word, s.i, s.piece, ROUND(b.cost + s.logp, 6) AS cost,
           ROW_NUMBER() OVER (PARTITION BY s.word
                              ORDER BY ROUND(b.cost + s.logp, 6) DESC,
                                       (s.j - s.i) DESC, s.piece ASC) AS rn
    FROM sp{it} s
    JOIN bu{it}_{j - 1} b ON b.word = s.word AND b.pos = s.i
    WHERE s.j = {j}
  ) WHERE rn = 1
)""",
                f"""bu{it}_{j} AS MATERIALIZED (
  SELECT * FROM bu{it}_{j - 1} UNION ALL SELECT * FROM b{it}_{j}
)""",
            ]
        parts.append(
            f"""cur{it}_0 AS (
  SELECT word, freq, CAST(length(word) AS INT) AS pos FROM wt
)"""
        )
        for s in range(1, L + 1):
            parts += [
                f"""hop{it}_{s} AS MATERIALIZED (
  SELECT c.word, c.freq, b.bp_i, b.bp_piece
  FROM cur{it}_{s - 1} c
  JOIN bu{it}_{L} b ON b.word = c.word AND b.pos = c.pos
  WHERE c.pos > 0
)""",
                f"""cur{it}_{s} AS (
  SELECT word, freq, bp_i AS pos FROM hop{it}_{s}
)""",
            ]
        used_union = "\n  UNION ALL\n".join(
            f"  SELECT freq, bp_piece AS piece FROM hop{it}_{s}"
            for s in range(1, L + 1)
        )
        parts += [
            f"used{it} AS (\n{used_union}\n)",
            f"""cand{it} AS MATERIALIZED (
  SELECT c0.piece,
         CAST(COALESCE(u.c, 0) AS BIGINT) AS c
  FROM cand0 c0
  LEFT JOIN (SELECT piece, SUM(freq) AS c FROM used{it} GROUP BY piece) u
    USING (piece)
)""",
        ]
    last = f"cand{em_iters}"
    parts += [
        f"tot_f AS (SELECT SUM(c) AS t FROM {last})",
        f"""scored AS (
  SELECT piece, CAST(c AS BIGINT) AS n_uses,
         ROUND(ln((c + 1.0) / (t + n)), 6) AS logp,
         ROW_NUMBER() OVER (ORDER BY c DESC, piece ASC) AS rn
  FROM {last} CROSS JOIN tot_f CROSS JOIN ncand
)""",
        f"""vocab AS MATERIALIZED (
  SELECT piece, n_uses, logp FROM scored
  WHERE rn <= {vocab_size} OR length(piece) = 1
)""",
    ]
    return parts


def _sql_unigram_train_sql() -> str:
    parts = _sql_unigram_train()
    return "WITH " + ",\n".join(parts) + "\nSELECT piece, n_uses, logp FROM vocab"


def _sql_dp_chain(tag: str, wt_cte: str, spans_cte: str, L: int) -> list:
    # One Viterbi pass as unrolled CTEs over ``wt_cte`` words with
    # ``spans_cte`` (word, i, j, piece, logp) spans: forward argmax
    # steps {tag}_j with running union {tag}u_j, then backward
    # backpointer hops {tag}h_s.  Callers assemble segmentations from
    # the hops ({tag}seg: word, freq, step, piece — end-first order).
    parts = [
        f"""{tag}u_0 AS MATERIALIZED (
  SELECT word, 0 AS pos, 0.0 AS cost,
         CAST(NULL AS INT) AS bp_i, CAST(NULL AS VARCHAR) AS bp_piece
  FROM {wt_cte}
)""",
    ]
    for j in range(1, L + 1):
        parts += [
            f"""{tag}_{j} AS MATERIALIZED (
  SELECT word, {j} AS pos, cost, i AS bp_i, piece AS bp_piece FROM (
    SELECT s.word, s.i, s.piece, ROUND(b.cost + s.logp, 6) AS cost,
           ROW_NUMBER() OVER (PARTITION BY s.word
                              ORDER BY ROUND(b.cost + s.logp, 6) DESC,
                                       (s.j - s.i) DESC, s.piece ASC) AS rn
    FROM {spans_cte} s
    JOIN {tag}u_{j - 1} b ON b.word = s.word AND b.pos = s.i
    WHERE s.j = {j}
  ) WHERE rn = 1
)""",
            f"""{tag}u_{j} AS MATERIALIZED (
  SELECT * FROM {tag}u_{j - 1} UNION ALL SELECT * FROM {tag}_{j}
)""",
        ]
    parts.append(
        f"{tag}c_0 AS (SELECT word, freq, CAST(length(word) AS INT) AS pos"
        f" FROM {wt_cte})"
    )
    for s in range(1, L + 1):
        parts += [
            f"""{tag}h_{s} AS MATERIALIZED (
  SELECT c.word, c.freq, b.bp_i, b.bp_piece
  FROM {tag}c_{s - 1} c
  JOIN {tag}u_{L} b ON b.word = c.word AND b.pos = c.pos
  WHERE c.pos > 0
)""",
            f"{tag}c_{s} AS (SELECT word, freq, bp_i AS pos FROM {tag}h_{s})",
        ]
    used_union = "\n  UNION ALL\n".join(
        f"  SELECT word, freq, {s} AS step, bp_piece AS piece"
        f" FROM {tag}h_{s}"
        for s in range(1, L + 1)
    )
    parts.append(f"{tag}seg AS (\n{used_union}\n)")
    return parts


def _sql_unigram_segment_sql(max_word_len: int = 12) -> str:
    # Extends the train CTE chain with one more Viterbi pass under the
    # PRUNED vocab, then reassembles each word's segmentation in reading
    # order (hops emit end-first -> ORDER BY step DESC).
    parts = _sql_unigram_train()
    parts.append(
        """spv AS MATERIALIZED (
  SELECT s.word, s.i, s.j, s.piece, v.logp
  FROM spans s JOIN vocab v USING (piece)
)"""
    )
    parts += _sql_dp_chain("bv", "wt", "spv", max_word_len)
    return (
        "WITH " + ",\n".join(parts) + """
SELECT word, freq,
       CAST(COUNT(*) AS INT) AS n_pieces,
       string_agg(piece, ' ' ORDER BY step DESC) AS pieces
FROM bvseg GROUP BY word, freq
"""
    )


def _sql_unigram_fertility_sql(max_word_len: int = 12) -> str:
    # Fertility by source under the trained vocab: the DP chain runs
    # over ALL distinct corpus words (length-capped); uncovered words
    # (no Viterbi path under the pruned vocab, or too long) count in
    # n_words but not the fertility denominator.
    parts = _sql_unigram_train()
    parts += [
        r"""toksrc AS MATERIALIZED (
  SELECT source AS grp,
         unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS word
  FROM documents
)""",
        """sw AS MATERIALIZED (
  SELECT grp, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toksrc GROUP BY 1, 2
)""",
        f"""wta AS MATERIALIZED (
  SELECT DISTINCT word, CAST(1 AS BIGINT) AS freq FROM sw
  WHERE length(word) <= {max_word_len}
)""",
        f"""spa AS MATERIALIZED (
  SELECT t.word, t.i, t.j, substring(t.word, t.i + 1, t.j - t.i) AS piece,
         v.logp
  FROM (
    SELECT word, i, unnest(generate_series(i + 1,
                           LEAST(i + 4, length(word)))) AS j
    FROM (
      SELECT word, unnest(generate_series(0, length(word) - 1)) AS i
      FROM wta
    )
  ) t JOIN vocab v ON v.piece = substring(t.word, t.i + 1, t.j - t.i)
)""",
    ]
    parts += _sql_dp_chain("fa", "wta", "spa", max_word_len)
    parts.append(
        """perw AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wp FROM faseg GROUP BY word
)"""
    )
    return (
        "WITH " + ",\n".join(parts) + """
SELECT sw.grp AS source,
       CAST(SUM(sw.cnt) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN p.wp IS NOT NULL THEN sw.cnt ELSE 0 END)
            AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN p.wp IS NOT NULL THEN sw.cnt * p.wp ELSE 0 END)
            AS BIGINT) AS n_pieces,
       ROUND(SUM(CASE WHEN p.wp IS NOT NULL THEN sw.cnt * p.wp ELSE 0 END)
             * 1.0 /
             GREATEST(SUM(CASE WHEN p.wp IS NOT NULL THEN sw.cnt
                               ELSE 0 END), 1), 6) AS fertility
FROM sw LEFT JOIN perw p USING (word)
GROUP BY sw.grp
"""
    )


SQL_UNIGRAM_TRAIN = _sql_unigram_train_sql()
SQL_UNIGRAM_SEGMENT = _sql_unigram_segment_sql()
SQL_UNIGRAM_FERTILITY = _sql_unigram_fertility_sql()


def q_tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The tokenizer decision table: per-source fertility + OOV rate for
    # BPE vs unigram-LM trained on the same corpus under the same word
    # tokenization, with the fertility delta — one shared occurrence
    # aggregate joined against both trained segmentation tables.
    from etl_pipeline2_0_spark.functions import unigram

    docs = load_table(spark, sf_dir, "documents")
    return unigram.tokenizer_compare(
        docs, n_merges=8, max_word_types_bpe=512, vocab_size=200,
        em_iters=2, max_piece_len=4, max_word_types=256, max_word_len=12,
    )


def _sql_tokenizer_compare(
    n_merges: int = 8,
    max_word_types_bpe: int = 512,
    max_word_len: int = 12,
    vocab_size: int = 200,
) -> str:
    # Composes the BPE merge-chain CTEs with the unigram train + scoring
    # DP chain (no CTE name overlap between the families), then one
    # grouped aggregate over the shared per-(source, word) occurrence
    # table left-joined against both segmentation tables.
    bpe = _sql_bpe_ctes(n_merges, max_word_types_bpe)
    parts = _sql_unigram_train(vocab_size=vocab_size)
    parts += [
        r"""toksrc AS MATERIALIZED (
  SELECT source AS grp,
         unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS word
  FROM documents
)""",
        """sw AS MATERIALIZED (
  SELECT grp, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toksrc GROUP BY 1, 2
)""",
        f"""wta AS MATERIALIZED (
  SELECT DISTINCT word, CAST(1 AS BIGINT) AS freq FROM sw
  WHERE length(word) <= {max_word_len}
)""",
        f"""spa AS MATERIALIZED (
  SELECT t.word, t.i, t.j, substring(t.word, t.i + 1, t.j - t.i) AS piece,
         v.logp
  FROM (
    SELECT word, i, unnest(generate_series(i + 1,
                           LEAST(i + 4, length(word)))) AS j
    FROM (
      SELECT word, unnest(generate_series(0, length(word) - 1)) AS i
      FROM wta
    )
  ) t JOIN vocab v ON v.piece = substring(t.word, t.i + 1, t.j - t.i)
)""",
    ]
    parts += _sql_dp_chain("fa", "wta", "spa", max_word_len)
    parts += [
        """perw AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wp FROM faseg GROUP BY word
)""",
        f"""bseg AS MATERIALIZED (
  SELECT word,
         CAST(len(string_split(replace(trim(sym, '·'), '··', ' '), ' '))
              AS BIGINT) AS bp
  FROM words{n_merges}
)""",
        """cmp AS (
  SELECT sw.grp AS source,
         CAST(SUM(sw.cnt) AS BIGINT) AS n_words,
         CAST(SUM(CASE WHEN b.bp IS NOT NULL THEN sw.cnt ELSE 0 END)
              AS BIGINT) AS bpe_covered,
         CAST(SUM(CASE WHEN b.bp IS NOT NULL THEN sw.cnt * b.bp ELSE 0 END)
              AS BIGINT) AS bpe_pieces,
         CAST(SUM(CASE WHEN p.wp IS NOT NULL THEN sw.cnt ELSE 0 END)
              AS BIGINT) AS uni_covered,
         CAST(SUM(CASE WHEN p.wp IS NOT NULL THEN sw.cnt * p.wp ELSE 0 END)
              AS BIGINT) AS uni_pieces
  FROM sw LEFT JOIN bseg b USING (word) LEFT JOIN perw p USING (word)
  GROUP BY sw.grp
)""",
    ]
    return (
        bpe + ",\n" + ",\n".join(parts) + """
SELECT source, n_words, bpe_covered, bpe_pieces, uni_covered, uni_pieces,
       ROUND(bpe_pieces * 1.0 / GREATEST(bpe_covered, 1), 6)
         AS bpe_fertility,
       ROUND(uni_pieces * 1.0 / GREATEST(uni_covered, 1), 6)
         AS uni_fertility,
       ROUND(1.0 - bpe_covered * 1.0 / n_words, 6) AS bpe_oov_rate,
       ROUND(1.0 - uni_covered * 1.0 / n_words, 6) AS uni_oov_rate,
       ROUND(uni_pieces * 1.0 / GREATEST(uni_covered, 1)
             - bpe_pieces * 1.0 / GREATEST(bpe_covered, 1), 6)
         AS fertility_delta
FROM cmp
"""
    )


SQL_TOKENIZER_COMPARE = _sql_tokenizer_compare()


def q_tokenizer_compare_eqv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EQUAL-BUDGET variant of the decision table (r13 verdict item 7):
    # the default row trains BPE over 512 word types against a 200-piece
    # unigram vocab, confounding the family comparison with budget.
    # Here both families get the SAME budgets — 256 training word types
    # each, and a 32-piece effective vocabulary each: BPE's terminal
    # piece vocab is exactly its corpus alphabet + one piece per merge
    # (measured 24 distinct characters on this corpus at every SF, + 8
    # merges = 32), and unigram prunes to vocab_size=32 (its 24 single
    # chars survive pruning for coverage, so the multi-char piece budget
    # is 8 vs 8).  The fertility_delta of THIS row compares families,
    # not budgets.
    from etl_pipeline2_0_spark.functions import unigram

    docs = load_table(spark, sf_dir, "documents")
    return unigram.tokenizer_compare(
        docs, n_merges=8, max_word_types_bpe=256, vocab_size=32,
        em_iters=2, max_piece_len=4, max_word_types=256, max_word_len=12,
    )


SQL_TOKENIZER_COMPARE_EQV = _sql_tokenizer_compare(
    max_word_types_bpe=256, vocab_size=32
)


def q_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pieces-per-word by source under the trained unigram vocab — the
    # tokenizer_fertility mirror, directly comparable with the BPE row.
    from etl_pipeline2_0_spark.functions import unigram

    docs = load_table(spark, sf_dir, "documents")
    return unigram.unigram_fertility(
        docs, vocab_size=200, em_iters=2, max_piece_len=4,
        max_word_types=256, max_word_len=12,
    )


def q_unigram_segment_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Apply side of the unigram trainer: Viterbi segmentation of every
    # word type under the pruned trained vocabulary.
    from etl_pipeline2_0_spark.functions import unigram

    docs = load_table(spark, sf_dir, "documents")
    return unigram.unigram_segment_words(
        docs, vocab_size=200, em_iters=2, max_piece_len=4,
        max_word_types=256, max_word_len=12,
    )


# ---------------------------------------------- fill-in-middle transform -


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FIM example construction (Bavarian et al. 2022) at the canonical
    # 50% rate, PSM/SPM joint 50/50, md5-deterministic cuts.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.fim_transform(docs, fim_rate=0.5)


SQL_FIM_TRANSFORM = r"""
WITH h AS (
  SELECT doc_id, text, length(text) AS L,
    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':fim:'), 1, 15)
         AS BIGINT) % 100 AS h_fim,
    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':c1:'), 1, 15)
         AS BIGINT) AS h_c1,
    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':c2:'), 1, 15)
         AS BIGINT) AS h_c2,
    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mode:'), 1, 15)
         AS BIGINT) % 2 AS h_mode
  FROM documents
), cuts AS (
  SELECT doc_id, text, L,
         (h_fim < 50 AND L >= 3) AS do_fim, h_mode,
         LEAST(1 + h_c1 % L, 1 + h_c2 % L) AS lo,
         GREATEST(1 + h_c1 % L, 1 + h_c2 % L) AS hi
  FROM h
), parts AS (
  SELECT doc_id, text, L, do_fim, h_mode,
         substring(text, 1, lo - 1) AS prefix,
         substring(text, lo, hi - lo) AS middle,
         substring(text, hi, L - hi + 1) AS suffix
  FROM cuts
)
SELECT doc_id,
       CASE WHEN NOT do_fim THEN 'none'
            WHEN h_mode = 1 THEN 'spm' ELSE 'psm' END AS mode,
       CAST(L AS BIGINT) AS n_chars,
       CASE WHEN NOT do_fim THEN text
            WHEN h_mode = 1
              THEN '<SUF>' || suffix || '<PRE>' || prefix || '<MID>' || middle
            ELSE '<PRE>' || prefix || '<SUF>' || suffix || '<MID>' || middle
       END AS fim_text
FROM parts
"""


# -------------------------------------------- sentence-boundary chunking -


def q_sentence_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Semantic (sentence-integral) RAG chunking at a 40-token budget —
    # the boundary-respecting alternative to the sliding window.
    docs = load_table(spark, sf_dir, "documents")
    return retrieval.sentence_chunk(docs, budget_tokens=40)


SQL_SENTENCE_CHUNK = r"""
WITH raw AS (
  SELECT doc_id, trim(unnest(regexp_extract_all(text, '[^.!?]+[.!?]*'))) AS sent,
         generate_subscripts(regexp_extract_all(text, '[^.!?]+[.!?]*'), 1)
           AS pos
  FROM documents
), sents AS (
  SELECT doc_id, pos, sent,
         len(list_filter(regexp_split_to_array(sent,
                         '[ \x09\x0A\x0D\x0B\x0C]+'),
                         x -> length(x) > 0)) AS n_tok
  FROM raw WHERE length(sent) > 0
), assigned AS (
  SELECT doc_id, pos, sent, n_tok,
         CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / 40) AS INT) AS chunk_id
  FROM sents
)
SELECT doc_id, chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       string_agg(sent, ' ' ORDER BY pos) AS chunk_text
FROM assigned GROUP BY doc_id, chunk_id
"""


# ------------------------------------------ contrastive crop-pair mining -


def q_crop_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Contriever/ICT positive pairs: two deterministic 16-token crops
    # per document with overlap accounting.
    docs = load_table(spark, sf_dir, "documents")
    return retrieval.crop_pairs(docs, crop_tokens=16)


SQL_CROP_PAIRS = r"""
WITH tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) - 16 + 1 AS span
  FROM tokd WHERE len(toks) >= 16
), starts AS (
  SELECT doc_id, toks,
    CAST(1 + CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':a:'),
                   1, 15) AS BIGINT) % span AS INT) AS a_start,
    CAST(1 + CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':b:'),
                   1, 15) AS BIGINT) % span AS INT) AS b_start
  FROM sized
)
SELECT doc_id, a_start, b_start,
       CAST(GREATEST(0, LEAST(a_start, b_start) + 16
                        - GREATEST(a_start, b_start)) AS INT)
         AS overlap_tokens,
       array_to_string(list_slice(toks, a_start, a_start + 15), ' ')
         AS crop_a,
       array_to_string(list_slice(toks, b_start, b_start + 15), ' ')
         AS crop_b
FROM starts
"""


# -------------------------------------------- margin-based bitext mining -


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LASER/CCMatrix margin mining: labels 0-4 play the source language,
    # 5-9 the target; ratio margin over k=4 cross-side neighbors.
    from etl_pipeline2_0_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.bitext_mine(
        emb.where(F.col("label") < 5),
        emb.where(F.col("label") >= 5),
        k=4,
        margin_threshold=1.0,
    )


SQL_BITEXT_MINE = r"""
WITH s AS (
  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS sv
  FROM embeddings WHERE label < 5
), t AS (
  SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS tv
  FROM embeddings WHERE label >= 5
), pairs AS MATERIALIZED (
  SELECT src_id, tgt_id,
         ROUND(list_inner_product(sv, tv)
               / (SQRT(list_inner_product(sv, sv))
                  * SQRT(list_inner_product(tv, tv))), 6) AS cos
  FROM s CROSS JOIN t
), ms AS (
  SELECT src_id, AVG(cos) AS m_s FROM (
    SELECT src_id, cos,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cos DESC, tgt_id ASC) AS rn
    FROM pairs
  ) WHERE rn <= 4 GROUP BY src_id
), mt AS (
  SELECT tgt_id, AVG(cos) AS m_t FROM (
    SELECT tgt_id, cos,
           ROW_NUMBER() OVER (PARTITION BY tgt_id
                              ORDER BY cos DESC, src_id ASC) AS rn
    FROM pairs
  ) WHERE rn <= 4 GROUP BY tgt_id
), cand AS (
  SELECT src_id, tgt_id, cos FROM (
    SELECT src_id, tgt_id, cos,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cos DESC, tgt_id ASC) AS rn
    FROM pairs
  ) WHERE rn = 1
)
SELECT c.src_id, c.tgt_id, c.cos AS cosine_sim,
       ROUND(c.cos / ((ms.m_s + mt.m_t) / 2.0), 6) AS margin
FROM cand c JOIN ms USING (src_id) JOIN mt USING (tgt_id)
WHERE ROUND(c.cos / ((ms.m_s + mt.m_t) / 2.0), 6) >= 1.0
"""


def q_bitext_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mined-pair recall of the IVF-fed bitext path (the 100 TB
    # configuration: cluster-scoped candidate equi-joins, never the
    # cross product) vs the exact all-pairs path — the ann_recall
    # template applied to mining; fully oracled because the IVF side
    # uses the md5-portable coarse quantizer.
    from etl_pipeline2_0_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.bitext_mine_recall(
        emb.where(F.col("label") < 5),
        emb.where(F.col("label") >= 5),
        k=4,
        margin_threshold=1.0,
        n_centroids=16,
        n_probe=4,
    )


SQL_BITEXT_RECALL = r"""
WITH s AS (
  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS sv
  FROM embeddings WHERE label < 5
), t AS (
  SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS tv
  FROM embeddings WHERE label >= 5
), pairs AS MATERIALIZED (
  SELECT src_id, tgt_id,
         ROUND(list_inner_product(sv, tv)
               / (SQRT(list_inner_product(sv, sv))
                  * SQRT(list_inner_product(tv, tv))), 6) AS cos
  FROM s CROSS JOIN t
), ms AS (
  SELECT src_id, AVG(cos) AS m_s FROM (
    SELECT src_id, cos,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cos DESC, tgt_id ASC) AS rn
    FROM pairs
  ) WHERE rn <= 4 GROUP BY src_id
), mt AS (
  SELECT tgt_id, AVG(cos) AS m_t FROM (
    SELECT tgt_id, cos,
           ROW_NUMBER() OVER (PARTITION BY tgt_id
                              ORDER BY cos DESC, src_id ASC) AS rn
    FROM pairs
  ) WHERE rn <= 4 GROUP BY tgt_id
), cand AS (
  SELECT src_id, tgt_id, cos FROM (
    SELECT src_id, tgt_id, cos,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cos DESC, tgt_id ASC) AS rn
    FROM pairs
  ) WHERE rn = 1
), exact_mined AS MATERIALIZED (
  SELECT c.src_id, c.tgt_id
  FROM cand c JOIN ms USING (src_id) JOIN mt USING (tgt_id)
  WHERE ROUND(c.cos / ((ms.m_s + mt.m_t) / 2.0), 6) >= 1.0
), cents AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY hh, tgt_id) AS INT)
           AS centroid_id,
         tv AS cv
  FROM (
    SELECT tgt_id, tv,
           CAST('0x' || substring(md5(CAST(tgt_id AS VARCHAR)), 1, 15)
                AS BIGINT) AS hh
    FROM t
  )
  QUALIFY centroid_id <= 16
), s_probe AS MATERIALIZED (
  SELECT src_id, sv, centroid_id AS cluster FROM (
    SELECT s.src_id, s.sv, c.centroid_id,
           ROUND(list_inner_product(s.sv, c.cv) /
                 (SQRT(list_inner_product(s.sv, s.sv))
                  * SQRT(list_inner_product(c.cv, c.cv))), 6) AS sim
    FROM s CROSS JOIN cents c
  ) QUALIFY ROW_NUMBER() OVER (PARTITION BY src_id
                               ORDER BY sim DESC, centroid_id) <= 4
), s_home AS MATERIALIZED (
  SELECT src_id, sv, centroid_id AS cluster FROM (
    SELECT s.src_id, s.sv, c.centroid_id,
           ROUND(list_inner_product(s.sv, c.cv) /
                 (SQRT(list_inner_product(s.sv, s.sv))
                  * SQRT(list_inner_product(c.cv, c.cv))), 6) AS sim
    FROM s CROSS JOIN cents c
  ) QUALIFY ROW_NUMBER() OVER (PARTITION BY src_id
                               ORDER BY sim DESC, centroid_id) = 1
), t_probe AS MATERIALIZED (
  SELECT tgt_id, tv, centroid_id AS cluster FROM (
    SELECT t.tgt_id, t.tv, c.centroid_id,
           ROUND(list_inner_product(t.tv, c.cv) /
                 (SQRT(list_inner_product(t.tv, t.tv))
                  * SQRT(list_inner_product(c.cv, c.cv))), 6) AS sim
    FROM t CROSS JOIN cents c
  ) QUALIFY ROW_NUMBER() OVER (PARTITION BY tgt_id
                               ORDER BY sim DESC, centroid_id) <= 4
), t_home AS MATERIALIZED (
  SELECT tgt_id, tv, centroid_id AS cluster FROM (
    SELECT t.tgt_id, t.tv, c.centroid_id,
           ROUND(list_inner_product(t.tv, c.cv) /
                 (SQRT(list_inner_product(t.tv, t.tv))
                  * SQRT(list_inner_product(c.cv, c.cv))), 6) AS sim
    FROM t CROSS JOIN cents c
  ) QUALIFY ROW_NUMBER() OVER (PARTITION BY tgt_id
                               ORDER BY sim DESC, centroid_id) = 1
), annpairs AS MATERIALIZED (
  SELECT DISTINCT src_id, tgt_id, cos FROM (
    SELECT p.src_id, h.tgt_id,
           ROUND(list_inner_product(p.sv, h.tv) /
                 (SQRT(list_inner_product(p.sv, p.sv))
                  * SQRT(list_inner_product(h.tv, h.tv))), 6) AS cos
    FROM s_probe p JOIN t_home h USING (cluster)
    UNION ALL
    SELECT h.src_id, p.tgt_id,
           ROUND(list_inner_product(h.sv, p.tv) /
                 (SQRT(list_inner_product(h.sv, h.sv))
                  * SQRT(list_inner_product(p.tv, p.tv))), 6) AS cos
    FROM s_home h JOIN t_probe p USING (cluster)
  )
), ams AS (
  SELECT src_id, AVG(cos) AS m_s FROM (
    SELECT src_id, cos,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cos DESC, tgt_id ASC) AS rn
    FROM annpairs
  ) WHERE rn <= 4 GROUP BY src_id
), amt AS (
  SELECT tgt_id, AVG(cos) AS m_t FROM (
    SELECT tgt_id, cos,
           ROW_NUMBER() OVER (PARTITION BY tgt_id
                              ORDER BY cos DESC, src_id ASC) AS rn
    FROM annpairs
  ) WHERE rn <= 4 GROUP BY tgt_id
), acand AS (
  SELECT src_id, tgt_id, cos FROM (
    SELECT src_id, tgt_id, cos,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cos DESC, tgt_id ASC) AS rn
    FROM annpairs
  ) WHERE rn = 1
), ann_mined AS MATERIALIZED (
  SELECT c.src_id, c.tgt_id
  FROM acand c JOIN ams USING (src_id) JOIN amt USING (tgt_id)
  WHERE ROUND(c.cos / ((ams.m_s + amt.m_t) / 2.0), 6) >= 1.0
), counts AS (
  SELECT
    (SELECT COUNT(*) FROM exact_mined) AS n_exact,
    (SELECT COUNT(*) FROM ann_mined) AS n_ann,
    (SELECT COUNT(*) FROM exact_mined e JOIN ann_mined a
       ON e.src_id = a.src_id AND e.tgt_id = a.tgt_id) AS n_common
)
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_ann AS BIGINT) AS n_ann,
       CAST(n_common AS BIGINT) AS n_common,
       ROUND(CASE WHEN n_exact = 0 THEN 1.0
                  ELSE n_common * 1.0 / n_exact END, 6) AS recall
FROM counts
"""


def q_unigram_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus pricing under the trained unigram tokenizer — the
    # bpe_encode_docs mirror with uncovered-word accounting.
    from etl_pipeline2_0_spark.functions import unigram

    docs = load_table(spark, sf_dir, "documents")
    return unigram.unigram_encode_docs(
        docs, vocab_size=200, em_iters=2, max_piece_len=4,
        max_word_types=256, max_word_len=12,
    )


def _sql_unigram_encode_sql(max_word_len: int = 12) -> str:
    # The fertility twin's DP chain keyed per DOC instead of per source.
    parts = _sql_unigram_train()
    parts += [
        r"""tokdoc AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            x -> length(x) > 0)) AS word
  FROM documents
)""",
        """dw AS MATERIALIZED (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tokdoc GROUP BY 1, 2
)""",
        f"""wta AS MATERIALIZED (
  SELECT DISTINCT word, CAST(1 AS BIGINT) AS freq FROM dw
  WHERE length(word) <= {max_word_len}
)""",
        f"""spa AS MATERIALIZED (
  SELECT t.word, t.i, t.j, substring(t.word, t.i + 1, t.j - t.i) AS piece,
         v.logp
  FROM (
    SELECT word, i, unnest(generate_series(i + 1,
                           LEAST(i + 4, length(word)))) AS j
    FROM (
      SELECT word, unnest(generate_series(0, length(word) - 1)) AS i
      FROM wta
    )
  ) t JOIN vocab v ON v.piece = substring(t.word, t.i + 1, t.j - t.i)
)""",
    ]
    parts += _sql_dp_chain("fa", "wta", "spa", max_word_len)
    parts.append(
        """perw AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wp FROM faseg GROUP BY word
)"""
    )
    return (
        "WITH " + ",\n".join(parts) + """
SELECT dw.doc_id,
       CAST(SUM(dw.cnt) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN p.wp IS NOT NULL THEN dw.cnt ELSE 0 END)
            AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN p.wp IS NOT NULL THEN dw.cnt * p.wp ELSE 0 END)
            AS BIGINT) AS n_pieces
FROM dw LEFT JOIN perw p USING (word)
GROUP BY dw.doc_id
"""
    )


SQL_UNIGRAM_ENCODE = _sql_unigram_encode_sql()


# ---------------------------------------- int8 embedding quantization ----


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Symmetric per-vector int8 quantization with exact reconstruction
    # error — the 4x storage cut a billion-vector store takes.  The code
    # array serializes to a canonical CSV string for the cross-engine
    # value hash (the tokenize_ids convention).
    from etl_pipeline2_0_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.embed_quantize(emb)
    return out.select(
        "id",
        "dim",
        "scale",
        F.concat_ws(
            ",", F.transform(F.col("codes"), lambda x: x.cast("string"))
        ).alias("codes"),
        "rel_err",
    )


SQL_EMBED_QUANTIZE = r"""
WITH e AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT id, v, len(v) AS dim,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
), q AS (
  SELECT id, v, dim, scale,
         CASE WHEN scale = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(ROUND(x / scale) AS INT))
         END AS codes
  FROM s
), err AS (
  SELECT id, dim, scale, codes,
    list_sum(list_transform(list_zip(v, codes),
             p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale))) AS num,
    list_sum(list_transform(v, x -> x * x)) AS den
  FROM q
)
SELECT id, CAST(dim AS INT) AS dim, scale,
       array_to_string(codes, ',') AS codes,
       ROUND(CASE WHEN den = 0 THEN 0.0 ELSE SQRT(num) / SQRT(den) END, 6)
         AS rel_err
FROM err
"""


# ---------------------------------------------------------- soft dedup ----


def q_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reweighting alternative to hard near-dedup (SoftDedup, He et al.
    # 2024; the D4/FineWeb duplicate-signal ablations): same subset,
    # shingling, and 0.3-Jaccard graph as dup_components, but every
    # cluster member survives at sampling weight 1/cluster_size.
    # n_effective's integer identity (clusters + unclustered docs) makes
    # the corpus-mass accounting exact — no float fold to drift.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 2
    )
    pairs = dedup.jaccard_pairs(docs, k=3, threshold=0.3)
    return dedup.soft_dedup_weights(docs, pairs)


# Reuse the dup_components recursive-CTE chain verbatim; the tail turns
# components into per-doc sampling weights.
SQL_SOFT_DEDUP = (
    SQL_DUP_COMPONENTS.rsplit("SELECT node", 1)[0]
    + """, comp AS (
  SELECT node, MIN(label) AS component FROM reach GROUP BY node
), csizes AS (
  SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
), doc_cluster AS (
  SELECT node, cluster_size FROM comp JOIN csizes USING (component)
), stats AS (
  SELECT (SELECT COUNT(*) FROM docs) AS n_docs,
         (SELECT COUNT(*) FROM comp) AS n_members,
         (SELECT COUNT(DISTINCT component) FROM comp) AS n_clusters
)
SELECT d.id AS doc_id,
       CAST(COALESCE(dc.cluster_size, 1) AS BIGINT) AS cluster_size,
       ROUND(1.0 / COALESCE(dc.cluster_size, 1), 6) AS weight,
       CAST(n_docs - n_members + n_clusters AS BIGINT) AS n_effective,
       ROUND((n_docs - n_members + n_clusters) * 1.0 / n_docs, 6)
         AS effective_frac
FROM docs d
LEFT JOIN doc_cluster dc ON d.id = dc.node
CROSS JOIN stats
"""
)


# ----------------------------------------------------------- DPO pairs ----


def q_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Preference-pair construction (the public DPO best-vs-worst recipe):
    # docs sharing doc_id mod 64 play one pseudo-prompt's candidate pool,
    # scored by lexical diversity; argmax vs argmin with a 0.02 margin
    # floor so both the kept and the filtered branches carry rows.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.dpo_pairs(docs, n_groups=64, min_margin=0.02)


SQL_DPO_PAIRS = r"""
WITH base AS (
  SELECT doc_id % 64 AS group_id, doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''),
                                           '[ \x09\x0A\x0D\x0B\x0C]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), scored AS (
  SELECT group_id, doc_id,
         CASE WHEN len(toks) > 0
              THEN ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6)
              ELSE 0.0 END AS score
  FROM base
), ranked AS (
  SELECT group_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY group_id
                            ORDER BY score DESC, doc_id DESC) AS rc,
         ROW_NUMBER() OVER (PARTITION BY group_id
                            ORDER BY score ASC, doc_id ASC) AS rr,
         COUNT(*) OVER (PARTITION BY group_id) AS n_candidates
  FROM scored
), ch AS (
  SELECT group_id, doc_id AS chosen_id, score AS chosen_score,
         n_candidates
  FROM ranked WHERE rc = 1
), rj AS (
  SELECT group_id, doc_id AS rejected_id, score AS rejected_score
  FROM ranked WHERE rr = 1
)
SELECT CAST(ch.group_id AS INT) AS group_id, chosen_id, rejected_id,
       chosen_score, rejected_score,
       ROUND(chosen_score - rejected_score, 6) AS margin,
       CAST(n_candidates AS BIGINT) AS n_candidates
FROM ch JOIN rj USING (group_id)
WHERE n_candidates >= 2
  AND chosen_id <> rejected_id
  AND ROUND(chosen_score - rejected_score, 6) >= 0.02
"""


def q_best_of_n_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The rejection-sampling inference-scaling curve: mean best reward
    # among the first N md5-arrival-order candidates per pseudo-prompt
    # group, N in 1/2/4/8 — what best-of-N buys before paying for
    # generation.  n_groups=4 keeps >=8 candidates per group at every
    # SF including sf0.001 (50 docs), so the curve is non-vacuous and
    # every point averages the same group set.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.best_of_n_curve(docs, ns=(1, 2, 4, 8), n_groups=4)


# Inherit dpo_pairs' base/scoring CTEs with the curve's 4-way grouping;
# the tail ranks by md5 arrival order, takes per-group conditional
# maxes, and fans the one summary row out by N literals.
SQL_BEST_OF_N_CURVE = SQL_DPO_PAIRS.split("), ranked AS (")[0].replace(
    "doc_id % 64", "doc_id % 4"
) + """), u AS (
  SELECT group_id, doc_id,
         CAST(ROUND(score * 1000000.0) AS BIGINT) AS u,
         md5(CAST(doc_id AS VARCHAR)) AS ok
  FROM scored
), ranked AS (
  SELECT group_id, u,
         ROW_NUMBER() OVER (PARTITION BY group_id
                            ORDER BY ok, doc_id) AS ra
  FROM u
), per AS (
  SELECT group_id, COUNT(*) AS n,
         MAX(CASE WHEN ra <= 1 THEN u END) AS m1,
         MAX(CASE WHEN ra <= 2 THEN u END) AS m2,
         MAX(CASE WHEN ra <= 4 THEN u END) AS m4,
         MAX(CASE WHEN ra <= 8 THEN u END) AS m8
  FROM ranked GROUP BY group_id
), el AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(m1) AS BIGINT) AS s1,
         CAST(SUM(m2) AS BIGINT) AS s2,
         CAST(SUM(m4) AS BIGINT) AS s4,
         CAST(SUM(m8) AS BIGINT) AS s8
  FROM per WHERE n >= 8
)
SELECT v.n_samples, e.k AS n_groups,
       v.su / e.k / 1000000.0 AS mean_best_reward
FROM el e, LATERAL (
  VALUES (CAST(1 AS INT), e.s1), (CAST(2 AS INT), e.s2),
         (CAST(4 AS INT), e.s4), (CAST(8 AS INT), e.s8)
) v(n_samples, su)
ORDER BY v.n_samples
"""
assert "list_distinct" in SQL_BEST_OF_N_CURVE  # scoring CTEs inherited


# ---------------------------------------------------------- ANN hubness ----


def q_ann_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k-occurrence hubness audit (Radovanović et al. 2010) of the
    # portable IVF index: every other vector queries the full corpus;
    # the top-10 hub vectors and the antihub dead-zone fraction are the
    # index-health numbers a retrieval pipeline checks before mining.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_hubness(
        emb, emb.where(F.col("vec_id") % 2 == 0), k=5,
        n_centroids=16, n_probe=4, top_hubs=10,
    )


SQL_ANN_HUBNESS = _SQL_IVF_PORTABLE_CTE.replace(
    "WHERE vec_id < 8", "WHERE vec_id % 2 = 0"
) + """
, occ AS (
  SELECT neighbor_id, COUNT(*) AS n_occ FROM ivf_topk GROUP BY neighbor_id
), tot AS (
  SELECT COUNT(*) AS n_lists, COUNT(DISTINCT neighbor_id) AS n_hit
  FROM ivf_topk
), db AS (
  SELECT COUNT(*) AS n_db FROM e
), hubs AS (
  SELECT neighbor_id, n_occ,
         ROW_NUMBER() OVER (ORDER BY n_occ DESC, neighbor_id) AS rnk
  FROM occ
)
SELECT neighbor_id AS vec_id, CAST(n_occ AS BIGINT) AS n_occ,
       ROUND(n_occ * 1.0 / n_lists, 6) AS occ_share,
       CAST(n_lists AS BIGINT) AS n_lists,
       ROUND((n_db - n_hit) * 1.0 / n_db, 6) AS antihub_frac,
       CAST(rnk AS INT) AS rnk
FROM hubs CROSS JOIN tot CROSS JOIN db
WHERE rnk <= 10
"""
assert "vec_id % 2 = 0" in SQL_ANN_HUBNESS


# ----------------------------------------------------------- best of N ----


def q_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rejection-sampling selection (best-of-N / Llama-2 RSFT): the
    # dpo_pairs grouping and scoring with the top-3 kept per group —
    # rnk 1 provably equals dpo_pairs' chosen candidate (shared
    # id-descending tiebreak).
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.best_of_n(docs, n=3, n_groups=64)


# Reuse the dpo_pairs base/scoring CTEs verbatim; only the ranking tail
# differs (top-n keep instead of argmax/argmin pairing).
SQL_BEST_OF_N = SQL_DPO_PAIRS.split("), ranked AS (")[0] + """), ranked AS (
  SELECT group_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY group_id
                            ORDER BY score DESC, doc_id DESC) AS rnk
  FROM scored
)
SELECT CAST(group_id AS INT) AS group_id, doc_id, score,
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
"""
assert "list_distinct" in SQL_BEST_OF_N  # scoring CTEs really inherited


# ------------------------------------------------------ GRPO advantage ----


def q_grpo_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Group-relative advantage normalization (the public GRPO recipe):
    # per pseudo-prompt group, each candidate's reward z-scored against
    # its group's mean/std — the third RL-data product mined from the
    # SAME scored pool as dpo_pairs / best_of_n (identical groups,
    # identical rewards, consistent rankings).
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.grpo_advantage(docs, n_groups=64)


# Inherit dpo_pairs' base/scoring CTEs verbatim; the tail converts the
# 6dp reward to exact micro-unit BIGINTs, aggregates integer sums per
# group, and derives mean/std/advantage by the same fixed op sequence as
# the Spark side (see mixing.grpo_advantage's determinism note).  The
# positivity test runs on DuckDB's exact HUGEINT sums (mirroring Spark's
# DECIMAL(38,0) — both exact, both overflow-free); the EMITTED numerator
# is the identical fixed-order double expression both engines evaluate.
SQL_GRPO_ADVANTAGE = SQL_DPO_PAIRS.split("), ranked AS (")[0] + """), u AS (
  SELECT group_id, doc_id,
         CAST(ROUND(score * 1000000.0) AS BIGINT) AS u
  FROM scored
), stats AS (
  SELECT group_id,
         SUM(u) AS su, SUM(u * u) AS sq,
         COUNT(*) AS n
  FROM u GROUP BY group_id
), stats_d AS (
  SELECT group_id, su, sq, n,
         CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
           - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS num
  FROM stats
)
SELECT CAST(u.group_id AS INT) AS group_id, u.doc_id,
       u.u / 1000000.0 AS reward,
       (t.su * 1.0 / t.n) / 1000000.0 AS group_mean,
       SQRT(t.num / CAST(t.n * t.n AS DOUBLE)) / 1000000.0 AS group_std,
       (u.u - t.su * 1.0 / t.n)
             / SQRT(t.num / CAST(t.n * t.n AS DOUBLE)) AS advantage,
       CAST(t.n AS BIGINT) AS n_candidates
FROM u JOIN stats_d t USING (group_id)
WHERE t.n >= 2 AND t.n * t.sq > t.su * t.su AND t.num > 0
"""
assert "list_distinct" in SQL_GRPO_ADVANTAGE  # scoring CTEs really inherited


# ------------------------------------------------------ cluster profile ----


def q_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-space composition (the SemDeDup/DCLM cluster analysis):
    # every vector assigned to its nearest portable centroid; per
    # cluster, corpus share + label makeup — the dominance table a
    # rebalance/dedup decision reads first.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cluster_profile(emb, n_centroids=16)


# Reuse the portable-IVF centroid/assignment CTEs verbatim; the tail
# rolls labels up per cluster instead of probing queries.
SQL_CLUSTER_PROFILE = _SQL_IVF_PORTABLE_CTE.split("), q AS (")[0] + """), lab AS (
  SELECT a.neighbor_id, a.cluster, b.label
  FROM assigned a JOIN embeddings b ON a.neighbor_id = b.vec_id
), counts AS (
  SELECT cluster, label, COUNT(*) AS cnt FROM lab GROUP BY cluster, label
), per AS (
  SELECT cluster, SUM(cnt) AS n_vecs, COUNT(*) AS n_labels
  FROM counts GROUP BY cluster
), top AS (
  SELECT cluster, label AS top_label, cnt AS top_cnt,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY cnt DESC, label ASC) AS rn
  FROM counts
), tot AS (
  SELECT COUNT(*) AS n_total FROM e
)
SELECT per.cluster AS cluster_id, CAST(n_vecs AS BIGINT) AS n_vecs,
       ROUND(n_vecs * 1.0 / n_total, 6) AS share,
       CAST(top_label AS INT) AS top_label,
       ROUND(top_cnt * 1.0 / n_vecs, 6) AS top_label_share,
       CAST(n_labels AS BIGINT) AS n_labels
FROM per JOIN top ON per.cluster = top.cluster CROSS JOIN tot
WHERE top.rn = 1
"""
assert "assigned AS (" in SQL_CLUSTER_PROFILE


# ------------------------------------------------------- simhash recall ----


def q_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Recall of the portable-SimHash pipeline (Hamming <= 3) against the
    # exact n-gram-Jaccard ground truth at J >= 0.5 — minhash_recall's
    # companion for the OTHER near-dup family, closing the quality-metric
    # asymmetry (MinHash had recall/precision/band-efficiency; SimHash
    # had only pair parity).  Same %2 subset as minhash_recall so the
    # two recalls are directly comparable on the same truth set.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 0
    )
    truth = dedup.jaccard_pairs(docs, k=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    sigs = dedup.simhash60_portable(docs)
    found = dedup.hamming_pairs(
        sigs, id_col="id", sig_col="simhash", max_hamming=3, blocks=4
    ).select("id_a", "id_b")
    return truth.crossJoin(
        F.broadcast(
            truth.join(found, ["id_a", "id_b"], "semi")
            .agg(F.count(F.lit(1)).alias("n_found"))
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"),
        F.max("n_found").cast("bigint").alias("n_recalled"),
        F.round(
            F.max("n_found") / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
        ).alias("recall"),
    )


# The portable-simhash chain with the %2 subset; the truth chain is the
# dup_components shingle construction (namespaced t*) at J >= 0.5 with
# the minhash_recall 6dp rounding.
SQL_SIMHASH_RECALL = (
    _sql_simhash_portable(max_hamming=3, blocks=4)
    .replace("FROM documents\n", "FROM documents WHERE doc_id % 2 = 0\n", 1)
    .rstrip()
)
# Exact n-gram-Jaccard ground truth (the dup_components shingle chain,
# namespaced t*) at J >= 0.5 on the %2 subset + the recall aggregate —
# shared by every fingerprint-family recall metric (simhash, winnow) so
# their numbers are computed on the IDENTICAL truth set.
_SQL_JACCARD_TRUTH_RECALL_TAIL = r""", tdocs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents WHERE doc_id % 2 = 0
), ttoks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'),
                         x -> length(x) > 0) AS toks
  FROM tdocs
), ttok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM ttoks
), tsh0 AS (
  SELECT id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
           AS shingle
  FROM ttok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), tsh AS (
  SELECT DISTINCT id, shingle FROM tsh0 WHERE shingle IS NOT NULL
), tsizes AS (
  SELECT id, COUNT(*) AS n FROM tsh GROUP BY id
), tinter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM tsh a JOIN tsh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), truth AS (
  SELECT id_a, id_b
  FROM tinter JOIN tsizes sa2 ON id_a = sa2.id
              JOIN tsizes sb2 ON id_b = sb2.id
  WHERE ROUND(n_common * 1.0 / (sa2.n + sb2.n - n_common), 6) >= 0.5
), agg AS (
  SELECT COUNT(*) AS n_true_pairs,
         SUM(CASE WHEN EXISTS (SELECT 1 FROM found f
                               WHERE f.id_a = truth.id_a
                                 AND f.id_b = truth.id_b)
                  THEN 1 ELSE 0 END) AS n_recalled
  FROM truth
)
SELECT CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_recalled AS BIGINT) AS n_recalled,
       ROUND(n_recalled * 1.0 / GREATEST(n_true_pairs, 1), 6) AS recall
FROM agg"""

SQL_SIMHASH_RECALL = SQL_SIMHASH_RECALL.rsplit("SELECT id_a, id_b,", 1)[
    0
] + """, found AS (
  SELECT id_a, id_b
  FROM cand JOIN sig sa ON id_a = sa.id JOIN sig sb ON id_b = sb.id
  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
)""" + _SQL_JACCARD_TRUTH_RECALL_TAIL
assert "bit_count" in SQL_SIMHASH_RECALL and "tinter" in SQL_SIMHASH_RECALL


# -------------------------------------------------------- winnow recall ----


def q_winnow_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Recall of the winnowing copy-detector (k=8 char grams, window 4,
    # >= 5 shared fingerprints) against the same exact-Jaccard truth set
    # as minhash_recall/simhash_recall — the third fingerprint family
    # measured on the identical truth, so a dedup-strategy decision can
    # read all three recalls side by side.  Winnowing screens for
    # VERBATIM shared runs, so its recall on token-level near-dups is
    # expected to sit below MinHash — that gap is the measurement.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 0
    )
    truth = dedup.jaccard_pairs(docs, k=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    found = dedup.winnow_overlap_pairs(
        docs, k=8, window=4, min_shared=5, max_doc_freq=10,
        portable_hash=True,
    ).select("id_a", "id_b")
    return truth.crossJoin(
        F.broadcast(
            truth.join(found, ["id_a", "id_b"], "semi")
            .agg(F.count(F.lit(1)).alias("n_found"))
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"),
        F.max("n_found").cast("bigint").alias("n_recalled"),
        F.round(
            F.max("n_found") / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
        ).alias("recall"),
    )


# The winnow chain on the %2 subset; the shared truth tail guarantees
# the identical truth set as the other fingerprint recalls.
SQL_WINNOW_RECALL = (
    SQL_WINNOW_OVERLAP.replace(
        "WHERE doc_id % 10 = 0", "WHERE doc_id % 2 = 0", 1
    ).rstrip()
)
SQL_WINNOW_RECALL = SQL_WINNOW_RECALL.rsplit("SELECT a.id AS id_a,", 1)[
    0
] + """, found AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM filt a JOIN filt b ON a.fp = b.fp AND a.id < b.id
  GROUP BY a.id, b.id
  HAVING COUNT(*) >= 5
)""" + _SQL_JACCARD_TRUTH_RECALL_TAIL
assert "fp" in SQL_WINNOW_RECALL and "tinter" in SQL_WINNOW_RECALL
assert "% 2 = 0" in SQL_WINNOW_RECALL


# ------------------------------------------------------- dedup manifest ----


def q_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deletion lineage of the layered exact -> near dedup run on the
    # dup-dense %3==2 subset: (dropped_id, keeper_id, reason).  The
    # synthetic corpus has exact dups only at sf0.1 (one group in this
    # subset), so below that the exact branch proves plan parity
    # end-to-end and its drop path is pinned by the planted fixtures in
    # tests/test_functions.py (the dedup_lines precedent); the near
    # branch carries live rows at every SF.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 2
    )
    return dedup.dedup_manifest(docs, k=3, threshold=0.3)


SQL_DEDUP_MANIFEST = SQL_DEDUP_CANONICAL.replace(
    """WITH RECURSIVE docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents WHERE doc_id % 3 = 2
)""",
    """WITH RECURSIVE base AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 2
), ex AS (
  SELECT id, MIN(id) OVER (PARTITION BY md5(text)) AS keeper FROM base
), exact_drop AS (
  SELECT id AS dropped_id, keeper AS keeper_id FROM ex WHERE id <> keeper
), docs AS (
  SELECT b.id, lower(b.text) AS t FROM base b
  WHERE b.id NOT IN (SELECT dropped_id FROM exact_drop)
)""",
    1,
).replace(
    """SELECT d.id AS doc_id FROM docs d
WHERE d.id NOT IN (SELECT node FROM comp WHERE node <> component)""",
    """SELECT e.dropped_id,
       COALESCE(c.component, e.keeper_id) AS keeper_id,
       'exact' AS reason
FROM exact_drop e LEFT JOIN comp c ON e.keeper_id = c.node
UNION ALL
SELECT node AS dropped_id, component AS keeper_id, 'near' AS reason
FROM comp WHERE node <> component""",
    1,
)
assert "exact_drop" in SQL_DEDUP_MANIFEST
assert "'near'" in SQL_DEDUP_MANIFEST


# ---------------------------------------------------- jaccard histogram ----


def q_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The threshold-tuning curve: candidate-pair mass per 0.1 Jaccard
    # bin over EVERY pair sharing a shingle, on the dup-dense subset —
    # read before committing a dedup threshold.  On this corpus the
    # curve is the textbook cliff (≈1k background pairs in bin 0.0 at
    # sf0.01, then nothing until the planted near-dups at 0.9) — the
    # shape that says any threshold in the gap is safe.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 2
    )
    return dedup.jaccard_histogram(docs, k=3, min_jaccard=0.0)


# Shares the dup_components shingle/intersection chain; the tail bins
# the 6dp-rounded Jaccard with the IEEE-edge snap (see
# dedup.jaccard_histogram).
SQL_JACCARD_HISTOGRAM = r"""
WITH docs AS (
  SELECT doc_id AS id, lower(text) AS t FROM documents WHERE doc_id % 3 = 2
), toks AS (
  SELECT id, list_filter(regexp_split_to_array(t, '\W+'),
                         x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM toks
), sh0 AS (
  SELECT id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
           AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT id, shingle FROM sh0 WHERE shingle IS NOT NULL
), sizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), scored AS (
  SELECT ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
)
SELECT FLOOR(ROUND(jaccard * 10, 6)) / 10.0 AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM scored WHERE jaccard >= 0.0
GROUP BY 1
"""


# ------------------------------------------------------ corpus overlap ----


def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cross-source shingle-containment matrix — the inter-source
    # duplication estimate read before mixing corpora (containment_a =
    # shared shingle vocabulary as a fraction of source A's).
    docs = load_table(spark, sf_dir, "documents")
    return dedup.corpus_overlap(docs, group_col="source", k=3)


SQL_CORPUS_OVERLAP = r"""
WITH docs AS (
  SELECT doc_id AS id, source AS grp, lower(text) AS t FROM documents
), toks AS (
  SELECT id, grp, list_filter(regexp_split_to_array(t, '\W+'),
                              x -> length(x) > 0) AS toks
  FROM docs
), tok_rows AS (
  SELECT id, grp, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM toks
), sh0 AS (
  SELECT id, grp,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
           AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY id ORDER BY ord)
), sh AS (
  SELECT DISTINCT grp, shingle FROM sh0 WHERE shingle IS NOT NULL
), sizes AS (
  SELECT grp, COUNT(*) AS n_sh FROM sh GROUP BY grp
), inter AS (
  SELECT a.grp AS group_a, b.grp AS group_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.grp < b.grp
  GROUP BY a.grp, b.grp
)
SELECT group_a, group_b, CAST(n_common AS BIGINT) AS n_common,
       ROUND(n_common * 1.0 / sa.n_sh, 6) AS containment_a,
       ROUND(n_common * 1.0 / sb.n_sh, 6) AS containment_b,
       ROUND(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON group_a = sa.grp
JOIN sizes sb ON group_b = sb.grp
"""


# --------------------------------------------------- epoch decay curve ----


def q_epoch_decay_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The data_budget_plan formula swept over 1/2/4/8/16 repeat epochs —
    # the "is another epoch still worth compute" curve per source.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    return mixing.epoch_decay_curve(
        docs, group_col="source", epochs=(1.0, 2.0, 4.0, 8.0, 16.0),
        r_star=15.4,
    )


SQL_EPOCH_DECAY_CURVE = r"""
WITH per AS (
  SELECT source,
         CAST(SUM(len(list_filter(
             regexp_split_to_array(COALESCE(text, ''),
                                   '[ \x09\x0A\x0D\x0B\x0C]+'),
             x -> length(x) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), swept AS (
  SELECT source, n_tokens, e.epochs
  FROM per CROSS JOIN
       (SELECT UNNEST([1.0, 2.0, 4.0, 8.0, 16.0]) AS epochs) e
)
SELECT source, epochs, n_tokens,
       ROUND(epochs * n_tokens, 6) AS requested_tokens,
       ROUND(LEAST(epochs, 1.0) * n_tokens
             + n_tokens * 15.4
               * (1.0 - exp(-GREATEST(epochs - 1.0, 0.0) / 15.4)), 6)
         AS effective_tokens,
       ROUND(CASE WHEN epochs * n_tokens > 0 THEN
               (LEAST(epochs, 1.0) * n_tokens
                + n_tokens * 15.4
                  * (1.0 - exp(-GREATEST(epochs - 1.0, 0.0) / 15.4)))
               / (epochs * n_tokens)
             ELSE 0.0 END, 6) AS efficiency
FROM swept
"""


# ------------------------------------------------------ bloom FPR curve ----


def q_bloom_fpr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bloom sizing table for the decontamination prefilter: the same
    # %97 eval split and 3-shingles as bloom_contamination, measured at
    # four filter widths — realized FPR + fill per width, the numbers
    # that size the broadcast filter before a 100 TB run.
    from etl_pipeline2_0_spark.functions import sketches

    docs = load_table(spark, sf_dir, "documents")
    eval_sh = docs.where(F.col("doc_id") % 97 == 0).select(
        F.explode(dedup.token_shingles(F.col("text"), 3)).alias("item")
    )
    cand = docs.where(F.col("doc_id") % 97 != 0).select(
        F.explode(dedup.token_shingles(F.col("text"), 3)).alias("item")
    )
    return sketches.bloom_fpr_curve(
        cand, eval_sh, num_hashes=4, widths=(1024, 2048, 4096, 8192)
    )


# One hash per (row, shingle), re-bucketed per width — the sweep costs
# one modulus per width, not one md5 per width.
SQL_BLOOM_FPR_CURVE = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM tok
), sh0 AS (
  SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w || ' '
           || LEAD(tok, 2) OVER w AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL
), eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
), cand AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 <> 0
), rows_ AS (
  SELECT unnest([0, 1, 2, 3]) AS row
), widths AS (
  SELECT unnest([1024, 2048, 4096, 8192]) AS num_bits
), eh AS (
  SELECT CAST('0x' || substring(md5(CAST(row AS VARCHAR) || ':' || shingle),
                                1, 15) AS BIGINT) AS h
  FROM eval_sh CROSS JOIN rows_
), bloom AS (
  SELECT DISTINCT num_bits, h % num_bits AS bit FROM eh CROSS JOIN widths
), ch AS (
  SELECT shingle, CAST('0x' || substring(md5(CAST(row AS VARCHAR) || ':'
                                             || shingle), 1, 15) AS BIGINT)
           AS h
  FROM cand CROSS JOIN rows_
), probes AS (
  SELECT num_bits, shingle, h % num_bits AS bit FROM ch CROSS JOIN widths
), hits AS (
  SELECT p.num_bits, p.shingle, COUNT(*) AS n_set
  FROM probes p JOIN bloom b ON p.num_bits = b.num_bits AND p.bit = b.bit
  GROUP BY 1, 2
), lab AS (
  SELECT cw.num_bits, cw.shingle,
         (COALESCE(n_set, 0) = 4) AS maybe,
         (e.shingle IS NOT NULL) AS is_true
  FROM (SELECT num_bits, shingle FROM cand CROSS JOIN widths) cw
  LEFT JOIN hits ON cw.num_bits = hits.num_bits
                AND cw.shingle = hits.shingle
  LEFT JOIN eval_sh e ON cw.shingle = e.shingle
), bstats AS (
  SELECT num_bits, COUNT(*) AS n_bits_set FROM bloom GROUP BY num_bits
)
SELECT CAST(l.num_bits AS INT) AS num_bits,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_present,
       CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN maybe AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       ROUND(SUM(CASE WHEN maybe AND NOT is_true THEN 1 ELSE 0 END) * 1.0
             / GREATEST(COUNT(*) - SUM(CASE WHEN is_true THEN 1 ELSE 0 END),
                        1), 6) AS fpr,
       CAST(MAX(n_bits_set) AS BIGINT) AS n_bits_set,
       ROUND(MAX(n_bits_set) * 1.0 / l.num_bits, 6) AS fill_ratio
FROM lab l JOIN bstats ON l.num_bits = bstats.num_bits
GROUP BY l.num_bits
"""


# ------------------------------------------------------ CMS error curve ----


def q_cms_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-min sizing table over the corpus SHINGLE stream at
    # DOC-frequency grain — exactly the key space and grain the dedup
    # doc-freq caps probe (the token vocab here is only ~31 keys and
    # saturates any width): realized overestimate distribution at three
    # widths, the cap feed's accuracy/memory tradeoff, measured
    # (bloom_fpr_curve's companion for frequencies).
    from etl_pipeline2_0_spark.functions import sketches

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        F.explode(dedup.token_shingles(F.col("text"), 3)).alias("item")
    )
    return sketches.cms_error_curve(
        occ, depth=4, widths=(1024, 4096, 16384)
    )


# One md5 per (row, token); each width re-buckets with one modulus; the
# sketch builds from the exact count table (identical arithmetic to
# streaming the occurrences — a size-s key adds s to its bucket).
SQL_CMS_ERROR_CURVE = r"""
WITH tokr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM tokr
), sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
           AS tok
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), occ AS (
  -- per-doc DISTINCT shingles: the stream is DOC-frequency grain,
  -- matching dedup.token_shingles (and the doc-freq caps' semantics)
  SELECT DISTINCT doc_id, tok FROM sh0 WHERE tok IS NOT NULL
), exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM occ GROUP BY tok
), rows_ AS (
  SELECT unnest([0, 1, 2, 3]) AS row
), widths AS (
  SELECT unnest([1024, 4096, 16384]) AS width
), th AS (
  SELECT tok, true_cnt, row,
         CAST('0x' || substring(md5(CAST(row AS VARCHAR) || ':' || tok),
                                1, 15) AS BIGINT) AS h
  FROM exact CROSS JOIN rows_
), cells AS (
  SELECT width, row, h % width AS bucket,
         CAST(SUM(true_cnt) AS BIGINT) AS cnt
  FROM th CROSS JOIN widths
  GROUP BY width, row, bucket
), est AS (
  SELECT t.width, tok, true_cnt, MIN(cnt) AS cms_est
  FROM (SELECT width, tok, true_cnt, row, h % width AS bucket
        FROM th CROSS JOIN widths) t
  JOIN cells ON t.width = cells.width AND t.row = cells.row
            AND t.bucket = cells.bucket
  GROUP BY t.width, tok, true_cnt
)
SELECT CAST(width AS INT) AS width,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN cms_est = true_cnt THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       ROUND(SUM(cms_est - true_cnt) * 1.0 / GREATEST(COUNT(*), 1), 6)
         AS mean_err,
       CAST(MAX(cms_est - true_cnt) AS BIGINT) AS max_err
FROM est GROUP BY width
"""


# --------------------------------------------------- LSH geometry sweep ----


def _sql_lsh_geometry_sweep(
    num_hashes: int = 16,
    geometries: "tuple[tuple[int, int], ...]" = ((8, 2), (4, 4), (2, 8)),
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> str:
    """Generated like _sql_minhash_portable, but banding the SAME
    signature CTE under every geometry and aggregating one row per
    geometry; the multi-referenced sh/sig/truth/cand CTEs are
    MATERIALIZED (the DuckDB CTE-inlining trap)."""
    prefix = _sql_minhash_portable(
        num_hashes, geometries[0][0], threshold, max_bucket
    ).split("), banded0 AS (")[0]
    prefix = prefix.replace(
        "SELECT doc_id AS id, lower(text) AS t FROM documents",
        "SELECT doc_id AS id, lower(text) AS t FROM documents"
        " WHERE doc_id % 2 = 0",
        1,
    ).replace("), sh AS (", "), sh AS MATERIALIZED (", 1).replace(
        "), sig AS (", "), sig AS MATERIALIZED (", 1
    )
    parts = [prefix + ")"]
    truth = """, tsizes AS (
  SELECT id, COUNT(*) AS n FROM sh GROUP BY id
), tinter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
), truth AS MATERIALIZED (
  SELECT id_a, id_b
  FROM tinter JOIN tsizes sa2 ON id_a = sa2.id
              JOIN tsizes sb2 ON id_b = sb2.id
  WHERE ROUND(n_common * 1.0 / (sa2.n + sb2.n - n_common), 6)
        >= {thr}
)""".format(thr=threshold)
    parts.append(truth)
    selects = []
    for gi, (bands, rpb) in enumerate(geometries):
        band_selects = "\n  UNION ALL\n".join(
            "  SELECT id, {bi} AS band, md5(".format(bi=bi)
            + " || ',' || ".join(
                "CAST(s{j} AS VARCHAR)".format(j=bi * rpb + o)
                for o in range(rpb)
            )
            + ") AS bucket FROM sig"
            for bi in range(bands)
        )
        parts.append(""", banded{gi}0 AS (
{band_selects}
), banded{gi} AS (
  SELECT id, band, bucket FROM (
    SELECT id, band, bucket,
           COUNT(*) OVER (PARTITION BY band, bucket) AS bn
    FROM banded{gi}0
  ) WHERE bn <= {cap}
), cand{gi} AS MATERIALIZED (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded{gi} a
  JOIN banded{gi} b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)""".format(gi=gi, band_selects=band_selects, cap=max_bucket))
        selects.append("""SELECT {bands} AS bands, {rpb} AS rows_per_band,
       (SELECT COUNT(*) FROM cand{gi}) AS n_candidates,
       (SELECT COUNT(*) FROM truth) AS n_true_pairs,
       (SELECT COUNT(*) FROM cand{gi} c
        JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b)
         AS n_found""".format(bands=bands, rpb=rpb, gi=gi))
    union = "\nUNION ALL\n".join(selects)
    tail = """
SELECT CAST(bands AS INT) AS bands,
       CAST(rows_per_band AS INT) AS rows_per_band,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_found AS BIGINT) AS n_found,
       ROUND(n_found * 1.0 / GREATEST(n_true_pairs, 1), 6) AS recall,
       ROUND(n_found * 1.0 / GREATEST(n_candidates, 1), 6) AS efficiency
FROM (
{union}
)
""".format(union=union)
    return "".join(parts) + tail


def q_lsh_geometry_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The LSH tuning table: at a fixed 16-hash signature budget, the
    # (bands x rows) split decides the recall/candidate-volume tradeoff
    # (8x2 loose ... 2x8 strict); this measures all three on the same
    # exact-Jaccard truth (the %2 metric subset) so the geometry is
    # picked from data, not the textbook S-curve alone.
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 0
    )
    return dedup.lsh_geometry_sweep(
        docs, k=3, num_hashes=16,
        geometries=((8, 2), (4, 4), (2, 8)), threshold=0.5,
        max_bucket=1000,
    )


SQL_LSH_GEOMETRY_SWEEP = _sql_lsh_geometry_sweep(
    16, ((8, 2), (4, 4), (2, 8)), 0.5, 1000
)
assert "cand2" in SQL_LSH_GEOMETRY_SWEEP
assert "MATERIALIZED" in SQL_LSH_GEOMETRY_SWEEP


# ---------------------------------------------- shingle DF histogram ----


def q_shingle_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Doc-frequency distribution of the shingle space on power-of-two
    # buckets — the evidence the dedup `max_doc_freq` caps (and the CMS
    # width choice) are tuned against: a heavy tail here is exactly the
    # boilerplate the caps must drop before the banded joins.
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(dedup.token_shingles(F.col("text"), 3)).alias("shingle"),
    )
    df_tbl = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    # power-of-two bucket: floor(log2(df)) → bucket_lo = 2^k (df=1 → 1,
    # 2-3 → 2, 4-7 → 4, ...); integer-exact in both engines.
    bucket = F.pow(
        F.lit(2.0), F.floor(F.log2(F.col("df").cast("double")))
    ).cast("bigint")
    return (
        df_tbl.groupBy(bucket.alias("df_bucket_lo"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum("df").cast("bigint").alias("n_postings"),
            F.max("df").cast("bigint").alias("max_df"),
        )
    )


SQL_SHINGLE_DF_HISTOGRAM = r"""
WITH tokr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM tokr
), sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
           AS shingle
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL
), dft AS (
  SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY shingle
)
SELECT CAST(POW(2.0, FLOOR(LOG2(CAST(df AS DOUBLE)))) AS BIGINT)
         AS df_bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(df) AS BIGINT) AS n_postings,
       CAST(MAX(df) AS BIGINT) AS max_df
FROM dft GROUP BY 1
"""


# ------------------------------------------------------ CDC dedup curve ----


def q_cdc_dedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Content-defined-chunking dedup sizing table (FastCDC family):
    # md5-portable rolling boundaries at three mask widths from ONE gram
    # pass; measures the chunk-level storage-dedup ratio the snapshot
    # layer would realize at each expected chunk size.  Subset keeps the
    # gram-grain oracle cheap at any SF (plan shape identical).
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    return dedup.cdc_dedup_curve(docs, window=8, mask_bits=(4, 5, 6))


SQL_CDC_DEDUP_CURVE = r"""
WITH d AS (
  SELECT doc_id AS id, COALESCE(text, '') AS t,
         length(COALESCE(text, '')) AS n
  FROM documents WHERE doc_id % 4 = 0
), widths AS (SELECT * FROM (VALUES (4, 16), (5, 32), (6, 64)) w(b, mask)),
grams AS (
  SELECT id, n, i,
         CAST('0x' || substring(md5(substring(t, CAST(i AS INT), 8)), 1, 15)
              AS BIGINT) AS h
  FROM d, UNNEST(range(1, greatest(n - 7, 0) + 1)) AS u(i)
  WHERE n >= 8
),
cuts AS (
  SELECT g.id, w.b, g.i + 7 AS off
  FROM grams g CROSS JOIN widths w
  WHERE g.h % w.mask = 0 AND g.i + 7 < g.n
),
offs AS (
  SELECT d.id, w.b, d.t, d.n,
         COALESCE(list_sort(list(c.off) FILTER (WHERE c.off IS NOT NULL)),
                  []) AS offs
  FROM d CROSS JOIN widths w
  LEFT JOIN cuts c ON c.id = d.id AND c.b = w.b
  GROUP BY d.id, w.b, d.t, d.n
),
chunks0 AS (
  SELECT b,
         UNNEST(list_transform(range(1, len(offs) + 2), j ->
           substring(t,
             CAST(CASE WHEN j = 1 THEN 1 ELSE offs[j - 1] + 1 END AS INT),
             CAST((CASE WHEN j = len(offs) + 1 THEN n ELSE offs[j] END)
               - (CASE WHEN j = 1 THEN 1 ELSE offs[j - 1] + 1 END) + 1
               AS INT))))
           AS chunk
  FROM offs
),
ch AS (
  SELECT b, md5(chunk) AS h, CAST(length(chunk) AS BIGINT) AS clen
  FROM chunks0 WHERE length(chunk) > 0
),
tot AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(clen) AS BIGINT) AS total_chars
  FROM ch GROUP BY b
),
unq AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
         CAST(SUM(clen) AS BIGINT) AS unique_chars
  FROM (SELECT b, h, MIN(clen) AS clen FROM ch GROUP BY b, h)
  GROUP BY b
)
SELECT CAST(t.b AS INT) AS mask_bits,
       CAST(POW(2.0, t.b) AS BIGINT) AS expected_chunk_chars,
       t.n_chunks, u.n_unique_chunks, t.total_chars, u.unique_chars,
       t.total_chars * 1.0 / u.unique_chars AS dedup_ratio,
       t.total_chars * 1.0 / t.n_chunks AS mean_chunk_len
FROM tot t JOIN unq u USING (b)
"""


# -------------------------------------------------- contrastive triplets ----


def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hard-triplet mining (anchor / nearest same-label positive / hardest
    # different-label negative) over the portable-IVF candidate set —
    # the training-pair construction an embedding-model pipeline runs
    # after clustering; fully oracled via the md5-portable coarse
    # quantizer.  Anchors = every 8th vector.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.contrastive_triplets(
        emb, emb.where(F.col("vec_id") % 8 == 0), n_centroids=16, n_probe=4
    )


SQL_CONTRASTIVE_TRIPLETS = _SQL_IVF_PORTABLE_CTE.replace(
    "WHERE vec_id < 8", "WHERE vec_id % 8 = 0"
) + """
, lab AS (SELECT vec_id, label FROM embeddings)
, cand AS (
  SELECT p.query_id, ql.label AS q_label, a.neighbor_id, nl.label AS n_label,
         ROUND(list_inner_product(p.qv, a.v) /
               (SQRT(list_inner_product(p.qv, p.qv))
                * SQRT(list_inner_product(a.v, a.v))), 6) AS sim
  FROM probes p JOIN assigned a USING (cluster)
  JOIN lab ql ON ql.vec_id = p.query_id
  JOIN lab nl ON nl.vec_id = a.neighbor_id
  WHERE a.neighbor_id <> p.query_id
), pos AS (
  SELECT query_id, q_label, neighbor_id AS positive_id, sim AS pos_sim
  FROM cand WHERE n_label = q_label
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, neighbor_id) = 1
), neg AS (
  SELECT query_id, neighbor_id AS negative_id, sim AS neg_sim
  FROM cand WHERE n_label <> q_label
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, neighbor_id) = 1
)
SELECT p.query_id AS anchor_id, CAST(p.q_label AS INT) AS anchor_label,
       p.positive_id, p.pos_sim, n.negative_id, n.neg_sim,
       ROUND(p.pos_sim - n.neg_sim, 6) AS margin
FROM pos p JOIN neg n USING (query_id)
"""
assert "vec_id % 8 = 0" in SQL_CONTRASTIVE_TRIPLETS


# ------------------------------------------------------- embed dim stats ----


def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-dimension embedding diagnostics (dead/dominant coordinate
    # table read before quantization/whitening): exact micro-unit sums,
    # decimal-exact variance numerators, every double a fixed op
    # sequence — no rounding, no tolerance.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embed_dim_stats(emb)


SQL_EMBED_DIM_STATS = r"""
WITH e AS (
  SELECT unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS d1
  FROM embeddings
), u AS (
  SELECT d1 - 1 AS dim,
         CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS u
  FROM e
), s AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, SUM(u) AS su,
         SUM(u * u) AS sq
  FROM u GROUP BY dim
), sd AS (
  -- fixed-order double arithmetic, mirrored in the Spark side: IEEE
  -- multiply/subtract over exact integer inputs is correctly rounded in
  -- every engine, unlike >2^53 big-integer -> double conversions
  SELECT dim, n, su,
         CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
           - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS num
  FROM s
), tot AS (
  -- canonical value-sorted left fold (the Spark side reduces the same
  -- sorted list) -- a plain SUM would be accumulation-order-dependent
  SELECT list_reduce(list_sort(list(num)), (a, b) -> a + b) AS tot FROM sd
)
SELECT CAST(dim AS INT) AS dim,
       n AS n_vectors,
       (su * 1.0 / n) / 1000000.0 AS mean,
       num / (n * n) / 1000000000000.0 AS variance,
       num / tot AS var_share
FROM sd CROSS JOIN tot
"""


# -------------------------------------------------------- PCA power top ----


def q_embed_pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top principal direction by exact-integer power iteration (6 steps,
    # the kcenter bounded-loop discipline): anisotropy report — unit
    # loadings + the iterate's Rayleigh quotient and its share of total
    # variance.  Fully oracled: no float enters the loop on either
    # engine.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embed_pca_top(emb, dims=64, n_iter=6)


def _sql_pca_top(n_iter: int = 6, dims: int = 64) -> str:
    # Unrolled MATERIALIZED iteration CTEs (the kcenter/BPE twin
    # pattern); every loop quantity is exact-integer, mirroring
    # similarity.embed_pca_top step for step.
    parts = [
        "WITH e AS MATERIALIZED (SELECT"
        " list_transform(CAST(embedding AS DOUBLE[]),"
        " x -> CAST(ROUND(x * 100000.0) AS BIGINT)) AS q FROM embeddings)",
        f"p0 AS (SELECT list_transform(range(1, {dims + 1}),"
        " i -> CAST(1000 AS BIGINT)) AS p)",
    ]
    for j in range(1, n_iter + 1):
        parts.append(
            f"d{j} AS MATERIALIZED (SELECT q,"
            f" CAST(list_inner_product(q, (SELECT p FROM p{j - 1}))"
            " AS BIGINT) AS d FROM e)"
        )
        parts.append(
            f"w{j} AS MATERIALIZED (SELECT dim - 1 AS dim, SUM(u * d) AS w"
            " FROM (SELECT d, unnest(q) AS u,"
            f" generate_subscripts(q, 1) AS dim FROM d{j}) GROUP BY 1)"
        )
        parts.append(
            f"g{j} AS (SELECT GREATEST(MAX(abs(w)) // 1000, 1) AS g"
            f" FROM w{j})"
        )
        parts.append(
            f"p{j} AS (SELECT list(CAST(CASE WHEN w < 0"
            " THEN -(abs(w) // g) ELSE abs(w) // g END AS BIGINT)"
            f" ORDER BY dim) AS p FROM w{j} CROSS JOIN g{j})"
        )
    parts.append(
        "dF AS MATERIALIZED (SELECT"
        f" CAST(list_inner_product(q, (SELECT p FROM p{n_iter}))"
        " AS BIGINT) AS d FROM e)"
    )
    parts.append(
        "ray AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        " SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS d2,"
        " SUM(d) AS d1 FROM dF)"
    )
    parts.append(
        "pp AS (SELECT GREATEST(CAST(list_inner_product("
        f"(SELECT p FROM p{n_iter}), (SELECT p FROM p{n_iter}))"
        " AS BIGINT), 1) AS pp)"
    )
    parts.append(
        "s AS (SELECT dim - 1 AS dim, CAST(COUNT(*) AS BIGINT) AS n,"
        " SUM(u) AS su, SUM(u * u) AS sq FROM"
        " (SELECT unnest(q) AS u, generate_subscripts(q, 1) AS dim FROM e)"
        " GROUP BY 1)"
    )
    parts.append(
        "tv AS (SELECT list_reduce(list_sort(list("
        " CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)"
        " - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), (a, b) -> a + b)"
        " AS tot FROM s)"
    )
    tail = f"""
SELECT CAST(pf.dim - 1 AS INT) AS dim,
       pf.pv / SQRT(CAST(pp.pp AS DOUBLE)) AS loading,
       ROUND((d2 * 1.0 / n - (d1 * 1.0 / n) * (d1 * 1.0 / n))
             / pp.pp / 10000000000.0, 6) AS eigenvalue,
       ROUND(((d2 * 1.0 / n - (d1 * 1.0 / n) * (d1 * 1.0 / n)) / pp.pp)
             / (tot / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
         AS var_share_top
FROM (SELECT unnest(p) AS pv, generate_subscripts(p, 1) AS dim
      FROM p{n_iter}) pf
CROSS JOIN ray CROSS JOIN pp CROSS JOIN tv
"""
    return ",\n".join(parts) + tail


SQL_EMBED_PCA_TOP = _sql_pca_top(6, 64)


# ---------------------------------------------- cluster-balanced sample ----


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DCLM-style cluster-balanced subsample: nearest portable centroid,
    # then a deterministic md5-order quota per cluster — the rebalance
    # acted on cluster_profile's dominance table.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cluster_balanced_sample(emb, per_cluster=8, n_centroids=16)


# Reuse the portable-IVF centroid/assignment CTEs; the tail ranks each
# cluster's members by the md5-hex15 draw and keeps the quota.
SQL_CLUSTER_BALANCED_SAMPLE = _SQL_IVF_PORTABLE_CTE.split("), q AS (")[0] + """)
SELECT neighbor_id AS vec_id, CAST(cluster AS INT) AS cluster,
       CAST(ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY
         CAST('0x' || substring(md5(CAST(neighbor_id AS VARCHAR)), 1, 15)
              AS BIGINT), neighbor_id) AS INT) AS rnk
FROM assigned
QUALIFY rnk <= 8
"""


# ---------------------------------------------------------- ROUGE screen ----


def q_rouge_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Self-instruct instruction-dedup screen: max bigram recall vs any
    # earlier (smaller-id) doc, keep under 0.7 — the asymmetric-overlap
    # complement of the Jaccard family.  Subset keeps the pair-grain
    # oracle cheap; the pool is the subset's own earlier docs.
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return dedup.rouge_screen(docs, n=2, threshold=0.7, max_doc_freq=50)


SQL_ROUGE_SCREEN = r"""
WITH tokr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\W+'),
                     x -> length(x) > 0) AS toks
  FROM documents WHERE doc_id % 5 = 0
), tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM tokr
), sh0 AS (
  SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w AS s
  FROM tok_rows WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), sh AS (
  SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL
), counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams FROM sh GROUP BY doc_id
), capped AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS dfreq FROM sh
  ) WHERE dfreq <= 50
), shared AS (
  SELECT a.doc_id AS id, b.doc_id AS pool_id,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id > b.doc_id
  GROUP BY 1, 2
), best AS (
  SELECT s.id, s.pool_id, s.shared * 1.0 / c.n_ngrams AS recall
  FROM shared s JOIN counts c ON c.doc_id = s.id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.id
                             ORDER BY recall DESC, s.pool_id) = 1
)
SELECT d.doc_id,
       COALESCE(c.n_ngrams, 0) AS n_ngrams,
       b.pool_id AS match_id,
       COALESCE(b.recall, 0.0) AS max_recall,
       COALESCE(b.recall, 0.0) < 0.7 AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN counts c USING (doc_id)
LEFT JOIN best b ON b.id = d.doc_id
"""


# -------------------------------------------------------------- chat lint ----


def q_chat_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Conversation-data validity report over a synthesized turns frame
    # with PLANTED irregularities (7-cycle role override breaks
    # alternation/first/last; 13-cycle blanks a turn) so every check
    # carries a non-vacuous count — the DQ gate before chat_assemble.
    from etl_pipeline2_0_spark.functions import mixing

    docs = load_table(spark, sf_dir, "documents")
    turns = docs.select(
        (F.col("doc_id") / 5).cast("bigint").alias("conv_id"),
        (F.pmod(F.col("doc_id"), 5) + 1).cast("int").alias("turn_idx"),
        F.when(F.pmod(F.col("doc_id"), 7) == 3, F.lit("user"))
        .when(F.pmod(F.col("doc_id"), 2) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(F.pmod(F.col("doc_id"), 13) == 0, F.lit("   "))
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    return mixing.chat_lint(turns)


SQL_CHAT_LINT = r"""
WITH t AS (
  SELECT CAST(FLOOR(doc_id / 5.0) AS BIGINT) AS conv_id,
         CAST(doc_id % 5 + 1 AS INT) AS turn_idx,
         CASE WHEN doc_id % 7 = 3 THEN 'user'
              WHEN doc_id % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role,
         CASE WHEN doc_id % 13 = 0 THEN '   '
              ELSE COALESCE(text, '') END AS txt
  FROM documents
), per AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
         list(role ORDER BY turn_idx) AS roles,
         MAX(CASE WHEN length(trim(txt)) = 0 THEN 1 ELSE 0 END)
           AS has_empty
  FROM t GROUP BY conv_id
), flags AS (
  SELECT CASE WHEN roles[1] <> 'user' THEN 1 ELSE 0 END
           AS not_user_first,
         CASE WHEN roles[-1] <> 'assistant' THEN 1 ELSE 0 END
           AS not_assistant_last,
         CASE WHEN len(list_filter(range(1, len(roles)),
                                   i -> roles[i] = roles[i + 1])) > 0
              THEN 1 ELSE 0 END AS role_repeat,
         has_empty AS empty_turn,
         CASE WHEN n_turns < 2 THEN 1 ELSE 0 END AS single_turn
  FROM per
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_conversations,
         CAST(SUM(not_user_first) AS BIGINT) AS not_user_first,
         CAST(SUM(not_assistant_last) AS BIGINT) AS not_assistant_last,
         CAST(SUM(role_repeat) AS BIGINT) AS role_repeat,
         CAST(SUM(empty_turn) AS BIGINT) AS empty_turn,
         CAST(SUM(single_turn) AS BIGINT) AS single_turn
  FROM flags
)
SELECT "check", n_fail, n_conversations,
       n_fail * 1.0 / GREATEST(n_conversations, 1) AS fail_rate
FROM (
  SELECT 'not_user_first' AS "check", not_user_first AS n_fail,
         n_conversations FROM agg
  UNION ALL SELECT 'not_assistant_last', not_assistant_last,
         n_conversations FROM agg
  UNION ALL SELECT 'role_repeat', role_repeat, n_conversations FROM agg
  UNION ALL SELECT 'empty_turn', empty_turn, n_conversations FROM agg
  UNION ALL SELECT 'single_turn', single_turn, n_conversations FROM agg
)
"""


# ------------------------------------------------ decontam n-gram curve ----


def q_contamination_ngram_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The decontamination match-length sweep (GPT-3's 13-gram standard
    # bracketed by 8 and 20): contaminated-doc rate per n against the
    # every-97th-doc benchmark — the evidence the threshold choice
    # cites.  Same corpus/benchmark split as contamination_check.
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return dedup.contamination_ngram_curve(corpus, bench, ns=(8, 13, 20))


def _sql_contam_curve(ns: "tuple[int, ...]" = (8, 13, 20)) -> str:
    def gram(n: int) -> str:
        parts = ["tok"] + [f"LEAD(tok, {j}) OVER w" for j in range(1, n)]
        return " || ' ' || ".join(parts)

    bb = "\n  UNION ALL ".join(
        f"SELECT {n} AS n, s FROM (SELECT {gram(n)} AS s FROM btok"
        " WINDOW w AS (PARTITION BY doc_id ORDER BY ord))"
        " WHERE s IS NOT NULL"
        for n in ns
    )
    cb = "\n  UNION ALL ".join(
        f"SELECT doc_id, {n} AS n, s FROM (SELECT doc_id, {gram(n)} AS s"
        " FROM ctok WINDOW w AS (PARTITION BY doc_id ORDER BY ord))"
        " WHERE s IS NOT NULL"
        for n in ns
    )
    vals = ", ".join(f"({n})" for n in ns)
    return rf"""
WITH b AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'),
                             x -> length(x) > 0) AS toks
  FROM documents WHERE doc_id % 97 = 0
), btok AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM b
), c AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'),
                             x -> length(x) > 0) AS toks
  FROM documents WHERE doc_id % 97 <> 0
), ctok AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM c
), bsh AS (
  SELECT DISTINCT n, s FROM ({bb})
), csh AS (
  {cb}
), flagged AS (
  SELECT csh.n, CAST(COUNT(DISTINCT csh.doc_id) AS BIGINT)
           AS n_contaminated
  FROM csh JOIN bsh ON bsh.n = csh.n AND bsh.s = csh.s
  GROUP BY csh.n
), bcounts AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS n_benchmark_ngrams
  FROM bsh GROUP BY n
), nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM c
)
SELECT CAST(v.n AS INT) AS n,
       COALESCE(bc.n_benchmark_ngrams, 0) AS n_benchmark_ngrams,
       nd.n_docs,
       COALESCE(f.n_contaminated, 0) AS n_contaminated,
       COALESCE(f.n_contaminated, 0) * 1.0 / GREATEST(nd.n_docs, 1)
         AS contamination_rate
FROM (VALUES {vals}) v(n)
LEFT JOIN bcounts bc ON bc.n = v.n
LEFT JOIN flagged f ON f.n = v.n
CROSS JOIN nd
"""


SQL_CONTAMINATION_NGRAM_CURVE = _sql_contam_curve((8, 13, 20))
