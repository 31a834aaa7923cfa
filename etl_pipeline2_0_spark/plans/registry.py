"""Registry of every driver-checkable query: name → (spark_fn, oracle_sql).

``oracle_sql`` is None for queries whose semantics are not ANSI-SQL
expressible (engine-specific hashing, pandas-UDF stages) — the driver
records the weaker rows-only check for those.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline2_0_spark.plans import llm_dedup as LD
from etl_pipeline2_0_spark.plans import llm_sketches as LSK
from etl_pipeline2_0_spark.plans import llm_similarity as LS
from etl_pipeline2_0_spark.plans import llm_text as LT
from etl_pipeline2_0_spark.plans import llm_tokenizers as LTK
from etl_pipeline2_0_spark.plans import llm_construct as LC
from etl_pipeline2_0_spark.plans import llm_mixing as LM
from etl_pipeline2_0_spark.plans import llm_retrieval as LR
from etl_pipeline2_0_spark.plans import llm_multimodal as LMM
from etl_pipeline2_0_spark.plans import llm_dq as LQ
from etl_pipeline2_0_spark.plans import relational as R
from etl_pipeline2_0_spark.plans import relational_ext as X
from etl_pipeline2_0_spark.plans import tpch_more as T

QueryFn = Callable[[SparkSession, str], DataFrame]

ALL_QUERIES: dict[str, tuple[QueryFn, Optional[str]]] = {
    # Registration order matters: the external driver's correctness gate
    # verifies the FIRST 50 entries.  Provenance so far:
    #   r01 proved the original relational/TPC-H window (CORRECTNESS_r01);
    #   r02 proved the LLM-ops + scalar batteries (CORRECTNESS_r02);
    #   r03 proved the r2 window plus cohort_retention/q4/q13/q22/
    #     dedup_incremental (CORRECTNESS_r03);
    #   r04/r05 proved math_funcs and banked second green rows for the
    #     43-entry r01-family window;
    #   r06 re-proved the whole past-cap family under the regenerated
    #     testdata (44/44 oracled green — see CORRECTNESS_r06);
    #   r07 proved the 14 r6-added queries (dedup_spans_intra, mix_sources,
    #     pack_sequences, filter_audit, ten TPC-H shapes) and banked second
    #     rows for the r6-family entries;
    #   r08 proved shuffle_shards/knn_label_vote/the corpus-quality battery
    #     first rows, ann_lsh_topk's first ORACLED row, and second rows for
    #     everything else in the window — 45/45 oracled green.
    # ROUND-9 ROTATION (executing the staged r8 plan, registry + verdict):
    #   - The five perennial rows-only entries (minhash_pairs,
    #     simhash_pairs, ann_ivf_topk, media_features, media_decode —
    #     `no_oracle` every round since r2) leave the window: their
    #     correctness burden is carried by the portable twins
    #     (minhash_pairs_portable, simhash_pairs_portable,
    #     ann_ivf_topk_portable), the measured recalls (minhash_recall,
    #     ann_ivf_recall*), and ×3-SF goldens.  First window with zero
    #     expected `err` rows.
    #   - Twice-green entries (r7 AND r8 under the current data regime)
    #     are demoted; 16 representatives across families are retained for
    #     third rows to keep the window family-diverse.
    #   - The entire r8 oracled late batch (retrieval, snapshots, splits,
    #     portable dedup, DQ/metrics — 24 entries, locally parity-proven,
    #     zero driver rows) is promoted, plus the two r9-new portable-IVF
    #     entries: 26 first-time driver rows.
    #
    # ROUND-11 ROTATION (executing the staged r10 plan): the ten r10-added
    # oracled entries (DSIR pair, Gopher pair, PQ pair, CMS heavy hitters,
    # Bloom decontamination, split_leakage, ccnet_buckets) had zero driver
    # rows despite ×3-SF local parity for two sessions — promoted below.
    # Demoted to make room: the seven remaining thrice-green r8-holdovers
    # (shuffle_shards, knn_label_vote, vocab_oov, quantile_filter,
    # lm_score, tokenize_ids, ann_lsh_topk — green r8+r9+r10) and three
    # four-row retained reps (cohort_retention, mix_sources,
    # pack_sequences).  Family anchoring after the swap: LSH stays
    # measured via ann_recall (LSH-vs-exact recall@k), lm_score via
    # lm_score_heldout + ccnet_buckets (which composes it), tokenize_ids
    # via the four BPE entries, mixing/packing via
    # temperature_mix_weights/interleave_key/pack_texts, warehouse via
    # q21; test_sql_registry.py pins the updated representative set and
    # the all-oracled invariant.
    #
    # ROUND-12 ROTATION (EXECUTED this round, as staged r11): the TWENTY
    # r11-added oracled entries (dedup_substrings, dedup_lines,
    # quality_classifier, doremi_weights, c4_rules, zipf_stats,
    # pack_efficiency, heaps_growth, gopher_repetition, unimax_alloc,
    # entropy_stats, langid_confusion, data_budget_plan, quota_sample,
    # edit_neardup, prototypicality, domain_concentration,
    # hist_quantiles, kcenter_coreset, retrieval_pairs) sit past the
    # 50-slot cap with ×3-SF local parity and zero driver rows — promote
    # all twenty.  Demote twenty thrice-green r8/r9 holdovers:
    # chunk_documents, bm25_topk, similar_docs_rrf, corpus_drift_psi,
    # assign_splits, assign_splits_grouped, pack_texts, interleave_key,
    # fk_integrity, value_outliers, profile_columns, dedup_rate_report,
    # text_clean, max_concurrency, doc_novelty, curriculum_buckets,
    # lm_score_heldout, ann_ivf_topk_portable, ann_ivf_recall_portable,
    # tfidf_cosine_pairs.  Family anchoring after the swap: retrieval
    # via phrase_match (in-window) + the promoted retrieval_pairs
    # (which exercises the full BM25 chain), IVF via the PQ pair + the
    # promoted prototypicality (portable centroids + assignment),
    # snapshots via snapshot_diff (retained), DQ via split_leakage +
    # the promoted langid_confusion, splits via split_leakage +
    # quota_sample, packing via pack_efficiency, text quality via
    # entropy_stats/gopher_repetition/c4_rules, drift via
    # embedding_drift_psi, LM scoring via ccnet_buckets, percentiles
    # via hist_quantiles; the promoted set itself carries the dedup
    # (substrings/lines/edit), selection (doremi/unimax/data_budget/
    # kcenter), and semantic families.  The two late metric rows
    # (minhash_precision, minhash_band_efficiency) queue for the r13
    # pool — minhash_recall anchors that family in-window meanwhile.
    # test_sql_registry.py re-pins after the reorder.
    #
    # ROUND-13 ROTATION (EXECUTED this round, as staged r12): TWENTY-ONE
    # promotions — the two r11 late metric rows (minhash_precision,
    # minhash_band_efficiency), the fifteen staged r12-added oracled
    # entries, plus the late-added embed_quantize (the staged 17-entry
    # note predates it) — all ×3-SF parity-proven with zero driver rows
    # until now.  Demoted eighteen multi-green holdovers (green rounds
    # in parentheses), families re-anchored: ann_recall (r8-r12, five
    # rows — ANN recall anchored by ann_pq_recall + minhash_recall
    # in-window), snapshot_diff, minhash_pairs_portable,
    # simhash_pairs_portable (r9-r12 — dedup-LSH anchored by
    # minhash_recall + the promoted precision/band_efficiency/decontam),
    # q21_waiting_suppliers (r7-r12), dup_components, embed_neardup,
    # pii_redact, corpus_filter (nine rows each — quality anchored by
    # the Gopher/C4 batteries + quality_classifier + the promoted
    # threshold_sweep/domain_quality_rollup), bpe_segment_words,
    # bpe_encode_docs, tokenizer_fertility (r10-r12 — tokenizers
    # anchored by bpe_train_merges + the four promoted unigram rows),
    # phrase_match (retrieval anchored by retrieval_pairs + the promoted
    # sentence_chunk/crop_pairs), temperature_mix_weights,
    # dedup_keep_best, embedding_drift_psi (r10-r12), and one of each
    # twice-green pair: gopher_audit (gopher_rules stays) and
    # dsir_sample (dsir_weights stays).  test_sql_registry.py re-pins
    # the representative set and the all-oracled invariant.
    #
    # ROUND-14 ROTATION (EXECUTED this round, as staged r13 — the staged
    # note's header miscounted itself "EIGHTEEN"; the pool was and is
    # TWENTY-ONE entries): promoted all 21 r13-added oracled entries
    # (bitext_recall, tokenizer_compare, moore_lewis, ul2_mix,
    # dataset_card, sft_pack, soft_dedup, dpo_pairs, ann_hubness,
    # best_of_n, cluster_profile, simhash_recall, winnow_recall,
    # dedup_manifest, jaccard_histogram, corpus_overlap,
    # epoch_decay_curve, bloom_fpr_curve, cms_error_curve,
    # lsh_geometry_sweep, shingle_df_histogram) in ONE wave — family
    # coverage holds without a split because the pool itself carries
    # anchors for every family it displaces.  Demoted twenty-one
    # multi-green holdovers (green rounds in parentheses), families
    # re-anchored: minhash_recall, knn_accuracy, dup_cluster_stats
    # (r9-r13, five rows each — LSH quality anchored by in-window
    # minhash_precision/band_efficiency + the promoted simhash_recall/
    # winnow_recall/lsh_geometry_sweep; ANN quality by ann_pq_recall +
    # the promoted bitext_recall/ann_hubness; dedup DQ by the promoted
    # dedup_manifest/soft_dedup/jaccard_histogram + dataset_card's
    # dup-rate section), bpe_train_merges (r9-r13 — the promoted
    # tokenizer_compare composes the full BPE train+segment chain),
    # dsir_weights, gopher_rules, split_leakage, ccnet_buckets
    # (r11-r13 — selection gains moore_lewis, quality stays anchored by
    # quality_classifier/gopher_repetition/kn_score/threshold_sweep,
    # leakage DQ by dataset_card + domain_quality_rollup), and the
    # thirteen twice-green r12 promotions dedup_substrings, dedup_lines,
    # unimax_alloc, data_budget_plan (epoch_decay_curve sweeps its
    # formula), quota_sample, c4_rules, zipf_stats, heaps_growth,
    # pack_efficiency (packing anchored by the promoted sft_pack),
    # domain_concentration (corpus_overlap reads the same inter-source
    # structure), hist_quantiles, prototypicality (cluster_profile
    # composes the same portable centroids + assignment),
    # kcenter_coreset (semantic selection anchored by in-window
    # mmr_select).  test_sql_registry.py re-pins the representative set
    # and the all-oracled invariant.
    #
    # ROUND-15 ROTATION (EXECUTED this round, as staged r14): promoted
    # the ELEVEN r14-added oracled entries (all ×3-SF parity-proven
    # locally, zero driver rows until now) — retrieval_ndcg, rrf_ndcg,
    # chat_assemble, chat_pack, tokenizer_compare_eqv, grpo_advantage,
    # kanon_audit, cdc_dedup_curve, contrastive_triplets,
    # embed_dim_stats, embed_pca_top — in one wave.  Demoted the ELEVEN
    # most-tenured multi-green holdovers: the four thrice-green r11
    # promotions (ann_pq_topk, ann_pq_recall — ANN quality stays
    # anchored by in-window ann_hubness/bitext_recall plus the incoming
    # contrastive_triplets/embed_* rows; cms_heavy_hitters,
    # bloom_contamination — sketches/decontam anchored by in-window
    # cms_error_curve/bloom_fpr_curve/minhash_decontam) and the seven
    # twice-green r12 promotions (edit_neardup — dedup anchored by
    # dedup_manifest/jaccard_histogram/lsh_geometry_sweep + the incoming
    # cdc_dedup_curve; quality_classifier, gopher_repetition,
    # entropy_stats — quality anchored by kn_score/threshold_sweep/
    # domain_quality_rollup; doremi_weights — mixing anchored by
    # epoch_decay_curve/corpus_overlap + the incoming
    # tokenizer_compare_eqv decision table; langid_confusion —
    # langid_rank stays; retrieval_pairs — retrieval anchored by
    # sentence_chunk/crop_pairs + the incoming retrieval_ndcg/rrf_ndcg
    # quality rows).  test_sql_registry.py re-pins the representative
    # set and the all-oracled invariant.
    #
    # ROUND-16 ROTATION (EXECUTED this round, as staged r15): promoted
    # ELEVEN entries —
    # the FOUR queued second-wave r14-added entries
    # (cluster_balanced_sample, rouge_screen, chat_lint,
    # contamination_ngram_curve) plus the SEVEN r15-added oracled
    # entries (multimodal_neardup_recall, media_features,
    # minhash_est_error, filter_ablation, embed_norm_hist,
    # semdedup_eps_curve, anneal_mix_plan) — all ×3-SF parity-proven,
    # zero oracled driver rows (media_features' past rows were the
    # weaker rows-only check).  Demote the ELEVEN most-tenured
    # multi-green holdovers, all thrice-green r13 promotions, families
    # re-anchored: minhash_precision, minhash_band_efficiency (LSH
    # quality anchored by minhash_decontam + simhash_recall/
    # winnow_recall/lsh_geometry_sweep + the incoming
    # minhash_est_error), span_corrupt, fim_transform (example
    # construction anchored by ul2_mix/sft_pack/dpo_pairs/best_of_n +
    # the chat/grpo rows), unigram_segment_words, unigram_fertility,
    # unigram_encode_docs (tokenizers anchored by unigram_train +
    # tokenizer_compare + tokenizer_compare_eqv), sentence_chunk,
    # crop_pairs (retrieval anchored by retrieval_ndcg/rrf_ndcg),
    # mmr_select (semantic selection anchored by the incoming
    # semdedup_eps_curve + cluster_balanced_sample), threshold_sweep
    # (quality anchored by domain_quality_rollup + kn_score/langid_rank
    # + the incoming filter_ablation).  Keep the family-anchor and
    # all-oracled invariants (test_sql_registry.py pins both).
    #
    # ROUND-17 ROTATION (EXECUTED this round, as staged r16 — the FULL
    # 18-entry wave, ten staged + the eight-key second wave, because
    # eight additional demotions hold every family anchor): promoted
    # best_of_n_curve, vocab_oov_curve, bpe_fertility_curve,
    # pack_waste_curve, blocklist_screen, priority_sample,
    # priority_sample_curve, rho_loss_select, heavy_hitter_phrases,
    # cross_source_dedup_matrix, matryoshka_curve, boilerplate_strip,
    # rm3_expansion, bm25_rm3_topk, label_noise_matrix,
    # ql_dirichlet_topk, temperature_mix_curve, quality_length_bias —
    # all ×3-SF parity-proven with zero driver rows until now.  Demoted
    # the ten named thrice-green holdovers (unigram_train, bitext_mine,
    # embed_quantize, kn_score, langid_rank, minhash_decontam,
    # domain_quality_rollup, tokenizer_compare, moore_lewis, ul2_mix)
    # plus eight thrice-green r13 promotions (best_of_n — anchored by
    # the incoming best_of_n_curve, which sweeps the same scored pool;
    # cluster_profile — similarity anchored by ann_hubness/
    # bitext_recall + the incoming matryoshka_curve/label_noise_matrix;
    # jaccard_histogram, soft_dedup — dedup DQ anchored by
    # dedup_manifest/cdc_dedup_curve/minhash_est_error + the incoming
    # cross_source_dedup_matrix; corpus_overlap, epoch_decay_curve —
    # mixing anchored by anneal_mix_plan + the incoming
    # priority_sample(+_curve)/temperature_mix_curve; bloom_fpr_curve,
    # cms_error_curve — sketch calibration anchored by
    # lsh_geometry_sweep + shingle_df_histogram + minhash_est_error).
    # test_sql_registry.py re-pins the representative set and the
    # all-oracled invariant.
    #
    # ROUND-18 STAGING: the SEVEN r17-added oracled entries
    # (retrieval_ndcg_rm3, semantic_decontam, ldiversity_audit,
    # ann_probe_recall_curve, needle_insert, decontam_report,
    # quality_calibration — all registered past-cap with ×3-SF parity;
    # the post-record four also need bench HEADLINE rows, deferred so
    # BENCH_LOCAL_r17 stayed one coherent record) promote next round;
    # demotion
    # candidates, all thrice-green by r17 if the window stays green:
    # the r14 cohort (bitext_recall, dataset_card, sft_pack, dpo_pairs,
    # ann_hubness, simhash_recall, winnow_recall, dedup_manifest,
    # lsh_geometry_sweep, shingle_df_histogram) — pick per-family so
    # every anchor in test_driver_window_covers_every_query_family
    # still holds.
    # === PROMOTED r15 (added r14): measured ranking quality for the
    #     retrieval family — nDCG@5 + MRR@5 of BM25 vs planted graded
    #     truth, and of hybrid RRF fusion vs exact-cosine truth ===
    "retrieval_ndcg": (LR.q_retrieval_ndcg, LR.SQL_RETRIEVAL_NDCG),
    "rrf_ndcg": (LR.q_rrf_ndcg, LR.SQL_RRF_NDCG),
    # --- promoted r15 (added r14): multi-turn conversation assembly
    #     (ordered role-tagged rendering + per-role loss masks) and
    #     whole-conversation packing under a token budget ---
    "chat_assemble": (LC.q_chat_assemble, LC.SQL_CHAT_ASSEMBLE),
    "chat_pack": (LC.q_chat_pack, LC.SQL_CHAT_PACK),
    # --- promoted r15 (added r14): the equal-budget tokenizer decision
    #     table — same word-type and effective-vocab budgets for BOTH
    #     families so fertility_delta compares families, not budgets ---
    "tokenizer_compare_eqv": (
        LTK.q_tokenizer_compare_eqv,
        LTK.SQL_TOKENIZER_COMPARE_EQV,
    ),
    # --- promoted r15 (added r14): group-relative advantage
    #     normalization (the public GRPO recipe) — z-scored rewards from
    #     the dpo_pairs/best_of_n scored pool; exact-decimal positivity
    #     test + fixed-order double numerator (advisor-r14 fix) ---
    "grpo_advantage": (LC.q_grpo_advantage, LC.SQL_GRPO_ADVANTAGE),
    # --- promoted r15 (added r14): k-anonymity quasi-identifier audit
    #     (Sweeney 2002) — the privacy-risk table next to pii_redact ---
    "kanon_audit": (LQ.q_kanon_audit, LQ.SQL_KANON_AUDIT),
    # --- promoted r15 (added r14): content-defined-chunking dedup
    #     sizing table (FastCDC family) — md5-portable boundaries,
    #     storage-dedup ratio at three mask widths, one gram pass ---
    "cdc_dedup_curve": (LD.q_cdc_dedup_curve, LD.SQL_CDC_DEDUP_CURVE),
    # --- promoted r15 (added r14): ANN-mined hard contrastive triplets
    #     over the portable-IVF candidate set — cluster-scoped
    #     equi-joins, one conditional max-struct aggregate ---
    "contrastive_triplets": (
        LS.q_contrastive_triplets,
        LS.SQL_CONTRASTIVE_TRIPLETS,
    ),
    # --- promoted r15 (added r14): per-dimension embedding diagnostics
    #     and the exact-integer power-iteration top principal direction
    #     (anisotropy report) ---
    "embed_dim_stats": (LS.q_embed_dim_stats, LS.SQL_EMBED_DIM_STATS),
    "embed_pca_top": (LS.q_embed_pca_top, LS.SQL_EMBED_PCA_TOP),
    # === PROMOTED r16 (added r15): the MinHash ESTIMATOR calibration
    #     table — third leg of the LSH quality tripod (recall/precision
    #     measure the blocking; lsh_geometry_sweep prices geometry; this
    #     measures how far matches/H sits from exact J per decile,
    #     all-integer identities, tolerance-free oracle) ===
    "minhash_est_error": (LD.q_minhash_est_error, LD.SQL_MINHASH_EST_ERROR),
    # --- promoted r16 (added r15): the multimodal near-dup family's
    #     measured recall row — real BMP/WAV bytes decoded to
    #     exact-integer dHash signatures, the trio's shared pigeonhole
    #     candidate join (hamming<=6, sig_bits-aware chunk tiling)
    #     measured against exact all-pairs Hamming truth; fully oracled
    #     because the synthesis arithmetic is SQL-derivable from the
    #     embeddings table ---
    "multimodal_neardup_recall": (
        LMM.q_multimodal_neardup_recall,
        LMM.SQL_MULTIMODAL_NEARDUP_RECALL,
    ),
    # --- promoted r16 (added r15): the SemDeDup threshold SIZING sweep
    #     — per candidate eps, vectors the cluster-scoped
    #     keep-lowest-id rule would drop; a measured sizing curve,
    #     oracled via the portable quantizer ---
    "semdedup_eps_curve": (
        LS.q_semdedup_eps_curve,
        LS.SQL_SEMDEDUP_EPS_CURVE,
    ),
    # --- promoted r16 (added r15): the quality-filter ABLATION matrix
    #     — per-filter kill counts, unique/marginal kills, union kill;
    #     integer-threshold filters, tolerance-free oracle; the
    #     C4/Gopher-paper ablation convention as one corpus pass ---
    "filter_ablation": (LT.q_filter_ablation, LT.SQL_FILTER_ABLATION),
    # --- promoted r16 (added r14): DCLM-style cluster-balanced
    #     subsample over the portable clusters, and the two-phase
    #     pretrain+anneal mix allocation (the public midtraining
    #     recipe — exact-integer quality proxy, decimal-exact HQ test,
    #     integer-division allocations; tolerance-free oracles) ---
    "cluster_balanced_sample": (
        LS.q_cluster_balanced_sample,
        LS.SQL_CLUSTER_BALANCED_SAMPLE,
    ),
    "anneal_mix_plan": (LM.q_anneal_mix_plan, LM.SQL_ANNEAL_MIX_PLAN),
    # --- promoted r16 (added r14): self-instruct ROUGE-style
    #     instruction-dedup screen (max bigram recall vs any earlier
    #     doc, keep under 0.7) and the decontamination match-length
    #     sweep (8/13/20-gram contaminated-doc rates vs the benchmark
    #     split — a measured sizing curve) ---
    "rouge_screen": (LD.q_rouge_screen, LD.SQL_ROUGE_SCREEN),
    "contamination_ngram_curve": (
        LD.q_contamination_ngram_curve,
        LD.SQL_CONTAMINATION_NGRAM_CURVE,
    ),
    # --- promoted r16 (oracled r15, rows-only since r2): the
    #     mapInPandas feature plumbing demo — byte stats of the
    #     document's UTF-8 payload, ANSI-SQL-reproducible now that
    #     byte_mean is emitted unrounded (exact int sum / exact len =
    #     one IEEE division, bit-identical cross-engine) ---
    "media_features": (LMM.q_media_features, LMM.SQL_MEDIA_FEATURES),
    # --- promoted r16 (added r14): conversation-data validity report
    #     (role alternation / first-last roles / empty turns /
    #     singletons) — the DQ gate before chat_assemble ---
    "chat_lint": (LC.q_chat_lint, LC.SQL_CHAT_LINT),
    # --- promoted r16 (added r15): per-vector normalization-drift
    #     histogram (exact micro-unit squared-L2 buckets) — the
    #     per-vector complement of embed_dim_stats ---
    "embed_norm_hist": (LS.q_embed_norm_hist, LS.SQL_EMBED_NORM_HIST),
    # === PROMOTED r14: the 21 r13-added oracled entries collect
    #     their first external driver rows (all sf0.001+sf0.01
    #     parity-proven locally since r13) ===
    # --- promoted r14 (added r13): mined-pair recall of the IVF-fed
    #     bitext path (the 100 TB configuration — cluster-scoped
    #     candidate equi-joins, never the cross product) vs the exact
    #     all-pairs path; fully oracled via the md5-portable coarse
    #     quantizer ---
    "bitext_recall": (LS.q_bitext_recall, LS.SQL_BITEXT_RECALL),
    # --- promoted r14 (added r13): datasheet-style
    #     report card (Gebru et al. 2021) — volume / length quantiles /
    #     exact-dup rate / language+source shares / mean quality as one
    #     tidy frame; one narrow projection + four bounded aggregates ---
    "dataset_card": (LQ.q_dataset_card, LQ.SQL_DATASET_CARD),
    # --- promoted r14 (added r13): SFT packing with
    #     loss-mask accounting — hash-cut (prompt, response) examples
    #     packed per source, masked vs loss-bearing token split per
    #     pack ---
    "sft_pack": (LC.q_sft_pack, LC.SQL_SFT_PACK),
    # --- promoted r14 (added r13): DPO preference-pair
    #     construction — per pseudo-prompt group argmax/argmin of a
    #     lexical-diversity score with a margin floor; one max/min-struct
    #     hash aggregate, no window ---
    "dpo_pairs": (LC.q_dpo_pairs, LC.SQL_DPO_PAIRS),
    # --- promoted r14 (added r13): k-occurrence hubness
    #     audit of the portable IVF index (Radovanović 2010) — top hub
    #     vectors + antihub dead-zone fraction, every other vector as a
    #     query ---
    "ann_hubness": (LS.q_ann_hubness, LS.SQL_ANN_HUBNESS),
    # --- promoted r14 (added r13): SimHash recall vs
    #     exact Jaccard truth — closes the quality-metric asymmetry with
    #     the MinHash family (same %2 subset, same truth set) ---
    "simhash_recall": (LD.q_simhash_recall, LD.SQL_SIMHASH_RECALL),
    # --- promoted r14 (added r13): winnowing recall vs
    #     the same exact-Jaccard truth — the THIRD fingerprint family on
    #     the identical truth set (verbatim-run screen vs token near-dup
    #     truth; the gap is the measurement) ---
    "winnow_recall": (LD.q_winnow_recall, LD.SQL_WINNOW_RECALL),
    # --- promoted r14 (added r13): deletion lineage of
    #     the layered exact→near dedup run — (dropped, keeper, reason),
    #     the audit artifact shipped next to a deduped corpus ---
    "dedup_manifest": (LD.q_dedup_manifest, LD.SQL_DEDUP_MANIFEST),
    # --- promoted r14 (added r13): LSH band-geometry
    #     tuning table — candidate volume, recall, and candidate-stream
    #     precision per (bands×rows) split of a fixed 16-hash budget,
    #     all on the same exact-Jaccard truth ---
    "lsh_geometry_sweep": (LD.q_lsh_geometry_sweep, LD.SQL_LSH_GEOMETRY_SWEEP),
    # --- promoted r14 (added r13): shingle doc-freq
    #     histogram on power-of-two buckets — the evidence the
    #     max_doc_freq caps and CMS width are tuned against ---
    "shingle_df_histogram": (
        LD.q_shingle_df_histogram,
        LD.SQL_SHINGLE_DF_HISTOGRAM,
    ),
    # === PROMOTED r17 (EXECUTED as staged r16 — the full 18-entry
    #     wave: the TEN staged entries plus the EIGHT-key second wave;
    #     every family anchor re-verified, see ROUND-17 ROTATION note
    #     above and test_driver_window_covers_every_query_family) ===
    # --- added r15 (past-cap; r17 promotion pool — the four
    #     second-wave sizing/scaling curves, ×3-SF parity-proven, zero
    #     driver rows): the rejection-sampling inference-scaling curve
    #     (mean best-of-first-N reward per N over the dpo/best_of_n
    #     scored pool; exact micro-unit integer maxes and one fixed
    #     two-division mean) ---
    "best_of_n_curve": (LC.q_best_of_n_curve, LC.SQL_BEST_OF_N_CURVE),
    # --- added r15 (past-cap; r17 pool second wave): the vocabulary-
    #     budget sizing sweep — covered mass + OOV rate per top-V cut;
    #     the seventh measured sizing curve ---
    "vocab_oov_curve": (LT.q_vocab_oov_curve, LT.SQL_VOCAB_OOV_CURVE),
    # --- added r15 (past-cap; r17 pool second wave): the BPE
    #     merge-budget sizing curve — fertility at 0/2/4/8 merges from
    #     one training run; the eighth measured sizing curve ---
    "bpe_fertility_curve": (
        LTK.q_bpe_fertility_curve,
        LTK.SQL_BPE_FERTILITY_CURVE,
    ),
    # --- added r15 (past-cap; r17 pool second wave): the context-length
    #     sizing sweep for sequence packing — padding/straddle/fill per
    #     candidate context from one shared prefix sum; the ninth
    #     measured sizing curve ---
    "pack_waste_curve": (LC.q_pack_waste_curve, LC.SQL_PACK_WASTE_CURVE),
    # --- added r16 (past-cap; r17 promotion pool): C4-style blocklist
    #     gate calibration (word-boundary term hits per source; exact
    #     integer kill table) ---
    "blocklist_screen": (LT.q_blocklist_screen, LT.SQL_BLOCKLIST_SCREEN),
    # --- added r16 (past-cap; r17 pool): priority sampling (Duffield-
    #     Lund-Thorup 2007) — deterministic weighted sample without
    #     replacement + the unbiased subset-sum estimator; md5-uniform
    #     and priority are single IEEE divisions (portable, no
    #     transcendental) ---
    "priority_sample": (LM.q_priority_sample, LM.SQL_PRIORITY_SAMPLE),
    # --- added r16 (past-cap; r17 pool): the sample-size sizing sweep
    #     for priority sampling — DLT total-weight estimate vs exact
    #     total per candidate k from ONE scored pass; micro-unit
    #     integer sums (order-free); the TENTH measured sizing curve ---
    "priority_sample_curve": (
        LM.q_priority_sample_curve,
        LM.SQL_PRIORITY_SAMPLE_CURVE,
    ),
    # --- added r16 (past-cap; r17 pool): RHO-style learnability
    #     selection — excess loss of the current (trained-on-everything)
    #     char-bigram LM over the holdout-clean reference LM, top-32
    #     hard-but-learnable held-out docs ---
    "rho_loss_select": (LT.q_rho_loss_select, LT.SQL_RHO_LOSS_SELECT),
    # --- added r16 (past-cap; r17 pool): corpus-wide memorization/
    #     boilerplate screen — top word 8-grams by distinct-document
    #     frequency (the actual phrases, next to the hashed
    #     shingle_df_histogram) ---
    "heavy_hitter_phrases": (
        LT.q_heavy_hitter_phrases,
        LT.SQL_HEAVY_HITTER_PHRASES,
    ),
    # --- added r16 (past-cap; r17 pool): exact-dup concentration
    #     source x source (dup groups + pair counts per unordered source
    #     pair; diagonal = intra-source) — the dedup triage table ---
    "cross_source_dedup_matrix": (
        LD.q_cross_source_dedup_matrix,
        LD.SQL_CROSS_SOURCE_DEDUP_MATRIX,
    ),
    # --- added r16 (past-cap; r17 pool): embedding truncation-dimension
    #     sizing sweep (Matryoshka, Kusupati et al. 2022) — cosine
    #     fidelity + top-1 agreement per prefix dim on a deterministic
    #     stride pair sample; micro-unit integer error sums (order-
    #     free); the ELEVENTH measured sizing curve ---
    "matryoshka_curve": (
        LS.q_matryoshka_curve,
        LS.SQL_MATRYOSHKA_CURVE,
    ),
    # --- added r16 (past-cap; r17 pool): per-source boilerplate-line
    #     removal (CCNet §3.1 / RefinedWeb pre-dedup pass) — line
    #     doc-frequency verdict per source, position-ordered reassembly;
    #     boilerplate PLANTED deterministically (header/footer stripped
    #     at ratio 1.0, PROMO line kept at ~0.5 < tau), mirrored in SQL ---
    "boilerplate_strip": (
        LT.q_boilerplate_strip,
        LT.SQL_BOILERPLATE_STRIP,
    ),
    # --- added r16 (past-cap; r17 pool): RM3 pseudo-relevance feedback
    #     (Lavrenko & Croft 2001; Abdul-Jaleel et al. 2004) — the
    #     expansion-term table (NANO-unit integer weights, exact
    #     order-free ranking key) and the full two-pass weighted-BM25
    #     re-retrieval built on it ---
    "rm3_expansion": (LR.q_rm3_expansion, LR.SQL_RM3_EXPANSION),
    "bm25_rm3_topk": (LR.q_bm25_rm3_topk, LR.SQL_BM25_RM3_TOPK),
    # --- added r16 (past-cap; r17 pool): class-conditional label-noise
    #     count matrix (confident learning, Northcutt et al. 2021) with
    #     the 5-NN vote as predictor — which class leaks into which,
    #     next to knn_accuracy's single number; integer cells ---
    "label_noise_matrix": (
        LS.q_label_noise_matrix,
        LS.SQL_LABEL_NOISE_MATRIX,
    ),
    # --- added r16 (past-cap; r17 pool): Dirichlet query-likelihood
    #     ranking (Zhai & Lafferty 2001) — the LM-based ranker next to
    #     BM25, same sparse broadcast-pruned postings shape, same
    #     output shape (drops into rrf_fuse) ---
    "ql_dirichlet_topk": (
        LR.q_ql_dirichlet_topk,
        LR.SQL_QL_DIRICHLET_TOPK,
    ),
    # --- added r16 (past-cap; r17 pool): the α-sweep behind
    #     temperature_mix_weights (mT5/XLM-R §3.1) — mix flatness vs
    #     max tail up-sample per candidate α over a PLANTED power-law
    #     source skew (micro-unit integer weights; the TWELFTH measured
    #     sizing curve) ---
    "temperature_mix_curve": (
        LM.q_temperature_mix_curve,
        LM.SQL_TEMPERATURE_MIX_CURVE,
    ),
    # --- added r16 (past-cap; r17 pool): length-bias audit of the
    #     quality gate — per length bucket, the composite score
    #     decomposed into length term vs content-only terms next to the
    #     kill rate (the known length-correlation failure mode of
    #     quality classifiers); one narrow pass, micro-unit integers ---
    "quality_length_bias": (
        LT.q_quality_length_bias,
        LT.SQL_QUALITY_LENGTH_BIAS,
    ),
    # ---------- driver 50-query window ends here ----------
    # --- added r17 (past-cap; r18 promotion pool): the ranker DECISION
    #     TABLE — nDCG@5 + MRR@5 for plain BM25, two-pass BM25+RM3, and
    #     Dirichlet QL against a shared tf-mass graded truth with
    #     linear gain (r16 verdict item 6: the RM3/QL rankers shipped
    #     with exact oracles but no measured ranking-quality row) ---
    "retrieval_ndcg_rm3": (
        LR.q_retrieval_ndcg_rm3,
        LR.SQL_RETRIEVAL_NDCG_RM3,
    ),
    # --- added r17 (past-cap; r18 pool): embedding-space
    #     decontamination sweep — the paraphrase-robust leg of the
    #     decontamination family (planted cos~0.97 leaks caught at
    #     0.90/0.95, excluded at 0.99; cluster-scoped via the shared
    #     portable quantizer, never all-pairs) ---
    "semantic_decontam": (
        LS.q_semantic_decontam,
        LS.SQL_SEMANTIC_DECONTAM,
    ),
    # --- added r17 (past-cap; r18 pool): distinct l-diversity audit
    #     (Machanavajjhala et al. 2007) — the attribute-disclosure
    #     complement of kanon_audit; one corpus aggregate + bounded
    #     l sweep, exact integers ---
    "ldiversity_audit": (
        LQ.q_ldiversity_audit,
        LQ.SQL_LDIVERSITY_AUDIT,
    ),
    # --- added r17 POST-RECORD (past-cap; r18 pool, bench row ALSO
    #     deferred to r18 so BENCH_LOCAL_r17 stays one coherent run):
    #     the IVF probe-count tuning curve — recall@5 + candidate
    #     volume per n_probe from ONE scoring pass at the largest
    #     budget (the faiss nprobe trade-off; the 13th measured sizing
    #     curve) ---
    "ann_probe_recall_curve": (
        LS.q_ann_probe_recall_curve,
        LS.SQL_ANN_PROBE_RECALL_CURVE,
    ),
    # --- added r17 POST-RECORD (past-cap; r18 pool, bench row deferred
    #     to r18): needle-in-a-haystack long-context eval construction —
    #     the NIAH (context, depth) grid as deterministic string
    #     surgery; reconstruction property test-pinned ---
    "needle_insert": (
        LC.q_needle_insert,
        LC.SQL_NEEDLE_INSERT,
    ),
    # --- added r17 POST-RECORD (past-cap; r18 pool, bench row deferred
    #     to r18): the four-eyes decontamination DECISION TABLE — dirty-
    #     eval rates for 13-gram-exact / MinHash-J0.5 / 3-gram-
    #     containment-0.8 on ONE unified %97 split and denominator (the
    #     GPT-3 appendix-C reading; semantic_decontam reports the
    #     embedding leg on its own table) ---
    "decontam_report": (
        LD.q_decontam_report,
        LD.SQL_DECONTAM_REPORT,
    ),
    # --- added r17 POST-RECORD (past-cap; r18 pool, bench row deferred
    #     to r18): calibration (reliability) table for the seed-trained
    #     NB quality classifier vs the heuristic gate — per log-odds
    #     bin: doc mass, gate keep rate, exact micro-unit mean score
    #     (the check run before thresholding a classifier; on this
    #     corpus it measures real NON-monotone disagreement, which is
    #     the point) ---
    "quality_calibration": (
        LT.q_quality_calibration,
        LT.SQL_QUALITY_CALIBRATION,
    ),
    # --- added r17 POST-RECORD (past-cap; r18 pool, bench row deferred
    #     to r18): t-closeness audit (Li et al. 2007) — the value-SKEW
    #     leg completing the privacy tripod (kanon = class size,
    #     ldiversity = value count, this = TVD vs the global sensitive
    #     distribution); exact integer cross-multiplied t verdicts,
    #     one corpus aggregate + bounded cell-frame stages ---
    "t_closeness_audit": (
        LQ.q_t_closeness_audit,
        LQ.SQL_T_CLOSENESS_AUDIT,
    ),
    # --- added r17 POST-RECORD (past-cap; r18 pool, bench row deferred
    #     to r18): distinct-n diversity table (Li et al. 2016 /
    #     Texygen) — per-(source, n) n-gram type/token and hapax
    #     ratios, the mode-collapse screen for synthetic data pools;
    #     one corpus pass, exact two-level aggregate ---
    "distinct_ngrams": (
        LT.q_distinct_ngrams,
        LT.SQL_DISTINCT_NGRAMS,
    ),
    # --- demoted r17 (see ROUND-17 ROTATION note above): the ten
    #     named thrice-green holdovers plus eight second-wave
    #     demotions (best_of_n, cluster_profile, jaccard_histogram,
    #     soft_dedup, corpus_overlap, epoch_decay_curve,
    #     bloom_fpr_curve, cms_error_curve — all thrice-green
    #     r14+r15+r16); every one re-proven locally each session by
    #     the default sf0.001+sf0.1 parity suites ---
    # --- first driver rows (promoted r13): interpolated Kneser-Ney
    #     word-bigram LM scoring (Kneser & Ney 1995; the KenLM/CCNet
    #     smoothing family), trained leakage-free on the non-src0 slice
    #     so the oracle exercises every unseen-bigram/context/OOV
    #     fallback path ---
    "kn_score": (LT.q_kn_score, LT.SQL_KN_SCORE),
    # --- first driver rows (promoted r13): TRAINED language ID by
    #     char-trigram rank profiles (Cavnar & Trenkle 1994) with an
    #     honest even/odd held-out split ---
    "langid_rank": (LT.q_langid_rank, LT.SQL_LANGID_RANK),
    # --- first driver rows (promoted r13): cross-corpus MinHash
    #     decontamination (the GPT-3/Llama fuzzy train-vs-benchmark
    #     sweep) — banded LSH BETWEEN two corpora, exact-Jaccard
    #     verified, md5-portable end-to-end ---
    "minhash_decontam": (LD.q_minhash_decontam, LD.SQL_MINHASH_DECONTAM),
    # --- first driver rows (promoted r13): per-domain quality triage
    #     rollup and the quality-gate calibration sweep (docs + token
    #     mass kept per candidate threshold, one corpus pass) ---
    "domain_quality_rollup": (
        LQ.q_domain_quality_rollup,
        LQ.SQL_DOMAIN_QUALITY_ROLLUP,
    ),
    # --- first driver rows (promoted r13): unigram-LM tokenizer family
    #     (Kudo 2018, the SentencePiece model class) — Viterbi hard-EM
    #     over the bounded word-type table, JVM-side DP fold with an
    #     unrolled-CTE DuckDB twin ---
    "unigram_train": (LTK.q_unigram_train, LTK.SQL_UNIGRAM_TRAIN),
    # --- first driver rows (promoted r13): margin-based bitext mining
    #     (Artetxe & Schwenk 2019, the LASER/CCMatrix recipe) — exact
    #     oracle mode; the ANN-fed scale path is a separate rows-only
    #     recall metric ---
    "bitext_mine": (LS.q_bitext_mine, LS.SQL_BITEXT_MINE),
    # --- first driver row (promoted r13): symmetric int8 embedding
    #     quantization (faiss QT_8bit scheme) with exact
    #     reconstruction-error accounting; emits the unrounded scale
    #     (advisor-r12 fix) ---
    "embed_quantize": (LS.q_embed_quantize, LS.SQL_EMBED_QUANTIZE),
    # --- promoted r14 (added r13): the tokenizer
    #     decision table — per-source fertility + OOV rate for BPE vs
    #     unigram-LM trained on the same corpus under the same word
    #     tokenization, with the fertility delta; one shared occurrence
    #     aggregate against both trained segmentation tables ---
    "tokenizer_compare": (LTK.q_tokenizer_compare, LTK.SQL_TOKENIZER_COMPARE),
    # --- promoted r14 (added r13): Moore-Lewis 2010
    #     cross-entropy-difference selection — in-domain vs general
    #     char-bigram LM score delta, the perplexity-space complement
    #     of the DSIR hashed-feature importance pair ---
    "moore_lewis": (LM.q_moore_lewis, LM.SQL_MOORE_LEWIS),
    # --- promoted r14 (added r13): UL2 mixture-of-
    #     denoisers (Tay et al. 2022) — hash-assigned R/X/S paradigms
    #     composing span_corrupt at two densities plus a prefix-LM
    #     split, paradigm tokens prepended ---
    "ul2_mix": (LC.q_ul2_mix, LC.SQL_UL2_MIX),
    # --- promoted r14 (added r13): best-of-N rejection
    #     sampling — dpo_pairs' grouping/scoring with the top-3 kept
    #     (rnk 1 ≡ dpo chosen, shared tiebreak) ---
    "best_of_n": (LC.q_best_of_n, LC.SQL_BEST_OF_N),
    # --- promoted r14 (added r13): embedding-space
    #     composition per portable-centroid cluster — corpus share +
    #     label dominance (SemDeDup/DCLM cluster analysis) ---
    "cluster_profile": (LS.q_cluster_profile, LS.SQL_CLUSTER_PROFILE),
    # --- promoted r14 (added r13): Jaccard bin
    #     histogram over the candidate-pair stream — the threshold-
    #     tuning cliff curve ---
    "jaccard_histogram": (LD.q_jaccard_histogram, LD.SQL_JACCARD_HISTOGRAM),
    # --- promoted r14 (added r13): soft dedup — the
    #     reweighting alternative to hard near-dedup (1/cluster_size
    #     sampling weights over the dup_components Jaccard graph, exact
    #     integer effective-mass accounting) ---
    "soft_dedup": (LD.q_soft_dedup, LD.SQL_SOFT_DEDUP),
    # --- promoted r14 (added r13): cross-source shingle
    #     containment matrix — inter-source duplication read before
    #     mixing corpora ---
    "corpus_overlap": (LM.q_corpus_overlap, LM.SQL_CORPUS_OVERLAP),
    # --- promoted r14 (added r13): the repeat-epoch
    #     effective-token CURVE (data_budget_plan's formula swept over
    #     1/2/4/8/16 epochs) ---
    "epoch_decay_curve": (LM.q_epoch_decay_curve, LM.SQL_EPOCH_DECAY_CURVE),
    # --- promoted r14 (added r13): measured Bloom sizing
    #     table — realized FPR + fill at four widths on the actual key
    #     distribution, one md5 per (row, key) re-bucketed per width ---
    "bloom_fpr_curve": (LSK.q_bloom_fpr_curve, LSK.SQL_BLOOM_FPR_CURVE),
    # --- promoted r14 (added r13): measured CMS sizing
    #     table over the shingle stream — realized overestimate
    #     distribution at three widths, sketch built from the exact
    #     count table (identical arithmetic, |vocab|-grain sweep) ---
    "cms_error_curve": (LSK.q_cms_error_curve, LSK.SQL_CMS_ERROR_CURVE),
    # --- demoted r16 (see ROUND-16 ROTATION note above): the eleven
    #     thrice-green r13 promotions; every one re-proven locally each
    #     session by the default sf0.001+sf0.1 parity suites ---
    "minhash_precision": (LD.q_minhash_precision, LD.SQL_MINHASH_PRECISION),
    "minhash_band_efficiency": (
        LD.q_minhash_band_efficiency,
        LD.SQL_MINHASH_BAND_EFFICIENCY,
    ),
    "mmr_select": (LS.q_mmr_select, LS.SQL_MMR_SELECT),
    "threshold_sweep": (LT.q_threshold_sweep, LT.SQL_THRESHOLD_SWEEP),
    "span_corrupt": (LC.q_span_corrupt, LC.SQL_SPAN_CORRUPT),
    "fim_transform": (LC.q_fim_transform, LC.SQL_FIM_TRANSFORM),
    "unigram_segment_words": (
        LTK.q_unigram_segment_words,
        LTK.SQL_UNIGRAM_SEGMENT,
    ),
    "unigram_fertility": (
        LTK.q_unigram_fertility,
        LTK.SQL_UNIGRAM_FERTILITY,
    ),
    "unigram_encode_docs": (
        LTK.q_unigram_encode_docs,
        LTK.SQL_UNIGRAM_ENCODE,
    ),
    "sentence_chunk": (LR.q_sentence_chunk, LR.SQL_SENTENCE_CHUNK),
    "crop_pairs": (LR.q_crop_pairs, LR.SQL_CROP_PAIRS),
    # --- demoted r15 (see ROUND-15 ROTATION note above): the four
    #     thrice-green r11 promotions and seven twice-green r12
    #     promotions; every one re-proven locally each session by the
    #     default sf0.001+sf0.1 parity suites ---
    "ann_pq_topk": (LS.q_ann_pq_topk, LS.SQL_ANN_PQ_TOPK),
    "ann_pq_recall": (LS.q_ann_pq_recall, LS.SQL_ANN_PQ_RECALL),
    "cms_heavy_hitters": (LSK.q_cms_heavy_hitters, LSK.SQL_CMS_HEAVY_HITTERS),
    "bloom_contamination": (
        LD.q_bloom_contamination,
        LD.SQL_BLOOM_CONTAMINATION,
    ),
    "edit_neardup": (LD.q_edit_neardup, LD.SQL_EDIT_NEARDUP),
    "quality_classifier": (
        LT.q_quality_classifier,
        LT.SQL_QUALITY_CLASSIFIER,
    ),
    "doremi_weights": (LM.q_doremi_weights, LM.SQL_DOREMI_WEIGHTS),
    "gopher_repetition": (LT.q_gopher_repetition, LT.SQL_GOPHER_REPETITION),
    "entropy_stats": (LT.q_entropy_stats, LT.SQL_ENTROPY_STATS),
    "langid_confusion": (LT.q_langid_confusion, LT.SQL_LANGID_CONFUSION),
    "retrieval_pairs": (LR.q_retrieval_pairs, LR.SQL_RETRIEVAL_PAIRS),
    # --- demoted r14 (see ROUND-14 ROTATION note above): twenty-one
    #     multi-green holdovers; every one re-proven locally each
    #     session by the default sf0.001+sf0.1 parity suites ---
    "minhash_recall": (LD.q_minhash_recall, LD.SQL_MINHASH_RECALL),
    "knn_accuracy": (LS.q_knn_accuracy, LS.SQL_KNN_ACCURACY),
    "dup_cluster_stats": (LD.q_dup_cluster_stats, LD.SQL_DUP_CLUSTER_STATS),
    "bpe_train_merges": (LTK.q_bpe_train_merges, LTK.SQL_BPE_TRAIN_MERGES),
    "dsir_weights": (LM.q_dsir_weights, LM.SQL_DSIR_WEIGHTS),
    "gopher_rules": (LT.q_gopher_rules, LT.SQL_GOPHER_RULES),
    "split_leakage": (LM.q_split_leakage, LM.SQL_SPLIT_LEAKAGE),
    "ccnet_buckets": (LT.q_ccnet_buckets, LT.SQL_CCNET_BUCKETS),
    "dedup_substrings": (LD.q_dedup_substrings, LD.SQL_DEDUP_SUBSTRINGS),
    "dedup_lines": (LD.q_dedup_lines, LD.SQL_DEDUP_LINES),
    "unimax_alloc": (LM.q_unimax_alloc, LM.SQL_UNIMAX_ALLOC),
    "data_budget_plan": (LM.q_data_budget_plan, LM.SQL_DATA_BUDGET_PLAN),
    "quota_sample": (LM.q_quota_sample, LM.SQL_QUOTA_SAMPLE),
    "c4_rules": (LT.q_c4_rules, LT.SQL_C4_RULES),
    "zipf_stats": (LT.q_zipf_stats, LT.SQL_ZIPF_STATS),
    "heaps_growth": (LT.q_heaps_growth, LT.SQL_HEAPS_GROWTH),
    "pack_efficiency": (LC.q_pack_efficiency, LC.SQL_PACK_EFFICIENCY),
    "domain_concentration": (
        LM.q_domain_concentration,
        LM.SQL_DOMAIN_CONCENTRATION,
    ),
    "hist_quantiles": (LQ.q_hist_quantiles, LQ.SQL_HIST_QUANTILES),
    "prototypicality": (LS.q_prototypicality, LS.SQL_PROTOTYPICALITY),
    "kcenter_coreset": (LS.q_kcenter_coreset, LS.SQL_KCENTER_CORESET),
    # --- demoted r12 (see rotation note above): twenty thrice-green
    #     r8/r9 holdovers; every one re-proven locally each session by
    #     the default sf0.001+sf0.1 parity suites ---
    "ann_ivf_topk_portable": (
        LS.q_ann_ivf_topk_portable,
        LS.SQL_ANN_IVF_TOPK_PORTABLE,
    ),
    "ann_ivf_recall_portable": (
        LS.q_ann_ivf_recall_portable,
        LS.SQL_ANN_IVF_RECALL_PORTABLE,
    ),
    "chunk_documents": (LR.q_chunk_documents, LR.SQL_CHUNK_DOCUMENTS),
    "bm25_topk": (LR.q_bm25_topk, LR.SQL_BM25_TOPK),
    "similar_docs_rrf": (LR.q_similar_docs_rrf, LR.SQL_SIMILAR_DOCS_RRF),
    "corpus_drift_psi": (LQ.q_corpus_drift_psi, LQ.SQL_CORPUS_DRIFT_PSI),
    "assign_splits": (LM.q_assign_splits, LM.SQL_ASSIGN_SPLITS),
    "assign_splits_grouped": (
        LM.q_assign_splits_grouped,
        LM.SQL_ASSIGN_SPLITS_GROUPED,
    ),
    "pack_texts": (LC.q_pack_texts, LC.SQL_PACK_TEXTS),
    "interleave_key": (LM.q_interleave_key, LM.SQL_INTERLEAVE_KEY),
    "fk_integrity": (LQ.q_fk_integrity, LQ.SQL_FK_INTEGRITY),
    "value_outliers": (LQ.q_value_outliers, LQ.SQL_VALUE_OUTLIERS),
    "profile_columns": (LQ.q_profile_columns, LQ.SQL_PROFILE_COLUMNS),
    "dedup_rate_report": (LD.q_dedup_rate_report, LD.SQL_DEDUP_RATE_REPORT),
    "text_clean": (LT.q_text_clean, LT.SQL_TEXT_CLEAN),
    "max_concurrency": (LQ.q_max_concurrency, LQ.SQL_MAX_CONCURRENCY),
    "doc_novelty": (LT.q_doc_novelty, LT.SQL_DOC_NOVELTY),
    "curriculum_buckets": (LM.q_curriculum_buckets, LM.SQL_CURRICULUM_BUCKETS),
    "lm_score_heldout": (LT.q_lm_score_heldout, LT.SQL_LM_SCORE_HELDOUT),
    "tfidf_cosine_pairs": (LS.q_tfidf_cosine_pairs, LS.SQL_TFIDF_COSINE_PAIRS),
    # --- demoted r11 (see rotation note above): seven thrice-green
    #     r8-holdovers (r8+r9+r10) and three four-row retained reps;
    #     every one re-proven locally each session by the default
    #     sf0.001+sf0.1 parity suites ---
    "shuffle_shards": (LM.q_shuffle_shards, LM.SQL_SHUFFLE_SHARDS),
    "knn_label_vote": (LS.q_knn_label_vote, LS.SQL_KNN_LABEL_VOTE),
    "vocab_oov": (LT.q_vocab_oov, LT.SQL_VOCAB_OOV),
    "quantile_filter": (LT.q_quantile_filter, LT.SQL_QUANTILE_FILTER),
    "lm_score": (LT.q_lm_score, LT.SQL_LM_SCORE),
    "tokenize_ids": (LTK.q_tokenize_ids, LTK.SQL_TOKENIZE_IDS),
    "ann_lsh_topk": (LS.q_ann_lsh_topk, LS.SQL_ANN_LSH_TOPK),
    "cohort_retention": (X.q_cohort_retention, X.SQL_COHORT_RETENTION),
    "mix_sources": (LM.q_mix_sources, LM.SQL_MIX_SOURCES),
    "pack_sequences": (LC.q_pack_sequences, LC.SQL_PACK_SEQUENCES),
    # --- demoted r13 (see rotation note above): eighteen multi-green
    #     holdovers — five-row ann_recall, the r9-cohort snapshot/
    #     portable-dedup rows, the nine-row r01-family reps, the r10
    #     cohort, and one of each twice-green r11 pair; every one
    #     re-proven locally each session by the default sf0.001+sf0.1
    #     parity suites ---
    "ann_recall": (LS.q_ann_recall, LS.SQL_ANN_RECALL),
    "snapshot_diff": (LQ.q_snapshot_diff, LQ.SQL_SNAPSHOT_DIFF),
    "minhash_pairs_portable": (
        LD.q_minhash_pairs_portable,
        LD.SQL_MINHASH_PAIRS_PORTABLE,
    ),
    "simhash_pairs_portable": (
        LD.q_simhash_pairs_portable,
        LD.SQL_SIMHASH_PAIRS_PORTABLE,
    ),
    "q21_waiting_suppliers": (T.q21_waiting_suppliers, T.SQL_Q21),
    "dup_components": (LD.q_dup_components, LD.SQL_DUP_COMPONENTS),
    "embed_neardup": (LS.q_embed_neardup, LS.SQL_EMBED_NEARDUP),
    "pii_redact": (LT.q_pii_redact, LT.SQL_PII_REDACT),
    "corpus_filter": (LT.q_corpus_filter, LT.SQL_CORPUS_FILTER),
    "bpe_segment_words": (LTK.q_bpe_segment_words, LTK.SQL_BPE_SEGMENT_WORDS),
    "bpe_encode_docs": (LTK.q_bpe_encode_docs, LTK.SQL_BPE_ENCODE_DOCS),
    "tokenizer_fertility": (
        LTK.q_tokenizer_fertility,
        LTK.SQL_TOKENIZER_FERTILITY,
    ),
    "phrase_match": (LR.q_phrase_match, LR.SQL_PHRASE_MATCH),
    "temperature_mix_weights": (
        LM.q_temperature_mix_weights,
        LM.SQL_TEMPERATURE_MIX_WEIGHTS,
    ),
    "dedup_keep_best": (LD.q_dedup_keep_best, LD.SQL_DEDUP_KEEP_BEST),
    "embedding_drift_psi": (
        LS.q_embedding_drift_psi,
        LS.SQL_EMBEDDING_DRIFT_PSI,
    ),
    "gopher_audit": (LT.q_gopher_audit, LT.SQL_GOPHER_AUDIT),
    "dsir_sample": (LM.q_dsir_sample, LM.SQL_DSIR_SAMPLE),
    # --- demoted r10 with three green rows each (r7+r8+r9); families
    #     stay anchored in-window (see rotation note above) ---
    "q7_volume_shipping": (T.q7_volume_shipping, T.SQL_Q7),
    "q9_product_profit": (T.q9_product_profit, T.SQL_Q9),
    "dedup_exact": (LD.q_dedup_exact, LD.SQL_DEDUP_EXACT),
    "dedup_incremental": (LD.q_dedup_incremental, LD.SQL_DEDUP_INCREMENTAL),
    "ngram_jaccard": (LD.q_ngram_jaccard, LD.SQL_NGRAM_JACCARD),
    "ann_topk": (LS.q_ann_topk, LS.SQL_ANN_TOPK),
    "lang_id_counts": (LT.q_lang_id_counts, LT.SQL_LANG_ID_COUNTS),
    # --- demoted r9 in bpe_train_merges' promotion (green r6/r7/r8) ---
    "tfidf_top_terms": (LS.q_tfidf_top_terms, LS.SQL_TFIDF_TOP_TERMS),
    # --- rotated out r9: the perennial rows-only entries (no_oracle
    #     since r2).  WHY each remains rows-only (r14 verdict item 7 —
    #     the full census of all 10 rows-only entries):
    #     * minhash_pairs / simhash_pairs / ann_ivf_topk / ann_ivf_recall
    #       / semantic_dedup: engine-specific xxhash64/Lloyd fast paths,
    #       BY DESIGN — each has an md5-portable oracled twin
    #       (minhash_pairs_portable, simhash_pairs_portable,
    #       ann_ivf_topk_portable/_recall_portable, prototypicality/
    #       cluster_profile) carrying value correctness, plus ×3-SF
    #       goldens; re-expressing xxhash64 in SQL would mean abandoning
    #       the fast path the 100 TB design actually runs.
    #     * media_decode / media_frames: emitted aggregates average
    #       float lumas across rows (partial-aggregation-order-
    #       dependent), so no tolerance-free twin exists; goldens ×3 SF
    #       + the r15 ORACLED multimodal_neardup_recall row certify the
    #       decode chain and candidate machinery respectively.
    #     * image_phash/audio_fp/video_phash_neardup: float DCT / band-
    #       energy hashing (pandas-only); goldens ×3 SF pin the values
    #       and the oracled multimodal_neardup_recall row measures their
    #       shared pigeonhole join against exact Hamming truth.
    #     (media_features left this list r15 — unrounding byte_mean made
    #     it exactly SQL-expressible; see its oracled entry below.) ---
    "minhash_pairs": (LD.q_minhash_pairs, None),
    "simhash_pairs": (LD.q_simhash_pairs, None),
    "ann_ivf_topk": (LS.q_ann_ivf_topk, None),
    # media_features gained a full DuckDB twin r15 (unrounded exact-ratio
    # byte_mean over the ASCII corpus) — see the oracled tail below.
    "media_decode": (LMM.q_media_decode, None),
    # --- demoted r9 with two green rows each (r7 AND r8) under the
    #     current data regime; re-proven every run by the default
    #     sf0.001+sf0.1 parity suites ---
    "dedup_spans_intra": (LD.q_dedup_spans_intra, LD.SQL_DEDUP_SPANS_INTRA),
    "filter_audit": (LT.q_filter_audit, LT.SQL_FILTER_AUDIT),
    "q8_market_share": (T.q8_market_share, T.SQL_Q8),
    "q12_late_shipments": (T.q12_late_shipments, T.SQL_Q12),
    "q19_disjunctive_revenue": (T.q19_disjunctive_revenue, T.SQL_Q19),
    "q2_min_acctbal_supplier": (T.q2_min_acctbal_supplier, T.SQL_Q2),
    "q11_important_stock": (T.q11_important_stock, T.SQL_Q11),
    "q16_supplier_part_counts": (T.q16_supplier_part_counts, T.SQL_Q16),
    "q20_potential_promotion": (T.q20_potential_promotion, T.SQL_Q20),
    "token_stats_by_source": (LT.q_token_stats_by_source, LT.SQL_TOKEN_STATS_BY_SOURCE),
    "repetition_score": (LT.q_repetition_score, LT.SQL_REPETITION_SCORE),
    "contamination_check": (LD.q_contamination_check, LD.SQL_CONTAMINATION_CHECK),
    "winnow_overlap": (LD.q_winnow_overlap, LD.SQL_WINNOW_OVERLAP),
    "bpe_token_estimate": (LTK.q_bpe_token_estimate, LTK.SQL_BPE_TOKEN_ESTIMATE),
    "multimodal_meta": (LMM.q_multimodal_meta, LMM.SQL_MULTIMODAL_META),
    "extract_doc_stats": (LT.q_extract_doc_stats, LT.SQL_EXTRACT_DOC_STATS),
    "hll_accuracy": (X.q_hll_accuracy, X.SQL_HLL_ACCURACY),
    "hash_sample": (X.q_hash_sample, X.SQL_HASH_SAMPLE),
    "stratified_sample": (X.q_stratified_sample, X.SQL_STRATIFIED_SAMPLE),
    "dedup_spans": (LD.q_dedup_spans, LD.SQL_DEDUP_SPANS),
    "dedup_canonical": (LD.q_dedup_canonical, LD.SQL_DEDUP_CANONICAL),
    # --- demoted r7 with two green rows each (r02+r06 scalar batteries;
    #     r03+r06 TPC-H trio), the latest under the current data regime ---
    "analytic_funcs": (X.q_analytic_funcs, X.SQL_ANALYTIC_FUNCS),
    "array_funcs": (X.q_array_funcs, X.SQL_ARRAY_FUNCS),
    "grouping_sets": (X.q_grouping_sets, X.SQL_GROUPING_SETS),
    "null_funcs": (X.q_null_funcs, X.SQL_NULL_FUNCS),
    "frame_specs": (X.q_frame_specs, X.SQL_FRAME_SPECS),
    "fuzzy_match": (X.q_fuzzy_match, X.SQL_FUZZY_MATCH),
    "corr_subquery": (X.q_corr_subquery, X.SQL_CORR_SUBQUERY),
    "map_funcs": (X.q_map_funcs, X.SQL_MAP_FUNCS),
    "regexp_funcs": (X.q_regexp_funcs, X.SQL_REGEXP_FUNCS),
    "argmax_aggs": (X.q_argmax_aggs, X.SQL_ARGMAX_AGGS),
    "bit_funcs": (X.q_bit_funcs, X.SQL_BIT_FUNCS),
    "q4_priority_check": (T.q4_priority_check, T.SQL_Q4),
    "q13_customer_distribution": (T.q13_customer_distribution, T.SQL_Q13),
    "q22_global_sales_opportunity": (T.q22_global_sales_opportunity, T.SQL_Q22),
    # --- twice-proven math_funcs (r04 AND r05, post-regen); demoted ---
    "math_funcs": (X.q_math_funcs, X.SQL_MATH_FUNCS),
    # --- the 42 r5-window entries demoted with two green rows each, the
    #     latest (r05) already under the regenerated data ---
    "asof_join": (X.q_asof_join, X.SQL_ASOF_JOIN),
    "range_join": (X.q_range_join, X.SQL_RANGE_JOIN),
    "windowed_counts": (X.q_windowed_counts, X.SQL_WINDOWED_COUNTS),
    "pivot_events": (X.q_pivot_events, X.SQL_PIVOT_EVENTS),
    "percentiles": (X.q_percentiles, X.SQL_PERCENTILES),
    "union_by_name": (R.q_union_by_name, R.SQL_UNION_BY_NAME),
    "items_by_type": (R.q_items_by_type, R.SQL_ITEMS_BY_TYPE),
    "filter_length": (R.q_filter_length, R.SQL_FILTER_LENGTH),
    "project_sorted_cols": (R.q_project_sorted_cols, R.SQL_PROJECT_SORTED_COLS),
    "distinct_rows": (R.q_distinct_rows, R.SQL_DISTINCT_ROWS),
    "substr_trunc": (R.q_substr_trunc, R.SQL_SUBSTR_TRUNC),
    "flatten_struct": (R.q_flatten_struct, R.SQL_FLATTEN_STRUCT),
    "total_items_window": (R.q_total_items_window, R.SQL_TOTAL_ITEMS_WINDOW),
    "rownum_per_group": (R.q_rownum_per_group, R.SQL_ROWNUM_PER_GROUP),
    "order_by_kind": (R.q_order_by_kind, R.SQL_ORDER_BY_KIND),
    "row_to_json": (R.q_row_to_json, R.SQL_ROW_TO_JSON),
    "json_props_agg": (R.q_json_props_agg, R.SQL_JSON_PROPS_AGG),
    "q5_region_revenue": (R.q5_region_revenue, R.SQL_Q5),
    "q6_revenue_forecast": (T.q6_revenue_forecast, T.SQL_Q6),
    "q10_returned_customers": (T.q10_returned_customers, T.SQL_Q10),
    "q14_promo_share": (T.q14_promo_share, T.SQL_Q14),
    "q15_top_supplier": (T.q15_top_supplier, T.SQL_Q15),
    "q17_small_quantity_revenue": (T.q17_small_quantity_revenue, T.SQL_Q17),
    "q18_volume_customers": (T.q18_volume_customers, T.SQL_Q18),
    "brand_pricing": (R.q_brand_pricing, R.SQL_BRAND_PRICING),
    "rollup_sales": (R.q_rollup_sales, R.SQL_ROLLUP_SALES),
    "running_total": (R.q_running_total, R.SQL_RUNNING_TOTAL),
    "lag_events": (R.q_lag_events, R.SQL_LAG_EVENTS),
    "topk_per_group": (R.q_topk_per_group, R.SQL_TOPK_PER_GROUP),
    "semi_join": (X.q_semi_join, X.SQL_SEMI_JOIN),
    "anti_join": (X.q_anti_join, X.SQL_ANTI_JOIN),
    "intersect_keys": (X.q_intersect_keys, X.SQL_INTERSECT_KEYS),
    "except_keys": (X.q_except_keys, X.SQL_EXCEPT_KEYS),
    "count_distinct": (X.q_count_distinct, X.SQL_COUNT_DISTINCT),
    "unpivot_events": (X.q_unpivot_events, X.SQL_UNPIVOT_EVENTS),
    "try_cast_coerce": (X.q_try_cast_coerce, X.SQL_TRY_CAST_COERCE),
    "conditional_aggs": (X.q_conditional_aggs, X.SQL_CONDITIONAL_AGGS),
    "cube_sales": (X.q_cube_sales, X.SQL_CUBE_SALES),
    "scalar_funcs": (X.q_scalar_funcs, X.SQL_SCALAR_FUNCS),
    "date_funcs": (X.q_date_funcs, X.SQL_DATE_FUNCS),
    "session_window_stats": (X.q_session_window_stats, X.SQL_SESSION_WINDOW_STATS),
    "rollup_time": (X.q_rollup_time, X.SQL_ROLLUP_TIME),
    # --- demoted in the dedup_spans swap (r6) ---
    "collect_values": (X.q_collect_values, X.SQL_COLLECT_VALUES),
    # --- demoted r8 with two green rows each under the NTZ fix (r6+r7) ---
    "sessionize": (R.q_sessionize, R.SQL_SESSIONIZE),
    "scd2_intervals": (X.q_scd2_intervals, X.SQL_SCD2_INTERVALS),
    # --- demoted r8 in ann_recall's promotion (green r6 AND r7) ---
    "funnel_stages": (X.q_funnel_stages, X.SQL_FUNNEL_STAGES),
    # --- rows-only past-cap: SemDeDup cluster-scoped embedding dedup and
    #     the multimodal near-dup triple (pandas-UDF hashing); value
    #     goldens at three SFs carry their correctness ---
    "semantic_dedup": (LS.q_semantic_dedup, None),
    "image_phash_neardup": (LMM.q_image_phash_neardup, None),
    "audio_fp_neardup": (LMM.q_audio_fp_neardup, None),
    "video_phash_neardup": (LMM.q_video_phash_neardup, None),
    # --- rows-only: IVF recall on the xxhash64+Lloyd fast path (the
    #     portable variant in-window is the oracled quality metric) ---
    "ann_ivf_recall": (LS.q_ann_ivf_recall, None),
    # --- demoted r8 in the corpus-quality promotion, two green rows each
    #     (r6 AND r7) under the current data regime ---
    "dup_groups": (LD.q_dup_groups, LD.SQL_DUP_GROUPS),
    "fingerprint": (LD.q_fingerprint, LD.SQL_FINGERPRINT),
    "url_normalize": (LT.q_url_normalize, LT.SQL_URL_NORMALIZE),
    "approx_quantile_accuracy": (
        X.q_approx_quantile_accuracy,
        X.SQL_APPROX_QUANTILE_ACCURACY,
    ),
    # --- golden-pinned / thrice-covered tail: project_drop+project_reorder
    #     (F-MIX pipeline goldens), count_star/schema_stats/text_features/
    #     q1/q3 (green r01 AND r02), media_frames (rows-only, sf0.001+
    #     sf0.01 value goldens beat a driver rows-only row) ---
    "project_drop": (R.q_project_drop, R.SQL_PROJECT_DROP),
    "project_reorder": (X.q_project_reorder, X.SQL_PROJECT_REORDER),
    "count_star": (R.q_count_star, R.SQL_COUNT_STAR),
    "schema_stats": (R.q_schema_stats, R.SQL_SCHEMA_STATS),
    "text_features": (LT.q_quality_scores, LT.SQL_QUALITY_SCORES),
    "q1_pricing_summary": (R.q1_pricing_summary, R.SQL_Q1),
    "q3_top_revenue": (R.q3_top_revenue, R.SQL_Q3),
    "media_frames": (LMM.q_media_frames, None),
}


# Machine-checkable census of every rows-only (no_oracle) entry — one
# line per key explaining why no tolerance-free ANSI twin exists, and
# what carries its value correctness instead (r15 verdict item 7:
# "census count == rows-only count" is pinned by
# tests/test_sql_registry.py::test_rows_only_census_complete).  When a
# future operator lands rows-only, add its census line IN THE SAME
# COMMIT or the pin fails.
ROWS_ONLY_CENSUS: dict[str, str] = {
    "minhash_pairs": (
        "engine-specific xxhash64 fast path BY DESIGN; value correctness "
        "carried by the md5-portable oracled twin minhash_pairs_portable "
        "+ x3-SF goldens"
    ),
    "simhash_pairs": (
        "engine-specific xxhash64 fast path; oracled twin "
        "simhash_pairs_portable + x3-SF goldens"
    ),
    "ann_ivf_topk": (
        "xxhash64-seeded Lloyd fast path; oracled twin "
        "ann_ivf_topk_portable + x3-SF goldens"
    ),
    "ann_ivf_recall": (
        "recall of the xxhash64+Lloyd fast path; oracled twin "
        "ann_ivf_recall_portable measures the portable configuration"
    ),
    "semantic_dedup": (
        "xxhash64-seeded cluster assignment; prototypicality/"
        "cluster_profile oracle the portable centroids + assignment, "
        "semdedup_eps_curve oracles the keep/drop rule"
    ),
    "media_decode": (
        "averages float lumas across rows (partial-aggregation-order-"
        "dependent double sums, no tolerance-free twin); x3-SF value "
        "goldens + the ORACLED multimodal_neardup_recall row certify "
        "the decode chain"
    ),
    "media_frames": (
        "same float-luma aggregation class as media_decode; x3-SF "
        "value goldens"
    ),
    "image_phash_neardup": (
        "float DCT hashing (pandas-only); x3-SF goldens pin values, "
        "oracled multimodal_neardup_recall measures the shared "
        "pigeonhole join vs exact Hamming truth"
    ),
    "audio_fp_neardup": (
        "float band-energy fingerprint (pandas-only); x3-SF goldens + "
        "the shared measured-recall row"
    ),
    "video_phash_neardup": (
        "per-frame float DCT hashing (pandas-only); x3-SF goldens + "
        "the shared measured-recall row"
    ),
}


def query_map() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in ALL_QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: sql for name, (_, sql) in ALL_QUERIES.items() if sql is not None}
