"""Training-data-pipeline queries — aggregator.

The implementation moved to per-family plan modules in the r16
maintainability pass (this file had grown to 337 KB):

    llm_common      shared helpers
    llm_dedup       exact/near dedup, decontamination, LSH sizing
    llm_sketches    CMS / Bloom calibration curves
    llm_similarity  ANN, embeddings, semantic dedup/selection
    llm_text        text analysis, corpus quality, filters
    llm_tokenizers  BPE / unigram-LM tokenizers
    llm_construct   span/FIM/UL2/SFT/DPO/GRPO/chat/packing
    llm_mixing      selection, mixing, splits, shards
    llm_retrieval   RAG chunking, BM25, RRF, ranking quality
    llm_multimodal  media decode/features and perceptual near-dup
    llm_dq          integrity, profiling, drift, dataset card

This module re-exports the full historical surface (``plans.llm_ops``
has been the import path for tests and the registry since r2) so both
``from plans import llm_ops as L`` and direct family imports work; the
registry imports the family modules directly.
"""

from etl_pipeline2_0_spark.sources.tables import load_table  # noqa: F401

from etl_pipeline2_0_spark.plans.llm_common import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_dedup import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_sketches import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_similarity import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_text import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_tokenizers import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_construct import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_mixing import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_retrieval import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_multimodal import *  # noqa: F401,F403
from etl_pipeline2_0_spark.plans.llm_dq import *  # noqa: F401,F403
