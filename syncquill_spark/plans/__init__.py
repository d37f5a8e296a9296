"""Query registry: every oracle-checked query the engine claims.

Each entry pairs a Spark DataFrame program with an equivalent DuckDB
SQL oracle (or None for non-SQL-expressible operators, which get a
rows-only check). ``__spark_entry__.py`` at the repo root re-exports
this registry for the driver.
"""

from syncquill_spark.plans.queries import QUERIES as _CORE_QUERIES
from syncquill_spark.plans.queries import ORACLES as _CORE_ORACLES
from syncquill_spark.plans.queries import load_tables
from syncquill_spark.plans.queries_ext import EXT_QUERIES, EXT_ORACLES

_ALL_QUERIES = {**_CORE_QUERIES, **EXT_QUERIES}
_ALL_ORACLES = {**_CORE_ORACLES, **EXT_ORACLES}

# The driver's per-round correctness gate verifies the FIRST 50 registry
# entries in dict order. Policy (round-3 review): any query whose physical
# plan changed this round MUST sit inside the window, so modified plans
# always get a driver-green row in the same round they change. Round 4
# leads with its three NEW queries, then every query whose plan round 4
# touched (clusters edge build, _spread/persists in similarity, hashed
# shingle keys + bucket persists in the dedup family), then the 38 that
# first entered the window in round 3 (7 of which were red there and are
# fixed this round); the rest keep their prior order (green rows in
# CORRECTNESS_r01/r02).
_PRIORITY = [
    "similarity_knn_classify", "embedding_nearest_centroid",
    "multimodal_features", "dedup_embedding_incremental",
    "profile_documents", "curation_eval_k_per_lang",
    "dedup_clusters", "similarity_topk_cosine", "similarity_topk_lsh",
    "similarity_topk_ivf", "similarity_topk_ivf_refined",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_incremental",
    "dedup_embedding_cosine",
    "text_quality_rules", "text_bm25", "embedding_label_centroids",
    "window_moving_avg", "setop_except_all", "text_token_counts",
    "text_term_stats", "text_readability", "text_sentences_udtf",
    "text_fingerprint", "multimodal_media_stats", "join_asof_signup",
    "join_range_shipments", "join_binned_range", "agg_rollup_orders",
    "events_tumbling_window", "events_session_window", "cdc_scd2_history",
    "cdc_incremental_agg", "storage_zorder_key", "agg_quantiles_approx_check",
    "events_sliding_window", "funnel_click_purchase",
    "agg_distinct_users_exact", "agg_distinct_users_approx",
    "events_sessionization", "window_running_total", "join_events_customers",
    "pipeline_corpus_curation", "curation_hash_split",
    "curation_decontaminate", "curation_sample_stratified",
    "curation_shuffle", "curation_blocklist", "curation_boilerplate",
    # embedding_quantize / curation_pack_sequences / curation_redact_pii:
    # green in the r03 window and untouched since — they yield their
    # slots so the window stays at exactly 50 entries with every
    # round-4-modified plan inside.
]

_ORDER = _PRIORITY + [k for k in _ALL_QUERIES if k not in set(_PRIORITY)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES.get(k) for k in _ORDER}

__all__ = ["QUERIES", "ORACLES", "load_tables"]
