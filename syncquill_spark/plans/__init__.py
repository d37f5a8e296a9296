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
# entries in dict order. Policy (round-3 review, extended round-4): any
# query whose physical plan changed this round MUST sit inside the
# window — and a change to a SHARED loader/helper counts as touching
# every caller. Staleness rotation (round-4 verdict, executed every
# round since): no query outside the window may end the round with a
# last driver-green row more than 2 rounds old.
#
# Round-7 window, in order:
#  - the 12 queries NEW this round (new plans always enter the window):
#    storage_versioned_roundtrip + storage_index_roundtrip (the
#    round-6 verdict's #2 — the versioned-table and persisted-index
#    lifecycles round-trip through disk INSIDE a registry query whose
#    oracle is the un-persisted plan's twin), multimodal_decode (real
#    pure-numpy PPM codec under the gate — verdict #4),
#    curation_pack_ffd (the FFD packer's recursive-CTE oracle —
#    verdict #5), storage_index_incremental (append-to-index ==
#    rebuild, pinned to dedup_minhash_lsh's own oracle),
#    storage_text_ingest_roundtrip (write text dump -> re-ingest with
#    content ids; closes ingestion's driver-visibility gap),
#    multimodal_audio_decode (real pure-numpy PCM WAV codec),
#    text_vocab_coverage (top-V corpus vocab + per-doc OOV counts),
#    curation_quality_filter (exact percentile quality gate per
#    language), text_winnowing (MOSS winnowing fingerprints,
#    rightmost-tie rule, oracle replays the selection),
#    dedup_winnowing_pairs (substring-match pair detection over the
#    fingerprints, hub-fingerprint df cap), and
#    storage_media_ingest_roundtrip (write_media_dir executor-side
#    binary export -> binaryFile re-ingest -> real codec decode;
#    oracle = multimodal_decode's twin — files must change nothing);
#  - the 19 rows whose last driver-green is r04 (staleness 2 — the
#    round-6 verdict names them as mandatory leads): window_moving_avg,
#    setop_except_all, multimodal_media_stats, curation_boilerplate,
#    curation_blocklist, curation_shuffle, curation_sample_stratified,
#    curation_decontaminate, curation_hash_split, storage_zorder_key,
#    agg_quantiles_approx_check, window_running_total,
#    join_events_customers, events_sliding_window,
#    agg_distinct_users_approx, events_sessionization,
#    events_tumbling_window, events_session_window, agg_rollup_orders;
#  - 19 of the 45 rows whose last driver-green is r05 (the stalest
#    remaining tier): the five sync_* flagship rows (the reference's
#    own surface), then the similarity/dedup/text families (the plans
#    most often touched), then relational rows to fill.
# Left outside at staleness 2 after this round (r05-green, untouched —
# they MUST lead the r08 window): agg_pivot_status, agg_grouping_sets,
# agg_quantiles_status, setop_repeat_customers, join_shipping_priority,
# join_returned_items, agg_promo_revenue, join_priority_lines,
# agg_order_priority, agg_forecast_revenue, agg_customer_distribution,
# join_large_orders, setop_idle_rich_customers, join_small_qty_parts,
# join_lonely_returned_supplier, join_disjunctive_promo,
# join_nation_trade, window_top_supplier, agg_customer_balance_stats,
# join_salted_revenue, agg_status_sets, text_token_stats,
# subquery_exists_orders, agg_cube_sales, json_events_extract,
# agg_pricing_summary — pure
# relational/projection shapes over untouched loaders. The 50
# r06-green rows rotate out at staleness 1.
#
# Round-6 window (for the record):
# Round-6 window, in order:
#  - the 16 queries NEW this round: similarity_ann_recall,
#    text_chunk_documents, curation_leakage_split, text_segment_dedup
#    (each promoted from a pytest DuckDB twin to a registry oracle per
#    the round-5 verdict's #1), join_market_share / join_product_profit
#    / join_min_cost_supplier / agg_important_stock /
#    agg_supplier_part_types / join_excess_inventory (TPC-H
#    Q8/Q9/Q2/Q11/Q16/Q20 shapes — partsupp absent from the fixtures,
#    derived from lineitem or proxied, documented per query), and
#    curation_target_mix / curation_target_mix_tokens (exact
#    per-stratum mix budgets in docs and tokens), and
#    profile_referential (FK-orphan audit over every fixture edge) and
#    dedup_cluster_stats (cluster-size histogram: CC composed with the
#    SimHash pair emitter) and dedup_apply (keep-one-per-cluster over
#    the MinHash pairs — the application step, formerly unit-only),
#    and pipeline_training_mix (the capstone composition:
#    fuzzy decontaminate -> exact dedup -> target mix -> accounting);
#    new plans always enter the window;
#  - the 8 rows whose last driver-green is r03 (staleness 2 — the
#    round-5 verdict's #2 names them as mandatory leads):
#    dedup_exact, curation_redact_pii, curation_pack_sequences,
#    embedding_quantize, join_revenue_by_nation, window_topk_orders,
#    setop_customers_without_orders, scalar_functions;
#  - curation_fuzzy_decontaminate (r05-green, plan profiled this
#    round per verdict #3), curation_domain_quota (r05-green, plan
#    CHANGED: hot-domain two-stage top-k auto-engage), dedup_clusters
#    (r05-green, plan CHANGED: the CC convergence probe now detects a
#    one-step fixpoint mid-cycle), and similarity_topk_ivf /
#    similarity_topk_ivf_refined (r05-green, build phase extracted to
#    ivf_build_index for the persisted-index lifecycle — outputs
#    hash-identical, in-window per the shared-helper rule);
#  - 21 of the 40 rows whose last driver-green is r04 (the stalest
#    remaining tier), including dedup_incremental / dedup_minhash_lsh
#    (share the MinHash plumbing the fuzzy-decontaminate tuning may
#    touch).
# Left outside at staleness 2 (r04-green, untouched this round):
# window_moving_avg, setop_except_all, multimodal_media_stats,
# curation_boilerplate, curation_blocklist, curation_shuffle,
# curation_sample_stratified, curation_decontaminate,
# curation_hash_split, storage_zorder_key, agg_quantiles_approx_check,
# window_running_total, join_events_customers, events_sliding_window,
# agg_distinct_users_approx, events_sessionization,
# events_tumbling_window, events_session_window, agg_rollup_orders —
# pure projections / windows / aggregations over untouched loaders;
# they MUST lead the r07 window. The 44 other r05-green rows rotate
# out at staleness 1.
_PRIORITY = [
    # new this round
    "storage_versioned_roundtrip", "storage_index_roundtrip",
    "multimodal_decode", "curation_pack_ffd",
    "storage_index_incremental", "storage_text_ingest_roundtrip",
    "multimodal_audio_decode", "text_vocab_coverage",
    "curation_quality_filter", "text_winnowing", "dedup_winnowing_pairs",
    "storage_media_ingest_roundtrip",
    # staleness-2 cohort (last driver-green r04)
    "window_moving_avg", "setop_except_all", "multimodal_media_stats",
    "curation_boilerplate", "curation_blocklist", "curation_shuffle",
    "curation_sample_stratified", "curation_decontaminate",
    "curation_hash_split", "storage_zorder_key",
    "agg_quantiles_approx_check", "window_running_total",
    "join_events_customers", "events_sliding_window",
    "agg_distinct_users_approx", "events_sessionization",
    "events_tumbling_window", "events_session_window",
    "agg_rollup_orders",
    # r05-green fill: sync flagships first
    "sync_diff_keyed", "sync_diff_positional", "sync_apply_keyed",
    "sync_upsert", "sync_validate",
    # then the similarity/dedup/text families
    "similarity_knn_classify", "embedding_nearest_centroid",
    "dedup_embedding_incremental", "curation_eval_k_per_lang",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_embedding_cosine",
    "similarity_topk_cosine", "similarity_topk_lsh",
    "dedup_semantic_pairs", "text_tfidf_terms", "text_language_id",
    "text_quality", "text_repetition",
]

_ORDER = _PRIORITY + [k for k in _ALL_QUERIES if k not in set(_PRIORITY)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES.get(k) for k in _ORDER}

__all__ = ["QUERIES", "ORACLES", "load_tables"]
