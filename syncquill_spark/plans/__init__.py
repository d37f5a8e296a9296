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
# every caller. Round 5 additionally executes the round-4 verdict's
# staleness rotation: no query outside the window may have a last
# driver-green row older than round 3.
#
# Round-5 window, in order:
#  - the 6 queries whose plans round 5 changed: the quantized-int64
#    signature family (dedup_embedding_cosine / _incremental,
#    similarity_topk_lsh), the IVF persist-lifecycle change
#    (similarity_topk_ivf / _refined), and curation_eval_k_per_lang
#    (auto big-stratum pre-filter);
#  - dedup_clusters (edge source shares the dedup plumbing; kept in
#    conservatively) and the three other _spread callers
#    (similarity_topk_cosine, similarity_knn_classify,
#    embedding_nearest_centroid) — _spread's probe ORDER changed this
#    round; the decision it makes is provably identical, in-window
#    anyway per the shared-helper rule;
#  - the 29 queries whose last driver-green row is r01/r02 (the TPC-H
#    join/agg family, simhash, text scoring) — the stalest rows;
#  - the five sync_* flagship rows (last driver-checked r03);
#  - the four queries NEW this round (dedup_semantic_pairs,
#    curation_fuzzy_decontaminate, curation_domain_quota,
#    text_tfidf_terms) — new plans always enter the window;
#  - two more r03 rows: agg_pricing_summary and json_events_extract
#    (the round-4 verdict's shared-loader flag).
# Left outside at staleness 2 (r03-green, untouched since):
# dedup_exact, curation_redact_pii, curation_pack_sequences,
# embedding_quantize, join_revenue_by_nation, window_topk_orders,
# setop_customers_without_orders, scalar_functions — all pure
# relational plans over untouched loaders. The r04-green rows (new
# last round, untouched this round) rotate out at staleness 1.
_PRIORITY = [
    "dedup_semantic_pairs", "curation_fuzzy_decontaminate",
    "curation_domain_quota", "text_tfidf_terms",
    "dedup_embedding_cosine", "dedup_embedding_incremental",
    "similarity_topk_lsh", "similarity_topk_ivf",
    "similarity_topk_ivf_refined", "curation_eval_k_per_lang",
    "dedup_clusters", "similarity_topk_cosine", "similarity_knn_classify",
    "embedding_nearest_centroid",
    "text_token_stats", "subquery_exists_orders", "agg_cube_sales",
    "agg_customer_balance_stats", "join_salted_revenue", "agg_status_sets",
    "agg_pivot_status", "agg_grouping_sets", "agg_quantiles_status",
    "setop_repeat_customers", "join_shipping_priority", "join_returned_items",
    "agg_promo_revenue", "join_priority_lines", "agg_order_priority",
    "agg_forecast_revenue", "agg_customer_distribution", "join_large_orders",
    "setop_idle_rich_customers", "join_small_qty_parts",
    "join_lonely_returned_supplier", "join_disjunctive_promo",
    "join_nation_trade", "window_top_supplier", "dedup_simhash",
    "dedup_simhash_pairs", "text_language_id", "text_quality",
    "text_repetition",
    "sync_diff_keyed", "sync_diff_positional", "sync_apply_keyed",
    "sync_upsert", "sync_validate",
    "agg_pricing_summary", "json_events_extract",
]

_ORDER = _PRIORITY + [k for k in _ALL_QUERIES if k not in set(_PRIORITY)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES.get(k) for k in _ORDER}

__all__ = ["QUERIES", "ORACLES", "load_tables"]
