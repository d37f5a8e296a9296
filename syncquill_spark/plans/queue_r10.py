"""R10 REGISTRATION QUEUE — remainder after the r10 promotion.

Seven query/oracle pairs were finished and oracle-verified in r09 but
deliberately NOT registered, because the r09 driver window was exactly
full (window-capacity policy, `plans/__init__.py`). In r10 four of
them (storage_simhash_index, dedup_simhash_against, storage_ivfpq_index,
storage_bm25_index — the round-9 verdict's recommended four) moved
into `queries_ext` under the net-+4 growth cap. The THREE pairs below
remain queued and drain in r11 under the same cap, together with
`plans/queue_r11.py` (registration = move entries into queries_ext's
dicts and add the names to the front of `_PRIORITY`; new rows always
enter the current window, policy rule 2b).

Every pair here is exercised by `tests/test_queue_r10.py` through the
SAME fingerprint compare as the registered suite (row count + sorted
columns + normalized value rows vs DuckDB at sf0.001), so promotion
carries no correctness risk — only the driver re-verification that
registration exists to provide.

Reference: /root/reference/syncquill.py has none of this surface
(242-line sheet-to-BigQuery sync); these are EXT-tier LLM-pipeline
operators mandated by the BASELINE.json north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from syncquill_spark.plans.queries import load_tables
from syncquill_spark.plans.queries_ext import _H60, _TOKS_LOWER


_LM_FRAC_HEAD, _LM_FRAC_TAIL = 0.1, 0.3


def q_curation_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail quality buckets per language over the
    corpus-bigram-LM signal — the complete CCNet deployment story:
    ``bigram_commonness`` scores every document under the corpus's own
    bigram model (exact integer sum of quantized conditional
    frequencies), the per-doc rate lm_q = sum_q DIV n_bigrams is the
    signal, and ``quality_value_buckets`` labels the best ~10% of each
    language 'head' and the worst ~30% 'tail' by exact rank-k VALUE
    thresholds (ties land in the better bucket) — computed with the
    bracketed two-pass order statistic, so the dominant language never
    whole-sorts. Docs with < 2 tokens have no bigrams and are absent
    (same contract as text_bigram_lm)."""
    from syncquill_spark.operators.curation import quality_value_buckets
    from syncquill_spark.operators.text import bigram_commonness

    (documents,) = load_tables(spark, sf_dir, "documents")
    scored = (
        bigram_commonness(documents)
        .join(documents.select("doc_id", "lang"), "doc_id")
        .withColumn("lm_q", F.expr("sum_q DIV n_bigrams"))
    )
    return quality_value_buckets(
        scored,
        "lm_q",
        frac_head=_LM_FRAC_HEAD,
        frac_tail=_LM_FRAC_TAIL,
        stratify_col="lang",
    ).select("doc_id", "lang", F.col("lm_q").cast("long").alias("lm_q"), "bucket")


def _lm_buckets_sql() -> str:
    """Oracle twin of q_curation_lm_buckets: the text_bigram_lm CTEs
    for the signal, then per-language rank-k cutoff VALUES via a plain
    SQL window (DuckDB can afford the whole sort the Spark plan
    avoids) and the same value-threshold CASE."""
    toks = _TOKS_LOWER.format(src="text")
    h1 = _H60.format(x="tk[i]")
    h12 = _H60.format(x="(tk[i] || ' ' || tk[i+1])")
    fh, ft = _LM_FRAC_HEAD, 1.0 - _LM_FRAC_TAIL
    return f"""
WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
o AS (SELECT doc_id, UNNEST(range(1, len(tk))) AS i, tk FROM t),
occ AS (
  SELECT doc_id, {h1} AS h1, {h12} AS h12 FROM o
),
c12 AS (SELECT h12, COUNT(*) AS c12 FROM occ GROUP BY h12),
c1 AS (SELECT h1, COUNT(*) AS c1 FROM occ GROUP BY h1),
scored AS (
  SELECT occ.doc_id,
         COUNT(*) AS n_bigrams,
         SUM((1000000 * c12.c12) // c1.c1) AS sum_q
  FROM occ JOIN c12 ON occ.h12 = c12.h12 JOIN c1 ON occ.h1 = c1.h1
  GROUP BY occ.doc_id
),
sig AS (
  SELECT s.doc_id, d.lang, (s.sum_q // s.n_bigrams) AS lm_q
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
),
ranked AS (
  SELECT doc_id, lang, lm_q,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY lm_q DESC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM sig
),
cuts AS (
  SELECT lang,
         MAX(CASE WHEN rk = CAST(ceil({fh} * n) AS BIGINT)
                  THEN lm_q END) AS v_head,
         MAX(CASE WHEN rk = CAST(ceil({ft} * n) AS BIGINT)
                  THEN lm_q END) AS v_tail
  FROM ranked GROUP BY lang
)
SELECT sig.doc_id, sig.lang, CAST(sig.lm_q AS BIGINT) AS lm_q,
       CASE WHEN sig.lm_q >= cuts.v_head THEN 'head'
            WHEN sig.lm_q <  cuts.v_tail THEN 'tail'
            ELSE 'middle' END AS bucket
FROM sig JOIN cuts ON sig.lang = cuts.lang
"""


_PRUNE_MIN_COUNT = 2


def q_text_bigram_pruned_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bigram gate served from a PRUNED model (KenLM-style
    min-count pruning for serve-time broadcast): bigram counts below
    ``min_count`` are dropped from the stored c12 part at load time,
    and a pruned bigram scores exactly like an unseen one (left-join
    miss -> q = 0) while c1 stays untouched so survivor scores never
    shift. The oracle replays the gate SQL with a HAVING clause on the
    model CTE — it never sees the model tables."""
    from syncquill_spark.operators.text import (
        bigram_score_against,
        build_bigram_model,
        prune_bigram_model,
    )

    (documents,) = load_tables(spark, sf_dir, "documents")
    corpus = documents.filter(F.col("doc_id") % 2 == 0)
    batch = documents.filter(F.col("doc_id") % 2 == 1)
    c1, c12 = build_bigram_model(corpus)
    p1, p12 = prune_bigram_model(c1, c12, min_count=_PRUNE_MIN_COUNT)
    return bigram_score_against(batch, p1, p12)


def _bigram_pruned_gate_sql() -> str:
    toks = _TOKS_LOWER.format(src="text")
    h1 = _H60.format(x="tk[i]")
    h12 = _H60.format(x="(tk[i] || ' ' || tk[i+1])")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
o AS (SELECT doc_id, UNNEST(range(1, len(tk))) AS i, tk FROM t),
occ AS (
  SELECT doc_id, {h1} AS h1, {h12} AS h12 FROM o
),
c12 AS (
  SELECT h12, COUNT(*) AS c12 FROM occ WHERE doc_id % 2 = 0 GROUP BY h12
  HAVING COUNT(*) >= {_PRUNE_MIN_COUNT}
),
c1 AS (
  SELECT h1, COUNT(*) AS c1 FROM occ WHERE doc_id % 2 = 0 GROUP BY h1
)
SELECT occ.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(COALESCE((1000000 * c12.c12) // c1.c1, 0)) AS BIGINT) AS sum_q
FROM occ
LEFT JOIN c12 ON occ.h12 = c12.h12
LEFT JOIN c1 ON occ.h1 = c1.h1
WHERE occ.doc_id % 2 = 1
GROUP BY occ.doc_id
"""


def q_text_winnowing_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style span localization of winnowing substring matches:
    detected pairs (same parameters as ``dedup_winnowing_pairs``) are
    localized to token spans by anchoring every shared fingerprint at
    its positions in both documents and merging anchors on the same
    DIAGONAL (pos_b - pos_a constant — a contiguous copied passage
    advances both docs in lockstep) into runs wherever consecutive
    anchors are <= window grams apart. All-int output
    (id_a, id_b, start_a, end_a, start_b, end_b, n_anchors); the
    oracle replays selection, positions, pair detection, and the
    gaps-and-islands merge in plain SQL windows."""
    from syncquill_spark.operators.text import winnowing_match_pairs
    from syncquill_spark.plans.queries_ext import (
        _WIN_K,
        _WIN_MAX_DF,
        _WIN_MIN_SHARED,
        _WIN_W,
    )
    from syncquill_spark.streaming.text_dedup import (
        build_winnowing_positions,
        winnowing_match_spans,
    )

    (documents,) = load_tables(spark, sf_dir, "documents")
    pairs = winnowing_match_pairs(
        documents,
        k=_WIN_K,
        window=_WIN_W,
        min_shared=_WIN_MIN_SHARED,
        max_fp_df=_WIN_MAX_DF,
    )
    positions = build_winnowing_positions(documents, k=_WIN_K, window=_WIN_W)
    return winnowing_match_spans(pairs, positions, k=_WIN_K, window=_WIN_W)


def _winnowing_spans_sql() -> str:
    from syncquill_spark.plans.queries_ext import (
        _WIN_K,
        _WIN_W,
        _winnowing_pairs_sql,
        _winnowing_sql,
    )

    k, gap = _WIN_K, _WIN_W
    return f"""
WITH pos AS (
  SELECT doc_id, fp, gram_pos FROM ({_winnowing_sql()}) p0
),
pairs AS (
  SELECT id_a, id_b FROM ({_winnowing_pairs_sql()}) pr
),
anchors AS (
  SELECT p.id_a, p.id_b, a.gram_pos AS pa, b.gram_pos AS pb,
         b.gram_pos - a.gram_pos AS diag
  FROM pairs p
  JOIN pos a ON a.doc_id = p.id_a
  JOIN pos b ON b.doc_id = p.id_b AND b.fp = a.fp
),
marked AS (
  SELECT id_a, id_b, diag, pa, pb,
         CASE WHEN lag(pa) OVER w IS NULL
                   OR pa - lag(pa) OVER w > {gap}
              THEN 1 ELSE 0 END AS new_run
  FROM anchors
  WINDOW w AS (PARTITION BY id_a, id_b, diag ORDER BY pa)
),
runs AS (
  SELECT id_a, id_b, diag, pa, pb,
         SUM(new_run) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa
                            ROWS UNBOUNDED PRECEDING) AS run
  FROM marked
)
SELECT id_a, id_b,
       CAST(MIN(pa) AS BIGINT) AS start_a,
       CAST(MAX(pa) + {k - 1} AS BIGINT) AS end_a,
       CAST(MIN(pb) AS BIGINT) AS start_b,
       CAST(MAX(pb) + {k - 1} AS BIGINT) AS end_b,
       CAST(COUNT(*) AS BIGINT) AS n_anchors
FROM runs
GROUP BY id_a, id_b, diag, run
"""


QUEUE_QUERIES = {
    "curation_lm_buckets": q_curation_lm_buckets,
    "text_bigram_pruned_gate": q_text_bigram_pruned_gate,
    "text_winnowing_spans": q_text_winnowing_spans,
}

QUEUE_ORACLES = {
    "curation_lm_buckets": _lm_buckets_sql(),
    "text_bigram_pruned_gate": _bigram_pruned_gate_sql(),
    "text_winnowing_spans": _winnowing_spans_sql(),
}
