"""R11 REGISTRATION QUEUE — query/oracle pairs finished and
oracle-verified in round 9 but NOT registered, because the r10 driver
window is already committed to its 39 staleness-2 leads plus the r10
queue (window-capacity policy, `plans/__init__.py`). Registering later
is mechanical: move entries into queries_ext's dicts and add the names
to the front of `_PRIORITY`. Six entries: text_lines_dedup,
text_clf_gate, text_normalize, similarity_topk_rerank,
curation_remove_spans, curation_temperature_mix.

Every pair here is exercised by `tests/test_queue_r11.py` through the
SAME fingerprint compare as the registered suite (row count + sorted
columns + normalized value rows vs DuckDB at sf0.001), so promotion
carries no correctness risk — only the driver re-verification that
registration exists to provide.

Reference: /root/reference/syncquill.py has none of this surface
(242-line sheet-to-BigQuery sync); these are EXT-tier LLM-pipeline
operators mandated by the BASELINE.json north star.

QUEUE GROWTH STOPS AT SIX ENTRIES (late-r09 decision): 134 registered
+ 7 queued for r10 + 6 queued here = 147 of the window policy's 150
sustainable ceiling (plans/__init__.py). Registration over the next
rounds must respect the <=4-net-growth cap, so r10/r11/r12 drain
these queues selectively; new operator families from here land
unit-pinned only until registry headroom exists.

END-STATE SCHEDULE (round-10 decision — the full rationale and the
capacity arithmetic live in plans/__init__.py): r11 registers
curation_remove_spans + text_clf_gate from THIS queue plus
text_winnowing_spans + curation_lm_buckets from queue_r10, taking the
registry to its declared feature-complete 142. The other four here —
similarity_topk_rerank, curation_temperature_mix, text_lines_dedup,
text_normalize — stay PERMANENTLY queue-verified (each is a variant
or composition of an already-registered row; the full DuckDB
fingerprint pin keeps running every round via tests/test_queue_r11.py
and the local replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from syncquill_spark.plans.queries import load_tables
from syncquill_spark.plans.queries_ext import (
    _H60,
    _IVF_CELLS,
    _IVF_NPROBE,
    _QUERY_MOD,
    _TOKS_LOWER,
    _TOPK,
    _ivfpq_sql,
)

# the fixture's documents are single-line word soup; both engines
# apply the SAME deterministic literal replace to synthesize line
# structure (left-to-right non-overlapping in both), so the line-dedup
# semantics are exercised on multi-line docs with genuinely shared
# lines (small vocab -> repeated short lines across docs)
_LINE_SEED_WORD = " table "


def q_text_lines_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document line dedup (C4 policy-line removal /
    CCNet-RefinedWeb shard line dedup, ``dedup_lines_across`` mode
    "drop"): a line occurring in >= 2 distinct documents is boilerplate
    and every occurrence is removed; docs are rebuilt with surviving
    lines in original order. The operator groups lines by their
    md5-int64 hash; the oracle groups by the line string — identical
    absent md5 collisions, the same equivalence every hash-keyed
    oracle in this registry relies on."""
    from syncquill_spark.operators.text import dedup_lines_across

    (documents,) = load_tables(spark, sf_dir, "documents")
    docs2 = documents.select(
        "doc_id",
        F.regexp_replace("text", _LINE_SEED_WORD, "\n").alias("text"),
    )
    out = dedup_lines_across(docs2, min_docs=2, mode="drop")
    return out.select("doc_id", "n_lines", "n_lines_kept", "text_deduped")


def _lines_dedup_sql() -> str:
    w = _LINE_SEED_WORD
    return f"""
WITH d AS (
  SELECT doc_id, replace(text, '{w}', chr(10)) AS text FROM documents
),
s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
o AS (SELECT doc_id, UNNEST(range(1, len(ls) + 1)) AS i, ls FROM s),
lines AS (SELECT doc_id, i, ls[i] AS line FROM o),
flagged AS (
  SELECT line FROM lines WHERE len(trim(line)) >= 1
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT doc_id, i, line FROM lines
  WHERE line NOT IN (SELECT line FROM flagged)
),
reb AS (
  SELECT doc_id, COUNT(*) AS nk,
         string_agg(line, chr(10) ORDER BY i) AS txt
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(len(s.ls) AS BIGINT) AS n_lines,
       CAST(COALESCE(reb.nk, 0) AS BIGINT) AS n_lines_kept,
       COALESCE(reb.txt, '') AS text_deduped
FROM s LEFT JOIN reb USING (doc_id)
"""


def q_text_clf_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised token-weight quality gate (fastText/LR-surrogate,
    ``classifier_score_against``): train the (th, c_pos, c_neg) count
    model on the labeled even-doc_id half (label = doc_id % 4 == 0 —
    the deterministic seed-set stand-in), score the odd half against
    it. Per-token weight is the add-one-smoothed quantized positive
    rate (1e6*(c_pos+1)) div (c_pos+c_neg+2); unseen tokens score the
    neutral 500000. The oracle replays the md5-derived token hashes
    and the integer division exactly."""
    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
    )

    (documents,) = load_tables(spark, sf_dir, "documents")
    corpus = documents.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", (F.col("doc_id") % 4 == 0).cast("int")
    )
    batch = documents.filter(F.col("doc_id") % 2 == 1)
    return classifier_score_against(batch, build_token_classifier(corpus))


def _clf_gate_sql() -> str:
    toks = _TOKS_LOWER.format(src="text")
    th = _H60.format(x="tk[i]")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
o AS (SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS i, tk FROM t),
occ AS (
  SELECT doc_id, {th} AS th FROM o WHERE tk[i] <> ''
),
m AS (
  SELECT th,
         SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS c_pos,
         SUM(CASE WHEN doc_id % 4 <> 0 THEN 1 ELSE 0 END) AS c_neg
  FROM occ WHERE doc_id % 2 = 0 GROUP BY th
)
SELECT occ.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE((1000000 * (m.c_pos + 1)) // (m.c_pos + m.c_neg + 2),
                         500000)) AS BIGINT) AS sum_w
FROM occ
LEFT JOIN m ON occ.th = m.th
WHERE occ.doc_id % 2 = 1
GROUP BY occ.doc_id
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization + invisibles strip
    (``normalize_text``): the fixture text is ASCII, so both engines
    first INJECT the pathologies with the same literal replaces —
    every 'e' gains a combining acute (U+0301), every 'a' a zero-width
    space (U+200B) — then the operator must strip the zero-widths and
    compose e+acute to the precomposed é. Oracle = DuckDB
    ``nfc_normalize`` over the same regexp strip — two independent
    Unicode implementations (Python unicodedata vs DuckDB's utf8proc)
    agreeing character-for-character."""
    from syncquill_spark.operators.text import normalize_text

    (documents,) = load_tables(spark, sf_dir, "documents")
    dirty = documents.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", "e", "e\u0301"), "a", "a\u200b"
        ).alias("text"),
    )
    out = normalize_text(dirty)  # NFC, strip_invisibles
    return out.select(
        "doc_id",
        F.length("text_norm").cast("long").alias("n_chars_norm"),
        F.col("text_norm"),
    )


def _normalize_sql() -> str:
    from syncquill_spark.operators.text import INVISIBLES_CLASS

    return f"""
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS n_chars_norm,
       t AS text_norm
FROM (
  SELECT doc_id,
         nfc_normalize(
           regexp_replace(
             replace(replace(text, 'e', 'e' || chr(769)),
                     'a', 'a' || chr(8203)),
             '{INVISIBLES_CLASS}', '', 'g')
         ) AS t
  FROM documents
)
"""


_RERANK_DEPTH = 50


def q_similarity_topk_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF-PQ serving (`ivfpq_topk_rerank`): ADC
    top-{_RERANK_DEPTH} candidates from the coarse stage
    (similarity_topk_ivfpq's exact parameters), then an exact float
    cosine re-rank of the candidates alone down to top-k — the deployed
    shape that buys back PQ quantization loss while still touching
    floats for only |queries| x depth rows. The oracle wraps the
    registered IVF-PQ SQL (k=depth) as the candidate subquery and
    replays the exact-cosine re-rank with the same
    left-to-right-fold score the brute-force oracle uses."""
    from syncquill_spark.operators.similarity import ivfpq_topk_rerank

    (embeddings,) = load_tables(spark, sf_dir, "embeddings")
    queries = embeddings.filter(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivfpq_topk_rerank(
        embeddings, queries, k=_TOPK, rerank=_RERANK_DEPTH,
        n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE,
    )


def _rerank_sql() -> str:
    cos = (
        "list_reduce(list_transform(range(1, len(c.embedding) + 1), "
        "i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b) "
        "/ (sqrt(list_reduce(list_transform(range(1, len(q.qv) + 1), "
        "i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (a, b) -> a + b)) "
        "* sqrt(list_reduce(list_transform(range(1, len(c.embedding) + 1), "
        "i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b)))"
    )
    return f"""
WITH adc AS (
  SELECT query_id, neighbor_id FROM ({_ivfpq_sql(k=_RERANK_DEPTH)}) t
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id % {_QUERY_MOD} = 0
),
rescored AS (
  SELECT a.query_id, a.neighbor_id, {cos} AS score
  FROM adc a
  JOIN embeddings c ON a.neighbor_id = c.vec_id
  JOIN q ON q.query_id = a.query_id
)
SELECT query_id, neighbor_id, rk FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rk
  FROM rescored) t
WHERE rk <= {_TOPK}
"""


def q_curation_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-removal DECONTAMINATION end to end: detect within-corpus
    substring matches (winnowing, ``text_winnowing_spans``' exact
    parameters), localize them to token spans, and CUT the id_b side
    (pairs orient id_a < id_b, so the later document loses the copied
    passage — keep-first) with ``remove_spans`` at
    pad = window - 1 (the selection-guarantee margin that makes the
    cut cover the whole true match). Documents with no matches pass
    through byte-exact; cut documents are rebuilt from surviving
    tokens. The oracle replays detection + spans in SQL windows, then
    the same pad/filter/rebuild with string_split_regex +
    NOT EXISTS + ordered string_agg."""
    from syncquill_spark.operators.curation import remove_spans
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
    spans = winnowing_match_spans(pairs, positions, k=_WIN_K, window=_WIN_W)
    return remove_spans(
        documents,
        spans,
        span_id_col="id_b",
        start_col="start_b",
        end_col="end_b",
        pad=_WIN_W - 1,
    )


def _remove_spans_sql() -> str:
    from syncquill_spark.plans.queries_ext import _WIN_W
    from syncquill_spark.plans.queue_r10 import _winnowing_spans_sql

    pad = _WIN_W - 1
    return f"""
WITH sp AS (
  SELECT id_b AS doc_id, GREATEST(start_b - {pad}, 0) AS s, end_b + {pad} AS e
  FROM ({_winnowing_spans_sql()}) spans
),
flagged AS (SELECT DISTINCT doc_id FROM sp),
tk AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tks FROM documents
),
tok AS (
  SELECT doc_id, UNNEST(range(1, len(tks) + 1)) AS i, tks FROM tk
),
tok2 AS (SELECT doc_id, i, tks[i] AS tok FROM tok),
kept AS (
  SELECT t.doc_id, t.i, t.tok FROM tok2 t
  JOIN flagged f USING (doc_id)
  WHERE NOT EXISTS (
    SELECT 1 FROM sp WHERE sp.doc_id = t.doc_id AND t.i - 1 BETWEEN sp.s AND sp.e
  )
),
reb AS (
  SELECT doc_id, COUNT(*) AS nk, string_agg(tok, ' ' ORDER BY i) AS txt
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(tk.tks) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN f.doc_id IS NULL THEN len(tk.tks)
                 ELSE COALESCE(reb.nk, 0) END AS BIGINT) AS n_tokens_kept,
       CASE WHEN f.doc_id IS NULL THEN d.text
            ELSE COALESCE(reb.txt, '') END AS text_clean
FROM documents d
JOIN tk ON tk.doc_id = d.doc_id
LEFT JOIN flagged f ON f.doc_id = d.doc_id
LEFT JOIN reb ON reb.doc_id = d.doc_id
"""


_TEMP_TOTAL, _TEMP_ALPHA = 120, 0.5


def q_curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled training mix (`temperature_mix`): stratum
    shares proportional to n_lang**alpha (alpha=0.5 = T=2, the
    multilingual-pretraining standard), resolved to exact counts by
    largest remainder and selected by the salted-hash prefix rank.
    Every decision the oracle replays is integer-exact or a fixed-order
    IEEE op: weights are floor(sqrt(n)*1e6+0.5) int64 (sqrt is
    correctly rounded everywhere — no libm pow), the weight sum is an
    integer sum, each quota is one multiply + one divide."""
    from syncquill_spark.operators.curation import temperature_mix

    (documents,) = load_tables(spark, sf_dir, "documents")
    return temperature_mix(
        documents, total=_TEMP_TOTAL, alpha=_TEMP_ALPHA
    ).select("doc_id", "lang", "mix_rank")


def _temperature_mix_sql() -> str:
    h = _H60.format(x="'mix-v1:' || CAST(doc_id AS VARCHAR)")
    total = _TEMP_TOTAL
    return f"""
WITH n AS (SELECT lang, COUNT(*) AS nn FROM documents GROUP BY lang),
w AS (
  SELECT lang, nn,
         CAST(FLOOR(sqrt(CAST(nn AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wq
  FROM n
),
q AS (
  SELECT lang, nn, wq,
         CAST({total} AS DOUBLE) * CAST(wq AS DOUBLE)
           / CAST((SELECT SUM(wq) FROM w) AS DOUBLE) AS qv
  FROM w
),
b AS (
  SELECT lang, nn, qv, CAST(FLOOR(qv) AS BIGINT) AS base,
         qv - FLOOR(qv) AS rem
  FROM q
),
k AS (
  SELECT lang,
         LEAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC)
                                <= {total} - (SELECT SUM(base) FROM b)
                           THEN 1 ELSE 0 END,
               nn) AS kk
  FROM b
),
r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {h} ASC, doc_id ASC) AS mix_rank
  FROM documents
)
SELECT r.doc_id, r.lang, CAST(r.mix_rank AS BIGINT) AS mix_rank
FROM r JOIN k USING (lang) WHERE mix_rank <= kk
"""


# NOT queued, stated honestly (the url_dedup precedent): the fuzzy
# record-linkage family (operators/dedup.py::fuzzy_name_pairs) stays
# unit-only because every fixture name column is degenerate for
# linkage — part.p_name has only ~64 distinct values, so the PAIR
# output itself is quadratic in table size (~3e8 pairs at sf0.1, a
# data property that would swamp bench, not an engine property), and
# customer/supplier names are single-token serial strings on which
# token blocking is either one giant block or nothing.

QUEUE_QUERIES = {
    "text_lines_dedup": q_text_lines_dedup,
    "text_clf_gate": q_text_clf_gate,
    "text_normalize": q_text_normalize,
    "similarity_topk_rerank": q_similarity_topk_rerank,
    "curation_remove_spans": q_curation_remove_spans,
    "curation_temperature_mix": q_curation_temperature_mix,
}

QUEUE_ORACLES = {
    "text_lines_dedup": _lines_dedup_sql(),
    "text_clf_gate": _clf_gate_sql(),
    "text_normalize": _normalize_sql(),
    "similarity_topk_rerank": _rerank_sql(),
    "curation_remove_spans": _remove_spans_sql(),
    "curation_temperature_mix": _temperature_mix_sql(),
}
