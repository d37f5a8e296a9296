"""Text-analysis operators for training-data pipelines (EXT tier).

Language ID (stopword-overlap heuristic), quality scoring
(length/punct/stopword/repetition signals), token counting (whitespace
+ BPE-ish subword estimate), document fingerprinting (order-sensitive
rolling hash), BM25 / term stats / tf-idf distinctive terms (the
inverted-index aggregations), overlapping token-window chunking, and
Arrow-batched readability scoring. Everything is built-in expressions
except the readability pandas_udf; the per-doc scorers are single
projections, the term-level operators are two map-side-combined
aggregations (shuffle bounded by vocabulary, not text size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from syncquill_spark.operators._cache import tracked_persist
from syncquill_spark.functions.hashing import rolling_fingerprint

# Tiny per-language stopword profiles for the overlap heuristic. A real
# deployment swaps in fasttext-style models via pandas_udf; the operator
# shape (projection + argmax) is identical.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que"),
}


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def language_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language profile (integer scores)."""
    toks = _tokens(text)
    return {
        lang: F.size(
            F.filter(
                toks,
                lambda t: t.isin(*profile),
            )
        )
        for lang, profile in LANG_PROFILES.items()
    }


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Argmax language over profiles; deterministic tie-break by lang
    name order; 'und' (undetermined) when no profile matches."""
    scores = language_scores(text_col)
    langs = sorted(scores)  # fixed evaluation order for ties
    pairs = F.array(
        *[
            F.struct(
                (-scores[lang]).cast("long").alias("neg"), F.lit(lang).alias("lang")
            )
            for lang in langs
        ]
    )
    best = F.array_min(pairs)
    return df.select(
        F.col(id_col),
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        (-best["neg"]).alias("best_score"),
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality signals per document, integer/exact-ratio outputs:

    n_chars, n_tokens, n_unique_tokens, mean token length (double from
    int division — cross-engine exact), punctuation count, stopword
    count, repetition ratio. A downstream filter keeps documents inside
    the usual quality envelope — the thresholds are illustrative.
    """
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"])))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars_computed"),
        n_tok.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_unique_tokens"),
        (n_chars.cast("double") / n_tok.cast("double")).alias("chars_per_token"),
        n_punct.cast("long").alias("n_punct"),
        stop_hits.cast("long").alias("n_stopwords"),
        (n_uniq.cast("double") / n_tok.cast("double")).alias("uniq_ratio"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_chars_per_token: float = 12.0,
    min_uniq_ratio: float = 0.3,
) -> DataFrame:
    """Keep documents passing the quality envelope."""
    feats = quality_features(df, text_col, id_col)
    return feats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("chars_per_token") <= max_chars_per_token)
        & (F.col("uniq_ratio") >= min_uniq_ratio)
    ).select(id_col)


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_top_frac: float = 0.2
) -> DataFrame:
    """Gopher/MassiveText-style repetition signals per document: the
    count of the most frequent token and most frequent bigram, plus a
    repetitive flag (top token > ``max_top_frac`` of all tokens).

    Scale shape: explode -> (doc, term) partial-agg -> per-doc max.
    Frequencies via two-level groupBy (map-side combine both levels),
    NOT a per-doc O(n^2) array scan — the shuffle carries (doc_id,
    term, count), bounded by vocabulary not text size. Flag math stays
    integer (5 * top > n) so the oracle is hash-exact.
    """
    toks = df.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    unigrams = toks.select(id_col, F.explode("_toks").alias("term"))
    top_uni = (
        unigrams.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.max("c").cast("long").alias("max_tok_freq"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    from syncquill_spark.functions.hashing import word_shingles_from_tokens

    bigrams = toks.select(
        id_col, F.explode(word_shingles_from_tokens(F.col("_toks"), 2)).alias("bg")
    )
    top_bi = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.max("c").cast("long").alias("max_bigram_freq"),
            # Gopher duplicate-n-gram mass: bigram instances whose gram
            # occurs more than once, as a fraction of all bigrams
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("_dup_bi"),
            F.sum("c").cast("long").alias("_tot_bi"),
        )
    )
    inv_frac = int(round(1.0 / max_top_frac))
    return (
        top_uni.join(top_bi, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "max_tok_freq",
            F.coalesce("max_bigram_freq", F.lit(0).cast("long")).alias("max_bigram_freq"),
            F.coalesce("_dup_bi", F.lit(0).cast("long")).alias("dup_bigrams"),
            F.coalesce("_tot_bi", F.lit(0).cast("long")).alias("total_bigrams"),
            F.coalesce(
                F.col("_dup_bi").cast("double") / F.col("_tot_bi").cast("double"),
                F.lit(0.0),
            ).alias("dup_bigram_frac"),
            F.when(F.col("max_tok_freq") * inv_frac > F.col("n_tokens"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_repetitive"),
        )
    )


def quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_chars_per_token: int = 12,
    min_uniq_pct: int = 30,
    max_dup_bigram_pct: int = 60,
) -> DataFrame:
    """Gopher/C4-style composite quality envelope: one row per document
    with each rule as a 0/1 column and ``keep`` = every rule passes.
    Emitting per-rule verdicts (not just the filtered survivors) is
    what a curation pipeline audits: WHICH rule rejected a document and
    how much each rule costs the corpus.

    All comparisons are integer cross-multiplications (uniq_ratio >=
    30% becomes 100*n_unique >= 30*n_tokens), so verdicts are exact on
    every engine — no float-threshold edge cases. Two shuffles total,
    both from :func:`repetition_signals`; the feature projection is
    shuffle-free.
    """
    feats = quality_features(df, text_col, id_col)
    reps = repetition_signals(df, text_col, id_col).select(
        id_col,
        "max_tok_freq",
        "dup_bigrams",
        "total_bigrams",
        "is_repetitive",
    )
    j = feats.join(reps, id_col)
    rule_len = (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    rule_cpt = F.col("n_chars_computed") <= max_chars_per_token * F.col("n_tokens")
    rule_uniq = 100 * F.col("n_unique_tokens") >= min_uniq_pct * F.col("n_tokens")
    rule_rep = F.col("is_repetitive") == 0
    rule_dupbi = 100 * F.col("dup_bigrams") <= max_dup_bigram_pct * F.col("total_bigrams")
    as_flag = lambda c: F.when(c, 1).otherwise(0).cast("long")
    return j.select(
        F.col(id_col),
        as_flag(rule_len).alias("pass_length"),
        as_flag(rule_cpt).alias("pass_chars_per_token"),
        as_flag(rule_uniq).alias("pass_uniq_ratio"),
        as_flag(rule_rep).alias("pass_not_repetitive"),
        as_flag(rule_dupbi).alias("pass_dup_bigrams"),
        as_flag(rule_len & rule_cpt & rule_uniq & rule_rep & rule_dupbi).alias("keep"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    term set (Lucene idf form) — retrieval-quality scoring for
    corpus curation (e.g. up-weighting documents relevant to a topic
    mix). Output: (doc_id, bm25, n_matched) for docs matching >= 1
    term.

    Scale shape: tf is the inverted-index groupBy restricted to the
    query terms (the explode filters BEFORE the shuffle, so the
    aggregate carries |docs| x |query| rows at most); df and the
    corpus stats (N, total length) are one tiny broadcast each.

    Determinism: every per-(doc, term) score is pure per-row IEEE
    arithmetic (ln, mul, div — exactly specified). The only cross-row
    float reduction, the per-doc term sum, is made associative by
    rounding each term's score to DECIMAL(18,9) first — summing <=
    |query| exact decimals is order-independent, so the result is
    engine-exact (ties at the 9th decimal of an ln-valued score do
    not occur in practice).
    """
    toks = _tokens(text_col)
    tok = df.select(F.col(id_col), F.explode(toks).alias("term"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").cast("long").alias("_total_len"),
    )
    qtok = tok.filter(F.col("term").isin(*query_terms))
    tf = qtok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    return _bm25_score_parts(tf, dfreq, dl, stats, id_col, k1, b)


def _bm25_score_parts(
    tf: DataFrame,
    dfreq: DataFrame,
    dl: DataFrame | None,
    stats: DataFrame,
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """The BM25 formula over already-materialized parts — shared by
    ``bm25_scores`` (parts computed from text in-plan) and
    ``bm25_from_index`` (parts loaded from a persisted index), so the
    two paths cannot drift. Inputs: tf (id, term, _tf) restricted to
    the query terms, dfreq (term, _df), dl (id, _dl), stats one row
    (_n_docs, _total_len). ``dl=None`` means tf ALREADY carries its
    ``_dl`` column (the inline-dl serve path — postings rows store the
    doc length, so no doclens join happens at serve time)."""
    scored = tf.join(F.broadcast(dfreq), "term")
    if dl is not None:
        scored = scored.join(dl, id_col)
    joined = scored.crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    rel_len = (
        F.col("_dl").cast("double")
        * F.col("_n_docs").cast("double")
        / F.col("_total_len").cast("double")
    )
    score = (
        idf
        * (F.col("_tf") * (k1 + 1.0))
        / (F.col("_tf") + k1 * (1.0 - b) + k1 * b * rel_len)
    )
    return (
        joined.withColumn("_s", F.round(score, 9).cast("decimal(18,9)"))
        .groupBy(id_col)
        .agg(
            F.sum("_s").cast("double").alias("bm25"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


BM25_BUCKETS = 64


def build_bm25_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = BM25_BUCKETS,
) -> dict[str, DataFrame]:
    """Build the persisted BM25 retrieval index — four parts for
    ``index_store.save_index(path, _partition_by={"postings":
    ["term_bucket"]}, **index)``:

    - ``postings`` (term_bucket, term, doc_id, tf, dl): the inverted
      index. ``term_bucket = crc32(term) % n_buckets`` so the part can
      be written Hive-partitioned on a BOUNDED key (per-term dirs are
      unbounded): a serve for q query terms reads only their <= q
      buckets' files — serve I/O scales with the query, not the
      corpus. crc32 is computable driver-side (zlib.crc32) for the
      serve filter and engine-stable. ``dl`` is the document's token
      count DENORMALIZED onto its posting rows (the Lucene-norms
      trick, columnar form): the BM25 length normalization needs dl
      for every MATCHED doc, and reading it from a separate per-doc
      part made serve I/O corpus-proportional — ``tf.join(doclens)``
      scanned every doc's row to match a query-sized set (measured
      r15, SCALE.md: 2.56M doclens rows read for 4,919 matches at
      512x). Inlined, the serve reads ZERO doclens rows at any corpus
      size for ~20% more bytes in the (already skinny) postings part.
    - ``doclens`` (doc_id, dl) — per-doc token counts; the build/merge
      source of truth for stats and the per-doc normalization, and the
      serve fallback for indexes written before dl inlining;
    - ``dfreq`` (term, df) — per-term document frequency, maintained
      incrementally (batch counts add — same contract as winnowing's
      (fp, df) part);
    - ``stats`` — ONE row (n_docs, total_len).

    Corpus text is tokenized during THIS build and never again:
    ``bm25_from_index`` serves entirely from the stored parts and
    equals ``bm25_scores`` recomputed from text (unit-pinned), and
    ``merge_bm25_index`` appends a batch without a corpus pass
    (append == rebuild: postings/doclens are per-doc rows, df counts
    and stats add over disjoint docs)."""
    if n_buckets < 1:
        # driver-side and named; the in-plan crc32 % n_buckets would
        # ANSI-abort mid-job (n=0) or write junk buckets (n<0) instead
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("term"))
    tok = tracked_persist(tok)  # postings + doclens + dfreq
    doclens = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    tf_rows = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # dfreq BEFORE the doclens join: the join drops NULL-id rows (a
    # NULL doc can never be served), but such a document still
    # CONTAINS its terms — df must count it, exactly as bm25_scores'
    # text path does, or serve scores diverge from recompute on
    # corpora with a corrupt NULL-id row (stats' n_docs likewise
    # counts it via doclens' NULL group)
    dfreq = tf_rows.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    postings = (
        tf_rows.withColumn(
            "term_bucket", (F.crc32(F.col("term").cast("binary")) % n_buckets).cast("int")
        )
        # one build-time shuffle join per corpus pass buys the inline
        # dl; doclens is the small side of the two and broadcastable
        # per-batch at merge time
        .join(doclens, "doc_id")
        .select("term_bucket", "term", "doc_id", "tf", "dl")
    )
    stats = doclens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    return {"postings": postings, "doclens": doclens, "dfreq": dfreq, "stats": stats}


def merge_bm25_index(
    index: dict[str, DataFrame],
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = BM25_BUCKETS,
) -> dict[str, DataFrame]:
    """Incremental BM25 index maintenance: extend stored parts with a
    new batch WITHOUT re-tokenizing the corpus — only the batch is
    tokenized; postings/doclens append (per-doc rows), dfreq adds
    batch counts via one outer join on term, stats adds one row.
    Batch ids must be new (single-writer contract, as every index
    family here). Equals ``build_bm25_index`` over corpus+batch
    exactly (unit-pinned)."""
    b_idx = build_bm25_index(batch, text_col, id_col, n_buckets)
    merged_df = (
        index["dfreq"].withColumnRenamed("df", "_df_a")
        .join(b_idx["dfreq"].withColumnRenamed("df", "_df_b"), "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("_df_a"), F.lit(0))
                + F.coalesce(F.col("_df_b"), F.lit(0))
            ).cast("long").alias("df"),
        )
    )
    merged_stats = (
        index["stats"].unionByName(b_idx["stats"])
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_len").cast("long").alias("total_len"),
        )
    )
    return {
        "postings": index["postings"].unionByName(b_idx["postings"]),
        "doclens": index["doclens"].unionByName(b_idx["doclens"]),
        "dfreq": merged_df,
        "stats": merged_stats,
    }


def bm25_query_buckets(
    query_terms: tuple[str, ...], n_buckets: int = BM25_BUCKETS
) -> list[int]:
    """The term_bucket values a query touches — computed driver-side
    with zlib.crc32 (identical to Spark's crc32 on the utf-8 bytes),
    so the serve filter is a LITERAL partition predicate the parquet
    source prunes on."""
    import zlib

    if n_buckets < 1:
        # mod by 0 raises here, driver-side and named — the in-plan
        # twin (crc32 % n_buckets) would ANSI-abort mid-job instead
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return sorted({zlib.crc32(t.encode("utf-8")) % n_buckets for t in query_terms})


def bm25_from_index(
    index: dict[str, DataFrame],
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = BM25_BUCKETS,
) -> DataFrame:
    """BM25 retrieval SERVED from a persisted index (parts from
    ``build_bm25_index``, typically via ``load_bm25_index``) —
    identical output to ``bm25_scores`` over the corpus text with the
    same terms (both run ``_bm25_score_parts``; unit-pinned), but the
    serve plan never tokenizes anything: postings are filtered by the
    query's term_bucket LITERALS first (with the postings part
    Hive-partitioned by term_bucket, the parquet source reads only
    those <= |query| buckets' files) then by term; dfreq joins
    broadcast; per-doc lengths ride ON the posting rows (inline dl),
    so the corpus-sized doclens part is never read at serve time.
    Per-batch serve cost scales with posting-list sizes of the query
    terms, not the corpus.

    Degraded inputs stay correct, only slower:
    - postings without ``term_bucket`` (``load_bm25_index`` dropped it
      because the manifest's bucket-width stamp was missing or didn't
      match ``n_buckets``): the bucket prune is SKIPPED — every
      postings file is scanned, filtered on term alone. Pruning with
      a mismatched width would read the WRONG buckets and silently
      lose matches; that silent false-negative is the failure mode
      the stamp rules out.
    - postings without ``dl`` (an index built before dl inlining):
      falls back to the doclens join — the corpus-proportional serve
      term this layout exists to remove; rebuild to re-enable."""
    postings = index["postings"]
    if "term_bucket" in postings.columns:
        buckets = bm25_query_buckets(query_terms, n_buckets)
        postings = postings.filter(F.col("term_bucket").isin(buckets))
    qtf = postings.filter(F.col("term").isin(*query_terms))
    if "dl" in qtf.columns:
        qtf = qtf.select(
            "doc_id", "term", F.col("tf").alias("_tf"), F.col("dl").alias("_dl")
        )
        dl = None
    else:
        qtf = qtf.select("doc_id", "term", F.col("tf").alias("_tf"))
        dl = index["doclens"].select("doc_id", F.col("dl").alias("_dl"))
    dfreq = (
        index["dfreq"]
        .filter(F.col("term").isin(*query_terms))
        .select("term", F.col("df").alias("_df"))
    )
    stats = index["stats"].select(
        F.col("n_docs").alias("_n_docs"), F.col("total_len").alias("_total_len")
    )
    return _bm25_score_parts(qtf, dfreq, dl, stats, "doc_id", k1, b)


def save_bm25_index(
    path: str,
    index: dict[str, DataFrame],
    n_buckets: int = BM25_BUCKETS,
) -> None:
    """Persist a ``build_bm25_index`` result with the postings part
    Hive-partitioned by term_bucket AND the bucket width STAMPED into
    the index manifest. Stored term_bucket values were computed with
    THIS build's ``n_buckets``; a serve running a different width
    computes crc32 buckets with the new width, partition-prunes to the
    wrong directories and returns silently incomplete postings — no
    error (the vec-gate silent-misprune class, ADVICE r15 /
    streaming/vector_dedup.save_embedding_index). Load with
    ``load_bm25_index``, which verifies the stamp and falls back to an
    unpruned scan on mismatch; the raw ``index_store.load_index``
    skips that check."""
    from syncquill_spark.sources.index_store import save_index

    save_index(
        path,
        _partition_by={"postings": ["term_bucket"]},
        _meta={"bm25_n_buckets": n_buckets},
        **index,
    )


def load_bm25_index(
    spark, path: str, n_buckets: int = BM25_BUCKETS
) -> dict[str, DataFrame]:
    """BM25 index parts from storage, with the manifest's bucket-width
    stamp verified against the width THIS serve will prune with.

    On mismatch — an index written under a different ``n_buckets`` —
    or a missing stamp (written before meta stamping, width
    unverifiable), ``term_bucket`` is DROPPED from the postings frame,
    so ``bm25_from_index`` takes the unpruned scan: every postings
    file is read and filtered on term, nothing is missed. Correctness
    over speed; rebuild with ``save_bm25_index`` to re-enable
    pruning."""
    import warnings

    from syncquill_spark.sources.index_store import (
        load_index,
        load_index_manifest,
    )

    parts = load_index(spark, path)
    stored = load_index_manifest(path)["meta"].get("bm25_n_buckets")
    if stored != n_buckets and "term_bucket" in parts["postings"].columns:
        warnings.warn(
            f"load_bm25_index: stored bucket width {stored!r} != serve "
            f"width {n_buckets} — disabling postings partition pruning "
            "(unpruned scan; rebuild the index with save_bm25_index to "
            "re-enable)",
            stacklevel=2,
        )
        parts["postings"] = parts["postings"].drop("term_bucket")
    return parts


def append_bm25_index(
    path: str,
    corpus_index: dict[str, DataFrame],
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = BM25_BUCKETS,
) -> None:
    """The complete nightly BM25 merge in ONE atomic commit: tokenize
    only the batch, append its row parts (postings, doclens)
    batch-sized, rewrite the small aggregated parts (dfreq, stats)
    with their merged frames — ``index_store.append_index`` semantics,
    so readers see the whole old or the whole new index.

    Refuses (named errors, before anything is written) when the stored
    index can't legally take this append:
    - bucket-width stamp missing or != ``n_buckets``: batch postings
      would carry term_bucket values from a DIFFERENT hash space than
      the stored directories — every future pruned serve silently
      loses the batch;
    - stored postings lack the inline ``dl`` column (pre-inlining
      format): appending dl-bearing rows would commit a mixed parquet
      schema that only fails (or silently drops dl) at read time.
    Rebuild with ``save_bm25_index`` in either case."""
    from syncquill_spark.sources.index_store import (
        append_index,
        load_index_manifest,
    )

    stored = load_index_manifest(path)["meta"].get("bm25_n_buckets")
    if stored != n_buckets:
        raise ValueError(
            f"append_bm25_index: stored bucket width {stored!r} != batch "
            f"width {n_buckets}; appending would mix two term_bucket hash "
            "spaces in one part (silently wrong pruned serves). Rebuild "
            "with save_bm25_index."
        )
    if "dl" not in corpus_index["postings"].columns:
        raise ValueError(
            "append_bm25_index: stored postings have no inline dl column "
            "(index built before dl inlining); appending dl-bearing rows "
            "would commit a mixed parquet schema. Rebuild with "
            "save_bm25_index."
        )
    merged = merge_bm25_index(corpus_index, batch, text_col, id_col, n_buckets)
    batch_only = build_bm25_index(batch, text_col, id_col, n_buckets)
    append_index(
        path,
        _partition_by={"postings": ["term_bucket"]},
        _replace={"dfreq": merged["dfreq"], "stats": merged["stats"]},
        postings=batch_only["postings"],
        doclens=batch_only["doclens"],
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate: word-chunks of
    <=4 chars count one subword each (ceil(len/4)), punctuation runs
    count one each — a deterministic stand-in for a real tokenizer's
    token count (swap in tiktoken via pandas_udf off the hot path)."""
    toks = _tokens(text_col)
    subwords = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens_ws"),
        subwords.alias("n_tokens_bpeish"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per document."""
    return df.select(
        F.col(id_col),
        rolling_fingerprint(_tokens(text_col)).alias("fingerprint"),
    )


def readability_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch-style readability per document via an Arrow-batched
    pandas_udf — the sanctioned Python path: one vectorized call per
    Arrow batch, never per row.

    score = 206.835 - 1.015*(words/sentences) - 84.6*(vowelgroups/words)

    with sentences = periods+1 and vowel groups as a syllable proxy —
    all per-ROW arithmetic (counts -> a few double ops), so results are
    bit-identical to the SQL oracle: no cross-row float accumulation,
    and IEEE double mul/div/sub are exactly specified. This is the
    template for tokenizer/model scoring UDFs (tiktoken, fasttext):
    batch in, numpy out, deterministic."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no signature annotations: `from __future__ import annotations`
    # stringifies them and pandas_udf can't resolve 'pd.Series' lazily
    @pandas_udf("double")
    def _score(text):
        words = text.str.strip().str.split(r"\s+").str.len().astype("float64")
        sentences = (text.str.count(r"\.") + 1).astype("float64")
        vowel_groups = text.str.lower().str.count(r"[aeiou]+").astype("float64")
        return pd.Series(
            206.835 - 1.015 * (words / sentences) - 84.6 * (vowel_groups / words)
        )

    return df.select(F.col(id_col), _score(F.col(text_col)).alias("readability"))


def top_distinctive_terms(
    df: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Most DISTINCTIVE terms per document by tf-idf-family scoring:
    score = tf * N / df (term frequency x linear inverse document
    frequency). Complements term_stats' top-by-frequency view: a
    document's most frequent terms are usually corpus-wide stopwords;
    its highest tf*N/df terms are what it is ABOUT (keyword
    extraction / topic tagging over a training corpus).

    Linear idf (N/df) instead of the textbook log(N/df), on purpose:
    the score stays ONE IEEE division of two exact integers
    (tf*N <= 2^53, df), which both engines compute bit-identically —
    log() is not correctly-rounded-guaranteed across libm
    implementations, so a log-idf ranking could flip near-ties
    between engines. Ranking (score desc, term asc) is total.

    Scale shape: same two map-side-combine aggregations as the
    inverted-index build in term_stats (tok -> (doc,term) tf ->
    term df), df broadcast back onto tf, WindowGroupLimit top-n per
    doc. The corpus size N joins as a broadcast one-row aggregate —
    no driver-side count.

    Output: (doc_id, term, rk) — ints + term string, hash-stable.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_nd"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_score",
            (F.col("tf") * F.col("_nd")).cast("double") / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select(id_col, "term", "rk")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window prep step of a training/RAG pipeline (long docs
    become model-sized pieces; the overlap preserves cross-boundary
    context).

    Chunk starts are 0, stride, 2*stride, ... (stride = chunk_tokens -
    overlap) while start < n_tokens; the last chunk may be short. A
    document always yields at least one chunk (whitespace split of any
    string is non-empty).

    Scale shape: one projection + one posexplode — no shuffle, no UDF;
    output size is input size * (1 + overlap/stride). All slicing is
    on the pre-split token array, so the regex split runs once per doc.

    Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("_t")).select(
        F.col(id_col),
        "_t",
        F.sequence(
            F.lit(0), F.greatest(F.size("_t") - 1, F.lit(0)), F.lit(stride)
        ).alias("_starts"),
    )
    chunk = F.slice(F.col("_t"), F.col("_start") + 1, chunk_tokens)
    return base.select(
        F.col(id_col), F.posexplode("_starts").alias("chunk_id", "_start"), "_t"
    ).select(
        F.col(id_col),
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def dedup_segments_within_doc(
    df: DataFrame,
    delimiter: str = "\n",
    text_col: str = "text",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Remove duplicate SEGMENTS (lines/paragraphs) inside each
    document, keeping the first occurrence in order — the intra-doc
    half of dedup (navigation bars, repeated footers, scraped-page
    boilerplate duplicated within one page), complementing the
    corpus-level pair operators.

    Pure projection (split -> order-preserving distinct -> rejoin), no
    shuffle, no UDF, and LINEAR per doc: Spark's `array_distinct`
    keeps the FIRST occurrence of each element in encounter order
    (hash-set sweep in the JVM) — exactly the first-occurrence
    semantics the earlier interpreted-HOF form computed in O(s^2) via
    array_position-inside-filter (the last such hot-surface HOF,
    evicted per the round-5 verdict; equality to the old form is
    pinned by test_segment_dedup_long_doc_linear's semantics checks).
    A pathological scraped doc with ~1e5 repeated lines is now one
    linear pass instead of minutes of quadratic probing. Audit columns
    report segment counts so a pipeline can quantify what was removed.
    """
    with_segs = df.withColumn("_segs", F.split(F.col(text_col), F.lit(delimiter)))
    return (
        with_segs.select("*", F.array_distinct(F.col("_segs")).alias("_kept"))
        .withColumn("n_segments", F.size("_segs").cast("long"))
        .withColumn("n_unique_segments", F.size("_kept").cast("long"))
        .withColumn(out_col, F.array_join(F.col("_kept"), delimiter))
        .drop("_segs", "_kept")
    )


def dedup_lines_across(
    df: DataFrame,
    min_docs: int = 2,
    mode: str = "drop",
    delimiter: str = "\n",
    min_line_chars: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_deduped",
) -> DataFrame:
    """CROSS-document line dedup — the corpus half of segment dedup
    (``dedup_segments_within_doc`` is the intra-doc half): a line
    whose exact content occurs in >= ``min_docs`` DISTINCT documents
    is boilerplate (cookie banners, nav bars, license blurbs), and the
    public CC pipelines remove it before document-level dedup ever
    runs (C4 drops policy lines; CCNet/RefinedWeb dedup lines across
    each shard). Documents are rebuilt with their surviving lines in
    original order.

    Modes: ``"drop"`` removes EVERY occurrence of a cross-doc
    duplicated line (the boilerplate policy — no occurrence is more
    legitimate than another); ``"first"`` keeps only the globally
    first occurrence, ordered by (id, position) — the CCNet shard
    policy, which preserves one copy of genuinely quoted content.
    Lines whose trimmed length is < ``min_line_chars`` (blank lines,
    stray punctuation) never count as duplicates and are always kept:
    they are document STRUCTURE, and dropping every blank line
    because blank lines are everywhere would destroy it.

    Shapes at 100 TB: line occurrences travel once as
    (id, pos, h=md5-int64) rows; the distinct-doc count shuffles only
    (h, id) pairs with map-side combine; the flagged-line set (lines
    in >= min_docs docs) is tiny relative to the distinct-line count
    and broadcasts under AQE, so the occurrence-side join is
    shuffle-free; the only text-sized shuffle is the per-doc rebuild
    groupBy — inherent to rewriting documents, bounded per doc.
    Deterministic: positions give a total order per doc; "first"
    picks min(struct(id, pos)) — a total order for orderable ids.
    ``delimiter`` is a literal split/rejoin token (same convention as
    ``dedup_segments_within_doc``).

    Output: the input row set with ``out_col`` (rebuilt text; null in
    == null out), ``n_lines`` and ``n_lines_kept`` audit counts.
    """
    from syncquill_spark.functions.hashing import portable_hash60

    if mode not in ("drop", "first"):
        raise ValueError(f"mode must be 'drop' or 'first', got {mode!r}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")

    segs = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), F.lit(delimiter))).alias(
            "_pos", "_line"
        ),
    ).withColumn("_h", portable_hash60(F.col("_line")))
    countable = segs.filter(F.length(F.trim("_line")) >= min_line_chars)
    per_line = countable.groupBy("_h").agg(
        F.count_distinct("_id").alias("_n_docs"),
        F.min(F.struct("_id", "_pos")).alias("_first"),
    )
    flagged = per_line.filter(F.col("_n_docs") >= min_docs)

    if mode == "drop":
        kept = segs.join(flagged.select("_h"), "_h", "left_anti")
    else:
        kept = segs.join(flagged.select("_h", "_first"), "_h", "left").filter(
            F.col("_first").isNull()
            | (F.struct("_id", "_pos") == F.col("_first"))
        )

    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            delimiter,
        ).alias("_rebuilt"),
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
    )
    return (
        df.join(rebuilt.withColumnRenamed("_id", id_col), id_col, "left")
        .withColumn(
            "n_lines",
            F.when(
                F.col(text_col).isNotNull(),
                F.size(F.split(F.col(text_col), F.lit(delimiter))).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "n_lines_kept",
            F.when(F.col(text_col).isNotNull(), F.coalesce("_n_kept", F.lit(0)))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            out_col,
            F.when(
                F.col(text_col).isNotNull(),
                F.coalesce(F.col("_rebuilt"), F.lit("")),
            ),
        )
        .drop("_rebuilt", "_n_kept")
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document coverage against the corpus' own top-``vocab_size``
    vocabulary: (doc_id, n_tokens, n_oov) where n_oov counts token
    OCCURRENCES outside the vocabulary — the tokenizer-planning view of
    a corpus (what OOV rate would a V-entry vocab leave?) and a quality
    signal (high-OOV docs are often non-linguistic noise).

    The vocabulary is deterministic: terms ranked by (count desc, term
    asc) — a total order, so both engines select the identical set.

    Scale shape: vocabulary construction is the inverted-index
    aggregation (explode -> count, map-side combine) followed by an
    exact top-V rank over TERMS (corpus-vocabulary cardinality, not
    corpus size; WindowGroupLimit keeps the exchange skinny). Coverage
    is one equi-join of exploded tokens against the V-row vocab —
    broadcast under AQE — then a per-doc count. Nothing wide ever
    shuffles: tokens travel as (doc_id, term) pairs.
    """
    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("_t"))
    counts = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy(F.col("_c").desc(), F.col("_t").asc())
    vocab = (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= vocab_size)
        .select("_t")
    )
    tagged = toks.join(vocab.withColumn("_inv", F.lit(1)), "_t", "left")
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-gram, slide a ``window``-wide window
    over the hash sequence, and keep each window's MINIMUM hash —
    recording a selected hash once per contiguous run it wins
    (standard winnowing dedup: a new fingerprint is emitted only when
    the winning POSITION changes). Guarantees at least one shared
    fingerprint for any match of length >= window + k - 1 tokens, at
    ~2/(window+1) of the k-gram density — the classic
    substring-robust alternative to whole-doc MinHash for plagiarism /
    quote detection.

    Output: (doc_id, gram_pos, fp) rows — gram_pos is the 0-based
    k-gram index of the selected hash; all columns exact integers, so
    the DuckDB oracle replays the identical selection.

    Ties break toward the RIGHTMOST minimal hash (the paper's rule,
    which maximizes run lengths).

    Execution shape — WINDOW FUNCTIONS over exploded gram rows, not a
    per-row higher-order scan: the first implementation computed each
    window's rightmost min with slice/reverse/array_position lambdas
    and read 102s at sf0.1 — interpreted HOFs evaluate one lambda call
    per element with zero subexpression sharing (~6 array ops x
    n_grams x corpus), the exact hot-surface class the round-5 verdict
    evicted from the similarity family. This form posexplodes to
    (doc, pos, hash) rows and computes each window start's pick as
    ``min_by(struct(pos, hash), struct(hash, -pos))`` over a ROWS
    BETWEEN 0 AND w-1 frame (the selected hash rides in the value
    struct, so no join-back against the gram rows is needed to
    recover it) — min hash, rightmost tie, entirely JVM window aggregation
    (3.6-4.3s warm for the same corpus, ~25x). Cost: one shuffle on
    the doc id
    (the window partition) over skinny int rows; for 100 TB the
    partition key is the doc id so no partition ever exceeds one doc's
    grams. For boilerplate-scale matching across a corpus, join
    fingerprints on (fp) — candidate volume is the winnowed density,
    not the token count.
    """
    from syncquill_spark.functions.hashing import (
        portable_hash60,
        word_shingles_from_tokens,
    )

    # window=0 silently selected ZERO fingerprints (an empty ROWS
    # frame) — a wrong-by-construction result for a caller error; the
    # winnowing guarantee needs window >= 1 (k is range-checked inside
    # word_shingles_from_tokens). r13 boundary battery.
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    # tokens staged in their own projection (repo HOF rule: the
    # shingle expression references its token input k+1 times and
    # interpreted evaluation has no subexpression sharing)
    grams = df.select(
        F.col(id_col), _tokens(text_col).alias("_tk")
    ).select(
        F.col(id_col),
        word_shingles_from_tokens(F.col("_tk"), k).alias("_g"),
    )
    hashes = grams.select(
        F.col(id_col),
        F.transform(F.col("_g"), lambda g: portable_hash60(g)).alias("_h"),
    )
    exploded = hashes.select(
        F.col(id_col),
        F.size("_h").alias("_n"),
        F.posexplode("_h").alias("_pos", "_hv"),
    )
    wf = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    # rightmost min of the window: lexicographic min of (hash, -pos).
    # The winning row's HASH rides in the min_by VALUE struct next to
    # its position — the earlier form returned only the position and
    # join-backed the selections against `exploded` to re-fetch the
    # hash, which re-evaluated the whole scan→shingle→hash→explode
    # lineage a second time and paid an (id, pos) shuffle of both
    # sides (guide §2.4: duplicated subtrees are removable shuffles;
    # r16 optimization — measured ~2x on this operator alone). Same
    # ordering key ⇒ same winning row ⇒ identical (gram_pos, fp).
    pick = F.min_by(
        F.struct(F.col("_pos").alias("p"), F.col("_hv").alias("h")),
        F.struct(F.col("_hv"), (-F.col("_pos")).alias("_np")),
    )
    starts = exploded.withColumn("_pick", pick.over(wf)).filter(
        F.col("_pos") <= F.col("_n") - window  # full windows only
    )
    return (
        starts.select(
            F.col(id_col),
            F.col("_pick.p").cast("long").alias("gram_pos"),
            F.col("_pick.h").alias("fp"),
        )
        .dropDuplicates([id_col, "gram_pos"])
    )


def winnowing_match_pairs(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document SUBSTRING-match detection from winnowing
    fingerprints: (id_a, id_b, n_shared) for document pairs sharing
    >= ``min_shared`` distinct fingerprints — the quote / plagiarism /
    shared-boilerplate detector that complements whole-document
    MinHash (MinHash scores global set overlap; winnowing guarantees a
    hit for any contiguous run of >= window + k - 1 shared tokens, no
    matter how different the rest of the documents are).

    ``max_fp_df`` drops fingerprints appearing in more than that many
    documents before the join — the hub-key cap, same role as the
    prefix filter in ngram_jaccard_pairs: a corpus-wide boilerplate
    fingerprint would otherwise put every document in one bucket and
    make the candidate join quadratic. Capped fingerprints are exactly
    the ones that carry no pair-discriminating signal.

    Scale shape: per-doc distinct fingerprints (skinny (id, fp)
    rows) -> optional df-cap (one count aggregation over fp, a
    semi-join back) -> self equi-join on fp (id_a < id_b) -> count per
    pair. Every shuffle key is an int64; candidate volume is the
    winnowed density (~2/(window+1) of gram count), not token count.
    """
    fps = (
        winnowing_fingerprints(
            df, k=k, window=window, text_col=text_col, id_col=id_col
        )
        .select(F.col(id_col), "fp")
        .dropDuplicates([id_col, "fp"])
    )
    # feeds the df-cap aggregation AND both candidate-join sides —
    # unpersisted, the winnowing selection subtree (tokenize, k-gram
    # hash, per-doc window minima — the dominant cost at corpus
    # scale) runs once PER consumer (guide §2.4; the multi-consumer
    # persist doctrine of minhash_lsh_pairs/bigram_commonness).
    # Tracked so a batch driver releases it between calls (_cache.py).
    fps = tracked_persist(fps)
    if max_fp_df is not None:
        rare = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_fp_df)
            .select("fp")
        )
        fps = fps.join(rare, "fp")
    a = fps.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = fps.select(F.col("fp").alias("_fpb"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, (a["fp"] == b["_fpb"]) & (a["id_a"] < b["id_b"]))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def bigram_commonness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Statistical-LM quality signal (the CCNet-perplexity idea in the
    repo's determinism doctrine): score every document by how likely
    its word transitions are UNDER THE CORPUS'S OWN bigram model.
    Per occurrence of bigram (w1, w2) the score is the quantized
    conditional frequency ``q = (scale * c(w1,w2)) div c(w1·))`` —
    c(w1,w2) corpus bigram count, c(w1·) count of bigrams starting
    with w1 — and a document reports the exact integer sum and its
    bigram count. Low ``sum_q / n_bigrams`` = transitions the corpus
    considers rare (gibberish, OCR noise, wrong-language fragments);
    high = fluent common text. This is the doctrine-compliant LINEAR
    surrogate for LM perplexity: no log/exp anywhere (SCALE.md
    determinism #6 — transcendentals are not correctly-rounded across
    libm implementations), and the only division is exact INTEGER
    division, quantized before any cross-row accumulation (#3), so the
    output is engine-exact. (``scale * c12`` must fit int64: fine
    through c12 ~ 9e12 at the default scale; drop ``scale`` for
    larger corpora.)

    Scale shape: bigram occurrences travel as skinny
    (doc_id, h1, h12) int64 rows (hashes of w1 and "w1 w2" — the
    md5-derived portable hash, so the DuckDB oracle reproduces them);
    the model is two count aggregations over those same rows
    (map-side combined); scoring is two int64 equi-joins back (c1 is
    unigram-vocab-sized — broadcastable; c12 vocab^2-bounded —
    AQE-picked) and one per-doc sum. Docs with < 2 tokens have no
    bigrams and are absent from the output.

    Output: (doc_id, n_bigrams, sum_q) — all exact int64.
    """
    # three consumers (c12, c1, the scoring join) — without persist the
    # tokenize+explode+md5 subtree runs once PER consumer: three corpus
    # passes at 100 TB (observed as three parquet scans in the audited
    # plan). Same pattern as the shingle/unit-vector persists.
    occ = bigram_occurrences(df, text_col=text_col, id_col=id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    c1, c12 = bigram_model_counts(occ)
    # inner joins: the model is built from these very rows, so every
    # (h1, h12) is present — identical to bigram_score_against's
    # left-join form when model == corpus (the lifecycle row's pin)
    scored = (
        occ.join(c12, "h12")
        .join(c1, "h1")
        .withColumn("_q", F.expr(f"({scale} * c12) div c1"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_q").cast("long").alias("sum_q"),
    )


def bigram_occurrences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Skinny per-occurrence bigram rows ``(id_col, h1, h12)`` — h1 =
    portable hash of w1, h12 = portable hash of "w1 w2" (md5-derived
    int64, so DuckDB oracles reproduce them). The shared extraction
    under ``bigram_commonness`` (one-shot) and the persisted-model
    lifecycle (``build_bigram_model`` / ``bigram_score_against``)."""
    from syncquill_spark.functions.hashing import portable_hash60

    toks = df.select(F.col(id_col), _tokens(text_col).alias("_tk"))
    n = F.size("_tk")
    # per-occurrence bigram rows: w1 = tk[i], pair = "tk[i] tk[i+1]"
    m = F.greatest(n - 1, F.lit(0))
    return toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("_tk", 1, m),
                F.slice("_tk", 2, m),
                lambda a, b: F.struct(
                    a.alias("_w1"), F.concat_ws(" ", a, b).alias("_w12")
                ),
            )
        ).alias("_bg"),
    ).select(
        F.col(id_col),
        portable_hash60(F.col("_bg._w1")).alias("h1"),
        portable_hash60(F.col("_bg._w12")).alias("h12"),
    )


def bigram_model_counts(occ: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The bigram model's two persisted parts from occurrence rows:
    ``unigrams`` (h1, c1) — occurrences of bigrams starting with w1 —
    and ``bigrams`` (h12, c12). Two map-side-combined count
    aggregations over the SAME rows (persist ``occ`` when both run in
    one job). c1 is unigram-vocab-sized (broadcastable at serve time);
    c12 is vocab²-bounded and rides AQE."""
    c1 = occ.groupBy("h1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    c12 = occ.groupBy("h12").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    return c1, c12


def build_bigram_model(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """One-time corpus bigram-LM model build: (unigrams, bigrams) =
    ((h1, c1), (h12, c12)) count tables — persist both via
    ``index_store.save_index(path, unigrams=..., bigrams=...)``, the
    same manifest + atomic-exchange lifecycle as the MinHash / SRP /
    winnowing indexes. This is how a CCNet-style quality filter
    actually deploys: the model is trained in a nightly corpus pass,
    and every ingest batch is scored against the STORED counts
    (``bigram_score_against``) without touching corpus text again."""
    occ = bigram_occurrences(corpus, text_col=text_col, id_col=id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return bigram_model_counts(occ)


def merge_bigram_model(
    model_c1: DataFrame,
    model_c12: DataFrame,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Incremental model maintenance: stored (h1, c1)/(h12, c12) plus
    a new batch's own occurrence counts -> merged model. Counts are
    per-occurrence totals over a bag of documents, so appending new
    docs simply ADDS their counts — append == rebuild by construction
    (the registry's ``storage_bigram_model`` pins that identity to
    ``text_bigram_lm``'s own oracle). Cost: one batch-sized
    tokenization + two batch-sized aggregations + two outer joins on
    int64 hashes — never a corpus pass; the same batch-sized-nightly
    contract as ``merge_winnowing_df``."""
    occ = bigram_occurrences(new_df, text_col=text_col, id_col=id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    b1, b12 = bigram_model_counts(occ)

    def _add(stored: DataFrame, batch: DataFrame, key: str, cnt: str) -> DataFrame:
        return (
            stored.withColumnRenamed(cnt, "_ca")
            .join(batch.withColumnRenamed(cnt, "_cb"), key, "full_outer")
            .select(
                key,
                (
                    F.coalesce(F.col("_ca"), F.lit(0))
                    + F.coalesce(F.col("_cb"), F.lit(0))
                ).cast("long").alias(cnt),
            )
        )

    return _add(model_c1, b1, "h1", "c1"), _add(model_c12, b12, "h12", "c12")


def bigram_score_against(
    batch: DataFrame,
    model_c1: DataFrame,
    model_c12: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """The INGEST-TIME quality gate: score a new batch's documents
    against a STORED bigram model — only the batch is tokenized; the
    corpus side is the persisted (h1, c1)/(h12, c12) count tables.
    A bigram the model never saw contributes q = 0 (maximally rare —
    exactly the judgment a trained filter should pass on unseen
    transitions); n_bigrams still counts it, so sum_q / n_bigrams
    stays the comparable commonness rate. When the batch IS the
    model's own corpus, every bigram is present and the output equals
    ``bigram_commonness`` row-for-row — the identity the registry's
    ``storage_bigram_model`` asserts through a save/load/merge cycle.

    Scale shape: one batch-sized tokenize+explode, two int64
    equi-joins against the stored counts (c1 broadcastable, c12 rides
    AQE), one per-doc sum. Streaming deployment: the per-doc groupBy
    is a streaming aggregation, so wrap in ``foreachBatch`` (same
    recipe as ``winnowing_matches_against``).

    Output: (id_col, n_bigrams, sum_q) — all exact int64.
    """
    occ = bigram_occurrences(batch, text_col=text_col, id_col=id_col)
    scored = (
        occ.join(model_c12, "h12", "left")
        .join(model_c1, "h1", "left")
        .withColumn(
            "_q", F.coalesce(F.expr(f"({scale} * c12) div c1"), F.lit(0))
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_q").cast("long").alias("sum_q"),
    )


def prune_bigram_model(
    model_c1: DataFrame,
    model_c12: DataFrame,
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Model COMPRESSION for serve-time broadcast — the count-pruning
    step a deployed n-gram LM runs before shipping the model to the
    scorers (KenLM-style pruning, minus the backoff machinery this
    linear surrogate doesn't have): drop bigram rows with
    ``c12 < min_count``. A pruned bigram scores exactly like an unseen
    one in ``bigram_score_against`` (left-join miss -> q = 0), so the
    semantic contract is crisp: per pruned OCCURRENCE the score drops
    by its old q = (scale*c12) div c1 < (scale*min_count)/c1 — bounded
    and tiny for rare transitions against a large c1, which is
    precisely why pruning them is safe. The unigram part is kept
    intact: it is vocab-sized (already broadcastable) and survivors'
    normalization must not shift when the tail is dropped —
    pruning must never INCREASE a surviving bigram's score.

    Why it matters at 100 TB: c12 is vocab²-bounded and heavy-tailed —
    on web corpora typically ~half its rows are hapax bigrams carrying
    ~zero score mass. min_count=2 roughly halves the serve-time join
    table; the scoring join flips from an AQE shuffle join to a plain
    broadcast once the pruned c12 fits the broadcast threshold.

    Deterministic and exact: a pure filter — no re-counting, no
    re-normalization; ``merge_bigram_model`` keeps working on the
    UNPRUNED stored parts (prune on load/serve, never in the store,
    or increments could resurrect a pruned count inconsistently).

    Output: (c1 unchanged, pruned c12).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    return model_c1, model_c12.filter(F.col("c12") >= min_count)


def bm25_topk_from_index(
    index: dict[str, DataFrame],
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = BM25_BUCKETS,
) -> DataFrame:
    """Top-k retrieval from the persisted BM25 index: the serve scores
    (`bm25_from_index`) ordered by (bm25 DESC, doc_id ASC — total,
    deterministic) and limited to k. orderBy+limit compiles to
    TakeOrdered: each partition keeps its local top-k and only k rows
    per partition reach the driver-side merge — no global sort."""
    scored = bm25_from_index(index, query_terms, k1, b, n_buckets)
    return scored.orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    ).limit(k)


def compression_ratios(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document — the DataComp/RefinedWeb
    quality signal the token-level heuristics miss from the other side:
    HIGHLY compressible text (ratio << 1 of typical prose) is
    boilerplate/template/repetition; nearly INcompressible text
    (ratio ~1) is random noise, encoded binary, or ciphertext. Typical
    natural prose sits in a band; filter both tails.

    Arrow-batched ``pandas_udf`` (the sanctioned Python path — zlib is
    stdlib C, one call per document, no model download); per-row
    integer byte counts, no cross-row accumulation, deterministic for
    a pinned zlib version + level. No SQL oracle twin exists (DuckDB
    has no zlib), so this ships unit-pinned against direct zlib like
    the other stdlib-backed UDFs.

    Output: (id, n_bytes, n_bytes_zlib, compression_ratio) — exact
    int64 counts plus their double ratio (per-row division only).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _zbytes(text):
        import zlib

        return pd.Series(
            [
                len(zlib.compress(t.encode("utf-8"), level)) if t is not None else 0
                for t in text
            ],
            dtype="int64",
        )

    n_bytes = F.octet_length(F.col(text_col)).cast("long")
    out = df.select(
        F.col(id_col),
        F.coalesce(n_bytes, F.lit(0)).alias("n_bytes"),
        _zbytes(F.col(text_col)).alias("n_bytes_zlib"),
    )
    return out.withColumn(
        "compression_ratio",
        F.when(
            F.col("n_bytes") > 0,
            F.col("n_bytes_zlib").cast("double") / F.col("n_bytes").cast("double"),
        ),
    )


# ---------------------------------------------------------------------------
# Supervised token-weight quality classifier (fastText / naive-Bayes
# surrogate) with the same persisted-model lifecycle as the bigram LM.
# ---------------------------------------------------------------------------


def token_occurrences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Skinny per-occurrence token rows ``(id_col, th)`` — th =
    portable md5-derived int64 of the lowercased token (so DuckDB
    oracles can reproduce it, same convention as
    ``bigram_occurrences``). Empty tokens (a null/blank document
    tokenizes to ``[""]``) are dropped: they carry no lexical
    evidence and would otherwise add a single spurious class-neutral
    feature to every empty document."""
    from syncquill_spark.functions.hashing import portable_hash60

    toks = df.select(F.col(id_col), _tokens(text_col).alias("_tk"))
    return toks.select(
        F.col(id_col),
        F.explode(F.filter("_tk", lambda t: t != F.lit(""))).alias("_tok"),
    ).select(F.col(id_col), portable_hash60(F.col("_tok")).alias("th"))


def _checked_label(label_col: str) -> Column:
    lbl = F.col(label_col).cast("long")
    return F.when(lbl.isin(0, 1), lbl).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"token classifier labels must be 0 or 1; got {label_col}="),
                F.coalesce(F.col(label_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )


def build_token_classifier(
    corpus: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train a token-evidence quality classifier from a LABELED seed
    corpus (label 1 = positive/high-quality, 0 = negative) — the
    linear, transcendental-free surrogate of the fastText / logistic
    classifiers the public curation pipelines train on
    Wikipedia-vs-CommonCrawl seed sets (GPT-3's LR quality filter,
    LLaMA/RedPajama's fastText "looks-like-references" model). The
    model is one count table ``(th, c_pos, c_neg)`` — per-token
    occurrence counts under each label — persisted via
    ``index_store.save_index(path, token_counts=...)`` with the same
    manifest + atomic-exchange lifecycle as the other seven index
    families; serve-time weights derive from the counts
    (``classifier_score_against``), so merge stays pure count
    addition. Any non-0/1 (or null) label raises in-plan rather than
    silently miscounting.

    Scale shape: occurrences travel as skinny (doc, th) int64 rows;
    the model is one map-side-combined aggregation over them; the
    count table is vocab-sized (broadcastable at serve time)."""
    occ = token_occurrences(corpus, text_col=text_col, id_col=id_col)
    lbl = corpus.select(F.col(id_col), _checked_label(label_col).alias("_lbl"))
    return (
        occ.join(lbl, id_col)
        .groupBy("th")
        .agg(
            F.sum("_lbl").cast("long").alias("c_pos"),
            F.sum(F.lit(1) - F.col("_lbl")).cast("long").alias("c_neg"),
        )
    )


def merge_token_classifier(
    model: DataFrame,
    new_df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental classifier maintenance: stored (th, c_pos, c_neg)
    plus a new labeled batch's own counts -> merged model. Counts are
    per-occurrence totals over a bag of documents, so appending new
    docs ADDS their counts — append == rebuild by construction, the
    same identity the bigram/winnowing/BM25 families pin. Cost: one
    batch-sized tokenization + one batch-sized aggregation + one
    full-outer join on int64 hashes — never a corpus pass."""
    batch = build_token_classifier(
        new_df, label_col=label_col, text_col=text_col, id_col=id_col
    )
    a = model.withColumnRenamed("c_pos", "_pa").withColumnRenamed("c_neg", "_na")
    b = batch.withColumnRenamed("c_pos", "_pb").withColumnRenamed("c_neg", "_nb")
    return a.join(b, "th", "full_outer").select(
        "th",
        (F.coalesce(F.col("_pa"), F.lit(0)) + F.coalesce(F.col("_pb"), F.lit(0)))
        .cast("long")
        .alias("c_pos"),
        (F.coalesce(F.col("_na"), F.lit(0)) + F.coalesce(F.col("_nb"), F.lit(0)))
        .cast("long")
        .alias("c_neg"),
    )


def classifier_score_against(
    batch: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Score a batch against a STORED token classifier — the
    ingest-time quality gate, deployed exactly like
    ``bigram_score_against``: only the batch is tokenized; the corpus
    side is the persisted count table. Per-token weight is the
    add-one-smoothed quantized positive rate
    ``w = (scale * (c_pos + 1)) div (c_pos + c_neg + 2)`` — pure
    integer division per determinism doctrine (no log-odds); a doc's
    score is the exact int64 sum of its occurrences' weights, and
    ``sum_w / n_tokens`` is the comparable positive-evidence rate in
    [0, scale]. A token the model never saw contributes exactly
    ``scale div 2`` (the smoothed zero-count weight — neutral
    evidence), via left-join COALESCE; n_tokens still counts it.
    Thresholds are a calibration knob: compose with
    ``quality_value_buckets`` / ``quality_percentile_filter`` to pick
    cutoffs per stratum instead of hard-coding one.

    Scale shape: one batch-sized tokenize+explode, one int64 equi-join
    against the vocab-sized count table (broadcastable — prune first
    with ``prune_token_classifier`` if the vocab outgrew the
    threshold), one per-doc sum. Streaming: per-doc groupBy is a
    streaming aggregation — wrap in ``foreachBatch``.

    Output: (id_col, n_tokens, sum_w) — all exact int64.
    """
    occ = token_occurrences(batch, text_col=text_col, id_col=id_col)
    neutral = scale // 2
    scored = occ.join(model, "th", "left").withColumn(
        "_w",
        F.coalesce(
            F.expr(f"({scale} * (c_pos + 1)) div (c_pos + c_neg + 2)"),
            F.lit(neutral).cast("long"),
        ),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("_w").cast("long").alias("sum_w"),
    )


# character class shared with the DuckDB oracle: C0 controls (minus
# \t\n\r, which are document structure), DEL, zero-width space/
# non-joiner/joiner, BOM. \x{..} escapes parse identically in Java
# regex and RE2, so ONE pattern string serves both engines.
INVISIBLES_CLASS = (
    r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}"
    r"\x{200B}-\x{200D}\x{FEFF}]"
)


def normalize_text(
    df: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    out_col: str = "text_norm",
    strip_invisibles: bool = True,
    collapse_ws: bool = False,
) -> DataFrame:
    """Unicode text normalization — the cleanup pass the public CC
    pipelines run before ANY hashing or tokenization (CCNet/RefinedWeb
    normalize + strip before dedup): without it, ``café`` composed and
    ``café`` decomposed hash differently and every downstream dedup /
    classifier / LM operator silently treats them as distinct content.

    Three steps, in an order both engines reproduce exactly:
    (1) strip invisibles (C0 controls except tab/newline/CR, DEL,
    zero-width space/joiners, BOM) with one JVM regexp — removing
    zero-widths BEFORE normalization so a ZWJ can't block composition;
    (2) canonical normalization to ``form`` (NFC default; NFD/NFKC/
    NFKD accepted) via a vectorized Arrow-batched pandas_udf over
    stdlib ``unicodedata`` — the one Python crossing, string in /
    string out; (3) optional whitespace collapse + trim (off by
    default: it changes tokenization, a policy decision).

    Oracle twin: DuckDB ``nfc_normalize`` + ``regexp_replace(...,
    'g')`` over the same ``INVISIBLES_CLASS`` replays steps 1-2 for
    the NFC form (queued pair ``text_normalize``). Null in == null
    out. At 100 TB this is a pure projection — no shuffle, payload
    strings cross to Python once per batch."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")

    @F.pandas_udf("string")
    def _norm(s):  # pd.Series -> pd.Series
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    c: Column = F.col(text_col)
    if strip_invisibles:
        c = F.when(
            F.col(text_col).isNotNull(),
            F.regexp_replace(c, INVISIBLES_CLASS, ""),
        )
    c = _norm(c)
    if collapse_ws:
        c = F.when(
            F.col(text_col).isNotNull(), F.trim(F.regexp_replace(c, r"\s+", " "))
        )
    return df.withColumn(out_col, c)


def prune_token_classifier(model: DataFrame, min_count: int = 2) -> DataFrame:
    """Model compression for serve-time broadcast: drop tokens with
    fewer than ``min_count`` total training occurrences. A pruned
    token scores exactly like an UNSEEN one (left-join miss ->
    ``scale div 2`` neutral weight) — which is also the statistically
    honest judgment: a 1-occurrence token's smoothed weight is an
    extreme 1/3 or 2/3 on no real evidence, so pruning the hapax tail
    both halves the Zipfian vocab table and removes its least
    reliable (most extreme) weights. Survivors' weights never shift
    (weights are per-row functions of the counts). Prune on
    load/serve, never in the store: ``merge_token_classifier`` keeps
    working on the unpruned counts."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    return model.filter((F.col("c_pos") + F.col("c_neg")) >= min_count)
