"""Byte-pair-encoding tokenizer: distributed training + corpus encoding.

The missing third piece of the token-counting story (whitespace and
regex counts live in operators/text.py): LLM pipelines measure data in
TOKENIZER tokens, and the tokenizer itself is trained on the corpus.
This module trains a BPE merge table (Sennrich et al. 2016, the
word-frequency formulation every practical trainer uses) and encodes
documents with it — both as Spark plans.

Training shape, built for the 100 TB corpus the engine targets:

- The corpus is read ONCE: one explode + groupBy builds the
  (word, freq) table. Everything after runs on that table, whose size
  is the corpus VOCABULARY (~1e8 rows for web scale — too big for a
  driver, exactly why the merge loop stays distributed).
- Each merge iteration is one aggregation over the word table
  (adjacent-pair counts, weighted by word freq, map-side combinable)
  plus one projection (apply the merge to the symbol arrays, an
  Arrow-batched pandas UDF — the per-word greedy scan is inherently
  sequential). ONE row (the argmax pair) crosses to the driver per
  iteration — the same O(1)-per-step driver traffic as any iterative
  fit; the word table itself never does.
- The table is localCheckpoint'ed eagerly each iteration, so lineage
  stays flat and every pair-count job reads materialized rows instead
  of recomputing the whole UDF chain (the incremental_sync.py trick).
  Each iteration releases the PREVIOUS iteration's checkpoint blocks
  through the context's persistent-RDD registry (ADVICE r09), so
  executor storage holds one word-table generation, not n_merges —
  only the final generation (the returned vocab frame's backing
  blocks) survives the call, owned by the caller.

Determinism doctrine: pair counts are exact int64 sums; the winning
pair is the total order (freq DESC, left ASC, right ASC); greedy
merge application scans left to right — so the merge table is
bit-reproducible in any engine, and the pure-Python reference model
in tests/test_bpe.py pins it row for row.

Word model: lowercased whitespace tokens (the `_tokens` stream every
text operator here indexes), symbols start as single characters with
the Sennrich end-of-word marker "</w>" fused onto the final
character. Characters are Unicode code points as Spark sees them
(UTF-16 code units for astral-plane text — fine for the BMP text the
fixtures carry). ``byte_level=True`` switches the base alphabet to
the word's UTF-8 BYTES (each as chr(byte), the GPT-2 recipe):
unicode-complete with a fixed 256-symbol base, no unknown-character
case — pass the same flag to train and encode.

No SQL-oracle registry row, stated honestly: the trainer is an
iterative argmax loop (each step's input depends on the previous
step's winner) — the same non-SQL-expressible class as Lloyd
iterations; it is pinned by the Python reference model instead.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EOW = "</w>"


def word_freqs(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over the lowercased whitespace token stream — the
    single corpus pass BPE training starts from. One explode + one
    map-side-combinable count; output is vocabulary-sized."""
    out = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def _initial_syms(word_col, byte_level: bool = False) -> "F.Column":
    """Split a word into initial symbols with the end-of-word marker
    fused onto the last one: 'low' -> ['l', 'o', 'w</w>'].

    ``byte_level=True`` symbolizes the word's UTF-8 BYTES instead of
    its characters (each byte as the one-char string chr(byte) —
    Python's chr and Spark's chr agree on 0..255), the GPT-2 recipe:
    the base alphabet is exactly 256 symbols, any unicode text
    tokenizes without an unknown-character case, and multi-byte
    characters can merge back together or stay split as the data
    dictates."""
    if byte_level:
        hx = F.hex(F.encode(word_col, "UTF-8"))
        chars = F.transform(
            F.regexp_extract_all(hx, F.lit("(..)"), 1),
            lambda h: F.chr(F.conv(h, 16, 10).cast("long")),
        )
    else:
        # (?!^)(?!$): split BETWEEN characters only — a bare (?!^) also
        # matches at end-of-string, and Spark's split keeps the
        # resulting trailing empty element (unlike Java's String.split)
        chars = F.split(word_col, "(?!^)(?!$)")
    n = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == n - 1, F.concat(c, F.lit(EOW))).otherwise(c),
    )


@pandas_udf(ArrayType(StringType()))
def _merge_pair_udf(syms: pd.Series, left: pd.Series, right: pd.Series) -> pd.Series:
    """Greedy left-to-right replacement of the adjacent symbol pair
    (left, right) with their concatenation — the classic BPE apply
    step ('a a a' + merge(a,a) -> ('aa', 'a')). Arrow-batched over the
    word table; words without the pair pass through unchanged."""
    out = []
    for s, l, r in zip(syms, left, right):
        s = list(s)
        if l not in s:  # cheap reject: most words lack the pair
            out.append(s)
            continue
        merged = []
        i, n = 0, len(s)
        lr = l + r
        while i < n:
            if i < n - 1 and s[i] == l and s[i + 1] == r:
                merged.append(lr)
                i += 2
            else:
                merged.append(s[i])
                i += 1
        out.append(merged)
    return pd.Series(out)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbolized word table,
    weighted by word freq (overlapping occurrences count, as in the
    reference algorithm). Map-side-combinable aggregation over
    exploded skinny rows."""
    multi = words.filter(F.size("syms") >= 2)
    n = F.size("syms")
    pairs = multi.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.struct(
                    F.element_at("syms", i + 1).alias("l"),
                    F.element_at("syms", i + 2).alias("r"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("freq").cast("long").alias("pfreq")
    )


def _persistent_rdd_ids(sc) -> set[int]:
    """Ids of every RDD the context currently holds persisted.
    ``DataFrame.localCheckpoint`` stores its blocks under an internal
    RDD the DataFrame API exposes no handle to (``unpersist`` on the
    frame goes through the cache manager and misses it), so the
    checkpoint-release discipline below works through the context's
    persistent-RDD registry instead."""
    out: set[int] = set()
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        out.add(int(it.next()._1()))
    return out


def _release_persistent_rdds(sc, rdd_ids: set[int]) -> None:
    """Non-blocking unpersist of the given persistent-RDD ids. The
    snapshot-diff callers use to obtain ids assumes no CONCURRENT
    persists land in the same context mid-diff — fine under the
    single-writer contract every lifecycle operator here documents."""
    if not rdd_ids:
        return
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        t = it.next()
        if int(t._1()) in rdd_ids:
            t._2().unpersist(False)


def train_bpe(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_pair_freq: int = 2,
    min_word_freq: int = 1,
    byte_level: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Train a BPE merge table over the corpus.

    Returns ``(merges, vocab)``: ``merges`` = (rank, left, right,
    pair_freq) — the ordered merge list, rank 0 first, possibly
    shorter than ``n_merges`` if pair frequencies fall below
    ``min_pair_freq`` first (training has converged); ``vocab`` = the
    final symbolized word table (word, freq, syms) whose segmentation
    `bpe_encode` reproduces exactly (the consistency a unit test
    pins).

    One corpus pass (`word_freqs`), then ``n_merges`` iterations over
    the vocabulary-sized table — see the module docstring for the
    scale shape. The returned merges frame is built driver-side from
    the per-iteration argmax rows (n_merges rows total — model-sized,
    like a broadcast codebook), parallelized back so downstream plans
    can join/broadcast it.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    words = (
        word_freqs(df, text_col, min_freq=min_word_freq)
        .select(
            "word",
            "freq",
            _initial_syms(F.col("word"), byte_level).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )
    words_rdd_ids = _persistent_rdd_ids(sc) - before
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("pfreq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0].pfreq < min_pair_freq:
            break
        l, r, pf = top[0].l, top[0].r, int(top[0].pfreq)
        merges.append((rank, l, r, pf))
        before = _persistent_rdd_ids(sc)
        words = words.select(
            "word",
            "freq",
            _merge_pair_udf(F.col("syms"), F.lit(l), F.lit(r)).alias("syms"),
        ).localCheckpoint(eager=True)
        # the new checkpoint is fully materialized (eager=True), so
        # the PRIOR iteration's blocks are dead weight — release them
        # now instead of letting storage grow linearly with n_merges
        # (ADVICE r09, mirroring _pq_codebook's prev_cb discipline)
        new_ids = _persistent_rdd_ids(sc) - before
        _release_persistent_rdds(sc, words_rdd_ids)
        words_rdd_ids = new_ids
    merges_df = spark.createDataFrame(
        merges, "rank long, left string, right string, pair_freq long"
    )
    return merges_df, words


def _segment(
    word: str, merge_list: list[tuple[str, str]], byte_level: bool = False
) -> list[str]:
    """Apply the trained merges in rank order to one word — the
    encoding that reproduces training segmentation by construction."""
    if not word:
        return []
    if byte_level:
        syms = [chr(b) for b in word.encode("utf-8")]
    else:
        syms = list(word)
    syms[-1] = syms[-1] + EOW
    for l, r in merge_list:
        if l not in syms:
            continue
        merged = []
        i, n = 0, len(syms)
        lr = l + r
        while i < n:
            if i < n - 1 and syms[i] == l and syms[i + 1] == r:
                merged.append(lr)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    byte_level: bool = False,
) -> DataFrame:
    """Count each document's BPE tokens under a trained merge table —
    the tokenizer-true size signal data budgets are written in
    (whitespace/regex counts over- or under-shoot it per language).

    The merge table is model-sized: collected once, ordered by rank,
    and shipped to executors inside the UDF closure (a broadcast-sized
    constant, like the classifier weight tables). Each Arrow batch
    memoizes segmentations per distinct word, so the per-word merge
    scan runs once per vocabulary word per batch, not once per token.

    Output: (id, n_words, n_bpe_tokens) — exact ints.
    """
    merge_list = [
        (row.left, row.right)
        for row in merges.orderBy("rank").select("left", "right").collect()
    ]
    # carry the id column's ACTUAL type through (ADVICE r09: a
    # hardcoded 'long' failed inside the Arrow batch for string or
    # decimal ids, and a DDL string corrupts on names needing quoting)
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("n_words", LongType(), False),
            StructField("n_bpe_tokens", LongType(), False),
        ]
    )

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            hit = cache.get(word)
            if hit is None:
                hit = cache[word] = len(
                    _segment(word, merge_list, byte_level)
                )
            return hit

        for pdf in it:
            n_words, n_bpe = [], []
            for text in pdf[text_col]:
                ws = (text or "").lower().split()
                n_words.append(len(ws))
                n_bpe.append(sum(n_tokens(w) for w in ws))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode_batches, out_schema)


def bpe_fertility(
    df: DataFrame,
    merges: DataFrame,
    stratify_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    byte_level: bool = False,
) -> DataFrame:
    """Tokenizer EQUITY report: per-stratum fertility — BPE tokens per
    whitespace word, as fertility_ppm = (1e6 * n_bpe_tokens) div
    n_words (exact integer division, hash-stable). The number a
    multilingual tokenizer review reads first: a language whose
    fertility is 2-3x the corpus median pays that multiple in
    effective context length and training cost, which is exactly what
    temperature mixing and vocab sizing decisions are made on.

    One `bpe_encode` pass + one map-side-combinable aggregation on the
    stratum key. Output: (stratum, n_docs, n_words, n_bpe_tokens,
    fertility_ppm) — exact ints; strata with zero words report null
    fertility rather than dividing by zero.
    """
    enc = bpe_encode(df, merges, text_col=text_col, id_col=id_col,
                     byte_level=byte_level)
    joined = df.select(id_col, stratify_col).join(enc, id_col)
    agg = joined.groupBy(stratify_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )
    # exact integer division (`div`), not double `/` — a double
    # quotient truncates wrong past 2^53
    return agg.withColumn(
        "fertility_ppm",
        F.when(
            F.col("n_words") > 0,
            F.expr("(1000000 * n_bpe_tokens) div n_words"),
        ).cast("long"),
    )


def export_bpe_files(
    merges: DataFrame,
    vocab: DataFrame,
    path: str,
) -> dict[str, int]:
    """Ship the trained tokenizer in the interchange format training
    stacks consume (the GPT-2/huggingface file pair): ``merges.txt``
    (one merge per line, rank order, ``#version: 0.2`` header) and
    ``vocab.json`` (token -> id). Returns the vocab dict.

    Token ids follow the same convention the format's consumers
    assume: the base alphabet first (byte-wise sorted — every single
    symbol observed in the final word table, which by construction is
    the initial alphabet minus symbols that merged away everywhere,
    plus every merge's left/right operand), then one token per merge
    in rank order. Both files are model-sized driver artifacts (the
    same class as the collected merge list every encoder ships); the
    directory commits atomically via the staging swap, like every
    persisted artifact here.

    ``byte_level`` needs no flag: the base alphabet is recovered from
    the model itself (final syms + merge operands), so the exported
    files are faithful to whichever mode trained them.
    """
    import json as _json
    import os as _os
    import uuid as _uuid

    from syncquill_spark.sources._atomic import atomic_replace_dir

    merge_rows = [
        (r.left, r.right)
        for r in merges.orderBy("rank").select("left", "right").collect()
    ]
    # base alphabet: every single symbol the model can emit that is
    # not itself a merge product — observed final symbols plus merge
    # operands (an operand consumed everywhere still needs an id for
    # the merge line to reference), minus the merged tokens
    observed = {
        r.s
        for r in vocab.select(F.explode("syms").alias("s")).distinct().collect()
    }
    for left, right in merge_rows:
        observed.add(left)
        observed.add(right)
    merged_tokens = [left + right for left, right in merge_rows]
    base = sorted(observed - set(merged_tokens))
    ordered = base + [t for t in dict.fromkeys(merged_tokens)]
    vocab_json = {tok: i for i, tok in enumerate(dict.fromkeys(ordered))}

    staging = f"{path}.__staging_{_uuid.uuid4().hex[:8]}"
    _os.makedirs(staging)
    with open(_os.path.join(staging, "merges.txt"), "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for left, right in merge_rows:
            fh.write(f"{left} {right}\n")
    with open(_os.path.join(staging, "vocab.json"), "w", encoding="utf-8") as fh:
        _json.dump(vocab_json, fh, ensure_ascii=False, sort_keys=False)
    atomic_replace_dir(staging, path)
    return vocab_json


def load_bpe_merge_list(path: str) -> list[tuple[str, str]]:
    """Parse an exported ``merges.txt`` back into the rank-ordered
    merge list ``_segment``/``bpe_encode`` consume — the round-trip
    consumers use to verify a shipped tokenizer."""
    import os as _os

    out: list[tuple[str, str]] = []
    with open(_os.path.join(path, "merges.txt"), encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            left, sep, right = line.partition(" ")
            if not sep:
                raise ValueError(f"malformed merges.txt line: {line!r}")
            out.append((left, right))
    return out
