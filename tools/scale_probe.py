"""Scaling probe: do the dedup / similarity / clusters operator
families scale ~linearly in corpus size, as SCALE.md claims?

Documents: m x replicas of the sf documents table (doc_ids shifted;
every token suffixed with a per-replica tag so replicas are NOT
near-dups of each other — cross-replica candidate pairs would
otherwise grow quadratically and measure the duplicate structure, not
the engine). Within each replica the near-dup structure mirrors the
original, so pair counts and work should grow ~m.

Embeddings: m x replicas with vec_ids shifted and each replica's
vectors multiplied by a per-replica deterministic ±1 sign pattern —
within-replica dots (hence near-dup/topk structure) are EXACTLY
preserved (both sides flip identically), while cross-replica dots
decorrelate even when the fixture's vectors share a strong mean
component (a cyclic rotation does NOT decorrelate those — measured:
pair count grew 16x at m=4). The top-k query set stays FIXED (the
base replica's) while the corpus grows — the realistic serving shape.

Usage: python tools/scale_probe.py [sf_dir] [m ...] [--families=a,b]
Prints one line per (operator, m): seconds, output rows, rows/sec.
Families: docs (dedup pair emitters), clusters, curation, sim, text;
default all.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from syncquill_spark import get_spark  # noqa: E402
from syncquill_spark.operators.clusters import connected_components  # noqa: E402
from syncquill_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from syncquill_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)

ID_OFFSET = 10_000_000


def scaled_corpus(spark, sf_dir: str, m: int) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = []
    for r in range(m):
        rep = docs.select(
            (F.col("doc_id") + r * ID_OFFSET).alias("doc_id"),
            # suffix every token for r > 0: replicas share no shingles
            # with the base corpus, so near-dup structure is per-replica
            (
                F.col("text")
                if r == 0
                else F.regexp_replace(F.col("text"), r"(\S+)", rf"$1_x{r}")
            ).alias("text"),
            "lang",
            "source",
        )
        reps.append(rep)
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out.withColumn("n_chars", F.length("text"))


def _signs(r: int, dim: int = 64) -> list[float]:
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"sp:{r}:{j}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1.0
        for j in range(dim)
    ]


def scaled_embeddings(spark, sf_dir: str, m: int) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = []
    for r in range(m):
        vec = (
            F.col("embedding")
            if r == 0
            # per-replica sign flip: within-replica dots identical,
            # cross-replica dots decorrelated (mean component killed)
            else F.zip_with(
                F.col("embedding"),
                F.lit(_signs(r)),
                lambda a, s: a.cast("double") * s,
            )
        )
        reps.append(
            emb.select(
                (F.col("vec_id") + r * ID_OFFSET).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out


def probe(name, fn, corpus) -> tuple[float, int]:
    # Same isolation discipline as bench.py: drop the persisted frames
    # each operator scopes to its own run (they can't unpersist them —
    # the returned DataFrame still depends on them lazily) and nudge
    # the ContextCleaner, whose broadcast/shuffle cleanup only runs on
    # driver GC. Without this, leftovers tax later probes with
    # GC/spill and the measurement reads as superlinear scaling.
    spark = corpus.sparkSession
    cached = corpus.storageLevel.useMemory or corpus.storageLevel.useDisk
    spark.catalog.clearCache()
    if cached:
        corpus.persist()
        corpus.count()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    n = fn(corpus).count()
    return time.time() - t0, n


OPS = {
    "exact_dedup": lambda c: exact_dedup(c),
    "ngram_jaccard": lambda c: ngram_jaccard_pairs(
        c, k=3, threshold=0.2, block_cols=("lang",), length_band=64
    ),
    "minhash_lsh": lambda c: minhash_lsh_pairs(c, k=3, threshold=0.2),
    "simhash_pairs": lambda c: simhash_near_pairs(c),
}

# clusters family: pairs + transitive closure (the full dedup_clusters
# pipeline shape) over the scaled documents corpus
CLUSTER_OPS = {
    "dedup_clusters": lambda c: connected_components(
        ngram_jaccard_pairs(
            c, k=3, threshold=0.2, block_cols=("lang",), length_band=64
        )
    ),
}

# curation family (round-6 verdict #7): the most expensive un-probed
# paths — fuzzy benchmark decontamination, the leakage-safe split, and
# the composed curation pipeline. Eval set / split logic stay FIXED
# (the base replica's) while the corpus grows — the realistic shape: a
# benchmark suite doesn't grow with the crawl.
def _fuzzy_decontam(c: DataFrame) -> DataFrame:
    from syncquill_spark.operators.curation import fuzzy_decontaminate

    corpus = c.filter((F.col("doc_id") >= ID_OFFSET) | (F.col("doc_id") % 17 != 0))
    eval_df = c.filter((F.col("doc_id") < ID_OFFSET) & (F.col("doc_id") % 17 == 0))
    return fuzzy_decontaminate(
        corpus, eval_df, k=3, n_perm=32, bands=8, threshold=0.2
    )


def _leakage_split(c: DataFrame) -> DataFrame:
    from syncquill_spark.operators.curation import leakage_safe_split

    pairs = ngram_jaccard_pairs(
        c, k=3, threshold=0.2, block_cols=("lang",), length_band=64
    )
    return leakage_safe_split(c, pairs)


def _pipeline(c: DataFrame) -> DataFrame:
    # same composition as the registry's pipeline_corpus_curation:
    # exact dedup -> quality filter -> language ID -> per-lang stats
    from pyspark.sql import Window

    from syncquill_spark.operators.text import (
        language_id,
        quality_filter,
        token_counts,
    )

    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    keep = (
        c.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "text")
    )
    curated = keep.join(quality_filter(keep), "doc_id")
    stats = (
        language_id(curated)
        .join(token_counts(curated), "doc_id")
        .join(
            curated.select("doc_id", F.length("text").cast("long").alias("n_chars")),
            "doc_id",
        )
    )
    return stats.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_bpeish").alias("total_tokens_bpeish"),
        F.sum("n_chars").alias("total_chars"),
    )


def _quality_pctl(c: DataFrame) -> DataFrame:
    # round-8: the de-skewed two-pass bracketed order statistic — the
    # replica tag keeps every doc in its original lang, so strata grow
    # m-fold, exactly the dominant-stratum shape the rewrite targets
    from syncquill_spark.operators.curation import quality_percentile_filter
    from syncquill_spark.operators.text import quality_features

    feats = quality_features(c).select("doc_id", "n_unique_tokens")
    scored = c.select("doc_id", "lang").join(feats, "doc_id")
    return quality_percentile_filter(
        scored, "n_unique_tokens", keep_frac=0.8, stratify_col="lang"
    )


CURATION_OPS = {
    "fuzzy_decontam": _fuzzy_decontam,
    "leakage_split": _leakage_split,
    "curation_pipeline": _pipeline,
    "quality_pctl": _quality_pctl,
}


def _tfidf_terms(c: DataFrame) -> DataFrame:
    # full-corpus document frequencies: the df join grows with corpus
    # size — the growth the round-6 verdict asked this probe to cover
    from syncquill_spark.operators.text import top_distinctive_terms

    return top_distinctive_terms(c, top_n=3)


def _bm25(c: DataFrame) -> DataFrame:
    # fixed query terms (the registry query's); replicas suffix their
    # tokens so matches stay in the base replica while N and the
    # df/avgdl aggregates scan the whole growing corpus
    from syncquill_spark.operators.text import bm25_scores

    return bm25_scores(c, ("spark", "hash", "merge", "window"))


def _winnow_fp(c: DataFrame) -> DataFrame:
    # per-doc window shuffle: the partition key is the doc id, so no
    # partition ever exceeds one doc's grams regardless of corpus size
    from syncquill_spark.operators.text import winnowing_fingerprints

    return winnowing_fingerprints(c, k=3, window=4)


def _winnow_pairs(c: DataFrame) -> DataFrame:
    # fp equi-join with the hub cap; replicas share no shingles, so
    # pair structure stays per-replica (like the other dedup probes)
    from syncquill_spark.operators.text import winnowing_match_pairs

    return winnowing_match_pairs(c, k=3, window=4, min_shared=2, max_fp_df=20)


def _winnow_pairs_df100(c: DataFrame) -> DataFrame:
    # hub-cap sensitivity (round-7 verdict #4): a 5x looser cap admits
    # more of the df distribution's head into the self-join
    from syncquill_spark.operators.text import winnowing_match_pairs

    return winnowing_match_pairs(c, k=3, window=4, min_shared=2, max_fp_df=100)


def _winnow_pairs_nocap(c: DataFrame) -> DataFrame:
    # no hub cap at all: the anti-quadratic guard OFF — this is the
    # control that shows what the cap is protecting against
    from syncquill_spark.operators.text import winnowing_match_pairs

    return winnowing_match_pairs(c, k=3, window=4, min_shared=2, max_fp_df=None)


def _bigram_lm(c: DataFrame) -> DataFrame:
    # model + scoring over the growing corpus (round-8 verdict #5):
    # the c12 scoring join's key (h12, the bigram hash) is the one
    # shuffle key in the family whose skew under a Zipfian bigram
    # distribution was untested — c1 is vocab-sized/broadcastable,
    # c12 rides AQE's skew-join splitting if a hot bigram dominates
    from syncquill_spark.operators.text import bigram_commonness

    return bigram_commonness(c)


def _bigram_gate(c: DataFrame) -> DataFrame:
    # the deployed shape: model from the stored half, score the other
    # half against it — both sides grow with the corpus
    from syncquill_spark.operators.text import (
        bigram_score_against,
        build_bigram_model,
    )

    corpus = c.filter(F.col("doc_id") % 2 == 0)
    batch = c.filter(F.col("doc_id") % 2 == 1)
    c1, c12 = build_bigram_model(corpus)
    return bigram_score_against(batch, c1, c12)


def _lines_drop(c: DataFrame) -> DataFrame:
    # cross-doc line dedup: the count shuffle carries (h, id) pairs,
    # the rebuild groupBy carries the text — both should track corpus
    # size linearly; the flagged-line join must stay broadcast-sized
    from syncquill_spark.operators.text import dedup_lines_across

    return dedup_lines_across(c, mode="drop")


def _lines_first(c: DataFrame) -> DataFrame:
    from syncquill_spark.operators.text import dedup_lines_across

    return dedup_lines_across(c, mode="first")


def _clf_gate(c: DataFrame) -> DataFrame:
    # the deployed classifier shape: train on the labeled stored half,
    # score the other half against it — mirrors _bigram_gate; the
    # count-table join key (th) is vocab-sized and broadcastable
    from syncquill_spark.operators.text import (
        build_token_classifier,
        classifier_score_against,
    )

    corpus = c.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", (F.col("doc_id") % 4 == 0).cast("int")
    )
    batch = c.filter(F.col("doc_id") % 2 == 1)
    return classifier_score_against(batch, build_token_classifier(corpus))


LINES_OPS = {
    "lines_dedup_drop": _lines_drop,
    "lines_dedup_first": _lines_first,
}

CLF_OPS = {
    "clf_gate": _clf_gate,
}

TEXT_OPS = {
    "tfidf_terms": _tfidf_terms,
    "bm25": _bm25,
    "winnow_fp": _winnow_fp,
    "winnow_pairs": _winnow_pairs,
    "winnow_pairs_df100": _winnow_pairs_df100,
    "winnow_pairs_nocap": _winnow_pairs_nocap,
}

BIGRAM_OPS = {
    "bigram_lm": _bigram_lm,
    "bigram_gate": _bigram_gate,
}

# similarity family: fixed query set (the base replica's), growing corpus
SIM_OPS = {
    "topk_brute": lambda c, q: brute_force_topk(c, q, k=10),
    "topk_lsh": lambda c, q: lsh_topk(c, q, k=10),
    "topk_ivf": lambda c, q: ivf_topk(c, q, k=10, n_cells=16, nprobe=4),
    # Probe parameterization, NOT the registry query's (0.35 / r=4):
    # - threshold 0.55: at 0.35 random 64-dim pairs pass at ~2.8 sigma
    #   (~0.25%), so OUTPUT is inherently quadratic in corpus size for
    #   any corpus — a data property, not an engine property.
    # - planes_per_band=12: SRP bucket count is 2^r per band, so
    #   candidate volume grows O(n^2 / 2^r); r must scale with the
    #   corpus (measured: r=4 = 16 buckets turned the probe
    #   quadratic — 3.5s/13.8s/45.2s at 1x/4x/8x). The engine-scaling
    #   signal needs buckets sized to the corpus, exactly as a 100 TB
    #   deployment would choose r ~ log2(n) - log2(target_bucket).
    "embed_neardup": lambda c, q: embedding_near_dup_pairs(
        c, threshold=0.55, bands=4, planes_per_band=12
    ),
    # round-8 PQ family. pq_encode is one corpus pass (codebook is a
    # fixed-size broadcast). topk_ivfpq at FIXED n_cells=16 has
    # candidates-per-query ~ nprobe*n/16 — linear in corpus by
    # construction (same knob story as SRP bands: a real deployment
    # scales n_cells with the corpus; fixture value is an oracle-recall
    # choice at 2k vectors).
    "pq_encode": lambda c, q: __import__(
        "syncquill_spark.operators.similarity", fromlist=["pq_encode"]
    ).pq_encode(c),
    "topk_ivfpq": lambda c, q: __import__(
        "syncquill_spark.operators.similarity", fromlist=["ivfpq_topk"]
    ).ivfpq_topk(c, q, k=10, n_cells=16, nprobe=4),
    # two-stage serving: ADC top-50 then exact re-rank of candidates
    # only — stage-2 cost is |queries| x 50 rows regardless of corpus
    # size, so the composition should track topk_ivfpq's curve
    "topk_rerank": lambda c, q: __import__(
        "syncquill_spark.operators.similarity", fromlist=["ivfpq_topk_rerank"]
    ).ivfpq_topk_rerank(c, q, k=10, rerank=50, n_cells=16, nprobe=4),
    # embedding reduction: JL projection is one Arrow matmul pass;
    # PCA fit is one mapInPandas partial-sum pass + a model-sized
    # reduce + driver eigh on 64x64 — both should be corpus-linear
    # with near-flat wall at fixture scale
    "rp_project": lambda c, q: __import__(
        "syncquill_spark.operators.similarity", fromlist=["random_projection"]
    ).random_projection(c, out_dim=16).select("vec_id", "embedding_rp"),
    "pca_fit_project": lambda c, q: _pca_fit_project(c),
}


def _pca_fit_project(c: DataFrame) -> DataFrame:
    from syncquill_spark.operators.similarity import pca_fit, pca_project

    model = pca_fit(c, k=16)
    return pca_project(c, model).select("vec_id", "embedding_pca")


def _remove_spans_probe(c: DataFrame) -> DataFrame:
    """Detect -> localize -> CUT within the scaled corpus (the full
    decontamination composition, via the one-pass
    ``winnowing_self_spans`` — the registered rows' plan). Matches
    stay within-replica by fixture construction, so span volume grows
    ~m while the rebuild cost is bounded by flagged docs."""
    from syncquill_spark.operators.curation import remove_spans
    from syncquill_spark.streaming.text_dedup import winnowing_self_spans

    spans = winnowing_self_spans(c, min_shared=2, max_fp_df=20)
    return remove_spans(
        c, spans, span_id_col="id_b", start_col="start_b",
        end_col="end_b", pad=3,
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fam_args = [a for a in sys.argv[1:] if a.startswith("--families=")]
    families = (
        set(fam_args[-1].split("=", 1)[1].split(","))
        if fam_args
        else {"docs", "clusters", "curation", "sim", "text"}
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ms = [int(a) for a in args[1:]] or [1, 2, 4]
    spark = get_spark("scale-probe")
    doc_ops: dict = {}
    if "docs" in families:
        doc_ops.update(OPS)
    if "clusters" in families:
        doc_ops.update(CLUSTER_OPS)
    if "curation" in families:
        doc_ops.update(CURATION_OPS)
    if "text" in families:
        doc_ops.update(TEXT_OPS)
    if "bigram" in families:
        doc_ops.update(BIGRAM_OPS)
    if "lines" in families:
        doc_ops.update(LINES_OPS)
    if "clf" in families:
        doc_ops.update(CLF_OPS)
    if "decon" in families:
        doc_ops["remove_spans"] = _remove_spans_probe
    if "card" in families:
        from syncquill_spark.operators.curation import corpus_card

        doc_ops["corpus_card"] = lambda c: corpus_card(
            c, strata_cols=("lang", "source")
        )
    if "bpe" in families:
        from syncquill_spark.operators.bpe import (
            bpe_encode,
            train_bpe,
            word_freqs,
        )

        def _bpe_train_encode(c: DataFrame) -> DataFrame:
            # fixed 20 merges: training cost = 1 corpus pass (word
            # counts) + 20 iterations over the VOCAB-sized table;
            # encode is one Arrow-batched corpus pass
            merges, _ = train_bpe(c, n_merges=20)
            return bpe_encode(c, merges)

        doc_ops["bpe_train_encode"] = _bpe_train_encode
        # merges-vs-corpus decomposition (round-9 verdict #6): is the
        # merge loop's wall time merges-bound (per-iteration vocab-
        # table aggregation + checkpoint) or corpus-bound? word_freqs
        # is the ONLY corpus pass, so it should scale ~m while the
        # n_merges sweep at each m should be ~affine in n_merges with
        # a slope that does NOT grow with m (the word table is
        # vocab-sized; the fixture's vocab grows ~m only because
        # replica tokens are tag-suffixed — real corpora saturate).
        # The per-merge slope IS the localCheckpoint lineage cost plus
        # one pair-count aggregation; the release discipline keeps it
        # flat across iterations (pre-fix, later iterations paid
        # accumulating storage).
        doc_ops["bpe_wordfreqs"] = lambda c: word_freqs(c)
        for nm in (10, 20, 40):
            doc_ops[f"bpe_train{nm}"] = (
                lambda c, _n=nm: train_bpe(c, n_merges=_n)[1]
            )

    if "bitext" in families:
        # margin-based mining, fixed src set (the probe's query set)
        # against the growing tgt corpus: candidate volume per src is
        # linear in the corpus on the brute path by construction — the
        # deployment swaps in ANN candidates (the operator's
        # `candidates` param), same knob story as topk_brute
        from syncquill_spark.operators.similarity import bitext_margin_pairs

        SIM_OPS["bitext_mine"] = lambda c, q: bitext_margin_pairs(
            q.select(F.col("query_id").alias("vec_id"), "embedding"),
            c,
            k=4,
            min_margin_ppm=0,
        )

    if "fuzzy" in families:
        # planted name catalog (round-9 verdict #7): Zipf-skewed token
        # frequencies + typo twins every 7th id — see
        # tools/name_catalog.py. Blocking selectivity is probed
        # directly (candidate pairs before verify) next to the full
        # operator, capped and uncapped; within-replica structure is
        # identical and cross-replica tokens are tag-disjoint, so
        # both candidates and pairs should grow ~m.
        from syncquill_spark.operators.dedup import fuzzy_name_pairs
        from tools.name_catalog import synth_name_catalog

        def _catalog(c: DataFrame) -> DataFrame:
            return synth_name_catalog(c.select("doc_id"))

        def _block_candidates(cat: DataFrame) -> DataFrame:
            toks = (
                cat.select(
                    F.col("doc_id").alias("_id"),
                    F.explode(F.split(F.lower(F.trim("name")), r"\s+")).alias(
                        "_tok"
                    ),
                )
                .filter(F.col("_tok") != "")
                .distinct()
            )
            return (
                toks.alias("a")
                .join(toks.alias("b"), "_tok")
                .filter(F.col("a._id") < F.col("b._id"))
                .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
                .distinct()
            )

        doc_ops["fuzzy_block_cands"] = lambda c: _block_candidates(_catalog(c))
        doc_ops["fuzzy_pairs"] = lambda c: fuzzy_name_pairs(
            _catalog(c), name_col="name", max_dist=2
        )
        doc_ops["fuzzy_pairs_df400"] = lambda c: fuzzy_name_pairs(
            _catalog(c), name_col="name", max_dist=2, max_token_df=400
        )
    for m in ms:
        corpus = scaled_corpus(spark, sf_dir, m).persist()
        n_docs = corpus.count()
        for name, fn in doc_ops.items():
            sec, rows = probe(name, fn, corpus)
            print(
                f"{name} m={m} docs={n_docs} rows={rows} "
                f"sec={sec:.2f} docs_per_sec={n_docs / sec:.0f}",
                flush=True,
            )
        if "media" in families:
            # perceptual media dedup: one deterministic random PPM per
            # corpus row plus a near-perturbed twin for every 25th id
            # (near-dup structure mirrors per replica -> pairs ~m;
            # cross-replica images decorrelate because the seed mixes
            # the full shifted id). Payloads are materialized+persisted
            # BEFORE timing, so media_fp times decode+hash and
            # media_pairs times the band join, not synthesis.
            import numpy as _np
            import pandas as _pd

            from syncquill_spark.operators.multimodal import (
                media_fingerprints,
                media_near_pairs,
            )

            def _synth(batches):
                for pdf in batches:
                    ids, payloads = [], []
                    for mid in pdf["media_id"]:
                        mid = int(mid)
                        rng = _np.random.RandomState(
                            (mid * 2654435761) % (2**31)
                        )
                        img = rng.randint(0, 200, (24, 24, 3)).astype("uint8")
                        hdr = b"P6\n24 24\n255\n"
                        ids.append(mid)
                        payloads.append(hdr + img.tobytes())
                        if mid % 25 == 0:
                            twin = img.copy()
                            twin[2:6, 3:9] = _np.minimum(
                                twin[2:6, 3:9].astype(_np.int64) + 35, 255
                            ).astype(_np.uint8)
                            ids.append(mid + 5_000_000)
                            payloads.append(hdr + twin.tobytes())
                    yield _pd.DataFrame({"media_id": ids, "payload": payloads})

            media = (
                corpus.select(F.col("doc_id").alias("media_id"))
                .mapInPandas(_synth, "media_id long, payload binary")
                .persist()
            )
            n_media = media.count()
            t0 = time.time()
            media_fingerprints(media).count()
            sec_fp = time.time() - t0
            print(
                f"media_fp m={m} media={n_media} rows={n_media} "
                f"sec={sec_fp:.2f} media_per_sec={n_media / sec_fp:.0f}",
                flush=True,
            )
            fp = media_fingerprints(media).persist()
            fp.count()
            # r14 (verdict #5): the 8x table showed media_pairs' wall
            # growing super-linear-in-output from fixed-hash-space
            # band-bucket saturation (7 bands of 9-10 bits; random
            # dHashes fill every bucket, so per-bucket candidate
            # volume grows quadratically with the corpus). Measure the
            # two documented knobs instead of arguing them: the
            # max_band_df hub cap (bounds per-bucket work at ANY
            # scale) and the wider-band layout (max_hamming=3 -> 4
            # bands of 16 bits = 65k buckets/band — unsaturated, at
            # the policy cost of a tighter match radius). The UNCAPPED
            # default is skipped above 8x — its candidate volume is
            # quadratic in saturated buckets (~10^8 pairs at 64x) and
            # the point of the knobs is exactly that nobody should run
            # it there; the skip is printed, not silent.
            if m <= 8:
                t0 = time.time()
                n_pairs = media_near_pairs(fp, max_hamming=6).count()
                sec_pairs = time.time() - t0
                print(
                    f"media_pairs m={m} media={n_media} rows={n_pairs} "
                    f"sec={sec_pairs:.2f} media_per_sec={n_media / sec_pairs:.0f}",
                    flush=True,
                )
            else:
                print(
                    f"media_pairs m={m} SKIPPED (uncapped band join is "
                    "quadratic in saturated buckets; the capped/wide "
                    "variants below are the deployment configs)",
                    flush=True,
                )
            t0 = time.time()
            n_pairs = media_near_pairs(
                fp, max_hamming=6, max_band_df=100
            ).count()
            sec_pairs = time.time() - t0
            print(
                f"media_pairs_df100 m={m} media={n_media} rows={n_pairs} "
                f"sec={sec_pairs:.2f} media_per_sec={n_media / sec_pairs:.0f}",
                flush=True,
            )
            t0 = time.time()
            n_pairs = media_near_pairs(fp, max_hamming=3).count()
            sec_pairs = time.time() - t0
            print(
                f"media_pairs_wide_h3 m={m} media={n_media} rows={n_pairs} "
                f"sec={sec_pairs:.2f} media_per_sec={n_media / sec_pairs:.0f}",
                flush=True,
            )
            fp.unpersist()
            media.unpersist()
        if "export" in families:
            # release-sink probe: write_training_shards is ONE
            # shard-keyed shuffle + per-shard sorts + a pre-sorted
            # write — wall should grow ~linearly with the corpus (it
            # writes every byte once) and the verified read-back with
            # it; n_shards fixed so per-shard size grows with m (the
            # deployment knob goes the other way).
            import shutil as _sh
            import tempfile as _tf

            from syncquill_spark.sources.training_export import (
                read_training_shards,
                write_training_shards,
            )

            xdir = _tf.mkdtemp(prefix="sq_export_")
            t0 = time.time()
            man = write_training_shards(
                corpus.select("doc_id", "text"), f"{xdir}/rel", n_shards=16
            )
            sec_w = time.time() - t0
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(f"{xdir}/rel")
                for f in fs
            )
            t0 = time.time()
            frame, _ = read_training_shards(spark, f"{xdir}/rel", verify=True)
            n_read = frame.count()
            sec_r = time.time() - t0
            print(
                f"export_write m={m} docs={n_docs} rows={man['total_docs']} "
                f"sec={sec_w:.2f} mb={nbytes / 1e6:.1f} "
                f"docs_per_sec={n_docs / sec_w:.0f}",
                flush=True,
            )
            print(
                f"export_read_verify m={m} docs={n_docs} rows={n_read} "
                f"sec={sec_r:.2f} docs_per_sec={n_docs / sec_r:.0f}",
                flush=True,
            )
            _sh.rmtree(xdir, ignore_errors=True)
            # deployment-knob sizing (r10 verdict #6): tokens_per_shard
            # FIXED so the shard COUNT grows with the corpus — the
            # 100 TB shape ("a shard is a few GB" is a token budget,
            # not a count); and the release accounting must close end
            # to end — manifest totals equal the dataset card's own
            # size metrics at every multiplier.
            from syncquill_spark.operators.curation import corpus_card

            xdir2 = _tf.mkdtemp(prefix="sq_export_tps_")
            t0 = time.time()
            man2 = write_training_shards(
                corpus.select("doc_id", "text"), f"{xdir2}/rel",
                tokens_per_shard=50_000,
            )
            sec_w2 = time.time() - t0
            card = {
                (r.section, r.metric): r.value
                for r in corpus_card(
                    corpus.select("doc_id", "text"), strata_cols=()
                ).collect()
            }
            ok = (
                man2["total_docs"] == card[("size", "n_docs")]
                and man2["total_tokens"] == card[("size", "n_tokens_ws")]
            )
            print(
                f"export_tps m={m} docs={n_docs} shards={man2['n_shards']} "
                f"sec={sec_w2:.2f} manifest_docs={man2['total_docs']} "
                f"manifest_tokens={man2['total_tokens']} "
                f"card_docs={card[('size', 'n_docs')]} "
                f"card_tokens={card[('size', 'n_tokens_ws')]} "
                f"totals_match={ok}",
                flush=True,
            )
            _sh.rmtree(xdir2, ignore_errors=True)
        if "appendio" in families:
            # persistence-cost probe for the nightly index merge: a
            # FIXED batch committed into a growing stored index via
            # (a) save-over of the merged frame (rewrites the whole
            # part) vs (b) append_index (writes only the batch's rows,
            # hardlinks the rest). Batch fingerprints are persisted
            # first so both paths time the COMMIT, not the fingerprint
            # compute.
            import shutil
            import tempfile

            from syncquill_spark.sources.index_store import (
                append_index,
                load_index,
                save_index,
            )
            from syncquill_spark.streaming.text_dedup import build_winnowing_index

            base = spark.read.parquet(f"{sf_dir}/documents.parquet")
            batch_docs = base.select(
                (F.col("doc_id") + 10**12).alias("doc_id"), "text"
            )
            tmp = tempfile.mkdtemp(prefix="sq_appendio_")
            p_save, p_app = f"{tmp}/save", f"{tmp}/app"
            fps = build_winnowing_index(corpus)
            save_index(p_save, fps=fps)
            save_index(p_app, fps=fps)
            batch_fps = build_winnowing_index(batch_docs).persist()
            nb = batch_fps.count()
            def _files(p):
                d = os.path.join(p, "fps")
                return {
                    f: os.stat(os.path.join(d, f)).st_size
                    for f in os.listdir(d)
                    if not f.startswith((".", "_"))
                }

            before_save, before_app = _files(p_save), _files(p_app)
            stored = load_index(spark, p_save)["fps"]
            t0 = time.time()
            save_index(p_save, fps=stored.unionByName(batch_fps))
            sec_save = time.time() - t0
            t0 = time.time()
            append_index(p_app, fps=batch_fps)
            sec_app = time.time() - t0
            # bytes actually WRITTEN by the commit = files not carried
            # over from the previous version (hardlinks keep name+size)
            after_save, after_app = _files(p_save), _files(p_app)
            wrote_save = sum(
                sz for f, sz in after_save.items() if f not in before_save
            )
            wrote_app = sum(
                sz for f, sz in after_app.items() if f not in before_app
            )
            print(
                f"index_save_over m={m} docs={n_docs} batch_rows={nb} "
                f"sec={sec_save:.2f} bytes_written={wrote_save}",
                flush=True,
            )
            print(
                f"index_append m={m} docs={n_docs} batch_rows={nb} "
                f"sec={sec_app:.2f} bytes_written={wrote_app}",
                flush=True,
            )
            batch_fps.unpersist()
            shutil.rmtree(tmp, ignore_errors=True)
        if "bm25" in families:
            # serve-layout probe (BM25 sibling of the ivfpq one): score
            # from text (tokenizes the whole corpus every query) vs
            # serving from the persisted term-bucket-partitioned index
            # (build paid ONCE outside the timed serve; the postings
            # scan partition-prunes to the query's crc32 buckets).
            # Fixture note: replica token suffixing means the query
            # terms match only the base replica, so posting lists are
            # CONSTANT as m grows — serve wall should be flat while
            # from-text grows with the corpus; on a real corpus both
            # grow with term document frequency, never with total
            # corpus tokens.
            import shutil
            import tempfile

            from syncquill_spark.operators.text import (
                bm25_from_index,
                bm25_scores,
                build_bm25_index,
            )
            from syncquill_spark.sources.index_store import load_index, save_index

            terms = ("spark", "hash", "merge", "window")
            tmp = tempfile.mkdtemp(prefix="sq_bm25_probe_")
            path = f"{tmp}/idx"
            t0 = time.time()
            save_index(
                path,
                _partition_by={"postings": ["term_bucket"]},
                **build_bm25_index(corpus),
            )
            build_s = time.time() - t0
            loaded = load_index(spark, path)
            sec_t, rows_t = probe(
                "bm25_from_text", lambda c: bm25_scores(c, terms), corpus
            )
            sec_i, rows_i = probe(
                "bm25_from_index",
                lambda c: bm25_from_index(loaded, terms),
                corpus,
            )
            print(
                f"bm25_from_text m={m} docs={n_docs} rows={rows_t} sec={sec_t:.2f}",
                flush=True,
            )
            print(
                f"bm25_from_index m={m} docs={n_docs} rows={rows_i} "
                f"sec={sec_i:.2f} build_sec={build_s:.2f}",
                flush=True,
            )
            shutil.rmtree(tmp, ignore_errors=True)
        corpus.unpersist()

        if families & {"sim", "ivfpq", "bitext"}:
            emb = scaled_embeddings(spark, sf_dir, m).persist()
            n_vecs = emb.count()
            queries = (
                emb.filter(
                    (F.col("vec_id") % 40 == 0) & (F.col("vec_id") < ID_OFFSET)
                )
                .select(F.col("vec_id").alias("query_id"), "embedding")
            )
            if families & {"sim", "bitext"}:
                sim_ops = (
                    SIM_OPS
                    if "sim" in families
                    else {"bitext_mine": SIM_OPS["bitext_mine"]}
                )
                for name, fn in sim_ops.items():
                    sec, rows = probe(name, lambda c, _fn=fn: _fn(c, queries), emb)
                    print(
                        f"{name} m={m} vecs={n_vecs} rows={rows} "
                        f"sec={sec:.2f} vecs_per_sec={n_vecs / sec:.0f}",
                        flush=True,
                    )
            if "ivfpq" in families:
                # serve-layout probe (round-8 verdict #7): the one-shot
                # composition (build+serve fused, codes shuffled on
                # vec_id) vs serving from the persisted cell-co-located
                # index (codes Hive-partitioned by cell_id, probe
                # broadcast under DPP). Build cost is paid ONCE outside
                # the timed serve — the deployment's nightly/per-batch
                # split. n_cells scales ~sqrt(n) as deployed.
                import shutil
                import tempfile

                from syncquill_spark.operators.similarity import (
                    ivfpq_build_index,
                    ivfpq_topk,
                    ivfpq_topk_from_index,
                )
                from syncquill_spark.sources.index_store import (
                    load_index,
                    save_index,
                )

                n_cells = max(16, int(round(n_vecs ** 0.5 / 8)) * 8)
                tmp = tempfile.mkdtemp(prefix="sq_ivfpq_probe_")
                path = f"{tmp}/idx"
                t0 = time.time()
                save_index(
                    path,
                    _partition_by={"codes": ["cell_id"]},
                    **ivfpq_build_index(emb, n_cells=n_cells),
                )
                build_s = time.time() - t0
                loaded = load_index(spark, path)
                sec_m, rows_m = probe(
                    "ivfpq_monolithic",
                    lambda c: ivfpq_topk(c, queries, k=10, n_cells=n_cells, nprobe=4),
                    emb,
                )
                sec_i, rows_i = probe(
                    "ivfpq_from_index",
                    lambda c: ivfpq_topk_from_index(queries, loaded, k=10, nprobe=4),
                    emb,
                )
                print(
                    f"ivfpq_monolithic m={m} vecs={n_vecs} cells={n_cells} "
                    f"rows={rows_m} sec={sec_m:.2f}",
                    flush=True,
                )
                print(
                    f"ivfpq_from_index m={m} vecs={n_vecs} cells={n_cells} "
                    f"rows={rows_i} sec={sec_i:.2f} build_sec={build_s:.2f}",
                    flush=True,
                )
                shutil.rmtree(tmp, ignore_errors=True)
            emb.unpersist()


if __name__ == "__main__":
    main()
