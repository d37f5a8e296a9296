"""Persisted similarity/dedup indexes: the build-once / query-forever
lifecycle the ingest-time operators assume.

The index builders (`streaming/text_dedup.build_text_hash_index` /
`build_text_minhash_index`, `streaming/vector_dedup.build_embedding_index`)
return one or more DataFrames (band keys, shingle sets, quantized
vectors). Within one job those persist in memory; ACROSS jobs — the
real deployment: a nightly corpus pass builds the index, every ingest
micro-batch for the next day joins against it — they must live in
storage. An index here is a directory of parquet parts plus a
manifest naming them, swapped in via ``atomic_replace_dir`` — on
Linux one renameat2(RENAME_EXCHANGE) syscall, so readers see the
complete old or the complete new index, never a missing path and
never a mix of parts from different builds (joining band keys from
build N with shingles from build N-1 would produce silently-wrong
verifies). Single writer, many readers — same contract as
ParquetTable.

Scale shape: each part is written partitioned however the caller's
frame is partitioned; band-key parts are skinny (id, band, key)
tables that bucket-join against each batch; re-building is one corpus
pass, reading is zero passes.
"""

from __future__ import annotations

import errno
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from syncquill_spark.sources._atomic import atomic_replace_dir


def save_index(
    path: str,
    _partition_by: dict[str, list[str]] | None = None,
    _meta: dict | None = None,
    **parts: DataFrame,
) -> None:
    """Write named DataFrame parts + manifest, then swap the staging
    dir in atomically (renameat2 exchange where available — see
    sources/_atomic.py). At least one part required.

    ``_partition_by``: optional {part_name: [cols]} — write that part
    Hive-partitioned on disk (e.g. IVF-PQ codes by cell_id), so
    serve-time scans that join on the partition column read only the
    probed partitions (dynamic partition pruning) instead of the whole
    part. Reads are unchanged — spark.read.parquet discovers the
    layout natively.

    ``_meta``: optional JSON-serializable dict recorded in the
    manifest — format constants the index bytes depend on (hash-bucket
    widths, band counts) that a reader must verify before relying on
    them (``load_index_manifest``). Carried forward verbatim by
    ``append_index``."""
    if not parts:
        raise ValueError("save_index needs at least one named part")
    _refuse_bookkeeping_part_names(parts)
    staging = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
    os.makedirs(staging)
    _write_parts(
        staging,
        [("overwrite", name, df) for name, df in parts.items()],
        _partition_by,
    )
    with open(os.path.join(staging, "_index_manifest.json"), "w") as fh:
        json.dump({"parts": sorted(parts), "meta": _meta or {}}, fh)
    atomic_replace_dir(staging, path)


def _write_parts(
    staging: str,
    writes: list[tuple[str, str, DataFrame]],
    _partition_by: dict[str, list[str]] | None,
) -> None:
    """Run the part writes (mode, name, df) CONCURRENTLY from a small
    thread pool — each part is an independent Spark job writing its own
    directory, and the driver calling them sequentially serialized
    their scheduling/commit tails and their shared-subtree
    materializations (a 4-part BM25 save spent most of its wall-clock
    waiting on one job at a time; Spark's scheduler happily overlaps
    jobs, guide-standard back-fill). Bytes on disk are identical to
    the sequential form — only wall-clock ordering changes; the
    manifest is written strictly after every part committed, and any
    write error propagates before the atomic swap (the staging dir is
    simply abandoned, same as the sequential failure path).

    Parts often share a persisted upstream frame (the tokenization /
    fingerprint subtree): concurrent first readers may each compute a
    not-yet-cached partition — duplicated work bounded by the pool
    width, paid in idle cores, never in wall-clock (the cache fills
    with identical deterministic blocks either way)."""

    def _write_one(write: tuple[str, str, DataFrame]) -> None:
        mode, name, df = write
        writer = df.write.mode(mode)
        if _partition_by and name in _partition_by:
            writer = writer.partitionBy(*_partition_by[name])
        writer.parquet(os.path.join(staging, name))

    if len(writes) <= 1:
        for w in writes:
            _write_one(w)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(writes), 4)) as pool:
        # list() drains the iterator so the first exception re-raises
        list(pool.map(_write_one, writes))


def load_index(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Load every part named by the manifest as a DataFrame."""
    with open(os.path.join(path, "_index_manifest.json")) as fh:
        manifest = json.load(fh)
    return {
        name: spark.read.parquet(os.path.join(path, name))
        for name in manifest["parts"]
    }


def load_index_manifest(path: str) -> dict:
    """The stored manifest: ``{"parts": [...], "meta": {...}}`` —
    ``meta`` is ``{}`` for indexes written before meta stamping."""
    with open(os.path.join(path, "_index_manifest.json")) as fh:
        manifest = json.load(fh)
    manifest.setdefault("meta", {})
    return manifest


def _refuse_bookkeeping_part_names(parts) -> None:
    """Refuse part NAMES that the directory walkers would classify as
    hidden bookkeeping (r15 verdict battery item): a part saved as
    ``_stats`` writes fine and loads fine — then the FIRST append
    silently omits its directory from the hardlinked staging tree
    (``_link_tree`` skips bookkeeping entries), and the atomic swap
    commits an index whose manifest names a part that no longer
    exists. The data loss only surfaces at the next load, after the
    good index is gone. Fail at save/append time instead, by name."""
    bad = sorted(n for n in parts if _is_bookkeeping(n))
    if bad:
        raise ValueError(
            f"index part names {bad} start with '_' or '.' — the index "
            "walkers treat such directory entries as hidden bookkeeping "
            "(skipped on append, invisible to the layout guard). Rename "
            "the parts."
        )


def _is_bookkeeping(entry: str) -> bool:
    """Hidden/bookkeeping directory entries (``_SUCCESS``,
    ``_index_manifest.json``, ``.crc`` files) — as distinct from
    ``key=value`` PARTITION directories, which are data even when the
    partition column name starts with an underscore (``_bucket=7``).
    The old startswith(("_", ".")) test conflated the two: an
    underscore-named partition column made ``_link_tree`` silently
    DROP the whole stored part on append and blinded the layout guard
    (caught r14 by the bucketed vector-gate append==rebuild test)."""
    return entry.startswith(".") or (
        entry.startswith("_") and "=" not in entry
    )


def _link_tree(src: str, dst: str) -> None:
    """Replicate a parquet part directory via hardlinks — data bytes
    are shared, only directory entries are created (the versioned
    table's append trick). Partition subdirectories (e.g.
    ``cell_id=3``, ``_bucket=7``) are recreated; ``_SUCCESS``/hidden
    bookkeeping files are skipped at every level."""
    os.makedirs(dst, exist_ok=True)
    for entry in os.listdir(src):
        if _is_bookkeeping(entry):
            continue
        s, d = os.path.join(src, entry), os.path.join(dst, entry)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            try:
                os.link(s, d)
            except OSError as e:
                if e.errno == errno.EXDEV:
                    raise OSError(
                        errno.EXDEV,
                        "append_index carries stored files as hardlinks, "
                        "which requires the index directory and its "
                        f"staging sibling on the SAME filesystem: {s!r} -> "
                        f"{d!r} crossed devices (EXDEV). Move the index off "
                        "the mount boundary or rebuild with save_index.",
                    ) from e
                raise


def _stored_partition_cols(part_dir: str) -> list[str] | None:
    """The Hive partition columns of a stored parquet part, derived
    from its ``key=value`` directory chain — [] for a flat part, None
    for an empty part (no data committed, any layout still valid)."""
    cols: list[str] = []
    d = part_dir
    while True:
        entries = [e for e in os.listdir(d) if not _is_bookkeeping(e)]
        if not entries:
            return None if not cols else cols
        subdirs = [
            e for e in entries
            if "=" in e and os.path.isdir(os.path.join(d, e))
        ]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        d = os.path.join(d, subdirs[0])


def append_index(
    path: str,
    _partition_by: dict[str, list[str]] | None = None,
    _replace: dict[str, DataFrame] | None = None,
    **batches: DataFrame,
) -> None:
    """Append batch rows to named parts of an EXISTING index without
    rewriting the stored data — the 100 TB nightly-merge shape: a
    ``merge_*_index`` that unions stored + batch and then calls
    ``save_index`` re-WRITES the whole corpus-sized part every batch;
    this writes ONLY the batch's rows (plus one hardlink per existing
    data file, a metadata-only operation on the same filesystem) and
    swaps the new directory in with the same all-or-nothing
    renameat2 exchange as ``save_index``. Readers still see the
    complete old or the complete new index, never a mix.

    Valid ONLY for parts whose merge semantics are row-APPEND (the
    per-doc/per-vector parts: MinHash signatures, winnowing (corpus_id,
    fp) rows, SimHash fingerprints, BM25 postings/doclens, IVF-PQ
    codes — with batch ids new by the single-writer contract).
    Aggregated parts (winnowing (fp, df), BM25 dfreq/stats, bigram
    c1/c12) change existing rows on merge and cannot be row-appended
    (duplicate keys) — pass their MERGED frames via ``_replace``
    instead: those parts are written fresh in the same staging dir and
    commit in the SAME atomic swap, so one call performs the complete
    nightly merge (append the row parts, rewrite the small aggregated
    parts) with no window where the parts disagree. Parts in neither
    dict pass through untouched (hardlinked). New part names are
    allowed in both and extend the manifest (e.g. adding a positions
    part to a winnowing index after the fact).

    ``_partition_by``: {part: [cols]} for parts stored Hive-partitioned
    (appends write into the matching partition subdirectories).
    """
    _replace = _replace or {}
    if not batches and not _replace:
        raise ValueError("append_index needs at least one batch or _replace part")
    _refuse_bookkeeping_part_names({**batches, **_replace})
    overlap = set(batches) & set(_replace)
    if overlap:
        raise ValueError(f"parts cannot be both appended and replaced: {sorted(overlap)}")
    with open(os.path.join(path, "_index_manifest.json")) as fh:
        manifest = json.load(fh)
    existing = set(manifest["parts"])
    # Appending rows in a different Hive layout than the stored part
    # commits a mixed directory that save succeeds on and only
    # load_index later rejects ("conflicting directory structures") —
    # AFTER the atomic swap replaced the good index (ADVICE r09).
    # Catch the disagreement here, before anything is written.
    for name in set(batches) & existing:
        requested = list((_partition_by or {}).get(name, []))
        stored = _stored_partition_cols(os.path.join(path, name))
        if stored is not None and stored != requested:
            raise ValueError(
                f"append_index part {name!r}: stored layout is "
                f"partitioned by {stored or 'nothing'} but this append "
                f"requested {requested or 'nothing'}; pass the stored "
                "part's _partition_by (a mixed layout would only fail "
                "later, at load_index, after the swap)"
            )
    staging = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
    os.makedirs(staging)
    for name in existing - set(_replace):
        _link_tree(os.path.join(path, name), os.path.join(staging, name))
    # append-mode batch writes land in already-hardlinked directories
    # (their stored files were linked above, before any job starts);
    # _replace parts overwrite never-linked directories. All writes
    # target disjoint part dirs, so they run concurrently (same
    # independence argument as save_index's _write_parts).
    _write_parts(
        staging,
        [("append", name, df) for name, df in batches.items()]
        + [("overwrite", name, df) for name, df in _replace.items()],
        _partition_by,
    )
    with open(os.path.join(staging, "_index_manifest.json"), "w") as fh:
        json.dump(
            {
                "parts": sorted(existing | set(batches) | set(_replace)),
                # format constants travel with the index across appends —
                # dropping them here would un-stamp a stamped index and
                # silently disable the reader-side verification they exist
                # for (vec_gate_buckets, ADVICE r15)
                "meta": manifest.get("meta", {}),
            },
            fh,
        )
    atomic_replace_dir(staging, path)
