"""Raw-text corpus ingestion: directories of .txt files (or any
line/doc-oriented text dump) -> the engine's documents table shape.

Two layouts cover the common crawl-dump conventions:

- ``one doc per FILE`` (wholetext): each file becomes one row — the
  scraped-pages layout. Built on ``spark.read.text(wholetext=True)``;
  ids are salted path hashes (join-stable across re-ingestions, like
  media_files).
- ``one doc per LINE``: each line of every file is a row — the
  TSV/one-record-per-line layout. Built on the plain text source;
  ids are (file, line-position)-free — they hash the CONTENT, because
  line order inside a split is not a stable identity at scale (two
  ingestions may split files differently); callers needing positional
  ids should ingest per-file and derive them downstream.

Scale shape: the text source parallelizes by file (and by split for
per-line mode); wholetext ingestion is a projection — no shuffle.
Per-line mode adds ONE dropDuplicates shuffle on doc_id, because its
ids hash the content: without it, a line repeated within a file
yields several rows SHARING one id, and every downstream operator
that tie-breaks or joins on doc_id (which is all of them) becomes
nondeterministic. `pathGlobFilter` prunes at the directory listing,
same as binaryFile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from syncquill_spark.functions.hashing import portable_hash60


def read_text_dir(
    spark: SparkSession,
    path: str,
    per_line: bool = False,
    glob: str | None = None,
    recursive: bool = True,
    id_salt: str = "textdoc-v1",
    path_in_id: bool = True,
) -> DataFrame:
    """(doc_id, source_path, text, n_chars) from a text-file tree.

    ``per_line=False`` (default): one doc per file, id = hash of the
    file path. ``per_line=True``: one doc per line, id = hash of
    (path, line content) — a line repeated in one file collapses to
    ONE ROW (ids are deduplicated here, so the unique-doc_id contract
    downstream operators assume holds straight out of ingestion; the
    cost is one skinny shuffle on the 60-bit id).

    ``path_in_id=False`` (per-line mode only) hashes the CONTENT
    alone: ids survive re-sharding of the dump (the same corpus
    re-split into different files re-ingests with identical ids — the
    module docstring's stability rationale taken to its conclusion),
    at the price of collapsing cross-FILE duplicate lines to one row
    too (which a corpus pipeline's exact dedup would do next anyway).
    This is also what makes ingestion ORACLE-CHECKABLE: an id derived
    only from content is reproducible by an engine that never saw the
    file layout (registry: storage_text_ingest_roundtrip).
    """
    if not path_in_id and not per_line:
        raise ValueError(
            "path_in_id=False requires per_line=True: wholetext ids are "
            "path-identities by contract (content ids without the "
            "per-line dedup would silently duplicate ids)"
        )
    reader = spark.read.option("recursiveFileLookup", str(recursive).lower())
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if not per_line:
        # NB: wholetext must go through the .text() parameter — the
        # string option key is silently ignored by the reader
        raw = reader.text(path, wholetext=True)
        keyed = raw.select(
            F.input_file_name().alias("source_path"),
            F.col("value").alias("text"),
        )
        id_src = F.col("source_path")
    else:
        raw = reader.text(path)
        keyed = raw.select(
            F.input_file_name().alias("source_path"),
            F.col("value").alias("text"),
        )
        id_src = (
            F.concat_ws("\x00", F.col("source_path"), F.col("text"))
            if path_in_id
            else F.col("text")
        )
    out = keyed.select(
        portable_hash60(
            F.concat_ws(":", F.lit(id_salt), id_src)
        ).alias("doc_id"),
        "source_path",
        "text",
        F.length("text").cast("long").alias("n_chars"),
    )
    if per_line:
        if path_in_id:
            # equal doc_id => equal (salt, path, text) modulo a 60-bit
            # collision, so dropping by id drops true repeats; rows are
            # identical across the group, so which survives is immaterial
            out = out.dropDuplicates(["doc_id"])
        else:
            # content ids: CROSS-FILE duplicate lines share a doc_id but
            # carry different source_path values, so dropDuplicates would
            # keep a partitioning-dependent survivor. Canonicalize
            # instead: min(source_path) per id (text/n_chars are equal
            # across the group — same content hash — so min is a
            # deterministic no-op there). Same single shuffle on the id.
            out = out.groupBy("doc_id").agg(
                F.min("source_path").alias("source_path"),
                F.min("text").alias("text"),
                F.min("n_chars").alias("n_chars"),
            )
    return out
