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
per-line mode); the whole ingestion is a projection — no shuffle.
`pathGlobFilter` prunes at the directory listing, same as binaryFile.
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
) -> DataFrame:
    """(doc_id, source_path, text[, n_chars]) from a text-file tree.

    ``per_line=False`` (default): one doc per file, id = hash of the
    file path. ``per_line=True``: one doc per line, id = hash of
    (path, line content) — duplicate lines in one file collapse to one
    id; run exact dedup downstream anyway (every corpus pipeline
    does).
    """
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
        id_src = F.concat_ws("\x00", F.col("source_path"), F.col("text"))
    return keyed.select(
        portable_hash60(
            F.concat_ws(":", F.lit(id_salt), id_src)
        ).alias("doc_id"),
        "source_path",
        "text",
        F.length("text").cast("long").alias("n_chars"),
    )
