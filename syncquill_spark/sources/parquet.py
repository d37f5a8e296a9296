"""Parquet-backed Table — the tested connector implementation.

Stands in for the BigQuery side in tests (per SURVEY.md §2.1 A4); also
the natural lakehouse target at 100 TB. Overwrite is atomic via
write-to-staging + swap when ``atomic_swap`` (needed because Spark
cannot overwrite a path it is currently reading).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from syncquill_spark.sources._atomic import atomic_replace_dir
from syncquill_spark.sources.base import Table


class ParquetTable(Table):
    """NOTE: ``overwrite`` stages the new table then swaps it in with
    ``atomic_replace_dir`` — on Linux one renameat2(RENAME_EXCHANGE)
    syscall, so a reader at any instant sees the complete old or the
    complete new directory (never a missing path, never a mix); on
    other POSIX the window is two metadata renames (see _atomic.py).
    Single WRITER, many readers. On object stores (s3://, gs://)
    directory renames are not atomic at all; production tables there
    should swap via a metastore pointer or a table format
    (Delta/Iceberg) instead."""

    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        staging = f"{self.path}.__staging_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(staging)
        if os.path.exists(self.path) and not os.path.isdir(self.path):
            os.remove(self.path)
        atomic_replace_dir(staging, self.path)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """Coalesce a small-file parquet directory into ~target-size files.

    The small-file problem is the silent killer of long-lived ingest
    layouts: a stream or per-batch append leaves thousands of KB-scale
    files, and every downstream scan pays per-file open/footer cost and
    loses row-group-level skipping. Compaction reads the table once and
    rewrites it as max(ceil(bytes / target), min_files) files via the
    atomic staging-swap overwrite (readers never see a partial table).

    Returns the number of files written. Run it from a maintenance job
    keyed on file-count/size heuristics, not on every write.

    Sizing comes from Spark's own file index + Hadoop FileSystem status,
    so any URI scheme Spark can read (file://, hdfs://, s3a://, ...)
    sizes correctly — not just the local filesystem.

    Refuses Hive-partitioned layouts: a flat rewrite would silently
    demote partition directories to data columns and lose directory
    pruning. Compact those per partition (or via
    PartitionedParquetTable.overwrite, which preserves the layout).
    """
    import math

    df = spark.read.parquet(path)
    files = df.inputFiles()

    def _rel_segments(f: str) -> list[str]:
        strip = lambda s: s.split("://", 1)[-1].lstrip("/")  # noqa: E731
        root, ff = strip(path).rstrip("/"), strip(f)
        if ff.startswith(root + "/"):
            ff = ff[len(root) + 1 :]
        return ff.split("/")

    part_dirs = {
        seg for f in files for seg in _rel_segments(f)[:-1] if "=" in seg
    }
    if part_dirs:
        raise ValueError(
            f"compact_parquet: {path} is Hive-partitioned "
            f"({sorted(part_dirs)[:3]}...); a flat rewrite would drop the "
            "partition layout. Compact each partition directory, or "
            "rewrite through PartitionedParquetTable.overwrite."
        )

    total = _files_total_bytes(spark, files)
    n_files = max(min_files, math.ceil(total / target_file_bytes))
    table = ParquetTable(path)
    table.overwrite(df.repartition(n_files))
    return n_files


def _files_total_bytes(spark: SparkSession, files: list[str]) -> int:
    """Sum file sizes via Hadoop FileSystem status — correct for any
    URI scheme Spark can read (file://, hdfs://, s3a://, ...)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    return total


class PartitionedParquetTable(ParquetTable):
    """Hive-layout parquet table partitioned on low-cardinality columns
    (e.g. lang, date) — the 100 TB layout rule: a filter on a partition
    column prunes whole directories BEFORE any file is opened
    (PartitionFilters in the scan node), so a one-language query over a
    multi-PB corpus reads only that language's files. Keep partition
    columns low-cardinality (lang/date/source, never doc_id): small
    files from over-partitioning cost more than they save.
    """

    def __init__(self, path: str, partition_cols: tuple[str, ...]):
        super().__init__(path)
        self.partition_cols = tuple(partition_cols)

    def overwrite(self, df: DataFrame) -> None:
        staging = f"{self.path}.__staging_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(*self.partition_cols).parquet(staging)
        if os.path.exists(self.path) and not os.path.isdir(self.path):
            os.remove(self.path)
        atomic_replace_dir(staging, self.path)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy(*self.partition_cols).parquet(self.path)


class VersionedParquetTable(Table):
    """Snapshot-versioned parquet table: every overwrite/append creates
    an immutable numbered version; a tiny JSON manifest holds the
    current pointer. Gives plain parquet the three lakehouse
    operations CDC pipelines actually need — time-travel reads
    (``read_version``), O(1) rollback (``rollback`` flips the pointer,
    no data moves), and audit (``versions``) — without a table-format
    dependency.

    Layout: ``<path>.__v{N}/`` per version + ``<path>.__manifest.json``
    {"current": N, "versions": [...]}. The manifest update is an
    ``os.replace`` of a temp file — atomic on POSIX — so readers see
    the old or the new version, never a partial one. ``append`` builds
    the new version by HARDLINKING the current version's data files
    (O(#files) metadata ops, zero data copy; snapshots stay immutable
    because parquet files are write-once) and then appending the new
    rows as additional part files.

    Same locality caveat as ParquetTable's atomic swap: hardlinks and
    atomic replace are local/NFS semantics. On object stores use a
    table format (Delta/Iceberg) — this class is the single-FS
    equivalent of their manifest-pointer design, which is exactly why
    the pointer flip, not a directory rename, is the commit point.

    Concurrency contract: SINGLE WRITER, many readers. Readers are
    always safe (they see a complete old or new manifest). Two
    concurrent writers race the manifest's read-modify-write —
    last-commit-wins and the loser's version is silently dropped from
    the manifest (its directory orphans). Table formats solve this
    with compare-and-swap on the pointer; on a single FS, serialize
    writers (one sync job per table — the CDC deployment shape) or
    front the commit with an external lock.

    ``max_versions`` bounds retained snapshots (oldest pruned after
    commit; the current and rollback targets within the window stay
    readable).
    """

    def __init__(self, path: str, max_versions: int = 10):
        if max_versions < 1:
            raise ValueError("max_versions must be >= 1")
        self.path = path
        self.max_versions = max_versions

    # -- manifest -----------------------------------------------------
    def _manifest_path(self) -> str:
        return f"{self.path}.__manifest.json"

    def _load(self) -> dict:
        import json

        mp = self._manifest_path()
        if not os.path.exists(mp):
            return {"current": None, "versions": []}
        with open(mp) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict) -> None:
        import json

        tmp = f"{self._manifest_path()}.tmp_{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path())  # atomic pointer flip

    def _vdir(self, n: int) -> str:
        return f"{self.path}.__v{n}"

    # -- Table contract ----------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        m = self._load()
        if m["current"] is None:
            raise FileNotFoundError(f"versioned table {self.path}: no versions yet")
        return spark.read.parquet(self._vdir(m["current"]))

    def overwrite(self, df: DataFrame) -> None:
        m = self._load()
        n = max([*m["versions"], 0]) + 1
        df.write.mode("overwrite").parquet(self._vdir(n))
        m["versions"].append(n)
        m["current"] = n
        self._record_schema(m, n, df)
        self._commit(m)
        self._prune(m)

    def _record_schema(self, manifest: dict, n: int, df: DataFrame) -> None:
        # Per-version schema (JSON) recorded at commit time so append's
        # schema guard reads the manifest, not a full spark.read of the
        # current version (driver-side file listing + footer job on the
        # hot append path). Per-version (not one slot) because overwrite
        # MAY change the schema and rollback may then point anywhere.
        manifest.setdefault("schemas", {})[str(n)] = df.schema.json()

    def _current_schema(self, manifest: dict, spark) -> dict:
        """{name: dataType} of the current version — from the manifest
        when recorded, else one footer read (tables written before the
        schemas field existed)."""
        import json as _json

        from pyspark.sql.types import StructType

        stored = manifest.get("schemas", {}).get(str(manifest["current"]))
        if stored is not None:
            fields = StructType.fromJson(_json.loads(stored)).fields
        else:
            fields = spark.read.parquet(self._vdir(manifest["current"])).schema.fields
        return {f.name: f.dataType for f in fields}

    def append(self, df: DataFrame) -> None:
        m = self._load()
        if m["current"] is None:
            return self.overwrite(df)
        # Schema guard: the new version holds HARDLINKED old files next
        # to freshly appended ones, and a plain parquet read infers its
        # schema from ONE arbitrary file — with mixed schemas the
        # result is nondeterministic (a new column appears or vanishes
        # depending on which footer wins). Refuse loudly; schema
        # migrations go through overwrite, which rewrites every row.
        # The comparison schema comes from the manifest (recorded at
        # commit), not a read of the current version's files.
        current = self._current_schema(m, df.sparkSession)
        incoming = {f.name: f.dataType for f in df.schema.fields}
        if incoming != current:
            raise ValueError(
                f"versioned append schema mismatch at {self.path}: "
                f"table has {sorted(current)}, batch has "
                f"{sorted(incoming)} (or differing types). Hardlink "
                "append cannot mix schemas — migrate via overwrite()."
            )
        n = max(m["versions"]) + 1
        src, dst = self._vdir(m["current"]), self._vdir(n)
        if os.path.exists(dst):
            # Debris of a writer that crashed after creating __v{n} but
            # before the manifest flip: n > max(manifest versions), so
            # the directory CANNOT be a committed snapshot — remove it
            # rather than failing every subsequent append until a
            # manual vacuum() (overwrite already self-heals via write
            # mode; this is append's equivalent).
            shutil.rmtree(dst)
        os.makedirs(dst)
        for f in os.listdir(src):
            # skip _SUCCESS / hidden CRCs — but a `key=value` entry is
            # a PARTITION directory, not bookkeeping, even when the
            # column name starts with '_' (the index_store walkers had
            # the same conflation; fixed r14). ParquetTable's hardlink
            # append is a flat-files contract: refuse partition trees
            # loudly instead of silently skipping (underscore names)
            # or dying on a raw os.link OSError (other names).
            if f.startswith(".") or (f.startswith("_") and "=" not in f):
                continue
            s = os.path.join(src, f)
            if os.path.isdir(s):
                raise ValueError(
                    f"versioned table at {self.path} holds a partition "
                    f"subdirectory {f!r}; ParquetTable append supports "
                    "flat parquet layouts only — store Hive-partitioned "
                    "parts via index_store.append_index, which carries "
                    "partition trees."
                )
            os.link(s, os.path.join(dst, f))
        df.write.mode("append").parquet(dst)
        m["versions"].append(n)
        m["current"] = n
        self._record_schema(m, n, df)
        self._commit(m)
        self._prune(m)

    # -- versioning surface ------------------------------------------
    def versions(self) -> list[int]:
        return list(self._load()["versions"])

    def current_version(self) -> int | None:
        return self._load()["current"]

    def read_version(self, spark: SparkSession, n: int) -> DataFrame:
        m = self._load()
        if n not in m["versions"]:
            raise ValueError(f"version {n} not in {m['versions']}")
        return spark.read.parquet(self._vdir(n))

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 512 * 1024 * 1024,
        min_files: int = 1,
    ) -> int:
        """Rewrite the CURRENT version as a NEW few-file version through
        the same manifest flip (contents identical, file count ~total /
        target). Hardlink ``append`` accumulates part files
        monotonically — after N appends the live version carries N
        generations of small files and every reader pays the per-file
        open/footer cost. Compaction is one read + one write of the
        live data; older snapshots stay untouched, so time-travel reads
        and O(1) ``rollback`` keep working, and a reader mid-compaction
        sees the old version until the pointer flips. Run it from a
        maintenance job keyed on file-count heuristics, like
        ``compact_parquet``. Returns the number of files written."""
        import math

        m = self._load()
        if m["current"] is None:
            raise FileNotFoundError(
                f"versioned table {self.path}: no versions yet"
            )
        df = spark.read.parquet(self._vdir(m["current"]))
        total = _files_total_bytes(spark, df.inputFiles())
        n_files = max(min_files, math.ceil(total / target_file_bytes))
        self.overwrite(df.repartition(n_files))
        return n_files

    def rollback(self, n: int) -> None:
        m = self._load()
        if n not in m["versions"]:
            raise ValueError(f"version {n} not in {m['versions']}")
        m["current"] = n
        self._commit(m)

    def vacuum(self) -> list[int]:
        """Remove version DIRECTORIES not referenced by the manifest —
        the debris of a writer that crashed after writing data but
        before the manifest commit (the commit point is the pointer
        flip, so such a version was never visible). Returns the
        version numbers removed. A writer creates its ``__v{N}``
        directory BEFORE the manifest flip, so a vacuum racing an
        in-flight write would delete the version being committed —
        run it only while no write is in flight, the same
        serialization rule the single-writer contract already imposes.
        """
        import glob as _glob
        import re as _re

        live = set(self._load()["versions"])
        removed = []
        for d in _glob.glob(f"{self.path}.__v*"):
            m = _re.fullmatch(_re.escape(self.path) + r"\.__v(\d+)", d)
            if m and int(m.group(1)) not in live:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(int(m.group(1)))
        return sorted(removed)

    def _prune(self, manifest: dict) -> None:
        # retain the newest max_versions snapshots, but never delete
        # the current pointer's target
        keep = set(sorted(manifest["versions"])[-self.max_versions:])
        keep.add(manifest["current"])
        drop = [v for v in manifest["versions"] if v not in keep]
        if not drop:
            return
        manifest["versions"] = [v for v in manifest["versions"] if v in keep]
        for v in drop:
            manifest.get("schemas", {}).pop(str(v), None)
        self._commit(manifest)
        for v in drop:
            shutil.rmtree(self._vdir(v), ignore_errors=True)
