"""VersionedParquetTable: snapshot versions, time travel, O(1)
rollback, hardlink append, retention pruning."""

from __future__ import annotations

import os

import pytest

from syncquill_spark.sources.parquet import VersionedParquetTable


def _df(spark, ids):
    return spark.createDataFrame([(i, f"r{i}") for i in ids], "id long, v string")


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_versioned_overwrite_and_time_travel(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    t.overwrite(_df(spark, [1, 2]))
    t.overwrite(_df(spark, [3, 4, 5]))
    assert t.versions() == [1, 2] and t.current_version() == 2
    assert _ids(t.read(spark)) == [3, 4, 5]
    # time travel: the old snapshot is still fully readable
    assert _ids(t.read_version(spark, 1)) == [1, 2]
    with pytest.raises(ValueError):
        t.read_version(spark, 99)


def test_versioned_rollback_is_pointer_flip(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, [1]))
    t.overwrite(_df(spark, [2]))
    t.rollback(1)
    assert t.current_version() == 1
    assert _ids(t.read(spark)) == [1]
    # rollback is metadata-only: version 2's data is untouched
    assert _ids(t.read_version(spark, 2)) == [2]
    # a new overwrite from the rolled-back state becomes version 3
    t.overwrite(_df(spark, [7]))
    assert t.versions() == [1, 2, 3] and _ids(t.read(spark)) == [7]


def test_versioned_append_hardlinks_previous_snapshot(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, [1, 2]))
    t.append(_df(spark, [3]))
    assert _ids(t.read(spark)) == [1, 2, 3]
    # the pre-append snapshot is immutable and still reads clean
    assert _ids(t.read_version(spark, 1)) == [1, 2]
    # data files are hardlinked, not copied: the shared parts have
    # link count 2
    v1 = str(tmp_path / "t.__v1")
    data_files = [f for f in os.listdir(v1) if not f.startswith(("_", "."))]
    assert data_files and all(
        os.stat(os.path.join(v1, f)).st_nlink >= 2 for f in data_files
    )
    # append on an empty table degrades to overwrite
    t2 = VersionedParquetTable(str(tmp_path / "t2"))
    t2.append(_df(spark, [9]))
    assert _ids(t2.read(spark)) == [9] and t2.versions() == [1]


def test_versioned_retention_prunes_oldest(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "t"), max_versions=2)
    for i in range(4):
        t.overwrite(_df(spark, [i]))
    assert t.versions() == [3, 4] and t.current_version() == 4
    assert not os.path.exists(str(tmp_path / "t.__v1"))
    assert _ids(t.read_version(spark, 3)) == [2]
    # rollback target must be a retained version
    with pytest.raises(ValueError):
        t.rollback(1)


def test_versioned_append_after_rollback_branches_from_target(spark, tmp_path):
    """Rollback then append: the new version builds on the ROLLED-BACK
    snapshot, not the abandoned newer one — the repair workflow (bad
    load at v2, roll back to v1, resume appending)."""
    t = VersionedParquetTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, [1]))
    t.overwrite(_df(spark, [2]))  # the bad load
    t.rollback(1)
    t.append(_df(spark, [5]))
    assert t.current_version() == 3
    assert _ids(t.read(spark)) == [1, 5]  # 2 is not in the lineage
    assert _ids(t.read_version(spark, 2)) == [2]  # but still auditable


def test_sync_engine_composes_with_versioned_target(spark, tmp_path):
    """engine.sync against a VersionedParquetTable: the apply lands as
    a new immutable snapshot, the pre-sync state stays readable, and a
    bad sync is one rollback away — CDC with an undo button."""
    from syncquill_spark.engine import sync
    from syncquill_spark.sources import ParquetTable

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "slno long, name string"
    ).write.parquet(src)
    t = VersionedParquetTable(str(tmp_path / "tgt"))
    t.overwrite(
        spark.createDataFrame([(1, "a"), (2, "x")], "slno long, name string")
    )
    sync(spark, ParquetTable(src), t)
    assert t.versions() == [1, 2]
    assert sorted(r.slno for r in t.read(spark).collect()) == [1, 2, 3]
    # pre-sync state auditable; rollback restores it
    t.rollback(1)
    assert sorted((r.slno, r.name) for r in t.read(spark).collect()) == [
        (1, "a"), (2, "x"),
    ]


def test_streaming_sync_versions_every_microbatch(spark, tmp_path):
    """incremental_sync into a VersionedParquetTable: each micro-batch
    lands as its own immutable snapshot — a streaming CDC pipeline with
    per-batch audit history and rollback, no code changes on either
    side (both program against the Table contract)."""
    from syncquill_spark.streaming.incremental_sync import incremental_sync

    src_path = str(tmp_path / "src")
    os.makedirs(src_path)
    schema = "slno string, name string"
    spark.createDataFrame([("1", "a"), ("2", "b")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_path)
    spark.createDataFrame([("3", "c")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_path)

    t = VersionedParquetTable(str(tmp_path / "tgt"))
    t.overwrite(spark.createDataFrame([("1", "a")], schema))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    q = incremental_sync(
        spark, stream, t, key="slno",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    # one initial version + one per non-empty micro-batch
    assert t.current_version() == len(t.versions()) and len(t.versions()) == 3
    final = {r.slno for r in t.read(spark).collect()}
    assert final == {"1", "2", "3"}
    # time travel: the pre-stream snapshot is intact
    assert {r.slno for r in t.read_version(spark, 1).collect()} == {"1"}


from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("append"), st.lists(st.integers(10, 19), min_size=1, max_size=2)),
        st.tuples(st.just("rollback"), st.integers(0, 5)),
    ),
    min_size=2,
    max_size=6,
)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_ops)
def test_versioned_table_matches_sequential_model(spark, tmp_path, ops):
    """Model-based property: any sequence of overwrite/append/rollback
    leaves the table reading exactly what a trivial in-memory model
    says, and every retained snapshot stays immutable."""
    import uuid as _uuid

    t = VersionedParquetTable(str(tmp_path / f"t_{_uuid.uuid4().hex[:8]}"))
    model_versions: dict[int, list[int]] = {}
    current = None
    next_v = 1
    for op, arg in ops:
        if op == "overwrite":
            t.overwrite(_df(spark, arg))
            model_versions[next_v] = sorted(arg)
            current = next_v
            next_v += 1
        elif op == "append":
            t.append(_df(spark, arg))
            base = model_versions.get(current, [])
            model_versions[next_v] = sorted(base + arg)
            current = next_v
            next_v += 1
        else:  # rollback to the arg-th retained version if it exists
            vs = t.versions()
            if vs:
                target = vs[arg % len(vs)]
                t.rollback(target)
                current = target
    if current is None:
        return
    assert _ids(t.read(spark)) == model_versions[current]
    # every retained snapshot still reads exactly its model content
    for v in t.versions():
        assert _ids(t.read_version(spark, v)) == model_versions[v]


def test_vacuum_removes_only_orphaned_versions(spark, tmp_path):
    """A crash between data write and manifest commit leaves a version
    directory the manifest never references; vacuum removes exactly
    those and never a live snapshot."""
    import shutil as _sh

    t = VersionedParquetTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, [1]))
    t.overwrite(_df(spark, [2]))
    # simulate the crashed writer: a data dir with no manifest entry
    _sh.copytree(str(tmp_path / "t.__v2"), str(tmp_path / "t.__v9"))
    assert t.vacuum() == [9]
    assert not os.path.exists(str(tmp_path / "t.__v9"))
    # live versions untouched, table still reads
    assert t.versions() == [1, 2]
    assert _ids(t.read(spark)) == [2] and _ids(t.read_version(spark, 1)) == [1]
    assert t.vacuum() == []  # idempotent


def test_versioned_append_rejects_schema_drift(spark, tmp_path):
    """Hardlink append mixes old and new part files in one directory,
    and a plain parquet read infers its schema from ONE arbitrary
    footer — mixed schemas would read nondeterministically. Append
    must refuse loudly; migrations go through overwrite."""
    import pytest

    from syncquill_spark.sources.parquet import VersionedParquetTable

    t = VersionedParquetTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(
            spark.createDataFrame([(2, "b", 9.5)], "k long, v string, x double")
        )
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(spark.createDataFrame([(2,)], "k long"))  # dropped column
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(spark.createDataFrame([("2", "b")], "k string, v string"))  # type
    # same columns in a different order are the SAME schema (parquet
    # matches by name)
    t.append(spark.createDataFrame([("c", 3)], "v string, k long"))
    assert t.current_version() == 2
    assert sorted((r.k, r.v) for r in t.read(spark).collect()) == [(1, "a"), (3, "c")]


def test_versioned_manifest_records_schema_and_prunes_it(spark, tmp_path):
    """ADVICE r07: append's schema guard reads the schema RECORDED in
    the manifest at commit time, not a full spark.read of the current
    version on the hot append path; legacy manifests (no schemas field)
    fall back to a footer read. Pruning drops dead entries."""
    import json

    t = VersionedParquetTable(str(tmp_path / "t"), max_versions=2)
    t.overwrite(_df(spark, [1]))
    t.append(_df(spark, [2]))
    mp = str(tmp_path / "t") + ".__manifest.json"
    with open(mp) as fh:
        m = json.load(fh)
    assert set(m["schemas"]) == {"1", "2"}
    # guard still fires, sourced from the manifest schema
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(spark.createDataFrame([(9,)], "id long"))
    # legacy manifest: delete the schemas field -> footer-read fallback
    del m["schemas"]
    with open(mp, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(spark.createDataFrame([(9,)], "id long"))
    t.append(_df(spark, [3]))
    assert _ids(t.read(spark)) == [1, 2, 3]
    # retention pruning removes the dropped versions' schema entries too
    # (v2 has none — it predates the wiped field; v3's was re-recorded)
    with open(mp) as fh:
        m2 = json.load(fh)
    assert m2["versions"] == [2, 3]
    assert set(m2["schemas"]) <= {str(v) for v in m2["versions"]}
    assert "3" in m2["schemas"]


def test_versioned_compact_rewrites_current_version(spark, tmp_path):
    """Round-7 verdict #5: hardlink append accumulates part files
    monotonically; compact() rewrites the live version as a NEW few-file
    version through the same manifest flip — contents identical, old
    snapshots (and O(1) rollback) untouched."""
    t = VersionedParquetTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, [1, 2]).repartition(4))
    for i in range(3):
        t.append(_df(spark, [10 + i]).repartition(2))
    pre_version = t.current_version()
    pre_dir = t._vdir(pre_version)
    pre_files = [f for f in os.listdir(pre_dir) if f.endswith(".parquet")]
    pre_rows = sorted((r.id, r.v) for r in t.read(spark).collect())
    assert len(pre_files) >= 4  # the small-file problem is real here
    n = t.compact(spark)
    assert n == 1 and t.current_version() == pre_version + 1
    post_files = [
        f for f in os.listdir(t._vdir(t.current_version()))
        if f.endswith(".parquet")
    ]
    assert len(post_files) == 1
    assert sorted((r.id, r.v) for r in t.read(spark).collect()) == pre_rows
    # compaction is an ordinary version: time travel + rollback still work
    assert sorted(
        (r.id, r.v) for r in t.read_version(spark, pre_version).collect()
    ) == pre_rows
    t.rollback(pre_version)
    assert sorted((r.id, r.v) for r in t.read(spark).collect()) == pre_rows
