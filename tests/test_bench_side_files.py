"""Pin bench.py's side-file naming policy (no Spark session).

Round-12 verdict #6: the driver's untagged post-round rerun must not
overwrite BENCH_local_latest.json (it shadowed the builder's committed
round-final on disk). ADVICE r12: the tag is interpolated into a
filename, so it must be validated — a '/' or '..' would escape the
repo directory.
"""

import bench


def test_tagged_run_writes_latest_and_stamped():
    assert bench._side_file_names("r13_pre") == [
        "BENCH_local_latest.json",
        "BENCH_local_r13_pre.json",
    ]


def test_untagged_run_never_touches_latest():
    assert bench._side_file_names("") == ["BENCH_local_untagged.json"]
    assert bench._side_file_names("   ") == ["BENCH_local_untagged.json"]


def test_invalid_tag_is_ignored_not_interpolated(capsys):
    for bad in ("../evil", "a/b", "r13 pre", "x\ny"):
        assert bench._side_file_names(bad) == ["BENCH_local_untagged.json"]
    err = capsys.readouterr().err
    assert "ignoring invalid SPARK_GRAFT_BENCH_TAG" in err
