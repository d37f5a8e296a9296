"""Raw-text corpus ingestion (sources/text_files.py)."""

from __future__ import annotations

import os


def _tree(tmp_path):
    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    files = {
        "a.txt": "hello world\nsecond line",
        "sub/b.txt": "another document entirely",
        "c.md": "not a txt file",
    }
    for rel, text in files.items():
        (d / rel).write_text(text)
    return str(d), files


def test_read_text_dir_whole_docs(spark, tmp_path):
    from syncquill_spark.sources.text_files import read_text_dir

    root, files = _tree(tmp_path)
    rows = read_text_dir(spark, root, glob="*.txt").collect()
    by_name = {os.path.basename(r.source_path): r for r in rows}
    assert set(by_name) == {"a.txt", "b.txt"}  # glob pruned c.md
    assert by_name["a.txt"].text == files["a.txt"]  # newlines intact
    assert by_name["a.txt"].n_chars == len(files["a.txt"])
    # ids deterministic across reads, distinct across files
    ids1 = sorted(r.doc_id for r in rows)
    ids2 = sorted(r.doc_id for r in read_text_dir(spark, root, glob="*.txt").collect())
    assert ids1 == ids2 and len(set(ids1)) == 2


def test_read_text_dir_per_line_and_downstream_compose(spark, tmp_path):
    from syncquill_spark.operators.text import quality_features
    from syncquill_spark.sources.text_files import read_text_dir

    root, _ = _tree(tmp_path)
    rows = read_text_dir(spark, root, per_line=True, glob="*.txt").collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["another document entirely", "hello world", "second line"]
    assert len({r.doc_id for r in rows}) == 3
    # composes with the text operators unchanged
    df = read_text_dir(spark, root, per_line=True, glob="*.txt")
    feats = quality_features(df).collect()
    assert len(feats) == 3 and all(f.n_tokens >= 2 for f in feats)


def test_read_text_dir_per_line_repeated_lines_collapse(spark, tmp_path):
    """ADVICE r06: a line repeated within one file hashes to the same
    doc_id; per-line ingestion must emit it ONCE so the unique-id
    contract downstream operators assume holds from the first hop."""
    from syncquill_spark.sources.text_files import read_text_dir

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "dup.txt").write_text("same line\nsame line\nother line\nsame line")
    rows = read_text_dir(spark, str(d), per_line=True).collect()
    assert sorted(r.text for r in rows) == ["other line", "same line"]
    assert len({r.doc_id for r in rows}) == len(rows) == 2


def test_read_text_dir_content_ids_canonical_survivor(spark, tmp_path):
    """ADVICE r07: with path_in_id=False a line duplicated across FILES
    shares a doc_id but not a source_path, so the survivor must be
    canonicalized (min source_path) — not dropDuplicates' partitioning-
    dependent pick. Ingestion's contract is determinism."""
    from syncquill_spark.sources.text_files import read_text_dir

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "b.txt").write_text("shared line\nonly b")
    (d / "a.txt").write_text("shared line\nonly a")
    rows = read_text_dir(spark, str(d), per_line=True, path_in_id=False).collect()
    assert sorted(r.text for r in rows) == ["only a", "only b", "shared line"]
    by_text = {r.text: r for r in rows}
    # deterministic survivor: lexicographically smallest source path
    assert by_text["shared line"].source_path.endswith("a.txt")
    assert by_text["shared line"].n_chars == len("shared line")
