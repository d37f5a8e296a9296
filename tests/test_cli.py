

def test_cli_queries_lists_registry(capsys):
    from syncquill_spark.cli import main
    from syncquill_spark.plans import QUERIES

    assert main(["queries"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == list(QUERIES)


def test_cli_query_unknown_name_errors(capsys):
    from syncquill_spark.cli import main

    assert main(["query", "definitely_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_query_runs_and_shows(capsys, sf_dir):
    from syncquill_spark.cli import main

    assert main(["query", "dedup_exact", "--sf-dir", sf_dir, "--limit", "3"]) == 0
    assert "keeper_doc_id" in capsys.readouterr().out


def test_cli_versioned_sync_versions_rollback(spark, tmp_path, capsys):
    """End-to-end CLI on a versioned target: sync lands as a snapshot,
    `versions` lists them, `rollback --to` flips the pointer (no Spark
    session needed for the metadata actions)."""
    from syncquill_spark.cli import main
    from syncquill_spark.sources.parquet import VersionedParquetTable

    src = str(tmp_path / "src.pq")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "slno long, name string"
    ).write.parquet(src)
    tgt = str(tmp_path / "tgt")
    VersionedParquetTable(tgt).overwrite(
        spark.createDataFrame([(1, "a"), (2, "x")], "slno long, name string")
    )

    assert main(["sync", "--source", f"parquet:{src}", "--target", f"versioned:{tgt}"]) == 0
    capsys.readouterr()
    assert main(["versions", "--target", f"versioned:{tgt}"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["v1", "v2 *"]
    assert main(["rollback", "--target", f"versioned:{tgt}", "--to", "1"]) == 0
    assert VersionedParquetTable(tgt).current_version() == 1
    # guard rails: non-versioned target / missing --to
    assert main(["versions", "--target", f"parquet:{src}"]) == 2
    assert main(["rollback", "--target", f"versioned:{tgt}"]) == 2


def test_cli_sql_over_fixture_views(spark, capsys):
    """`sql` action: every fixture table is a temp view; an ad-hoc
    statement runs and prints."""
    from syncquill_spark.cli import main

    rc = main([
        "sql",
        "SELECT COUNT(*) AS n FROM region",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0
    assert "5" in capsys.readouterr().out
    assert main(["sql", "--sf-dir", "/root/testdata/sf0.001"]) == 2


def test_cli_ingest_textdir(spark, tmp_path, capsys):
    from syncquill_spark.cli import main

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("doc one")
    (d / "b.txt").write_text("doc two")
    out = str(tmp_path / "docs.pq")
    assert main(["ingest", "--source", f"textdir:{d}", "--out", out]) == 0
    assert "2 rows" in capsys.readouterr().out
    got = sorted(r.text for r in spark.read.parquet(out).collect())
    assert got == ["doc one", "doc two"]
    # guard rails
    assert main(["ingest", "--source", f"textdir:{d}"]) == 2
    assert main(["ingest", "--source", f"bogus:{d}", "--out", out]) == 2


def test_cli_content_ids_requires_per_line(capsys):
    """ADVICE r07: reject --content-ids without --per-line as an
    argparse usage error at the CLI boundary (exit 2), not a ValueError
    traceback from deep inside read_text_dir."""
    import pytest

    from syncquill_spark.cli import parse_arguments

    with pytest.raises(SystemExit) as ei:
        parse_arguments(["ingest", "--source", "textdir:/tmp/x",
                         "--target", "parquet:/tmp/y", "--content-ids"])
    assert ei.value.code == 2
    assert "--content-ids requires --per-line" in capsys.readouterr().err


def test_cli_export_training_shards(spark, tmp_path, capsys):
    """The release verb (r10): ingest a corpus, export it as shuffled
    training shards, manifest verified in the same invocation; the
    written release reads back through the consumer gate."""
    import json
    import os

    from syncquill_spark.cli import main
    from syncquill_spark.sources.training_export import read_training_shards

    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(6):
        (d / f"doc{i}.txt").write_text(f"alpha beta doc number {i}")
    docs_pq = str(tmp_path / "docs.pq")
    assert main(["ingest", "--source", f"textdir:{d}", "--out", docs_pq]) == 0
    rel = str(tmp_path / "release")
    assert main([
        "export", "--source", f"parquet:{docs_pq}", "--out", rel,
        "--key", "doc_id", "--shards", "3",
    ]) == 0
    out = capsys.readouterr().out
    assert "exported 6 docs" in out and "manifest verified" in out
    frame, manifest = read_training_shards(spark, rel, verify=True)
    assert frame.count() == 6 and manifest["n_shards"] == 3
    assert manifest["total_tokens"] == 6 * 5  # five whitespace tokens
    with open(os.path.join(rel, "_export_manifest.json")) as fh:
        assert json.load(fh) == manifest
    # guard rail: --out required
    assert main(["export", "--source", f"parquet:{docs_pq}"]) == 2


def test_cli_sync_validation_error_prints_and_exits_clean(spark, tmp_path, capsys):
    """Reference parity (syncquill.py:66-74): a constraint violation
    at the CLI prints the "Error: ..." message to stdout and exits 0
    (the reference calls exit(0)) — no traceback. Library callers
    still get the raised ValidationError (tests/test_validate.py)."""
    from syncquill_spark.cli import main

    src = str(tmp_path / "nokey.pq")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(src)
    tgt = str(tmp_path / "tgt.pq")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(tgt)
    assert main(["sync", "--source", f"parquet:{src}", "--target", f"parquet:{tgt}"]) == 0
    out = capsys.readouterr().out
    assert "Error: Missing 'slno' column in header" in out
    # --strict (ADVICE r12): same message, exit 1, so scripts can tell
    # a failed sync from a clean one; parity exit 0 stays the default.
    assert main([
        "sync", "--strict",
        "--source", f"parquet:{src}", "--target", f"parquet:{tgt}",
    ]) == 1
    assert "Error: Missing 'slno' column in header" in capsys.readouterr().out
