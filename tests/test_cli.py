

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
