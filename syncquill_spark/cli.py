"""CLI (reference operators A13/A14, syncquill.py:148-161, 217-239).

``syncquill-spark sync|upsert --source ... --target ...`` with the
reference's arg-over-env resolution (load_env_or_args, 158-161).
Connectors are URI-selected: ``parquet:/path``, ``csv:/path``,
``json:/path``, ``orc:/path``, ``versioned:/path`` (snapshot-versioned
parquet: every sync/upsert lands as a new immutable version),
``bq:dataset.table``, ``sheets:spreadsheet_id/range``. The
``versions`` / ``rollback --to N`` actions inspect and flip a
versioned target's manifest pointer (metadata-only, no Spark
session). ``ingest --source textdir:/dir|mediadir:/dir --out p``
converts a raw text or media corpus to parquet; ``sql "<stmt>"``
runs ad-hoc ANSI SQL over the fixture views; ``export --source
parquet:/tbl --out /release --key doc_id [--shards N --token-col c
--salt s]`` writes the shuffled training-shard release with a
verified manifest (sources/training_export.py) — the verb that
closes the pipeline ``ingest`` opens.
"""

from __future__ import annotations

import argparse
import os
import sys

from syncquill_spark import get_spark
from syncquill_spark.engine import sync, upsert
from syncquill_spark.sources import BigQueryTable, ParquetTable, SheetsTable, Table


def _load_dotenv(path: str = ".env") -> None:
    """Load KEY=VALUE lines from a .env file into os.environ, matching
    the reference's load_dotenv() call before env resolution
    (syncquill.py:219-224). Uses python-dotenv when available;
    otherwise a minimal parser (comments and blank lines skipped,
    existing environment wins — dotenv's default)."""
    try:
        from dotenv import load_dotenv  # type: ignore

        load_dotenv(path)
        return
    except ImportError:
        pass
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            k, v = k.strip(), v.strip().strip("'\"")
            os.environ.setdefault(k, v)


def _resolve(arg_value: str | None, env_var: str) -> str:
    """CLI arg wins over env var (syncquill.py:158-161)."""
    if arg_value is None:
        return os.environ[env_var]
    return arg_value


def table_from_uri(uri: str) -> Table:
    scheme, _, rest = uri.partition(":")
    if scheme == "parquet":
        return ParquetTable(rest)
    if scheme == "csv":
        from syncquill_spark.sources.files import CsvTable

        return CsvTable(rest)
    if scheme == "json":
        from syncquill_spark.sources.files import JsonTable

        return JsonTable(rest)
    if scheme == "orc":
        from syncquill_spark.sources.files import OrcTable

        return OrcTable(rest)
    if scheme == "versioned":
        from syncquill_spark.sources.parquet import VersionedParquetTable

        return VersionedParquetTable(rest)
    if scheme == "bq":
        dataset, _, table = rest.partition(".")
        return BigQueryTable(dataset, table)
    if scheme == "sheets":
        sid, _, rng = rest.partition("/")
        return SheetsTable(sid, rng or "Sheet1")
    raise ValueError(f"unknown table URI scheme: {uri!r}")


def parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="PySpark-native table sync engine")
    p.add_argument(
        "action",
        choices=[
            "sync", "upsert", "query", "queries", "sql", "versions",
            "rollback", "ingest", "export",
        ],
    )
    p.add_argument("name", nargs="?", help="query name (for the `query` action)")
    p.add_argument("--source", help="source table URI (env: SYNC_SOURCE)")
    p.add_argument("--target", help="target table URI (env: SYNC_TARGET)")
    p.add_argument("--key", default="slno")
    p.add_argument("--mode", choices=["keyed", "positional"], default="keyed")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument(
        "--strict", action="store_true",
        help="exit 1 (instead of the reference-parity exit 0) when "
        "sync/upsert aborts on a validation error, so scripts can "
        "distinguish a failed sync from a clean one",
    )
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="fixture dir for the `query` action (env: SPARK_GRAFT_SF_DIR)",
    )
    p.add_argument("--limit", type=int, default=20, help="rows to show for `query`")
    p.add_argument(
        "--out", help="optional parquet path: write the full query result there"
    )
    p.add_argument(
        "--to", type=int, help="version number (for the `rollback` action)"
    )
    p.add_argument("--glob", help="file glob for the `ingest` action")
    p.add_argument(
        "--per-line", action="store_true",
        help="ingest one doc per LINE instead of per file (textdir only)",
    )
    p.add_argument(
        "--content-ids", action="store_true",
        help="derive doc ids from CONTENT only (per-line ingest): ids "
        "survive re-sharding of the dump; cross-file duplicate lines "
        "collapse to one row",
    )
    p.add_argument(
        "--shards", type=int, default=16,
        help="shard count for the `export` action",
    )
    p.add_argument(
        "--text-col", default="text",
        help="text column for the `export` action",
    )
    p.add_argument(
        "--token-col",
        help="precomputed per-doc token-count column for the `export` "
        "manifest (default: whitespace tokens)",
    )
    p.add_argument(
        "--salt", default="shuffle-v1",
        help="shuffle salt for the `export` action (a new salt is a "
        "fresh epoch permutation)",
    )
    args = p.parse_args(argv)
    if args.content_ids and not args.per_line:
        # usage error at the CLI boundary, not a ValueError traceback
        # from deep inside read_text_dir
        p.error("--content-ids requires --per-line (content-derived ids "
                "are defined for per-line ingest only)")
    return args


def main(argv: list[str] | None = None) -> int:
    _load_dotenv()  # .env before env resolution (syncquill.py:219-224)
    args = parse_arguments(argv)
    if args.action == "queries":
        from syncquill_spark.plans import QUERIES

        for name in QUERIES:
            print(name)
        return 0
    if args.action == "sql":
        # ad-hoc ANSI SQL over the fixture tables: every table in
        # --sf-dir is registered as a temp view (events normalized to
        # epoch-nanos like every registry query sees it)
        if not args.name:
            print("sql needs a statement argument", file=sys.stderr)
            return 2
        import glob as _glob

        from syncquill_spark.plans import load_tables

        spark = get_spark("syncquill-spark-cli")
        names = sorted(
            os.path.basename(f)[: -len(".parquet")]
            for f in _glob.glob(os.path.join(args.sf_dir, "*.parquet"))
        )
        for n, df in zip(names, load_tables(spark, args.sf_dir, *names)):
            df.createOrReplaceTempView(n)
        out = spark.sql(args.name)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            out.show(args.limit, truncate=False)
        return 0
    if args.action == "query":
        from syncquill_spark.plans import QUERIES

        if not args.name or args.name not in QUERIES:
            print(
                f"unknown query {args.name!r}; run `queries` to list all",
                file=sys.stderr,
            )
            return 2
        spark = get_spark("syncquill-spark-cli")
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            df.show(args.limit, truncate=False)
        return 0
    if args.action == "ingest":
        # raw-corpus -> parquet: textdir:/path (one doc per file, or
        # --per-line) and mediadir:/path (binary payloads + metadata)
        src = _resolve(args.source, "SYNC_SOURCE")
        if not args.out:
            print("ingest needs --out <parquet path>", file=sys.stderr)
            return 2
        scheme, _, rest = src.partition(":")
        spark = get_spark("syncquill-spark-cli")
        if scheme == "textdir":
            from syncquill_spark.sources.text_files import read_text_dir

            df = read_text_dir(
                spark, rest, per_line=args.per_line, glob=args.glob,
                path_in_id=not args.content_ids,
            )
        elif scheme == "mediadir":
            from syncquill_spark.sources.media_files import read_media_dir

            df = read_media_dir(spark, rest, glob=args.glob)
        else:
            print(
                f"ingest supports textdir:/path or mediadir:/path, got {src!r}",
                file=sys.stderr,
            )
            return 2
        df.write.mode("overwrite").parquet(args.out)
        # count the WRITTEN table, not the source plan — a re-count of
        # the source would re-scan (and for mediadir re-read payloads)
        n = spark.read.parquet(args.out).count()
        print(f"ingested {n} rows -> {args.out}")
        return 0
    if args.action == "export":
        # curated table -> shuffled training shards + verified manifest
        # (sources/training_export.py): the release verb closing the
        # pipeline the ingest verb opens
        src = _resolve(args.source, "SYNC_SOURCE")
        if not args.out:
            print("export needs --out <release dir>", file=sys.stderr)
            return 2
        from syncquill_spark.sources.training_export import (
            read_training_shards,
            write_training_shards,
        )

        spark = get_spark("syncquill-spark-cli")
        df = table_from_uri(src).read(spark)
        manifest = write_training_shards(
            df,
            args.out,
            n_shards=args.shards,
            id_col=args.key,
            text_col=args.text_col,
            token_col=args.token_col,
            salt=args.salt,
        )
        read_training_shards(spark, args.out, verify=True)
        print(
            f"exported {manifest['total_docs']} docs / "
            f"{manifest['total_tokens']} tokens ({manifest['token_unit']}) "
            f"-> {args.out} in {args.shards} shards, manifest verified"
        )
        return 0
    if args.action in ("versions", "rollback"):
        from syncquill_spark.sources.parquet import VersionedParquetTable

        t = table_from_uri(_resolve(args.target, "SYNC_TARGET"))
        if not isinstance(t, VersionedParquetTable):
            print(
                f"{args.action} needs a versioned: target URI", file=sys.stderr
            )
            return 2
        # manifest-only operations: no SparkSession startup
        if args.action == "versions":
            cur = t.current_version()
            for v in t.versions():
                print(f"v{v}{' *' if v == cur else ''}")
            return 0
        if args.to is None:
            print("rollback needs --to <version>", file=sys.stderr)
            return 2
        t.rollback(args.to)
        print(f"rolled back to v{args.to}")
        return 0
    source = table_from_uri(_resolve(args.source, "SYNC_SOURCE"))
    target = table_from_uri(_resolve(args.target, "SYNC_TARGET"))
    spark = get_spark("syncquill-spark-cli")
    from syncquill_spark.operators import ValidationError

    try:
        if args.action == "sync":
            result = sync(
                spark,
                source,
                target,
                key=args.key,
                mode=args.mode,
                dry_run=args.dry_run,
            )
            print(result.report if result.n_changes else "No changes.")
        else:
            upsert(spark, source, target)
            print("Successfully added/updated table.")
    except ValidationError as exc:
        # Reference parity (syncquill.py:66-74): a constraint violation
        # PRINTS the "Error: ..." message to stdout and exits cleanly
        # (the reference calls exit(0)) — the message is the contract,
        # not a traceback. Library callers still get the raised
        # ValidationError; only the CLI flattens it. ADVICE r12:
        # --strict opts into exit 1 so scripts can tell a failed sync
        # from a clean one; parity stays the default.
        print(exc)
        return 1 if args.strict else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
