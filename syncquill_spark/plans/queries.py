"""Oracle-checked query registry.

Every operator the engine claims (SURVEY.md §2) appears here twice:
as a Spark DataFrame program in ``QUERIES`` and as an equivalent
DuckDB SQL string in ``ORACLES`` (None => rows-only check for ops that
SQL cannot express). Column names/aliases match exactly on both sides
(driver hashes values after sorting columns by name).

Hash-robustness policy (cross-engine value identity):
- no raw DOUBLE in any checked output: aggregates go through exact
  DECIMAL arithmetic (CAST(x AS DECIMAL(18,2)) before SUM), ranks and
  counts are integers, everything else is strings/ints;
- doubles may be *compared/ordered* freely (same parquet bits in both
  engines) — they just don't appear in output columns;
- timestamps are projected via date_format/strftime to fixed patterns;
- no ARRAY (or other nested) columns in any checked output: the
  driver's canonicalizer sorts a pandas frame by every column and dies
  on unhashable list cells — emit per-element rows (e.g. (label, pos,
  sum_q)) or a deterministic string projection instead.

Sync-fixture queries derive a deterministic "mutated" source table from
``customer``/``supplier`` with pure SQL-expressible transforms, so the
CDC diff operators (reference syncquill.py:109-129) are verifiable
against DuckDB computing the same change set relationally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from syncquill_spark.operators.apply import apply_changes
from syncquill_spark.operators.diff import diff_keyed, diff_positional
from syncquill_spark.sources.events import normalize_event_ts


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    # events.parquet stores TIMESTAMP(NANOS); depending on the pyspark
    # runtime it decodes as epoch-nanos long (<=4.0 + legacy conf) or
    # TIMESTAMP_NTZ (>=4.1, conf dropped). normalize_event_ts absorbs
    # the drift so downstream code always sees epoch-nanos LongType.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = []
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events":
            df = normalize_event_ts(df)
        out.append(df)
    return out


# ---------------------------------------------------------------------------
# Sync fixtures: deterministic mutated source derived from customer/supplier.
# Target = customer (4 stable-typed cols); source = customer with
#   - rows c_custkey % 97 == 0 removed                  -> del_row
#   - c_mktsegment := 'SYNCED'   where c_custkey % 10 == 3   -> cell diff
#   - c_name := upper(c_name)    where c_custkey % 13 == 5   -> cell diff
#   - appended rows keyed c_custkey + 1000000 where % 83 == 1 -> extra_row
# ---------------------------------------------------------------------------

_CUST_COLS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]


def _customer_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = load_tables(spark, sf_dir, "customer")
    return customer.select(*_CUST_COLS)


def _customer_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = load_tables(spark, sf_dir, "customer")
    base = (
        customer.filter(F.col("c_custkey") % 97 != 0)
        .select(
            F.col("c_custkey"),
            F.when(F.col("c_custkey") % 13 == 5, F.upper("c_name"))
            .otherwise(F.col("c_name"))
            .alias("c_name"),
            F.col("c_nationkey"),
            F.when(F.col("c_custkey") % 10 == 3, F.lit("SYNCED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
    )
    extra = customer.filter(F.col("c_custkey") % 83 == 1).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.col("c_nationkey"),
        F.lit("EXTRA").alias("c_mktsegment"),
    )
    return base.unionByName(extra)


_CUSTOMER_SOURCE_SQL = """
    SELECT c_custkey,
           CASE WHEN c_custkey % 13 = 5 THEN upper(c_name) ELSE c_name END AS c_name,
           c_nationkey,
           CASE WHEN c_custkey % 10 = 3 THEN 'SYNCED' ELSE c_mktsegment END AS c_mktsegment
    FROM customer WHERE c_custkey % 97 <> 0
    UNION ALL
    SELECT c_custkey + 1000000,
           'NEW-' || CAST(c_custkey AS VARCHAR),
           c_nationkey,
           'EXTRA'
    FROM customer WHERE c_custkey % 83 = 1
"""


def q_sync_diff_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 keyed CDC diff: full-outer join on key + unpivot (scalable mode)."""
    return diff_keyed(
        _customer_target(spark, sf_dir),
        _customer_source(spark, sf_dir),
        key="c_custkey",
    )


_SYNC_DIFF_KEYED_SQL = f"""
WITH src AS ({_CUSTOMER_SOURCE_SQL}),
t AS (SELECT CAST(c_custkey AS VARCHAR) k, CAST(c_name AS VARCHAR) c_name,
             CAST(c_nationkey AS VARCHAR) c_nationkey, CAST(c_mktsegment AS VARCHAR) c_mktsegment
      FROM customer),
s AS (SELECT CAST(c_custkey AS VARCHAR) k, CAST(c_name AS VARCHAR) c_name,
             CAST(c_nationkey AS VARCHAR) c_nationkey, CAST(c_mktsegment AS VARCHAR) c_mktsegment
      FROM src),
j AS (SELECT t.k tk, s.k sk,
             t.c_name t_name, s.c_name s_name,
             t.c_nationkey t_nat, s.c_nationkey s_nat,
             t.c_mktsegment t_seg, s.c_mktsegment s_seg
      FROM t FULL OUTER JOIN s ON t.k = s.k)
SELECT 'del_row' AS change_type, tk AS slno, CAST(NULL AS VARCHAR) AS col,
       CAST(NULL AS VARCHAR) AS old_value, CAST(NULL AS VARCHAR) AS new_value
FROM j WHERE sk IS NULL
UNION ALL
SELECT 'extra_row', sk, NULL, NULL, NULL FROM j WHERE tk IS NULL
UNION ALL
SELECT 'diff', tk, 'c_name', t_name, s_name
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND t_name IS DISTINCT FROM s_name
UNION ALL
SELECT 'diff', tk, 'c_nationkey', t_nat, s_nat
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND t_nat IS DISTINCT FROM s_nat
UNION ALL
SELECT 'diff', tk, 'c_mktsegment', t_seg, s_seg
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND t_seg IS DISTINCT FROM s_seg
"""


def q_sync_diff_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 positional diff (reference-exact zip-by-index, syncquill.py:109-129).

    Interior deletes in the source cascade into spurious cell diffs plus
    tail del_rows — the reference's literal behavior, reproduced here.
    """
    (supplier,) = load_tables(spark, sf_dir, "supplier")
    target = supplier.select("s_suppkey", "s_name", "s_nationkey")
    source = (
        supplier.filter(F.col("s_suppkey") % 10 != 7)
        .select(
            F.col("s_suppkey"),
            F.when(
                F.col("s_suppkey") % 9 == 2,
                F.concat(F.lit("SYNC-"), F.col("s_name")),
            )
            .otherwise(F.col("s_name"))
            .alias("s_name"),
            F.col("s_nationkey"),
        )
    )
    return diff_positional(target, source, key="s_suppkey")


_SYNC_DIFF_POSITIONAL_SQL = """
WITH tgt AS (
  SELECT CAST(s_suppkey AS VARCHAR) s_suppkey, CAST(s_name AS VARCHAR) s_name,
         CAST(s_nationkey AS VARCHAR) s_nationkey,
         ROW_NUMBER() OVER (ORDER BY s_suppkey) pos
  FROM supplier),
srcb AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 9 = 2 THEN 'SYNC-' || s_name ELSE s_name END AS s_name,
         s_nationkey
  FROM supplier WHERE s_suppkey % 10 <> 7),
src AS (
  SELECT CAST(s_suppkey AS VARCHAR) s_suppkey, CAST(s_name AS VARCHAR) s_name,
         CAST(s_nationkey AS VARCHAR) s_nationkey,
         ROW_NUMBER() OVER (ORDER BY s_suppkey) pos
  FROM srcb),
j AS (SELECT tgt.pos, tgt.s_suppkey tk, src.s_suppkey sk,
             tgt.s_name t_name, src.s_name s_name,
             tgt.s_nationkey t_nat, src.s_nationkey s_nat
      FROM tgt FULL OUTER JOIN src ON tgt.pos = src.pos)
SELECT 'del_row' AS change_type, tk AS slno, CAST(NULL AS VARCHAR) AS col,
       CAST(NULL AS VARCHAR) AS old_value, CAST(NULL AS VARCHAR) AS new_value
FROM j WHERE sk IS NULL
UNION ALL
SELECT 'extra_row', sk, NULL, NULL, NULL FROM j WHERE tk IS NULL
UNION ALL
SELECT 'diff', tk, 's_suppkey', tk, sk
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND tk IS DISTINCT FROM sk
UNION ALL
SELECT 'diff', tk, 's_name', t_name, s_name
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND t_name IS DISTINCT FROM s_name
UNION ALL
SELECT 'diff', tk, 's_nationkey', t_nat, s_nat
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND t_nat IS DISTINCT FROM s_nat
"""


def q_sync_apply_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8-A10 merge-apply: post-image of target after applying the keyed
    change set; must equal the mutated source (round-trip invariant)."""
    target = _customer_target(spark, sf_dir)
    source = _customer_source(spark, sf_dir)
    changes = diff_keyed(target, source, key="c_custkey")
    return apply_changes(target, changes, source=source, key="c_custkey")


_SYNC_APPLY_SQL = f"SELECT * FROM ({_CUSTOMER_SOURCE_SQL})"


def q_sync_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 truncate-and-load: the post-image IS the source (WRITE_TRUNCATE,
    syncquill.py:131-146); schema re-inferred from the source frame."""
    return _customer_source(spark, sf_dir)


def q_sync_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 validation probe as a relational query: rows violating the
    reference's constraints (missing key / any empty cell), run against
    a DELIBERATELY corrupted derived frame so the violation set is
    non-empty and hash-checked (the clean fixture would pass trivially
    — 0 rows proves nothing). Corruption: blank c_mktsegment where
    c_custkey % 101 == 7, NULL c_name where c_custkey % 137 == 11.
    first_empty_col mirrors get_empty_cell_name's first-offender scan
    (syncquill.py:54-58); the operator form raises
    (operators/validate.py)."""
    target = _customer_target(spark, sf_dir)
    corrupted = target.select(
        F.col("c_custkey"),
        F.when(F.col("c_custkey") % 137 == 11, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.col("c_nationkey"),
        F.when(F.col("c_custkey") % 101 == 7, F.lit(""))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    checks = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(c).isNull() | (F.col(c).cast("string") == ""), F.lit(c)
                ).otherwise(F.lit(None))
                for c in _CUST_COLS
            ]
        )
    )
    return (
        corrupted.select(
            F.col("c_custkey").cast("string").alias("slno"),
            F.get(checks, 0).alias("first_empty_col"),
        )
        .filter(F.col("first_empty_col").isNotNull())
    )


_SYNC_VALIDATE_SQL = """
WITH corrupted AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 137 = 11 THEN NULL ELSE c_name END AS c_name,
         c_nationkey,
         CASE WHEN c_custkey % 101 = 7 THEN '' ELSE c_mktsegment END AS c_mktsegment
  FROM customer
)
SELECT CAST(c_custkey AS VARCHAR) AS slno,
       CASE WHEN c_custkey IS NULL THEN 'c_custkey'
            WHEN c_name IS NULL OR c_name = '' THEN 'c_name'
            WHEN c_nationkey IS NULL THEN 'c_nationkey'
            WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 'c_mktsegment'
       END AS first_empty_col
FROM corrupted
WHERE c_custkey IS NULL OR c_name IS NULL OR c_name = '' OR c_nationkey IS NULL
   OR c_mktsegment IS NULL OR c_mktsegment = ''
"""


# ---------------------------------------------------------------------------
# Relational surface (Tier B): joins / aggs / windows / set ops / scalars.
# ---------------------------------------------------------------------------


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style grouped aggregation with exact decimal arithmetic.

    Scale: partial aggregation map-side, single shuffle on the (tiny)
    group key; decimal sums are exact => cross-engine stable.
    """
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal sums, surfaced as double: both engines cast
            # the same exact decimal => identical float64 bits => the
            # order-insensitive value hash matches regardless of how the
            # driver stringifies numerics.
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(38,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_AGG_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 5-way join. Dims (region/nation/supplier) are
    broadcast (AQE does it from size); facts shuffle once on join keys."""
    region, nation, customer, supplier, orders, lineitem = load_tables(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        .filter(F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(38,4)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_JOIN_REVENUE_BY_NATION_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY r_name, n_name
"""


def q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price (window + rank filter).
    Deterministic tie-break on o_orderkey; output is int-only."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


_WINDOW_TOPK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, rk FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders) t
WHERE rk <= 3
"""


def q_setop_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join / EXCEPT: customers that never placed an order."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    return (
        customer.select("c_custkey")
        .exceptAll(orders.select(F.col("o_custkey").alias("c_custkey")))
        .distinct()
    )


_SETOP_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT DISTINCT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface: string ops, date parts, CASE, arithmetic."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_u"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date_str"),
        F.when(F.col("o_totalprice") > 200000, F.lit("big"))
        .when(F.col("o_totalprice") > 50000, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("size_class"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
    )


_SCALAR_FUNCTIONS_SQL = """
SELECT o_orderkey,
       upper(o_orderstatus) AS status_u,
       substr(o_orderpriority, 1, 1) AS prio_code,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date_str,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS size_class,
       length(o_orderpriority) AS prio_len,
       o_orderstatus || '-' || o_orderpriority AS status_prio
FROM orders
"""


def q_json_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract a field from the JSON props column."""
    (events,) = load_tables(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").alias("k_str"),
    )


_JSON_EVENTS_EXTRACT_SQL = """
SELECT event_id, event_type, json_extract_string(props, '$.k') AS k_str
FROM events
"""


# ---------------------------------------------------------------------------
# EXT tier batch 1: exact dedup + text token stats.
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on documents.text: keep min doc_id per distinct text.

    Scale: group on sha2(text) (fixed 64-byte key) instead of the full
    text => smaller shuffle rows at 100 TB; output re-exposes counts.
    """
    (documents,) = load_tables(spark, sf_dir, "documents")
    return (
        documents.groupBy(F.sha2(F.col("text"), 256).alias("_h"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keeper_doc_id", "n_copies")
    )


_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals per document (int/string output)."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return documents.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("len_chars"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


_TEXT_TOKEN_STATS_SQL = """
SELECT doc_id, lang,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text) AS len_chars,
       len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_unique_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def q_subquery_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style correlated filter as a LEFT SEMI join (TPC-H Q4
    shape): count orders per priority having at least one deep-discount
    line item. Semi-join shuffles only the join key side — no
    duplicate-row blowup, no distinct afterwards."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    discounted = lineitem.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    return (
        orders.join(discounted, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_SUBQUERY_EXISTS_ORDERS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
"""


def q_agg_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping_id — all 2^2
    grouping sets in ONE pass (Spark expands to a single shuffle with
    replicated grouping keys; no per-set rescans)."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


_AGG_CUBE_SALES_SQL = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_agg_customer_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment balance stats. avg is decimal-sum / count surfaced
    as double (float summation order is partition-dependent; decimal
    accumulation is exact, so results are cluster-layout-independent —
    required for any check-summed pipeline at scale)."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    return customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min(dec).cast("double").alias("min_bal"),
        F.max(dec).cast("double").alias("max_bal"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_bal"),
    )


_AGG_CUSTOMER_BALANCE_STATS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
FROM customer
GROUP BY c_mktsegment
"""


def q_join_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation demo with UNCHANGED semantics: lineitem->orders
    equi-join through salted_join (hot order keys spread over 8
    sub-keys), then a salted two-phase aggregation per order status.
    The oracle is the plain join+group SQL — salting must not change a
    single row."""
    from syncquill_spark.operators.skew import salted_agg, salted_join

    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    joined = salted_join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders.select("o_orderkey", "o_orderstatus"),
        key="o_orderkey",
        salt_factor=8,
        salt_from=["o_orderkey", "l_linenumber"],
    )
    return salted_agg(
        joined,
        "o_orderstatus",
        {
            "n_items": (F.count(F.lit(1)), "count"),
            "sum_qty": (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")),
                "sum",
            ),
        },
        salt_factor=8,
        salt_from=["o_orderkey", "l_linenumber"],
    ).withColumn("sum_qty", F.col("sum_qty").cast("double"))


_JOIN_SALTED_REVENUE_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def q_agg_status_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the distinct order statuses seen per priority,
    as a SORTED set (collect_set is unordered by construction —
    array_sort makes the result deterministic, serialized to CSV so the
    comparison is engine-portable)."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_AGG_STATUS_SETS_SQL = """
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def q_agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority x status, statuses as columns.
    Values are pinned (pivot('o_orderstatus', [...])) so the plan is one
    pass — an unpinned pivot first runs a distinct scan to discover
    columns, a silent extra job at scale."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


_AGG_PIVOT_STATUS_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — (status, priority), (priority), () —
    the general form that ROLLUP/CUBE are shorthands for. One pass:
    Spark expands rows per set before the shuffle (same Expand node as
    rollup/cube), so cost is sets x input, not one job per set."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


_AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
"""


def q_agg_quantiles_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-rank quartiles + p95 of order value per status.

    Deliberately rank-based (row_number to position ceil(pct*n/100),
    integer math) rather than percentile()/quantile_cont(): picked
    values are actual data elements, so the result is bit-identical in
    any engine — interpolating quantile implementations differ in
    last-ulp float ops and would break cross-engine hash checks.
    Scale shape: one shuffle on the group key; the rank window sorts
    within each status partition only (no global order)."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    ranked = (
        orders.select("o_orderstatus", "o_totalprice", "o_orderkey")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )

    def at(pct: int):
        return F.max(
            F.when(
                F.col("rk") == F.expr(f"(n * {pct} + 99) div 100"),
                F.col("o_totalprice"),
            )
        )

    return ranked.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        at(25).alias("p25"),
        at(50).alias("p50"),
        at(75).alias("p75"),
        at(95).alias("p95"),
    )


_AGG_QUANTILES_STATUS_SQL = """
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       MAX(CASE WHEN rk = (n * 25 + 99) // 100 THEN o_totalprice END) AS p25,
       MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN o_totalprice END) AS p50,
       MAX(CASE WHEN rk = (n * 75 + 99) // 100 THEN o_totalprice END) AS p75,
       MAX(CASE WHEN rk = (n * 95 + 99) // 100 THEN o_totalprice END) AS p95
FROM ranked GROUP BY o_orderstatus
"""


def q_setop_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who ordered in both 1995 and 1996 (set
    semantics — Spark plans this as a distinct + semi-join-shaped
    aggregate, one shuffle per side on the key)."""
    (orders,) = load_tables(spark, sf_dir, "orders")

    def year_keys(y: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == y).select(
            F.col("o_custkey").alias("custkey")
        )

    return year_keys(1995).intersect(year_keys(1996))


_SETOP_REPEAT_CUSTOMERS_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def q_join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by order. Customer is
    the selective dim (1 segment of 5) — filtered before the join so
    the fact shuffle carries only matching keys; top-10 by revenue is
    a TakeOrdered, not a global sort. Revenue in exact decimal."""
    customer, orders, lineitem = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    cutoff = F.lit("1996-07-01").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(38,4)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_JOIN_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_shipdate > TIMESTAMP '1996-07-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_join_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned items per customer
    + nation, top-20. Nation broadcasts; the returnflag filter prunes
    the fact scan (pushed to parquet); deterministic tiebreak on
    custkey keeps the LIMIT stable across engines."""
    customer, orders, lineitem, nation = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(38,4)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_returned"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_JOIN_RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_returned
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_agg_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo-revenue share by ship month: lineitem
    joined to part, conditional decimal revenue split promo vs total.

    Scale: part is the small side => broadcast (no fact shuffle for the
    join); one partial-agg shuffle on the month key. The promo/total
    ratio is left to the consumer — emitting exact decimal numerator and
    denominator keeps the checked output engine-stable (decimal division
    scale rules differ across engines).
    """
    part, lineitem = load_tables(spark, sf_dir, "part", "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    rev = (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast(
        "decimal(38,4)"
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(38,4)")))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_AGG_PROMO_REVENUE_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                     AS DECIMAL(38,4))
                ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4))) AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ship_month
"""


def q_join_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style conditional counting over a fact-fact join:
    per line status, how many shipped lines belong to urgent/high-
    priority orders vs the rest, within one ship year.

    Scale: the shipdate filter is pushed to the parquet scan (row-group
    pruning on the sort-ish date column); the join shuffles both sides
    on orderkey once; counts partial-aggregate map-side.
    """
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


_JOIN_PRIORITY_LINES_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


def q_agg_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape: orders with at least one late-shipped line
    (l_shipdate > o_orderdate + 30 days), counted per priority. The
    EXISTS is a left-semi join — no row duplication, no distinct."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    late = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_AGG_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def q_agg_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shape: potential revenue from discount changes — a
    pure scan-filter-aggregate with every predicate pushed to parquet.
    Exact decimal product/sum => cross-engine stable single row."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(38,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_AGG_FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_agg_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape: distribution of customers by order count,
    including zero-order customers (left join, count of non-null).
    Two shuffles: per-customer count, then per-count histogram."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_AGG_CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) t
GROUP BY c_count
"""


_LARGE_ORDER_QTY = 140


def q_join_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape: customers with orders whose total line quantity
    exceeds a threshold. The HAVING subquery is a semi-join against a
    pre-aggregated (orderkey, qty) frame; quantities are integral
    doubles so the exact decimal sum is engine-stable at the
    threshold boundary."""
    customer, orders, lineitem = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    qty = lineitem.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q")
    )
    big = qty.filter(F.col("_q") >= _LARGE_ORDER_QTY).select(
        "l_orderkey", F.col("_q").cast("double").alias("total_qty")
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
    )


_JOIN_LARGE_ORDERS_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(q AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >= {_LARGE_ORDER_QTY}) t
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_setop_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shape: per synthetic country code, customers with
    above-average positive balance and no URGENT orders (every fixture
    customer has SOME order, so the classic no-orders form returns the
    empty set — the urgent-order restriction keeps the anti-join
    non-trivial). The average is a one-row broadcast (scalar
    subquery); exact-decimal average avoids double-sum order
    dependence at the comparison boundary."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


_SETOP_IDLE_RICH_SQL = """
SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey % 5
"""


_REV_DEC = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))"


def _revenue_col() -> "F.Column":
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).cast("decimal(38,4)")


def q_join_small_qty_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shape: revenue from lines whose quantity is below 20%
    of the part's average quantity, for one brand. The correlated
    aggregate subquery is a pre-aggregated (partkey, sum, cnt) frame
    joined back to the lines; the 0.2*avg comparison is the integer
    cross-multiplication 5*qty*cnt < sum — exact on every engine, no
    float average at the threshold."""
    part, lineitem = load_tables(spark, sf_dir, "part", "lineitem")
    brand_parts = part.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    lines = lineitem.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = lines.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sum"),
        F.count(F.lit(1)).alias("_cnt"),
    ).withColumnRenamed("l_partkey", "_pk")
    return (
        lines.join(per_part, F.col("l_partkey") == F.col("_pk"))
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("_cnt")
            < F.col("_sum")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


_JOIN_SMALL_QTY_PARTS_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s,
             COUNT(*) AS c
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#11'
      GROUP BY l_partkey) t ON pk = l_partkey
WHERE p_brand = 'Brand#11'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * c < s
"""


def q_join_lonely_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shape (reshaped onto this fixture's columns):
    suppliers with a RETURNED line on a multi-supplier order where no
    OTHER supplier's line on that order was returned — the classic
    EXISTS + NOT EXISTS pair, both as distinct-key semi/anti joins so
    no row ever duplicates."""
    supplier, lineitem = load_tables(spark, sf_dir, "supplier", "lineitem")
    sl = lineitem.select("l_orderkey", "l_suppkey").distinct()
    rl = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    other_sl = sl.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_rl = rl.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    exists_other = (F.col("l_orderkey") == F.col("_ok")) & (
        F.col("l_suppkey") != F.col("_sk")
    )
    return (
        rl.join(other_sl, exists_other, "left_semi")
        .join(other_rl, exists_other, "left_anti")
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_JOIN_LONELY_RETURNED_SQL = """
WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
rl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
       WHERE l_returnflag = 'R')
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM rl
JOIN supplier ON s_suppkey = rl.l_suppkey
WHERE EXISTS (SELECT 1 FROM sl
              WHERE sl.l_orderkey = rl.l_orderkey
                AND sl.l_suppkey <> rl.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM rl r2
                  WHERE r2.l_orderkey = rl.l_orderkey
                    AND r2.l_suppkey <> rl.l_suppkey)
GROUP BY s_suppkey, s_name
"""


def q_join_disjunctive_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape: revenue under an OR-of-ANDs predicate spanning
    both join sides (brand x size x quantity envelopes). Catalyst
    extracts the common l_partkey = p_partkey equi-condition, pushes
    the per-side conjuncts into the scans, and broadcasts the filtered
    part side."""
    part, lineitem = load_tables(spark, sf_dir, "part", "lineitem")
    cases = (
        ("Brand#11", 1, 15, 1, 11),
        ("Brand#12", 1, 25, 10, 20),
        ("Brand#13", 1, 35, 20, 30),
    )
    cond = None
    for brand, smin, smax, qmin, qmax in cases:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )
        cond = c if cond is None else (cond | c)
    return (
        lineitem.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .filter(cond)
        .agg(
            F.sum(_revenue_col()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_JOIN_DISJUNCTIVE_PROMO_SQL = f"""
SELECT CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_join_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shape: shipping revenue between two nations by
    direction and year. The 25-row nation dim joins twice under
    different aliases (supplier side / customer side) — both
    broadcast; the symmetric pair filter keeps both directions."""
    nation, customer, supplier, orders, lineitem = load_tables(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_n2k"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1k"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2k"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(_revenue_col()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_JOIN_NATION_TRADE_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q_window_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shape: supplier(s) with the maximum quarterly revenue.
    The scalar MAX is a one-row broadcast joined back; revenue stays
    decimal through the equality comparison so ties are exact, and
    only the final projection casts to double."""
    supplier, lineitem = load_tables(spark, sf_dir, "supplier", "lineitem")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue_col()).alias("_rev"))
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
    )


_WINDOW_TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_DEC}) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
"""


def q_join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shape: one nation's share of a region's delivered
    revenue per order year. nation joins twice (customer side pins the
    region, supplier side attributes the revenue) — both broadcast.
    Numerator and denominator are emitted as exact-decimal sums cast
    to double (no division: decimal division scale rules differ across
    engines; the consumer divides)."""
    region, nation, customer, supplier, orders, lineitem = load_tables(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    rev = _revenue_col()
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("n_name") == "NATION_5", rev)
                .otherwise(F.lit(0).cast("decimal(38,4)"))
            ).cast("double").alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_JOIN_MARKET_SHARE_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN {_REV_DEC}
                ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS nation_revenue,
       CAST(SUM({_REV_DEC}) AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY o_year
"""


def q_join_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shape: profit by supplier nation and order year for a
    part-name-filtered product line. The fixture has no partsupp
    table, so supply cost is proxied by p_retailprice * l_quantity
    (same join/rollup shape; documented deviation). All amounts are
    single-scale decimal(38,4) sums — profit is an exact decimal
    subtraction before the one double cast."""
    nation, supplier, part, orders, lineitem = load_tables(
        spark, sf_dir, "nation", "supplier", "part", "orders", "lineitem"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    rev = _revenue_col()
    cost = (dec("p_retailprice") * dec("l_quantity")).cast("decimal(38,4)")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").contains("widget"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(rev - cost).cast("double").alias("profit"),
            F.sum(rev).cast("double").alias("gross_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_JOIN_PRODUCT_PROFIT_SQL = f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV_DEC}
                - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
            AS DOUBLE) AS profit,
       CAST(SUM({_REV_DEC}) AS DOUBLE) AS gross_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""


# Derived partsupp: the fixtures carry no partsupp table, so the four
# TPC-H shapes that need one (Q2/Q11/Q16/Q20) derive an equivalent
# relation from lineitem — supply cost proxied by the MIN extended
# price ever charged for the (part, supplier) pair, availability by
# the total quantity moved. One groupBy on fixed-width int keys with
# map-side combine; exact decimal aggregates (min/sum are order-
# independent), so every downstream comparison is engine-stable.
_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _derived_partsupp(lineitem: DataFrame) -> DataFrame:
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(dec("l_extendedprice")).alias("ps_supplycost"),
        F.sum(dec("l_quantity")).alias("ps_availqty"),
    )


def q_join_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape: per part (of one size class, in one region),
    the minimum-cost supplier — the correlated-MIN-subquery shape,
    planned as a per-part window rank over the derived partsupp
    (row_number + rk=1 filters plan as WindowGroupLimit: partial
    top-1 below the exchange). Dims broadcast; ties break on
    ps_suppkey for a total order."""
    region, nation, supplier, part, lineitem = load_tables(
        spark, sf_dir, "region", "nation", "supplier", "part", "lineitem"
    )
    ps = _derived_partsupp(lineitem)
    w = Window.partitionBy("ps_partkey").orderBy(
        F.col("ps_supplycost").asc(), F.col("ps_suppkey").asc()
    )
    return (
        ps.join(supplier, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .join(
            F.broadcast(part.filter(F.col("p_size") == 5)),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("ps_supplycost").cast("double").alias("min_supplycost"),
        )
    )


_JOIN_MIN_COST_SUPPLIER_SQL = f"""
WITH ps AS ({_PS_SQL})
SELECT p_partkey, p_name, s_name, n_name,
       CAST(ps_supplycost AS DOUBLE) AS min_supplycost
FROM (
  SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ps.ps_supplycost,
         ROW_NUMBER() OVER (PARTITION BY ps.ps_partkey
                            ORDER BY ps.ps_supplycost ASC,
                                     ps.ps_suppkey ASC) AS rk
  FROM ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  JOIN part p     ON ps.ps_partkey = p.p_partkey
  WHERE r.r_name = 'EUROPE' AND p.p_size = 5) t
WHERE rk = 1
"""


def q_agg_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shape: parts whose stock value within one nation
    exceeds a fixed fraction of the nation's total stock value — the
    group-aggregate-vs-global-threshold shape. The global total is a
    one-row aggregate crossJoined (broadcast) back; both sides of the
    comparison are exact decimals, so the cut is engine-stable."""
    nation, supplier, lineitem = load_tables(
        spark, sf_dir, "nation", "supplier", "lineitem"
    )
    ps = _derived_partsupp(lineitem)
    value = (F.col("ps_supplycost") * F.col("ps_availqty")).cast("decimal(38,4)")
    scoped = (
        ps.join(supplier, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
    )
    from syncquill_spark.operators._cache import tracked_persist

    # per_part is consumed twice (the threshold aggregate AND the
    # filtered output) and its lineage is the full derived-partsupp
    # subtree over lineitem — unpersisted, the corpus-sized scan and
    # joins run once per consumer (r17; the r16 multi-consumer
    # doctrine). Skinny (partkey, decimal) rows, so the cache is
    # cheap at any scale.
    per_part = tracked_persist(
        scoped.groupBy("ps_partkey").agg(F.sum(value).alias("_v"))
    )
    total = per_part.agg(F.sum("_v").alias("_tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("_v")
            > (F.col("_tot") * F.lit(0.0001).cast("decimal(10,6)")).cast(
                "decimal(38,6)"
            )
        )
        .select("ps_partkey", F.col("_v").cast("double").alias("stock_value"))
    )


_AGG_IMPORTANT_STOCK_SQL = f"""
WITH ps AS ({_PS_SQL}),
scoped AS (
  SELECT ps_partkey,
         CAST(ps_supplycost * ps_availqty AS DECIMAL(38,4)) AS v
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
per_part AS (SELECT ps_partkey, SUM(v) AS v FROM scoped GROUP BY ps_partkey)
SELECT ps_partkey, CAST(v AS DOUBLE) AS stock_value
FROM per_part
WHERE v > CAST((SELECT SUM(v) FROM per_part)
               * CAST(0.0001 AS DECIMAL(10,6)) AS DECIMAL(38,6))
"""


def q_agg_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shape: distinct-supplier counts per (brand, type,
    size) with a NOT-IN supplier exclusion — the exclusion runs as a
    broadcast anti-join on the skinny excluded-key set; the distinct
    count shuffles (brand, type, size, suppkey) once, map-side
    deduped."""
    supplier, part, lineitem = load_tables(
        spark, sf_dir, "supplier", "part", "lineitem"
    )
    ps = _derived_partsupp(lineitem)
    excluded = supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("_ex")
    )
    return (
        ps.join(
            F.broadcast(part.filter(F.col("p_type") != "PROMO")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(excluded),
            F.col("ps_suppkey") == F.col("_ex"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


_AGG_SUPPLIER_PART_TYPES_SQL = f"""
WITH ps AS ({_PS_SQL})
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON ps_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_join_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shape: suppliers holding EXCESS stock of
    name-filtered parts — availability > 0.5 x the quantity they
    actually shipped in one year. EXISTS over an aggregated correlated
    subquery, planned as a semi-join against the per-(part, supplier)
    shipped aggregate; the 0.5 factor is an exact decimal so the
    comparison is engine-stable. (Unlike Q20 no single nation is
    pinned — the fixture's excess population is a handful of suppliers
    spread across nations, and a pin would make the query vacuous at
    small scale factors; n_name stays in the output.)"""
    nation, supplier, part, lineitem = load_tables(
        spark, sf_dir, "nation", "supplier", "part", "lineitem"
    )
    ps = _derived_partsupp(lineitem)
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("sh_partkey"),
            F.col("l_suppkey").alias("sh_suppkey"),
        )
        .agg(F.sum(dec("l_quantity")).alias("sh_qty"))
    )
    excess = (
        ps.join(
            F.broadcast(part.filter(F.col("p_name").contains("red"))),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("sh_partkey"))
            & (F.col("ps_suppkey") == F.col("sh_suppkey")),
        )
        .filter(
            F.col("ps_availqty").cast("decimal(38,4)")
            > (F.col("sh_qty") * F.lit(0.50).cast("decimal(10,2)")).cast(
                "decimal(38,4)"
            )
        )
        .select(F.col("ps_suppkey").alias("_k"))
        .distinct()
    )
    return (
        supplier.join(excess, F.col("s_suppkey") == F.col("_k"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


_JOIN_EXCESS_INVENTORY_SQL = f"""
WITH ps AS ({_PS_SQL}),
shipped AS (
  SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sh_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM ps
  JOIN part ON ps_partkey = p_partkey
  JOIN shipped ON ps_partkey = sh_partkey AND ps_suppkey = sh_suppkey
  WHERE p_name LIKE '%red%'
    AND CAST(ps_availqty AS DECIMAL(38,4))
        > CAST(sh_qty * CAST(0.50 AS DECIMAL(10,2)) AS DECIMAL(38,4))
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sync_diff_keyed": q_sync_diff_keyed,
    "sync_diff_positional": q_sync_diff_positional,
    "sync_apply_keyed": q_sync_apply_keyed,
    "sync_upsert": q_sync_upsert,
    "sync_validate": q_sync_validate,
    "agg_pricing_summary": q_agg_pricing_summary,
    "join_revenue_by_nation": q_join_revenue_by_nation,
    "window_topk_orders": q_window_topk_orders,
    "setop_customers_without_orders": q_setop_customers_without_orders,
    "scalar_functions": q_scalar_functions,
    "json_events_extract": q_json_events_extract,
    "dedup_exact": q_dedup_exact,
    "text_token_stats": q_text_token_stats,
    "subquery_exists_orders": q_subquery_exists_orders,
    "agg_cube_sales": q_agg_cube_sales,
    "agg_customer_balance_stats": q_agg_customer_balance_stats,
    "join_salted_revenue": q_join_salted_revenue,
    "agg_status_sets": q_agg_status_sets,
    "agg_pivot_status": q_agg_pivot_status,
    "agg_grouping_sets": q_agg_grouping_sets,
    "agg_quantiles_status": q_agg_quantiles_status,
    "setop_repeat_customers": q_setop_repeat_customers,
    "join_shipping_priority": q_join_shipping_priority,
    "join_returned_items": q_join_returned_items,
    "agg_promo_revenue": q_agg_promo_revenue,
    "join_priority_lines": q_join_priority_lines,
    "agg_order_priority": q_agg_order_priority,
    "agg_forecast_revenue": q_agg_forecast_revenue,
    "agg_customer_distribution": q_agg_customer_distribution,
    "join_large_orders": q_join_large_orders,
    "setop_idle_rich_customers": q_setop_idle_rich_customers,
    "join_small_qty_parts": q_join_small_qty_parts,
    "join_lonely_returned_supplier": q_join_lonely_returned_supplier,
    "join_disjunctive_promo": q_join_disjunctive_promo,
    "join_nation_trade": q_join_nation_trade,
    "window_top_supplier": q_window_top_supplier,
    "join_market_share": q_join_market_share,
    "join_product_profit": q_join_product_profit,
    "join_min_cost_supplier": q_join_min_cost_supplier,
    "agg_important_stock": q_agg_important_stock,
    "agg_supplier_part_types": q_agg_supplier_part_types,
    "join_excess_inventory": q_join_excess_inventory,
}

ORACLES: dict[str, str] = {
    "sync_diff_keyed": _SYNC_DIFF_KEYED_SQL,
    "sync_diff_positional": _SYNC_DIFF_POSITIONAL_SQL,
    "sync_apply_keyed": _SYNC_APPLY_SQL,
    "sync_upsert": _SYNC_APPLY_SQL,
    "sync_validate": _SYNC_VALIDATE_SQL,
    "agg_pricing_summary": _AGG_PRICING_SUMMARY_SQL,
    "join_revenue_by_nation": _JOIN_REVENUE_BY_NATION_SQL,
    "window_topk_orders": _WINDOW_TOPK_ORDERS_SQL,
    "setop_customers_without_orders": _SETOP_CUSTOMERS_WITHOUT_ORDERS_SQL,
    "scalar_functions": _SCALAR_FUNCTIONS_SQL,
    "json_events_extract": _JSON_EVENTS_EXTRACT_SQL,
    "dedup_exact": _DEDUP_EXACT_SQL,
    "text_token_stats": _TEXT_TOKEN_STATS_SQL,
    "subquery_exists_orders": _SUBQUERY_EXISTS_ORDERS_SQL,
    "agg_cube_sales": _AGG_CUBE_SALES_SQL,
    "agg_customer_balance_stats": _AGG_CUSTOMER_BALANCE_STATS_SQL,
    "join_salted_revenue": _JOIN_SALTED_REVENUE_SQL,
    "agg_status_sets": _AGG_STATUS_SETS_SQL,
    "agg_pivot_status": _AGG_PIVOT_STATUS_SQL,
    "agg_grouping_sets": _AGG_GROUPING_SETS_SQL,
    "agg_quantiles_status": _AGG_QUANTILES_STATUS_SQL,
    "setop_repeat_customers": _SETOP_REPEAT_CUSTOMERS_SQL,
    "join_shipping_priority": _JOIN_SHIPPING_PRIORITY_SQL,
    "join_returned_items": _JOIN_RETURNED_ITEMS_SQL,
    "agg_promo_revenue": _AGG_PROMO_REVENUE_SQL,
    "join_priority_lines": _JOIN_PRIORITY_LINES_SQL,
    "agg_order_priority": _AGG_ORDER_PRIORITY_SQL,
    "agg_forecast_revenue": _AGG_FORECAST_REVENUE_SQL,
    "agg_customer_distribution": _AGG_CUSTOMER_DISTRIBUTION_SQL,
    "join_large_orders": _JOIN_LARGE_ORDERS_SQL,
    "setop_idle_rich_customers": _SETOP_IDLE_RICH_SQL,
    "join_small_qty_parts": _JOIN_SMALL_QTY_PARTS_SQL,
    "join_lonely_returned_supplier": _JOIN_LONELY_RETURNED_SQL,
    "join_disjunctive_promo": _JOIN_DISJUNCTIVE_PROMO_SQL,
    "join_nation_trade": _JOIN_NATION_TRADE_SQL,
    "window_top_supplier": _WINDOW_TOP_SUPPLIER_SQL,
    "join_market_share": _JOIN_MARKET_SHARE_SQL,
    "join_product_profit": _JOIN_PRODUCT_PROFIT_SQL,
    "join_min_cost_supplier": _JOIN_MIN_COST_SUPPLIER_SQL,
    "agg_important_stock": _AGG_IMPORTANT_STOCK_SQL,
    "agg_supplier_part_types": _AGG_SUPPLIER_PART_TYPES_SQL,
    "join_excess_inventory": _JOIN_EXCESS_INVENTORY_SQL,
}
