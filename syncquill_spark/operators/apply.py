"""Change-set apply: UPDATE + INSERT + DELETE as ONE atomic write
(reference operators A8/A9/A10, rebuilt without the N+1 problem).

The reference applies each change as its own BigQuery job — one UPDATE
per changed cell (syncquill.py:80-89), one batch load per insert group
(90-99), one DELETE per deleted row (101-107) — sequentially, with
errors swallowed, so a mid-run failure leaves the target half-synced.

Spark-native design: compute the complete POST-IMAGE DataFrame with
joins, then let the caller write it atomically (overwrite /
MERGE-capable sink). Semantics preserved from the reference:

- updates write the string-cast new value, coerced to the target
  column's type (BigQuery coerces the quoted literal the same way,
  syncquill.py:83);
- inserts append source rows coerced to the target schema (BigQuery
  load-from-JSON coercion, syncquill.py:91-95);
- deletes remove by key (syncquill.py:103).

Scale: two key-partitioned joins (changes are usually tiny => AQE turns
both into broadcasts) + one union. No per-change round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    source: DataFrame | None = None,
    key: str = "slno",
) -> DataFrame:
    """Return the post-image of ``target`` after applying ``changes``.

    ``changes`` must have the CHANGE_SET_SCHEMA from
    :mod:`syncquill_spark.operators.diff`. ``source`` supplies full-row
    payloads for ``extra_row`` inserts (only required when the change
    set contains inserts) — the change set itself carries only keys for
    row-level changes, exactly like the reference's row dicts carry the
    raw sheet rows.
    """
    target_types = dict(target.dtypes)

    # --- deletes: anti-join on key (A10) ---------------------------------
    del_keys = changes.filter(F.col("change_type") == "del_row").select(
        F.col("slno").alias("__k")
    )
    kept = target.join(
        del_keys.hint("broadcast"),
        target[key].cast("string") == F.col("__k"),
        "left_anti",
    )

    # --- updates: pivot cell diffs to one row per key, coalesce (A8) -----
    cell = changes.filter(F.col("change_type") == "diff")
    upd = (
        cell.groupBy(F.col("slno").alias("__k"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("col"), F.col("new_value")))
            ).alias("__updates")
        )
    )
    updated = (
        kept.join(
            upd.hint("broadcast"),
            kept[key].cast("string") == upd["__k"],
            "left",
        )
        .select(
            *[
                F.coalesce(
                    F.element_at(F.col("__updates"), F.lit(c)).cast(target_types[c]),
                    F.col(c),
                ).alias(c)
                for c in target.columns
            ]
        )
    )

    # --- inserts: source rows for extra_row keys, cast to target (A9) ----
    if source is not None:
        ins_keys = changes.filter(F.col("change_type") == "extra_row").select(
            F.col("slno").alias("__k")
        )
        inserts = (
            source.join(
                ins_keys.hint("broadcast"),
                source[key].cast("string") == F.col("__k"),
                "left_semi",
            )
            .select(
                *[
                    F.col(c).cast(target_types[c]).alias(c)
                    for c in target.columns
                ]
            )
        )
        updated = updated.unionByName(inserts)

    return updated
