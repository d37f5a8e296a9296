"""Skew-mitigation operators: salted join and two-phase aggregation.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) is the first
line of defense and is on by default in this engine's session. These
operators are the explicit form for cases AQE can't fix: a single
join/grouping key so hot that one task gets most of the data (the
classic 100 TB failure mode — one straggler task holds the stage).

Semantics are EXACTLY those of the plain join / groupBy; salt only
changes data routing. Salt is derived from xxhash64 over deterministic
columns, so runs are reproducible (no rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over salt_factor
    sub-keys.

    big rows get salt = pmod(xxhash64(salt_from...), salt_factor);
    small rows are replicated once per salt value (explode of a
    salt_factor-element sequence — bounded, explicit replication cost).
    The join key becomes (key, salt): a key that previously hashed to
    ONE reducer now spreads over salt_factor reducers. Result set is
    identical to big.join(small, key, how).

    salt_from defaults to all big-side columns — deterministic and
    uniform; pass a cheaper unique-ish column list when available.

    Only big-side-preserving join types are allowed: with the small
    side replicated per salt, right/full outer would emit unmatched
    small rows salt_factor times. salt_factor must be >= 1.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r}"
        )
    # guard driver-side (r15 battery): salt_factor = 0 dies mid-job
    # with ANSI REMAINDER_BY_ZERO; a NEGATIVE factor only joins
    # correctly because sequence(0, n-1) happens to auto-step downward
    # past the pmod values — accepted nonsense, not a contract
    if salt_factor < 1:
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")
    cols = salt_from if salt_from is not None else big.columns
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_factor))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<long>"))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


_MERGES = {
    "count": F.sum,  # partial counts add up
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, str]],
    salt_factor: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for a skewed grouping key.

    Phase 1 groups by (key, salt) — the hot key's rows combine in
    salt_factor parallel partial groups; phase 2 merges partials by
    key. `aggs` maps output name -> (phase-1 expression, merge kind),
    merge kind one of 'count' | 'sum' | 'min' | 'max' (decomposable
    aggregates; count merges by summing partial counts):

        salted_agg(events, "event_type",
                   {"n": (F.count(F.lit(1)), "count"),
                    "total": (F.sum("value"), "sum")})

    Note: Spark's hash aggregation already does map-side partial
    combine, which usually de-skews simple aggs on its own; explicit
    salting matters when merge-side state per key is still huge
    (e.g. collect_set-style), or under sort-based fallback.
    """
    if salt_factor < 1:  # same guard as salted_join (r15 battery)
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")
    cols = salt_from if salt_from is not None else df.columns
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_factor))
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (expr, _kind) in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[
            _MERGES[kind](F.col(f"_p_{name}")).alias(name)
            for name, (_expr, kind) in aggs.items()
        ]
    )
