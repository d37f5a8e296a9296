"""Z-order clustering key tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from syncquill_spark.functions.zorder import zorder_key


def _morton(u: int, v: int, bits: int) -> int:
    key = 0
    for i in range(bits):
        key |= ((u >> i) & 1) << (2 * i)
        key |= ((v >> i) & 1) << (2 * i + 1)
    return key


def test_zorder_matches_reference_bit_interleave(spark):
    rows = [(u, v) for u in (0, 1, 5, 255, 1023) for v in (0, 3, 64, 1023)]
    df = spark.createDataFrame(rows, "u long, v long")
    got = {
        (r.u, r.v): r.z
        for r in df.select("u", "v", zorder_key(["u", "v"], bits=10).alias("z")).collect()
    }
    for (u, v), z in got.items():
        assert z == _morton(u, v, 10), (u, v)


def test_zorder_out_of_range_bits_are_masked(spark):
    df = spark.createDataFrame([(1024 + 5, 2048 + 3)], "u long, v long")
    (r,) = df.select(zorder_key(["u", "v"], bits=10).alias("z")).collect()
    assert r.z == _morton(5, 3, 10)  # high bits beyond `bits` ignored


def test_zorder_sort_bounds_both_dimensions(spark):
    """The layout claim: chunking a z-sorted table bounds the min/max
    spread of BOTH dimensions per chunk; a one-dimension sort leaves
    the other dimension's spread at full range."""
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(4096)]
    df = spark.createDataFrame(rows, "u long, v long")
    zsorted = (
        df.select("u", "v", zorder_key(["u", "v"], bits=10).alias("z"))
        .orderBy("z")
        .collect()
    )
    usorted = sorted(rows)
    n_chunks = 16
    size = len(rows) // n_chunks

    def spread(data, dim):
        tot = 0
        for i in range(n_chunks):
            chunk = data[i * size : (i + 1) * size]
            vals = [r[dim] for r in chunk]
            tot += max(vals) - min(vals)
        return tot / n_chunks

    z_u, z_v = spread(zsorted, 0), spread(zsorted, 1)
    u_u, u_v = spread(usorted, 0), spread(usorted, 1)
    assert u_u < z_u          # single-dim sort wins on its own dimension
    assert u_v > 2 * z_v      # ...but leaves v at ~full range; z bounds it
    assert z_u < 600 and z_v < 600  # both dimensions bounded under z-order


def test_zorder_sql_twin_refuses_identically():
    """The SQL oracle twin must refuse exactly the parameters the
    Python form refuses (ADVICE r15: bits=0 emitted the invalid SQL
    '()' and an over-wide key silently diverged from zorder_key's
    raise)."""
    import pytest

    from syncquill_spark.functions.zorder import zorder_key_sql

    with pytest.raises(ValueError, match="at least one"):
        zorder_key_sql([])
    with pytest.raises(ValueError, match="bits"):
        zorder_key_sql(["a"], bits=0)
    with pytest.raises(ValueError, match="63 bits"):
        zorder_key_sql(["a", "b"], bits=32)
    # valid params still emit well-formed SQL
    assert zorder_key_sql(["a"], bits=2).startswith("(")
