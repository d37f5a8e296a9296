"""Apply/merge tests: the round-trip invariant from SURVEY.md §5.5 —
``apply(target, diff(target, source), source)`` string-normalizes to
``source`` for keyed mode with unique keys."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from syncquill_spark.operators import apply_changes, diff_keyed, normalize_strings

TGT_SCHEMA = "slno long, name string, amount double"
SRC_SCHEMA = "slno string, name string, amount string"


def as_set(df):
    return set(map(tuple, normalize_strings(df).collect()))


def test_apply_roundtrip_basic(spark):
    tgt = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.0), (3, "c", 3.0)], TGT_SCHEMA
    )
    src = spark.createDataFrame(
        [("1", "a", "9.9"), ("2", "bb", "2.0"), ("4", "d", "4.0")], SRC_SCHEMA
    )
    post = apply_changes(tgt, diff_keyed(tgt, src), source=src)
    assert as_set(post) == as_set(src)
    assert dict(post.dtypes) == dict(tgt.dtypes)  # target schema preserved


def test_apply_empty_changeset_is_identity(spark):
    tgt = spark.createDataFrame([(1, "a", 1.5)], TGT_SCHEMA)
    src = spark.createDataFrame([("1", "a", "1.5")], SRC_SCHEMA)
    post = apply_changes(tgt, diff_keyed(tgt, src), source=src)
    assert as_set(post) == as_set(tgt)


@settings(max_examples=10, deadline=None)
@given(
    tgt_rows=st.lists(
        st.tuples(
            st.integers(1, 20),
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            st.integers(0, 99),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    src_rows=st.lists(
        st.tuples(
            st.integers(1, 20),
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            st.integers(0, 99),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
)
def test_apply_roundtrip_property(spark, tgt_rows, src_rows):
    tgt = spark.createDataFrame(
        [(k, n, float(a)) for k, n, a in tgt_rows], TGT_SCHEMA
    )
    src = spark.createDataFrame(
        [(str(k), n, str(float(a))) for k, n, a in src_rows], SRC_SCHEMA
    )
    changes = diff_keyed(tgt, src)
    post = apply_changes(tgt, changes, source=src)
    assert as_set(post) == as_set(src)
