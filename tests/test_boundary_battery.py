"""The boundary battery as a standing suite gate (r13 verdict item #4).

The battery found five job-aborting defects in r13 (minhash ANSI-0/0,
zip_with k-depth, vector-kernel NULL/ragged/NaN, NaN-tops-top-k,
truncated-media) while living as a hand-run tool; from r14 every
committed case is one pytest node, so a regression in any guard fails
`pytest tests/` directly. The case list itself lives in
tools/boundary_battery.py (`case_specs`), shared with the CLI
exploration harness.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.boundary_battery import Ctx, case_specs, run_case  # noqa: E402

_SPECS = case_specs()


def test_battery_is_at_least_50_cases():
    assert len(_SPECS) >= 50, (
        f"battery shrank to {len(_SPECS)} cases — the r13 verdict set "
        "a >=50 floor; extend, don't trim"
    )
    names = [n for n, _, _ in _SPECS]
    assert len(set(names)) == len(names), "duplicate case names"


@pytest.fixture(scope="module")
def battery_ctx(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_BATTERY_SF", "/root/testdata/sf0.001")
    return Ctx(spark, sf_dir)


@pytest.mark.parametrize(
    "name,expect_error,fn",
    _SPECS,
    ids=[name for name, _, _ in _SPECS],
)
def test_boundary_case(battery_ctx, name, expect_error, fn):
    ok, detail = run_case(battery_ctx, name, expect_error, fn)
    assert ok, f"{name}: {detail}"
