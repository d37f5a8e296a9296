"""Window-policy invariants, pinned in-suite (no Spark session).

The round driver verifies the FIRST 50 registry entries; the repo's
standing policy (plans/__init__.py) adds the staleness rule: no
registered query may go more than 2 rounds without a driver-green
row. These invariants were previously checked by ad-hoc scripts each
round; a rotation mistake (51 names, a touched row left outside, a
stale row not rotated in) silently costs a round. Pin them here so
`pytest -q` fails the moment the window drifts.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from syncquill_spark.plans import ORACLES, QUERIES

    return QUERIES, ORACLES


def _priority():
    import syncquill_spark.plans as p

    return p._PRIORITY


def test_registry_is_frozen_at_142():
    queries, oracles = _registry()
    assert len(queries) == 142, (
        "registry size changed from the declared end state; growth is "
        "frozen — a new entry must SWAP against a retirement (net 0), "
        "recorded in plans/__init__.py"
    )
    assert set(queries) == set(oracles)
    # zero rows-only oracles: every registered query is hash-checked
    assert all(sql is not None for sql in oracles.values())


def test_window_is_exactly_50_and_leads_the_registry():
    queries, _ = _registry()
    pri = _priority()
    assert len(pri) == 50, "_PRIORITY must be EXACTLY 50 names"
    assert len(set(pri)) == 50, "_PRIORITY contains a duplicate"
    unknown = [n for n in pri if n not in queries]
    assert not unknown, f"_PRIORITY names not in the registry: {unknown}"
    assert list(queries)[:50] == pri, (
        "registry iteration order must put the window first — the "
        "driver verifies the first 50 entries in dict order"
    )


def test_staleness_invariant_over_correctness_artifacts():
    """Every registered query either has a green row in one of the
    last THREE driver CORRECTNESS artifacts or sits in the current
    window (where this round's driver run will green it) — i.e., no
    row is ever more than 2 rounds stale. Three files, not two: at
    round start (before the rotation commit) the staleness-2 cohort
    legitimately has no green in the last two artifacts and no slot
    in the PREVIOUS round's still-committed window — that is the
    state the rotation exists to fix, not a breach; the companion
    test below forces those rows to be NAMED as the next window's
    mandatory leads."""
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if len(files) < 2:  # fresh clone without artifacts: nothing to pin
        return
    green: set[str] = set()
    for path in files[-3:]:
        data = json.load(open(path))
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            ):
                green.add(name)
    queries, _ = _registry()
    window = set(_priority())
    stranded = sorted(set(queries) - green - window)
    assert not stranded, (
        "rows with no driver-green in the last 2 rounds AND no slot "
        f"in the current window (staleness break next round): {stranded}"
    )


def test_permanent_queue_disjoint_from_registry():
    from syncquill_spark.plans.queue_permanent import QUEUE_QUERIES

    queries, _ = _registry()
    overlap = sorted(set(QUEUE_QUERIES) & set(queries))
    assert not overlap, f"queued pairs already registered: {overlap}"


def test_window_comment_names_next_rounds_mandatory_leads():
    """The leave-out comment in plans/__init__.py must name every row
    that the staleness rule makes mandatory NEXT round, so the next
    session cannot miss one. Derived the same way the judge checks:
    green in round N-1 artifacts but absent from both the current
    window and round N's artifacts."""
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if len(files) < 2:
        return

    def greens(path):
        data = json.load(open(path))
        return {
            n
            for n, row in data.items()
            if row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match") in (True, None)
            and not row.get("err")
        }

    prev2, prev1 = greens(files[-2]), greens(files[-1])
    queries, _ = _registry()
    window = set(_priority())
    # after THIS round's driver run, staleness-2 rows will be the ones
    # last green two artifacts ago and not re-verified since
    next_mandatory = sorted(
        (set(queries) & prev2) - prev1 - window
    )
    src = open(
        os.path.join(REPO, "syncquill_spark", "plans", "__init__.py")
    ).read()
    # Scope the name scan to the CURRENT round's leave-out block
    # (ADVICE r11: matched against the whole file, a lead omitted from
    # the current comment still passed whenever its name appeared in
    # any HISTORICAL window comment or in _PRIORITY itself — which is
    # almost always — making the check near-vacuous). ADVICE r12:
    # don't rely on blocks staying reverse-chronological — anchor to
    # the HIGHEST "Round-N window" heading, then take the first
    # "Left outside ..." block after it.
    headings = [
        (int(n), m.end())
        for n, m in (
            (m.group(1), m)
            for m in re.finditer(r"Round-(\d+) window", src)
        )
    ]
    assert headings, "no 'Round-N window' heading found"
    _, start = max(headings)
    m = re.search(
        r"Left outside at staleness 2.*?capacity check",
        src[start:],
        re.DOTALL,
    )
    assert m, (
        "current round's leave-out comment block not found after the "
        "highest 'Round-N window' heading"
    )
    comment_names = set(re.findall(r"[a-z0-9_]+", m.group(0)))
    missing = [n for n in next_mandatory if n not in comment_names]
    assert not missing, (
        "ROTATION PENDING — this failure is the designed r(N+1) "
        "first-commit trigger, not a code regression: the driver's "
        "newest CORRECTNESS artifact has landed and the staleness rule "
        "now makes these rows mandatory next-window leads, but the "
        "current leave-out comment block doesn't name them. Fix: "
        "rotate _PRIORITY in syncquill_spark/plans/__init__.py (the "
        "staleness-2 cohort first, then 8 fill) and write the new "
        f"round's window comment naming: {missing}"
    )
