"""Deterministic synthetic name catalog for fuzzy-linkage probes/tests.

Round-9 verdict #7: every fixture name column the repo already has is
degenerate for ``fuzzy_name_pairs`` — either all-distinct tokens (no
blocking pressure, every block is a singleton) or so few distinct
names that the pair output itself is quadratic in the catalog. Real
entity-resolution catalogs sit between: Zipf-skewed token frequencies
(a few hub surnames, a long tail) plus a small planted fraction of
true near-duplicates (typos).

Shape here: ``name = "<first> <last>"``; first drawn from a 160-token
pool, last from a 420-token pool, both with p(rank) ~ rank^-1/2 (a
u^2 skew on a uniform hash — Zipf-ish: the top surname covers a few
percent of rows, the tail fractions of a percent). Every
``typo_every``-th id also emits a TWIN record (id + TWIN_OFFSET)
whose LAST token carries exactly one character edit (substitution /
deletion / insertion / adjacent transposition, chosen by hash) — the
FIRST token stays verbatim, so every planted pair shares a blocking
token and the blocker's stated recall contract covers all of them
(sub/del/ins = Levenshtein 1; transposition = 2).

Everything is a pure function of (id, seed): executor-side generation
via mapInPandas, no RNG state, reproducible across engines. Pool
tokens are syllable concatenations (4-12 chars) so Levenshtein costs
behave like real names, not like random hex.
"""

from __future__ import annotations

import hashlib

# far above any replica id band (the scale probe shifts replicas by
# 10M and probes to m=8; 50M would collide with replica 5's base ids)
TWIN_OFFSET = 1_000_000_000

_SYL = (
    "an ar ba bel ca dor el fin ga har in jo ka lor ma mir na or pa "
    "qui ra sa ta ur va wen xi yo zan the ri son man berg ton ley "
    "ski ova ez ito"
).split()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest(), 16)


def _pool(n: int, salt: str) -> list[str]:
    """n pronounceable tokens; duplicates allowed (they just merge
    frequency mass between two ranks — harmless for a fixture)."""
    out = []
    for i in range(n):
        h = _h(f"{salt}:{i}")
        toks = [_SYL[(h >> (8 * j + 4)) % len(_SYL)] for j in range(2 + h % 3)]
        out.append("".join(toks))
    return out


_FIRST = _pool(160, "first")
_LAST = _pool(420, "last")


def _skewed(pool: list[str], h: int) -> str:
    """p(rank) ~ rank^-1/2 via the u^2 transform of a uniform hash."""
    u = (h % 1_000_003) / 1_000_003.0
    return pool[int(len(pool) * u * u)]


def _typo(word: str, h: int) -> str:
    """One deterministic character edit; Levenshtein distance 1
    (sub/del/ins) or 2 (adjacent transposition)."""
    p = h % len(word)
    op = (h >> 13) % 4
    c = chr(ord("a") + (h >> 21) % 26)
    if op == 0:  # substitute (force a real change)
        c = c if c != word[p] else chr(ord("a") + (ord(c) - ord("a") + 1) % 26)
        return word[:p] + c + word[p + 1:]
    if op == 1 and len(word) > 3:  # delete
        return word[:p] + word[p + 1:]
    if op == 2:  # insert
        return word[:p] + c + word[p:]
    if p + 1 < len(word) and word[p] != word[p + 1]:  # transpose
        return word[:p] + word[p + 1] + word[p] + word[p + 2:]
    return word[:p] + c + word[p:]  # fallback: insert


def name_for(doc_id: int, seed: int = 0, tag: str = "") -> str:
    """The catalog row for a BASE id (twin ids get typo_name_for)."""
    h1 = _h(f"nc:{seed}:f:{doc_id}")
    h2 = _h(f"nc:{seed}:l:{doc_id}")
    first, last = _skewed(_FIRST, h1), _skewed(_LAST, h2)
    if tag:
        first, last = first + tag, last + tag
    return f"{first} {last}"


def typo_name_for(doc_id: int, seed: int = 0, tag: str = "") -> str:
    """The twin's name: base name with ONE edit in the last token."""
    base = name_for(doc_id, seed, tag)
    first, last = base.split(" ", 1)
    return f"{first} {_typo(last, _h(f'nc:{seed}:t:{doc_id}'))}"


def catalog_rows(
    n: int, typo_every: int = 7, seed: int = 0, tag: str = ""
) -> list[tuple[int, str]]:
    """Driver-side reference generation (tests): n base rows plus one
    twin per typo_every-th id, ids offset by TWIN_OFFSET."""
    rows = [(i, name_for(i, seed, tag)) for i in range(n)]
    rows += [
        (i + TWIN_OFFSET, typo_name_for(i, seed, tag))
        for i in range(0, n, typo_every)
    ]
    return rows


def synth_name_catalog(ids_df, typo_every: int = 7, seed: int = 0):
    """Executor-side generation over an (doc_id) frame — the probe
    path. Replica tag is derived from the id's replica band (the
    scale probe shifts replicas by 10M), so cross-replica names share
    no tokens while within-replica structure is identical."""
    import pandas as pd

    id_offset = 10_000_000

    def gen(batches):
        for pdf in batches:
            ids, names = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                r = did // id_offset
                tag = f"x{r}" if r else ""
                base = did % id_offset
                ids.append(did)
                names.append(name_for(base, seed, tag))
                if base % typo_every == 0:
                    ids.append(did + TWIN_OFFSET)
                    names.append(typo_name_for(base, seed, tag))
            yield pd.DataFrame({"doc_id": ids, "name": names})

    return ids_df.select("doc_id").mapInPandas(gen, "doc_id long, name string")
