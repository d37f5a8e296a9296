"""Formatted change-report sink (reference operator A12).

Reproduces the reference's ASCII report (syncquill.py:164-215):

- cell diffs render as paired Old/New rows showing only the changed
  column, separated by blank spacer rows (191-195), with the trailing
  spacer removed (210-211);
- extra_row / del_row render as their own "Added new rows" /
  "Deleted rows" tables (196-207);
- column widths are computed per column over all rendered rows (170).

This is a terminal sink: the change set is expected to be small (it is
proportional to *changes*, not table size), so a driver-side collect of
the change set — never of the tables — is appropriate even at 100 TB.
A ``limit`` guard caps pathological change sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _format_table(rows: list[list[str]]) -> list[str]:
    """ASCII box table; mirrors print_table at syncquill.py:165-186."""
    if not rows:
        return []
    widths = [max(len(str(item)) for item in col) for col in zip(*rows)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "| " + " | ".join(f"{c:<{widths[i]}}" for i, c in enumerate(rows[0])) + " |", sep]
    for row in rows[1:]:
        out.append("| " + " | ".join(f"{c:<{widths[i]}}" for i, c in enumerate(row)) + " |")
    out.append(sep)
    return out


def format_change_report(
    changes: DataFrame,
    cols: list[str],
    rows_by_key: dict[str, list[str]] | None = None,
    limit: int = 10_000,
) -> str:
    """Render a change-set DataFrame as the reference's ASCII report.

    ``rows_by_key`` optionally maps key -> full row values for
    extra_row/del_row payload display (the reference prints whole rows
    for those, syncquill.py:199-206); when absent, only the key is
    shown for row-level changes.

    The change set's key column is always named ``slno``
    (CHANGE_SET_SCHEMA) no matter what the caller's key column is
    called, so change rows are read via ``r["slno"]`` here.
    """
    collected = changes.limit(limit).collect()
    diffs = [r for r in collected if r["change_type"] == "diff"]
    extras = [r for r in collected if r["change_type"] == "extra_row"]
    dels = [r for r in collected if r["change_type"] == "del_row"]

    def full_row(k: str) -> list[str]:
        if rows_by_key and k in rows_by_key:
            return [str(v) for v in rows_by_key[k]]
        return [k] + [""] * (len(cols) - 1)

    lines: list[str] = []
    if extras:
        lines.append("")
        lines.append("Added new rows:")
        lines.extend(_format_table([["Status"] + cols] + [["New"] + full_row(r["slno"]) for r in extras]))
    if dels:
        lines.append("")
        lines.append("Deleted rows:")
        lines.extend(_format_table([["Status"] + cols] + [["Old"] + full_row(r["slno"]) for r in dels]))

    if diffs:
        all_changes: list[list[str]] = [["Status"] + cols]
        for r in diffs:
            old_row = ["Old", r["slno"]] + [
                (r["old_value"] if cols[i] == r["col"] else "") for i in range(1, len(cols))
            ]
            new_row = ["New", r["slno"]] + [
                (r["new_value"] if cols[i] == r["col"] else "") for i in range(1, len(cols))
            ]
            all_changes.append(old_row)
            all_changes.append(new_row)
            all_changes.append([""] * (len(cols) + 1))
        if all_changes[-1] == [""] * (len(cols) + 1):
            all_changes.pop()
        lines.append("")
        lines.append("Row changes:")
        lines.extend(_format_table(all_changes))

    return "\n".join(lines)
