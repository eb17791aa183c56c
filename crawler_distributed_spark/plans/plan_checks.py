"""Structural checks over ``explain("formatted")`` output.

Used by the plan audit (scripts/explain_audit.py) and plan-shape pytests
to assert properties that matter at 100 TB but are invisible to
row-equality tests — e.g. that the 10^10-row seen side of the admission
anti-join scans its bucketed layout in place instead of re-shuffling
every batch (VERDICT r3 What's-wrong #1).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _indent_of(line: str) -> int:
    """Tree depth of a node line ("   :  +- Sort (7)" → column where the
    node name starts)."""
    i = 0
    while i < len(line) and line[i] in " :+-*":
        i += 1
    return i


def no_exchange_above(plan: str, needle: str) -> bool:
    """True iff the plan-tree node matching ``needle`` has NO Exchange
    (shuffle or broadcast) among its ancestors — i.e. that subtree's
    output flows into its parent join/agg without being moved. Walks the
    indentation tree of the formatted explain header."""
    tree = plan.split("\n\n")[0]
    lines = [ln for ln in tree.splitlines() if ln.strip() and "==" not in ln]
    for idx, line in enumerate(lines):
        if needle in line:
            ind = _indent_of(line)
            for up in range(idx - 1, -1, -1):
                ui = _indent_of(lines[up])
                if ui < ind:
                    name = lines[up].strip().lstrip("+-:* ")
                    if name.startswith(("Exchange", "BroadcastExchange")):
                        return False
                    ind = ui
            return True
    return False  # needle not found at all = not verified
