"""Propose the next round's driver verification window.

The driver oracle-verifies the FIRST 50 queries() entries
(`_R{N}_WINDOW` in __spark_entry__.py, pinned by
tests/test_queries_oracle.py::test_driver_window_invariants). Each
round the window rotates by hand; this tool computes the rotation the
round playbook prescribes so the ritual is mechanical:

  1. every gate id with NO green driver CORRECTNESS row in any round
     (new ops, or ids whose only rows errored) — fronted first;
  2. the flagship repeats (§2 view/merge ids — re-signed every round);
  3. least-recently-driver-green rotation to fill 50.

Usage: python tools/gen_window.py  → prints the window as a Python
list literal to paste over `_R{N}_WINDOW`, plus a coverage summary.
Read-only; does not edit __spark_entry__.py.
"""

from __future__ import annotations

import ast
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
FLAGSHIPS = [
    "view_retention",
    "view_transactions",
    "view_auto_optiom",
    "merge_time_window",
]
WINDOW_SIZE = 50


def gate_ids() -> list[str]:
    """queries() keys in declaration order, via AST (no Spark)."""
    tree = ast.parse((REPO / "__spark_entry__.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            keys: list[str] = []
            for n in ast.walk(node):
                if isinstance(n, ast.Dict):
                    for k in n.keys:
                        if isinstance(k, ast.Constant) and isinstance(k.value, str):
                            keys.append(k.value)
            return keys
    raise SystemExit("queries() not found")


def driver_history() -> dict[str, int]:
    """gate id -> last round with a GREEN driver row (err-free and
    hash-matched, or rows-matched for the rare no-oracle era rows)."""
    last: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        for gate, row in json.loads(f.read_text()).items():
            green = row.get("err") is None and row.get(
                "hash_match", row.get("rows_match")
            )
            if green:
                last[gate] = max(last.get(gate, 0), n)
    return last


def propose() -> tuple[list[str], dict[str, int]]:
    ids = gate_ids()
    last = driver_history()
    never = [g for g in ids if g not in last]
    rotation = sorted(
        (g for g in ids if g in last and g not in FLAGSHIPS),
        key=lambda g: (last[g], g),
    )
    window = never + [f for f in FLAGSHIPS if f not in never]
    for g in rotation:
        if len(window) >= WINDOW_SIZE:
            break
        if g not in window:
            window.append(g)
    return window[:WINDOW_SIZE], last


def main() -> None:
    window, last = propose()
    ids = gate_ids()
    never = [g for g in ids if g not in last]
    print(f"# inventory: {len(ids)} ids; driver-green ever: {len(last)}; "
          f"never-green: {len(never)}")
    if never:
        print(f"# fronted (never driver-green): {never}")
    stale = min((last[g] for g in ids if g in last), default=0)
    print(f"# oldest remaining driver-green round after this window: "
          f"{min((last[g] for g in ids if g in last and g not in window), default=stale)}")
    print("_WINDOW = [")
    for i in range(0, len(window), 3):
        print("    " + ", ".join(repr(g) for g in window[i : i + 3]) + ",")
    print("]")
    if len(window) != WINDOW_SIZE:
        print(f"# WARNING: only {len(window)} ids", file=sys.stderr)


if __name__ == "__main__":
    main()
