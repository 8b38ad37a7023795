"""Compare two bench runs and flag per-query drifters.

The round ritual's drifter protocol (BASELINE.md "drifter
re-measurement" sections) compares suite-to-suite per-query times and
flags movers ≥1.3× among queries costing ≥0.3 s (sub-0.3 s queries are
scheduling-bound; their ratios are noise). This does that comparison
mechanically over any two bench JSON artifacts:

  python tools/check_drift.py OLD.json NEW.json [threshold]

Accepts either bench.py's metric line ({"queries": {...}}) or a
driver BENCH_r*.json ({"parsed": {"t": [...]}} — names resolved from
bench.py's BENCH_QUERIES order, which is append-only by contract).
Prints movers sorted by ratio plus the geomean, and exits 0 always —
it informs the protocol (re-measure, then act only if a mover
persists on a quiet host); it is not a gate.
"""

from __future__ import annotations

import json
import math
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def bench_query_names() -> list[str]:
    src = (REPO / "bench.py").read_text()
    m = re.search(r"BENCH_QUERIES\s*=\s*\[(.*?)\]", src, re.S)
    return re.findall(r'"([a-z0-9_]+)"', m.group(1))


def load_times(path: str) -> dict[str, float]:
    d = json.loads(Path(path).read_text())
    if "queries" in d:
        return d["queries"]
    parsed = d.get("parsed") or {}
    if "t" in parsed:
        names = bench_query_names()
        return dict(zip(names[: parsed["n"]], parsed["t"]))
    raise SystemExit(f"{path}: neither a bench metric line nor a driver record")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load_times(sys.argv[1]), load_times(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = [k for k in new if k in old and old[k] >= 0.3]
    ratios = {k: new[k] / old[k] for k in shared}
    movers = sorted(
        ((r, k) for k, r in ratios.items() if r >= thresh or r <= 1 / thresh),
        reverse=True,
    )
    for r, k in movers:
        print(f"{r:5.2f}x  {k}  {old[k]:.3f} -> {new[k]:.3f}")
    if not movers:
        print(f"no movers beyond {thresh}x among {len(shared)} shared queries")
    if not ratios:
        print("no shared queries >= 0.3s between the two runs — nothing to compare")
        return
    gm = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"geomean {gm:.3f} over {len(ratios)} shared queries "
          f"(old total {sum(old[k] for k in shared):.1f}s, "
          f"new total {sum(new[k] for k in shared):.1f}s)")


if __name__ == "__main__":
    main()
