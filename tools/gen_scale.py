"""Derive a larger scale factor from the driver's testdata by FK-consistent
replication — evidence tooling for the sf0.1 → sf1 scaling sweep in
BASELINE.md.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md) and its generator is
not available, so a measured decade of scaling needs a derived dataset:
replicate every table N times with per-replica key offsets applied
CONSISTENTLY across fact and dimension keys. Each replica is a disjoint,
internally-consistent copy of the star schema, so join fan-out, group
cardinality per key, and selectivity of every predicate are IDENTICAL to the
source — row volume scales by exactly N with no distribution drift, which is
what makes the sweep a clean measurement of volume scaling rather than a
different workload. region/nation stay fixed (TPC-H semantics: constant-size
dims). Document text gets a per-replica suffix so the dedup operators see
near-duplicates across replicas rather than N-way exact clones (exact clones
would collapse the minhash bucket structure into degenerate mega-buckets —
a skew stress test, not a volume sweep).

Pure DuckDB (vectorized read→project→write); never touches /root/testdata.

Usage: python tools/gen_scale.py SRC_DIR DST_DIR FACTOR
   eg: python tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

# table -> columns that carry entity keys needing per-replica offsets,
# mapped to the offset-group they belong to (key spaces must shift in
# lockstep across tables to keep FKs valid).
KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ["region", "nation"]


def offsets(con: duckdb.DuckDBPyConnection, src: Path) -> dict[str, int]:
    """Per key-space stride: max existing key + 1 (replica i adds i*stride)."""
    probes = {
        "cust": ("customer", "c_custkey"),
        "order": ("orders", "o_orderkey"),
        "part": ("part", "p_partkey"),
        "supp": ("supplier", "s_suppkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    out = {}
    for space, (table, col) in probes.items():
        (mx,) = con.execute(
            f"SELECT MAX({col}) FROM '{src}/{table}.parquet'"
        ).fetchone()
        out[space] = int(mx) + 1
    return out


def main(src_dir: str, dst_dir: str, factor: int) -> None:
    src, dst = Path(src_dir), Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    strides = offsets(con, src)
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keymap in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if c in keymap:
                exprs.append(f"{c} + i * {strides[keymap[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # near-dup, not exact clone, across replicas (module docstring)
                exprs.append("CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text")
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet', "
            f"range(0, {factor}) AS _r(i) ORDER BY i) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.execute(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows (x{factor})")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
