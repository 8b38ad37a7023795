"""Recall-at-scale sweep for the auto-granularity ANN/dedup defaults.

The sf0.1 -> sf1 runtime sweep (BASELINE.md) proved the auto-sized
candidate generators stay LINEAR in n; this tool pins the QUALITY side
of the same tradeoff: auto code length h = log2(n/target) and auto
cluster count k = n/target change with the corpus, and recall must not
silently collapse as they grow. Measures, at each scale dir:

- knn_join_lsh (auto-h, multiprobe 1) recall against knn_join_brute's
  exact top-5 neighbor pairs
- semantic_dedup (auto-k) victim-set recall against the EXACT
  cosine>=0.95 near-dup victim set (numpy all-pairs + union-find --
  the brute-force ground truth embedding_near_dup approximates)

Prints one JSON line per scale. The asserted floors live in
tests/test_analytics_ops.py::test_recall_floors_hold_across_scales;
numbers are recorded in BASELINE.md "Recall sweep".

Usage: python tools/recall_sweep.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/sf1)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def exact_victims(ids: np.ndarray, M: np.ndarray, threshold: float) -> set[int]:
    """Ground-truth SemDeDup victim set: union-find over ALL pairs with
    cosine >= threshold (blocked numpy matmul), min-id canonical per
    component — every non-canonical member is a victim."""
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    U = M / norms
    n = len(ids)
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    block = 2048
    for s in range(0, n, block):
        sims = U[s : s + block] @ U.T
        for bi, gi in enumerate(range(s, min(s + block, n))):
            for gj in np.nonzero(sims[bi] >= threshold)[0]:
                if gj > gi:
                    ri, rj = find(gi), find(int(gj))
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)])
    order = np.argsort(ids, kind="stable")
    canon: dict[int, int] = {}
    for i in order:
        canon.setdefault(int(roots[i]), int(ids[i]))
    return {int(ids[i]) for i in range(n) if canon[int(roots[i])] != int(ids[i])}


def sweep(spark, sf_dir: str) -> dict:
    from awi_datapipelinepublic_spark.operators.dedup import semantic_dedup
    from awi_datapipelinepublic_spark.operators.similarity import (
        knn_join_brute,
        knn_join_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=float) for r in rows])
    n, dim = M.shape

    bf = {(r["a_id"], r["b_id"]) for r in knn_join_brute(emb, k=5).select("a_id", "b_id").collect()}
    ap = {(r["a_id"], r["b_id"]) for r in knn_join_lsh(emb, dim=dim, k=5, multiprobe_bits=1).select("a_id", "b_id").collect()}
    knn_recall = len(bf & ap) / len(bf)

    truth = exact_victims(ids, M, threshold=0.95)
    surv = {r["vec_id"] for r in semantic_dedup(emb, threshold=0.95).collect()}
    sem_victims = set(int(i) for i in ids) - surv
    victim_recall = (len(truth & sem_victims) / len(truth)) if truth else 1.0
    # SemDeDup must never invent victims that are not exact near-dups
    false_victims = len(sem_victims - truth)

    return {
        "sf_dir": sf_dir,
        "n_vectors": int(n),
        "knn_join_lsh_recall": round(knn_recall, 4),
        "semantic_victim_recall": round(victim_recall, 4),
        "exact_victims": len(truth),
        "semantic_victims": len(sem_victims),
        "false_victims": false_victims,
    }


def main() -> None:
    from pyspark.sql import SparkSession

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .appName("recall-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(sweep(spark, d)), flush=True)


if __name__ == "__main__":
    main()
