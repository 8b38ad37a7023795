"""Round-7 operators: rolling_median, poisson_weighted_sample,
fuzzy_join_edit1 — hand-computed pins plus the naive-equivalence
properties the gates rely on."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_rolling_median_hand_computed(spark):
    from awi_datapipelinepublic_spark.operators.timeseries import rolling_median

    df = spark.createDataFrame(
        [("u", i, float(v), i) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8, 4])],
        "user_id string, ts long, value double, event_id long",
    )
    got = {
        r["ts"]: r["rolling_median"]
        for r in rolling_median(df, preceding=2).collect()
    }
    # frames: [5]=5, [5,1]=3 (interpolated), [5,1,9]=5, [1,9,3]=3,
    # [9,3,7]=7, [3,7,2]=3, [7,2,8]=7, [2,8,4]=4
    assert got == {0: 5.0, 1: 3.0, 2: 5.0, 3: 3.0, 4: 7.0, 5: 3.0, 6: 7.0, 7: 4.0}


def test_rolling_median_ignores_nulls_and_keys_are_independent(spark):
    from awi_datapipelinepublic_spark.operators.timeseries import rolling_median

    df = spark.createDataFrame(
        [("a", 0, 10.0, 0), ("a", 1, None, 1), ("a", 2, 20.0, 2), ("b", 0, 99.0, 3)],
        "user_id string, ts long, value double, event_id long",
    )
    got = {
        (r["user_id"], r["ts"]): r["rolling_median"]
        for r in rolling_median(df, preceding=6).collect()
    }
    # null is skipped by the percentile: frame at a.ts=2 is {10, 20}
    assert got[("a", 2)] == 15.0
    assert got[("a", 1)] == 10.0  # frame {10, NULL} -> 10
    assert got[("b", 0)] == 99.0  # key isolation


def test_poisson_weighted_sample_probability_and_determinism(spark):
    from awi_datapipelinepublic_spark.operators.sampling import (
        poisson_weighted_sample,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = poisson_weighted_sample(df, "doc_id", "n_chars", target_rows=20)
    b = poisson_weighted_sample(df, "doc_id", "n_chars", target_rows=20)
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0  # identical keep-set, no RNG
    # p_include really is min(1, target*w/W)
    W = df.agg(F.sum("n_chars")).first()[0]
    row = a.first()
    assert row["p_include"] == round(min(1.0, 20.0 * row["n_chars"] / float(W)), 6)
    # expected size within loose Poisson bounds (sum of p ~= 20 here)
    assert 5 <= len(ids_a) <= 40


def test_poisson_weighted_sample_caps_heavy_rows_at_one(spark):
    from awi_datapipelinepublic_spark.operators.sampling import (
        poisson_weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 1_000_000), (2, 1), (3, 1)], "doc_id long, w long"
    )
    out = poisson_weighted_sample(df, "doc_id", "w", target_rows=2)
    got = {r["doc_id"]: r["p_include"] for r in out.collect()}
    assert got[1] == 1.0  # dominant row always kept, p capped


def test_fuzzy_join_edit1_matches_naive_theta(spark):
    from awi_datapipelinepublic_spark.operators.joins import fuzzy_join_edit1

    names = [
        "kitten", "sitten", "sittin", "kittens", "itten", "banana",
        "bananna", "xyz", "xyzz", "", "a", "b", "ab",
    ]
    df = spark.createDataFrame([(n,) for n in names], "nm string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_join_edit1(df, df, "nm", "nm").collect()
    }
    naive = set()
    for i, x in enumerate(names):
        for y in names[i + 1 :]:
            a, b = sorted((x, y))
            d = _lev(a, b)
            if d <= 1 and a != b:
                naive.add((a, b, d))
    assert got == naive
    # spot: substitution, insertion, deletion, and empty-string edges
    assert ("kitten", "sitten", 1) in got and ("kitten", "kittens", 1) in got
    assert ("itten", "kitten", 1) in got and ("", "a", 1) in got
    assert ("banana", "bananna", 1) in got
    assert not any(a == "kitten" and b == "sittin" for a, b, _ in got)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_event_rate_limit_one_per_window_vs_throttle_debounce(spark):
    """A sustained burst: rate limiting keeps one event per aligned
    window as time advances; event_throttle (debounce) keeps only the
    burst's first event. This pins the semantic line the r6 ADVICE
    review drew."""
    from awi_datapipelinepublic_spark.operators.events import (
        event_rate_limit,
        event_throttle,
    )

    # one event every 10s for 100s: windows [0,60) and [60,120)
    rows = [(i, "u", "click", float(t)) for i, t in enumerate(range(0, 101, 10))]
    df = spark.createDataFrame(rows, "event_id long, user_id string, event_type string, v double").withColumn(
        "ts", F.timestamp_seconds(F.col("v"))
    )
    limited = sorted(r["event_id"] for r in event_rate_limit(df, window_seconds=60).collect())
    assert limited == [0, 6]  # t=0 and t=60: first of each window
    debounced = sorted(r["event_id"] for r in event_throttle(df, min_gap_seconds=60).collect())
    assert debounced == [0]  # gap to previous RAW event never reaches 60


def test_event_rate_limit_key_isolation_and_subsecond(spark):
    from awi_datapipelinepublic_spark.operators.events import event_rate_limit

    rows = [
        (1, "a", "x", 0.2), (2, "a", "x", 0.9),   # same sub-second window
        (3, "a", "y", 0.5),                        # other type: own stream
        (4, "b", "x", 0.5),                        # other user
        (5, "a", "x", 1.1),                        # next 1s window
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, event_type string, v double").withColumn(
        "ts", F.timestamp_seconds(F.col("v"))
    )
    kept = sorted(r["event_id"] for r in event_rate_limit(df, window_seconds=1).collect())
    assert kept == [1, 3, 4, 5]


def test_degree_assortativity_hand_computed(spark):
    from awi_datapipelinepublic_spark.operators.graph import degree_assortativity

    # star graph: hub 1 with leaves 2,3,4 -> perfectly disassortative
    star = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    row = degree_assortativity(star).first()
    assert row["n_edges"] == 3 and row["assortativity"] == -1.0
    # 4-cycle: degree-regular -> zero variance -> NULL r
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long")
    row = degree_assortativity(cyc).first()
    assert row["n_edges"] == 4 and row["assortativity"] is None
    # self-loops and duplicate/reversed edges are cleaned first
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (1, 3), (1, 4)], "src long, dst long"
    )
    assert degree_assortativity(messy).first()["n_edges"] == 3
