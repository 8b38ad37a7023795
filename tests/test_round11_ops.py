"""Round-11 operator contracts: hand-computable fixtures for the new
segmentation, trend, attribution, streak, CDC, BFS, survivorship,
calibration, and vocabulary-growth operators.

Every operator also has a DuckDB-hash-verified driver gate; these
tests pin the SEMANTICS on inputs small enough to verify by hand.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_rfm_segments_scores_and_census(spark):
    """4 customers, 2 bins: best recency/frequency/monetary gets score
    1 via the closed-form rank quantile; census counts land exactly."""
    from awi_datapipelinepublic_spark.operators.events import rfm_segments

    rows = [
        # cust, date, cents: c1 recent+frequent+big, c4 stale+rare+small
        (1, dt.date(2024, 3, 1), 1000),
        (1, dt.date(2024, 3, 2), 1000),
        (2, dt.date(2024, 2, 1), 500),
        (2, dt.date(2024, 2, 2), 500),
        (3, dt.date(2024, 1, 10), 300),
        (4, dt.date(2024, 1, 1), 100),
    ]
    df = spark.createDataFrame(rows, "c long, d date, cents long")
    out = rfm_segments(df, "c", "d", "cents", n_bins=2).collect()
    by_seg = {(r["r_score"], r["f_score"], r["m_score"]): r for r in out}
    # n=4, bins=2: ranks 1-2 -> score 1, ranks 3-4 -> score 2.
    # c1+c2 top both halves of every axis -> (1,1,1); c3+c4 -> (2,2,2)
    assert by_seg[(1, 1, 1)]["n_customers"] == 2
    assert by_seg[(1, 1, 1)]["monetary_cents"] == 3000
    assert by_seg[(2, 2, 2)]["n_customers"] == 2
    assert by_seg[(2, 2, 2)]["monetary_cents"] == 400
    assert sum(r["n_customers"] for r in out) == 4
    assert sum(r["monetary_cents"] for r in out) == 3400


def test_theil_sen_trend_robust_to_outlier(spark):
    """A perfect slope-2 line with one wild outlier still medians to
    slope 2 (the whole point vs OLS); n_pairs = C(n,2)."""
    from awi_datapipelinepublic_spark.operators.timeseries import theil_sen_trend

    rows = [(i, 2 * i) for i in range(9)] + [(9, 1000)]
    df = spark.createDataFrame(rows, "i long, v long")
    r = theil_sen_trend(df, "i", "v").collect()[0]
    assert r["n_points"] == 10 and r["n_pairs"] == 45
    assert r["slope"] == pytest.approx(2.0)


def test_theil_sen_trend_refuses_fact_sized_input(spark):
    from awi_datapipelinepublic_spark.operators.timeseries import theil_sen_trend

    df = spark.range(100).selectExpr("id AS i", "id AS v")
    with pytest.raises(ValueError, match="quadratic"):
        theil_sen_trend(df, "i", "v", max_points=50)


def test_trend_by_group_exact_line_and_degenerate(spark):
    """y = 3x + 7 recovers slope 3.0 exactly; a single-point group
    yields NULL (0/0 under try_divide), never an error."""
    from awi_datapipelinepublic_spark.operators.timeseries import trend_by_group

    rows = [("a", x, 3 * x + 7) for x in range(5)] + [("b", 1, 42)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in trend_by_group(df, "g", "x", "y").collect()}
    assert out["a"]["slope"] == pytest.approx(3.0)
    assert out["a"]["n_points"] == 5
    assert out["b"]["slope"] is None


def test_attribution_position_u_shape_exact_bp(spark):
    """k=4 path: first 4000+rem(2000-2·1000=0), last 4000, middles
    1000 each; k=1 gets all 10000; zero-touch converter credits
    (none). Credit per path always sums to 10000."""
    from awi_datapipelinepublic_spark.operators.events import attribution_position

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click, view, signup, click -> purchase
        (1, t0, 1, "click", 0.0, ""),
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 0.0, ""),
        (3, t0 + dt.timedelta(minutes=2), 1, "signup", 0.0, ""),
        (4, t0 + dt.timedelta(minutes=3), 1, "click", 0.0, ""),
        (5, t0 + dt.timedelta(minutes=4), 1, "purchase", 9.0, ""),
        # user 2: single view -> purchase
        (6, t0, 2, "view", 0.0, ""),
        (7, t0 + dt.timedelta(minutes=1), 2, "purchase", 5.0, ""),
        # user 3: purchase with no prior touch
        (8, t0, 3, "purchase", 1.0, ""),
        # user 4: touch but never converts -> excluded entirely
        (9, t0, 4, "click", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["touch_type"]: r for r in attribution_position(df).collect()}
    # user1: click pos1 4000 + pos4(last) 4000; view 1000; signup 1000
    assert out["click"]["credit_bp"] == 8000
    assert out["view"]["credit_bp"] == 1000 + 10000  # + user2's k=1 path
    assert out["signup"]["credit_bp"] == 1000
    assert out["(none)"]["credit_bp"] == 10000
    assert sum(r["credit_bp"] for r in out.values()) == 30000  # 3 paths


def test_activity_streaks_census(spark):
    """User A active 3 consecutive days + an isolated day -> longest 3;
    user B one day -> 1. Duplicate same-day events collapse."""
    from awi_datapipelinepublic_spark.operators.events import activity_streaks

    t = lambda d, h=0: dt.datetime(2024, 1, d, h)
    rows = [
        (1, t(1)), (2, t(1, 5)), (3, t(2)), (4, t(3)), (5, t(10)),  # user A
        (6, t(7)),  # user B
    ]
    df = spark.createDataFrame(
        [(i, ts, 100 + (i > 5)) for i, ts in [(r[0], r[1]) for r in rows]],
        "event_id long, ts timestamp, user_id long",
    )
    out = {r["streak_days"]: r["n_users"] for r in activity_streaks(df).collect()}
    assert out == {3: 1, 1: 1}


def test_cdc_apply_last_wins_and_tombstones(spark):
    """Out-of-order changelog: key 1 ends on U (kept, latest payload),
    key 2 ends on D (absent), key 3 insert-only (kept)."""
    from awi_datapipelinepublic_spark.operators.merge import cdc_apply

    rows = [
        (1, 10, "I", 100), (1, 30, "U", 300), (1, 20, "U", 200),
        (2, 11, "I", 111), (2, 21, "D", 0),
        (3, 12, "I", 333),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, op string, v long")
    out = {r["k"]: r for r in cdc_apply(df, ["k"], "seq", "op").collect()}
    assert set(out) == {1, 3}
    assert out[1]["v"] == 300 and out[1]["seq"] == 30
    assert out[3]["v"] == 333


def test_bfs_distance_chain_and_cap(spark):
    """Path graph 1-2-3-4-5-6 with seed 1: dists 0..3 within 3 hops,
    nodes 5,6 unreached; a seed outside the edge list still reports
    dist 0."""
    from awi_datapipelinepublic_spark.operators.graph import bfs_distance

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    out = {r["node"]: r["dist"] for r in bfs_distance(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 99: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_distance_takes_shortest_route(spark):
    """Diamond 1-2, 1-3, 2-4, 3-4: node 4 is dist 2, counted once."""
    from awi_datapipelinepublic_spark.operators.graph import bfs_distance

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["dist"] for r in bfs_distance(edges, seeds, max_hops=5).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_ann_mrr_eval_self_consistent(spark, sf_dir):
    """Every rank is 0 (miss) or 1..k; rr = 1/rank exactly; a hit at
    rank 1 yields rr 1.0."""
    from awi_datapipelinepublic_spark.operators.similarity import ann_mrr_eval

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = ann_mrr_eval(emb, k=5).collect()
    assert rows
    for r in rows:
        assert 0 <= r["rank"] <= 5
        if r["rank"] == 0:
            assert r["rr"] == 0.0
        else:
            assert r["rr"] == pytest.approx(1.0 / r["rank"], abs=1e-6)


def test_dedup_keep_best_picks_highest_score(spark):
    """Two exact dups (modulo whitespace/case): the higher-score copy
    survives with dup_count 2; tie breaks to the lowest id."""
    from awi_datapipelinepublic_spark.operators.dedup import dedup_keep_best

    rows = [
        (1, "Hello  World", 5),
        (2, "hello world", 9),   # same fingerprint, higher score -> survives
        (3, "unique doc", 4),
        (4, "Unique   DOC", 4),  # tie on score -> lowest id (3) survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = {r["doc_id"]: r for r in dedup_keep_best(df).collect()}
    assert set(out) == {2, 3}
    assert out[2]["dup_count"] == 2 and out[2]["score"] == 9
    assert out[3]["dup_count"] == 2


def test_trimmed_mean_drops_exact_tail_counts(spark):
    """10 rows, 10% trim -> k=1 off each end: mean of the middle 8;
    a tiny group (n=4, k=0) keeps everything."""
    from awi_datapipelinepublic_spark.operators.quality import trimmed_mean

    rows = [("a", v, i) for i, v in enumerate([0, 1, 2, 3, 4, 5, 6, 7, 8, 1000])]
    rows += [("b", v, i) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, "g string, v long, tid long")
    out = {r["g"]: r for r in trimmed_mean(df, "g", "v", ["tid"]).collect()}
    assert out["a"]["n_total"] == 10 and out["a"]["n_kept"] == 8
    assert out["a"]["trimmed_mean"] == pytest.approx(sum(range(1, 9)) / 8)
    assert out["b"]["n_kept"] == 4
    assert out["b"]["trimmed_mean"] == pytest.approx(25.0)


def test_quantile_mapping_endpoints_and_monotone(spark):
    """A's min maps to B's min, A's max to B's max; mapping is
    monotone in the source value."""
    from awi_datapipelinepublic_spark.operators.quality import quantile_mapping

    rows = [("A", i, v) for i, v in enumerate([5, 1, 9, 3])]
    rows += [("B", 100 + i, v) for i, v in enumerate([100, 400, 200, 300, 500])]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = quantile_mapping(df, "g", "v", "id", "A", "B").collect()
    got = {r["value"]: r["mapped"] for r in out}
    # A ranks: 1,3,5,9 -> rb = 1 + (r-1)*4//3 -> 1, 2, 3, 5
    assert got[1] == 100 and got[9] == 500
    assert got[3] == 200 and got[5] == 300
    ordered = [got[v] for v in sorted(got)]
    assert ordered == sorted(ordered)


def test_vocab_growth_cumulatives(spark):
    """Three docs with overlapping vocab: new_types counts first
    occurrences only; cumulatives are exact running sums."""
    from awi_datapipelinepublic_spark.operators.corpus import vocab_growth

    rows = [
        (1, "a b c"),
        (2, "b c d"),
        (3, "a a e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in vocab_growth(df).collect()}
    assert out[1]["n_tokens"] == 3 and out[1]["new_types"] == 3
    assert out[2]["new_types"] == 1  # only d is new
    assert out[3]["new_types"] == 1  # only e is new
    assert out[3]["cum_tokens"] == 9 and out[3]["cum_types"] == 5


def test_scd2_lookup_picks_covering_version(spark):
    """Facts probe inside, at the boundary, and after the last
    version: half-open intervals, NULL valid_to = current; a probe
    before the first version drops out."""
    from awi_datapipelinepublic_spark.operators.merge import scd2_lookup

    dim = spark.createDataFrame(
        [
            (1, "A", dt.date(2024, 1, 1), dt.date(2024, 2, 1)),
            (1, "B", dt.date(2024, 2, 1), None),
            (2, "X", dt.date(2024, 3, 1), None),
        ],
        "k long, attr string, valid_from date, valid_to date",
    )
    facts = spark.createDataFrame(
        [
            (10, 1, dt.date(2024, 1, 15)),  # inside A
            (11, 1, dt.date(2024, 2, 1)),   # boundary -> B (half-open)
            (12, 1, dt.date(2025, 1, 1)),   # open-ended current -> B
            (13, 2, dt.date(2024, 1, 1)),   # before first version -> dropped
            (14, 3, dt.date(2024, 1, 1)),   # unknown key -> dropped
        ],
        "fid long, k long, ts date",
    )
    out = {r["fid"]: r["attr"] for r in scd2_lookup(facts, dim, ["k"], "ts").collect()}
    assert out == {10: "A", 11: "B", 12: "B"}


def test_mutual_nn_reciprocal_only(spark):
    """Two tight pairs and one satellite: the satellite's top-1 points
    into a pair whose member prefers its twin -> only the two
    reciprocal pairs survive, each once with a_id < b_id."""
    from awi_datapipelinepublic_spark.operators.similarity import mutual_nn

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.14, 0.0]),   # twin of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.14, 0.99, 0.0]),   # twin of 3
        (5, [0.7, 0.71, 0.0]),    # satellite: closest to 2 or 4, not mutual
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["a_id"], r["b_id"]) for r in mutual_nn(df).collect()}
    assert (1, 2) in out and (3, 4) in out
    assert all(a < b for a, b in out)
    assert not any(5 in p for p in out)


def test_grouped_row_number_matches_sequential_window(spark):
    """The two-pass parallel keyed rank must equal the sequential
    keyed window for any total order — including groups that span
    many range partitions."""
    from pyspark.sql import Window

    from awi_datapipelinepublic_spark.operators.windows import grouped_row_number

    df = spark.range(0, 5000).selectExpr(
        "id % 3 AS g", "CAST((id * 2654435761) % 100000 AS LONG) AS v", "id"
    )
    got = grouped_row_number(
        df, ["g"], [F.col("v").asc(), F.col("id").asc()], out_col="rn"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_rank_movers_delta_and_topk(spark):
    """Key A falls #1 -> #3, key C climbs #3 -> #1: deltas are exact
    rank differences; a key missing from one era drops out."""
    from awi_datapipelinepublic_spark.operators.timeseries import rank_movers

    rows = [
        ("p1", "A", 300), ("p1", "B", 200), ("p1", "C", 100),
        ("p2", "A", 100), ("p2", "B", 200), ("p2", "C", 300),
        ("p1", "D", 50),  # no p2 presence -> excluded
    ]
    df = spark.createDataFrame(rows, "p string, k string, v long")
    out = {r["k"]: r for r in rank_movers(df, "k", "p", "v", "p1", "p2", k=10).collect()}
    assert "D" not in out
    assert out["A"]["rank_a"] == 1 and out["A"]["rank_b"] == 3
    assert out["A"]["rank_delta"] == -2 and out["C"]["rank_delta"] == 2
    assert out["B"]["rank_delta"] == 0


def test_local_peaks_strict_interior(spark):
    """Series 1,5,2,7,7,3: only the 5 is a strict peak (the 7-plateau
    fails v > next; endpoints excluded); prominence = 5 - max(1,2)."""
    from awi_datapipelinepublic_spark.operators.timeseries import local_peaks

    rows = [("k", i, v) for i, v in enumerate([1, 5, 2, 7, 7, 3])]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    out = local_peaks(df, "g", "t", "v").collect()
    assert len(out) == 1
    assert out[0]["t"] == 1 and out[0]["value"] == 5 and out[0]["prominence"] == 3


def test_winsorize_by_group_clips_to_rank_bounds(spark):
    """10 values, 10% trim -> k=1: bounds are the 2nd and 9th ordered
    values; min clips up, max clips down, interior unchanged."""
    from awi_datapipelinepublic_spark.operators.quality import winsorize_by_group

    vals = [0, 10, 20, 30, 40, 50, 60, 70, 80, 1000]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, lid long, v long"
    )
    out = {r["id"]: r["clipped"] for r in winsorize_by_group(df, "g", "v", "lid").collect()}
    assert out[0] == 10      # 0 -> lo bound (2nd value)
    assert out[9] == 80      # 1000 -> hi bound (9th value)
    assert out[5] == 50      # interior untouched


def test_chi2_independence_exact_cells(spark):
    """2x2 with perfect independence: every contribution is 0; a
    dependent table shows the textbook (O-E)^2/E per cell."""
    from awi_datapipelinepublic_spark.operators.quality import chi2_independence

    # independent: P(a)P(b) factorizes (counts 1,1,1,1)
    rows = [("x", 1), ("x", 2), ("y", 1), ("y", 2)]
    df = spark.createDataFrame(rows, "a string, b int")
    for r in chi2_independence(df, "a", "b").collect():
        assert r["contrib"] == 0.0 and r["expected"] == 1.0

    # dependent: x always 1, y always 2 (2 rows each)
    rows2 = [("x", 1), ("x", 1), ("y", 2), ("y", 2)]
    df2 = spark.createDataFrame(rows2, "a string, b int")
    out = {(r["a"], r["b"]): r for r in chi2_independence(df2, "a", "b").collect()}
    # E = 2*2/4 = 1; contrib = (2-1)^2/1 = 1 for both observed cells
    assert out[("x", 1)]["observed"] == 2
    assert out[("x", 1)]["expected"] == 1.0
    assert out[("x", 1)]["contrib"] == 1.0


def test_hits_scores_star_graph_exact(spark):
    """Star u1..u3 -> v (plus u1 -> w): authority concentrates on v
    with exactly computable integer scores, k=1: h(u)=outdeg? no —
    h1(u) = #out-edges (a0=1), a1(v) = sum of pointing hubs."""
    from awi_datapipelinepublic_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("u1", "v"), ("u2", "v"), ("u3", "v"), ("u1", "w")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in hits_scores(edges, iterations=1).collect()}
    # h1: u1=2 (v,w), u2=1, u3=1; a1: v = h(u1)+h(u2)+h(u3) = 4, w = 2
    assert out["u1"]["hub"] == 2 and out["u2"]["hub"] == 1
    assert out["v"]["auth"] == 4 and out["w"]["auth"] == 2
    assert out["v"]["hub"] == 0 and out["u1"]["auth"] == 0


def test_hits_scores_iterations_grow_exactly(spark):
    """Two-node cycle a<->b: every score doubles per full iteration
    in the unnormalized recurrence — exactly."""
    from awi_datapipelinepublic_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r["node"]: r for r in hits_scores(edges, iterations=3).collect()}
    # h1=1, a1=1; h2=1·? cycle: h_i = a_{i-1}(other) ... all stay
    # powers: h3 = 1, a3 = 1 scaled by 1 each round (degree 1)
    assert out["a"]["hub"] == 1 and out["a"]["auth"] == 1


def test_vocab_overlap_exact_jaccard(spark):
    """Sources with known token sets: jaccard = |∩|/|∪| exactly,
    pairs emitted once with source_a < source_b."""
    from awi_datapipelinepublic_spark.operators.corpus import vocab_overlap

    rows = [
        (1, "a b c", "s1"), (2, "b c d", "s2"), (3, "x y", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r for r in vocab_overlap(df).collect()}
    assert out[("s1", "s2")]["inter"] == 2
    assert out[("s1", "s2")]["union_"] == 4
    assert out[("s1", "s2")]["jaccard"] == pytest.approx(0.5)
    assert out[("s1", "s3")]["inter"] == 0 if ("s1", "s3") in out else True


def test_ttr_by_group_counts(spark):
    from awi_datapipelinepublic_spark.operators.corpus import ttr_by_group

    df = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "c", "s1"), (3, "z z z z", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in ttr_by_group(df).collect()}
    assert out["s1"]["n_tokens"] == 4 and out["s1"]["n_types"] == 3
    assert out["s1"]["ttr"] == pytest.approx(0.75)
    assert out["s2"]["n_types"] == 1 and out["s2"]["ttr"] == pytest.approx(0.25)


def test_activity_gaps_thresholds(spark):
    """Days 1,2,5,6 with min_gap 2: one gap (2 -> 5, 3 days);
    consecutive days never report; multiple same-day events dedupe."""
    from awi_datapipelinepublic_spark.operators.events import activity_gaps

    t = lambda d, h=0: dt.datetime(2024, 1, d, h)
    rows = [(1, t(1)), (2, t(2)), (3, t(2, 6)), (4, t(5)), (5, t(6))]
    df = spark.createDataFrame(
        [(i, ts, 7) for i, ts in rows], "event_id long, ts timestamp, user_id long"
    )
    out = activity_gaps(df, min_gap_days=2).collect()
    assert len(out) == 1
    g = out[0]
    assert g["gap_start"] == dt.date(2024, 1, 2) and g["gap_end"] == dt.date(2024, 1, 5)
    assert g["gap_days"] == 3


def test_attribution_time_decay_staircase(spark):
    """Ages 0, 7, 14 days before conversion at half-life 7: credits
    10000, 5000, 2500 bp exactly; untouched users excluded."""
    from awi_datapipelinepublic_spark.operators.events import attribution_time_decay

    t0 = dt.datetime(2024, 1, 15, 12, 0, 0)
    rows = [
        (1, t0 - dt.timedelta(days=14), 1, "click"),
        (2, t0 - dt.timedelta(days=7), 1, "view"),
        (3, t0 - dt.timedelta(hours=1), 1, "signup"),  # age 0 days
        (4, t0, 1, "purchase"),
        (5, t0, 2, "click"),  # user 2 never converts
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r["touch_type"]: r["credit_bp"] for r in attribution_time_decay(df).collect()}
    assert out == {"click": 2500, "view": 5000, "signup": 10000}


def test_fk_orphans_counts(spark):
    """One orphan fact key and one NULL fk both count; a clean link
    reports zero."""
    from awi_datapipelinepublic_spark.operators.expectations import fk_orphans

    fact = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    out = {r["relation"]: r for r in fk_orphans([("f.d", fact, "fk", dim, "pk")]).collect()}
    assert out["f.d"]["n_fact"] == 4
    assert out["f.d"]["n_orphans"] == 2  # 99 and NULL


def test_length_histogram_buckets(spark):
    """Lengths 1,2,3,4,8,0: buckets 0,1,1,2,3,-1 — powers of two land
    exactly (the libm-unsafe case the string trick avoids)."""
    from awi_datapipelinepublic_spark.operators.quality import length_histogram

    df = spark.createDataFrame(
        [("en", 1), ("en", 2), ("en", 3), ("en", 4), ("en", 8), ("en", 0)],
        "lang string, n long",
    )
    out = {r["bucket"]: r["n_docs"] for r in length_histogram(df, "lang", "n").collect()}
    assert out == {0: 1, 1: 2, 2: 1, 3: 1, -1: 1}


def test_recency_features_current_streak(spark):
    """User active days 1-3 and 9-10 (anchor = day 10): current
    streak 2, active days 5, staleness 0; a stale user measures days
    since against the same anchor."""
    from awi_datapipelinepublic_spark.operators.events import recency_features

    t = lambda d: dt.datetime(2024, 1, d)
    rows = [(1, d) for d in (1, 2, 3, 9, 10)] + [(2, d) for d in (4, 5)]
    df = spark.createDataFrame(
        [(i, t(d), u) for i, (u, d) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long",
    )
    out = {r["user_id"]: r for r in recency_features(df).collect()}
    assert out[1]["last_day"] == dt.date(2024, 1, 10)
    assert out[1]["days_since"] == 0
    assert out[1]["n_active_days"] == 5 and out[1]["current_streak"] == 2
    assert out[2]["days_since"] == 5 and out[2]["current_streak"] == 2


def test_hits_scores_rejects_zero_iterations(spark):
    """iterations < 1 must raise ValueError up front, not NameError."""
    from awi_datapipelinepublic_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits_scores(edges, iterations=0)
