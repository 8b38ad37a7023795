"""Tests for the graph/ANN-join/validation operators: PageRank vs a
numpy power iteration, kNN self-join exactness + LSH recall on
clustered vectors, semantic dedup's cluster-approximation properties,
and the expectations validator."""

import sys
from pathlib import Path

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.operators.dedup import semantic_dedup
from awi_datapipelinepublic_spark.operators.expectations import (
    validate_expectations,
    violating_rows,
)
from awi_datapipelinepublic_spark.operators.graph import pagerank
from awi_datapipelinepublic_spark.operators.similarity import (
    knn_join_brute,
    knn_join_lsh,
)


# ---------------------------------------------------------------- pagerank

def test_pagerank_matches_numpy_power_iteration(spark):
    # 4-node graph: 0->1, 0->2, 1->2, 2->0, 3->2 (3 is dangling-free,
    # 1 receives from 0 only, 2 is the hub).
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.node: r.pagerank
        for r in pagerank(edges, iterations=5, damping=0.85).collect()
    }

    n, d = 4, 0.85
    ranks = {v: 1.0 / n for v in range(4)}
    outdeg = {0: 2, 1: 1, 2: 1, 3: 1}
    for _ in range(5):
        nxt = {}
        for v in range(4):
            s = sum(
                ranks[u] / outdeg[u] for (u, w) in edge_list if w == v
            )
            nxt[v] = (1 - d) / n + d * s
        ranks = nxt
    for v in range(4):
        assert abs(got[v] - ranks[v]) < 1e-12, (v, got[v], ranks[v])


def test_pagerank_hub_outranks_leaves(spark, sf_dir):
    from __spark_entry__ import q_pagerank

    pr = q_pagerank(spark, sf_dir).collect()
    assert len(pr) > 0
    # every rank positive and the minimum equals the no-inbound floor
    # (1-d)/N for some leaf (customers have no inbound edges).
    n = len(pr)
    floor = 0.15 / n
    # compare with tolerance: Spark F.round is HALF_UP, Python round is
    # half-even, and 0.15/160 lands exactly on the .5 boundary.
    assert abs(min(r.pagerank for r in pr) - floor) < 1e-6
    assert max(r.pagerank for r in pr) > floor + 1e-6


# ------------------------------------------------------------ knn self-join

def _clustered_emb(spark, n_clusters=20, per_cluster=10, dim=64, seed=7):
    """Tight clusters: base direction per cluster + tiny jitter, so
    every vector's true top-(per_cluster-1) neighbors are in-cluster."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + 0.01 * rng.standard_normal(dim)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster long, embedding array<float>"
    )


def test_knn_join_brute_finds_cluster_neighbors(spark):
    emb = _clustered_emb(spark)
    nn = knn_join_brute(emb, k=5).alias("n")
    truth = emb.select("vec_id", "cluster")
    joined = (
        nn.join(truth.alias("ta"), F.col("n.a_id") == F.col("ta.vec_id"))
        .join(
            truth.alias("tb").withColumnRenamed("cluster", "cluster_b"),
            F.col("n.b_id") == F.col("tb.vec_id"),
        )
    )
    mismatch = joined.filter(F.col("cluster") != F.col("cluster_b")).count()
    assert mismatch == 0
    # exactly k rows per left id
    per_left = nn.groupBy("a_id").count().agg(F.min("count"), F.max("count")).first()
    assert per_left[0] == 5 and per_left[1] == 5


def test_knn_join_lsh_recall_on_clustered_vectors(spark):
    emb = _clustered_emb(spark)
    bf = knn_join_brute(emb, k=5).select("a_id", "b_id")
    ap = knn_join_lsh(emb, dim=64, k=5, h=6, multiprobe_bits=1).select("a_id", "b_id")
    n_true = bf.count()
    hits = bf.intersect(ap).count()
    recall = hits / n_true
    # near-identical vectors share sign-LSH buckets; 0.8 leaves margin
    # for cluster centers that straddle a hyperplane.
    assert recall >= 0.8, recall


# ---------------------------------------------------------- semantic dedup

def test_semantic_dedup_single_cluster_is_exact(spark):
    """n_clusters=1 degenerates to the full pair graph — survivors must
    equal an independently computed brute-force closure."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120)
    got = {r.vec_id for r in semantic_dedup(emb, threshold=0.2, n_clusters=1).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    m = np.stack([np.asarray(r.embedding, dtype=float) for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= 0.2:
                a, b = find(ids[i]), find(ids[j])
                if a != b:
                    lo, hi = min(a, b), max(a, b)
                    parent[hi] = lo
    expected = {i for i in ids if find(i) == i}
    assert got == expected


def test_semantic_dedup_clustered_keeps_superset_of_exact(spark):
    """Cluster-bounded pair generation splits components, never merges
    them — so every exact survivor also survives the approximation."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    exact = {r.vec_id for r in semantic_dedup(emb, threshold=0.2, n_clusters=1).collect()}
    approx = {r.vec_id for r in semantic_dedup(emb, threshold=0.2, n_clusters=8).collect()}
    assert exact <= approx


# ------------------------------------------------------------- expectations

_RULES = [
    {"name": "id_not_null", "kind": "not_null", "column": "id"},
    {"name": "id_unique", "kind": "unique", "column": "id"},
    {"name": "status_in_set", "kind": "in_set", "column": "status", "values": ["A", "B"]},
    {"name": "score_in_range", "kind": "range", "column": "score", "lo": 0.0, "hi": 1.0},
    {"name": "code_format", "kind": "regex", "column": "code", "pattern": "^X[0-9]+$"},
    {"name": "score_below_two", "kind": "expr", "sql": "score < 2.0"},
]


def _toy(spark):
    return spark.createDataFrame(
        [
            (1, "A", 0.5, "X1"),      # clean
            (1, "B", 1.5, "X2"),      # dup id; score > hi; expr ok
            (None, "C", -0.5, "Y3"),  # null id; bad status; below lo; bad code
            (2, None, None, None),    # nulls are not in_set/range/regex violations
            (3, "A", 2.5, "X9"),      # expr violation (score >= 2)
        ],
        "id long, status string, score double, code string",
    )


def test_validate_expectations_counts(spark):
    out = {r.rule: (r.violations, r.total, r.passed)
           for r in validate_expectations(_toy(spark), _RULES).collect()}
    assert out == {
        "id_not_null": (1, 5, 0),
        "id_unique": (1, 5, 0),        # two id=1 rows -> 1 beyond first
        "status_in_set": (1, 5, 0),
        "score_in_range": (3, 5, 0),   # 1.5 > hi, -0.5 < lo, 2.5 > hi
        "code_format": (1, 5, 0),
        "score_below_two": (1, 5, 0),  # NULL score is not a violation
    }


def test_validate_expectations_all_pass(spark):
    clean = spark.createDataFrame(
        [(1, "A", 0.5, "X1"), (2, "B", 0.9, "X22")],
        "id long, status string, score double, code string",
    )
    out = validate_expectations(clean, _RULES)
    assert out.filter(F.col("passed") == 0).count() == 0
    assert out.count() == len(_RULES)


def test_validate_expectations_single_scan_plan(spark):
    """The whole suite must compile to one aggregation over one scan —
    no per-rule jobs, no joins."""
    plan = validate_expectations(_toy(spark), _RULES)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_violating_rows_names_each_miss(spark):
    rows = violating_rows(_toy(spark), _RULES, ["id"]).collect()
    got = {(r.rule, r.id) for r in rows}
    assert ("score_in_range", 1) in got          # the 1.5 row
    assert ("id_not_null", None) in got
    assert ("score_below_two", 3) in got
    # the all-NULL row only violates id-independent nothing: no entry
    assert not any(r.rule in {"status_in_set", "score_in_range", "code_format"} and r.id == 2
                   for r in rows)


# ---------------------------------------------------------- weighted sample

def test_weighted_sample_biases_toward_heavy_rows(spark):
    from awi_datapipelinepublic_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "w", "id", k=100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r.id < 500)
    # weight ratio 100:1 -> heavy rows dominate the top keys.
    assert heavy >= 90, heavy


def test_weighted_sample_deterministic_and_excludes_nonpositive(spark):
    from awi_datapipelinepublic_spark.operators.sampling import weighted_sample

    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0), (6, 9.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = sorted(r.id for r in weighted_sample(df, "w", "id", k=10).collect())
    b = sorted(r.id for r in weighted_sample(df, "w", "id", k=10).collect())
    assert a == b == [1, 5, 6]  # zero/negative/NULL weights can never draw


# ---------------------------------------------------------------- ewma

def test_ewma_matches_pandas_per_group(spark):
    import pandas as pd
    from awi_datapipelinepublic_spark.operators.timeseries import ewma

    rows = [(k, i, float((i * 37 + k * 11) % 100)) for k in range(3) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, t long, x double")
    got = ewma(df, "k", "t", "x", alpha=0.4, out_col="y").toPandas()
    got = got.sort_values(["k", "t"]).reset_index(drop=True)
    pdf = pd.DataFrame(rows, columns=["k", "t", "x"]).sort_values(["k", "t"])
    expected = pdf.groupby("k")["x"].transform(
        lambda s: s.ewm(alpha=0.4, adjust=False).mean()
    ).reset_index(drop=True)
    assert (got["y"] - expected).abs().max() < 1e-12


def test_ewma_nulls_carry_previous_smoothed_value(spark):
    from awi_datapipelinepublic_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 1, None), (1, 2, 20.0)], "k long, t long, x double"
    )
    out = {r.t: r.y for r in ewma(df, "k", "t", "x", alpha=0.5, out_col="y").collect()}
    assert out[0] == 10.0
    assert out[1] == 10.0          # NULL holds the previous smoothed value
    assert abs(out[2] - 15.0) < 1e-12  # 0.5*20 + 0.5*10


# ---------------------------------------------------------- feature hashing

def test_feature_hash_deterministic_in_range_and_salted(spark):
    from awi_datapipelinepublic_spark.functions.features import (
        feature_hash_index,
        hash_features,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("F",), ("O",), ("P",), (None,)], "status string"
    )
    a = df.select(feature_hash_index("status", 64).alias("i")).collect()
    b = df.select(feature_hash_index("status", 64).alias("i")).collect()
    assert [r.i for r in a] == [r.i for r in b]
    assert all(0 <= r.i < 64 for r in a)
    # same value under different salts must land independently
    s1 = df.select(feature_hash_index("status", 1024, salt="a=").alias("i")).collect()
    s2 = df.select(feature_hash_index("status", 1024, salt="b=").alias("i")).collect()
    assert [r.i for r in s1] != [r.i for r in s2]
    # multi-column form: sorted arrays, stable
    wide = spark.createDataFrame([("F", "1-URGENT")], "s string, p string")
    arr = hash_features(wide, ["s", "p"], dim=256).first().feature_indices
    assert arr == sorted(arr) and len(arr) == 2


# ------------------------------------------------------- unigram LM scoring

def test_unigram_logprob_ranks_common_above_rare(spark):
    from awi_datapipelinepublic_spark.operators.quality import unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the the the the the"),          # all corpus-frequent tokens
            (2, "the quetzalcoatlus vibraphone"),  # mostly singletons
            (3, "the the zzyzx"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert out[1].n_tokens == 5
    # doc of frequent tokens must outscore the rare-token doc
    assert out[1].mean_logprob > out[2].mean_logprob
    # and every logprob is negative (probabilities < 1)
    assert all(r.mean_logprob < 0 for r in out.values())

def test_validate_expectations_rejects_bad_rule_names(spark):
    """Rule names land in a stack() SQL expression — non-identifier
    names, duplicates, the reserved __total alias, and empty rule
    lists must fail fast with a clear error, not a mangled query."""
    import pytest

    df = _toy(spark)
    for bad in ["has'quote", "back`tick", "", "1starts_digit", "__total", None]:
        with pytest.raises(ValueError, match="rule name"):
            validate_expectations(df, [{"name": bad, "kind": "not_null", "column": "id"}])
    with pytest.raises(ValueError, match="duplicate"):
        validate_expectations(
            df,
            [
                {"name": "r1", "kind": "not_null", "column": "id"},
                {"name": "r1", "kind": "not_null", "column": "status"},
            ],
        )
    with pytest.raises(ValueError, match="non-empty"):
        validate_expectations(df, [])


def test_cross_doc_duplicate_spans(spark):
    """Two docs sharing a 4-word phrase get those positions flagged;
    a doc with no cross-doc gram has dup_span_frac 0; a short doc
    contributes its whole text as one span."""
    from awi_datapipelinepublic_spark.operators.quality import cross_doc_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),
            (2, "lazy dogs and the quick brown fox sleep"),
            (3, "completely unrelated words entirely here now"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cross_doc_duplicate_spans(docs, n=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc1: 3 spans, of which "the quick brown fox" + "quick brown fox jumps"?
    # only "the quick brown fox" also appears in doc2 -> 1 dup span.
    assert out[1].n_spans == 3 and out[1].n_dup_spans == 1
    assert out[2].n_dup_spans == 1
    assert out[3].n_dup_spans == 0 and out[3].dup_span_frac == 0.0
    # short doc: whole text is its single span, shared with nobody
    assert out[4].n_spans == 1 and out[4].n_dup_spans == 0


def test_mixture_resample_proportions_and_determinism(spark):
    """Kept counts track the target mixture; absent categories drop;
    oversubscribed categories saturate at keep-all; the kept id set
    is identical across invocations (hash-deterministic)."""
    from awi_datapipelinepublic_spark.operators.sampling import mixture_resample

    rows = [(i, "a") for i in range(1000)] + [(1000 + i, "b") for i in range(1000)]
    rows += [(2000 + i, "rare") for i in range(5)] + [(3000 + i, "drop") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, cat string")
    out = mixture_resample(df, "cat", "id", {"a": 0.5, "b": 0.25, "rare": 0.25}, 400)
    kept = out.groupBy("cat").count().collect()
    by_cat = {r.cat: r["count"] for r in kept}
    assert "drop" not in by_cat
    # targets: a=200/1000 (20%), b=100/1000 (10%), rare=100/5 -> saturate at 5
    assert abs(by_cat["a"] - 200) < 60
    assert abs(by_cat["b"] - 100) < 45
    assert by_cat["rare"] == 5
    ids1 = sorted(r.id for r in out.select("id").collect())
    ids2 = sorted(
        r.id
        for r in mixture_resample(
            df, "cat", "id", {"a": 0.5, "b": 0.25, "rare": 0.25}, 400
        ).select("id").collect()
    )
    assert ids1 == ids2


def test_auto_code_length_holds_bucket_size_constant():
    """The auto-sized LSH code length must add ~1 bit per corpus
    doubling (constant expected bucket size ⇒ linear pair count) and
    clamp to [4, 24]."""
    from awi_datapipelinepublic_spark.operators.similarity import auto_code_length

    assert auto_code_length(100) == 4          # clamp floor
    assert auto_code_length(2_000) == 6        # sf0.1 regime (matches round-2 h)
    assert auto_code_length(20_000) == 10      # sf1: +~3 bits for 10x rows
    assert auto_code_length(20_000_000) == 20
    assert auto_code_length(10**12) == 24      # clamp ceiling
    for n in (1_000, 2_000, 4_000, 8_000):
        assert auto_code_length(2 * n) - auto_code_length(n) == 1


def test_recall_floors_hold_across_scales(spark):
    """Quality side of the auto-granularity defaults (the runtime side
    is BASELINE.md's sf0.1→sf1 sweep): auto code length h and auto
    cluster count k GROW with the corpus, and recall must not silently
    collapse as they do. Planted-structure corpora at 2k and 20k
    vectors (the sf0.1 / sf1 sizes; auto-h goes 6 → 10 bits between
    them, auto-k 31 → 312) must both clear the same floors:

    - knn_join_lsh (auto-h, multiprobe 1) ≥ 0.8 recall of the exact
      top-5 neighbor pairs
    - semantic_dedup (auto-k) finds ≥ 0.95 of the true cosine≥0.95
      victim set and invents NONE (every victim it names is a true
      near-dup — SemDeDup may only miss cross-cluster dups, never
      create false ones)

    The driver-data numbers (tools/recall_sweep.py, BASELINE.md
    "Recall sweep") complement this: sf0.1's embeddings contain zero
    true near-dups, so only planted structure can pin a meaningful
    floor at that size.
    """
    from awi_datapipelinepublic_spark.operators.dedup import semantic_dedup
    from awi_datapipelinepublic_spark.operators.similarity import (
        knn_join_brute,
        knn_join_lsh,
    )

    for n_clusters in (200, 2000):
        emb = _clustered_emb(spark, n_clusters=n_clusters, per_cluster=10)
        n = n_clusters * 10

        bf = {(r["a_id"], r["b_id"])
              for r in knn_join_brute(emb, k=5).select("a_id", "b_id").collect()}
        ap = {(r["a_id"], r["b_id"])
              for r in knn_join_lsh(emb, dim=64, k=5, multiprobe_bits=1)
              .select("a_id", "b_id").collect()}
        recall = len(bf & ap) / len(bf)
        assert recall >= 0.8, (n, recall)

        # the IVF twin (hash-verified in the driver gate) must clear
        # the same floor: a tight cluster's members share an IVF cell
        # whenever they share a nearest centroid, which the auto-k
        # sizing (~6 true clusters per cell here) makes the norm
        from awi_datapipelinepublic_spark.operators.similarity import knn_join_ivf

        iv = {(r["a_id"], r["b_id"])
              for r in knn_join_ivf(emb, k=5).select("a_id", "b_id").collect()}
        ivf_recall = len(bf & iv) / len(bf)
        assert ivf_recall >= 0.8, (n, ivf_recall)

        # true victims: everyone but the min id of each tight cluster
        # (in-cluster cosine ≈ 1; cross-cluster centers are random
        # 64-d directions, far below 0.95)
        truth = {r["vec_id"] for r in emb.groupBy("cluster")
                 .agg(F.min("vec_id").alias("keep"))
                 .join(emb, "cluster").filter(F.col("vec_id") != F.col("keep"))
                 .select("vec_id").collect()}
        surv = {r["vec_id"] for r in semantic_dedup(emb, threshold=0.95).collect()}
        victims = set(range(n)) - surv
        assert len(truth & victims) / len(truth) >= 0.95, (n, len(truth & victims) / len(truth))
        assert not (victims - truth), (n, sorted(victims - truth)[:5])


def test_kmeans_recovers_planted_clusters(spark):
    """Spherical k-means with k matching the planted cluster count
    must reach perfect purity: every planted cluster maps to exactly
    one k-means cluster (the modulo-step init seeds one vector per
    planted cluster here, so 3 iterations converge exactly)."""
    from awi_datapipelinepublic_spark.operators.similarity import kmeans_assign

    emb = _clustered_emb(spark, n_clusters=8, per_cluster=10)
    got = kmeans_assign(emb, n_clusters=8, iters=3)
    rows = got.alias("g").join(
        emb.select("vec_id", F.col("cluster").alias("planted")), "vec_id"
    ).collect()
    by_planted = {}
    for r in rows:
        by_planted.setdefault(r["planted"], set()).add(r["cluster"])
    assert len(rows) == 80
    assert all(len(s) == 1 for s in by_planted.values()), by_planted
    assert len({next(iter(s)) for s in by_planted.values()}) == 8


def test_embedding_outliers_finds_planted_junk(spark):
    """A vector orthogonal-ish to every tight cluster must surface at
    the head of the outlier ranking; in-cluster members score near 1
    and stay out of a small bottom-k."""
    from awi_datapipelinepublic_spark.operators.similarity import embedding_outliers

    emb = _clustered_emb(spark, n_clusters=8, per_cluster=10)
    rng = np.random.default_rng(99)
    junk = [float(x) for x in rng.standard_normal(64)]
    poisoned = emb.unionByName(
        spark.createDataFrame([(999, -1, junk)], emb.schema)
    )
    out = embedding_outliers(poisoned, n_clusters=8, iters=3, bottom_k=5).collect()
    assert out[0]["vec_id"] == 999
    # tight-cluster members score essentially 1.0 against their centroid
    assert out[0]["centroid_cos"] < 0.9


def test_k_anonymity_flags_small_groups(spark):
    from awi_datapipelinepublic_spark.functions.privacy import k_anonymity

    rows = [("us", "a", 1.0)] * 5 + [("us", "b", 2.0), ("us", "b", 3.0)] + [("de", "a", 4.0)]
    df = spark.createDataFrame(rows, ["country", "seg", "salary"])
    got = {
        (r["country"], r["seg"]): r
        for r in k_anonymity(df, ["country", "seg"], k=3, sensitive_col="salary").collect()
    }
    assert got[("us", "a")]["n_rows"] == 5 and got[("us", "a")]["at_risk"] == 0
    # 5 identical salaries: k-anonymous but l-diversity 1 (value leaks)
    assert got[("us", "a")]["l_diversity"] == 1
    assert got[("us", "b")]["n_rows"] == 2 and got[("us", "b")]["at_risk"] == 1
    assert got[("us", "b")]["l_diversity"] == 2
    assert got[("de", "a")]["at_risk"] == 1
    # INT 0/1 flag, not BOOLEAN (canonicalization-proof contract)
    assert dict(k_anonymity(df, ["country"], k=3).dtypes)["at_risk"] == "int"


def test_char_entropy_hand_values(spark):
    from awi_datapipelinepublic_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [("aaaa",), ("ab",), ("abcd",), ("",), ("banana",)], ["t"]
    )
    got = [r[0] for r in df.select(F.round(char_entropy("t"), 9)).collect()]
    # H(aaaa)=0; H(ab)=1 bit; H(abcd)=2 bits; empty -> 0;
    # banana: p(a)=1/2, p(b)=1/6, p(n)=1/3 -> 1.459147917 bits
    assert got[0] == 0.0
    assert got[1] == 1.0
    assert got[2] == 2.0
    assert got[3] == 0.0
    assert abs(got[4] - 1.459147917) < 1e-8


def test_doc_entropy_matches_expression_form(spark, sf_dir):
    """doc_entropy (explode + map-side-combine hot path) must replay
    char_entropy's float fold to the last ulp — same sorted-char
    accumulation order, same int/int double divisions — including on
    empty text (kept via explode_outer, entropy 0.0)."""
    from awi_datapipelinepublic_spark.functions.text import char_entropy, doc_entropy

    hand = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, ""), (3, "banana"), (4, "  ")],
        ["doc_id", "text"],
    )
    fast = {r["doc_id"]: r["entropy"] for r in doc_entropy(hand, ["doc_id"]).collect()}
    slow = {
        r["doc_id"]: r["e"]
        for r in hand.select("doc_id", char_entropy("text").alias("e")).collect()
    }
    assert fast == slow  # exact float equality, not approx
    assert fast[2] == 0.0 and len(fast) == 5
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    fast = {r["doc_id"]: r["entropy"] for r in doc_entropy(docs, ["doc_id"]).collect()}
    slow = {
        r["doc_id"]: r["e"]
        for r in docs.select("doc_id", char_entropy("text").alias("e")).collect()
    }
    assert fast == slow


def test_pq_codes_deterministic_and_bounded(spark, sf_dir):
    from awi_datapipelinepublic_spark.operators.similarity import pq_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {r["vec_id"]: list(r["codes"]) for r in pq_assign(emb, dim=64).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in pq_assign(emb, dim=64).collect()}
    assert a == b
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c) for c in a.values())


def test_pq_adc_recall_floor(spark, sf_dir):
    """Pin ADC shortlist recall (the production pattern: PQ shortlist
    -> exact rerank). The data-derived codebook must put most exact
    top-10 neighbors in the top-100 shortlist; the md5 contract
    codebook (uniform on the cube, built for verifiability not recall)
    gets a weaker floor. Measured at sf0.001: 7/10 and 3/10."""
    from awi_datapipelinepublic_spark.operators.similarity import (
        knn_brute_force,
        knn_pq,
        pq_codebook_from_sample,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = {r["vec_id"] for r in knn_brute_force(emb, qv, k=10).collect()}
    cb = pq_codebook_from_sample(emb, dim=64)
    trained = {r["vec_id"] for r in knn_pq(emb, qv, dim=64, k=100, codebook=cb).collect()}
    assert len(exact & trained) >= 5, (exact, trained)
    contract = {r["vec_id"] for r in knn_pq(emb, qv, dim=64, k=100).collect()}
    assert len(exact & contract) >= 2, (exact, contract)


def test_pq_accepts_trained_codebook(spark, sf_dir):
    """The codebook parameter is the production seam: per-subvector
    centroids (e.g. from kmeans over a sample) flow through the same
    encode/ADC path as the md5 contract codebook."""
    from awi_datapipelinepublic_spark.operators.similarity import knn_pq, pq_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    rng = np.random.default_rng(7)
    cb = rng.standard_normal((4, 16, 16))
    codes = pq_assign(emb, dim=64, codebook=cb).collect()
    assert all(0 <= x < 16 for r in codes for x in r["codes"])
    qv = [float(x) for x in emb.collect()[0]["embedding"]]
    got = knn_pq(emb, qv, dim=64, k=5, codebook=cb).collect()
    assert len(got) == 5 and list(got[0].asDict()) == ["vec_id", "adc_dist"]


def test_zorder_audit_partitions_all_rows(spark, sf_dir):
    import __spark_entry__ as E

    out = E.q_zorder_layout(spark, sf_dir)
    rows = out.collect()
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_rows"] for r in rows) == total
    assert all(0 <= r["bucket"] < 64 for r in rows)
    # z-bucketing localizes BOTH dims: average bucket span well under
    # the global span on each dimension
    ck_span = max(r["ck_max"] for r in rows) - min(r["ck_min"] for r in rows)
    avg_ck = sum(r["ck_max"] - r["ck_min"] for r in rows) / len(rows)
    assert avg_ck < 0.6 * ck_span


def test_triangle_count_known_graphs(spark):
    from awi_datapipelinepublic_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = spark.createDataFrame(k4 + [(10, 11)], ["src", "dst"])
    r = triangle_count(g).collect()[0]
    # K4: 6 edges, 4*C(3,2)=12 wedges, 4 triangles; isolated edge adds 1 edge
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (7, 12, 4)
    path = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    r = triangle_count(path).collect()[0]
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (2, 1, 0)
    # duplicate + reversed + self edges collapse to the simple graph
    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 0), (1, 2), (2, 0), (2, 0)], ["src", "dst"]
    )
    r = triangle_count(messy).collect()[0]
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)


def test_triangle_count_hub_graph_stays_bounded(spark):
    """Degree orientation makes a star hub emit ZERO oriented wedges
    (every edge points AT the hub, each leaf's out-degree is 1) — the
    naive id-orientation would join 2000 hub edges into ~2M wedge
    rows. The census still reports the true C(2000,2) wedge count
    from the degree table."""
    from awi_datapipelinepublic_spark.operators.graph import triangle_count

    star = spark.range(1, 2001).selectExpr("id AS src", "CAST(0 AS LONG) AS dst")
    r = triangle_count(star).collect()[0]
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 2000 * 1999 // 2


def test_dp_noisy_count_properties(spark):
    from awi_datapipelinepublic_spark.functions.privacy import dp_noisy_count

    rows = [(i, f"g{i % 200}") for i in range(4000)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = {r["grp"]: r["noisy_count"] for r in dp_noisy_count(df, ["grp"]).collect()}
    again = {r["grp"]: r["noisy_count"] for r in dp_noisy_count(df, ["grp"]).collect()}
    assert out == again  # seeded release is replayable
    noises = [out[g] - 20.0 for g in out]  # every group holds exactly 20 rows
    assert abs(sum(noises) / len(noises)) < 0.5  # Laplace(1) mean ~0
    assert sum(1 for n in noises if abs(n) > 5.0) / len(noises) < 0.05  # e^-5 tail
    # epsilon scaling: eps=0.1 noise is ~10x wider
    wide = {
        r["grp"]: r["noisy_count"]
        for r in dp_noisy_count(df, ["grp"], epsilon=0.1).collect()
    }
    assert sum(abs(wide[g] - 20.0) for g in wide) > 5 * sum(abs(n) for n in noises)
    # a different seed draws different noise
    other = {
        r["grp"]: r["noisy_count"]
        for r in dp_noisy_count(df, ["grp"], seed=7).collect()
    }
    assert other != out


def test_vocab_build_ids_deterministic_and_filtered(spark):
    from awi_datapipelinepublic_spark.operators.corpus import vocab_build

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat"),
            (2, "THE cat  ran"),
        ],
        ["doc_id", "text"],
    )
    out = {r["term"]: r for r in vocab_build(docs, min_count=2).collect()}
    # 'the' freq 4 across 3 docs (case-folded), 'cat'/'sat' freq 2
    assert out["the"]["token_id"] == 0
    assert (out["the"]["freq"], out["the"]["doc_freq"]) == (4, 3)
    assert set(out) == {"the", "cat", "sat"}
    # freq ties break by term asc: cat(2) before sat(2)
    assert out["cat"]["token_id"] == 1 and out["sat"]["token_id"] == 2
    # max_size truncates the id-ordered head
    top2 = vocab_build(docs, min_count=2, max_size=2).collect()
    assert sorted(r["term"] for r in top2) == ["cat", "the"]


def test_bigram_lm_hand_values(spark):
    from awi_datapipelinepublic_spark.operators.corpus import bigram_lm

    docs = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "a b"), (2, "x")], ["doc_id", "text"]
    )
    out = {(r["w1"], r["w2"]): r for r in bigram_lm(docs, min_count=1).collect()}
    # pairs: doc0 -> ab ba ab ba ac, doc1 -> ab; single-token doc2 emits none
    assert out[("a", "b")]["pair_count"] == 3
    # context 'a' total = 4 (ab x3 + ac) -> P(b|a)=0.75, P(c|a)=0.25
    assert out[("a", "b")]["cond_p"] == 0.75
    assert out[("a", "c")]["cond_p"] == 0.25
    assert out[("b", "a")]["cond_p"] == 1.0
    assert ("x", "x") not in out and not any(w1 == "x" for (w1, _) in out)
    # top_per_context keeps the most probable continuation only
    top1 = {
        (r["w1"], r["w2"])
        for r in bigram_lm(docs, min_count=1, top_per_context=1).collect()
    }
    assert top1 == {("a", "b"), ("b", "a")}


def test_knn_ivfpq_deterministic_and_self_retrieving(spark, sf_dir):
    from awi_datapipelinepublic_spark.operators.similarity import knn_ivfpq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    a = [(r["vec_id"], r["adc_dist"]) for r in knn_ivfpq(emb, qv, dim=64, k=10).collect()]
    b = [(r["vec_id"], r["adc_dist"]) for r in knn_ivfpq(emb, qv, dim=64, k=10).collect()]
    assert a == b
    # the query vector sits in a probed cluster and its own codes hit
    # the per-slot minima of that cluster's ADC table
    assert 0 in {v for v, _ in a}
    assert all(d >= 0 for _, d in a)


def test_knn_ivfpq_shortlist_recall_floor(spark, sf_dir):
    """PQ shortlist -> exact rerank is the production pattern; the
    IVF-PQ top-100 shortlist must retain a usable share of the exact
    top-10 (bounded below the IVF-only probe set, which caps recall
    at whatever the 4/16 probed clusters contain)."""
    from awi_datapipelinepublic_spark.operators.similarity import (
        knn_brute_force,
        knn_ivf,
        knn_ivfpq,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = {r["vec_id"] for r in knn_brute_force(emb, qv, k=10).collect()}
    ivf_reachable = {r["vec_id"] for r in knn_ivf(emb, qv, k=10_000).collect()}
    shortlist = {r["vec_id"] for r in knn_ivfpq(emb, qv, dim=64, k=100).collect()}
    reachable = exact & ivf_reachable
    assert len(reachable) >= 5  # probes cover most of the true neighbors
    assert len(shortlist & reachable) >= len(reachable) // 2, (
        reachable,
        shortlist & reachable,
    )


def test_gopher_rules_hand_values(spark):
    """Each Gopher rule flips on a crafted defect while the clean doc
    passes; verdict is INT 0/1 (canonicalization-proof contract)."""
    from awi_datapipelinepublic_spark.functions.text import gopher_rules

    clean = (
        "the yellow submarine sailed across the ocean with a crew "
        "that was singing for an entire evening in their cabin"
    )
    docs = [
        (0, clean),                                   # passes
        (1, "the cat sat"),                           # too few words
        (2, clean + " ## ## ## ##"),                  # symbol ratio
        (3, clean + " " + "x" * 300),                 # mean word length
        (4, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20"),  # alpha + stopwords
        (5, ""),                                      # empty
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    r = gopher_rules(F.col("text"), min_words=10)
    got = {
        row["doc_id"]: row.asDict()
        for row in df.select(
            "doc_id",
            *[v.alias(k) for k, v in r.items()],
        ).collect()
    }
    assert got[0]["passes"] == 1
    assert got[1]["passes"] == 0 and got[1]["n_words"] == 3
    assert got[2]["passes"] == 0 and got[2]["symbol_ratio"] > 0.1
    assert got[3]["passes"] == 0 and got[3]["mean_word_len"] > 10.0
    assert got[4]["passes"] == 0 and got[4]["alpha_ratio"] == 0.0
    assert got[5]["passes"] == 0 and got[5]["n_words"] == 0
    # mean length is arithmetic: clean doc = (len - n + 1) / n
    n = len(clean.split())
    assert abs(got[0]["mean_word_len"] - (len(clean) - n + 1) / n) < 1e-12
    dtypes = dict(
        df.select(*[v.alias(k) for k, v in r.items()]).dtypes
    )
    assert dtypes["passes"] == "int"
    assert dtypes["n_words"] == "bigint" and dtypes["n_stopwords"] == "bigint"


def test_curate_corpus_filters_and_dedups(spark):
    """lang filter, gopher filter, and exact dedup all bite; the
    dedup winner is the min doc_id per fingerprint."""
    from awi_datapipelinepublic_spark.operators.quality import curate_corpus

    good = (
        "the yellow submarine sailed across the ocean with a crew "
        "that was singing for an entire evening in their cabin"
    )
    docs = [
        (10, good),
        (11, good),                       # exact duplicate -> dropped (10 wins)
        (12, good.upper()),               # case-dup of 10 -> dropped too
        (13, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece catorce quince dieciseis diecisiete dieciocho diecinueve veinte"),  # not 'en'
        (14, "the cat sat"),              # fails word-count floor
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = curate_corpus(df, min_words=10).collect()
    assert [r["doc_id"] for r in out] == [10]
    assert out[0]["n_words"] == len(good.split())


def test_pair_retrieval_metrics_hand_values(spark):
    """P/R/F1 against hand-counted pair sets; duplicate input pairs
    must not inflate counts (distinct contract)."""
    from awi_datapipelinepublic_spark.operators.quality import pair_retrieval_metrics

    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (1, 2)], ["id_a", "id_b"]
    )
    gold = spark.createDataFrame([(1, 2), (2, 3), (6, 7)], ["id_a", "id_b"])
    row = pair_retrieval_metrics(cand, gold).collect()[0]
    assert row["n_candidates"] == 4 and row["n_gold"] == 3 and row["n_hits"] == 2
    assert row["prec"] == 0.5
    assert abs(row["rec"] - 2 / 3) < 1e-6
    p, r = 0.5, 2 / 3
    assert abs(row["f1"] - 2 * p * r / (p + r)) < 1e-6
    # empty candidate set: all-zero metrics, no div-by-zero
    empty = pair_retrieval_metrics(cand.filter("id_a > 99"), gold).collect()[0]
    assert empty["n_candidates"] == 0 and empty["prec"] == 0.0 and empty["f1"] == 0.0


def test_lang_id_scores_hand_values(spark):
    """Per-language ratios and deterministic argmax; strict-> fold
    keeps 'unknown' at the exact threshold and earlier language on
    exact score ties."""
    from awi_datapipelinepublic_spark.functions.text import lang_id_scores

    docs = [
        (0, "the cat and the dog sat on it"),
        (1, "der hund und die katze ist ein tier"),
        (2, "le chien et la chatte est un animal"),
        (3, "zzz qqq xxx www"),          # nothing clears threshold
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    s = lang_id_scores(F.col("text"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[v.alias(k) for k, v in s.items()]).collect()
    }
    assert got[0]["lang_pred"] == "en" and got[0]["score_en"] > 0.3
    assert got[1]["lang_pred"] == "de" and got[1]["score_de"] > 0.5
    assert got[2]["lang_pred"] == "fr" and got[2]["score_fr"] > 0.5
    assert got[3]["lang_pred"] == "unknown"
    assert got[4]["lang_pred"] == "unknown" and got[4]["score_en"] == 0.0


def test_dedup_cluster_stats_hand_values(spark):
    from awi_datapipelinepublic_spark.operators.dedup import dedup_cluster_stats

    df = spark.createDataFrame(
        [(0, "aa bb"), (1, "aa  BB"), (2, "cc"), (3, "dd"), (4, "cc")],
        ["doc_id", "text"],
    )
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
           for r in dedup_cluster_stats(df).collect()}
    # "aa bb"≡"aa  BB" (normalize), "cc"×2 → two 2-clusters; "dd" singleton
    assert got == {2: (2, 4), 1: (1, 1)}


def test_minhash_xxhash64_fast_family(spark):
    """The production hash family: exact duplicates still share every
    band (identical shingles → identical signature regardless of
    family), signatures genuinely differ from the md5 family, and the
    32-bit range contract holds (affine overflow safety)."""
    from awi_datapipelinepublic_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [(0, base), (1, base), (2, "completely different words entirely here now")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(df, k=3, hash_family="xxhash64").collect()
    }
    assert (0, 1) in pairs and (0, 2) not in pairs
    sig_md5 = minhash_signature(df, k=3).collect()
    sig_xx = minhash_signature(df, k=3, hash_family="xxhash64").collect()
    md5_map = {r["doc_id"]: r["signature"] for r in sig_md5}
    xx_map = {r["doc_id"]: r["signature"] for r in sig_xx}
    assert md5_map[0] != xx_map[0]          # the family actually switched
    assert xx_map[0] == xx_map[1]           # exact dups identical
    assert all(0 <= v < (1 << 61) - 1 for v in xx_map[0])
    import pytest as _pt

    with _pt.raises(ValueError):
        minhash_signature(df, hash_family="fnv")


def test_bigram_logprob_hand_values(spark):
    """Hand-computed corpus bigram model: doc 0 = 'a b a b' and
    doc 1 = 'a b c'. Pairs: (a b)x3, (b a)x1, (b c)x1; contexts:
    a->3, b->2."""
    import math

    from awi_datapipelinepublic_spark.operators.quality import bigram_logprob

    df = spark.createDataFrame([(0, "a b a b"), (1, "a b c"), (2, "x")],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    # doc 0 pairs: ab, ba, ab -> lp = ln(3/3), ln(1/2), ln(3/3)
    exp0 = (math.log(1.0) + math.log(0.5) + math.log(1.0)) / 3
    assert abs(got[0]["mean_logprob"] - round(exp0, 6)) < 1e-9
    assert got[0]["n_bigrams"] == 3
    # doc 1 pairs: ab, bc -> ln(3/3), ln(1/2)
    exp1 = (math.log(1.0) + math.log(0.5)) / 2
    assert abs(got[1]["mean_logprob"] - round(exp1, 6)) < 1e-9
    # single-token doc emits no pairs
    assert 2 not in got


def test_population_stability_hand_values(spark):
    """Identical snapshots score ~0; a hard categorical shift scores
    past the 0.25 retrain threshold; one-sided buckets stay finite."""
    from awi_datapipelinepublic_spark.operators.quality import population_stability

    a = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, ["b"])
    same = population_stability(a, a, "b").collect()[0]
    assert same["n_buckets"] == 2 and abs(same["psi"]) < 1e-9
    b = spark.createDataFrame([("x",)] * 90 + [("z",)] * 10, ["b"])
    shifted = population_stability(a, b, "b").collect()[0]
    assert shifted["n_buckets"] == 3 and shifted["psi"] > 0.25


def test_kcore_hand_values(spark):
    """4-clique + pendant chain: the 3-core is exactly the clique
    (degree 3 each); pendants peel away in round one."""
    from awi_datapipelinepublic_spark.operators.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r["node"]: r["core_degree"] for r in kcore(edges, k=3, iterations=4).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above the max degree -> empty core
    assert kcore(edges, k=5, iterations=3).count() == 0
