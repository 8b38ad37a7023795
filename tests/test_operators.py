"""Operator tests: scalable global row number, dedup recall/locality,
ANN recall, event sessionization edge cases."""

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_candidates,
)
from awi_datapipelinepublic_spark.operators.similarity import knn_brute_force, knn_lsh
from awi_datapipelinepublic_spark.operators.windows import global_row_number, row_number_global
from awi_datapipelinepublic_spark.sources.readers import read_events, read_table


def test_global_row_number_matches_single_partition_form(spark):
    df = spark.range(0, 5000).select((F.col("id") * 7919 % 5000).alias("k"))
    a = {r["k"]: r["Id"] for r in global_row_number(df, [F.col("k")]).collect()}
    b = {r["k"]: r["Id"] for r in row_number_global(df, [F.col("k")]).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 5001))


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    """Every pair with true jaccard ≥ 0.8 must appear among LSH candidates
    (32 hashes / 8 bands ⇒ s-curve threshold ≈ (1/8)^(1/4) ≈ 0.6)."""
    docs = read_table(spark, sf_dir, "documents")
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.8).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, num_hashes=32, bands=8, k=3).collect()
    }
    assert truth, "fixture should contain at least one high-jaccard pair"
    missed = truth - cands
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_deterministic_and_local(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (3, "completely unrelated text about database query optimization and shuffles"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    out2 = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert out == out2

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(out[1], out[2]) < hamming(out[1], out[3])


def test_knn_lsh_recall(spark, sf_dir):
    """LSH ANN (2-bit multiprobe) vs exact top-10.

    The synthetic embeddings are near-uniform on the sphere, so angular
    LSH has little concentration to exploit — recall ≈ 0.5 while
    scanning only ~14% of the corpus (37/256 buckets). On real
    embedding distributions (clustered) recall is far higher; the
    assertions here pin the structural properties: the query's own
    vector is always found, candidates are genuinely pruned, and recall
    beats the scanned fraction by a wide margin (i.e. the buckets are
    informative, not random)."""
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in knn_brute_force(emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in knn_lsh(emb, qv, dim=64, k=10, h=8).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert 0 in approx, "self-vector must be in its own bucket"
    assert recall >= 0.4, f"LSH recall too low: {recall} (exact={exact}, approx={approx})"
    from awi_datapipelinepublic_spark.operators.similarity import lsh_bucket
    n_buckets = lsh_bucket(emb, dim=64, h=8).select("bucket").distinct().count()
    assert n_buckets > 32, f"bucketing degenerate: {n_buckets} buckets for {n} vectors"


def test_simhash_hamming_ball_recall(spark, sf_dir):
    """Every pair with jaccard ≥ 0.9 must fall inside the hamming-8
    candidate set (pigeonhole banding guarantees no candidate is
    missed; the jaccard→hamming relationship is the empirical part)."""
    docs = read_table(spark, sf_dir, "documents")
    truth = {
        (r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, k=3, threshold=0.9).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup_candidates(docs, max_hamming=8).collect()
    }
    assert truth, "fixture should contain high-jaccard pairs"
    missed = truth - cands
    assert not missed, f"simhash banding missed near-dup pairs: {missed}"
    # every candidate's hamming bound must actually hold
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    for r in simhash_near_dup_candidates(docs, max_hamming=8).collect():
        h = bin((fps[r["id_a"]] ^ fps[r["id_b"]]) & ((1 << 64) - 1)).count("1")
        assert h == r["hamming"] and h <= 8


def test_knn_ivf_recall(spark, sf_dir):
    """IVF with nprobe=4/16 scans ~25% of the corpus; on near-uniform
    synthetic embeddings recall tracks the scanned fraction plus
    concentration gain. Structural assertions: self-hit, genuine
    pruning, recall above the random-scan baseline."""
    from awi_datapipelinepublic_spark.operators.similarity import ivf_assign, knn_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in knn_brute_force(emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in knn_ivf(emb, qv, k=10).collect()]
    assert 0 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4, f"IVF recall {recall} (exact={exact}, approx={approx})"
    assigned, centroids = ivf_assign(emb)
    assert len(centroids) == 16
    n_clusters_used = assigned.select("cluster").distinct().count()
    assert n_clusters_used >= 8, f"degenerate clustering: {n_clusters_used} clusters"


def test_read_events_nanos(spark, sf_dir):
    df = read_events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_connected_components_matches_union_find(spark):
    """Random graphs: Spark hash-min propagation must agree with a
    driver-side union-find on every node's component representative."""
    import numpy as np

    from awi_datapipelinepublic_spark.operators.graph import connected_components

    rng = np.random.default_rng(7)
    n_nodes, n_edges = 300, 260
    e = rng.integers(0, n_nodes, size=(n_edges, 2)).tolist()

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in e:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical rep = min node id in component
    comp_of = {}
    for x in range(n_nodes):
        comp_of.setdefault(find(x), []).append(x)
    want = {x: min(members) for members in comp_of.values() for x in members}

    edges = spark.createDataFrame([(int(a), int(b)) for a, b in e], "src long, dst long")
    touched = {int(a) for a, _ in e} | {int(b) for _, b in e}
    expect = {x: want[x] for x in touched}
    # both execution paths must agree with the reference union-find
    fast = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    dist = {
        r["node"]: r["component"]
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert fast == expect
    assert dist == expect


def test_dedup_clusters_are_transitive(spark):
    """A≈B and B≈C must land A, B, C in one cluster with canonical
    min-id — the property pairwise dedup alone cannot give."""
    from awi_datapipelinepublic_spark.operators.graph import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21), (30, 30)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["canonical_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 5: 1, 9: 1, 20: 20, 21: 20, 30: 30}


def test_near_dedup_survivors_are_cluster_minima(spark, sf_dir):
    """Pipeline invariant: survivors = corpus minus non-canonical
    cluster members; every LSH cluster keeps exactly its min id."""
    from awi_datapipelinepublic_spark.operators.dedup import (
        minhash_lsh_candidates,
        near_dedup_keep_canonical,
    )
    from awi_datapipelinepublic_spark.operators.graph import dedup_clusters

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    all_ids = {r["doc_id"] for r in d.select("doc_id").collect()}
    survivors = {r["doc_id"] for r in near_dedup_keep_canonical(d).collect()}
    clusters = dedup_clusters(minhash_lsh_candidates(d), "id_a", "id_b").collect()
    by_comp = {}
    for r in clusters:
        by_comp.setdefault(r["canonical_id"], set()).add(r["doc_id"])
    victims = set()
    for canon, members in by_comp.items():
        assert canon == min(members)
        assert canon in survivors
        victims |= members - {canon}
    assert survivors == all_ids - victims
    assert victims, "corpus should contain planted near-dups"


def test_segment_exact_dedup_first_occurrence_and_reassembly(spark):
    from awi_datapipelinepublic_spark.operators.dedup import segment_exact_dedup

    # span_words=2 → doc 1: [a b][c d][a b] (3rd segment repeats 1st);
    # doc 2 starts with the same [a b] and has one unique segment.
    df = spark.createDataFrame(
        [(1, "a b c d a b"), (2, "a b x y"), (3, "x y")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["text"] for r in segment_exact_dedup(df, span_words=2).collect()}
    # doc 1 keeps its first [a b] and [c d]; its own repeat is dropped.
    assert out[1] == "a b c d"
    # doc 2 loses [a b] (doc 1 owns it) and [x y] survives.
    assert out[2] == "x y"
    # doc 3's [x y] was first claimed by doc 2 → zero survivors → row absent.
    assert 3 not in out


def test_segment_exact_dedup_paragraph_mode(spark):
    from awi_datapipelinepublic_spark.operators.dedup import segment_exact_dedup

    df = spark.createDataFrame(
        [(1, "intro\n\nbody text\n\nintro"), (2, "body text\n\nunique tail")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in segment_exact_dedup(
            df, sep_pattern=r"\n\n", join_sep="\n\n"
        ).collect()
    }
    assert out[1] == "intro\n\nbody text"
    assert out[2] == "unique tail"


def test_sequence_pack_block_budget_and_reassembly(spark):
    from awi_datapipelinepublic_spark.operators.corpus import sequence_pack

    # 5 docs × 3 tokens, budget 6 → blocks of exactly 2 docs (last block 1).
    df = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c") for i in range(5)], ["doc_id", "text"]
    )
    rows = sorted(sequence_pack(df, block_tokens=6).collect(), key=lambda r: r["block_id"])
    assert [r["block_id"] for r in rows] == [0, 1, 2]
    assert [r["n_docs"] for r in rows] == [2, 2, 1]
    assert rows[0]["text"] == "w0a w0b w0c w1a w1b w1c"
    assert rows[0]["doc_ids"] == [0, 1]
    # every block within budget
    assert all(r["n_tokens"] <= 6 for r in rows)


def test_sequence_pack_oversized_doc_lands_in_one_block(spark):
    from awi_datapipelinepublic_spark.operators.corpus import sequence_pack

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")], ["doc_id", "text"]
    )
    rows = {r["block_id"]: r for r in sequence_pack(df, block_tokens=4).collect()}
    # doc 1 (10 tokens > budget 4) is emitted whole in the block its
    # span ends in (block 2); doc 2's span also ends inside block 2's
    # budget window, so it packs alongside — exactly one block.
    assert list(rows) == [2]
    assert rows[2]["doc_ids"] == [1, 2]
    assert rows[2]["n_tokens"] == 12


def test_balanced_sample_sizes_and_determinism(spark):
    from awi_datapipelinepublic_spark.operators.sampling import balanced_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)], ["id", "grp"]
    )
    out1 = balanced_sample(df, "grp", "id", 25).collect()
    out2 = balanced_sample(df, "grp", "id", 25).collect()
    assert sorted(r["id"] for r in out1) == sorted(r["id"] for r in out2)
    by_grp = {}
    for r in out1:
        by_grp.setdefault(r["grp"], []).append(r["id"])
    assert len(by_grp["big"]) == 25
    assert len(by_grp["small"]) == 25


def test_inverted_index_postings_and_cap(spark):
    from awi_datapipelinepublic_spark.operators.corpus import inverted_index

    df = spark.createDataFrame(
        [(3, "x y"), (1, "x x z"), (2, "x")], ["doc_id", "text"]
    )
    idx = {r["term"]: r for r in inverted_index(df).collect()}
    assert idx["x"]["postings"] == [1, 2, 3]        # sorted, distinct-per-doc
    assert idx["x"]["doc_freq"] == 3                 # doc freq, not term freq
    assert idx["z"]["postings"] == [1]
    capped = {r["term"]: r for r in inverted_index(df, max_postings=2).collect()}
    assert capped["x"]["postings"] == [1, 2]         # capped list
    assert capped["x"]["doc_freq"] == 3              # df stays exact


def test_bm25_ranks_matching_docs(spark):
    from awi_datapipelinepublic_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "cat dog cat dog cat"),     # many common-term hits
            (2, "cat penguin"),             # one common + one rare term
            (3, "dog"),                     # single hit, short doc
            (4, "fish fish fish"),          # no query terms → excluded
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, ["cat", "penguin"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 4 not in ids and 3 not in ids
    # 'penguin' appears in 1/3 docs with tokens → higher idf than 'cat'
    # (2/3 docs); doc 2 matching the rare term outranks tf-heavy doc 1.
    assert ids[0] == 2
    assert set(ids) == {1, 2}
    assert all(rows[i]["bm25"] >= rows[i + 1]["bm25"] for i in range(len(rows) - 1))


def test_quantile_bins_matches_native_ntile(spark):
    from awi_datapipelinepublic_spark.operators.windows import quantile_bins
    from pyspark.sql import Window

    df = spark.range(0, 997).select((F.col("id") * 31 % 1009).alias("v"), F.col("id").alias("k"))
    ours = {(r["v"], r["k"]): r["bin"] for r in quantile_bins(df, "v", 7, "k").collect()}
    native = {
        (r["v"], r["k"]): r["nb"]
        for r in df.withColumn(
            "nb", F.ntile(7).over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert ours == native


def test_quantile_bins_fewer_rows_than_bins(spark):
    from awi_datapipelinepublic_spark.operators.windows import quantile_bins

    df = spark.createDataFrame([(5, 1), (3, 2), (9, 3)], ["v", "k"])
    out = sorted((r["v"], r["bin"]) for r in quantile_bins(df, "v", 10, "k").collect())
    # N < n_bins → ntile semantics: one row per bin, in value order
    assert out == [(3, 1), (5, 2), (9, 3)]


def test_resample_ohlc_bar_semantics(spark):
    import datetime as dt

    from awi_datapipelinepublic_spark.operators.timeseries import resample_ohlc

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), 10.0),
        (1, dt.datetime(2024, 1, 1, 10, 20), 50.0),   # high
        (1, dt.datetime(2024, 1, 1, 10, 55), 20.0),   # close
        (1, dt.datetime(2024, 1, 1, 11, 0), 7.0),     # next bar
        (2, dt.datetime(2024, 1, 1, 10, 30), 3.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    bars = {(r["user_id"], r["bucket"].hour): r for r in resample_ohlc(df).collect()}
    b = bars[(1, 10)]
    assert (b["open"], b["high"], b["low"], b["close"], b["n_ticks"]) == (10.0, 50.0, 10.0, 20.0, 3)
    assert bars[(1, 11)]["open"] == 7.0 and bars[(1, 11)]["n_ticks"] == 1
    assert bars[(2, 10)]["open"] == bars[(2, 10)]["close"] == 3.0


def test_tfidf_keywords_rare_term_wins(spark):
    from awi_datapipelinepublic_spark.operators.corpus import tfidf_keywords

    df = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common filler words here"),
            (3, "common other stuff again"),
        ],
        ["doc_id", "text"],
    )
    out = {(r["doc_id"], r["rank"]): r["term"] for r in tfidf_keywords(df, top_m=2).collect()}
    # 'common' appears in every doc → idf = ln(1) = 0; rare term wins.
    assert out[(1, 1)] == "rare"


def test_hll_union_estimate_accuracy_at_scale(spark):
    """Sketch-union estimate over 20 buckets of 10k overlapping keys
    each must land within HLL's documented error band of the true
    200k-scale distinct count, and per-bucket sketches must merge to
    the same answer as sketching the raw rows."""
    from pyspark.sql import functions as F
    from awi_datapipelinepublic_spark.operators.quality import (
        incremental_distinct_total,
    )

    df = spark.range(0, 200_000).select(
        (F.col("id") % 20).alias("bucket"), (F.col("id") * 31 % 150_011).alias("k")
    )
    est = incremental_distinct_total(df, "k", "bucket").first()["estimate"]
    exact = df.select("k").distinct().count()
    assert abs(est - exact) / exact < 0.03, (est, exact)

    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("e")
    ).first()["e"]
    assert est == direct  # merge-of-parts == sketch-of-whole


def test_rrf_fuse_semantics(spark):
    from awi_datapipelinepublic_spark.operators.corpus import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(2, 1), (4, 2)], ["doc_id", "rank"])
    rows = rrf_fuse(a, b, k=60, top=10).collect()
    scores = {r["doc_id"]: r["rrf"] for r in rows}
    # doc 2 is in both lists → sum of both reciprocal ranks, ranks first
    assert rows[0]["doc_id"] == 2
    assert abs(scores[2] - (1 / 62 + 1 / 61)) < 1e-6
    # single-list docs score only their own side
    assert abs(scores[1] - 1 / 61) < 1e-6
    assert abs(scores[4] - 1 / 62) < 1e-6
    assert set(scores) == {1, 2, 3, 4}


def test_lsh_bucket_cap_drops_degenerate_buckets(spark):
    """10k identical docs share every band bucket: without a cap that
    is a single task holding a 10k-id list and a 4×10⁸ pair expansion.
    With the cap the over-full buckets are dropped BEFORE any member
    list is collected, the job completes instantly, and an under-cap
    duplicate group elsewhere in the corpus still pairs."""
    base = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated on every single page").alias("text"),
    )
    twins = spark.createDataFrame(
        [
            (20_001, "a genuinely unique pair of documents about spark shuffles"),
            (20_002, "a genuinely unique pair of documents about spark shuffles"),
        ],
        ["doc_id", "text"],
    )
    pairs = minhash_lsh_candidates(
        base.unionByName(twins), num_hashes=32, bands=8, k=3, max_bucket=100
    ).collect()
    assert (20_001, 20_002) in {(r["id_a"], r["id_b"]) for r in pairs}
    # no pair involves the boilerplate mega-group
    assert all(r["id_a"] > 10_000 for r in pairs), pairs[:5]


def test_simhash_bucket_cap_drops_degenerate_buckets(spark):
    from awi_datapipelinepublic_spark.operators.dedup import simhash_near_dup_candidates

    base = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate body shared by every page").alias("text"),
    )
    twins = spark.createDataFrame(
        [
            (20_001, "one of two nearly identical rare documents about join skew"),
            (20_002, "one of two nearly identical rare documents about join skew"),
        ],
        ["doc_id", "text"],
    )
    pairs = simhash_near_dup_candidates(
        base.unionByName(twins), max_hamming=3, max_bucket=100
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (20_001, 20_002) in got
    assert all(a > 10_000 for a, _ in got)


def test_near_dedup_degenerate_corpus_completes_all_survive(spark):
    """Contract: over-cap buckets carry no signal, so an all-identical
    corpus yields no LSH pairs — exact duplicates are exact_dedup's
    job (run it first in a real pipeline). The point of the test is
    that the pipeline COMPLETES without a mega-task."""
    from awi_datapipelinepublic_spark.operators.dedup import near_dedup_keep_canonical

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("identical page body for the degenerate corpus case").alias("text"),
    )
    assert near_dedup_keep_canonical(docs, max_bucket=100).count() == 10_000


def test_knn_join_brute_guard_raises_over_bound(spark, sf_dir):
    import pytest as _pytest

    from awi_datapipelinepublic_spark.operators.similarity import knn_join_brute

    emb = read_table(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError, match="knn_join_lsh"):
        knn_join_brute(emb, k=3, max_rows=5)


def test_probe_masks_popcount_family(spark):
    from math import comb

    from awi_datapipelinepublic_spark.operators.similarity import _probe_masks

    for h, bits in [(6, 0), (6, 1), (6, 2), (8, 3)]:
        masks = _probe_masks(h, bits)
        assert len(masks) == len(set(masks))  # distinct buckets, no pair dedup needed
        assert len(masks) == sum(comb(h, j) for j in range(bits + 1))
        assert all(bin(m).count("1") <= bits for m in masks)
        assert all(m < (1 << h) for m in masks)


def test_dedup_incremental_batch_vs_index(spark):
    """A batch doc near-duplicating the corpus drops; of two batch
    near-dups the smaller id survives; a unique batch doc survives."""
    from awi_datapipelinepublic_spark.operators.dedup import (
        dedup_incremental,
        minhash_band_keys,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "completely different corpus content about spark shuffles")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again and again"),  # corpus dup
         (11, "brand new unique text never seen in any corpus at all"),
         (12, "twin batch documents sharing identical wording exactly"),
         (13, "twin batch documents sharing identical wording exactly")],
        "doc_id long, text string",
    )
    index = minhash_band_keys(corpus, k=3)
    survivors = {r.doc_id for r in dedup_incremental(batch, index, k=3).collect()}
    assert survivors == {11, 12}


def test_spread_small_input_slicing(spark):
    """Spread kicks in only below cluster parallelism, sizes slices at
    ~512 rows, and never shatters tiny inputs."""
    from awi_datapipelinepublic_spark.functions.parallel import spread_small_input

    cores = spark.sparkContext.defaultParallelism
    tiny = spark.range(100).coalesce(1)
    assert spread_small_input(tiny).rdd.getNumPartitions() == 1
    mid = spark.range(5000).coalesce(1)
    got = spread_small_input(mid).rdd.getNumPartitions()
    assert 2 <= got <= max(2, min(cores * 2, 9))
    wide = spark.range(10_000).repartition(cores)
    assert spread_small_input(wide).rdd.getNumPartitions() == cores
    # never REDUCES parallelism: 300 rows already across 2 partitions
    # computes slices=1, which must early-return, not repartition(1)
    two = spark.range(300).repartition(2)
    assert spread_small_input(two).rdd.getNumPartitions() == 2


def test_remove_duplicated_spans_keeps_canonical_copy(spark):
    """A span shared by three docs survives only in the min-id owner;
    unique text is untouched; short docs pass through whole."""
    from awi_datapipelinepublic_spark.operators.quality import remove_duplicated_spans

    shared = "the boiler plate legal footer text"
    docs = spark.createDataFrame(
        [
            (1, f"alpha unique opening words {shared}"),
            (2, f"{shared} beta entirely different tail"),
            (3, f"gamma mid piece {shared} gamma tail words here"),
            (4, "wholly unique document with no shared spans at all"),
            (5, "tiny doc"),  # < n tokens: no grams, untouched
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, n=4).collect()}
    assert len(out) == 5
    # owner (doc 1) keeps the shared span verbatim
    assert shared in out[1]["clean_text"]
    assert out[1]["n_removed"] == 0
    # non-owners lose every token the shared 4-grams cover
    assert "boiler" not in out[2]["clean_text"]
    assert "footer" not in out[3]["clean_text"]
    assert out[2]["n_removed"] >= 6 and out[3]["n_removed"] >= 6
    # their unique words survive
    assert "beta" in out[2]["clean_text"]
    assert "gamma" in out[3]["clean_text"]
    assert out[4]["n_removed"] == 0
    assert out[5]["clean_text"] == "tiny doc" and out[5]["n_removed"] == 0


def test_remove_duplicated_spans_degenerate_hot_gram(spark):
    """Every doc identical (worst-case hot gram): the min-id doc keeps
    its text, every other doc is emptied — and the groupBy+join-back
    shape completes without a gram window."""
    from awi_datapipelinepublic_spark.operators.quality import remove_duplicated_spans

    docs = spark.createDataFrame(
        [(i, "same four token text") for i in range(100)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, n=4).collect()}
    assert out[0]["clean_text"] == "same four token text"
    assert all(out[i]["clean_text"] == "" and out[i]["n_removed"] == 4 for i in range(1, 100))


def test_ngram_containment_catches_excerpts_jaccard_misses(spark):
    """A short quote fully contained in a long article: containment
    (quote→article) = 1.0 while Jaccard ≈ |quote|/|article| stays far
    below any useful threshold — the operator's reason to exist."""
    from awi_datapipelinepublic_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "to be or not to be that is the question"
    filler = " ".join(f"filler{i} word{i} more{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote} {filler} closing remarks")],
        "doc_id long, text string",
    )
    cont = ngram_containment_pairs(docs, k=3, threshold=0.8).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["cont_a_in_b"] == 1.0
    assert r["cont_b_in_a"] < 0.2
    # jaccard at the same data: nothing at even a lax 0.3 threshold
    assert ngram_jaccard_pairs(docs, k=3, threshold=0.3).count() == 0


def test_fuzzy_decontamination_catches_paraphrase_exact_misses(spark):
    """A light rewording of an eval item (one word changed every ~8
    tokens) shares no 7-gram with it but stays a MinHash near-dup:
    exact decontamination misses it, fuzzy flags it. Unrelated docs
    stay unflagged either way."""
    from awi_datapipelinepublic_spark.operators.quality import (
        contaminated_ids,
        fuzzy_contaminated_ids,
    )

    base = ("the quick brown fox jumps over the lazy dog while the calm river "
            "flows beneath the old wooden bridge near the quiet village square "
            "as morning light slowly spreads across the misty green valley floor")
    toks = base.split()
    # swap one token in every 7-token window for a different word
    # (normalization lowercases, so case changes would not count):
    # no shared 7-gram remains, but ~57% of 3-shingles survive —
    # jaccard ≈ 0.4, above the 16-band/2-row s-curve threshold
    # (1/16)^(1/2) = 0.25 while far below exact-overlap detectability
    reworded = " ".join(
        (t + "ish" if i % 7 == 3 else t) for i, t in enumerate(toks)
    )
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, reworded),
         (2, "completely unrelated text about database query planning and shuffles "
             "with many additional words ensuring no overlap whatsoever here")],
        "doc_id long, text string",
    )
    exact = {r["doc_id"] for r in contaminated_ids(corpus, bench, n=7).collect()}
    fuzzy = {r["doc_id"] for r in
             fuzzy_contaminated_ids(corpus, bench, bands=16, k=3).collect()}
    assert 1 not in exact          # every 7-gram was perturbed
    assert fuzzy == {1}            # but the minhash bands still match


def test_ngram_pair_guard_refuses_degenerate_corpus(spark):
    """The exact-similarity ops' "verify stage only" contract is
    enforced by code (VERDICT r4 #3): a corpus where one shingle set
    is shared by every doc would materialize C(n,2) self-join rows per
    shingle — the guard estimates Σ c·(c−1)/2 and raises before the
    join detonates. max_pairs=None opts out for pre-bounded inputs."""
    import pytest as _pytest

    from awi_datapipelinepublic_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "the very same exact text every single time") for i in range(60)],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="max_pairs"):
        ngram_jaccard_pairs(docs, max_pairs=1000)
    with _pytest.raises(ValueError, match="max_pairs"):
        ngram_containment_pairs(docs, max_pairs=1000)
    # opt-out still computes: 60 identical docs -> C(60,2) jaccard-1 pairs
    assert ngram_jaccard_pairs(docs, max_pairs=None).count() == 60 * 59 // 2


def test_token_budget_select_budget_and_prefix_property(spark):
    """No group exceeds its token budget, the kept set is a prefix of
    the group's md5(id) order (adding back the first excluded doc
    would blow the budget), and reruns agree row-for-row."""
    from pyspark.sql import functions as F

    from awi_datapipelinepublic_spark.operators.sampling import token_budget_select

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 10 + (i % 7)) for i in range(400)],
        ["id", "src", "n_tok"],
    )
    kept = token_budget_select(df, "src", "id", "n_tok", 300)
    rows = kept.collect()
    assert rows == token_budget_select(df, "src", "id", "n_tok", 300).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    for src, group in by_src.items():
        total = sum(r["n_tok"] for r in group)
        assert total <= 300
        assert max(r["cum_tokens"] for r in group) == total
        # prefix property: every doc in the group NOT kept sits later
        # in md5 order than every kept doc (single cut point)
        all_ids = [
            r["id"]
            for r in df.filter(F.col("src") == src)
            .select("id", F.md5(F.col("id").cast("string")).alias("h"))
            .orderBy("h", "id")
            .collect()
        ]
        kept_ids = {r["id"] for r in group}
        assert set(all_ids[: len(kept_ids)]) == kept_ids


def test_assign_shards_stable_balanced_and_append_safe(spark):
    from awi_datapipelinepublic_spark.operators.sampling import assign_shards

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    out = {r["id"]: r["shard"] for r in assign_shards(df, "id", 16).collect()}
    assert set(out.values()) <= set(range(16))
    # balanced to ~1/sqrt(125) ≈ 9%: allow generous 40% relative slack
    from collections import Counter

    sizes = Counter(out.values())
    assert len(sizes) == 16 and max(sizes.values()) < 2000 / 16 * 1.4
    # append-safety: the same ids in a different (smaller, reordered)
    # batch land on the same shards
    sub = spark.createDataFrame([(i,) for i in range(1999, 999, -2)], ["id"])
    again = {r["id"]: r["shard"] for r in assign_shards(sub, "id", 16).collect()}
    assert all(out[i] == s for i, s in again.items())


def test_calibrate_scores_percentile_semantics(spark):
    """percent_rank spans [0,1] per group, is monotone in the raw
    score, and ties share a rank."""
    from awi_datapipelinepublic_spark.operators.quality import calibrate_scores

    df = spark.createDataFrame(
        [(i, "s1", float(i % 10)) for i in range(20)]
        + [(100 + i, "s2", float(i)) for i in range(5)],
        ["id", "src", "score"],
    )
    rows = calibrate_scores(df, "src", "score", "id").collect()
    s2 = sorted((r for r in rows if r["src"] == "s2"), key=lambda r: r["score"])
    assert [r["calibrated"] for r in s2] == [0.0, 0.25, 0.5, 0.75, 1.0]
    s1 = [r for r in rows if r["src"] == "s1"]
    assert min(r["calibrated"] for r in s1) == 0.0
    assert max(r["calibrated"] for r in s1) == 1.0
    # ties on score are broken by id in rank order but percent_rank of
    # equal (score,id) keys is strictly monotone; same-score rows get
    # consecutive distinct ranks — verify monotonicity overall
    s1_sorted = sorted(s1, key=lambda r: (r["score"], r["id"]))
    cal = [r["calibrated"] for r in s1_sorted]
    assert cal == sorted(cal)


def test_source_overlap_directed_containment(spark):
    """Planted overlap: source B contains all of A's grams plus its
    own, so containment(A→B) = 1.0 while containment(B→A) < 1."""
    from awi_datapipelinepublic_spark.operators.quality import source_overlap

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "A"),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "B"),
            (3, "iota kappa lambda mu", "C"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {(r["src_a"], r["src_b"]): r for r in source_overlap(df, "doc_id", "text", "source", n=3).collect()}
    # A's grams: 2 distinct 3-grams, both present in B
    ab = out[("A", "B")]
    assert ab["shared_grams"] == 2 and ab["containment"] == 1.0
    ba = out[("B", "A")]
    assert ba["shared_grams"] == 2 and 0 < ba["containment"] < 1
    # C shares nothing: no row at all for (A,C)/(C,A)
    assert ("A", "C") not in out and ("C", "A") not in out


def test_substring_contaminated_ids_catches_embedded_eval_row(spark):
    from awi_datapipelinepublic_spark.operators.quality import (
        substring_contaminated_ids,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "some unrelated text about spark partitions"),
            (3, "prefix padding THE QUICK   BROWN fox jumps suffix"),  # case+ws variant
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps")], ["doc_id", "text"]
    )
    hit_ids = {
        r["doc_id"] for r in substring_contaminated_ids(corpus, bench).collect()
    }
    # doc 1 contains it verbatim; doc 3 contains it modulo case/whitespace
    # normalization; doc 2 is clean
    assert hit_ids == {1, 3}


def test_negative_sample_never_self_and_deterministic(spark):
    from awi_datapipelinepublic_spark.operators.quality import negative_sample

    df = spark.createDataFrame([(i,) for i in range(50)], ["id"])
    out = negative_sample(df, "id", 4).collect()
    assert len(out) == 50 * 4
    assert all(r["neg_id"] != r["id"] for r in out)
    assert all(0 <= r["neg_id"] < 50 for r in out)
    again = negative_sample(df, "id", 4).collect()
    key = lambda r: (r["id"], r["draw"])
    assert sorted(out, key=key) == sorted(again, key=key)
    # draws are spread: no anchor gets the same negative for all 4 draws
    from collections import defaultdict

    by_anchor = defaultdict(set)
    for r in out:
        by_anchor[r["id"]].add(r["neg_id"])
    assert sum(1 for v in by_anchor.values() if len(v) == 1) <= 2

    import pytest as _pt

    with _pt.raises(ValueError):
        negative_sample(spark.createDataFrame([(1,)], ["id"]), "id", 2)


def test_range_sorted_layout_audits_disjoint_key_ranges(spark, tmp_path):
    """file_key_ranges (the distributed layout audit) proves
    write_range_sorted's contract: per-file key ranges disjoint, so
    footer min/max skipping can prune — no driver file listing."""
    from awi_datapipelinepublic_spark.sources.layout import (
        file_key_ranges,
        write_range_sorted,
    )

    path = str(tmp_path / "clustered")
    df = spark.range(20_000).selectExpr("id", "id % 97 AS k")
    write_range_sorted(df, path, "id", partitions=8)
    ranges = sorted(
        file_key_ranges(spark, path, "id").collect(), key=lambda r: r["key_min"]
    )
    assert len(ranges) == 8
    assert sum(r["rows"] for r in ranges) == 20_000
    for a, b in zip(ranges, ranges[1:]):
        assert a["key_max"] < b["key_min"]  # disjoint: file skipping can prune


def test_digest_prefilter_join_matches_plain_join(spark):
    """Prefilter is semantics-preserving: identical rows to the plain
    inner join, including duplicate selective-side keys (fan-out) and
    big-side rows with no match."""
    from awi_datapipelinepublic_spark.operators.joins import digest_prefilter_join

    big = spark.createDataFrame(
        [(i, i % 50) for i in range(1000)], ["bid", "k"]
    )
    sel = spark.createDataFrame(
        [(k, f"p{k}") for k in range(0, 50, 7)] + [(7, "dup")], ["sk", "payload"]
    )
    got = sorted(
        (r["bid"], r["payload"])
        for r in digest_prefilter_join(big, sel, "k", "sk").collect()
    )
    want = sorted(
        (r["bid"], r["payload"])
        for r in big.join(sel, big["k"] == sel["sk"], "inner").collect()
    )
    assert got == want and len(got) > 0


def test_asof_join_forward_with_tolerance(spark):
    """Forward direction picks the EARLIEST right at-or-after each
    left ts; tolerance nulls matches beyond the bound; equal ts match."""
    import datetime as dt

    from awi_datapipelinepublic_spark.operators.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, 1, t(0)), (2, 1, t(30)), (3, 1, t(50)), (4, 2, t(0))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(30), 10.0), (1, t(45), 20.0)],
        "k long, ts timestamp, v double",
    )
    out = {r["id"]: r["v"] for r in asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload=["v"], direction="forward", tolerance_seconds=600,
    ).collect()}
    assert out[1] is None            # next right is 30 min away > 10 min
    assert out[2] == 10.0            # equal ts matches
    assert out[3] is None            # 45 is within... 50->no right after
    assert out[4] is None            # key 2 has no right rows
    # widen tolerance: id 1 now reaches t(30)
    out2 = {r["id"]: r["v"] for r in asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload=["v"], direction="forward", tolerance_seconds=3600,
    ).collect()}
    assert out2[1] == 10.0 and out2[2] == 10.0 and out2[3] is None


def test_grid_radius_join_matches_brute_force(spark):
    """Grid candidates + exact predicate must equal the O(n²) answer,
    including pairs straddling cell borders."""
    import itertools

    from awi_datapipelinepublic_spark.operators.spatial import grid_radius_join

    pts = [
        (1, 0.0, 0.0), (2, 4.9, 0.0),      # same-radius, adjacent cells
        (3, 5.1, 0.0),                      # 5.1 from id 1 -> out
        (4, 9.9, 0.0),                      # 5.0 exactly from id 2? 5.0 -> in (<=)
        (5, 50.0, 50.0),                    # isolated
        (6, -0.1, -0.1),                    # negative cells
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {(r["id_a"], r["id_b"]) for r in grid_radius_join(df, radius=5.0).collect()}
    want = set()
    for (i, xi, yi), (j, xj, yj) in itertools.combinations(pts, 2):
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= 25.0:
            want.add((min(i, j), max(i, j)))
    assert got == want and (1, 2) in got and (1, 3) not in got


def test_interval_coverage_hand_values(spark):
    """Overlap, touching-endpoint ([0,10) then [10,20) merge: start >
    running max end is the NEW-island test, so equality continues the
    island), containment, and disjoint cases."""
    from awi_datapipelinepublic_spark.operators.events import interval_coverage

    rows = [
        (1, 0, 10), (1, 5, 12), (1, 12, 20),   # chain -> one island [0,20)
        (1, 100, 110),                          # disjoint second island
        (2, 0, 50), (2, 10, 20),                # containment -> [0,50)
    ]
    df = spark.createDataFrame(rows, "user_id long, start_s long, end_s long")
    got = {r["user_id"]: (r["n_islands"], r["covered_seconds"])
           for r in interval_coverage(df).collect()}
    assert got == {1: (2, 30), 2: (1, 50)}
