"""Round-8 operator contracts: the ADVICE.md fixes.

- fuzzy_join_edit1's two-table mode (self_join=False): keeps
  (left, right) orientation and dist=0 matches that the self-join
  dedup filter (name_a < name_b) would drop.
- interval_overlap_join accepts DECIMAL(p, 0) coordinates — exactly
  integral, the scale type recommended for big exact sums.
- mixture_weights no longer mutates its intermediate's cached schema
  (StructType.add mutates in place).
"""

import pytest
from pyspark.sql import functions as F


def test_fuzzy_join_edit1_two_table_orientation(spark):
    from awi_datapipelinepublic_spark.operators.joins import fuzzy_join_edit1

    left = spark.createDataFrame([("zeta",), ("kappa",)], "name string")
    right = spark.createDataFrame([("zeta",), ("zetas",), ("alpha",)], "name string")

    out = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_join_edit1(left, right, "name", "name", self_join=False).collect()
    }
    # dist=0 exact match kept, and kept in (left, right) orientation even
    # though "zeta" !< "zeta"; "zeta"→"zetas" is one insertion.
    assert ("zeta", "zeta", 0) in out
    assert ("zeta", "zetas", 1) in out
    # no match invented for kappa/alpha
    assert not any(a == "kappa" or b == "alpha" for a, b, _ in out)

    # self-join default: unordered distinct pairs, identity excluded
    both = left.unionByName(right)
    self_out = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_join_edit1(both, both, "name", "name").collect()
    }
    assert ("zeta", "zetas", 1) in self_out
    assert all(a < b for a, b, _ in self_out)
    assert all(d >= 1 for _, _, d in self_out)


def test_interval_overlap_join_decimal_scale0(spark):
    from awi_datapipelinepublic_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame([(1, 0, 10)], "id long, lo long, hi long").select(
        "id", F.col("lo").cast("decimal(38,0)").alias("lo"),
        F.col("hi").cast("decimal(38,0)").alias("hi"),
    )
    right = spark.createDataFrame([(9, 12)], "rlo long, rhi long").select(
        F.col("rlo").cast("decimal(38,0)").alias("rlo"),
        F.col("rhi").cast("decimal(38,0)").alias("rhi"),
    )
    out = interval_overlap_join(left, right, "lo", "hi", "rlo", "rhi", bin_width=5)
    assert out.count() == 1  # [0,10) overlaps [9,12)

    frac = left.select("id", F.col("lo").cast("decimal(38,2)").alias("lo"),
                       F.col("hi").cast("decimal(38,2)").alias("hi"))
    with pytest.raises(TypeError, match="integral"):
        interval_overlap_join(frac, right, "lo", "hi", "rlo", "rhi", bin_width=5)


def test_mixture_weights_does_not_mutate_input_schema(spark):
    from awi_datapipelinepublic_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [("a", "some words"), ("b", "more words here")],
        "source string, text string",
    )
    out = mixture_weights(df)
    assert "__p" not in [f.name for f in out.schema.fields]
    rows = {r["source"]: r for r in out.collect()}
    assert rows["a"]["weight"] is not None and rows["b"]["weight"] is not None


def test_dsir_weights_prefers_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outweigh docs that
    don't; counts are exact integers."""
    from awi_datapipelinepublic_spark.operators.sampling import dsir_weights

    target = spark.createDataFrame(
        [(100 + i, "quantum physics lecture notes") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "quantum physics problem set"),
         (2, "cheap watches free shipping deals")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    assert rows[1]["log_weight_nano"] > rows[2]["log_weight_nano"]
    assert rows[1]["n_grams"] == 7  # 4 unigrams + 3 bigrams


def test_ngram_novelty_bounds(spark):
    """A unique doc scores 1.0; two identical docs score 0.0."""
    from awi_datapipelinepublic_spark.operators.quality import ngram_novelty

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely original sentence with unique words here today")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert rows[1]["novelty"] == 0.0 and rows[2]["novelty"] == 0.0
    assert rows[3]["novelty"] == 1.0


def test_hard_negative_mine_masks_same_label(spark):
    """No returned pair shares a label, and the kernel mask beats a
    post-filter: anchors whose nearest neighbors are all same-label
    still return k cross-label rows."""
    import math

    from awi_datapipelinepublic_spark.operators.similarity import hard_negative_mine

    # label 0: a tight cluster near e1; label 1: a tight cluster near e2
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.001 * i], 0))
    for i in range(10, 20):
        rows.append((i, [0.001 * i, 1.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negative_mine(emb, k=3, vec_col="embedding")
    got = out.collect()
    lab = {r[0]: r[2] for r in rows}
    assert got and all(lab[r["a_id"]] != lab[r["b_id"]] for r in got)
    # every anchor still gets k negatives (the post-filter would return
    # none: each anchor's 3 nearest overall are its own cluster)
    from collections import Counter

    per_anchor = Counter(r["a_id"] for r in got)
    assert all(v == 3 for v in per_anchor.values())


def test_ann_recall_eval_gate_shape(spark, sf_dir):
    import __spark_entry__ as em

    rows = em.queries()["ann_recall_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert abs(r["recall"] - r["n_hits"] / r["n_exact"]) < 1e-6


def test_ccnet_buckets_partition(spark, sf_dir):
    """Terciles partition the corpus: every doc in exactly one bucket,
    bucket sizes differ by at most 1, token sums are exact."""
    import __spark_entry__ as em

    rows = em.queries()["ccnet_buckets"](spark, sf_dir).collect()
    assert {r["bucket"] for r in rows} <= {1, 2, 3}
    per_bucket = {}
    for r in rows:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n_docs"]
    total = sum(per_bucket.values())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == docs
    sizes = sorted(per_bucket.values())
    assert sizes[-1] - sizes[0] <= 1
