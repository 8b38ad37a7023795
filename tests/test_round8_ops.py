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
