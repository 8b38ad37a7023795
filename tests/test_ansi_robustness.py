"""ANSI-mode adversarial fixtures for every gate-path division.

The external driver runs a VANILLA Spark 4 session — `spark.sql.ansi.
enabled=true` — where a division whose denominator lands on 0 is a
hard DIVIDE_BY_ZERO crash instead of the NULL the engine's tuned
(ANSI-off) session produces. Round 7 shipped exactly that bug:
ab_test_zscore crashed under the driver because sf0.01's events data
converts 100% of users in both arms (pooled p̂ = 1 → sqrt(0) divisor).

These tests run the division-bearing operators under ANSI **on**
against the degenerate inputs the happy-path parquet never produces —
all-converted arms, zero-variance graphs, all-zero value columns,
empty distribution sides, zero-token sources, empty pair tables,
fewer rows than bins. The contract everywhere: NULL (or a guarded
0.0), never a crash — matching DuckDB's float x/0 → NULL so the
oracle hash stays aligned even on degenerate data.

The ANSI flip is per-test (runtime conf) and restored in a finally
block, so the session-scoped fixture is safe for the rest of the
suite.
"""

import contextlib

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


@contextlib.contextmanager
def ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_ansi_flag_actually_flips(spark):
    with ansi(spark):
        with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            spark.range(1).select(F.lit(1.0) / F.lit(0.0)).collect()
    # restored: lenient session divides to NULL again
    assert spark.range(1).select(
        (F.lit(1.0) / F.lit(0.0)).alias("x")
    ).first()["x"] is None


def test_ab_test_zscore_all_converted_and_none_converted(spark):
    """The literal r7 driver crash: both arms at 100% (pooled = 1) and
    the mirror case at 0% (pooled = 0) — z undefined, must be NULL."""
    from awi_datapipelinepublic_spark.operators.events import ab_test_zscore

    rows = [(u, "purchase") for u in range(1, 21)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    with ansi(spark):
        out = ab_test_zscore(df).collect()
    assert len(out) == 1
    assert out[0]["p_a"] == 1.0 and out[0]["p_b"] == 1.0
    assert out[0]["z_score"] is None

    rows = [(u, "view") for u in range(1, 21)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    with ansi(spark):
        out = ab_test_zscore(df).collect()
    assert out[0]["p_a"] == 0.0 and out[0]["z_score"] is None


def test_degree_assortativity_regular_graph(spark):
    """A cycle is 2-regular: zero degree variance → vx·vy = 0 → the
    Pearson denominator is sqrt(0). NULL, not DIVIDE_BY_ZERO."""
    from awi_datapipelinepublic_spark.operators.graph import degree_assortativity

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    with ansi(spark):
        row = degree_assortativity(edges).first()
    assert row["n_edges"] == n
    assert row["assortativity"] is None


def test_gini_all_zero_values(spark):
    """Σx = 0 (every value zero) → Gini undefined → NULL."""
    from awi_datapipelinepublic_spark.operators.quality import gini_coefficient

    df = spark.createDataFrame([(i, 0) for i in range(10)], "id long, v long")
    with ansi(spark):
        row = gini_coefficient(df, "v").first()
    assert row["n"] == 10
    assert row["gini"] is None


def test_ks_drift_empty_side(spark):
    """An empty current sample → n_ref·n_cur = 0 → ks_stat NULL."""
    from awi_datapipelinepublic_spark.operators.quality import ks_drift

    ref = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    cur = ref.filter(F.lit(False))
    with ansi(spark):
        row = ks_drift(ref, cur, "v").first()
    assert row["n_cur"] == 0
    assert row["ks_stat"] is None


def test_mixture_weights_zero_token_source(spark):
    """One source of empty documents (0 tokens) → its epochs_at_budget
    divides by n_tokens = 0 → NULL for that source, real weights for
    the rest; the all-empty corpus (Z = 0) yields NULL weights."""
    from awi_datapipelinepublic_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [("a", "real words here")] * 3 + [("b", "")] * 2,
        "source string, text string",
    )
    with ansi(spark):
        rows = {r["source"]: r for r in mixture_weights(df).collect()}
    assert rows["b"]["n_tokens"] == 0
    assert rows["b"]["epochs_at_budget"] is None
    assert rows["a"]["weight"] is not None

    empty = spark.createDataFrame([("a", ""), ("b", "")], "source string, text string")
    with ansi(spark):
        rows = mixture_weights(empty).collect()
    assert all(r["weight"] is None for r in rows)


def test_pair_retrieval_metrics_empty_sides(spark):
    """Empty candidates (precision denominator) and empty gold
    (recall denominator) — the when()-guards must short-circuit."""
    from awi_datapipelinepublic_spark.operators.quality import pair_retrieval_metrics

    pairs = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    none = pairs.filter(F.lit(False))
    with ansi(spark):
        row = pair_retrieval_metrics(none, pairs, keys=("a", "b")).first()
        assert (row["prec"], row["rec"], row["f1"]) == (0.0, 0.0, 0.0)
        row = pair_retrieval_metrics(pairs, none, keys=("a", "b")).first()
        assert (row["prec"], row["rec"], row["f1"]) == (0.0, 0.0, 0.0)


def test_ntile_fewer_rows_than_bins(spark):
    """N < n_bins makes q = ⌊N/n⌋ = 0; every row must route through
    the (q+1)-divisor branch — the /q branch would be 0-divide."""
    from awi_datapipelinepublic_spark.operators.windows import quantile_bins

    df = spark.createDataFrame([(i,) for i in range(3)], "v long")
    with ansi(spark):
        rows = quantile_bins(df, "v", n_bins=10).collect()
    assert sorted(r["bin"] for r in rows) == [1, 2, 3]


def test_text_quality_empty_documents(spark):
    """Empty/whitespace-only text through every ratio expression:
    entropy, stopword/punct ratios, Gopher word stats, readability —
    all when()-guarded, must evaluate (not crash) under ANSI."""
    from awi_datapipelinepublic_spark.functions import text as T

    df = spark.createDataFrame([("",), ("   ",), ("real text here.",)], "text string")
    cols = {
        "entropy": T.char_entropy("text"),
        "stop": T.stopword_ratio("text"),
        "punct": T.punct_ratio("text"),
        "mwl": T.mean_word_length("text"),
        "alpha": T.alpha_word_ratio("text"),
        "sym": T.symbol_word_ratio("text"),
    }
    cols.update(T.readability_cols("text"))
    with ansi(spark):
        rows = df.select([v.alias(k) for k, v in cols.items()]).collect()
    assert len(rows) == 3  # materialized without DIVIDE_BY_ZERO


def test_conversion_time_no_conversions(spark):
    """Zero converted users: COUNT = 0 under a global agg — the NULL
    numerator short-circuits Spark's ANSI divide (NULL/0 is NULL, the
    error only fires on non-null/0), so avg_seconds is NULL."""
    from awi_datapipelinepublic_spark.operators.events import funnel_timing

    df = spark.createDataFrame(
        [(1, "view", "2024-01-01 00:00:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    with ansi(spark):
        row = funnel_timing(df).first()
    assert row["n_converted"] == 0
    assert row["avg_seconds"] is None


def test_packing_efficiency_all_empty_corpus(spark):
    """n_chunks = 0 (every doc has zero tokens): waste is NULL, not a
    DIVIDE_BY_ZERO under ANSI."""
    from awi_datapipelinepublic_spark.operators.chunking import packing_efficiency

    df = spark.createDataFrame([(0,), (0,)], "n_tokens int")
    with ansi(spark):
        rows = packing_efficiency(df, "n_tokens").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_chunks"] == 0
        assert r["pad_waste"] is None and r["concat_waste"] is None


def test_spearman_empty_and_constant_inputs(spark):
    """Empty input → one row with NULL rho; constant column → NULL rho
    (zero denominator through try_divide) — no ANSI crash."""
    from awi_datapipelinepublic_spark.operators.quality import spearman_corr

    empty = spark.createDataFrame([], "x int, y double")
    const = spark.createDataFrame([(1, 2.0), (2, 2.0)], "x int, y double")
    with ansi(spark):
        r0 = spearman_corr(empty, "x", "y").collect()[0]
        r1 = spearman_corr(const, "x", "y").collect()[0]
    assert r0["n_rows"] == 0 and r0["rho"] is None
    assert r1["rho"] is None


def test_changepoint_scan_single_point_series(spark):
    """A 1-point series has NO valid split (t < n never holds): the
    key drops out entirely instead of dividing by n - t = 0."""
    from awi_datapipelinepublic_spark.operators.timeseries import changepoint_scan

    df = spark.createDataFrame([("a", 1, 5)], "event_type string, day int, n bigint")
    with ansi(spark):
        assert changepoint_scan(df).count() == 0


def test_triple_support_empty_baskets_no_crash(spark):
    """No basket survives the size cap: empty result, the support
    division never evaluates on a row."""
    from awi_datapipelinepublic_spark.operators.affinity import triple_support

    df = spark.createDataFrame([("b1", "only")], "bk string, it string")
    with ansi(spark):
        assert triple_support(df, "bk", "it").count() == 0


def test_skyline2d_constant_x_under_ansi(spark):
    """All x equal: bucket width is the guarded __hi == __lo branch —
    no division by zero."""
    from awi_datapipelinepublic_spark.operators.spatial import skyline2d

    df = spark.createDataFrame([(2.0, 1), (2.0, 9)], "x double, y int")
    with ansi(spark):
        got = [(r["x"], r["y"]) for r in skyline2d(df, "x", "y").collect()]
    assert got == [(2.0, 9)]
