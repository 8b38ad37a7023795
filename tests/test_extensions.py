"""Tests for batch-2 operators: as-of join semantics, multimodal
plumbing, set ops edge cases."""

import datetime as dt
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.operators.joins import asof_join, salted_join
from awi_datapipelinepublic_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    resize_stub,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 12, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(30)), (3, 200, _ts(5)), (4, 300, _ts(50))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(10), 1.0), (100, _ts(20), 2.0), (200, _ts(6), 3.0)],
        "user_id long, rts timestamp, v double",
    ).select("user_id", "rts", F.col("rts").alias("asof_ts"), F.col("v").alias("asof_v"))
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, "user_id", "ts", "rts", ["asof_ts", "asof_v"]).collect()
    }
    assert out[1] == (_ts(10), 1.0)     # tie: right at equal ts matches
    assert out[2] == (_ts(20), 2.0)     # latest at-or-before wins
    assert out[3] == (None, None)       # right row is *after* left ts → no match
    assert out[4] == (None, None)       # key never seen on right
    assert len(out) == 4                # exactly one output row per left row


def test_asof_join_never_duplicates_left_rows(spark):
    """Many right rows per key must not fan out the left side."""
    left = spark.createDataFrame([(i, 1, _ts(30)) for i in range(5)],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(m), float(m)) for m in range(20)],
        "user_id long, rts timestamp, v double",
    ).select("user_id", "rts", F.col("v").alias("asof_v"))
    out = asof_join(left, right, "user_id", "ts", "rts", ["asof_v"]).collect()
    assert len(out) == 5
    assert all(r["asof_v"] == 19.0 for r in out)  # minute 19 ≤ 30 is the latest


def test_agg_approx_error_bounds(spark, sf_dir):
    """Sketch aggregates must land within their advertised error of the
    exact answers (HLL rsd=0.02 → allow 6%; t-digest median → 5%)."""
    import __spark_entry__ as em

    approx = {r["l_returnflag"]: r for r in em.q_agg_approx(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.06
        assert abs(a["approx_median_price"] - e["median_price"]) / e["median_price"] < 0.05


def test_salted_join_matches_plain_join(spark):
    """Salting must be semantics-preserving: same rows as a plain join,
    including rows whose key misses (left join) and duplicate right keys."""
    left = spark.createDataFrame(
        [(i, "HOT" if i % 3 else f"k{i}") for i in range(300)], "lid long, k string"
    )
    right = spark.createDataFrame(
        [("HOT", 1.0), ("HOT", 2.0), ("k3", 9.0)], "rk string, v double"
    )
    plain = sorted(
        (r["lid"], r["v"]) for r in left.join(right, left.k == right.rk, "left").collect()
    )
    salted = sorted(
        (r["lid"], r["v"]) for r in salted_join(left, right, "k", "rk", "left").collect()
    )
    assert salted == plain


def test_multimodal_decode_shape_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    with_bin = attach_binary_payload(docs)
    assert dict(with_bin.dtypes)["payload"] == "binary"
    out = decode_media(with_bin)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20                                  # 1:1 row contract
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, r in rows.items():
        raw = src[doc_id].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["fake_width"] == (len(raw) % 640) + 1
        assert r["checksum"] == sum(raw[:64])


def test_resize_stub_rewrites_payload_and_meta(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    resized = resize_stub(attach_binary_payload(docs), 100, 100)
    r = resized.first()
    assert len(r["payload"]) <= 100
    assert r["media_meta"]["mime"] == "image/fake-resized"
