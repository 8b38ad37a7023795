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
    exact answers (HLL rsd=0.02 → allow 6%; t-digest median → 5%).
    The gate computes the comparison in-plan and emits INT flags (its
    hash-verified contract); this pins the flags AND re-derives the
    exact side independently so a broken exact aggregate can't
    self-certify."""
    import __spark_entry__ as em

    rows = {r["l_returnflag"]: r for r in em.q_agg_approx(spark, sf_dir).collect()}
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
    assert set(rows) == set(exact)
    for flag, e in exact.items():
        a = rows[flag]
        assert a["hll_within_bounds"] == 1 and a["tdigest_within_bounds"] == 1
        assert a["exact_parts"] == e["parts"]
        assert abs(a["exact_median_price"] - e["median_price"]) < 1e-4


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


def test_multimodal_decode_pluggable_decoder(spark, sf_dir):
    """The real-codec seam: a user-supplied bytes→dict decoder with its
    own output schema rides the SAME mapInPandas plan as the stub — a
    production deploy swaps one callable, not the pipeline."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    with_bin = attach_binary_payload(docs)

    def fake_real_decoder(payload: bytes) -> dict:
        # stands in for PIL.Image.open(io.BytesIO(payload))
        return {
            "width": int.from_bytes(payload[:2], "big") if len(payload) >= 2 else 0,
            "height": len(payload) // 2,
            "mode": "RGB" if payload else "EMPTY",
        }

    out = decode_media(
        with_bin,
        decoder=fake_real_decoder,
        schema="doc_id long, width long, height long, mode string",
    )
    assert out.columns == ["doc_id", "width", "height", "mode"]
    rows = {r["doc_id"]: r for r in out.collect()}
    src = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}
    assert len(rows) == 10
    for doc_id, raw in src.items():
        r = rows[doc_id]
        assert r["width"] == int.from_bytes(raw[:2], "big")
        assert r["height"] == len(raw) // 2
        assert r["mode"] == "RGB"


def _make_png(width: int, height: int, corrupt_crc: bool = False) -> bytes:
    """Build a real, spec-valid 8-bit grayscale PNG byte string with
    only the stdlib: signature + IHDR + IDAT (zlib-compressed filtered
    scanlines) + IEND."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        if corrupt_crc and ctype == b"IDAT":
            crc ^= 0xDEADBEEF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes((x * 7 + y) % 256 for x in range(width))
                   for y in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_real_format_through_map_in_pandas(spark):
    """The shipped non-stub decoder: REAL PNG byte strings flow through
    the identical mapInPandas seam and come back with their true IHDR
    dimensions and a verified chunk CRC — plus the sentinel row for a
    corrupt-CRC PNG and for a non-PNG payload in the same batch."""
    from awi_datapipelinepublic_spark.operators.multimodal import (
        PNG_SCHEMA,
        png_decoder,
    )

    payloads = [
        (1, _make_png(3, 2)),
        (2, _make_png(640, 1)),
        (3, _make_png(5, 5, corrupt_crc=True)),
        (4, b"definitely not a png"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = decode_media(df, decoder=png_decoder(), schema=PNG_SCHEMA)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert (rows[1]["width"], rows[1]["height"]) == (3, 2)
    assert (rows[1]["bit_depth"], rows[1]["color_type"], rows[1]["crc_ok"]) == (8, 0, 1)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["crc_ok"]) == (640, 1, 1)
    # corrupt IDAT CRC: geometry still parses, integrity flag drops
    assert (rows[3]["width"], rows[3]["height"], rows[3]["crc_ok"]) == (5, 5, 0)
    assert (rows[4]["width"], rows[4]["crc_ok"]) == (-1, 0)
    # and plain-python replay agrees with the distributed path
    dec = png_decoder()
    assert dec(_make_png(3, 2))["width"] == 3
    assert dec(b"")["width"] == -1


def test_resize_stub_rewrites_payload_and_meta(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    resized = resize_stub(attach_binary_payload(docs), 100, 100)
    r = resized.first()
    assert len(r["payload"]) <= 100
    assert r["media_meta"]["mime"] == "image/fake-resized"


def test_range_join_binned_matches_theta_join(spark):
    """Binning + residual filter must reproduce the naive range join
    exactly — boundary timestamps (ts == lo inclusive, ts == hi
    exclusive) and intervals spanning multiple bins included."""
    from awi_datapipelinepublic_spark.operators.joins import range_join_binned

    fact = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=7 * i)) for i in range(200)],
        "fid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 1, 0), dt.datetime(2024, 1, 1, 2, 0)),
            (2, dt.datetime(2024, 1, 1, 1, 30), dt.datetime(2024, 1, 1, 9, 30)),
            (3, dt.datetime(2024, 1, 1, 5, 0), dt.datetime(2024, 1, 1, 5, 0)),  # empty
            (4, dt.datetime(2024, 1, 2, 23, 0), dt.datetime(2024, 1, 3, 1, 0)),
        ],
        "iv_id long, lo timestamp, hi timestamp",
    )
    got = sorted(
        (r["fid"], r["iv_id"])
        for r in range_join_binned(fact, iv, "ts", "lo", "hi", 3600).collect()
    )
    want = sorted(
        (r["fid"], r["iv_id"])
        for r in fact.join(iv, (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))).collect()
    )
    assert got == want and len(got) > 0


def test_keep_first_exactly_one_row_per_key(spark):
    from awi_datapipelinepublic_spark.operators.windows import keep_first

    df = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 9, "z"), (3, 5, "m"), (3, 5, "n")],
        "k long, seq long, v string",
    )
    out = keep_first(df, ["k"], [F.col("seq").asc(), F.col("v").asc()]).collect()
    assert sorted((r["k"], r["v"]) for r in out) == [(1, "a"), (2, "z"), (3, "m")]


def test_date_spine_is_dense_and_gapfill_zero_fills(spark):
    from awi_datapipelinepublic_spark.operators.timeseries import date_spine, gap_fill

    spine = date_spine(spark, "2024-01-01", "2024-06-01")
    months = [r["period"].isoformat() for r in spine.orderBy("period").collect()]
    assert months == ["2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01", "2024-05-01", "2024-06-01"]

    observed = spark.createDataFrame(
        [(dt.date(2024, 2, 1), 5), (dt.date(2024, 5, 1), 2)], "period date, n long"
    )
    filled = gap_fill(spine, observed, ["period"], {"n": 0})
    vals = {r["period"].isoformat(): r["n"] for r in filled.collect()}
    assert vals["2024-02-01"] == 5 and vals["2024-05-01"] == 2
    assert sum(v == 0 for v in vals.values()) == 4


def test_train_test_split_is_stable_and_reasonably_proportioned(spark, sf_dir):
    """Same id → same split on re-run and under re-partitioning (no RNG
    state); fractions land near the 10/10/80 design at corpus size."""
    from awi_datapipelinepublic_spark.operators.sampling import train_val_test_split

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in train_val_test_split(d, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(d.repartition(13), "doc_id").collect()
    }
    assert a == b
    n = len(a)
    frac = {s: sum(v == s for v in a.values()) / n for s in ("train", "val", "test")}
    assert 0.70 <= frac["train"] <= 0.90
    assert 0.05 <= frac["val"] <= 0.16 and 0.05 <= frac["test"] <= 0.16


def test_chunk_documents_covers_every_token_with_overlap(spark):
    """Chunks must tile the token sequence: chunk i starts at i·stride,
    consecutive chunks share exactly `overlap` tokens, and no token is
    dropped (tail chunks may be short but never missing)."""
    from awi_datapipelinepublic_spark.operators.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(137))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, size=50, overlap=10).collect(), key=lambda r: r["chunk_no"]
    )
    assert [r["chunk_no"] for r in rows] == [0, 1, 2, 3]
    toks = text.split(" ")
    for r in rows:
        start = r["chunk_no"] * 40
        assert r["chunk_text"] == " ".join(toks[start : start + 50])
    # union of chunks = the whole document
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split(" "))
    assert seen == set(toks)
    assert rows[-1]["n_chunk_tokens"] == 137 - 3 * 40


def test_stratified_sample_boundary_fractions(spark, sf_dir):
    """frac=1.0 must keep EVERY row of the stratum (regression: a
    256→'100' string threshold kept ~6.6%), frac=0.0 must keep none."""
    from awi_datapipelinepublic_spark.operators.sampling import stratified_sample_hash

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = stratified_sample_hash(
        c, "c_mktsegment", "c_custkey", {"BUILDING": 1.0}, default_fraction=0.0
    )
    n_building = c.filter(F.col("c_mktsegment") == "BUILDING").count()
    got = out.collect()
    assert len(got) == n_building
    assert all(r["c_mktsegment"] == "BUILDING" for r in got)


def test_stratified_sample_rates_follow_fractions(spark, sf_dir):
    from awi_datapipelinepublic_spark.operators.sampling import stratified_sample_hash

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = stratified_sample_hash(
        c, "c_mktsegment", "c_custkey", {"BUILDING": 0.5}, default_fraction=0.05
    )
    base = {r["c_mktsegment"]: r["n"] for r in c.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()}
    got = {r["c_mktsegment"]: r["n"] for r in out.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()}
    assert 0.35 <= got["BUILDING"] / base["BUILDING"] <= 0.65
    for seg, n in base.items():
        if seg != "BUILDING":
            assert got.get(seg, 0) / n <= 0.15


def test_python_datasource_partitioned_and_deterministic(spark):
    """The custom Python DataSource must honor its partition option
    (task-parallel read) and produce identical content across reads."""
    import hashlib

    from awi_datapipelinepublic_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 200)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert len(rows) == 200
    assert rows[7] == hashlib.md5(b"7").hexdigest()[:8]
    again = {r["doc_id"]: r["text"] for r in df.collect()}
    assert rows == again


def test_redact_pii_categories_and_order(spark):
    """Each PII category gets its typed token; an SSN is never
    half-eaten by the phone pattern; clean text passes through."""
    from pyspark.sql import functions as F

    from awi_datapipelinepublic_spark.functions.privacy import pii_counts, redact_pii

    rows = [
        ("a", "mail me at jane.doe+x@sub.example.co.uk today"),
        ("b", "server at 192.168.001.12 port 80"),
        ("c", "ssn 123-45-6789 on file"),
        ("d", "call (415) 555-0134 or +1 415.555.0134 x9"),
        ("e", "no pii here, just 42 and 3.14"),
    ]
    df = spark.createDataFrame(rows, ["k", "s"])
    got = {
        r["k"]: (r["clean"], r["c"])
        for r in df.select(
            "k", redact_pii("s").alias("clean"), pii_counts("s").alias("c")
        ).collect()
    }
    assert got["a"][0] == "mail me at <EMAIL> today"
    assert got["a"][1]["emails"] == 1 and got["a"][1]["phones"] == 0
    assert got["b"][0] == "server at <IP> port 80"
    assert got["c"][0] == "ssn <SSN> on file"
    assert got["c"][1]["ssns"] == 1 and got["c"][1]["phones"] == 0
    assert got["d"][0] == "call <PHONE> or <PHONE> x9"
    assert got["d"][1]["phones"] == 2
    assert got["e"][0] == rows[4][1]
    assert all(v == 0 for v in got["e"][1].asDict().values())


def test_repetition_stats_flags_boilerplate(spark):
    """A one-phrase doc scores ~1.0 dup fraction; diverse text stays
    low; short docs still get a row."""
    from awi_datapipelinepublic_spark.operators.quality import repetition_stats

    rows = [
        (1, "buy now " * 20),                  # pure boilerplate
        (2, "the quick brown fox jumps over a lazy dog near banks"),
        (3, "hi"),                              # shorter than n
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    assert got[1]["top_gram_frac"] > 0.4 and got[1]["dup_gram_frac"] > 0.9
    assert got[2]["dup_gram_frac"] == 0.0
    assert got[3]["n_grams"] == 1 and got[3]["top_gram_frac"] == 1.0


def test_decontaminate_removes_overlapping_docs(spark):
    """A corpus doc sharing a 7-gram with the benchmark is dropped;
    a disjoint doc survives; benchmark-internal overlap is ignored."""
    from awi_datapipelinepublic_spark.operators.quality import (
        contaminated_ids,
        decontaminate,
    )

    leak = "alpha beta gamma delta epsilon zeta eta theta iota"
    bench = spark.createDataFrame([(100, leak)], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "prefix words " + leak + " suffix words"),   # contains the 7-gram
            (2, "completely different content with no overlap at all here ok"),
        ],
        ["doc_id", "text"],
    )
    assert [r["doc_id"] for r in contaminated_ids(corpus, bench, n=7).collect()] == [1]
    assert [r["doc_id"] for r in decontaminate(corpus, bench, n=7).collect()] == [2]
