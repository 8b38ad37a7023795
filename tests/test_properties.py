"""Hypothesis property tests for the engine's scalar semantics.

Each property pins an engine expression to its specification on
generated inputs — the classes of dirt the reference's data exhibits
(arbitrary quoting, unicode, whitespace runs) rather than hand-picked
examples. Batched: one Spark job per property, not per example.
"""

import datetime as dt
import sys
from pathlib import Path

from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.functions.cleaning import strip_excel
from awi_datapipelinepublic_spark.functions.text import token_count
from awi_datapipelinepublic_spark.operators.merge import merge_time_window

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_strip_excel_matches_python_semantics(spark, data):
    cases = data.draw(st.lists(text_st, min_size=1, max_size=200))
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    got = [r["s"] for r in df.select(strip_excel("raw").alias("s")).collect()]
    want = [c.strip('"=') for c in cases]
    assert got == want


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_token_count_matches_python_split(spark, data):
    cases = data.draw(st.lists(text_st, min_size=1, max_size=200))
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [r["n"] for r in df.select(token_count("text").alias("n")).collect()]
    want = [len(c.split()) for c in cases]
    assert got == want


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_merge_window_ownership_property(spark, data):
    """Replay invariant: after folding random batches, every row with
    date ≥ min(last batch) comes from the last batch, and the engine
    result equals the pure-python replay."""
    day0 = dt.date(2024, 1, 1)
    batches = data.draw(
        st.lists(
            st.lists(
                st.tuples(st.integers(0, 10_000), st.integers(0, 90), st.sampled_from("abc")),
                min_size=1,
                max_size=8,
            ),
            min_size=2,
            max_size=4,
        )
    )
    sp_state = None
    py_state: list[tuple[int, dt.date, str]] = []
    for bi, batch in enumerate(batches):
        rows = [(pk + bi * 100_000, day0 + dt.timedelta(days=d), v) for pk, d, v in batch]
        bdf = spark.createDataFrame(rows, "pk long, d date, v string")
        sp_state = bdf if sp_state is None else merge_time_window(sp_state, bdf, "d")
        cut = min(d for _, d, _ in rows)
        py_state = [r for r in py_state if r[1] < cut] + rows if py_state else rows
    got = sorted((r["pk"], str(r["d"]), r["v"]) for r in sp_state.collect())
    want = sorted((pk, str(d), v) for pk, d, v in py_state)
    assert got == want


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_range_join_binned_equals_theta_join_property(spark, data):
    """For random timestamps, intervals, and bin widths, the binned
    equi-join + residual filter must equal the naive range join."""
    from pyspark.sql import functions as F

    from awi_datapipelinepublic_spark.operators.joins import range_join_binned

    base = dt.datetime(2024, 1, 1)
    n_fact = data.draw(st.integers(5, 60))
    facts = [
        (i, base + dt.timedelta(seconds=data.draw(st.integers(0, 200_000))))
        for i in range(n_fact)
    ]
    ivs = []
    for j in range(data.draw(st.integers(1, 8))):
        lo = data.draw(st.integers(0, 200_000))
        ln = data.draw(st.integers(0, 30_000))
        ivs.append((j, base + dt.timedelta(seconds=lo), base + dt.timedelta(seconds=lo + ln)))
    bin_s = data.draw(st.sampled_from([60, 3600, 7200]))

    fact = spark.createDataFrame(facts, "fid long, ts timestamp")
    iv = spark.createDataFrame(ivs, "iv_id long, lo timestamp, hi timestamp")
    got = sorted(
        (r["fid"], r["iv_id"])
        for r in range_join_binned(fact, iv, "ts", "lo", "hi", bin_s).collect()
    )
    want = sorted(
        (f, j)
        for f, ts in facts
        for j, lo, hi in ivs
        if lo <= ts < hi
    )
    assert got == want


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_chunking_tiles_tokens_property(spark, data):
    """For random texts and (size, overlap), chunk i must equal tokens
    [i*stride : i*stride+size] and chunks must cover every token."""
    from awi_datapipelinepublic_spark.operators.chunking import chunk_documents

    size = data.draw(st.integers(2, 20))
    overlap = data.draw(st.integers(0, size - 1))
    stride = size - overlap
    texts = data.draw(
        st.lists(
            st.lists(st.sampled_from(["a", "bb", "ccc", "z9"]), min_size=0, max_size=60),
            min_size=1,
            max_size=20,
        )
    )
    rows = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, size=size, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_no"]] = r["chunk_text"]
    for i, toks in enumerate(texts):
        # engine tokenization of "a b c" == toks; empty text → ['']
        norm = " ".join(toks).split(" ") if rows[i][1] else [""]
        chunks = by_doc[i]
        assert sorted(chunks) == list(range(len(chunks)))
        for cn, ctext in chunks.items():
            assert ctext == " ".join(norm[cn * stride : cn * stride + size])
        covered = set()
        for cn in chunks:
            covered.update(range(cn * stride, min(cn * stride + size, len(norm))))
        assert covered == set(range(len(norm)))
        # No redundant suffix chunks: every chunk after the first must
        # contribute at least one token not covered by its predecessor
        # (a start at or past n - overlap is a strict suffix — dup data).
        for cn in chunks:
            if cn > 0:
                assert cn * stride < len(norm) - overlap


@settings(max_examples=2, deadline=None)
@given(st.data())
def test_merge_upsert_idempotent_and_complete(spark, data):
    """Upsert laws on random key/version batches: (1) applying the
    same updates twice equals applying them once (idempotence);
    (2) every key from either side appears exactly once; (3) a key's
    surviving version is the max version seen for it."""
    from awi_datapipelinepublic_spark.operators.merge import merge_upsert

    kv = st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 50)), min_size=1, max_size=60
    )
    base_rows = [(k, v, f"b{k}_{v}") for k, v in data.draw(kv)]
    upd_rows = [(k, v, f"u{k}_{v}") for k, v in data.draw(kv)]
    # one row per (side, key): keep max version per key within a side
    dedupe = lambda rows: list({k: (k, v, p) for k, v, p in sorted(rows)}.values())  # noqa: E731
    base_rows, upd_rows = dedupe(base_rows), dedupe(upd_rows)
    base = spark.createDataFrame(base_rows, ["k", "ver", "val"])
    upd = spark.createDataFrame(upd_rows, ["k", "ver", "val"])

    once = merge_upsert(base, upd, ["k"], "ver")
    twice = merge_upsert(once, upd, ["k"], "ver")
    got_once = {r["k"]: (r["ver"], r["val"]) for r in once.collect()}
    got_twice = {r["k"]: (r["ver"], r["val"]) for r in twice.collect()}
    assert got_once == got_twice

    b = {k: (v, p) for k, v, p in base_rows}
    u = {k: (v, p) for k, v, p in upd_rows}
    assert set(got_once) == set(b) | set(u)
    for k, (ver, _val) in got_once.items():
        want_ver = max(x[0] for x in [b.get(k), u.get(k)] if x is not None)
        assert ver == want_ver


@settings(max_examples=2, deadline=None)
@given(st.data())
def test_segment_dedup_no_repeated_segments_property(spark, data):
    """Post-condition on random word soups: after segment dedup no
    segment (span_words window re-derived from the OUTPUT) occurs
    twice corpus-wide, and every output segment existed in the
    input."""
    from awi_datapipelinepublic_spark.operators.dedup import segment_exact_dedup

    words = st.sampled_from(["a", "b", "c", "d", "e"])
    doc = st.lists(words, min_size=1, max_size=12).map(" ".join)
    docs = data.draw(st.lists(doc, min_size=1, max_size=12))
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = segment_exact_dedup(df, span_words=3).collect()

    seen = []
    for r in out:
        toks = r["text"].split()
        segs = [" ".join(toks[i : i + 3]) for i in range(0, len(toks), 3)]
        seen.extend(segs)
    assert len(seen) == len(set(seen)), f"repeated segment in {seen}"
    in_segs = set()
    for d in docs:
        toks = d.split()
        in_segs.update(" ".join(toks[i : i + 3]) for i in range(0, len(toks), 3))
    assert set(seen) <= in_segs


@settings(max_examples=2, deadline=None)
@given(st.data())
def test_scd2_intervals_partition_history_property(spark, data):
    """On a random change log: intervals per key are contiguous
    (valid_to == next valid_from), exactly one open interval per key,
    and consecutive intervals never carry the same value."""
    import datetime as _dt

    from awi_datapipelinepublic_spark.operators.merge import scd2_merge

    ev = st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["A", "B", "C"])),
        min_size=1,
        max_size=40,
    )
    rows = [
        (k, v, _dt.datetime(2024, 1, 1) + _dt.timedelta(hours=i))
        for i, (k, v) in enumerate(data.draw(ev))
    ]
    df = spark.createDataFrame(rows, ["k", "state", "eff"])
    out = sorted(
        scd2_merge(df, ["k"], "state", "eff").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    from itertools import groupby

    for k, grp in groupby(out, key=lambda r: r["k"]):
        grp = list(grp)
        assert sum(1 for r in grp if r["is_current"]) == 1
        assert grp[-1]["is_current"] and grp[-1]["valid_to"] is None
        for a, nxt in zip(grp, grp[1:]):
            assert a["valid_to"] == nxt["valid_from"]
            assert a["state"] != nxt["state"]


@settings(max_examples=2, deadline=None)
@given(st.data())
def test_remove_dup_spans_reconstruction_property(spark, data):
    """On random word-soup corpora: surviving tokens are a subsequence
    of the original token stream; n_removed accounting is exact; a doc
    whose every 3-gram is unique corpus-wide passes through verbatim."""
    from awi_datapipelinepublic_spark.operators.quality import remove_duplicated_spans

    words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
    docs = data.draw(
        st.lists(st.lists(words, min_size=0, max_size=12), min_size=2, max_size=12)
    )
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, n=3).collect()}
    assert set(out) == set(range(len(docs)))
    for i, ws in enumerate(docs):
        toks = (" ".join(ws)).split(" ") if ws else [""]
        # an empty doc tokenizes to [''] and carries no 3-gram, so its
        # single empty token always survives (clean_text '' == [''])
        kept = (
            out[i]["clean_text"].split(" ")
            if (out[i]["clean_text"] or toks == [""])
            else []
        )
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["n_removed"] == len(toks) - len(kept)
        # kept must be a subsequence of the original tokens
        it = iter(toks)
        assert all(any(t == o for o in it) for t in kept), (toks, kept)


@settings(max_examples=2, deadline=None)
@given(st.data())
def test_containment_bounds_and_subset_property(spark, data):
    """Containment ratios live in (0, 1]; when A's shingle set is a
    subset of B's (A literally embedded in B), cont_a_in_b == 1."""
    from awi_datapipelinepublic_spark.operators.dedup import ngram_containment_pairs

    words = st.sampled_from([f"w{i}" for i in range(30)])
    core = data.draw(st.lists(words, min_size=4, max_size=8))
    prefix = data.draw(st.lists(words, min_size=4, max_size=8))
    suffix = data.draw(st.lists(words, min_size=4, max_size=8))
    rows = [(1, " ".join(core)), (2, " ".join(prefix + core + suffix))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = ngram_containment_pairs(df, k=3, threshold=0.0).collect()
    for r in got:
        assert 0.0 < r["cont_a_in_b"] <= 1.0 and 0.0 < r["cont_b_in_a"] <= 1.0
    pair = [r for r in got if (r["id_a"], r["id_b"]) == (1, 2)]
    assert pair and pair[0]["cont_a_in_b"] == 1.0


@settings(max_examples=2, deadline=None)
@given(st.data())
def test_dataset_diff_identities_property(spark, data):
    """diff(x, x) is all-unchanged; diff(empty-side, x) is all-added;
    diff(x, empty-side) is all-removed — on arbitrary keyed payloads
    including NULLs."""
    from awi_datapipelinepublic_spark.operators.merge import dataset_diff

    vals = st.one_of(st.none(), st.text(max_size=6))
    rows = data.draw(
        st.lists(st.tuples(st.integers(0, 50), vals), min_size=1, max_size=30,
                 unique_by=lambda t: t[0])
    )
    x = spark.createDataFrame(rows, "k long, v string")
    empty = spark.createDataFrame([], "k long, v string")
    same = {r["diff_status"] for r in dataset_diff(x, x, ["k"]).collect()}
    assert same == {"unchanged"}
    added = {r["diff_status"] for r in dataset_diff(empty, x, ["k"]).collect()}
    assert added == {"added"}
    removed = {r["diff_status"] for r in dataset_diff(x, empty, ["k"]).collect()}
    assert removed == {"removed"}


@settings(max_examples=2, deadline=None)
@given(data=st.data())
def test_merge_into_path_replay_idempotent_property(spark, tmp_path_factory, data):
    """The streaming file-pipeline's replay safety rests on
    merge_into_path being naturally idempotent (window rewrite, not
    append): merging the same batch twice must equal merging it
    once — on random bases and batches."""
    import datetime as _dt

    from awi_datapipelinepublic_spark.operators.merge import merge_into_path

    tmp = tmp_path_factory.mktemp("merge_replay")
    dates = [_dt.date(2024, 1 + (i % 4), 1 + (i % 27)) for i in range(40)]
    base_rows = data.draw(
        st.lists(st.tuples(st.integers(0, 999), st.sampled_from(dates)),
                 min_size=1, max_size=25)
    )
    batch_rows = data.draw(
        st.lists(st.tuples(st.integers(1000, 1999), st.sampled_from(dates)),
                 min_size=1, max_size=25)
    )
    path = str(tmp / "base")
    spark.createDataFrame(base_rows, "pk long, d date").write.parquet(path)
    batch = spark.createDataFrame(batch_rows, "pk long, d date")
    merge_into_path(spark, path, batch, "d")
    once = sorted((r["pk"], r["d"]) for r in spark.read.parquet(path).collect())
    merge_into_path(spark, path, batch, "d")  # replay
    twice = sorted((r["pk"], r["d"]) for r in spark.read.parquet(path).collect())
    assert once == twice


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_token_budget_property(spark, data):
    """For any corpus and budget: (1) no group's kept total exceeds
    the budget; (2) the kept set per group is the maximal md5-order
    prefix — re-adding the first excluded doc would exceed it."""
    from awi_datapipelinepublic_spark.operators.sampling import token_budget_select

    rows = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),  # id
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=500),  # tokens
            ),
            min_size=1,
            max_size=120,
            unique_by=lambda t: t[0],
        )
    )
    budget = data.draw(st.integers(min_value=1, max_value=2_000))
    df = spark.createDataFrame(rows, ["id", "src", "n_tok"])
    kept = token_budget_select(df, "src", "id", "n_tok", budget).collect()
    import hashlib

    def md5key(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    by_src = {}
    for i, s, t in rows:
        by_src.setdefault(s, []).append((md5key(i), i, t))
    kept_by_src = {}
    for r in kept:
        kept_by_src.setdefault(r["src"], set()).add(r["id"])
    for s, members in by_src.items():
        members.sort()
        acc, want = 0, set()
        for _, i, t in members:
            if acc + t > budget:
                break
            acc += t
            want.add(i)
        assert kept_by_src.get(s, set()) == want, (s, budget)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_assign_shards_range_and_stability_property(spark, data):
    from awi_datapipelinepublic_spark.operators.sampling import assign_shards

    ids = data.draw(
        st.lists(st.integers(min_value=-(10**9), max_value=10**9),
                 min_size=1, max_size=150, unique=True)
    )
    n = data.draw(st.integers(min_value=1, max_value=64))
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    out = {r["id"]: r["shard"] for r in assign_shards(df, "id", n).collect()}
    assert all(0 <= s < n for s in out.values())
    # engine-portable definition: md5-derived 32-bit value mod n
    import hashlib

    for i in ids:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        assert out[i] == h % n, (i, n)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_calibrate_scores_bounds_and_monotone_property(spark, data):
    from awi_datapipelinepublic_spark.operators.quality import calibrate_scores

    rows = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.sampled_from(["x", "y"]),
                st.integers(min_value=-50, max_value=50),
            ),
            min_size=2,
            max_size=100,
            unique_by=lambda t: t[0],
        )
    )
    df = spark.createDataFrame(rows, ["id", "src", "score"])
    out = calibrate_scores(df, "src", "score", "id").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    for grp in by_src.values():
        grp.sort(key=lambda r: (r["score"], r["id"]))
        cal = [r["calibrated"] for r in grp]
        assert all(0.0 <= c <= 1.0 for c in cal)
        assert cal == sorted(cal)
        if len(grp) > 1:
            assert cal[0] == 0.0 and cal[-1] == 1.0


@settings(max_examples=2, deadline=None)
@given(st.data())
def test_gopher_signals_match_python_reference(spark, data):
    """mean_word_length / alpha_word_ratio / symbol_word_ratio equal a
    pure-python replay of the spec on ASCII text (the signals divide
    exact integers, so the doubles must match bit-for-bit)."""
    import re

    from awi_datapipelinepublic_spark.functions.text import (
        alpha_word_ratio,
        mean_word_length,
        symbol_word_ratio,
    )

    ascii_st = st.text(
        alphabet=st.sampled_from("abcz# .!109"), min_size=0, max_size=30
    )
    cases = data.draw(st.lists(ascii_st, min_size=1, max_size=150))
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = df.select(
        mean_word_length("text").alias("m"),
        alpha_word_ratio("text").alias("a"),
        symbol_word_ratio("text").alias("s"),
    ).collect()

    for c, row in zip(cases, got):
        words = c.lower().split()
        if not words:
            assert (row["m"], row["a"], row["s"]) == (0.0, 0.0, 0.0), c
            continue
        n = len(words)
        assert row["m"] == sum(len(w) for w in words) / n, c
        assert row["a"] == sum(1 for w in words if re.search("[a-z]", w)) / n, c
        norm = " ".join(words)
        symbols = norm.count("#") + len(re.findall(r"\.\.\.", norm))
        assert row["s"] == symbols / n, c


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_interval_overlap_join_equals_theta_property(spark, data):
    """Binned interval-interval overlap == the naive theta join on
    random half-open integer intervals, for a random bin width — pairs
    exactly once each (no duplicates from multi-bin co-occupancy)."""
    from pyspark.sql import functions as F

    from awi_datapipelinepublic_spark.operators.joins import interval_overlap_join

    def iv(i):
        lo = data.draw(st.integers(min_value=-50, max_value=200))
        ln = data.draw(st.integers(min_value=1, max_value=60))
        return (i, lo, lo + ln)

    left = [iv(i) for i in range(data.draw(st.integers(min_value=1, max_value=25)))]
    right = [iv(i) for i in range(data.draw(st.integers(min_value=1, max_value=25)))]
    width = data.draw(st.integers(min_value=1, max_value=40))
    ldf = spark.createDataFrame(left, "lid long, lo long, hi long")
    rdf = spark.createDataFrame(right, "rid long, rlo long, rhi long")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(ldf, rdf, "lo", "hi", "rlo", "rhi", width).collect()
    )
    want = sorted(
        (a[0], b[0]) for a in left for b in right if a[1] < b[2] and b[1] < a[2]
    )
    assert got == want


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_ks_drift_matches_pure_python_property(spark, data):
    """Exact KS statistic == a pure-Python empirical-CDF sup computed
    on the same random integer samples."""
    from fractions import Fraction

    from awi_datapipelinepublic_spark.operators.quality import ks_drift

    a = data.draw(st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=60))
    b = data.draw(st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=60))
    ra = spark.createDataFrame([(v,) for v in a], "x long")
    rb = spark.createDataFrame([(v,) for v in b], "x long")
    got = ks_drift(ra, rb, "x").first()["ks_stat"]
    vals = sorted(set(a) | set(b))
    want = max(
        abs(
            Fraction(sum(1 for v in a if v <= t), len(a))
            - Fraction(sum(1 for v in b if v <= t), len(b))
        )
        for t in vals
    )
    assert got == round(float(want), 6)


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_gini_matches_pure_python_property(spark, data):
    """Exact Gini == the rank-formula reference on random non-negative
    integer values (computed in exact Fractions, rounded once)."""
    from fractions import Fraction

    from awi_datapipelinepublic_spark.operators.quality import gini_coefficient

    xs = data.draw(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=80)
    )
    df = spark.createDataFrame([(v,) for v in xs], "x long")
    got = gini_coefficient(df, "x").first()
    s = sorted(xs)
    n = len(s)
    if sum(s) == 0:
        return  # degenerate: division by zero domain, not a contract
    want = Fraction(2 * sum((i + 1) * v for i, v in enumerate(s)), n * sum(s)) - Fraction(
        n + 1, n
    )
    assert got["n"] == n
    assert abs(got["gini"] - float(want)) <= 1e-6


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_fuzzy_join_edit1_equals_theta_property(spark, data):
    """Symmetric-delete blocking == the naive levenshtein<=1 theta
    join on random short strings (the blocking must generate EVERY
    true pair as a candidate, including empty strings and repeated
    characters whose deletion variants collide)."""
    from awi_datapipelinepublic_spark.operators.joins import fuzzy_join_edit1

    words = data.draw(
        st.lists(
            st.text(alphabet="ab c", min_size=0, max_size=6),
            min_size=2,
            max_size=30,
        )
    )
    df = spark.createDataFrame([(w,) for w in words], "nm string")
    got = sorted(
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_join_edit1(df, df, "nm", "nm").collect()
    )
    uniq = sorted(set(words))
    want = sorted(
        (a, b, _lev_py(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev_py(a, b) <= 1
    )
    assert got == want


def _lev_py(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_rolling_median_matches_pandas_property(spark, data):
    """Window-percentile rolling median == pandas rolling(frame).median
    on random per-key integer series (integers: both engines' median
    of ints is exact, so the comparison is equality, not tolerance)."""
    import pandas as pd

    from awi_datapipelinepublic_spark.operators.timeseries import rolling_median

    n_keys = data.draw(st.integers(min_value=1, max_value=3))
    frame = data.draw(st.integers(min_value=1, max_value=5))
    rows = []
    series = {}
    for k in range(n_keys):
        vals = data.draw(
            st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=25)
        )
        series[str(k)] = vals
        rows += [(str(k), i, float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id string, ts long, value double, event_id long")
    got = {
        (r["user_id"], r["ts"]): r["rolling_median"]
        for r in rolling_median(df, preceding=frame - 1).collect()
    }
    for k, vals in series.items():
        want = pd.Series(vals, dtype="float64").rolling(frame, min_periods=1).median()
        for i, w in enumerate(want):
            assert got[(k, i)] == round(w, 6), (k, i, vals)
