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
