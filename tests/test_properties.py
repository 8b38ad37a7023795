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
