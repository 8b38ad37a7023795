"""Time-window merge semantics (reference config.py:180-212) incl. the
SURVEY.md §5.3 property: every time window is owned by the latest batch
that covered it."""

import datetime as dt
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.operators.merge import (
    merge_cutoff,
    merge_into_path,
    merge_time_window,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["pk", "d", "v"])


def test_merge_discards_restated_window(spark):
    base = _df(spark, [(1, dt.date(2024, 1, 1), "old"), (2, dt.date(2024, 3, 1), "old")])
    new = _df(spark, [(3, dt.date(2024, 2, 15), "new")])
    out = {r["pk"]: r["v"] for r in merge_time_window(base, new, "d").collect()}
    # base row at 2024-03-01 falls in the new batch's owned window → discarded
    assert out == {1: "old", 3: "new"}


def test_merge_empty_new_batch_is_identity(spark):
    base = _df(spark, [(1, dt.date(2024, 1, 1), "old")])
    new = _df(spark, []).limit(0) if False else spark.createDataFrame([], base.schema)
    assert merge_cutoff(new, "d") is None
    assert merge_time_window(base, new, "d").count() == 1


def test_merge_property_latest_batch_owns_window(spark):
    """Random batch sequences: final state row-for-row equals the
    sequential replay of 'batch owns [min(batch.d), ∞)'."""
    rng = random.Random(7)
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(60)]
    batches = []
    for b in range(4):
        start = rng.randint(0, 40)
        width = rng.randint(5, 20)
        batches.append(
            [(1000 * b + i, days[start + i % width], f"b{b}") for i in range(rng.randint(3, 12))]
        )
    # engine fold
    state = _df(spark, batches[0])
    for batch in batches[1:]:
        state = merge_time_window(state, _df(spark, batch), "d")
    got = sorted((r["pk"], str(r["d"]), r["v"]) for r in state.collect())
    # oracle replay in plain python
    rows = list(batches[0])
    for batch in batches[1:]:
        cut = min(d for _, d, _ in batch)
        rows = [r for r in rows if r[1] < cut] + batch
    want = sorted((pk, str(d), v) for pk, d, v in rows)
    assert got == want


def test_merge_into_path_staged_overwrite(spark, tmp_path):
    """Read-then-overwrite the same path must work (staging swap), and
    month partitioning must prune below the cutoff."""
    base_path = str(tmp_path / "base")
    b1 = _df(spark, [(1, dt.date(2024, 1, 10), "a"), (2, dt.date(2024, 2, 10), "a")])
    merge_into_path(spark, base_path, b1, "d")
    b2 = _df(spark, [(3, dt.date(2024, 2, 1), "b")])
    merge_into_path(spark, base_path, b2, "d")
    out = {r["pk"]: r["v"] for r in spark.read.parquet(base_path).collect()}
    assert out == {1: "a", 3: "b"}
    # partition layout exists (month dirs)
    assert any(p.name.startswith("_merge_month=") for p in Path(base_path).iterdir() if p.is_dir())


def test_merge_upsert_latest_wins_and_insert(spark):
    from awi_datapipelinepublic_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, 10, "old"), (2, 10, "keep"), (3, 30, "newer-than-update")],
        ["k", "ver", "val"],
    )
    updates = spark.createDataFrame(
        [(1, 20, "updated"), (3, 20, "stale"), (4, 5, "inserted")],
        ["k", "ver", "val"],
    )
    out = {r["k"]: (r["ver"], r["val"]) for r in merge_upsert(base, updates, ["k"], "ver").collect()}
    assert out[1] == (20, "updated")      # matched, update newer
    assert out[2] == (10, "keep")         # unmatched base row survives
    assert out[3] == (30, "newer-than-update")  # stale update loses
    assert out[4] == (5, "inserted")      # not-matched insert


def test_merge_upsert_tie_prefers_update_side(spark):
    from awi_datapipelinepublic_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, 10, "base")], ["k", "ver", "val"])
    updates = spark.createDataFrame([(1, 10, "update")], ["k", "ver", "val"])
    [row] = merge_upsert(base, updates, ["k"], "ver").collect()
    assert row["val"] == "update"


def test_scd2_merge_islands_and_validity(spark):
    from awi_datapipelinepublic_spark.operators.merge import scd2_merge

    d = dt.datetime
    h = spark.createDataFrame(
        [
            (1, "A", d(2024, 1, 1)),
            (1, "A", d(2024, 1, 2)),   # same value → same island
            (1, "B", d(2024, 1, 3)),   # change
            (1, "A", d(2024, 1, 4)),   # back to A → NEW island, not merged
            (2, "X", d(2024, 1, 1)),
        ],
        ["k", "state", "eff"],
    )
    rows = sorted(
        scd2_merge(h, ["k"], "state", "eff").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    k1 = [r for r in rows if r["k"] == 1]
    assert [(r["state"], r["valid_from"].day) for r in k1] == [("A", 1), ("B", 3), ("A", 4)]
    assert k1[0]["valid_to"] == d(2024, 1, 3) and not k1[0]["is_current"]
    assert k1[1]["valid_to"] == d(2024, 1, 4)
    assert k1[2]["valid_to"] is None and k1[2]["is_current"]
    [k2] = [r for r in rows if r["k"] == 2]
    assert k2["is_current"] and k2["valid_to"] is None


def test_dataset_diff_statuses_and_null_safety(spark):
    """All four statuses; NULL vs '' must count as changed (the
    null-tagged hash), NULL == NULL as unchanged."""
    from awi_datapipelinepublic_spark.operators.merge import dataset_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, ""), (5, None)],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, ""), (5, None), (6, "new")],
        "k long, v string",
    )
    got = {r["k"]: r["diff_status"] for r in dataset_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",   # NULL -> '' is a real change, not hash-equal
        4: "removed",
        5: "unchanged", # NULL -> NULL
        6: "added",
    }
