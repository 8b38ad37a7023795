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


# ---------------------------------------------------------------------------
# Atomic-swap writer: crash recovery at every fault point + multi-batch
# ownership at scale. The reference's base-table replace is a BigQuery
# CREATE OR REPLACE TABLE (config.py:190-199) — atomic by the warehouse
# contract. The engine analog (sources/writers.overwrite_table) stages
# each snapshot to a hidden versioned sibling and re-points a symlink
# with one rename; a kill at ANY step must leave a reader seeing a
# complete old or complete new snapshot — never a mix, never a missing
# table.
# ---------------------------------------------------------------------------

import pathlib

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from awi_datapipelinepublic_spark.sources import writers
from awi_datapipelinepublic_spark.sources.writers import overwrite_table, recover_table


def _rows(spark, path):
    return sorted((r["pk"], r["d"]) for r in spark.read.parquet(str(path)).collect())


def _mk(spark, lo, hi):
    dates = [dt.date(2024, 1 + (i % 6), 1 + (i % 27)) for i in range(lo, hi)]
    return spark.createDataFrame(
        [(i, d) for i, d in zip(range(lo, hi), dates)], "pk long, d date"
    )


@pytest.fixture()
def published(spark, tmp_path):
    """A healthy symlink-published table with known contents."""
    path = tmp_path / "t"
    old = _mk(spark, 0, 50)
    overwrite_table(old, str(path))
    return path, _rows(spark, path)


def test_crash_during_data_write_reads_old(spark, published, tmp_path):
    """Kill mid-materialization: a _SUCCESS-less version dir is debris —
    the pointer still serves the old snapshot and the next publish
    sweeps the junk."""
    path, old_rows = published
    junk = tmp_path / f".{path.name}.v-99999999-dead"
    junk.mkdir()
    (junk / "part-00000.parquet").write_bytes(b"not parquet")
    recover_table(str(path))  # must not roll onto an incomplete dir
    assert _rows(spark, path) == old_rows
    overwrite_table(_mk(spark, 100, 120), str(path))
    assert not junk.exists(), "incomplete crash debris must be GC'd"
    assert _rows(spark, path) == _rows(spark, path)  # readable post-GC


def test_crash_before_swap_reads_old_then_next_publish_wins(
    spark, published, monkeypatch
):
    """Kill between materialization and the pointer flip: the complete
    but unreferenced snapshot is invisible (old rows served) and the
    next publish supersedes it."""
    path, old_rows = published

    def boom(target, vdir):
        raise RuntimeError("killed before swap")

    monkeypatch.setattr(writers, "_point_at", boom)
    with pytest.raises(RuntimeError):
        overwrite_table(_mk(spark, 100, 130), str(path))
    monkeypatch.undo()
    assert _rows(spark, path) == old_rows
    recover_table(str(path))  # healthy pointer → no-op
    assert _rows(spark, path) == old_rows
    new = _mk(spark, 200, 210)
    overwrite_table(new, str(path))
    assert _rows(spark, path) == sorted((r["pk"], r["d"]) for r in new.collect())
    # exactly one referenced snapshot remains
    assert len(list(path.parent.glob(f".{path.name}.v-*"))) == 1


def test_crash_mid_legacy_migration_rolls_forward(spark, tmp_path, monkeypatch):
    """The ONE non-atomic window: migrating a pre-versioning plain dir
    (dir renamed away, symlink not yet in place). recover_table must
    re-point at the newest complete snapshot — old or new, never
    absent, never a mix."""
    path = tmp_path / "legacy"
    old = _mk(spark, 0, 40)
    old.write.parquet(str(path))  # plain dir, pre-versioning layout
    new = _mk(spark, 500, 560)

    calls = {"n": 0}
    real = writers._point_at

    def boom(target, vdir):
        calls["n"] += 1
        raise RuntimeError("killed mid-migration")

    monkeypatch.setattr(writers, "_point_at", boom)
    with pytest.raises(RuntimeError):
        overwrite_table(new, str(path))
    monkeypatch.undo()
    assert calls["n"] == 1
    assert not path.exists() and not path.is_symlink()  # the crash window
    recover_table(str(path))
    got = _rows(spark, path)
    old_rows = sorted((r["pk"], r["d"]) for r in old.collect())
    new_rows = sorted((r["pk"], r["d"]) for r in new.collect())
    assert got in (old_rows, new_rows), "must be exactly one full snapshot"
    assert got == new_rows, "newest complete snapshot wins (roll forward)"
    # table is healthy again: a further publish works and GCs history
    overwrite_table(_mk(spark, 900, 910), str(path))
    assert len(list(path.parent.glob(f".{path.name}.v-*"))) == 1


def test_crash_during_gc_is_self_healing(spark, published, monkeypatch):
    """Kill mid-GC: the new snapshot is already live; stranded old
    dirs are swept by the next publish."""
    path, _ = published
    new = _mk(spark, 300, 330)

    def boom(*a, **k):
        raise RuntimeError("killed during GC")

    monkeypatch.setattr(writers.shutil, "rmtree", boom)
    with pytest.raises(RuntimeError):
        overwrite_table(new, str(path))
    monkeypatch.undo()
    assert _rows(spark, path) == sorted((r["pk"], r["d"]) for r in new.collect())
    overwrite_table(_mk(spark, 400, 410), str(path))
    assert len(list(path.parent.glob(f".{path.name}.v-*"))) == 1


def _merge_expected(batches):
    """Reference semantics replayed in Python: each batch owns
    [min(batch.d), ∞) over the accumulated base."""
    base: list = []
    for batch in batches:
        cutoff = min(d for _, d in batch)
        base = [(pk, d) for pk, d in base if d < cutoff] + list(batch)
    return sorted(base)


@settings(max_examples=3, deadline=None)
@given(data=st.data())
def test_multibatch_ownership_invariant_property(spark, tmp_path_factory, data):
    """SURVEY §5.3: after ANY sequence of merges, every time window is
    owned by the LATEST batch whose range covers it — base rows at or
    past a later batch's cutoff never survive. Random batch sequence,
    month-partitioned storage, Python replay as the oracle."""
    tmp = tmp_path_factory.mktemp("multibatch")
    path = str(tmp / "base")
    months = [dt.date(2024, m, day) for m in range(1, 7) for day in (3, 14, 25)]
    n_batches = data.draw(st.integers(2, 4))
    batches = []
    next_pk = 0
    for _ in range(n_batches):
        rows = data.draw(
            st.lists(st.sampled_from(months), min_size=1, max_size=30)
        )
        batch = [(next_pk + i, d) for i, d in enumerate(rows)]
        next_pk += len(rows)
        batches.append(batch)
        merge_into_path(
            spark,
            path,
            spark.createDataFrame(batch, "pk long, d date"),
            "d",
            partition_by_month=True,
        )
    got = sorted(
        (r["pk"], r["d"])
        for r in spark.read.parquet(path).select("pk", "d").collect()
    )
    assert got == _merge_expected(batches)


def test_merged_base_scan_is_partition_pruned(spark, tmp_path):
    """The point of month partitioning: a month filter over the merged
    base must prune at scan time (PartitionFilters in the scan node),
    including through the atomic writer's symlink indirection."""
    path = str(tmp_path / "base")
    rows = [(i, dt.date(2024, 1 + i % 6, 5)) for i in range(600)]
    merge_into_path(
        spark, path, spark.createDataFrame(rows, "pk long, d date"), "d"
    )
    # second merge so the base went through the symlink read+publish path
    rows2 = [(1000 + i, dt.date(2024, 6, 20)) for i in range(50)]
    merge_into_path(
        spark, path, spark.createDataFrame(rows2, "pk long, d date"), "d"
    )
    scan = spark.read.parquet(path).filter(F.col("_merge_month") == "2024-02")
    txt = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in txt
    head = txt.split("PartitionFilters")[1].splitlines()[0]
    assert "_merge_month" in head, head
    assert scan.count() == 100


@pytest.mark.slow
def test_multibatch_merge_sf01_scale(spark, tmp_path):
    """Month-partitioned multi-batch merge at sf0.1 volume (600k
    lineitem rows): ownership invariant holds and the month scan stays
    partition-pruned at real data size."""
    li = (
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(
            F.col("l_orderkey").alias("pk"),
            F.col("l_shipdate").cast("date").alias("d"),
            "l_quantity",
        )
    )
    path = str(tmp_path / "base")
    # batch 1: everything; batch 2 restates 1995+ with bumped quantity
    merge_into_path(spark, path, li, "d")
    restate = li.filter(F.col("d") >= F.lit("1995-01-01").cast("date")).withColumn(
        "l_quantity", F.col("l_quantity") + 100
    )
    merge_into_path(spark, path, restate, "d")
    base = spark.read.parquet(path)
    pre = base.filter(F.col("d") < "1995-01-01")
    post = base.filter(F.col("d") >= "1995-01-01")
    # ownership: restated rows all carry the +100 quantities (>100 every row)
    assert post.filter(F.col("l_quantity") <= 100).count() == 0
    assert pre.filter(F.col("l_quantity") > 100).count() == 0
    expected_pre = li.filter(F.col("d") < "1995-01-01").count()
    assert pre.count() == expected_pre
    assert post.count() == restate.count()
    scan = base.filter(F.col("_merge_month") == "1996-03")
    txt = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in txt
    assert "_merge_month" in txt.split("PartitionFilters")[1].splitlines()[0]


def test_keep_versions_time_travel(spark, tmp_path):
    """Retention + time travel on the atomic writer: keep_versions=3
    retains the last three complete snapshots, read_version resolves
    them, GC'd versions raise, and the default keeps only the live
    snapshot."""
    from awi_datapipelinepublic_spark.sources.writers import (
        list_versions,
        read_version,
    )

    path = str(tmp_path / "tt")
    for lo in (0, 100, 200, 300):
        overwrite_table(_mk(spark, lo, lo + 10), path, keep_versions=3)
    kept = list_versions(path)
    assert [n for n, _ in kept] == [2, 3, 4]  # v1 retention-GC'd
    assert {r["pk"] for r in read_version(spark, path, 2).collect()} == set(
        range(100, 110)
    )
    assert {r["pk"] for r in read_version(spark, path, 4).collect()} == set(
        range(300, 310)
    )
    assert _rows(spark, path) == _rows(spark, pathlib.Path(kept[-1][1]))
    with pytest.raises(KeyError):
        read_version(spark, path, 1)
    # default retention: next publish collapses history to the live one
    overwrite_table(_mk(spark, 400, 410), path)
    assert [n for n, _ in list_versions(path)] == [5]


def test_managed_merge_swap_crash_rolls_forward(spark, tmp_path):
    """merge_into_table: a cataloged __staging table is a fully
    materialized merge whose DROP+RENAME swap died — the next call
    must finish that swap first (never strand or re-lose the batch),
    for both crash points: before the DROP (both tables exist) and
    after it (only staging exists)."""
    from awi_datapipelinepublic_spark.operators.merge import (
        merge_into_table,
        merge_time_window,
    )

    t = "t_swap_crash"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(f"DROP TABLE IF EXISTS {t}__staging")
    b1 = _df(spark, [(1, dt.date(2024, 1, 10), "a"), (2, dt.date(2024, 3, 10), "a")])
    merge_into_table(spark, t, b1, "d", partition_by_month=False)

    # crash point A: staging written, DROP never ran
    b2 = _df(spark, [(3, dt.date(2024, 2, 1), "b")])
    merged = merge_time_window(spark.table(t), b2, "d")
    merged.write.mode("overwrite").format("parquet").saveAsTable(f"{t}__staging")
    b3 = _df(spark, [(4, dt.date(2024, 3, 1), "c")])
    merge_into_table(spark, t, b3, "d", partition_by_month=False)
    got = {r["pk"]: r["v"] for r in spark.table(t).collect()}
    # sequential semantics: b1 then b2 (recovered) then b3
    assert got == {1: "a", 3: "b", 4: "c"}
    assert not spark.catalog.tableExists(f"{t}__staging")

    # crash point B: DROP ran, RENAME didn't — only staging remains
    snapshot = spark.table(t)
    snapshot.write.mode("overwrite").format("parquet").saveAsTable(f"{t}__staging")
    spark.sql(f"DROP TABLE {t}")
    b4 = _df(spark, [(5, dt.date(2024, 3, 20), "d4")])
    merge_into_table(spark, t, b4, "d", partition_by_month=False)
    got = {r["pk"]: r["v"] for r in spark.table(t).collect()}
    # recovered snapshot {1,3,4} then b4 (cutoff 2024-03-20, nothing at
    # or past it in the base) appends pk5
    assert got == {1: "a", 3: "b", 4: "c", 5: "d4"}
    spark.sql(f"DROP TABLE IF EXISTS {t}")


@settings(max_examples=3, deadline=None)
@given(data=st.data())
def test_atomic_writer_random_crash_sequences(spark, tmp_path_factory, data):
    """Hypothesis over random publish/crash interleavings: after ANY
    sequence of successful publishes and crashes injected at the
    pointer flip or the GC step, the table always reads as exactly ONE
    complete published snapshot — never a mix, never a half-write —
    and a final clean publish always succeeds and collapses history.

    Visibility model (the writer's contract):
    - clean publish → new snapshot visible;
    - crash at the pointer flip → old snapshot still visible; EXCEPT
      on a first-ever publish, where recover_table legitimately rolls
      the complete orphan forward (WAL-redo semantics — the data was
      fully materialized, only the pointer was missing);
    - crash during GC → new snapshot already visible (GC may also have
      nothing to delete, in which case the publish simply succeeds).
    """
    tmp = tmp_path_factory.mktemp("crash_seq")
    path = tmp / "t"
    import unittest.mock as mock

    committed = None  # rows the reader must see (None = no table yet)
    gen = 0
    for step in range(data.draw(st.integers(2, 5))):
        gen += 1
        df = _mk(spark, gen * 1000, gen * 1000 + 5)
        fault = data.draw(
            st.sampled_from(["none", "before_swap", "during_gc"]),
            label=f"fault_{step}",
        )
        rows = sorted((r["pk"], r["d"]) for r in df.collect())
        if fault == "none":
            overwrite_table(df, str(path))
            committed = rows
        elif fault == "before_swap":
            with mock.patch.object(
                writers, "_point_at", side_effect=RuntimeError("crash")
            ):
                with pytest.raises(RuntimeError):
                    overwrite_table(df, str(path))
            recover_table(str(path))
            if committed is None:
                committed = rows  # first-publish roll-forward
        else:  # during_gc — snapshot live before the (possible) crash
            with mock.patch.object(
                writers.shutil, "rmtree", side_effect=RuntimeError("crash")
            ):
                try:
                    overwrite_table(df, str(path))
                except RuntimeError:
                    pass  # GC had work and "crashed"; publish is live
            committed = rows
        recover_table(str(path))  # idempotent; must never corrupt
        assert _rows(spark, path) == committed
    final = _mk(spark, 99000, 99007)
    overwrite_table(final, str(path))
    assert _rows(spark, path) == sorted((r["pk"], r["d"]) for r in final.collect())
    assert len(list(path.parent.glob(f".{path.name}.v-*"))) == 1


def test_publish_lock_rejects_concurrent_and_takes_over_stale(spark, published):
    """Single-writer contract made loud: a FRESH foreign lock refuses
    the publish (table untouched); a STALE lock (crashed writer — its
    pointer flip can never come) is taken over and the publish lands."""
    import os
    import time

    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    path, old_rows = published
    lock = path.parent / f".{path.name}.lock"
    lock.write_text("pid=99999\n")
    with pytest.raises(ConcurrentPublishError):
        overwrite_table(_mk(spark, 700, 705), str(path))
    assert _rows(spark, path) == old_rows
    # age the lock past the staleness horizon → takeover
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 5)
    os.utime(lock, (stale, stale))
    new = _mk(spark, 800, 805)
    overwrite_table(new, str(path))
    assert _rows(spark, path) == sorted((r["pk"], r["d"]) for r in new.collect())
    assert not lock.exists(), "lock must be released after publish"


def test_merge_schema_evolution_pads_with_nulls(spark, tmp_path):
    """allow_schema_evolution (the mergeSchema analog): a batch may add
    a column (history reads NULL) or omit one (batch rows read NULL);
    without the flag the mismatch stays a loud error."""
    from awi_datapipelinepublic_spark.operators.merge import (
        merge_into_path,
        merge_time_window,
    )
    from pyspark.sql.utils import AnalysisException

    base = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), "a")], "pk long, d date, v string"
    )
    widened = spark.createDataFrame(
        [(2, dt.date(2024, 2, 1), "b", 7.5)],
        "pk long, d date, v string, score double",
    )
    with pytest.raises(AnalysisException):
        merge_time_window(base, widened, "d").collect()
    rows = {
        r["pk"]: (r["v"], r["score"])
        for r in merge_time_window(
            base, widened, "d", allow_schema_evolution=True
        ).collect()
    }
    assert rows == {1: ("a", None), 2: ("b", 7.5)}
    narrowed = spark.createDataFrame(
        [(3, dt.date(2024, 3, 1))], "pk long, d date"
    )
    rows = {
        r["pk"]: r["v"]
        for r in merge_time_window(
            base, narrowed, "d", allow_schema_evolution=True
        ).collect()
    }
    assert rows == {1: "a", 3: None}
    # storage level: evolved merge lands and reads back with the union schema
    path = str(tmp_path / "evolve")
    merge_into_path(spark, path, base, "d")
    merge_into_path(spark, path, widened, "d", allow_schema_evolution=True)
    out = {r["pk"]: r["score"] for r in spark.read.parquet(path).collect()}
    assert out == {1: None, 2: 7.5}


# ---------------------------------------------------------------------------
# Round-10 concurrency hardening: rename-claim takeover, heartbeat
# liveness, catalog-merge locking, lost-history recovery ordering, and
# compaction-vs-merge serialization.
# ---------------------------------------------------------------------------


def test_merge_into_path_recovers_crashed_migration_before_merge(
    spark, tmp_path, monkeypatch
):
    """A crash in the legacy-migration window leaves the pointer absent
    while complete snapshots exist. merge_into_path must run
    recover_table BEFORE its exists() check — otherwise it reads the
    table as empty, publishes the new batch alone, and GC deletes the
    old snapshot: silent loss of all history."""
    from awi_datapipelinepublic_spark.operators.merge import merge_into_path

    path = tmp_path / "t"
    old = _mk(spark, 0, 40)  # dates span 2024-01..2024-06
    old.write.parquet(str(path))  # legacy plain-dir layout
    monkeypatch.setattr(
        writers, "_point_at", lambda *a: (_ for _ in ()).throw(RuntimeError("kill"))
    )
    with pytest.raises(RuntimeError):
        overwrite_table(old, str(path))  # re-publish crashes mid-migration
    monkeypatch.undo()
    assert not path.exists() and not path.is_symlink()  # the crash window
    # late batch owns [2024-07-01, ∞) — no overlap with history
    new = spark.createDataFrame(
        [(900, dt.date(2024, 7, 1))], "pk long, d date"
    )
    merge_into_path(spark, str(path), new, "d", partition_by_month=False)
    got = _rows(spark, path)
    assert (900, dt.date(2024, 7, 1)) in got
    assert len(got) == 41, "history must survive the recovered merge"


def test_stale_takeover_race_exactly_one_winner(tmp_path):
    """N racers observing the SAME stale lock: the atomic rename-claim
    guarantees exactly one acquires; losers see the winner's fresh lock
    and raise (the naive unlink-and-recreate let a loser unlink the
    winner's FRESH lock, re-admitting two writers)."""
    import os
    import threading
    import time

    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    target = tmp_path / "t"
    lock = tmp_path / ".t.lock"
    lock.write_text("pid=1 token=dead\n")
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 60)
    os.utime(lock, (stale, stale))

    barrier = threading.Barrier(4)
    results = []
    res_lock = threading.Lock()

    def racer():
        barrier.wait()
        try:
            got = writers._acquire_publish_lock(target)
            with res_lock:
                results.append(("acquired", got))
        except ConcurrentPublishError:
            with res_lock:
                results.append(("refused", None))

    threads = [threading.Thread(target=racer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert sorted(r[0] for r in results) == [
        "acquired",
        "refused",
        "refused",
        "refused",
    ]
    assert lock.exists(), "winner's fresh lock must survive the losers"
    winner_lock, token = next(r[1] for r in results if r[0] == "acquired")
    assert f"token={token}" in lock.read_text()
    assert not list(tmp_path.glob(".t.lock.claim-*")), "claims are cleaned up"
    assert not (tmp_path / ".t.lock.takeover").exists(), "takeover sub-lock cleaned up"


def test_takeover_serialized_by_sublock(tmp_path):
    """Takeover attempts are serialized through the .lock.takeover
    sub-lock: while one is in flight, a second stale-lock observer
    refuses instead of renaming (its stat could predate the winner's
    fresh re-create — the two-winner escape the r12 race test caught).
    A CRASHED takeover (sub-lock older than _TAKEOVER_STALE_SECONDS)
    is cleared and the lock is re-taken normally."""
    import os
    import time

    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    target = tmp_path / "t"
    lock = tmp_path / ".t.lock"
    lock.write_text("pid=1 token=dead\n")
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 60)
    os.utime(lock, (stale, stale))

    takeover = tmp_path / ".t.lock.takeover"
    takeover.write_text("pid=2 token=inflight\n")  # fresh: in flight
    with pytest.raises(ConcurrentPublishError, match="taking over"):
        writers._acquire_publish_lock(target)
    assert lock.read_text() == "pid=1 token=dead\n", "stale lock untouched"

    # crashed takeover: sub-lock aged out — cleared, takeover proceeds
    tstale = time.time() - (writers._TAKEOVER_STALE_SECONDS + 5)
    os.utime(takeover, (tstale, tstale))
    got_lock, token = writers._acquire_publish_lock(target)
    assert f"token={token}" in lock.read_text()
    assert not takeover.exists()
    writers._release_publish_lock(got_lock, token)


def test_stale_takeover_clear_is_rename_claimed(tmp_path, monkeypatch):
    """Clearing a crashed (stale) takeover sub-lock must be a rename-
    claim with a freshness verify, not an unlink-by-path: if a racer
    clears the same stale file and re-creates a FRESH sub-lock between
    our stat and our clear, we must restore that fresh file and back
    off — never destroy it (ADVICE r12: the two-takeover re-admission
    window)."""
    import os
    import time

    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    target = tmp_path / "t"
    lock = tmp_path / ".t.lock"
    lock.write_text("pid=1 token=dead\n")
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 60)
    os.utime(lock, (stale, stale))

    takeover = tmp_path / ".t.lock.takeover"
    takeover.write_text("pid=2 token=crashed\n")
    tstale = time.time() - (writers._TAKEOVER_STALE_SECONDS + 5)
    os.utime(takeover, (tstale, tstale))

    real_rename = os.rename

    def racer_wins_then_rename(src, dst):
        # Between our stat (which saw the crashed file) and our clear,
        # a racer clears the crashed sub-lock and re-creates a FRESH
        # one at the same path.
        if Path(src) == takeover:
            takeover.unlink()
            takeover.write_text("pid=9 token=racer\n")
        return real_rename(src, dst)

    monkeypatch.setattr(writers.os, "rename", racer_wins_then_rename)
    with pytest.raises(ConcurrentPublishError, match="taking over"):
        writers._acquire_publish_lock(target)
    monkeypatch.undo()
    assert takeover.exists(), "racer's fresh sub-lock must be restored"
    assert "token=racer" in takeover.read_text()
    assert not list(tmp_path.glob(".t.lock.takeover.gc-*")), "no debris left"
    assert lock.read_text() == "pid=1 token=dead\n", "stale lock untouched"


def test_takeover_release_spares_foreign_sublock(tmp_path):
    """The takeover critical section's release must be token-verified
    (mirroring _release_publish_lock): if the section stalled past the
    staleness horizon and a racer legitimately cleared our sub-lock and
    created its own, our release must NOT unlink the racer's file
    (ADVICE r12: the unconditional finally-unlink flaw)."""
    takeover = tmp_path / ".t.lock.takeover"
    takeover.write_text("pid=9 token=racer\n")
    writers._release_takeover(takeover, "ours")
    assert takeover.exists(), "foreign sub-lock must survive our release"

    takeover.unlink()
    takeover.write_text("pid=1 token=ours\n")
    writers._release_takeover(takeover, "ours")
    assert not takeover.exists(), "own sub-lock is released"

    # missing file: release is a no-op, never raises
    writers._release_takeover(takeover, "ours")


def test_takeover_backs_off_when_lock_refreshed_mid_claim(tmp_path, monkeypatch):
    """If a heartbeat lands between the racer's stat and its rename
    (the lock is STALE-looking but its holder is alive), the racer must
    restore the lock and back off — never destroy a live writer's lock."""
    import os
    import time

    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    target = tmp_path / "t"
    lock = tmp_path / ".t.lock"
    lock.write_text("pid=1 token=alive\n")
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 60)
    os.utime(lock, (stale, stale))

    real_rename = os.rename

    def revive_then_rename(src, dst):
        os.utime(lock)  # the live holder's heartbeat fires first
        return real_rename(src, dst)

    monkeypatch.setattr(writers.os, "rename", revive_then_rename)
    with pytest.raises(ConcurrentPublishError):
        writers._acquire_publish_lock(target)
    monkeypatch.undo()
    assert lock.exists(), "live holder's lock must be restored"
    assert "token=alive" in lock.read_text()
    assert not list(tmp_path.glob(".t.lock.claim-*"))


def test_heartbeat_keeps_slow_publish_lock_fresh(tmp_path):
    """A slow-but-alive publish must never look stale: the heartbeat
    refreshes the lock's mtime, so a contender arriving after the
    nominal staleness horizon still refuses instead of stealing."""
    import os
    import time

    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    target = tmp_path / "t"
    lock, token = writers._acquire_publish_lock(target)
    # simulate a publish already _LOCK_STALE_SECONDS old...
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 60)
    os.utime(lock, (stale, stale))
    # ...whose holder is alive: one heartbeat tick refreshes it
    with writers._LockHeartbeat(lock, interval=0.05):
        time.sleep(0.3)
        with pytest.raises(ConcurrentPublishError):
            writers._acquire_publish_lock(target)
    writers._release_publish_lock(lock, token)
    assert not lock.exists()


def test_release_only_removes_own_token(tmp_path):
    """Token-checked release: a writer whose lock was (theoretically)
    replaced must not unlink the new holder's lock."""
    target = tmp_path / "t"
    lock, token = writers._acquire_publish_lock(target)
    lock.write_text("pid=2 token=someoneelse\n")  # usurped
    writers._release_publish_lock(lock, token)
    assert lock.exists(), "foreign lock must survive our release"
    writers._release_publish_lock(lock, "someoneelse")
    assert not lock.exists()


def test_merge_into_table_publish_lock(spark, tmp_path):
    """Catalog-merge twin of the path writer's lock: a FRESH foreign
    lock refuses the merge (no staging table created, base untouched);
    a STALE one is taken over and the merge lands. Reference semantics:
    the per-type serialized Cloud Functions (main.py:39-41)."""
    import os
    import time

    from awi_datapipelinepublic_spark.operators.merge import (
        _table_location,
        merge_into_table,
    )
    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    table = "t_lock_catalog_r10"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__staging")
    b1 = spark.createDataFrame([(1, dt.date(2024, 1, 1))], "pk long, d date")
    merge_into_table(spark, table, b1, "d", partition_by_month=False)
    loc = _table_location(spark, table)
    lock = loc.parent / f".{loc.name}.lock"
    lock.write_text("pid=99999 token=foreign\n")
    b2 = spark.createDataFrame([(2, dt.date(2024, 2, 1))], "pk long, d date")
    with pytest.raises(ConcurrentPublishError):
        merge_into_table(spark, table, b2, "d", partition_by_month=False)
    assert not spark.catalog.tableExists(f"{table}__staging")
    assert [r["pk"] for r in spark.table(table).collect()] == [1]
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 60)
    os.utime(lock, (stale, stale))
    merge_into_table(spark, table, b2, "d", partition_by_month=False)
    assert sorted(r["pk"] for r in spark.table(table).collect()) == [1, 2]
    assert not lock.exists(), "lock released after the catalog merge"
    spark.sql(f"DROP TABLE IF EXISTS {table}")


@settings(max_examples=3, deadline=None)
@given(data=st.data())
def test_compaction_under_merge_pressure_property(spark, tmp_path_factory, data):
    """N small merges accrete small files; compaction must (a) hold the
    publish lock across its read+rewrite — a merge landing between an
    UNLOCKED read and the pointer flip would be erased by the stale
    compacted snapshot — (b) preserve content exactly, (c) land the
    file count on the size-derived target."""
    from awi_datapipelinepublic_spark.operators.merge import merge_into_path
    from awi_datapipelinepublic_spark.sources.writers import (
        ConcurrentPublishError,
        compact_table,
    )

    tmp_path = tmp_path_factory.mktemp("compact")
    path = tmp_path / "t"
    n_batches = data.draw(st.integers(min_value=2, max_value=4))
    batches = []
    for i in range(n_batches):
        start = data.draw(st.integers(min_value=1, max_value=5))
        rows = [
            (100 * i + j, dt.date(2024, 1 + ((start + j) % 6), 1 + ((start + j) % 27)))
            for j in range(data.draw(st.integers(min_value=1, max_value=6)))
        ]
        batches.append(rows)
        batch_df = spark.createDataFrame(rows, "pk long, d date")
        merge_into_path(spark, str(path), batch_df, "d", partition_by_month=False)
    expected = _merge_expected(batches)
    assert _rows(spark, path) == expected
    # compaction refuses while a (simulated) merge holds the lock
    lock = path.parent / f".{path.name}.lock"
    lock.write_text("pid=9 token=merge-in-flight\n")
    with pytest.raises(ConcurrentPublishError):
        compact_table(spark, str(path))
    lock.unlink()
    n_files = compact_table(spark, str(path))
    assert n_files == 1, "tiny table must compact to the 1-file target"
    assert len(list(Path(str(path) + "/").rglob("*.parquet"))) == 1
    assert _rows(spark, path) == expected, "compaction preserves content"
    assert not lock.exists()


def _rollup_refresh(spark, base_path, rollup_path, since):
    from awi_datapipelinepublic_spark.operators.merge import refresh_monthly_rollup

    refresh_monthly_rollup(
        spark,
        base_path,
        rollup_path,
        group_cols=[],
        agg_exprs=[
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pk").cast("bigint").alias("s"),
        ],
        since_month=since,
    )


@settings(max_examples=3, deadline=None)
@given(data=st.data())
def test_incremental_rollup_matches_full_recompute(spark, tmp_path_factory, data):
    """Incremental view maintenance: after every merge, refreshing only
    months >= month(cutoff) must leave the rollup identical to a full
    groupBy over the merged base — the aggregate-level ownership
    invariant (a batch owning [cutoff, inf) at the row level owns
    [month(cutoff), inf) at the month grain)."""
    from awi_datapipelinepublic_spark.operators.merge import merge_into_path

    tmp_path = tmp_path_factory.mktemp("rollup")
    base_path = str(tmp_path / "base")
    rollup_path = str(tmp_path / "rollup")
    n_batches = data.draw(st.integers(min_value=2, max_value=4))
    for i in range(n_batches):
        month = data.draw(st.integers(min_value=1, max_value=6))
        rows = [
            (100 * i + j, dt.date(2024, month + (j % (7 - month)), 1 + (j % 27)))
            for j in range(data.draw(st.integers(min_value=1, max_value=8)))
        ]
        batch = spark.createDataFrame(rows, "pk long, d date")
        merge_into_path(spark, base_path, batch, "d")
        cutoff = min(d for _, d in rows)
        _rollup_refresh(spark, base_path, rollup_path, f"2024-{cutoff.month:02d}")
        got = sorted(
            (r["_merge_month"], r["n"], r["s"])
            for r in spark.read.parquet(rollup_path).collect()
        )
        full = sorted(
            (r["_merge_month"], r["n"], r["s"])
            for r in spark.read.parquet(base_path)
            .groupBy("_merge_month")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("pk").cast("bigint").alias("s"),
            )
            .collect()
        )
        assert got == full


def test_rollup_refresh_base_scan_is_partition_pruned(spark, tmp_path):
    """The refresh's whole point at 100 TB: its base scan must carry a
    PartitionFilters entry on _merge_month, so an incremental refresh
    reads one month's partitions, never the history."""
    from awi_datapipelinepublic_spark.operators.merge import merge_into_path

    base_path = str(tmp_path / "base")
    rows = [(i, dt.date(2024, 1 + i % 6, 5)) for i in range(600)]
    merge_into_path(spark, base_path, spark.createDataFrame(rows, "pk long, d date"), "d")
    base = spark.read.parquet(base_path).filter(F.col("_merge_month") >= F.lit("2024-06"))
    fresh = base.groupBy("_merge_month").agg(F.count(F.lit(1)).alias("n"))
    txt = fresh._sc._jvm.PythonSQLUtils.explainString(
        fresh._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in txt
    head = txt.split("PartitionFilters")[1].splitlines()[0]
    assert "_merge_month" in head, head
    # and the refresh path itself lands correct month rows
    rollup_path = str(tmp_path / "rollup")
    _rollup_refresh(spark, base_path, rollup_path, None)  # bootstrap
    _rollup_refresh(spark, base_path, rollup_path, "2024-06")
    got = {r["_merge_month"]: r["n"] for r in spark.read.parquet(rollup_path).collect()}
    assert got["2024-06"] == 100 and len(got) == 6


# ---------------------------------------------------------------------------
# Round 11: ADVICE regressions — rollup bootstrap/locking, heartbeat
# self-healing, takeover-restore race.
# ---------------------------------------------------------------------------


def test_rollup_incremental_without_stored_rollup_rebuilds_full(spark, tmp_path):
    """since_month set but NO stored rollup: an incremental refresh
    would publish only months >= since_month and silently truncate all
    history. The fallback must rebuild from the UNFILTERED base."""
    from awi_datapipelinepublic_spark.operators.merge import merge_into_path

    base_path = str(tmp_path / "base")
    rows = [(m * 100 + j, dt.date(2024, m, 1 + j)) for m in (1, 2, 3) for j in range(3)]
    merge_into_path(
        spark, base_path, spark.createDataFrame(rows, "pk long, d date"), "d"
    )
    rollup_path = str(tmp_path / "rollup")  # never bootstrapped
    _rollup_refresh(spark, base_path, rollup_path, "2024-03")
    got = {r["_merge_month"]: r["n"] for r in spark.read.parquet(rollup_path).collect()}
    assert got == {"2024-01": 3, "2024-02": 3, "2024-03": 3}, (
        "missing rollup + since_month must full-rebuild, not truncate history"
    )


def test_rollup_refresh_holds_publish_lock(spark, tmp_path):
    """Two concurrent refreshes of one rollup must serialize: a FRESH
    foreign lock refuses the whole read-merge-publish (the unlocked
    read-then-publish interleave would lose one refresh)."""
    from awi_datapipelinepublic_spark.operators.merge import merge_into_path
    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    base_path = str(tmp_path / "base")
    rows = [(j, dt.date(2024, 1, 1 + j)) for j in range(3)]
    merge_into_path(
        spark, base_path, spark.createDataFrame(rows, "pk long, d date"), "d"
    )
    rollup_path = tmp_path / "rollup"
    lock = rollup_path.parent / f".{rollup_path.name}.lock"
    lock.write_text("pid=9 token=other-refresh\n")
    with pytest.raises(ConcurrentPublishError):
        _rollup_refresh(spark, base_path, str(rollup_path), None)
    assert not rollup_path.exists(), "refused refresh must not publish"
    lock.unlink()
    _rollup_refresh(spark, base_path, str(rollup_path), None)
    assert not lock.exists(), "lock released after the refresh"
    got = {r["_merge_month"]: r["n"] for r in spark.read.parquet(str(rollup_path)).collect()}
    assert got == {"2024-01": 3}


def test_heartbeat_self_heals_missing_lock(tmp_path):
    """A mistaken takeover that renamed a LIVE holder's lock away must
    be healed: the holder's next beat O_EXCL-recreates the lock with
    its own token, so later acquirers still see the table held."""
    import time

    target = tmp_path / "t"
    lock, token = writers._acquire_publish_lock(target)
    with writers._LockHeartbeat(lock, token, interval=0.05) as hb:
        lock.unlink()  # simulate the mistaken takeover
        deadline = time.time() + 3
        while not lock.exists() and time.time() < deadline:
            time.sleep(0.05)
        assert lock.exists(), "heartbeat must recreate the missing lock"
        assert f"token={token}" in lock.read_text()
        assert not hb.lost
    writers._release_publish_lock(lock, token)
    assert not lock.exists()


def test_heartbeat_flags_usurped_lock_and_publish_refuses(spark, tmp_path):
    """If a usurper's FRESH lock beats the heartbeat's recreate, the
    original holder must not flip the pointer over the usurper's
    publish: ``lost`` flips True and _publish_locked raises."""
    import time

    from awi_datapipelinepublic_spark.sources.writers import (
        ConcurrentPublishError,
        _publish_locked,
    )

    target = tmp_path / "t"
    lock, token = writers._acquire_publish_lock(target)
    df = spark.createDataFrame([(1,)], "pk long")
    with writers._LockHeartbeat(lock, token, interval=0.05) as hb:
        lock.write_text("pid=2 token=usurper\n")  # replaced, not just touched
        lock.unlink()
        lock.write_text("pid=2 token=usurper\n")  # fresh foreign lock wins
        deadline = time.time() + 3
        while not hb.lost and time.time() < deadline:
            time.sleep(0.05)
        assert hb.lost, "heartbeat must detect the usurper's fresh lock"
        with pytest.raises(ConcurrentPublishError):
            _publish_locked(df, target, None, 1, heartbeat=hb)
    assert not target.exists(), "no pointer flip after a lost lock"
    writers._release_publish_lock(lock, "usurper")


def test_takeover_restore_race_preserves_holder_inode(tmp_path, monkeypatch):
    """Third-writer window: a stale-looking lock is renamed to the
    claim, found live, and the os.link restore loses to a third
    writer's fresh O_EXCL lock. The claim (= the live holder's only
    inode) must SURVIVE — unlinking it would leave the holder and the
    third writer publishing concurrently."""
    import os
    import time

    from awi_datapipelinepublic_spark.sources.writers import ConcurrentPublishError

    target = tmp_path / "t"
    lock = tmp_path / ".t.lock"
    lock.write_text("pid=1 token=holder\n")
    stale = time.time() - (writers._LOCK_STALE_SECONDS + 60)
    os.utime(lock, (stale, stale))

    real_rename = os.rename

    def heartbeat_then_third_writer(src, dst):
        os.utime(src)  # holder's heartbeat fires: the lock is LIVE
        real_rename(src, dst)
        lock.write_text("pid=3 token=third\n")  # third writer lands in the window

    monkeypatch.setattr(writers.os, "rename", heartbeat_then_third_writer)
    with pytest.raises(ConcurrentPublishError):
        writers._acquire_publish_lock(target)
    monkeypatch.undo()
    claims = list(tmp_path.glob(".t.lock.claim-*"))
    assert len(claims) == 1, "holder's inode must survive at the claim name"
    assert "token=holder" in claims[0].read_text()
    assert "token=third" in lock.read_text(), "third writer's lock untouched"


# Round 12: ADVICE regression — a lost-heartbeat abort must not leave
# a _SUCCESS-complete refused snapshot that recovery would publish.


def test_lost_heartbeat_abort_removes_refused_snapshot(spark, tmp_path):
    """After a takeover abort, the refused vdir must be gone (not a
    recoverable snapshot): recover_table on the bare table dir must
    find nothing to repoint to, and a later clean publish must win."""
    import time

    from awi_datapipelinepublic_spark.sources.writers import (
        ConcurrentPublishError,
        _publish_locked,
    )

    target = tmp_path / "t"
    lock, token = writers._acquire_publish_lock(target)
    df = spark.createDataFrame([(1,)], "pk long")
    with writers._LockHeartbeat(lock, token, interval=0.05) as hb:
        lock.unlink()
        lock.write_text("pid=2 token=usurper\n")
        deadline = time.time() + 3
        while not hb.lost and time.time() < deadline:
            time.sleep(0.05)
        assert hb.lost
        with pytest.raises(ConcurrentPublishError):
            _publish_locked(df, target, None, 3, heartbeat=hb)
    writers._release_publish_lock(lock, "usurper")
    assert not target.exists(), "no pointer flip after a lost lock"
    refused = [
        d
        for d in tmp_path.glob(".t.v-*")
        if (d / "_SUCCESS").exists()
    ]
    assert refused == [], "refused snapshot must not be recovery-publishable"
    writers.recover_table(str(target))
    assert not target.exists(), "recovery must not resurrect the refused write"


def test_lost_heartbeat_abort_in_legacy_migration_keeps_legacy_visible(
    spark, tmp_path
):
    """Takeover abort on a pre-versioning plain-dir table: the refused
    vdir is removed BEFORE/AFTER the legacy rename, so recovery lands
    on the legacy data, never the refused snapshot."""
    import time

    from awi_datapipelinepublic_spark.sources.writers import (
        ConcurrentPublishError,
        _publish_locked,
    )

    target = tmp_path / "t"
    spark.createDataFrame([(10,)], "pk long").write.parquet(str(target))
    assert target.exists() and not target.is_symlink()

    lock, token = writers._acquire_publish_lock(target)
    df = spark.createDataFrame([(99,)], "pk long")
    with writers._LockHeartbeat(lock, token, interval=0.05) as hb:
        lock.unlink()
        lock.write_text("pid=2 token=usurper\n")
        deadline = time.time() + 3
        while not hb.lost and time.time() < deadline:
            time.sleep(0.05)
        assert hb.lost
        with pytest.raises(ConcurrentPublishError):
            _publish_locked(df, target, None, 3, heartbeat=hb)
    writers._release_publish_lock(lock, "usurper")
    writers.recover_table(str(target))
    rows = spark.read.parquet(str(target)).collect()
    assert [r["pk"] for r in rows] == [10], (
        "recovery must surface the legacy data, not the refused snapshot"
    )
