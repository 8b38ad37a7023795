"""Clean-stage operator tests: the reference's dirt classes
(SURVEY.md §5.2) against functions/cleaning.py + sources/readers.py."""

import json
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.functions.cleaning import (
    align_columns,
    apply_converters,
    cast_to_schema,
    strip_excel,
)
from awi_datapipelinepublic_spark.sources.readers import read_csv
from awi_datapipelinepublic_spark.sources.schema import to_struct_type

FIELDS = [
    {"name": "AgencyNumber", "type": "STRING", "mode": "NULLABLE"},
    {"name": "PolicyNumber", "type": "STRING", "mode": "NULLABLE"},
    {"name": "PolicyExpiryDate", "type": "DATE", "mode": "NULLABLE"},
    {"name": "CommissionAmt", "type": "NUMERIC", "mode": "NULLABLE"},
    {"name": "SELLER__", "type": "INTEGER", "mode": "NULLABLE"},
    {"name": "LeaseIndicator", "type": "BOOLEAN", "mode": "NULLABLE"},
]


def test_strip_excel_matches_python_strip(spark):
    """Engine semantics == python str.strip('\"=') (reference config.py:31-33)."""
    cases = ['="1234"', '"ab=cd"', "====x", 'plain', '""', '=="a=b"=']
    df = spark.createDataFrame([(c,) for c in cases], ["raw"])
    got = [r["s"] for r in df.select(strip_excel("raw").alias("s")).collect()]
    want = [c.strip('"=') for c in cases]
    assert got == want


def test_apply_converters_whitelist(spark):
    df = spark.createDataFrame([('="77"', "x")], ["a", "b"])
    out = apply_converters(df, {"a": "strip_excel"}).first()
    assert out["a"] == "77" and out["b"] == "x"
    try:
        apply_converters(df, {"a": "__import__"})
        raise AssertionError("non-whitelisted converter must raise")
    except ValueError:
        pass


def test_cast_to_schema_lenient_dates(spark):
    df = spark.createDataFrame(
        [("1", "P1", "2024-02-29", "1.5", "7", "true"),
         ("2", "P2", "not-a-date", "", None, None)],
        ["AgencyNumber", "PolicyNumber", "PolicyExpiryDate", "CommissionAmt", "SELLER__", "LeaseIndicator"],
    )
    out = cast_to_schema(df, to_struct_type(FIELDS), lenient_dates=["PolicyExpiryDate"]).collect()
    assert str(out[0]["PolicyExpiryDate"]) == "2024-02-29"
    assert out[0]["CommissionAmt"] == 1.5 and out[0]["SELLER__"] == 7 and out[0]["LeaseIndicator"] is True
    assert out[1]["PolicyExpiryDate"] is None  # coerce, not error (config.py:139-142)


def test_read_csv_end_to_end(spark, tmp_path):
    """CSV with every dirt class: Excel quoting, empty strings, bad dates,
    extra columns, quoted newlines."""
    csv = tmp_path / "renewals.csv"
    csv.write_text(
        "AgencyNumber,PolicyNumber,PolicyExpiryDate,CommissionAmt,SELLER__,LeaseIndicator,ExtraCol\n"
        '"=""1234""",P-1,2024-01-15,10.5,3,true,IGNORED\n'
        ',P-2,bad-date,,,false,x\n'
        '5678,"multi\nline",2024-03-01,7.25,9,,y\n'
    )
    df = read_csv(spark, str(csv), FIELDS, converters={"AgencyNumber": "strip_excel"})
    rows = {r["PolicyNumber"]: r for r in df.collect()}
    assert "ExtraCol" not in df.columns                       # usecols prune
    assert rows["P-1"]["AgencyNumber"] == "1234"              # strip_excel
    assert rows["P-2"]["AgencyNumber"] is None                # '' → NULL
    assert rows["P-2"]["PolicyExpiryDate"] is None            # coerce
    assert rows["multi\nline"]["CommissionAmt"] == 7.25       # quoted newline
    assert df.schema["SELLER__"].dataType.typeName() == "long"


def test_cast_with_rejects_splits_bad_rows(spark):
    """Row-level quarantine: unparseable numerics reject the row with
    original values preserved; lenient DATE coercion never rejects."""
    from awi_datapipelinepublic_spark.functions.cleaning import cast_with_rejects

    df = spark.createDataFrame(
        [("1", "P1", "2024-01-01", "1.5", "7", "true"),
         ("2", "P2", "not-a-date", "2.0", "8", "false"),   # bad date → lenient NULL, keeps row
         ("3", "P3", "2024-02-01", "NOT_NUM", "9", "true")],  # bad numeric → rejected
        ["AgencyNumber", "PolicyNumber", "PolicyExpiryDate", "CommissionAmt", "SELLER__", "LeaseIndicator"],
    )
    good, rejected = cast_with_rejects(df, to_struct_type(FIELDS), lenient_dates=["PolicyExpiryDate"])
    good_rows = {r["PolicyNumber"]: r for r in good.collect()}
    bad_rows = {r["PolicyNumber"]: r for r in rejected.collect()}
    assert set(good_rows) == {"P1", "P2"}
    assert good_rows["P2"]["PolicyExpiryDate"] is None
    assert set(bad_rows) == {"P3"}
    assert bad_rows["P3"]["CommissionAmt"] == "NOT_NUM"  # original value preserved


def test_compact_table(spark, tmp_path):
    """Compaction rewrites many small files into the size-targeted count."""
    from awi_datapipelinepublic_spark.sources.writers import compact_table

    path = str(tmp_path / "frag")
    spark.range(0, 20000).repartition(64).write.mode("overwrite").parquet(path)
    before = len(list(Path(path).rglob("*.parquet")))
    after = compact_table(spark, path, target_file_mb=256)
    assert before >= 64
    assert after <= 4
    assert spark.read.parquet(path).count() == 20000


def test_align_columns_union(spark):
    """The prime/plus sheet alignment (config.py:121-128), name-based."""
    schema = to_struct_type(FIELDS)
    prime = spark.createDataFrame([("1", "P1")], ["AgencyNumber", "PolicyNumber"])
    plus = spark.createDataFrame([("2", "P2", 5.0)], ["AgencyNumber", "PolicyNumber", "CommissionAmt"])
    a = align_columns(prime.withColumn("SOURCE", F.lit("prime")).drop("SOURCE"), schema)
    b = align_columns(plus, schema)
    out = a.unionByName(b).collect()
    assert len(out) == 2
    assert out[0]["CommissionAmt"] is None and out[1]["CommissionAmt"] == 5.0
    assert [f.name for f in a.schema.fields] == [f["name"] for f in FIELDS]
