"""Golden tests for the three re-authored reference views
(settings.yaml:24-63, 88-123, 132-140) on FIXTURES.md-shaped data."""

import datetime as dt
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from awi_datapipelinepublic_spark.plans.views import (
    auto_optiom_view,
    retention_view,
    transactions_view,
)


def _dims(spark):
    geo = spark.createDataFrame(
        [("Calgary", "South"), ("Edmonton", "North"), ("Edmonton", "Capital")],  # dup key → fan-out
        ["meta_city", "meta_geo"],
    )
    channels = spark.createDataFrame([("PC2", "ONLINE")], ["P2", "CHANNEL"])
    agencies = spark.createDataFrame([("1234", "Main St Agency")], ["metaAgencyNumber", "metaAgencyName"])
    ttypes = spark.createDataFrame([("NB", "New Business")], ["ttno", "TType"])
    return geo, channels, agencies, ttypes


_REN_COLS = (
    "AgencyNumber string, PolicyNumber string, PolicyEffectiveDate date, "
    "PolicyExpiryDate date, TransactionType string, LeaseIndicator boolean, "
    "DateRenewed date, PolicyStatus string, ProducerCode1 string, ProducerCode2 string, "
    "ProducerName1 string, ProducerName2 string, RenewedByProducerCode2 string, "
    "City string, PostalCode string, CommissionAmt double, DateCancelled date"
)


def _renewal(agency="1234", policy="P-1", status="R", pc2="PC2", city="Calgary", ttype="NB",
             expiry=dt.date(2024, 6, 1)):
    return (
        agency, policy, dt.date(2023, 6, 1), expiry, ttype, True, None, status,
        "PC1", pc2, "Alice", "Bob", None, city, "T2P 1J9", 100.0, None,
    )


def test_retention_view_semantics(spark):
    geo, channels, agencies, ttypes = _dims(spark)
    renewals = spark.createDataFrame(
        [
            _renewal(),
            _renewal(policy="P-2", status="C", city="Nowhere", agency="9999", ttype="XX", pc2="XX"),
            _renewal(policy=None),            # filtered: NULL PolicyNumber
            _renewal(policy="P-3", city="Edmonton"),  # dup geo key → fan-out ×2
        ],
        _REN_COLS,
    )
    out = retention_view(renewals, geo, channels, agencies, ttypes)
    rows = out.collect()
    by_policy = {}
    for r in rows:
        by_policy.setdefault(r["PolicyNumber"], []).append(r)
    assert None not in by_policy                      # IS NOT NULL filter
    assert len(by_policy["P-3"]) == 2                 # left-join fan-out preserved
    hit = by_policy["P-1"][0]
    assert (hit["Geography"], hit["Channel"], hit["Agency"], hit["TType"]) == (
        "South", "ONLINE", "Main St Agency", "New Business")
    assert (hit["Renewed"], hit["Cancelled"], hit["Expired"], hit["Active"]) == (1, 0, 0, 0)
    miss = by_policy["P-2"][0]
    assert (miss["Geography"], miss["Channel"], miss["TType"]) == ("NA_OR_OUT", "DEALERS", "CHANGE")
    assert miss["Agency"] is None                     # no COALESCE on Agency (settings.yaml:31)
    assert miss["Cancelled"] == 1


_TX_COLS = (
    "AgencyNumber string, AgencyNameAndNo string, ProducerCode1 string, "
    "ProducerCode2 string, ProducerName1 string, ProducerName2 string, DCID string, "
    "EntryDateTime timestamp, PolicyEffectiveDate date, PolicyType string, "
    "PolicyNumber string, TransactionType string, City string, PostalCode string, "
    "VehicleType string, Make string, Model string, VIN string, CommTotal double"
)


def _tx(policy, entry, vin="1HGCM82633A004352", ptype=None):
    return (
        "1234", "Main (1234)", "PC1", "PC2", "Alice", "Bob", "D1",
        dt.datetime(2024, 1, 1) + dt.timedelta(days=entry),
        dt.date(2024, 1, 1), ptype, policy, "NB", "Calgary", "T2P", "Sedan",
        "Honda", "Accord", vin, 50.0,
    )


def test_transactions_view_isnew(spark):
    geo, channels, agencies, ttypes = _dims(spark)
    tx = spark.createDataFrame([_tx("P-1", 0), _tx("P-1", 5), _tx("P-2", 3)], _TX_COLS)
    out = transactions_view(tx, geo, channels, agencies, ttypes).collect()
    flags = {(r["PolicyNumber"], r["EntryDateTime"].day): r["IsNew"] for r in out}
    assert flags == {("P-1", 1): "N", ("P-1", 6): "E", ("P-2", 4): "N"}
    assert all(r["PolicyType"] == "A" for r in out)   # COALESCE(PolicyType,'A')
    assert all(r["VIN_A"] is not None for r in out)   # alias applied


def test_auto_optiom_view(spark):
    geo, channels, agencies, ttypes = _dims(spark)
    tx = spark.createDataFrame(
        [_tx("P-1", 0, vin="VIN_MATCH"), _tx("P-2", 3, vin="VIN_MISS"),
         _tx("P-OLD", -365 * 6, vin="VIN_MATCH")],  # 2018 → filtered by ≥2019
        _TX_COLS,
    )
    tx_v = transactions_view(tx, geo, channels, agencies, ttypes)
    optiom = spark.createDataFrame(
        [("VIN_MATCH", "ACME", 150.0, dt.date(2024, 1, 2))],
        ["VIN", "BROKERAGE_NAME", "TOTAL_PREMIUM", "TRANS_DATE"],
    )
    out = auto_optiom_view(tx_v, optiom).collect()
    by_policy = {r["PolicyNumber"]: r for r in out}
    assert "P-OLD" not in by_policy                    # date filter
    assert by_policy["P-1"]["BROKERAGE_NAME"] == "ACME"
    assert by_policy["P-1"]["VIN_OP"] == "VIN_MATCH"
    assert by_policy["P-2"]["BROKERAGE_NAME"] is None  # left-join miss
    # desc sort by EntryDateTime
    entries = [r["EntryDateTime"] for r in out]
    assert entries == sorted(entries, reverse=True)
