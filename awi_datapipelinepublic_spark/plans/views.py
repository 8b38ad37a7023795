"""The three analytical views, re-authored as DataFrame builders.

Reference SQL lives in settings.yaml: RETENTION (24-63), TRANSACTIONS
(88-123), AUTO_OPTIOM (132-140). Re-authored, not string-ported —
BigQuery dialect quirks (trailing commas, duplicate-column SELECT *)
don't survive a port, and the DataFrame form lets Catalyst see the
whole plan (SURVEY.md §4).

Each builder takes the fact + dimension DataFrames and returns the
view's logical plan; register with createOrReplaceTempView for the
spark.sql surface. Dimension joins are broadcast (all four metadata
tables are tiny string→string lookups, SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from awi_datapipelinepublic_spark.operators.joins import dim_join


def retention_view(
    renewals: DataFrame,
    geo: DataFrame,
    channels: DataFrame,
    agencies: DataFrame,
    ttypes: DataFrame,
) -> DataFrame:
    """RETENTION (settings.yaml:24-63): 17-col projection → 4 broadcast
    left joins → COALESCE defaults → 4 CASE status indicators → NOT
    NULL filter → sort by PolicyExpiryDate."""
    reduced = renewals.select(
        "AgencyNumber", "PolicyNumber", "PolicyEffectiveDate", "PolicyExpiryDate",
        "TransactionType", "LeaseIndicator", "DateRenewed", "PolicyStatus",
        "ProducerCode1", "ProducerCode2", "ProducerName1", "ProducerName2",
        "RenewedByProducerCode2", "City", "PostalCode", "CommissionAmt", "DateCancelled",
    )
    joined = dim_join(reduced, geo, "City", "meta_city", {"meta_geo": "meta_geo"})
    joined = dim_join(joined, channels, "ProducerCode2", "P2", {"CHANNEL": "CHANNEL"})
    joined = dim_join(joined, agencies, "AgencyNumber", "metaAgencyNumber", {"metaAgencyName": "Agency"})
    joined = dim_join(joined, ttypes, "TransactionType", "ttno", {"TType": "TType"})
    out = (
        joined.withColumn("Geography", F.coalesce(F.col("meta_geo"), F.lit("NA_OR_OUT")))
        .withColumn("TType", F.coalesce(F.col("TType"), F.lit("CHANGE")))
        # Output name is 'Channel' exactly (settings.yaml:29 ... AS Channel)
        # for case-sensitive downstream consumers.
        .withColumn("Channel", F.coalesce(F.col("CHANNEL"), F.lit("DEALERS")))
        .withColumn("Renewed", F.when(F.col("PolicyStatus") == "R", 1).otherwise(0))
        .withColumn("Cancelled", F.when(F.col("PolicyStatus") == "C", 1).otherwise(0))
        .withColumn("Expired", F.when(F.col("PolicyStatus") == "E", 1).otherwise(0))
        .withColumn("Active", F.when(F.col("PolicyStatus") == "A", 1).otherwise(0))
        .drop("meta_geo")
        .filter(F.col("PolicyNumber").isNotNull())
        .orderBy(F.col("PolicyExpiryDate").asc())
    )
    return out


def transactions_view(
    transactions: DataFrame,
    geo: DataFrame,
    channels: DataFrame,
    agencies: DataFrame,
    ttypes: DataFrame,
) -> DataFrame:
    """TRANSACTIONS (settings.yaml:88-123): 16-col projection → 4
    broadcast left joins → COALESCE defaults → IsNew flag → sort.

    The reference derives IsNew via global ROW_NUMBER + per-policy MIN
    + equality (settings.yaml:90-94); the single partitioned window
    here is the scale-correct equivalent (SURVEY.md §2.E) — identical
    output for distinct EntryDateTime, no single-partition shuffle. A
    global Id column is still exposed for parity via the scalable
    two-pass pattern when callers need it (operators/windows.py).
    """
    reduced = transactions.select(
        "AgencyNumber", "AgencyNameAndNo", "ProducerCode1", "ProducerCode2",
        "ProducerName1", "ProducerName2", "DCID", "EntryDateTime",
        "PolicyEffectiveDate", "PolicyType", "PolicyNumber", "TransactionType",
        "City", "PostalCode", "VehicleType", "Make", "Model",
        F.col("VIN").alias("VIN_A"), "CommTotal",
    )
    joined = dim_join(reduced, ttypes, "TransactionType", "ttno", {"TType": "TType"})
    joined = dim_join(joined, channels, "ProducerCode2", "P2", {"CHANNEL": "CHANNEL"})
    joined = dim_join(joined, geo, "City", "meta_city", {"meta_geo": "Geo"})
    joined = dim_join(joined, agencies, "AgencyNumber", "metaAgencyNumber", {"metaAgencyName": "Agency"})
    w = Window.partitionBy("PolicyNumber").orderBy(F.col("EntryDateTime").asc())
    out = (
        joined.withColumn("TType", F.coalesce(F.col("TType"), F.lit("CHANGE")))
        # 'Channel' exact-case, matching settings.yaml:104 AS Channel.
        .withColumn("Channel", F.coalesce(F.col("CHANNEL"), F.lit("DEALERS")))
        .withColumn("Geo", F.coalesce(F.col("Geo"), F.lit("NA_OR_OUT")))
        .withColumn("PolicyType", F.coalesce(F.col("PolicyType"), F.lit("A")))
        .withColumn("IsNew", F.when(F.row_number().over(w) == 1, F.lit("N")).otherwise(F.lit("E")))
        .orderBy(F.col("EntryDateTime").asc())
    )
    return out


def auto_optiom_view(transactions_v: DataFrame, optiom: DataFrame) -> DataFrame:
    """AUTO_OPTIOM (settings.yaml:132-140): TRANSACTIONS view ⟕ optiom
    base on VIN, EntryDateTime ≥ 2019-01-01 filter, desc sort.

    Fact-to-fact left join: no broadcast hint, AQE owns the strategy
    (sort-merge + skew split). The date predicate sits below the join
    so it pushes into the fact scan.
    """
    filtered = transactions_v.filter(F.col("EntryDateTime") >= F.lit("2019-01-01").cast("date"))
    op = optiom.select(F.col("VIN").alias("VIN_OP"), *[c for c in optiom.columns if c != "VIN"])
    return (
        filtered.join(op, filtered["VIN_A"] == op["VIN_OP"], "left")
        .orderBy(F.col("EntryDateTime").desc())
    )
