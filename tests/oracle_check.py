"""Local mirror of the driver's DuckDB-oracle comparison.

Runs every queries() entry and its oracle_sql() twin on the same
parquet tables, compares row count + sorted-column value frame. Used
both as a pytest (test_queries_oracle.py) and a standalone script for
fast iteration:  python tests/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — the
    order-insensitive frame the driver hashes."""
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # Spark DateType → object of datetime.date; DuckDB DATE →
        # datetime64 — unify before comparing.
        if s.dtype == object and s.dropna().map(lambda v: isinstance(v, datetime.date)).all() and len(s.dropna()):
            s = pd.to_datetime(s)
            df[c] = s
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.astype(str).where(~s.isna(), None)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def _num_kind(s: pd.Series) -> str | None:
    """'i' for integral, 'f' for float, None otherwise."""
    if pd.api.types.is_bool_dtype(s):
        return None
    if pd.api.types.is_integer_dtype(s):
        return "i"
    if pd.api.types.is_float_dtype(s):
        return "f"
    return None


def kind_mismatches(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    """Driver-strict check: the driver hashes raw .df()/toPandas()
    values, so a Spark int64 column paired with a DuckDB float64
    column (e.g. an uncast SUM -> HUGEINT -> float64) hash-mismatches
    as 123 vs 123.0 even though normalize() would coerce them equal.
    Flag every integer-vs-float pairing. Columns where EITHER side
    has nulls are exempt: both pandas paths promote nullable ints to
    float64, so kinds legitimately diverge only on the null-free path."""
    bad = []
    for c in spark_pd.columns:
        if c not in duck_pd.columns:
            continue
        sk, dk = _num_kind(spark_pd[c]), _num_kind(duck_pd[c])
        if sk and dk and sk != dk:
            if spark_pd[c].isna().any() or duck_pd[c].isna().any():
                continue
            bad.append(f"{c}: spark={sk} duck={dk}")
    return bad


def compare_one(spark, con, name: str, qfn, sql: str | None, sf_dir: str) -> str | None:
    """Returns None if matching, else a mismatch description."""
    sdf = qfn(spark, sf_dir)
    spark_pd = sdf.toPandas()
    if sql is None:
        return None if len(spark_pd) >= 0 else "spark query failed"
    duck_pd = con.execute(sql).df()
    if len(spark_pd) != len(duck_pd):
        return f"row count: spark={len(spark_pd)} duck={len(duck_pd)}"
    kinds = kind_mismatches(spark_pd, duck_pd)
    if kinds:
        return f"dtype kind (driver-fatal int-vs-float): {kinds}"
    a, b = normalize(spark_pd), normalize(duck_pd)
    if list(a.columns) != list(b.columns):
        return f"columns: spark={list(a.columns)} duck={list(b.columns)}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
    except AssertionError as e:
        return f"values: {str(e)[:500]}"
    return None


def main(
    sf_dir: str = "/root/testdata/sf0.001",
    only: list[str] | None = None,
    jobs: int = 1,
) -> int:
    """Run gate-vs-oracle comparisons; ``jobs > 1`` runs them on a
    thread pool — the SparkSession schedules concurrent jobs safely,
    and each worker thread gets its own DuckDB cursor (connections
    are not thread-safe; cursors over one connection are the cheap
    isolation duckdb documents). Gates that register fixed-name temp
    views (awi_orders, ...) race benignly: within one run every
    registration binds the same sf_dir parquet, so replace-vs-read
    interleavings always resolve to identical plans. Results print in
    completion order; the exit code is identical to the serial run."""
    import __spark_entry__ as entry_mod

    if os.environ.get("ORACLE_VANILLA") == "1":
        # Replay the DRIVER's session shape: a vanilla Spark 4 builder
        # (ANSI **on**, none of the engine's tuned confs). Round 7
        # shipped two driver-red gates (ab_test_zscore DIVIDE_BY_ZERO,
        # feature_hash array canon) that the tuned-session harness
        # could not see — this mode is the local gate against that
        # class. Run it from a foreign cwd via test_vanilla_session.py
        # or: ORACLE_VANILLA=1 python tests/oracle_check.py <sf> '' 8
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "oracle-check-vanilla"
        ).getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.ansi.enabled") == "true", (
            "vanilla probe must run ANSI-on (the driver default)"
        )
    else:
        from awi_datapipelinepublic_spark import get_spark

        spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    todo = [(n, f) for n, f in qs.items() if not only or n in only]

    def run(item):
        name, qfn = item
        local_con = con.cursor() if jobs > 1 else con
        try:
            msg = compare_one(spark, local_con, name, qfn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            msg = f"exception: {type(e).__name__}: {str(e)[:300]}"
        finally:
            if jobs > 1:
                local_con.close()
        return name, msg

    failures = 0
    if jobs > 1:
        from concurrent.futures import ThreadPoolExecutor, as_completed

        # Streaming gates (writeStream + availableNow drain) starve
        # when their micro-batch jobs queue behind a saturated pool of
        # batch queries (measured: a 300 s awaitTermination timeout at
        # jobs=6, and >25 min total with a patient drain). Run them
        # SERIALLY after the pool drains — they are few and their wall
        # time is dominated by their own stream lifecycle anyway.
        # Membership comes from the EXPLICIT registry in
        # __spark_entry__.STREAMING_GATES — source-text sniffing for
        # "writeStream" misses a gate that drains via a helper owning
        # the writeStream call.
        streaming_ids = getattr(entry_mod, "STREAMING_GATES", frozenset())
        pooled = [it for it in todo if it[0] not in streaming_ids]
        serial = [it for it in todo if it[0] in streaming_ids]
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            futures = [ex.submit(run, it) for it in pooled]
            results = [f.result() for f in as_completed(futures)]
        results += [run(it) for it in serial]
    else:
        results = [run(it) for it in todo]
    for name, msg in results:
        tag = "rows-only" if name not in oracles else "oracle"
        if msg:
            failures += 1
            print(f"FAIL  {name} [{tag}]: {msg}")
        else:
            print(f"ok    {name} [{tag}]")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else None
    jobs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sys.exit(1 if main(sf, only, jobs) else 0)
