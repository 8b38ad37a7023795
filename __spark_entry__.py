"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator ID from SURVEY.md §2
(plus the engine's scale-path extensions: dedup, similarity search,
text analysis, event windowing) to a (spark, sf_dir) → DataFrame
callable built on awi_datapipelinepublic_spark. ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL; IDs without an oracle entry
(minhash-LSH, simhash, LSH-ANN — hash functions are engine-specific)
get the driver's rows-only check and are cross-verified in tests/
instead (e.g. LSH candidates ⊇ high-jaccard pairs).

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before value-hashing. Float aggregates
are rounded on both sides to absorb summation-order ulps.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from awi_datapipelinepublic_spark.functions import text as X
from awi_datapipelinepublic_spark.functions.cleaning import strip_excel
from awi_datapipelinepublic_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from awi_datapipelinepublic_spark.operators.events import sessionize, tumbling_window_agg
from awi_datapipelinepublic_spark.operators.joins import dim_join, fact_fact_left
from awi_datapipelinepublic_spark.operators.merge import merge_time_window
from awi_datapipelinepublic_spark.operators.similarity import knn_brute_force, knn_lsh
from awi_datapipelinepublic_spark.operators.windows import is_new_flag, min_over_partition
from awi_datapipelinepublic_spark.sources.readers import read_events

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))


# ---------------------------------------------------------------------------
# §2.B — projections / scalar transforms (reference clean stage)
# ---------------------------------------------------------------------------

def q_project_prune(spark, sf_dir):
    """project_prune (config.py:135): prune to declared columns."""
    return _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


def q_fn_strip_excel(spark, sf_dir):
    """fn_strip_excel (config.py:31-33): strip '\"' '=' runs from both ends.
    Dirt is synthesized so the transform is observable."""
    c = _t(spark, sf_dir, "customer")
    dirty = F.concat(F.lit('="'), F.col("c_name"), F.lit('"'))
    return c.select("c_custkey", strip_excel(dirty).alias("cleaned"))


def q_filter_notnull_date(spark, sf_dir):
    """filter_notnull_date (config.py:138) + fn_isnotnull (settings.yaml:61)."""
    o = _t(spark, sf_dir, "orders")
    d = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderdate"))
    return (
        o.withColumn("d", d)
        .filter(F.col("d").isNotNull())
        .select("o_orderkey", "d")
    )


def q_cast_date_coerce(spark, sf_dir):
    """cast_date_coerce (config.py:139-142): unparseable → NULL, not error."""
    o = _t(spark, sf_dir, "orders")
    s = F.when(F.col("o_orderkey") % 5 == 0, F.lit("not-a-date")).otherwise(
        F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    # try_to_date, not to_date: NULL-on-failure must hold even under
    # ANSI mode (Spark 4 default in an untuned driver session).
    return o.select("o_orderkey", F.try_to_date(s).alias("d"))


def q_null_normalize(spark, sf_dir):
    """null_normalize (config.py:143): '' → NULL."""
    c = _t(spark, sf_dir, "customer")
    seg = F.when(F.col("c_custkey") % 3 == 0, F.lit("")).otherwise(F.col("c_mktsegment"))
    return c.select(
        "c_custkey", F.when(seg == "", None).otherwise(seg).alias("segment")
    )


def q_cast_schema(spark, sf_dir):
    """cast_schema (config.py:144): bulk cast to declared types."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
    )


def q_with_literal(spark, sf_dir):
    """with_literal (config.py:119-120): constant provenance column."""
    return _t(spark, sf_dir, "supplier").select("s_suppkey", F.lit("prime").alias("SOURCE"))


def q_align_union(spark, sf_dir):
    """align_columns + concat_rows + union_all (config.py:121-128,195):
    two schema-divergent slices, NULL-padded and unioned by name."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("prime").alias("SOURCE")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderpriority", F.lit("plus").alias("SOURCE")
    )
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# §2.C — joins
# ---------------------------------------------------------------------------

def q_join_dim_miss(spark, sf_dir):
    """join_geo/join_agencies pattern (settings.yaml:57,59): broadcast
    left join against a partial dimension; misses → NULL payload →
    COALESCE default (settings.yaml:28)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    out = dim_join(c, n, "c_nationkey", "n_nationkey", {"n_name": "nation_name"},
                   default={"nation_name": "NO_NATION"})
    return out.select("c_custkey", "nation_name")


def q_join_channels(spark, sf_dir):
    """join_channels/join_ttypes pattern (settings.yaml:58,60): full-
    coverage broadcast lookup join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    out = dim_join(o, c, "o_custkey", "c_custkey", {"c_mktsegment": "segment", "c_name": "customer_name"})
    return out.select("o_orderkey", "segment", "customer_name")


def q_join_fact_fact(spark, sf_dir):
    """join_fact_fact (settings.yaml:135-137): unbounded⟕unbounded left
    equi-join, AQE-managed sort-merge."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("ok"), "o_orderdate", "o_orderstatus")
    out = fact_fact_left(li, o, "l_orderkey", "ok")
    return out.select("l_orderkey", "l_linenumber", "l_extendedprice", "o_orderdate", "o_orderstatus")


# ---------------------------------------------------------------------------
# §2.D / §2.E — aggregations & windows
# ---------------------------------------------------------------------------

def q_agg_min_scalar(spark, sf_dir):
    """agg_min_scalar (config.py:180-187): ungrouped MIN — the merge cutoff."""
    return _t(spark, sf_dir, "orders").agg(F.min("o_orderdate").alias("mindate"))


def q_agg_min_windowed(spark, sf_dir):
    """agg_min_windowed / win_min_partition (settings.yaml:92)."""
    o = _t(spark, sf_dir, "orders")
    out = min_over_partition(o, "o_custkey", "o_orderkey", "min_orderkey")
    return out.select("o_orderkey", "o_custkey", "min_orderkey")


def q_win_row_number(spark, sf_dir):
    """win_row_number (settings.yaml:94): global sequence. Ordered by a
    unique key so the result is deterministic; the scalable two-pass
    variant is operators/windows.global_row_number (tested in tests/)."""
    e = read_events(spark, sf_dir)
    return e.select(
        "event_id",
        F.row_number().over(Window.orderBy(F.col("event_id").asc())).cast("long").alias("rn"),
    )


def q_derive_is_new(spark, sf_dir):
    """derive_is_new (settings.yaml:90-94): first-ever row per key → 'N'.
    Deterministic tie-break on the unique order key."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey", "o_custkey",
        F.when(F.row_number().over(w) == 1, F.lit("N")).otherwise(F.lit("E")).alias("IsNew"),
    )


def q_grouped_agg(spark, sf_dir):
    """Grouped aggregation surface (TPC-H Q1 shape) — beyond the
    reference's aggregate vocabulary (SURVEY.md §2.D note)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # money columns are exact 2-dp; the discounted product is exact
            # 4-dp, so round(4) is identity on the true value — robust to
            # cross-engine summation-order ulps, unlike round(2) which can
            # sit on a half boundary.
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.F / §2.G — sorts, top-k, expressions
# ---------------------------------------------------------------------------

def q_limit_topk(spark, sf_dir):
    """limit_topk (README.md:56): most recent N — TakeOrderedAndProject,
    never a full sort. Unique-key tie-break for determinism."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


def q_fn_expressions(spark, sf_dir):
    """fn_coalesce + fn_case_eq + fn_date_cmp (settings.yaml:28-35,138):
    the reference's full scalar-expression vocabulary in one projection."""
    o = _t(spark, sf_dir, "orders")
    pri = F.when(F.col("o_orderkey") % 11 == 0, None).otherwise(F.col("o_orderpriority"))
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            F.coalesce(pri, F.lit("NONE")).alias("priority"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("Fulfilled"),
            F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("Open"),
            F.when(F.col("o_orderstatus") == "P", 1).otherwise(0).alias("Pending"),
        )
    )


# ---------------------------------------------------------------------------
# §2.H — composite: time-window merge + the three views
# ---------------------------------------------------------------------------

_MERGE_CUT = "1997-06-01"


def q_merge_time_window(spark, sf_dir):
    """merge_time_window (config.py:190-212): new batch owns
    [min(new.date), ∞); base history below the cutoff survives.
    The new batch restates quantities (+100) so ownership is observable."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    new_batch = li.filter(F.col("l_shipdate") >= F.lit(_MERGE_CUT).cast("timestamp")).withColumn(
        "l_quantity", F.col("l_quantity") + 100
    )
    return merge_time_window(li, new_batch, "l_shipdate")


def q_view_retention(spark, sf_dir):
    """view_retention (settings.yaml:24-63) re-expressed on TPC-H:
    projection → broadcast left joins (with a partial dim for misses) →
    COALESCE defaults → CASE status indicators → NOT NULL filter → sort."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    r = _t(spark, sf_dir, "region")
    enriched = dim_join(o, c, "o_custkey", "c_custkey", {"c_name": "customer_name", "c_nationkey": "c_nationkey"})
    enriched = dim_join(enriched, n, "c_nationkey", "n_nationkey",
                        {"n_name": "nation_name", "n_regionkey": "n_regionkey"})
    enriched = dim_join(enriched, r, "n_regionkey", "r_regionkey", {"r_name": "region_name"})
    return (
        enriched.withColumn("nation_name", F.coalesce(F.col("nation_name"), F.lit("NO_NATION")))
        .withColumn("region_name", F.coalesce(F.col("region_name"), F.lit("NO_REGION")))
        .withColumn("Fulfilled", F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .withColumn("Open", F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .withColumn("Pending", F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
        .filter(F.col("customer_name").isNotNull())
        .orderBy(F.col("o_orderdate").asc())
        .select(
            "o_orderkey", "o_orderdate", "o_totalprice", "customer_name",
            "nation_name", "region_name", "Fulfilled", "Open", "Pending",
        )
    )


def q_view_transactions(spark, sf_dir):
    """view_transactions (settings.yaml:88-123) on TPC-H: dims + the
    IsNew first-transaction flag via one partitioned window."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    enriched = dim_join(o, c, "o_custkey", "c_custkey", {"c_mktsegment": "segment"},
                        default={"segment": "NO_SEGMENT"})
    out = is_new_flag(
        enriched.withColumn("__tiebreak", F.col("o_orderkey")), "o_custkey", "o_orderdate"
    )
    # deterministic IsNew needs the unique-key tie-break; rebuild window here
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return enriched.select(
        "o_orderkey", "o_custkey", "o_orderdate", "segment",
        F.when(F.row_number().over(w) == 1, F.lit("N")).otherwise(F.lit("E")).alias("IsNew"),
    )


def q_view_auto_optiom(spark, sf_dir):
    """view_auto_optiom (settings.yaml:132-140) on TPC-H: view-on-view —
    the transactions-shaped view ⟕ a second fact keyed the same way,
    date filter below the join, desc sort."""
    tx = q_view_transactions(spark, sf_dir).filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    return (
        tx.join(li, tx["o_orderkey"] == li["ok"], "left")
        .orderBy(F.col("o_orderdate").desc())
        .select("o_orderkey", "o_custkey", "o_orderdate", "segment", "IsNew", "revenue")
    )


# ---------------------------------------------------------------------------
# Extensions: deduplication
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5-of-normalized-text groupBy, keep lowest id."""
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d).select("fingerprint", "doc_id", "dup_count")


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram (k=3 word shingles) Jaccard near-dup pairs ≥ 0.5."""
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), k=3, threshold=0.5)


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs (no SQL oracle: xxhash64 is
    engine-specific; recall vs exact jaccard is asserted in tests/)."""
    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"), num_hashes=32, bands=8, k=3)


def q_dedup_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints (rows-only check; determinism and
    near-dup locality asserted in tests/)."""
    d = _t(spark, sf_dir, "documents")
    return simhash(d).select("doc_id", "simhash")


# ---------------------------------------------------------------------------
# Extensions: similarity search
# ---------------------------------------------------------------------------

def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row["embedding"]]


def q_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-10 to the vec_id=0 embedding —
    TakeOrderedAndProject over one scan."""
    return knn_brute_force(_t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10)


def q_knn_lsh(spark, sf_dir):
    """Sign-LSH bucketed ANN top-10 (rows-only; recall vs brute force
    asserted in tests/)."""
    return knn_lsh(_t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), dim=64, k=10, h=8)


# ---------------------------------------------------------------------------
# Extensions: text analysis
# ---------------------------------------------------------------------------

def q_text_stats(spark, sf_dir):
    """Token counting + stopword ratio + fingerprint in one projection."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        F.round(X.stopword_ratio("text"), 6).alias("stop_ratio"),
        X.doc_fingerprint("text").alias("fingerprint"),
    )


def q_lang_id(spark, sf_dir):
    """Stopword-ratio language heuristic."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.lang_id("text").alias("lang_pred"))


def q_quality_score(spark, sf_dir):
    """Composite quality score (length/stopword/punctuation)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.quality_score("text").alias("quality"))


# ---------------------------------------------------------------------------
# Extensions: event-stream analytics
# ---------------------------------------------------------------------------

def q_events_tumbling(spark, sf_dir):
    """Tumbling 1-hour windowed counts/sums per event type."""
    return tumbling_window_agg(read_events(spark, sf_dir))


def q_events_session(spark, sf_dir):
    """Gap-based sessionization (30 min idle → new session)."""
    return sessionize(read_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the RETENTION-shaped view (projection → broadcast left
    joins → COALESCE → CASE indicators → filter → sort) on sf0.001."""
    return q_view_retention(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "project_prune": q_project_prune,
        "fn_strip_excel": q_fn_strip_excel,
        "filter_notnull_date": q_filter_notnull_date,
        "cast_date_coerce": q_cast_date_coerce,
        "null_normalize": q_null_normalize,
        "cast_schema": q_cast_schema,
        "with_literal": q_with_literal,
        "align_union": q_align_union,
        "join_dim_miss": q_join_dim_miss,
        "join_channels": q_join_channels,
        "join_fact_fact": q_join_fact_fact,
        "agg_min_scalar": q_agg_min_scalar,
        "agg_min_windowed": q_agg_min_windowed,
        "win_row_number": q_win_row_number,
        "derive_is_new": q_derive_is_new,
        "grouped_agg": q_grouped_agg,
        "limit_topk": q_limit_topk,
        "fn_expressions": q_fn_expressions,
        "merge_time_window": q_merge_time_window,
        "view_retention": q_view_retention,
        "view_transactions": q_view_transactions,
        "view_auto_optiom": q_view_auto_optiom,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "knn_cosine": q_knn_cosine,
        "knn_lsh": q_knn_lsh,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "events_tumbling": q_events_tumbling,
        "events_session": q_events_session,
    }


_STOPWORDS_SQL = "(" + ",".join(f"'{w}'" for w in X.EN_STOPWORDS) + ")"

# DuckDB-dialect shared fragments for the text oracles. Tokenization is
# normalize (lower, collapse whitespace, trim) then split on single
# spaces — identical to functions/text.py.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


def oracle_sql() -> dict[str, str]:
    return {
        "project_prune": "SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem",
        "fn_strip_excel": """
            SELECT c_custkey, trim('="' || c_name || '"', '"=') AS cleaned FROM customer
        """,
        "filter_notnull_date": """
            SELECT o_orderkey, d FROM (
              SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderdate END AS d
              FROM orders) WHERE d IS NOT NULL
        """,
        "cast_date_coerce": """
            SELECT o_orderkey,
                   TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-date'
                                 ELSE strftime(o_orderdate, '%Y-%m-%d') END AS DATE) AS d
            FROM orders
        """,
        "null_normalize": """
            SELECT c_custkey,
                   NULLIF(CASE WHEN c_custkey % 3 = 0 THEN '' ELSE c_mktsegment END, '') AS segment
            FROM customer
        """,
        "cast_schema": """
            SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   CAST(l_quantity AS DOUBLE) AS l_quantity,
                   CAST(l_shipdate AS DATE) AS ship_date,
                   CAST(l_returnflag AS VARCHAR) AS l_returnflag
            FROM lineitem
        """,
        "with_literal": "SELECT s_suppkey, 'prime' AS SOURCE FROM supplier",
        "align_union": """
            SELECT o_orderkey, o_totalprice, 'prime' AS SOURCE, NULL AS o_orderpriority
            FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey, NULL AS o_totalprice, 'plus' AS SOURCE, o_orderpriority
            FROM orders WHERE o_orderstatus = 'O'
        """,
        "join_dim_miss": """
            SELECT c_custkey, COALESCE(n.n_name, 'NO_NATION') AS nation_name
            FROM customer c LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
              ON c.c_nationkey = n.n_nationkey
        """,
        "join_channels": """
            SELECT o_orderkey, c.c_mktsegment AS segment, c.c_name AS customer_name
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "join_fact_fact": """
            SELECT l_orderkey, l_linenumber, l_extendedprice, o.o_orderdate, o.o_orderstatus
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        """,
        "agg_min_scalar": "SELECT MIN(o_orderdate) AS mindate FROM orders",
        "agg_min_windowed": """
            SELECT o_orderkey, o_custkey,
                   MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS min_orderkey
            FROM orders
        """,
        "win_row_number": """
            SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id ASC) AS rn FROM events
        """,
        "derive_is_new": """
            SELECT o_orderkey, o_custkey,
                   CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
                        THEN 'N' ELSE 'E' END AS IsNew
            FROM orders
        """,
        "grouped_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "limit_topk": """
            SELECT o_orderkey, o_orderdate, o_totalprice
            FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 10
        """,
        "fn_expressions": """
            SELECT o_orderkey,
                   COALESCE(CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END,
                            'NONE') AS priority,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS Fulfilled,
                   CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS Open,
                   CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS Pending
            FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        """,
        "merge_time_window": f"""
            WITH newb AS (
              SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity + 100 AS l_quantity
              FROM lineitem WHERE l_shipdate >= TIMESTAMP '{_MERGE_CUT}'
            )
            SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
            WHERE l_shipdate < (SELECT MIN(l_shipdate) FROM newb)
            UNION ALL
            SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM newb
        """,
        "view_retention": """
            SELECT o_orderkey, o_orderdate, o_totalprice,
                   c.c_name AS customer_name,
                   COALESCE(n.n_name, 'NO_NATION') AS nation_name,
                   COALESCE(r.r_name, 'NO_REGION') AS region_name,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS Fulfilled,
                   CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS Open,
                   CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS Pending
            FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
              ON c.c_nationkey = n.n_nationkey
            LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE c.c_name IS NOT NULL
            ORDER BY o_orderdate ASC
        """,
        "view_transactions": """
            SELECT o_orderkey, o_custkey, o_orderdate,
                   COALESCE(c.c_mktsegment, 'NO_SEGMENT') AS segment,
                   CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
                        THEN 'N' ELSE 'E' END AS IsNew
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "view_auto_optiom": """
            WITH tx AS (
              SELECT o_orderkey, o_custkey, o_orderdate,
                     COALESCE(c.c_mktsegment, 'NO_SEGMENT') AS segment,
                     CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
                          THEN 'N' ELSE 'E' END AS IsNew
              FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            ),
            rev AS (
              SELECT l_orderkey AS ok,
                     ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
              FROM lineitem GROUP BY l_orderkey
            )
            SELECT o_orderkey, o_custkey, o_orderdate, segment, IsNew, rev.revenue
            FROM tx LEFT JOIN rev ON tx.o_orderkey = rev.ok
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            ORDER BY o_orderdate DESC
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS fingerprint,
                   MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 3
                          THEN array_distinct(list_transform(range(1, len(t) - 1),
                               i -> array_to_string(t[i:i+2], ' ')))
                          ELSE [array_to_string(t, ' ')] END AS shs
              FROM toks),
            ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   ROUND(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
        """,
        "knn_cosine": """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cos
            FROM embeddings
            ORDER BY cos DESC, vec_id ASC LIMIT 10
        """,
        "text_stats": f"""
            SELECT doc_id,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   ROUND(len(list_filter(list_transform({_TOKS},
                         x -> regexp_replace(x, '[^a-z]', '', 'g')),
                         x -> x IN {_STOPWORDS_SQL})) * 1.0 / len({_TOKS}), 6) AS stop_ratio,
                   md5({_NORM}) AS fingerprint
            FROM documents
        """,
        "lang_id": f"""
            SELECT doc_id,
                   CASE WHEN len(list_filter(list_transform({_TOKS},
                        x -> regexp_replace(x, '[^a-z]', '', 'g')),
                        x -> x IN {_STOPWORDS_SQL})) * 1.0 / len({_TOKS}) >= 0.08
                        THEN 'en' ELSE 'unknown' END AS lang_pred
            FROM documents
        """,
        "quality_score": f"""
            WITH base AS (
              SELECT doc_id,
                     len({_TOKS}) AS n_tokens,
                     len(list_filter(list_transform({_TOKS},
                         x -> regexp_replace(x, '[^a-z]', '', 'g')),
                         x -> x IN {_STOPWORDS_SQL})) AS n_stop,
                     length(text) AS n_chars_all,
                     length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_nonpunct
              FROM documents)
            SELECT doc_id,
                   ROUND(0.4 * LEAST(n_tokens / 200.0, 1.0)
                       + 0.4 * LEAST((n_stop * 1.0 / n_tokens) / 0.2, 1.0)
                       + 0.2 * (1.0 - (n_chars_all - n_nonpunct) * 1.0 / n_chars_all), 6) AS quality
            FROM base
        """,
        "events_tumbling": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_session": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
            s AS (
              SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                                      ROWS UNBOUNDED PRECEDING) AS session_no
              FROM g)
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, session_no
        """,
    }
