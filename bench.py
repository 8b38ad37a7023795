#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries chosen to cover the engine's hot paths: grouped aggregation,
broadcast-dim star join (the RETENTION view shape), partitioned window
(IsNew), fact-fact join view, time-window merge, exact + minhash
dedup, brute-force and LSH ANN, text stats, event windowing/sessions.
Each query is fully materialized via a count/collect-free action
(``df.write.format("noop")``) so measured time is plan execution, not
driver serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry_mod
from awi_datapipelinepublic_spark import get_spark

BENCH_QUERIES = [
    "grouped_agg",
    "view_retention",
    "view_transactions",
    "view_auto_optiom",
    "merge_time_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine",
    "knn_lsh",
    "knn_ivf",
    "text_stats",
    "events_tumbling",
    "events_session",
    "tpch_q3_topk",
    "tpch_q5_revenue",
    "tpch_q1_pricing",
    "tpch_q6_forecast",
    "asof_join",
    "sliding_window",
    "multimodal_decode",
    # round-1 close additions: training-pipeline headline ops
    "dedup_pipeline",
    "chunk_documents",
    "topk_per_group",
    "range_join_binned",
    "train_test_split",
    # bucketed-layout fact-fact join: first (warm) run pays the one-time
    # bucketed table write; min-of-2 reports the shuffle-free join.
    "colocated_join",
    # corpus-prep additions: vocabulary head, global-sort packing
    "heavy_hitters",
    "sequence_pack",
    # graph / ANN-join / validation additions: iterative PageRank,
    # broadcast-matmul exact kNN join, LSH-bucketed approximate join,
    # cluster-bounded semantic dedup, one-scan expectations suite.
    "pagerank",
    "knn_join",
    "knn_join_lsh",
    "semantic_dedup",
    "validate_expectations",
    # round-3 additions: substring-span dedup profile, deterministic
    # mixture resampling, and the q13/q17/q18 plan shapes (outer-join
    # double-agg, decorrelated per-part avg, HAVING join-back).
    "dup_span_stats",
    "mixture_resample",
    "tpch_q13_custdist",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    # incremental batch-vs-index dedup: the daily-pipeline shape
    "dedup_incremental",
    # round-4 additions: the four TPC-H shapes that complete 22/22 —
    # global-sum-fraction HAVING (q11), distinct-count + NOT IN (q16),
    # nested correlated IN via agg+semi chain (q20), EXISTS+NOT EXISTS
    # via per-order profile (q21).
    "tpch_q11_important_stock",
    "tpch_q16_supplier_cnt",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting_suppliers",
    # hash-verified IVF all-pairs ANN join (the knn_join_lsh twin)
    "knn_join_ivf",
    # late round-4: snapshot diff, span removal, containment verify,
    # iterative spherical k-means
    "dataset_diff",
    "remove_dup_spans",
    "dedup_containment",
    "kmeans_clusters",
    "embedding_outliers",
    # round-5 additions: mixture curation + corpus audit (per-source
    # token-budget window, cross-source containment matrix)
    "token_budget_select",
    "source_overlap",
    # round-5 late additions: PQ ANN (ADC lookup-sum), HOF char
    # entropy, privacy-audit groupBy, z-order bucket audit
    "knn_pq",
    "entropy_quality",
    "k_anonymity",
    "zorder_layout",
    # round-5 mid additions: fixed-size bloom runtime filter,
    # degree-oriented triangle census, DP noisy release counts
    "bloom_prefilter_join",
    "triangle_count",
    "dp_noisy_count",
    # tokenizer-artifact exports: vocab table, bigram LM
    "vocab_build",
    "bigram_lm",
    # the combined billion-vector ANN layout
    "knn_ivfpq",
    # the FineWeb-style curation front half: lang-id + gopher rules
    # fused into the scan, one fingerprint-dedup shuffle
    "curation_pipeline",
    # late round-5: one-scan multi-grain rollup, cohort retention
    # triangle, word-order LM quality proxy, compact-forward triangle
    # census (post-optimization), forward+tolerance as-of
    "time_rollup",
    "cohort_retention",
    "bigram_logprob",
    "asof_join_tolerance",
    # round-6 additions: binning-free KS drift (two-pass running CDFs),
    # last-touch attribution (no-join window), market-basket lift
    # (capped pair expansion), churn/readability/mixture-planning
    # scans, BPE pair counting (distinct-word trick), 3-round LPA
    # communities, host-level URL rollup
    "ks_drift",
    "attribution_last_touch",
    "basket_pair_lift",
    "activity_churn",
    "readability_score",
    "mixture_weights",
    "bpe_top_pairs",
    "label_propagation",
    "url_host_stats",
    # interval-interval overlap as binned equi-join; exact-long
    # t-closeness privacy audit
    "overlap_join",
    "t_closeness",
    # robust MAD outliers, funnel latency, A/B readout, usage heatmap
    "mad_outliers",
    "funnel_timing",
    "ab_test_zscore",
    "activity_heatmap",
    # grouped exact percentiles, 2-D density grid, latency report,
    # share-of-parent rollup
    "group_percentiles",
    "histogram2d",
    "ship_latency_stats",
    "share_of_parent",
    # Benford fraud screen, exact Gini concentration, MoM deltas
    "benford_test",
    "gini_coefficient",
    "period_over_period",
    # telemetry debounce/throttle (keyed lag filter)
    "event_throttle",
    # round-7 additions: robust rolling median (windowed percentile),
    # Poisson quality-weighted downsample (pure filter), edit-distance
    # join via symmetric-delete blocking (linear vs theta-quadratic)
    "rolling_median",
    "poisson_weighted_sample",
    "fuzzy_join_edit1",
    # true one-per-window rate limit; exact-integer graph census
    "event_rate_limit",
    "degree_assortativity",
    # round-8 additions: DSIR importance weights (hashed-ngram
    # distribution ratio), ANN recall harness (IVF vs exact), per-doc
    # 5-gram novelty, label-masked contrastive hard-negative mining
    "dsir_weights",
    "ann_recall_eval",
    "ngram_novelty",
    "hard_negative_mine",
    # CCNet-style LM-score tercile report (exact scalable NTILE)
    "ccnet_buckets",
    # round-8 second batch: series monitors (trailing z-score flags,
    # exact changepoint scan), bucketed 2-D skyline, wedge-join link
    # prediction, Apriori triple mining, contingency MI audit
    "rolling_anomaly",
    "changepoint_scan",
    "skyline_pareto",
    "link_prediction",
    "itemset_triples",
    "mutual_information",
    # zero-shuffle JL projection; single-pass Poisson-bootstrap CI
    "random_projection",
    "poisson_bootstrap",
    # one-scan seq-length decision table (exact-integer ceils)
    "packing_efficiency",
    # exact tie-aware Spearman via two-pass running-sum ranks
    "spearman_corr",
    # leakage-safe LOO target encoding (fact never shuffles)
    "target_encode",
    # exact integer-predicate weighted quantiles (two-pass cumW)
    "weighted_quantiles",
    # cluster-bounded embedding decontamination (cogrouped matmul)
    "semantic_decontaminate",
    # gap-session journey mining (deterministic path top-k)
    "session_paths",
    # named weighted one-mode projection (the graph-gate edge builder)
    "bipartite_project",
    # consistent-hashing reshard audit (zero-shuffle argmax placement)
    "reshard_movement",
    # r10: exact-integer ACF of the daily revenue series
    "acf_lags",
    # r10: two-state Holt recursion per user (applyInPandas)
    "holt_linear",
    # r10: interval-weighted average over irregular samples
    "twap_interval",
    # r10: inter-arrival burstiness per user
    "burstiness",
    # r10: HHI source-concentration audit
    "hhi_concentration",
    # r10: capped local clustering coefficient at the graph's hubs
    "lcc_topk",
    # r10: minhash leakage audit across the md5 split
    "split_leakage",
    # r10: UniMax language budget allocation
    "unimax_weights",
    # r10: day-of-week seasonality shares
    "weekday_profile",
    # r10: embedding-corpus centroid drift (shard health)
    "embedding_drift",
    # r10: capped hub blast radius
    "two_hop_reach",
    # r10: log2 degree distribution (detonation-risk audit)
    "degree_histogram",
    # r10: graded IVF ranking quality (order-aware companion of recall)
    "ann_ndcg_eval",
    # r10: dow-detrended volume anomaly
    "seasonal_anomaly",
    # r10: rank-percentile feature normalization
    "percentile_normalize",
    # r11: RFM rank-quantile segmentation census
    "rfm_segments",
    # r11: Theil-Sen robust monthly-revenue slope
    "theil_sen_trend",
    # r11: per-nation OLS revenue trend
    "trend_by_group",
    # r11: U-shaped attribution in exact basis points
    "attribution_position",
    # r11: gaps-and-islands longest-streak census
    "activity_streaks",
    # r11: CDC changelog materialization (last-wins + tombstones)
    "cdc_apply",
    # r11: bounded multi-source BFS distance field
    "bfs_distance",
    # r11: MRR of the IVF index vs brute top-1
    "ann_mrr_eval",
    # r11: keep-best survivorship per exact-dup cluster
    "dedup_keep_best",
    # r11: per-group 10%-trimmed mean
    "trimmed_mean",
    # r11: cross-source quantile mapping calibration
    "quantile_mapping",
    # r11: Heaps-law vocabulary growth curve
    "vocab_growth",
    # r11: point-in-time SCD2 dimension lookup
    "scd2_lookup",
    # r11: reciprocal exact top-1 cosine pairs
    "mutual_nn",
    # r11: era rank movers (grouped two-pass keyed rank)
    "rank_movers",
    # r11: strict local maxima with prominence
    "local_peaks",
    # r11: grouped rank-bound winsorization
    "winsorize_by_group",
    # r11: chi-square independence cells
    "chi2_independence",
    # r11: integer-exact unnormalized HITS (hub/authority)
    "hits_scores",
    # r11: pairwise source vocabulary Jaccard
    "vocab_overlap",
    # r11: type-token lexical diversity per source
    "ttr_by_source",
    # r11: per-user inactivity episodes
    "activity_gaps",
    # r11: staircase half-life attribution (integer-exact)
    "attribution_time_decay",
    # r11: star-schema referential-integrity audit
    "fk_orphans",
    # r11: log2 length bins per language
    "length_histogram",
    # r11: churn-risk recency features
    "recency_features",
    # r12: per-user Simpson diversity (log-free)
    "simpson_diversity",
    # r12: 2x2 odds ratio per line status
    "odds_ratio",
    # r12: variance-to-mean ratio (DECIMAL moments)
    "dispersion_index",
    # r12: Kendall tau-b over the daily series (calendar-bounded pairs)
    "kendall_tau",
    # r12: per-segment contribution to the period delta
    "growth_decomposition",
    # r12: daily spine + linear interpolation
    "linear_interpolate",
    # r12: l-diversity privacy audit
    "l_diversity",
    # r12: every-k-th systematic sample (two-pass global rank)
    "systematic_sample",
    # r12: Kaplan-Meier life-table components
    "km_hazard",
    # r12: daily new vs returning actives
    "new_vs_returning",
    # r12: within-year repeat-purchase rate
    "repeat_rate",
    # r12: session-duration histogram (integer-microsecond bins)
    "session_duration_hist",
    # r12: seed-carried BFS harmonic centrality (scaled integers)
    "harmonic_centrality",
    # r12: top char trigrams per language
    "char_ngram_topk",
    # r12: Bowley quartile skew (pure-integer rank quartiles)
    "quartile_skew",
    # r12: Tukey-fence outlier census (integer fences)
    "iqr_outliers",
    # r12: Lincoln-Petersen population estimate
    "capture_recapture",
    # r12: Chao1 unseen-vocabulary estimate per language
    "chao1_richness",
    # r12: exact Mann-Whitney ROC-AUC (two-pass running rank)
    "auc_eval",
    # r12: decision-split Gini impurity
    "split_gini",
    # r12: daily user-activity basket lift over event types
    "type_cooccurrence_lift",
    # r12: per-source exact-dup triage
    "dup_rate_by_source",
    # r12: Palma concentration ratio (integer rank cuts)
    "palma_ratio",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("awi-dp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # Warm the JVM + parquet footers (cheapest JVM-only query) AND the
    # Python worker pool (cheapest Arrow-UDF query) so measurements
    # reflect steady state, not one-time startup.
    qs["grouped_agg"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["knn_cosine"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two timed executions per query, report the min: the first run of
    # a query pays one-off plan analysis/codegen and whatever GC/host
    # noise lands on it; min-of-2 is the steady-state per-query cost
    # (the quantity BASELINE.md tracks) with far lower run-to-run
    # variance than single-shot.
    # Measurement-bug fix (r13, guide §1): several operators persist()
    # multiply-consumed intermediates. Spark's CacheManager keys cached
    # plans by CANONICALIZED plan, so the second timed invocation of
    # the same query silently read the first run's cache (measured:
    # two_hop_reach run1 10.3 s, run2 0.98 s) — min-of-2 then reported
    # a cache read, not the query. Clearing the cache before EVERY
    # timed run restores the contract that each invocation computes
    # from the parquet inputs. The clear itself runs outside the timer.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sentinels = _sentinel_ratios(sf_dir, timings)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "sentinels": sentinels,
            }
        )
    )
    # Every bench run also persists the FULL name->seconds map to a
    # repo file: the driver records only the LAST 2000 chars of stdout
    # (BENCH_rN.json "tail"), which truncated the full line above out
    # of r12's PERF comparator entirely (per_query: {}, null geomean).
    # The repo file survives regardless of stdout truncation.
    try:
        (Path(__file__).resolve().parent / "BENCH_NAMED.json").write_text(
            json.dumps(
                {
                    "metric": "bench_total_wall",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "sentinels": sentinels,
                },
                indent=None,
            )
            + "\n"
        )
    except OSError:
        pass  # read-only checkout must not fail the bench
    # Positional compact record (kept for cross-round comparability of
    # the r6..r12 tails): per-query seconds at 2dp aligned with
    # BENCH_QUERIES order. May be partially truncated by the driver's
    # 2000-char tail; BENCH_NAMED.json carries the authoritative map.
    print(
        json.dumps(
            {
                "compact": "t aligns with bench.py BENCH_QUERIES order",
                "total_sec": total,
                "sf": sf,
                "n": len(timings),
                "sentinels": sentinels,
                "t": [round(timings[n], 2) for n in BENCH_QUERIES],
            },
            separators=(",", ":"),
        )
    )
    # FINAL line (the one guaranteed to survive the 2000-char tail):
    # NAMED timings for the slowest queries + the total, so the
    # driver's PERF comparator can align by name without the repo
    # file. Budget: keep the line under 1900 chars.
    def _named_line(top: dict) -> str:
        return json.dumps(
            {
                "named_slowest": top,
                "total_sec": total,
                "sf": sf,
                "n": len(timings),
                "sentinels": sentinels,
            },
            separators=(",", ":"),
        )

    named_top: dict[str, float] = {}
    for q in sorted(timings, key=timings.get, reverse=True):
        named_top[q] = round(timings[q], 2)
        if len(_named_line(named_top)) > 1850:
            del named_top[q]
            break
    print(_named_line(named_top))


# Three fixed queries re-run in DuckDB (min-of-2, same parquet) every
# bench: cross-round BENCH_rN absolute totals drift with host weather
# (r4→r5 measured a uniform ~1.3x inflation); the Spark/DuckDB ratio on
# the SAME run is host-invariant, so rounds stay comparable. Chosen to
# span the engine's regimes: columnar scan+agg (q1), shuffle join+agg
# (q5), window+event-time bucketing (events_tumbling).
SENTINELS = ["tpch_q1_pricing", "tpch_q5_revenue", "events_tumbling"]


def _sentinel_ratios(sf_dir: str, timings: dict) -> dict:
    import time

    try:
        import duckdb

        import __spark_entry__ as em

        oracles = em.oracle_sql()
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        out = {}
        for name in SENTINELS:
            if name not in oracles or name not in timings:
                continue
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
            out[name] = {
                "spark": timings[name],
                "duckdb": round(best, 3),
                "ratio": round(timings[name] / best, 2) if best > 0 else None,
            }
        return out
    except Exception:  # sentinel telemetry must never fail the bench
        return {}


if __name__ == "__main__":
    main()
