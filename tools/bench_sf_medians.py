"""Dispersion-honest scale benchmark (VERDICT r6 item 4).

The r6 sf10 table published best-of-3 single-pass numbers; the judge's
contended re-run reproduced the crossover class (asof 0.03×) but not
the tightest ratios (q21 0.90× → 2.24×, q3 4.6× → 10.4×). This tool
runs each query N times (default 5) after a warm pass and reports
MEDIAN + MIN for both engines, plus suite medians and per-query-ratio
geomean/median, so the headline totals cannot be read as per-query and
box-state sensitivity is visible in the spread.

Usage: python tools/bench_sf_medians.py [sf_dir] [runs] [out.json]
Defaults: .scratch/sf10, 5 runs, BENCH_SF_MEDIANS.json.
Same comparison protocol as bench.py (docs/BENCH_NOTES.md): noop-sink
timing action, base tables cached (resident-engine shape on both
sides), DuckDB runs the byte-identical oracle SQL in the same process.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

QUERIES = [
    # bench.py HEADLINE
    "flagship_fraud_enriched",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q7_volume_shipping",
    "a4_tumble_agg",
    "w_rank_topk",
    "sessionize_events",
    "asof_latest_order",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    "corpus_token_stats",
    # round-6/7 additions measured at sf10
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q16_supplier_part_counts",
    "tpch_q21_waiting_suppliers",
    "dedup_keep_best",
    "corpus_boilerplate_ngrams",
    "quantile_stats_exact",
    "trend_daily_slope",
    "events_funnel",
    "histogram_rollup",
    "sample_stratified_exact",
    "cms_heavy_hitters",
    "hybrid_rrf_retrieval",
    "dedup_containment",
    "customer_rfm_segments",
    "events_retention_cohorts",
    "vocab_coverage",
    "dq_expectations",
    "mad_robust_stats",
    "canonicalize_corpus",  # Spark side only (DUCK_SKIP below)
    "d_snapshot_diff",  # table built once at plan time; runs time the diff
    # round-8 additions
    "tpch_q4_order_priority",
    "tpch_q14_promotion_effect",
    "tpch_q18_large_volume_customers",
    "embedding_outlier_scores",
    "events_time_weighted_avg",
    "dedup_paragraphs",
    "fuzzy_pairs_supplier_names",
    "events_top_paths",
    # round-8 third-session additions
    "events_gap_fill_locf",
    "events_dyadic_wma",
    "interval_join_value_tiers",
    "events_rolling_zscore",
    "trend_theil_sen",
    "corpus_pmi_collocations",
    "skyline_parts",
    "chisq_event_dow_cells",
    "corr_lineitem_measures",
    "ab_welch_ttest",
    "weighted_median_price",
    "benford_price_digits",
    "pareto_revenue_deciles",
    "text_word_entropy",
    # round-8 fourth-session additions
    "ks_test_value_dist",
    "mwu_auc_value_dist",
    "kl_hourly_drift",
    "lm_perplexity_score",
    "attribution_last_touch",
    "audience_overlap_matrix",
    "basket_brand_lift",
    "events_percentile_rank",
    "events_daily_new_users_cum",
    "orders_interarrival_stats",
    "lm_bigram_perplexity",
    # round-9 additions
    "tpch_q4_semijoin_late_orders",
    "doc_ngram_novelty",
    "events_seasonal_anomaly",
    "embedding_dim_stats",
    "revenue_gini",
    "embedding_kmeans_step",
    "orders_open_backlog_daily",
    "events_cusum_changepoint",
    "asof_nearest_order",
    "corpus_zipf_fit",
    # round-9 second batch (added AFTER the committed r9 capture — first
    # medians entries will appear in the next full re-capture)
    "attribution_shapley",
    "lm_kneser_ney_bigrams",
    "corpus_shard_manifest",
    "events_dau_wau_stickiness",
    "orders_cohort_ltv",
    "session_length_quantiles",
    "orders_seasonality_decomposition",
    "events_user_fano_dispersion",
    "corpus_word_burstiness",
    "corpus_source_jsd",
    # round-10 additions
    "order_fulfillment_latency",
    "corpus_simpson_diversity",
    "corpus_source_dup_inflation",
    # embedding_pca_power_iteration is EXCLUDED: its three iterations run
    # eagerly at plan-build time (per-iteration bounded collects), so the
    # noop-sink action would time only the final 64-row literal frame —
    # a meaningless number, not a flattering one. Timed ad hoc in
    # docs/ROUND9_NOTES.md instead.
    # other lifecycle table-history queries stay excluded (each rebuilds
    # its table inside the timed action; not a steady-state measurement)
]

# Queries whose DuckDB oracle is intractable at sf10 — run the Spark side
# only and publish no ratio (the honest record of a class where the
# single-node recursive formulation collapses).
DUCK_SKIP = {"canonicalize_corpus"}

# DuckDB single runs that exceed this many seconds get fewer repeats
# (the median still comes from >=3 samples unless a single run is huge).
DUCK_SLOW_CUTOFF = 20.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SF_MEDIANS.json"
    # optional 4th arg "i:j" — measure only QUERIES[i:j]. Used by
    # bench_sf_medians_chunked.py to run every chunk in a FRESH JVM:
    # a single 91-query session accumulates heap/codegen pressure that
    # inflated mid-suite queries 2-4× over their clean-session numbers
    # (q1 run spread 0.77-5.0 s within one 5-run set; corr 2.1 s in a
    # 12-query session vs 6-10 s mid-big-session — measured r10).
    # "i:j" = slice of QUERIES; "name1,name2" = explicit repair list
    # (used to re-measure rows whose run arrays show host-noise steal —
    # monotone multi-x inflation on an otherwise idle box).
    q_slice = sys.argv[4] if len(sys.argv) > 4 else None
    if q_slice and ":" in q_slice:
        i, j = (int(x) for x in q_slice.split(":"))
        del QUERIES[j:]
        del QUERIES[:i]
    elif q_slice:
        keep = set(q_slice.split(","))
        QUERIES[:] = [n for n in QUERIES if n in keep]

    from data_iceberg_sandbox_spark.session import get_spark_session
    from data_iceberg_sandbox_spark.sources.registry import TABLES

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = [n for n in QUERIES if n not in queries]
    if missing:
        # fail LOUD (r14 sweep): a renamed/deleted registry entry used to
        # silently drop out of the capture — the suite total then shrank
        # and read as "got faster" with no error anywhere (same class as
        # the bench.py override bug fixed r13)
        raise SystemExit(f"QUERIES names not in the registry: {missing}")
    names = list(QUERIES)

    # 80g heap: with the default 48g, caching the sf10 tables leaves the
    # JVM under enough GC pressure that Spark medians spread 3x (q18:
    # 20.4->6.1s within one 5-run capture) while DuckDB stays flat —
    # measured round 8. Must be set before the JVM starts.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "80g")
    spark = get_spark_session(
        app_name="bench_medians",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.sql.files.openCostInBytes": "262144",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    # Balanced pin (r10): parquet row groups bound scan parallelism —
    # sf10 documents.parquet has FIVE row groups (embeddings two), so a
    # cache built straight off the scan runs every document/embedding
    # query ≤5-way parallel on a 32-core box; this was the dominant
    # term of the r9 sf10 tail (doc_ngram_novelty 31.9 s, pmi 15.7 s).
    # One round-robin repartition at pin time fixes the layout once.
    from data_iceberg_sandbox_spark.sources.registry import pin_balanced

    pinned = pin_balanced(spark, sf_dir)

    def run_once(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    spark_times: dict[str, list[float]] = {}
    for n in names:
        df = queries[n](spark, sf_dir)
        run_once(df)  # warm (codegen, cache fill, python workers)
        spark_times[n] = [round(run_once(df), 3) for _ in range(runs)]
        print(f"spark {n}: {spark_times[n]}", file=sys.stderr, flush=True)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    duck_times: dict[str, list[float]] = {}
    for n in names:
        sql = oracles.get(n)
        if not sql or n in DUCK_SKIP:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()  # warm
        first = time.perf_counter() - t0
        reps = runs if first < DUCK_SLOW_CUTOFF else max(2, runs - 3)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(round(time.perf_counter() - t0, 3))
        duck_times[n] = samples
        print(f"duckdb {n}: {samples}", file=sys.stderr, flush=True)

    def med(xs):
        return round(statistics.median(xs), 3)

    per_query = {}
    ratios = []
    for n in names:
        s_med, s_min = med(spark_times[n]), min(spark_times[n])
        row = {
            "spark_median": s_med,
            "spark_min": s_min,
            "spark_runs": spark_times[n],
        }
        if n in duck_times:
            d_med, d_min = med(duck_times[n]), min(duck_times[n])
            row.update(
                duckdb_median=d_med,
                duckdb_min=d_min,
                duckdb_runs=duck_times[n],
                ratio_median=round(s_med / d_med, 2) if d_med else None,
            )
            ratios.append(s_med / d_med)
        per_query[n] = row

    # ratio_of_totals on the MATCHED subset only (r14 sweep): the old
    # form divided the FULL spark total (including DUCK_SKIP /
    # no-oracle rows) by the duckdb total of the subset that ran —
    # a mixed-denominator stat that inflated the ratio against Spark
    # by exactly the skipped rows' spark time.
    matched_spark = round(
        sum(v["spark_median"] for n, v in per_query.items() if n in duck_times),
        2,
    )
    payload = {
        "sf_dir": sf_dir,
        "runs": runs,
        "suite_spark_median_total": round(
            sum(v["spark_median"] for v in per_query.values()), 2
        ),
        "suite_spark_median_total_matched": matched_spark,
        "suite_duckdb_median_total": round(
            sum(v.get("duckdb_median", 0) for v in per_query.values()), 2
        ),
        "ratio_of_totals": None,
        "per_query_ratio_median": (
            round(statistics.median(ratios), 2) if ratios else None
        ),
        "per_query_ratio_geomean": (
            round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 2)
            if ratios
            else None
        ),
        "per_query": per_query,
    }
    if payload["suite_duckdb_median_total"]:
        payload["ratio_of_totals"] = round(
            matched_spark / payload["suite_duckdb_median_total"], 2
        )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "per_query"}))


if __name__ == "__main__":
    main()
