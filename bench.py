#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is end-to-end per query: plan construction + execution + collect.
A warmup query first absorbs JVM/codegen startup so per-query numbers
measure the engine, not JIT."""

from __future__ import annotations

import json
import os
import sys
import time

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark

# Headline set: the flagship reference aggregate + the relational core +
# every LLM-extension family (dedup, similarity, text), measuring the SCALE
# paths. The O(n²) exact-verification paths (near_dup_topk_pairs, all-pairs
# cosine) are deliberately NOT here — they exist as sf0.01 recall oracles,
# not as operations anyone would run at 100 TB; benching them would reward
# the wrong plan.
HEADLINE = [
    "window_metrics",
    "risk_label",
    "json_parse_props",
    "kafka_wire_roundtrip",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_excess_stock_suppliers",
    "q21_waiting_suppliers",
    "q22_wealthy_no_orders",
    "top_k_orders",
    "agg_stats_orders",
    "ranking_top3_per_segment",
    "analytic_running_totals",
    "range_frame_trailing_counts",
    "json_path_extraction",
    "left_join_order_counts",
    "rollup_lineitem",
    "cube_order_stats",
    "analytic_distribution_windows",
    "unpivot_returnflag",
    "grouping_sets_revenue",
    "approx_distinct_bounds",
    "approx_quantile_bounds",
    "asof_join_latest_view",
    "interval_join_click_errors",
    "text_stats_per_lang",
    "quality_scores",
    "doc_fingerprints",
    "doc_chunks",
    "train_validation_split",
    "top_bigrams",
    "benchmark_decontamination",
    "dedup_exact_docs",
    "fuzzy_name_matches",
    "incremental_exact_dedup",
    "minhash_lsh_near_dups",
    "incremental_minhash_near_dups",
    "simhash_near_dups",
    "cosine_topk",
    "ann_lsh_topk",
    "ivf_ann_topk",
    "embedding_near_dup_pairs",
    "label_centroids",
    "pandas_udf_vector_norms",
    "array_hof_battery",
    "user_trend_partition_local",
    "training_corpus_clean",
    "multimodal_feature_extract",
    "multimodal_feature_extract_builtin",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches, plus Python/Arrow
    # worker spawn (a trivial non-headline mapInPandas) so pandas-path
    # timings measure the operators, not process startup.
    QUERIES["window_metrics"](spark, sf_dir).collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
