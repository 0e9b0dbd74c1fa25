#!/usr/bin/env python
"""Generate the OPTIMIZATION_r19.md per-query checklist table: every
bench.py headline entry with its baseline and final sf0.1 timing and the
action this round took (changed-via / inherits / examined-left-alone).

Usage: python tools/gen_opt_checklist.py BASELINE.json FINAL.json
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
from bench import HEADLINE, VERIFICATION_PATHS  # noqa: E402

# Queries directly edited this round -> short action tag.
DIRECT = {
    "fuzzy_name_matches": "spread: deletion-key base (text.py)",
    "fuzzy_name_matches_d2": "spread: deletion-key base (text.py)",
    "entity_resolution_clusters": "spread base + CC seed/SHJ loop",
    "entity_resolution_clusters_d2": "spread base + CC seed/SHJ loop",
    "near_dup_clusters": "spread shingles + CC seed/SHJ loop",
    "leakage_safe_split": "spread shingles + CC seed/SHJ loop",
    "minhash_lsh_near_dups": "spread: shingle arrays (dedup.py)",
    "incremental_minhash_near_dups": "spread: batch shingle arrays",
    "simhash_near_dups": "spread: signature fold input",
    "duplicate_ngram_spans": "spread: token_window_hashes base",
    "cross_doc_duplicate_spans": "spread: token_window_hashes base",
    "strip_duplicate_spans": "spread: token_window_hashes base",
    "incremental_strip_spans": "spread: token_window_hashes base",
    "duplicate_span_texts": "spread: token_window_hashes base",
    "span_coverage_profile": "spread: window-gen base",
    "span_store_compaction": "spread: token_window_hashes base",
    "span_store_tombstones": "spread: token_window_hashes base",
    "streaming_span_store_probe": "spread: store side (stream side no-op)",
    "daily_ingest_cycle": "spread: token_window_hashes base (A/B neutral)",
    "ngram_overlap_decontamination": "spread: gram construction",
    "kafka_wire_roundtrip": "spread: serde round-trip",
    "map_hof_battery": "spread: events battery",
    "table_profile_orders": "spread: countDistinct Expand",
    "udtf_token_windows": "REPARTITION hint: UDTF Python fan-out",
    "sql_surface_recursive_reachability": "edges materialized pre-recursion",
    "pagerank_customer_supplier": "SHJ hint in iteration join",
    "ewma_smoothing": "scale-adaptive partitions (was 32)",
    "user_trend_partition_local": "scale-adaptive partitions (was 32)",
    "training_corpus_clean": "inherits minhash spread",
    "tfidf_top_terms": "spread tried + REVERTED (A/B loss)",
    "char_entropy_quality": "spread tried + REVERTED (A/B loss)",
    "allpairs_jaccard_join": "spread: exploded prefix (verify ran 4-task; 4.40->2.76)",
    "containment_join": "spread: exploded prefix (3.33->2.48)",
    "streaming_url_dedup": "examined: stream-machinery floor (8-part state, tuned r12)",
    "streaming_content_dedup": "examined: stream-machinery floor",
    "streaming_hot_hosts": "examined: stream-machinery floor",
    "streaming_crawl_pipeline": "examined: stream-machinery floor",
    "streaming_host_sessions": "examined: stream-machinery floor",
    "streaming_takedown_decrements": "examined: stream-machinery floor",
    "python_datasource_transactions": "warmup: DataSource-V2 Python process spawn absorbed (5.39->1.16)",
    "jdbc_source_roundtrip": "examined: embedded-Derby write+read floor",
    "xml_source_roundtrip": "examined: write+read round-trip floor",
    "q5_region_revenue": "examined: 1.19 s isolated; baseline 5.74 was the JIT cliff -> warmup fix",
    "q1_pricing_summary": "examined: spread A/B LOST (0.41 plain vs 0.85); left alone",
    "q21_waiting_suppliers": "examined: already algebraically collapsed, exchanges reused",
    "embedding_near_dup_pairs": "spread scan + pinned GEMM width (2.62->1.50)",
    "pq_adc_topk": "spread: subspace explode + codebook folds (1.61->1.36)",
    "cosine_topk_batch": "spread: corpus x query dot folds (0.88->0.72)",
    "approx_distinct_bounds": "pinned distinct-merge width (2.24->1.40)",
    "triangle_count_cosuppliers": "localCheckpoint e + arcs (1.51->1.06)",
    "mmr_diversified_topk": "inherits cosine_topk_batch spread (neutral A/B)",
    "semantic_dedup_keep": "inherits minhash + embedding spreads",
    "minhash_store_append": "spread tried + REVERTED (1.84 vs 2.16 A/B loss)",
}

# Queries examined via the tier profiles and left alone (warm-isolated sec).
EXAMINED = {
    "text_stats_per_lang": 0.54,
    "mad_robust_outliers": 1.12, "zscore_anomalies": 1.20,
    "content_defined_chunks": 1.29, "kmeans_assign_update": 1.00,
    "sql_surface_ordered_set_aggs": 1.87, "analytic_running_totals": 1.06,
    "decimal_arithmetic_battery": 0.95,
    "cep_funnel_sequences": 0.79, "bigram_lm_perplexity": 1.29,
    "hybrid_rrf_search": 1.78, "cross_encoder_rerank": 1.48,
    "winsorized_totalprice": 1.00, "gopher_quality_rules": 0.96,
    "quality_scores": 0.86,
}


def main() -> None:
    base = json.load(open(sys.argv[1]))["queries"]
    final = json.load(open(sys.argv[2]))["queries"]
    rows = []
    for name in HEADLINE:
        b = base.get(name)
        f = final.get(name)
        if name in DIRECT:
            action = DIRECT[name]
        elif name in EXAMINED:
            action = (
                f"examined (profiled {EXAMINED[name]:.2f} s warm-isolated): "
                "no structural defect; bench delta is session/JIT, fixed by warmup"
            )
        else:
            action = "examined via baseline+final bench: within envelope; warmup-only"
        rows.append((name, b, f, action))
    print("| query | r19 baseline s | r19 final s | action |")
    print("|---|---|---|---|")
    for name, b, f, action in rows:
        bs = f"{b:.2f}" if b is not None else "-"
        fs = f"{f:.2f}" if f is not None else "-"
        print(f"| {name} | {bs} | {fs} | {action} |")


if __name__ == "__main__":
    main()
