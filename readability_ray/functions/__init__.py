"""Large-scale training-data operators over the corpus tables.

Beyond the reference's per-document operators, a 100 TB training-data
pipeline needs corpus-level primitives; these are implemented
Ray-Data-first (vectorized map_batches, partial aggregation before
shuffles, broadcast small sides) with DuckDB-matching semantics where a
SQL oracle exists.
"""

from .textstats import (
    bpe_token_stats, corpus_clean, doc_lang_stats, doc_length_percentiles,
    events_sessionize, lang_id, quality_filter, quality_scores,
    tfidf_top_terms, token_frequency_topk, token_pmi_pairs,
    token_postings, token_stats,
    lang_source_chisq,
    top_users_per_type, doc_length_cdf, doc_length_mad,
    doc_length_percentiles_by_group,
    event_prop_stats, event_value_histogram, event_value_zscores,
    events_hourly_cube,
    events_hourly_pivot, events_report,
    events_hourly_rollup, events_hourly_unique_users,
    events_hopping_counts, first_touch_attribution, lang_source_mi,
    negative_event_samples, power_users,
    token_entropy, user_modal_event_type,
    value_time_correlation_by_type,
    flesch_reading_ease, session_table,
    phrase_search, vocab_coverage,
)
from .dedup import (
    content_hashes, dup_rate_by_source, exact_dedup,
    minhash_lsh_pairs, minhash_recall_stats,
    near_dup_keepers, ngram_containment_pairs, ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from .similarity import (
    ann_recall_stats, embedding_dup_pairs, embedding_quantize,
    ivf_ann_topk, ivf_recall_stats, kmeans_assign, knn_topk,
    lsh_ann_topk, semdedup_keepers, embedding_gram,
)
from .bm25 import bm25_topk
from .integrity import fk_integrity, referential_integrity
from .pareto import order_skyline, pareto_skyline
from .fingerprint import fingerprint_overlap_pairs, winnow_fingerprints
from .basket import copurchase_pairs
from .graph import (adamic_adar_pairs, degree_histogram,
                    graph_components, k_core, synthetic_doc_edges,
                    triangle_count)
from .windows import (
    event_burstiness,
    event_interarrival_stats, events_asof_join, events_late_data,
    events_range_join,
    event_type_transitions,
    events_rolling_counts, events_throttle, events_time_range_sums,
    funnel_counts, retention_cohorts, scd2_intervals,
    user_event_paths,
)
from .pdftext import extract_pdf_text, make_pdf, pdf_text
from .corpus import (
    ccnet_buckets, compression_ratios, corpus_divergence, decontaminate,
    gopher_rules,
    hash_split, host_split,
    normalize_text, pii_redact, pii_scan, repetition_scores, source_cap,
    source_mixture_weights, stratified_sample, weighted_sample_k,
)
from .bloom import bloom_novelty, build_bloom
from .chunking import chunk_documents, line_dedup
from .substring import substring_dedup
from .lmscore import lm_quality_scores, train_bigram_lm
from .bpe import bpe_encode_stats, learn_bpe, word_counts
from .dsir import dsir_weights, dsir_weights_hashed
from .nbayes import naive_bayes_classify, train_naive_bayes
from .graph import pagerank
from .editdist import edit_distance_pairs
from .zorder import morton_interleave, zorder_layout, zorder_manifest
from .report import (LINEITEM_DQ_RULES, corpus_report, dq_check,
                     key_skew_stats, table_profile)
from .crawldiff import crawl_diff
from .linkgraph import anchor_text_stats, host_stats, page_outlinks
from .tables import extract_tables, page_tables
from .sketch import (cms_sketch, cms_top_token_counts,
                     hll_distinct_by_group, hll_distinct_tokens)
from .robots import (
    fetch_schedule, parse_crawl_delay, parse_robots,
    parse_robots_rows, parse_robots_sitemaps, robots_allowed,
    robots_filter,
    sitemap_discovery,
)
from .packing import pack_sequences, shard_shuffle
from .ranking import (doc_ntile, gini_coefficient, global_rank,
                      trimmed_mean)
from .urltools import canonical_url, canonicalize_urls
from .relational import (
    brand_quantity_revenue, customer_cumulative_spend,
    rfm_segments, ship_lag_histogram,
    customer_order_distribution, forecast_revenue, inactive_customers,
    large_order_totals,
    order_priority_counts, pricing_summary, priority_line_counts,
    promo_revenue_share, quantity_moments, region_nation_revenue,
    quantity_price_correlation, segment_top_orders,
    nation_market_share, nation_volume_shipping,
    small_quantity_revenue, sole_return_suppliers,
    top_returned_customers, top_supplier_revenue,
    wealthy_inactive_customers, weighted_order_sample,
)
from .headlinks import (extract_feed_links, extract_head_links,
                        feed_autodiscovery, head_links)

__all__ = [
    "corpus_clean", "doc_lang_stats", "events_sessionize", "lang_id",
    "quality_filter",
    "quality_scores", "kmeans_assign",
    "token_frequency_topk", "token_stats",
    "content_hashes", "exact_dedup", "minhash_lsh_pairs",
    "near_dup_keepers", "ngram_jaccard_pairs", "minhash_recall_stats",
    "ngram_containment_pairs",
    "simhash_near_pairs", "simhash_signatures", "embedding_dup_pairs",
    "knn_topk", "lsh_ann_topk", "ivf_ann_topk", "semdedup_keepers",
    "ann_recall_stats", "ivf_recall_stats",
    "extract_pdf_text", "make_pdf", "pdf_text",
    "fingerprint_overlap_pairs", "winnow_fingerprints",
    "events_asof_join", "events_range_join", "events_rolling_counts",
    "bpe_token_stats",
    "decontaminate", "gopher_rules", "hash_split", "normalize_text",
    "pii_redact",
    "pii_scan", "repetition_scores", "source_cap", "host_split",
    "source_mixture_weights",
    "doc_length_percentiles", "token_postings",
    "pricing_summary", "segment_top_orders", "region_nation_revenue",
    "forecast_revenue", "priority_line_counts", "promo_revenue_share",
    "order_priority_counts", "inactive_customers", "large_order_totals",
    "quantity_moments", "user_event_paths", "event_interarrival_stats",
    "funnel_counts", "customer_order_distribution",
    "top_returned_customers", "brand_quantity_revenue",
    "weighted_order_sample",
    "extract_head_links", "head_links",
    "extract_feed_links", "feed_autodiscovery",
    "stratified_sample", "weighted_sample_k",
    "pack_sequences", "shard_shuffle", "tfidf_top_terms",
    "chunk_documents", "line_dedup", "substring_dedup",
    "lm_quality_scores", "train_bigram_lm",
    "bpe_encode_stats", "learn_bpe", "word_counts", "dsir_weights",
    "dsir_weights_hashed",
    "naive_bayes_classify", "train_naive_bayes", "pagerank",
    "corpus_report", "corpus_divergence", "table_profile", "key_skew_stats",
    "edit_distance_pairs", "zorder_layout", "zorder_manifest",
    "morton_interleave", "crawl_diff",
    "parse_robots", "parse_robots_rows", "robots_allowed",
    "robots_filter",
    "parse_robots_sitemaps", "parse_crawl_delay", "fetch_schedule",
    "sitemap_discovery", "top_users_per_type", "events_hourly_rollup",
    "events_hourly_cube", "events_hopping_counts",
    "event_value_histogram", "quantity_price_correlation",
    "doc_length_percentiles_by_group", "user_modal_event_type",
    "events_hourly_unique_users", "event_prop_stats",
    "token_pmi_pairs", "events_hourly_pivot", "doc_length_mad",
    "events_report", "wealthy_inactive_customers",
    "events_throttle", "events_time_range_sums",
    "event_value_zscores", "doc_length_cdf",
    "top_supplier_revenue", "small_quantity_revenue",
    "sole_return_suppliers",
    "graph_components", "synthetic_doc_edges", "triangle_count",
    "nation_volume_shipping", "nation_market_share",
    "bm25_topk", "lang_source_chisq",
    "event_type_transitions", "retention_cohorts",
    "degree_histogram",
    "value_time_correlation_by_type",
    "anchor_text_stats", "host_stats", "ccnet_buckets",
    "compression_ratios",
    "page_outlinks", "extract_tables", "page_tables",
    "cms_sketch", "cms_top_token_counts", "hll_distinct_tokens",
    "hll_distinct_by_group", "global_rank", "doc_ntile",
    "bloom_novelty", "build_bloom", "embedding_quantize",
    "canonical_url", "canonicalize_urls",
    "order_skyline", "pareto_skyline", "flesch_reading_ease",
    "fk_integrity", "referential_integrity", "session_table",
    "embedding_gram", "gini_coefficient",
    "scd2_intervals", "events_late_data", "vocab_coverage",
    "phrase_search", "k_core", "trimmed_mean", "adamic_adar_pairs",
    "copurchase_pairs",
    "negative_event_samples", "dup_rate_by_source", "dq_check",
    "LINEITEM_DQ_RULES", "power_users", "token_entropy",
    "lang_source_mi", "first_touch_attribution",
    "customer_cumulative_spend", "event_burstiness",
    "ship_lag_histogram", "rfm_segments",
]
