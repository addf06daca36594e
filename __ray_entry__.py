"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline (north rule) over
the deterministic synthetic transcript corpus at sf=0.001 (the corpus is
the BASELINE.json input_hint shape, synthesized under /tmp — no external
data). ``queries()``/``oracle_sql()`` cover the SURVEY.md §2 operator
inventory plus the training-data ops (dedup / similarity / text analysis);
relational queries are DuckDB-checked against the pre-registered testdata
views, KG queries against analytically-derived gold parquet tables.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in easyner_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:  # driver may import this module from anywhere
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship: transcripts -> sentences -> NER -> triples -> edges."""
    import os

    from easyner_ray.pipelines.kg import build_kg, read_transcripts
    from easyner_ray.sources.synthetic import ensure_for_sf_dir

    corpus = ensure_for_sf_dir("/root/testdata/sf0.001")
    transcripts = read_transcripts(os.path.join(corpus, "transcripts.parquet"))
    return build_kg(transcripts)["edges"]


def queries() -> dict[str, Callable[[str], Any]]:
    from easyner_ray.pipelines import queries as q

    return {
        # relational / generic operators (SURVEY.md §2.2, §2.4-2.6)
        "agg_lineitem_pricing": q.agg_lineitem_pricing,
        "join_orders_customer_nation": q.join_orders_customer_nation,
        "top_parts_by_revenue": q.top_parts_by_revenue,
        "orders_priority_count": q.orders_priority_count,
        "semi_join_large_parts": q.semi_join_large_parts,
        "events_stats": q.events_stats,
        "events_top_users": q.events_top_users,
        "nations_sorted": q.nations_sorted,
        "revenue_by_priority": q.revenue_by_priority,    # big-big hash join
        # training-data ops: dedup / text analysis / similarity
        "dedup_exact_docs": q.dedup_exact_docs,
        "dedup_exact_incremental": q.dedup_exact_incremental,  # vs digest snapshot
        "doc_stats": q.doc_stats_q,
        "docs_repetition": q.docs_repetition,        # Gopher repetition signals
        "docs_cross_dup_ngrams": q.docs_cross_dup_ngrams,  # cross-doc dup n-gram share
        "docs_mixture_sample": q.docs_mixture_sample,  # per-source Bernoulli mix
        "docs_epoch_mix": q.docs_epoch_mix,          # fractional-epoch mixing
        "docs_split_assign": q.docs_split_assign,    # train/val/test holdout
        "docs_rebalance_sources": q.docs_rebalance_sources,  # target mixture
        "docs_oov": q.docs_oov,                      # vocab-coverage counts
        "docs_dedup_keep_best": q.docs_dedup_keep_best,  # argmax-quality dedup
        "docs_export_shards": q.docs_export_shards,  # deterministic shuffle+shard
        "docs_ppl_buckets": q.docs_ppl_buckets,      # CCNet head/middle/tail
        "docs_token_budget": q.docs_token_budget,    # per-source token budget
        "docs_snapshot_diff": q.docs_snapshot_diff,  # corpus version audit
        "docs_source_report": q.docs_source_report,  # mixture report card
        "docs_cap_per_source": q.docs_cap_per_source,  # crawl balancing cap
        "docs_bigram_logprob": q.docs_bigram_logprob,  # bigram LM quality
        "docs_bpe_merges": q.docs_bpe_merges,        # tokenizer training (gold)
        "docs_bpe_tokenize": q.docs_bpe_tokenize,    # train->apply loop (gold)
        "docs_near_dup_keep_best": q.docs_near_dup_keep_best,  # cluster argmax
        "docs_gopher_signals": q.docs_gopher_signals,  # Gopher A1 rule signals
        "docs_dup_line_removal": q.docs_dup_line_removal,  # boilerplate lines
        "embeddings_semdedup": q.embeddings_semdedup,  # SemDeDup (derived gold)
        "embeddings_outlier_filter": q.embeddings_outlier_filter,  # radius cut
        "docs_pii_redact": q.docs_pii_redact,       # typed PII placeholders
        "docs_normalize": q.docs_normalize,         # NFC+ws canonicalization
        "docs_truncate": q.docs_truncate,           # context-window cut
        "docs_dsir": q.docs_dsir,                   # DSIR importance weights
        "embedding_decontam": q.embedding_decontam_q,  # semantic eval leak
        "lineitem_profile": q.lineitem_profile,     # column profiler
        "events_zscore": q.events_zscore,           # grouped standardization
        "docs_c4_signals": q.docs_c4_signals,       # C4 line heuristics
        "docs_source_kl": q.docs_source_kl,         # mixture diagnostics
        "events_winsorize": q.events_winsorize,     # p05/p95 clipping
        "docs_concat_blocks": q.docs_concat_blocks,  # GPT block layout
        "docs_curated_v2": q.docs_curated_v2,       # round-5 chain end-to-end
        "quality_scores": q.quality_scores_q,
        "lang_id": q.lang_id_q,                      # heuristic: rows-only
        "rolling_fingerprints": q.rolling_fp_q,      # derived-gold oracle
        "ngram_jaccard_pairs": q.ngram_jaccard_q,
        "minhash_lsh_pairs": q.minhash_lsh_q,        # derived-gold oracle
        "minhash_incremental": q.minhash_incremental_q,  # vs persisted band index
        "docs_dup_span_removal": q.docs_dup_span_removal,  # substring-level dedup
        "simhash_pairs": q.simhash_q,                # derived-gold oracle
        "knn_brute": q.knn_brute_q,
        "knn_ivf": q.knn_ivf_q,                      # approximate: rows-only
        "knn_self": q.knn_self_q,                    # ANN self-join, derived gold
        "cosine_pairs_brute": q.cosine_pairs_q,
        "cosine_lsh_pairs": q.cosine_lsh_q,          # derived-gold oracle
        # KG construction (north rule; gold-parquet oracles)
        "kg_sentences": q.kg_sentences,
        "kg_turn_reassembly": q.kg_turn_reassembly,
        "kg_mentions": q.kg_mentions,
        "kg_triples": q.kg_triples,
        "kg_window_triples": q.kg_window_triples,
        "kg_nodes": q.kg_nodes,
        "kg_fuzzy_alias_pairs": q.kg_fuzzy_alias_pairs,  # FastSS edit<=1 self-join
        "kg_fuzzy_alias_clusters": q.kg_fuzzy_alias_clusters,  # min-name closure
        "kg_fuzzy_nel": q.kg_fuzzy_nel,                  # typo-tolerant linking
        "events_user_pivot": q.events_user_pivot,        # conditional wide pivot
        "lineitem_melt": q.lineitem_melt,                # unpivot wide-to-long
        "docs_epoch_shuffle": q.docs_epoch_shuffle,      # seeded global shuffle
        "conv_entity_sequence": q.conv_entity_sequence,  # ordered string_agg
        "docs_split_no_leakage": q.docs_split_no_leakage,  # dup-aware split
        "events_autocorr": q.events_autocorr,            # lag-k ACF per type
        "docs_nb_source_pred": q.docs_nb_source_pred,    # Naive Bayes census
        "embedding_hard_negatives": q.embedding_hard_negatives,  # contrastive
        "embedding_kcenter": q.embedding_kcenter,        # greedy coreset
        "kg_edges": q.kg_edges,
        "kg_edges_incremental": q.kg_edges_incremental,  # fold-in == rebuild
        "kg_entity_freq": q.kg_entity_freq,
        "kg_entity_freq_per_conv": q.kg_entity_freq_per_conv,
        "kg_top_entities": q.kg_top_entities,
        "kg_linked_mentions": q.kg_linked_mentions,
        "kg_search": q.kg_search,
        "kg_doc_spans": q.kg_doc_spans,
        "kg_triple_prf": q.kg_triple_prf,            # P/R gate artifact: gold-side oracle
        "kg_merged_mentions": q.kg_merged_mentions,  # J2/J3 merge == gold oracle
        "kg_resolved_mentions": q.kg_resolved_mentions,  # O6: derived-gold oracle
        "kg_disambiguated": q.kg_disambiguated,      # scored NEL: derived-gold oracle
        "events_hourly": q.events_hourly,
        "events_sessions": q.events_sessions,
        "events_hopping": q.events_hopping,          # sliding windows
        "events_attribution": q.events_attribution,  # as-of join
        "approx_distinct_users": q.approx_distinct_q,  # HLL sketch: derived-gold oracle

        "kg_entity_freq_batches": q.kg_entity_freq_batches,  # A1 batch dim
        "kg_pubtator_roundtrip": q.kg_pubtator_roundtrip,    # artifact round trip
        "near_dup_groups": q.near_dup_groups,                # CC dup clusters
        # round-3 additions: window/rank, sampling, joins, sketches, text
        "events_top_value_per_type": q.events_top_value_per_type,  # top-k per group
        "orders_hash_sample": q.orders_hash_sample,          # deterministic sample
        "customers_without_orders": q.customers_without_orders,  # anti join
        "events_in_promo_windows": q.events_in_promo_windows,    # interval join
        "events_value_quantiles": q.events_value_quantiles,  # exact distributed quantiles
        "events_value_quantiles_cont": q.events_value_quantiles_cont,  # percentile_cont
        "events_quantiles_by_type_cont": q.events_quantiles_by_type_cont,  # per-class cont
        "docs_vocab_top": q.docs_vocab_top,          # vocabulary builder
        "docs_tfidf": q.docs_tfidf,                          # TF-IDF scoring
        "cms_user_counts": q.cms_user_counts,  # count-min sketch: derived-gold oracle
        "events_quantiles_by_type": q.events_quantiles_by_type,  # grouped exact quantiles
        "orders_bloom_semi": q.orders_bloom_semi,  # bloom-prefiltered semi join
        "embedding_label_centroids": q.embedding_label_centroids,  # grouped vector mean
        "events_props_extract": q.events_props_extract,  # field extract + redaction
        "latest_event_per_user": q.latest_event_per_user,  # LWW by recency (top-1)
        "top_users_by_value_per_type": q.top_users_by_value_per_type,  # agg -> rank composition
        "events_running_totals": q.events_running_totals,  # window fns: rn/lag/lead/cumsum
        "users_retention_cohorts": q.users_retention_cohorts,  # cohort matrix
        "embedding_dup_groups": q.embedding_dup_groups,  # cosine near-dup clusters
        "events_value_ranks": q.events_value_ranks,  # rank/dense_rank/ntile, tie-aware
        "events_stratified_sample": q.events_stratified_sample,  # N-per-group hash sample
        "docs_quality_filtered": q.docs_quality_filtered,  # data-derived percentile gate
        "events_user_type_pivot": q.events_user_type_pivot,  # long->wide pivot
        "docs_bm25": q.docs_bm25,  # BM25 keyword search scoring
        "kg_pagerank": q.kg_pagerank,  # iterative graph algorithm (power iteration)
        "kg_random_walks": q.kg_random_walks,  # node2vec-style walk corpus
        "kg_walk_skipgrams": q.kg_walk_skipgrams,  # word2vec-ready pairs
        "docs_chunks": q.docs_chunks,  # context-window chunking
        "docs_curated": q.docs_curated,  # full curation chain, end-to-end oracle
        # round-4 additions
        "media_features": q.media_features,  # real WAV/PPM decode on actor pool
        "embeddings_kmeans": q.embeddings_kmeans,  # iterative k-means assignments
        "kg_edges_npmi": q.kg_edges_npmi,  # NPMI association edge weights
        "docs_decontam": q.docs_decontam,  # train/eval n-gram contamination audit
        "user_order_event_profile": q.user_order_event_profile,  # full outer join audit
        "events_rollup": q.events_rollup,  # GROUP BY ROLLUP cascade
        "events_cube": q.events_cube,  # GROUP BY CUBE grouping sets
        "users_funnel": q.users_funnel,  # funnel stage by first-occurrence order
        "docs_unigram_logprob": q.docs_unigram_logprob,  # LM quality score (perplexity-style)
        "events_value_histogram": q.events_value_histogram,  # fixed-width histogram
        "events_value_pctiles": q.events_value_pctiles,  # percent_rank / cume_dist
        "top_parts_heavy_hitters": q.top_parts_heavy_hitters,  # Misra-Gries + exact verify
        "orders_weighted_sample": q.orders_weighted_sample,  # deterministic weighted sampling
        "docs_packed": q.docs_packed,  # sequence packing by token budget
        "docs_packed_sharded": q.docs_packed_sharded,  # shard-local packs
        # round-5 conversation-granularity transcript ops (ops/conversations.py)
        "conv_stats": q.conv_stats_q,            # per-conv profile
        "conv_role_patterns": q.conv_role_patterns,  # shape census / structural dedup
        "conv_tool_report": q.conv_tool_report,  # per-tool usage report
        "conv_reply_pairs": q.conv_reply_pairs,  # SFT prompt->response extraction
        "conv_last_turns": q.conv_last_turns,    # context-tail windowing
        "conv_turn_gaps": q.conv_turn_gaps,      # turn-latency profile
        "conv_schema_valid": q.conv_schema_valid,  # role-schema gate
        "conv_refusal_scan": q.conv_refusal_scan,  # refusal/boilerplate gate
        "conv_fingerprints": q.conv_fingerprints,  # conversation-level dedup key
        "conv_sft_pairs": q.conv_sft_pairs,      # SFT prep chain end-to-end
        "conv_context_windows": q.conv_context_windows,  # multi-turn context assembly
        "kg_pattern_triples": q.kg_pattern_triples,  # surface-pattern relation extraction
        "kg_typed_edges": q.kg_typed_edges,  # predicate-labeled edge aggregation
        # graph analytics over the materialized KG (ops/graph_analytics.py)
        "kg_degree_stats": q.kg_degree_stats,
        "kg_two_hop": q.kg_two_hop,
        "kg_triangles": q.kg_triangles,
        "kg_components": q.kg_components,
        "kg_temporal_edges": q.kg_temporal_edges,
        "kg_edges_decayed": q.kg_edges_decayed,  # recency half-life weights
        "kg_clustering": q.kg_clustering,
        "kg_alias_candidates": q.kg_alias_candidates,
        "kg_link_predict": q.kg_link_predict,  # Adamic-Adar KG completion
        "kg_eigencentrality": q.kg_eigencentrality,  # weighted power iteration
        "kg_ppr": q.kg_ppr,  # personalized pagerank from watchlist seeds
        "kg_bfs_hops": q.kg_bfs_hops,
        "kg_weighted_hops": q.kg_weighted_hops,  # bounded Bellman-Ford distances
        "kg_edge_activity": q.kg_edge_activity,
        "kg_edge_evidence": q.kg_edge_evidence,
        "kg_kcore": q.kg_kcore,            # derived-gold oracle (peel)
        "kg_canonical_map": q.kg_canonical_map,
        "kg_edges_canonical": q.kg_edges_canonical,
        "kg_entity_trends": q.kg_entity_trends,
        "kg_edges_diff": q.kg_edges_diff,
        "kg_export_ntriples": q.kg_export_ntriples,  # RDF interchange stream
        "kg_harmonic": q.kg_harmonic,  # per-seed 3-hop harmonic centrality
        "conv_templates": q.conv_templates,  # cross-conv boilerplate census
        "kg_component_stats": q.kg_component_stats,  # per-component audit
        "kg_communities": q.kg_communities,  # deterministic weighted LPA
        "kg_meta_paths": q.kg_meta_paths,  # typed predicate-chain census
        "kg_node_attributes": q.kg_node_attributes,  # enriched node table
        "kg_betweenness": q.kg_betweenness,  # exact Brandes (gold oracle)
        "kg_negative_samples": q.kg_negative_samples,  # KG training negs
        "conv_dialog_acts": q.conv_dialog_acts,  # SFT-mix act profile
        "kg_eccentricity": q.kg_eccentricity,  # radius/diameter profile
        "kg_type_pairs": q.kg_type_pairs,  # class-level schema census
        "conv_topics": q.conv_topics,  # conversation -> dominant entity
        "kg_growth": q.kg_growth,  # first-seen edges per day (build audit)
        "kg_integrity": q.kg_integrity,  # artifact-level referential gate
        "kg_mention_yield": q.kg_mention_yield,  # per-role NER yield
        "kg_assortativity": q.kg_assortativity,  # degree-mixing scalar
        "events_mad_outliers": q.events_mad_outliers,  # robust MAD gate
        "conv_parrot_score": q.conv_parrot_score,  # reply-echo SFT signal
        "kg_transition_edges": q.kg_transition_edges,  # directed turn flow
        "kg_hits": q.kg_hits,  # hubs/authorities on the directed graph
        "media_dedup": q.media_dedup_q,  # binary-payload exact dedup
        "kg_modularity": q.kg_modularity,  # partition-quality scalar
        "kg_entity_recurrence": q.kg_entity_recurrence,  # resurfacing texture
        "conv_c4_line_filter": q.conv_c4_line_filter,  # C4 cleaning rewrite
        "conv_dedup": q.conv_dedup,  # whole-dialog exact dedup
        "kg_entity_roles": q.kg_entity_roles,  # who introduces each topic
        "conv_dup_line_keep_first": q.conv_dup_line_keep_first,  # CCNet keep-first
        "embeddings_rp_reduce": q.embeddings_rp_reduce,  # JL projection
        "docs_containment_pairs": q.docs_containment_pairs,  # subset copies
        "docs_vocab_growth": q.docs_vocab_growth,  # Heaps-law curve
        "docs_zipf_slope": q.docs_zipf_slope,      # rank-frequency fit
        "docs_ngram_novelty": q.docs_ngram_novelty,  # first-occurrence census
        "kg_closeness": q.kg_closeness,        # reach/sum-dist moments
        "kg_reciprocity": q.kg_reciprocity,    # mutual-flow census
        "conv_tool_transitions": q.conv_tool_transitions,  # tool-chain mining
        "docs_keywords": q.docs_keywords,      # top-3 TF-IDF terms per doc
        "docs_lexical_diversity": q.docs_lexical_diversity,  # TTR + entropy
        "conv_compression": q.conv_compression,  # zlib quality gate
        "conv_minhash_pairs": q.conv_minhash_pairs,  # dialog near-dup
        "events_daily_growth": q.events_daily_growth,  # day-over-day counts
        "docs_dup_pairs_by_source": q.docs_dup_pairs_by_source,  # dup census
        "docs_top_ngrams": q.docs_top_ngrams,  # WIMBD top-trigram census
        "events_ewma": q.events_ewma,  # per-user EWMA drift summary
        "kg_bridges": q.kg_bridges,  # cut-edge fragility census
        "docs_readability": q.docs_readability,  # Flesch components
        "docs_lang_mismatch": q.docs_lang_mismatch,  # lang label audit
        "docs_length_integrity": q.docs_length_integrity,  # n_chars gate
        "kg_shortest_paths": q.kg_shortest_paths,  # evidence chains
        "docs_dedup_retention": q.docs_dedup_retention,  # dedup impact
        "events_type_transitions": q.events_type_transitions,  # bigrams
        "events_interarrival": q.events_interarrival,  # gap profile
        "events_user_type_entropy": q.events_user_type_entropy,  # diversity
        "docs_quality_percentile": q.docs_quality_percentile,  # per-src pct
        "knn_ivf_incremental": q.knn_ivf_incremental,  # index append
        "docs_corpus_card": q.docs_corpus_card,  # one-row datasheet
        "docs_token_histogram": q.docs_token_histogram,  # length bins
        "events_burst": q.events_burst,  # sliding-window rate tripwire
        "conv_window_dedup": q.conv_window_dedup,  # SFT example dedup
        "tpch_q3_revenue": q.tpch_q3_revenue,  # 3-table selective join
        "tpch_q5_region_revenue": q.tpch_q5_region_revenue,  # 6-table join
        "tpch_q10_returned_items": q.tpch_q10_returned_items,  # returned-rev top-20
        "embeddings_pca": q.embeddings_pca,  # exact top-4 PCA (integer moments)
        "lineitem_pruned_profile": q.lineitem_pruned_profile,  # read prune
        "events_heatmap": q.events_heatmap,  # dow x hour load shape
        "kg_entity_lifespan": q.kg_entity_lifespan,  # first/last seen
        "docs_cluster_keywords": q.docs_cluster_keywords,  # cluster labels
        "docs_jsonl_roundtrip": q.docs_jsonl_roundtrip,  # JSON source path
        "tpch_q6_forecast_revenue": q.tpch_q6_forecast_revenue,  # scan+agg
        "tpch_q4_late_orders": q.tpch_q4_late_orders,  # EXISTS semi
        "tpch_q13_custdist": q.tpch_q13_custdist,  # outer-join histogram
        "tpch_q14_promo_revenue": q.tpch_q14_promo_revenue,  # cond-agg ratio
        "tpch_q18_large_orders": q.tpch_q18_large_orders,  # HAVING semi
        "tpch_q22_dormant_accounts": q.tpch_q22_dormant_accounts,  # anti join
        "tpch_q7_nation_volume": q.tpch_q7_nation_volume,  # 2-nation flows
        "tpch_q15_top_supplier": q.tpch_q15_top_supplier,  # max-subquery view
        "tpch_q17_small_quantity": q.tpch_q17_small_quantity,  # correlated avg
        "tpch_q19_disjunctive_revenue": q.tpch_q19_disjunctive_revenue,  # OR-pred
        "events_markov_stationary": q.events_markov_stationary,  # behavior chain
        "events_theil_sen": q.events_theil_sen,          # robust trend slope
        "events_trimmed_mean": q.events_trimmed_mean,    # p10-p90 band mean
        "docs_curriculum": q.docs_curriculum,            # global row_number
        "embedding_triplets": q.embedding_triplets,      # batch-hard triplets
        "events_ks_drift": q.events_ks_drift,            # KS drift vs corpus
        "events_type_hour_mi": q.events_type_hour_mi,    # chi2 + MI audit
        "kg_degree_powerlaw": q.kg_degree_powerlaw,      # scale-free MLE
        "kg_rich_club": q.kg_rich_club,                  # hub-density ratio
        "kg_community_conductance": q.kg_community_conductance,  # cut quality
        "docs_source_vocab_overlap": q.docs_source_vocab_overlap,  # crawl overlap
        "tpch_q2_min_acctbal_supplier": q.tpch_q2_min_acctbal_supplier,  # correlated min
        "tpch_q8_market_share": q.tpch_q8_market_share,  # share-of-total ratio
        "tpch_q9_nation_profit": q.tpch_q9_nation_profit,  # 5-table profit rollup
        "tpch_q11_important_parts": q.tpch_q11_important_parts,  # global-sum HAVING
        "tpch_q12_late_lines": q.tpch_q12_late_lines,    # conditional-count pivot
        "tpch_q16_supplier_census": q.tpch_q16_supplier_census,  # count-distinct census
        "tpch_q20_dominant_suppliers": q.tpch_q20_dominant_suppliers,  # nested share gate
        "tpch_q21_waiting_suppliers": q.tpch_q21_waiting_suppliers,  # multi-exists
        "events_zorder_layout": q.events_zorder_layout,  # Morton cluster key
        "events_zorder_skip": q.events_zorder_skip,      # prune-win audit
        "events_range_partition": q.events_range_partition,  # octile parts
        "events_pruned_window": q.events_pruned_window,  # stat-pruned read
        "conv_loss_masks": q.conv_loss_masks,  # SFT token spans + train mask
        "conv_packed_sft": q.conv_packed_sft,  # whole-conv budget packing
        "kg_edge_neighborhood": q.kg_edge_neighborhood,  # pruned graph serve
        "conv_tool_errors": q.conv_tool_errors,  # per-tool failure census
        "events_rolling_mean": q.events_rolling_mean,  # ROWS-frame moving avg
        "events_rolling_extrema": q.events_rolling_extrema,  # frame min/max
        "events_value_vs_first": q.events_value_vs_first,  # baseline drift
        "events_mode_bucket": q.events_mode_bucket,  # deterministic mode
        "events_first_last_span": q.events_first_last_span,  # full-frame pair
        "conv_key_turns": q.conv_key_turns,  # extractive key-turn argmax
        "events_rolling_zscore": q.events_rolling_zscore,  # frame anomaly
        "events_value_deciles": q.events_value_deciles,  # ntile bucketing
        "events_user_value_share": q.events_user_value_share,  # share of total
        "events_near_pairs": q.events_near_pairs,  # temporal self-range-join
        "part_discount_slope": q.part_discount_slope,  # grouped OLS regr
        "part_discount_corr": q.part_discount_corr,  # grouped Pearson corr
        "events_value_moments": q.events_value_moments,  # skew/kurtosis
        "part_weighted_median_price": q.part_weighted_median_price,  # w-median
        "conv_reply_latency": q.conv_reply_latency,  # role-pair timing census
        "conv_context_overflow": q.conv_context_overflow,  # budget truncation
        "orders_monthly_revenue_ma": q.orders_monthly_revenue_ma,  # series MA
        "conv_tool_latency": q.conv_tool_latency,  # per-tool turnaround
    }


def oracle_sql() -> dict[str, str]:
    from easyner_ray.pipelines.oracles import all_oracles
    from easyner_ray.sources.synthetic import ensure_corpus

    # KG oracles read gold parquet under /tmp/easyner_synth/sf0.01 —
    # materialize it (idempotent, ~1 s) so the SQL always has its inputs.
    try:
        corpus = ensure_corpus("sf0.01", 0.01, with_gold=True, use_ray=False)
        from easyner_ray.sources.gold_derived import ensure_derived_gold

        ensure_derived_gold(corpus, "/root/testdata/sf0.01/documents.parquet",
                            "/root/testdata/sf0.01/embeddings.parquet",
                            "/root/testdata/sf0.01/events.parquet")
    except Exception:
        pass  # queries() generates it too; worst case the KG oracles error
    return all_oracles()
