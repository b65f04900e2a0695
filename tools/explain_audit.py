"""Capture formatted physical plans for the headline queries into PLANS.md
— the audit trail for the plan-quality claims (filter pushdown reaches the
parquet scan, dimension joins broadcast, aggregations keep partial/final
split, whole-stage codegen spans the relational operators).

Usage: python tools/explain_audit.py [sf_dir] [query ...]

With query names the audit replans ONLY those queries (console verdicts;
PLANS.md untouched).  With no names it sweeps the whole AUDITED list and
rewrites PLANS.md.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

AUDITED = [
    "q01_pricing_summary",
    "q05_semi_join",
    "q07_dim_join",
    "q11_decorrelated_subquery",
    "q16_dedup_exact",
    "q21_cosine_topk",
    "q26_embedding_dups",
    "q27_ngram_jaccard",
    "q30_minhash_lsh_dups",
    "q31_simhash_dups",
    "q36_ocr_join",
    "q42_dup_families",
    "q43_family_representatives",
    "q45_host_cap",
    "q46_deterministic_sample",
    "q48_vocab_builder",
    "q49_robots_gate",
    "q50_sessionize",
    "q56_range_join",
    "q57_asof_join",
    "q59_salted_agg",
    "q61_crawl_frontier",
    "q62_capture_dedup",
    "q63_domain_quality_prior",
    "q64_stratified_sample",
    "q65_crawl_delta",
    "q66_anchor_text",
    "q70_phash_near_dups",
    "q71_paragraph_dedup",
    "q72_gopher_quality",
    "q73_unigram_surprise",
    "q74_sitemap_ingest",
    "q75_script_profile",
    "q76_redirect_resolution",
    "q77_decontamination",
    "q78_robots_longest_match",
    "q79_search_facets",
    "q80_bigram_coverage",
    "q81_inverted_index",
    "q82_phrase_search",
    "q83_link_reciprocity",
    "q84_html_tables",
    "q85_c4_line_filter",
    "q86_shingle_containment",
    "q87_heading_outline",
    "q88_bm25_retrieval",
    "q89_template_removal",
    "q90_kwic_snippets",
    "q91_canonical_dedup",
    "q92_postings_compression",
    "q93_duplicate_spans",
    "q94_block_scoring",
    "q95_pdf_reading_order",
    "q96_pipeline_text",
    "q97_head_metadata",
    "q98_dsir_weights",
    "q99_encoding_ladder",
    "q100_jsonld_metadata",
    "q101_mojibake_repair",
    "q102_email_threads",
    "q103_multipage_stitch",
    "q104_pdf_headings",
    "q105_sentence_chunks",
    "q106_hreflang_clusters",
    "q107_feed_items",
    "q108_soft404_triage",
    "q109_domain_rollup",
    "q110_search_fold",
    "q111_iban_detection",
    "q112_idn_hosts",
    "q113_percent_normalize",
    "q114_outlink_absolutize",
    "q115_crawl_directives",
    "q116_entity_decode",
    "q117_readability",
    "q118_html_markdown",
    "q119_bigram_lm",
    "q120_winnowing",
    "q121_collocations",
    "q122_recrawl_schedule",
    "q123_cocitation",
    "q125_bitext_pairs",
    "q126_publication_date",
    "q127_sequence_packing",
    "q128_host_cardinality_sketch",
    "q129_quality_mixing",
    "q130_token_budget_selection",
    "q131_leakage_safe_splits",
    "q132_dup_family_weights",
    "q133_image_alt_pairs",
    "q134_quality_classifier",
    "q137_host_quality_outliers",
    "q138_host_triangles",
    "q139_countmin_heavy_hitters",
    "q140_zipf_fit",
    "q141_epoch_shuffle",
    "q142_vocab_coverage",
    "q143_card_detection",
    "q145_url_history",
    "q147_crawl_traps",
    "q148_rendezvous_sharding",
    "q149_cdc_chunks",
    "q150_mergeable_minhash",
    "q151_texttiling",
    "q152_blocklist_filter",
    "q153_source_kl_drift",
    "q154_alpha_sampling",
    "q155_glove_cooccurrence",
    "q156_bloom_filter",
    "q157_fuzzy_linkage",
    "q158_lexical_diversity",
    "q159_microdata",
    "q161_merkle_manifest",
    "q162_jl_projection",
    "q163_bpe_fertility",
    "q164_rrf_fusion",
    "q165_hard_negatives",
    "q166_decayed_reputation",
    "q167_event_funnel",
    "q168_retention_cohorts",
    "q169_event_transitions",
    "q170_histogram_quantiles",
    "q171_front_coding",
    "q172_host_gini",
    "q173_error_spikes",
    "q174_compaction_bins",
    "q175_fetch_schedule",
    "q176_rollup_sets",
    "q177_pivot",
    "q178_rank_family",
    "q179_negative_sampling",
    "q180_retrieval_metrics",
    "q181_classifier_eval",
    "q182_json_props",
    "q183_lateness_audit",
    "q184_incremental_view",
    "q185_cube_sets",
    "q186_unpivot",
    "q187_window_frames",
    "q188_semdedup",
    "q189_surt_keys",
    "q190_ccnet_buckets",
    "q191_kcore",
    "q192_wilson_hosts",
    "q193_bowtie",
    "q194_char_entropy",
    "q195_bucketed_join",
    "q196_zorder_layout",
    "q197_salted_skew_join",
    "q198_mirror_hosts",
    "q199_dup_ngram_spectrum",
    "q200_weighted_sample",
    "q201_partition_pruning",
    "q202_kmv_setops",
    "q203_pareto_skyline",
    "q204_bloom_join",
    "q205_variant_props",
    "q206_dedup_agreement",
    "q207_sq8_ann",
    "q208_token_burstiness",
    "q209_code_switching",
    "q210_heaps_law",
    "q211_bfs_hops",
    "q212_ngram_precision_eval",
    "q213_deterministic_walks",
    "q214_hybrid_skew_join",
    "q215_pii_pseudonymize",
    "q216_dedup_yield_curve",
    "q217_quote_attribution",
    "q218_filtered_ann",
    "q219_mixed_script_spoof",
    "q220_grouping_sets",
    "q221_link_nepotism",
    "q222_shard_skew_planner",
    "q223_hits",
    "q224_wet_export",
    "q225_recursive_thread_paths",
    "q226_fineweb_filters",
    "q227_k_anonymity",
    "q228_license_signals",
    "q229_yield_funnel",
    "q230_modularity",
    "q231_robots_sitemaps",
    "q232_pipe_syntax",
    "q233_linkrot_lifetable",
    "q234_mime_mismatch_audit",
    "q235_encoding_ladder_audit",
    "q236_zstd_roundtrip",
    "q237_progressive_jpeg_roundtrip",
    "q238_pgp_roundtrip",
    "q239_encrypted_archive_roundtrip",
    "q240_lz4_roundtrip",
    "q241_encrypted_pdf_extraction",
    "q242_encrypted_office_extraction",
    "q243_encrypted_xls_extraction",
    "q244_encrypted_doc_extraction",
    "q245_encrypted_ppt_extraction",
    "q246_filesystem_walk",
    "q247_webp_roundtrip",
    "q248_wat_export",
    "q249_flac_roundtrip",
    "q250_mp3_stats",
    "q251_tnef_extraction",
    "q252_legacy_encodings",
    "q253_vba_macros",
    "q254_onenote_embedded",
    "q255_dbf_tables",
    "q256_wk1_tables",
    "q257_visio_text",
    "q258_sqlite_tables",
    "q259_snappy_roundtrip",
    "q260_chm_extraction",
    "q261_cab_extraction",
    "q262_pe_metadata",
    "q263_audio_typing",
    "q264_rar_roundtrip",
    "q265_onenote_text",
]

# "!X" = X must be ABSENT from the plan
CHECKS = {
    "q01_pricing_summary": ["PushedFilters", "HashAggregate"],
    "q05_semi_join": ["LeftSemi"],
    "q07_dim_join": ["BroadcastHashJoin"],
    "q11_decorrelated_subquery": ["HashAggregate"],
    "q16_dedup_exact": ["HashAggregate"],
    "q21_cosine_topk": ["BroadcastNestedLoopJoin", "Window"],
    "q26_embedding_dups": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "q27_ngram_jaccard": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "q30_minhash_lsh_dups": ["!CartesianProduct"],
    # r6: the degenerate-bucket cap is a COUNT window on the block
    # key (was a broadcast LeftSemi — see operators/dedup.py)
    "q31_simhash_dups": ["Window", "!CartesianProduct"],
    "q36_ocr_join": ["BroadcastHashJoin"],
    "q42_dup_families": ["!CartesianProduct", "!Window"],
    "q43_family_representatives": ["HashAggregate", "!Window", "!CartesianProduct"],
    "q45_host_cap": ["LeftSemi", "!CartesianProduct"],
    "q46_deterministic_sample": ["PushedFilters"],
    "q48_vocab_builder": ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
    "q49_robots_gate": ["Project", "!CartesianProduct"],
    "q50_sessionize": ["Window", "HashAggregate", "!CartesianProduct"],
    "q56_range_join": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "q57_asof_join": ["Window", "!SortMergeJoin", "!BroadcastHashJoin",
                      "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "q59_salted_agg": ["HashAggregate", "!Window", "!CartesianProduct"],
    "q61_crawl_frontier": ["Window", "!CartesianProduct"],
    "q62_capture_dedup": ["HashAggregate", "!Window", "!CartesianProduct"],
    "q63_domain_quality_prior": ["BroadcastHashJoin", "!CartesianProduct"],
    "q64_stratified_sample": ["!Window", "!CartesianProduct",
                              "!HashAggregate"],
    "q65_crawl_delta": ["SortMergeJoin", "!CartesianProduct"],
    "q66_anchor_text": ["HashAggregate", "!Window", "!CartesianProduct"],
    "q70_phash_near_dups": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "q71_paragraph_dedup": ["HashAggregate", "!Window", "!CartesianProduct"],
    "q72_gopher_quality": ["Project", "!HashAggregate", "!CartesianProduct"],
    "q73_unigram_surprise": ["BroadcastHashJoin", "!CartesianProduct"],
    "q74_sitemap_ingest": ["HashAggregate", "!Window", "!CartesianProduct"],
    "q75_script_profile": ["Project", "!HashAggregate", "!CartesianProduct",
                           "!BroadcastHashJoin"],
    "q76_redirect_resolution": ["!CartesianProduct",
                                "!BroadcastNestedLoopJoin", "!Window"],
    "q77_decontamination": ["LeftSemi", "HashAggregate",
                            "!CartesianProduct", "!Window"],
    "q78_robots_longest_match": ["HashAggregate", "!Window",
                                 "!CartesianProduct"],
    "q79_search_facets": ["Expand", "HashAggregate", "!Window",
                          "!CartesianProduct"],
    "q80_bigram_coverage": ["HashAggregate", "!Window", "!CartesianProduct"],
    "q81_inverted_index": ["Window", "HashAggregate", "!CartesianProduct"],
    "q82_phrase_search": ["BroadcastHashJoin", "HashAggregate",
                          "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "q83_link_reciprocity": ["LeftSemi", "HashAggregate",
                             "!CartesianProduct"],
    "q84_html_tables": ["Project", "!CartesianProduct", "!HashAggregate"],
    # pure narrow HOF chain: no shuffle, no join, no python
    "q85_c4_line_filter": ["Project", "!HashAggregate", "!CartesianProduct",
                           "!BroadcastHashJoin", "!ArrowEvalPython"],
    # single equi-join on the arithmetic pair key, like q27
    "q86_shingle_containment": ["!CartesianProduct",
                                "!BroadcastNestedLoopJoin"],
    # outline algorithm is an expression-level aggregate: narrow plan
    "q87_heading_outline": ["Project", "!HashAggregate",
                            "!CartesianProduct", "!ArrowEvalPython"],
    # df (3 rows) broadcasts; rank window partitions by term
    "q88_bm25_retrieval": ["BroadcastHashJoin", "Window", "HashAggregate",
                           "!CartesianProduct"],
    # line-df aggregate + shuffle join back + per-doc reassembly;
    # only the host-count table broadcasts
    "q89_template_removal": ["HashAggregate", "BroadcastHashJoin",
                             "!CartesianProduct", "!Window"],
    # map-only: explode of a 3-literal array, no join, no aggregate
    "q90_kwic_snippets": ["Generate", "!HashAggregate", "!CartesianProduct",
                          "!BroadcastHashJoin", "!Window"],
    # regexp pull is JVM; dedup is ONE corpus-sized groupBy on the
    # canonical key — no join, no window, no python
    "q91_canonical_dedup": ["HashAggregate", "!CartesianProduct",
                            "!BroadcastHashJoin", "!Window",
                            "!ArrowEvalPython"],
    # lag window and final groupBy both key on term — one Exchange
    # feeds both; distinct is a pre-aggregate, no join anywhere
    "q92_postings_compression": ["Window", "HashAggregate",
                                 "!CartesianProduct",
                                 "!BroadcastHashJoin"],
    # dup-gram filter joins back on the gram key (equi, AQE-managed);
    # the island windows and final groupBy all partition by doc id —
    # no cartesian, no python, no nested loop
    "q93_duplicate_spans": ["Window", "HashAggregate",
                            "!CartesianProduct",
                            "!BroadcastNestedLoopJoin",
                            "!ArrowEvalPython"],
    # the REAL production extractor UDF must sit in the plan (not a JVM
    # reimplementation), and nothing else — no join, no aggregate.
    # Asserted by UDF name, not the ArrowEvalPython node: Spark 4.1
    # prints the first plan of a session with the extracted
    # ArrowEvalPython operator but renders repeat plannings of the
    # same pandas UDF fused inside Project (execution is identical —
    # verified by running both forms).
    "q94_block_scoring": ["html_to_text_udf", "!CartesianProduct",
                          "!HashAggregate", "!BroadcastHashJoin",
                          "!Window"],
    # the production page exploder must sit in the plan (mapInPandas
    # renders as an anonymous MapInPandas node, not by function name);
    # synthesis is pure JVM concat so nothing else may appear
    "q95_pdf_reading_order": ["MapInPandas", "!CartesianProduct",
                              "!HashAggregate", "!BroadcastHashJoin",
                              "!Window"],
    # the FULL extraction DAG: the dedup election aggregate is
    # materialized BEHIND the checkpoint (lineage truncation), so the
    # final plan is winner-scan UNION fan-out joins; no all-pairs shape
    "q96_pipeline_text": ["Union", "BroadcastHashJoin",
                          "!CartesianProduct",
                          "!BroadcastNestedLoopJoin"],
    # head metadata is JVM regexps in one codegen'd Project
    "q97_head_metadata": ["Project", "!HashAggregate", "!CartesianProduct",
                          "!BroadcastHashJoin", "!ArrowEvalPython"],
    # hashed-unigram model: bounded groupBy(bucket) + broadcast weight
    # join + one corpus groupBy(id); the only nested-loop is the 1-row
    # totals scalar broadcast (deliberate)
    "q98_dsir_weights": ["BroadcastHashJoin", "HashAggregate", "Generate",
                         "!CartesianProduct", "!Window"],
    # the real decode UDF in the plan; byte synthesis is JVM encode()
    "q99_encoding_ladder": ["decode_html_udf", "!CartesianProduct",
                            "!HashAggregate", "!BroadcastHashJoin",
                            "!Window"],
    # regexp pull + get_json_object: one codegen'd Project, no python
    "q100_jsonld_metadata": ["Project", "!HashAggregate",
                             "!CartesianProduct", "!BroadcastHashJoin",
                             "!ArrowEvalPython"],
    # JVM regexp gate + Arrow repair UDF (asserted by name, q94 rule)
    "q101_mojibake_repair": ["fix_mojibake_udf", "!HashAggregate",
                             "!CartesianProduct", "!BroadcastHashJoin",
                             "!Window"],
    # doubling rounds live behind localCheckpoint; final plan is the
    # size aggregate + equi-join back — no Window, no pair blowup
    "q102_email_threads": ["HashAggregate", "!CartesianProduct",
                           "!BroadcastNestedLoopJoin", "!Window"],
    # stitch = one groupBy(article) with sort_array, never a Window
    "q103_multipage_stitch": ["HashAggregate", "!Window",
                              "!CartesianProduct"],
    # production span exploder + relational mode inference
    "q104_pdf_headings": ["MapInPandas", "HashAggregate", "!Window",
                          "!CartesianProduct"],
    # sentence windows are pure array HOFs + posexplode
    "q105_sentence_chunks": ["Generate", "!HashAggregate",
                             "!CartesianProduct", "!BroadcastHashJoin",
                             "!Window"],
    # aligned regexp_extract_all pulls in one codegen'd Project
    "q106_hreflang_clusters": ["Project", "!HashAggregate",
                               "!CartesianProduct", "!BroadcastHashJoin",
                               "!ArrowEvalPython"],
    # item explode is the only row-multiplying step; fields are
    # per-item regexps above it
    "q107_feed_items": ["Generate", "!HashAggregate",
                        "!CartesianProduct", "!BroadcastHashJoin",
                        "!Window", "!ArrowEvalPython"],
    # extraction + triage CASE chain, all JVM, no shuffle but orderBy
    "q108_soft404_triage": ["Project", "!HashAggregate",
                            "!CartesianProduct", "!BroadcastHashJoin",
                            "!ArrowEvalPython"],
    # suffix list compiles into the plan: no join, one rollup Exchange
    "q109_domain_rollup": ["HashAggregate", "!BroadcastHashJoin",
                           "!CartesianProduct", "!Window",
                           "!ArrowEvalPython"],
    # one JVM translate + replaces in a codegen'd Project
    "q110_search_fold": ["Project", "!HashAggregate",
                         "!CartesianProduct", "!BroadcastHashJoin",
                         "!ArrowEvalPython"],
    # mod-97 fold is an aggregate HOF inside the Project — not a
    # HashAggregate, not Python
    "q111_iban_detection": ["Project", "!HashAggregate",
                            "!CartesianProduct", "!BroadcastHashJoin",
                            "!ArrowEvalPython"],
    # the one URL normalization that NEEDS Python (RFC 3492 state
    # machine): assert the real Arrow UDF by name (q94 rule)
    "q112_idn_hosts": ["idn_decode_host_udf", "!HashAggregate",
                       "!CartesianProduct", "!BroadcastHashJoin",
                       "!Window"],
    # tokenize + per-token char/conv in one codegen'd Project
    "q113_percent_normalize": ["Project", "!HashAggregate",
                               "!CartesianProduct", "!BroadcastHashJoin",
                               "!ArrowEvalPython"],
    # RFC 3986 resolver is regexps + CASE + bounded dot passes
    "q114_outlink_absolutize": ["Project", "!HashAggregate",
                                "!CartesianProduct", "!BroadcastHashJoin",
                                "!ArrowEvalPython"],
    # meta robots/refresh pulls in one Project
    "q115_crawl_directives": ["Project", "!HashAggregate",
                              "!CartesianProduct", "!BroadcastHashJoin",
                              "!ArrowEvalPython"],
    # tokenize + conv/unhex/decode-UTF-32 + named CASE, all JVM
    "q116_entity_decode": ["Project", "!HashAggregate",
                           "!CartesianProduct", "!BroadcastHashJoin",
                           "!ArrowEvalPython"],
    # Flesch = aggregate HOF over one split: no explode, no shuffle
    "q117_readability": ["Project", "!HashAggregate", "!Generate",
                         "!CartesianProduct", "!BroadcastHashJoin",
                         "!ArrowEvalPython"],
    # fixed regexp_replace chain in one Project
    "q118_html_markdown": ["Project", "!HashAggregate",
                           "!CartesianProduct", "!BroadcastHashJoin",
                           "!ArrowEvalPython"],
    # count aggregates + per-instance joins; V is a 1-row broadcast
    # (BroadcastNestedLoopJoin over 1 row is the intended scalar join)
    "q119_bigram_lm": ["HashAggregate", "!CartesianProduct", "!Window",
                       "!ArrowEvalPython"],
    # vocab ids broadcast; dedup + window share the doc_id exchange
    "q120_winnowing": ["Window", "BroadcastHashJoin", "HashAggregate",
                       "!CartesianProduct", "!ArrowEvalPython"],
    # top-k must be TakeOrdered, never a global Sort
    "q121_collocations": ["HashAggregate", "BroadcastHashJoin",
                          "TakeOrdered", "!CartesianProduct", "!Window",
                          "!ArrowEvalPython"],
    # lag window and groupBy share the url_id exchange; no joins
    "q122_recrawl_schedule": ["Window", "HashAggregate", "!SortMergeJoin",
                              "!BroadcastHashJoin", "!CartesianProduct",
                              "!ArrowEvalPython"],
    # hub cap is a semi-join BEFORE the pair self-join; top-k TakeOrdered
    "q123_cocitation": ["LeftSemi", "HashAggregate", "TakeOrdered",
                        "!CartesianProduct", "!Window",
                        "!ArrowEvalPython"],
    # pair key includes slug: an equi-join, never a host-only explode
    "q125_bitext_pairs": ["!CartesianProduct", "!BroadcastNestedLoopJoin",
                          "!Window", "!ArrowEvalPython"],
    # three regexps + coalesce in one Project
    "q126_publication_date": ["Project", "!HashAggregate",
                              "!CartesianProduct", "!ArrowEvalPython"],
    # two-phase prefix sum: bucketed window + tiny offset window +
    # broadcast join; the explode is the only Generate
    "q127_sequence_packing": ["Window", "BroadcastHashJoin", "Generate",
                              "!CartesianProduct", "!SortMergeJoin",
                              "!ArrowEvalPython"],
    # HLL sketch merges map-side inside the same HashAggregate
    "q128_host_cardinality_sketch": ["HashAggregate", "!Window",
                                     "!CartesianProduct",
                                     "!ArrowEvalPython"],
    # one scan, 3-row aggregate; no window, no joins
    "q129_quality_mixing": ["HashAggregate", "!Window", "!SortMergeJoin",
                            "!CartesianProduct", "!ArrowEvalPython"],
    # global running sum: the q14 trade, documented
    "q130_token_budget_selection": ["Window", "!SortMergeJoin",
                                    "!CartesianProduct",
                                    "!ArrowEvalPython"],
    # one scan + 3-row aggregate
    "q131_leakage_safe_splits": ["HashAggregate", "!Window",
                                 "!CartesianProduct", "!ArrowEvalPython"],
    # family size = count over the fp window; no joins
    "q132_dup_family_weights": ["Window", "!SortMergeJoin",
                                "!BroadcastHashJoin", "!CartesianProduct",
                                "!ArrowEvalPython"],
    # tag explode + one groupBy on image_url; no window, no joins.
    # min_by plans as SortAggregate (not hash-aggregable) — still the
    # two-phase partial-before-Exchange shape, just sort-based
    "q133_image_alt_pairs": ["SortAggregate", "!Window", "!SortMergeJoin",
                             "!CartesianProduct", "!ArrowEvalPython"],
    # the whole classifier is one Project over the scan: no shuffle at all
    # beyond the final presentation sort
    "q134_quality_classifier": ["!HashAggregate", "!Window",
                                "!SortMergeJoin", "!BroadcastHashJoin",
                                "!CartesianProduct", "!ArrowEvalPython"],
    # two median rounds share the host key; joins are planner-sized
    "q137_host_quality_outliers": ["HashAggregate", "!CartesianProduct",
                                   "!ArrowEvalPython"],
    # wedge join + closing-edge join, both equi-joins on small keyed sides
    "q138_host_triangles": ["!CartesianProduct", "!ArrowEvalPython"],
    # sketch build + probe joins are equi-joins; no window, no NLJ
    "q139_countmin_heavy_hitters": ["HashAggregate", "!CartesianProduct",
                                    "!ArrowEvalPython"],
    # rank window partitioned by source; regression sums are one aggregate
    "q140_zipf_fit": ["Window", "HashAggregate", "!CartesianProduct",
                      "!ArrowEvalPython"],
    # pure bit-mixing projections + one range-partitioned sort: no joins,
    # no windows, no aggregates — the cheapest possible full shuffle
    "q141_epoch_shuffle": ["!HashAggregate", "!Window", "!SortMergeJoin",
                           "!BroadcastHashJoin", "!CartesianProduct",
                           "!ArrowEvalPython"],
    # type table is post-groupBy tiny: broadcast joins for total and
    # thresholds (explicitly hinted), single-partition rank window
    "q142_vocab_coverage": ["Window", "HashAggregate", "BroadcastNestedLoopJoin",
                            "!SortMergeJoin", "!ArrowEvalPython"],
    # regexp candidate + Luhn HOF both live in one Project over the scan
    "q143_card_detection": ["!HashAggregate", "!Window", "!SortMergeJoin",
                            "!BroadcastHashJoin", "!CartesianProduct",
                            "!ArrowEvalPython"],
    # version window + run-collapse groupBy + valid_to window all share
    # the doc_id hash partitioning
    "q145_url_history": ["Window", "HashAggregate", "!SortMergeJoin",
                         "!CartesianProduct", "!ArrowEvalPython"],
    # detection is regexp parses + one groupBy with two count-distincts
    "q147_crawl_traps": ["HashAggregate", "!CartesianProduct",
                         "!ArrowEvalPython"],
    # both HRW argmaxes are in-row transform+array_max (no explode):
    # the only shuffle is the per-shard rollup
    "q148_rendezvous_sharding": ["HashAggregate", "!Window",
                                 "!SortMergeJoin", "!BroadcastHashJoin",
                                 "!CartesianProduct", "!ArrowEvalPython"],
    # the whole chunker is a fold inside a Project; posexplode emits
    # chunk rows — no joins, no aggregates, no windows
    "q149_cdc_chunks": ["!HashAggregate", "!Window", "!SortMergeJoin",
                        "!BroadcastHashJoin", "!CartesianProduct",
                        "!ArrowEvalPython"],
    # direct and merged signatures are stacked two-phase min-aggs;
    # the 28-row compare join is planner-sized
    "q150_mergeable_minhash": ["HashAggregate", "!CartesianProduct",
                               "!ArrowEvalPython"],
    # block-set groupBy + two windows over the same (doc, block) order
    "q151_texttiling": ["Window", "HashAggregate", "!CartesianProduct",
                        "!ArrowEvalPython"],
    # blocklist dim broadcasts; one alternation-regexp scan per doc
    "q152_blocklist_filter": ["BroadcastHashJoin", "HashAggregate",
                              "!CartesianProduct", "!ArrowEvalPython"],
    # the (v, n_g) scalar row joins conditionless: the BNLJ is a 1-row
    # broadcast, not a pair enumeration
    "q153_source_kl_drift": ["HashAggregate", "BroadcastNestedLoopJoin",
                             "!CartesianProduct", "!ArrowEvalPython"],
    "q154_alpha_sampling": ["HashAggregate", "BroadcastNestedLoopJoin",
                            "!ArrowEvalPython"],
    # 5-offset explode + equi-join back on (doc_id, pos): a window
    # cooccurrence with NO range join anywhere
    "q155_glove_cooccurrence": ["HashAggregate", "!CartesianProduct",
                                "!BroadcastNestedLoopJoin",
                                "!ArrowEvalPython"],
    # the 1-row bloom aggregate broadcasts to the probe side (BNLJ of a
    # scalar); row_number windows build the deterministic probe set
    "q156_bloom_filter": ["Window", "BroadcastNestedLoopJoin",
                          "!CartesianProduct", "!ArrowEvalPython"],
    # blocking keys make the Levenshtein verify a bucket equi-join
    "q157_fuzzy_linkage": ["!CartesianProduct", "!BroadcastNestedLoopJoin",
                           "!ArrowEvalPython"],
    "q158_lexical_diversity": ["HashAggregate", "!CartesianProduct",
                               "!ArrowEvalPython"],
    # aligned regexp passes + zip + explode: one Project + Generate
    "q159_microdata": ["!HashAggregate", "!Window", "!SortMergeJoin",
                       "!BroadcastHashJoin", "!CartesianProduct",
                       "!ArrowEvalPython"],
    # per-shard roots then the 1-row corpus root broadcast back (BNLJ
    # of a scalar); ordering via array_sort, never a Window
    "q161_merkle_manifest": ["HashAggregate", "BroadcastNestedLoopJoin",
                             "!Window", "!CartesianProduct",
                             "!ArrowEvalPython"],
    # the whole projection + distance pipeline is array folds inside a
    # Project; the pair join is an equi-join on vec_a+1 = vec_b
    "q162_jl_projection": ["!CartesianProduct", "!ArrowEvalPython",
                           "!Window"],
    "q163_bpe_fertility": ["HashAggregate", "!CartesianProduct",
                           "!ArrowEvalPython", "!Window"],
    # two ranking windows + a full-outer fuse join
    "q164_rrf_fusion": ["Window", "!CartesianProduct",
                        "!ArrowEvalPython"],
    # LSH bucket self-join is a code equi-join — never all-pairs
    "q165_hard_negatives": ["!CartesianProduct",
                            "!BroadcastNestedLoopJoin",
                            "!ArrowEvalPython", "!Window"],
    "q166_decayed_reputation": ["HashAggregate", "!Window",
                                "!SortMergeJoin", "!BroadcastHashJoin",
                                "!CartesianProduct", "!ArrowEvalPython"],
    # stage-gated min-ts chain: conditional aggregates + user equi-joins,
    # no per-user sort anywhere
    "q167_event_funnel": ["HashAggregate", "!CartesianProduct",
                          "!ArrowEvalPython", "!Window"],
    "q168_retention_cohorts": ["HashAggregate", "!CartesianProduct",
                               "!ArrowEvalPython", "!Window"],
    "q169_event_transitions": ["Window", "HashAggregate",
                               "!CartesianProduct", "!ArrowEvalPython"],
    # histogram + cum window + three tiny limit probes; exact statistic
    # rides on one global row_number over the 64-bucket side
    "q170_histogram_quantiles": ["Window", "HashAggregate",
                                 "!CartesianProduct", "!ArrowEvalPython"],
    # vocabulary lag window + letter rollup; prefix count is a stateless
    # HOF inside the Project
    "q171_front_coding": ["Window", "HashAggregate", "!CartesianProduct",
                          "!ArrowEvalPython"],
    "q172_host_gini": ["Window", "HashAggregate", "!CartesianProduct",
                       "!ArrowEvalPython"],
    "q173_error_spikes": ["Window", "HashAggregate", "!CartesianProduct",
                          "!ArrowEvalPython"],
    # FFD fold runs per source inside one aggregate projection — the
    # plan is collect_list + Project, no joins
    "q174_compaction_bins": ["HashAggregate", "!SortMergeJoin",
                             "!BroadcastHashJoin", "!CartesianProduct",
                             "!ArrowEvalPython", "!Window"],
    "q175_fetch_schedule": ["Window", "HashAggregate",
                            "!CartesianProduct", "!ArrowEvalPython"],
    # ROLLUP = Expand + ONE HashAggregate (not three jobs + union)
    "q176_rollup_sets": ["Expand", "HashAggregate", "!SortMergeJoin",
                         "!CartesianProduct", "!ArrowEvalPython",
                         "!Window"],
    # pivot lowers to conditional aggregation: one pass, no join
    "q177_pivot": ["HashAggregate", "!SortMergeJoin",
                   "!BroadcastHashJoin", "!CartesianProduct",
                   "!ArrowEvalPython", "!Window"],
    "q178_rank_family": ["Window", "!HashAggregate", "!CartesianProduct",
                         "!ArrowEvalPython"],
    "q179_negative_sampling": ["Window", "HashAggregate",
                               "!CartesianProduct", "!ArrowEvalPython"],
    # the 10-query fan-out is a deliberate broadcast of a 10-row side
    "q180_retrieval_metrics": ["Window", "HashAggregate",
                               "BroadcastNestedLoopJoin",
                               "!ArrowEvalPython"],
    "q181_classifier_eval": ["HashAggregate", "!Window",
                             "!SortMergeJoin", "!BroadcastHashJoin",
                             "!CartesianProduct", "!ArrowEvalPython"],
    # JSON path extraction stays inside the scan projection
    "q182_json_props": ["HashAggregate", "!Window", "!SortMergeJoin",
                        "!CartesianProduct", "!ArrowEvalPython"],
    "q183_lateness_audit": ["Window", "HashAggregate",
                            "!CartesianProduct", "!ArrowEvalPython"],
    "q184_incremental_view": ["HashAggregate", "!CartesianProduct",
                              "!ArrowEvalPython", "!Window"],
    # one Expand feeding ONE HashAggregate: CUBE is not 4 separate scans
    "q185_cube_sets": ["Expand", "HashAggregate", "!Window",
                       "!CartesianProduct", "!ArrowEvalPython"],
    # UNPIVOT is a generator projection, not a union of per-column scans
    "q186_unpivot": ["!Union", "!CartesianProduct", "!ArrowEvalPython"],
    "q187_window_frames": ["Window", "!CartesianProduct",
                           "!ArrowEvalPython"],
    # SemDeDup: in-row literal-seed argmax assignment (no window, no
    # n-by-k shuffle); r6: the intra-cluster pairwise stage is a
    # LEFT-SEMI equi-probe on the cluster key (early exit per member)
    # instead of materialize-all-pairs + distinct over a SortMergeJoin
    "q188_semdedup": ["!CartesianProduct", "!BroadcastNestedLoopJoin",
                      "!Window", "LeftSemi"],
    "q189_surt_keys": ["!SortMergeJoin", "!CartesianProduct",
                       "!ArrowEvalPython"],
    "q190_ccnet_buckets": ["HashAggregate", "!CartesianProduct",
                           "!ArrowEvalPython"],
    # iterative peel: per-round lineage truncation leaves scans of the
    # checkpoint, not a 12-deep join tree
    "q191_kcore": ["HashAggregate", "!CartesianProduct"],
    "q192_wilson_hosts": ["HashAggregate", "Window",
                          "!CartesianProduct", "!ArrowEvalPython"],
    "q193_bowtie": ["!ArrowEvalPython"],
    # entropy: two aggregates keyed on doc_id, all-JVM expressions
    "q194_char_entropy": ["Generate", "HashAggregate", "!Window",
                          "!CartesianProduct", "!ArrowEvalPython"],
    # bucketed scan satisfies the join distribution: no Exchange between
    # the scans and the join (the orderBy adds the only exchange)
    "q195_bucketed_join": ["!CartesianProduct", "!ArrowEvalPython"],
    "q196_zorder_layout": ["HashAggregate", "!CartesianProduct",
                           "!ArrowEvalPython"],
    # the salt column is a live join key: hot key spread over reducers
    "q197_salted_skew_join": ["_sjsalt", "!CartesianProduct",
                              "!BroadcastNestedLoopJoin",
                              "!ArrowEvalPython"],
    # all pairwise work happens AFTER the distinct collapses to host
    # cardinality; the gram self-join is equi, never nested-loop
    "q198_mirror_hosts": ["HashAggregate", "!CartesianProduct",
                          "!BroadcastNestedLoopJoin", "!ArrowEvalPython"],
    "q199_dup_ngram_spectrum": ["Generate", "HashAggregate", "!Window",
                                "!CartesianProduct", "!ArrowEvalPython"],
    "q200_weighted_sample": ["WindowGroupLimit", "!CartesianProduct",
                             "!ArrowEvalPython"],
    # the point of the query: the lang predicate prunes DIRECTORIES
    "q201_partition_pruning": ["PartitionFilters: [lang", "IN (en,zh)",
                               "!CartesianProduct", "!ArrowEvalPython"],
    # sketch algebra cross join is |langs|^2-bounded BY DESIGN; the
    # corpus-sized work (gram dedup, top-k) happens before it
    "q202_kmv_setops": ["WindowGroupLimit", "!ArrowEvalPython"],
    "q203_pareto_skyline": ["HashAggregate", "Window",
                            "!CartesianProduct", "!SortMergeJoin",
                            "!ArrowEvalPython"],
    # one-row bloom broadcast; the probe is an in-row expression
    "q204_bloom_join": ["BroadcastNestedLoopJoin", "bit_or",
                        "!ArrowEvalPython"],
    # variant parse/probe is all JVM expression work
    "q205_variant_props": ["HashAggregate", "!ArrowEvalPython",
                           "!CartesianProduct"],
    # both detectors join on the same deterministic pair key
    "q206_dedup_agreement": ["HashAggregate", "!CartesianProduct",
                             "!ArrowEvalPython"],
    # 10-row query side broadcast; integer dot is a JVM fold
    "q207_sq8_ann": ["BroadcastNestedLoopJoin", "WindowGroupLimit",
                     "!CartesianProduct", "!ArrowEvalPython"],
    "q208_token_burstiness": ["Generate", "HashAggregate", "!Window",
                              "!CartesianProduct", "!ArrowEvalPython"],
    # one Arrow UDF column, array HOF aggregation, no explode anywhere
    "q209_code_switching": ["ArrowEvalPython", "!Generate",
                            "!HashAggregate", "!CartesianProduct"],
    "q210_heaps_law": ["Generate", "HashAggregate", "Window",
                       "!CartesianProduct", "!ArrowEvalPython"],
    # captured plan is the final nodes⋈hops assignment join only — the
    # per-round frontier joins are pinned behind localCheckpoint
    "q211_bfs_hops": ["!CartesianProduct", "!ArrowEvalPython", "!Window"],
    "q212_ngram_precision_eval": ["Generate", "HashAggregate", "!Window",
                                  "!CartesianProduct", "!ArrowEvalPython"],
    # per-step walk joins are pinned behind localCheckpoint (q211
    # convention); the captured plan is the union of the pinned steps
    "q213_deterministic_walks": ["!CartesianProduct", "!ArrowEvalPython",
                                 "!Window"],
    # the audit's point: BOTH strategies in one plan — hot branch
    # broadcast, cold branch sort-merge
    "q214_hybrid_skew_join": ["BroadcastHashJoin", "SortMergeJoin",
                              "HashAggregate", "!CartesianProduct",
                              "!ArrowEvalPython"],
    "q215_pii_pseudonymize": ["Generate", "HashAggregate",
                              "!CartesianProduct", "!ArrowEvalPython"],
    "q216_dedup_yield_curve": ["Generate", "HashAggregate",
                               "!CartesianProduct", "!ArrowEvalPython"],
    # the audit's point: the containment join is keyed by the quote's
    # leading 8-gram — equi hash join + verify, never a cartesian
    "q217_quote_attribution": ["Generate", "HashAggregate",
                               "!CartesianProduct",
                               "!BroadcastNestedLoopJoin",
                               "!ArrowEvalPython"],
    # contrast with q207: the label predicate becomes the join key, so
    # scoring is a hash join — no cross/nested-loop join anywhere
    "q218_filtered_ann": ["WindowGroupLimit", "!CartesianProduct",
                          "!BroadcastNestedLoopJoin", "!ArrowEvalPython"],
    "q219_mixed_script_spoof": ["Generate", "HashAggregate",
                                "!CartesianProduct", "!ArrowEvalPython"],
    # one Expand + one aggregate — two marginals in a single corpus scan
    "q220_grouping_sets": ["Expand", "HashAggregate", "!Generate",
                           "!CartesianProduct", "!ArrowEvalPython"],
    "q221_link_nepotism": ["Generate", "HashAggregate", "!Window",
                           "!CartesianProduct", "!ArrowEvalPython"],
    # the BNLJ is the 1-row stats scalar join (q21/q216 convention)
    "q222_shard_skew_planner": ["HashAggregate", "!Generate", "!Window",
                                "!CartesianProduct", "!ArrowEvalPython"],
    # 8 integer power-iteration rounds ran EAGERLY behind mandatory
    # per-round lineage truncation, so the final plan is just the
    # hub⋈auth equi-join + the L1-normalize Project — the per-round
    # HashAggregates are invisible here by design (same as q52)
    "q223_hits": ["!CartesianProduct", "!BroadcastNestedLoopJoin",
                  "!ArrowEvalPython"],
    # pure codegen'd Project over the corpus scan — no join, no agg
    "q224_wet_export": ["!HashAggregate", "!CartesianProduct",
                        "!SortMergeJoin", "!BroadcastHashJoin",
                        "!ArrowEvalPython"],
    # Spark 4 native recursive CTE: the UnionLoop operator owns the
    # fixpoint (no driver loop); per level one frontier⋈static join
    "q225_recursive_thread_paths": ["UnionLoop", "!CartesianProduct",
                                    "!ArrowEvalPython"],
    # explode + two keyed aggregates, both with map-side partials
    "q226_fineweb_filters": ["Generate", "HashAggregate", "!Window",
                             "!CartesianProduct", "!ArrowEvalPython"],
    # keyed aggregate + broadcast 1-row total (BNLJ scalar convention)
    "q227_k_anonymity": ["HashAggregate", "BroadcastNestedLoopJoin",
                         "!SortMergeJoin", "!ArrowEvalPython"],
    # license regexps are a pure codegen'd Project over the scan
    "q228_license_signals": ["!HashAggregate", "!CartesianProduct",
                             "!SortMergeJoin", "!BroadcastHashJoin",
                             "!ArrowEvalPython"],
    # one conditional-sum scan + one dedup groupBy + stack() Generate;
    # the BNLJ is the two 1-row aggregates joining (scalar convention)
    "q229_yield_funnel": ["HashAggregate", "Generate",
                          "!SortMergeJoin", "!CartesianProduct",
                          "!ArrowEvalPython"],
    # map-side-combinable degree/community aggregates; the BNLJ is the
    # broadcast 1-row edge-count m (scalar convention)
    "q230_modularity": ["HashAggregate", "!CartesianProduct",
                        "!ArrowEvalPython"],
    # hosts-sized Project; regexp_extract_all stays JVM-side
    "q231_robots_sitemaps": ["!HashAggregate", "!CartesianProduct",
                             "!SortMergeJoin", "!ArrowEvalPython"],
    # pipe syntax compiles to the same plan the classic form gives:
    # one partial/final aggregate, filter pushed to the scan
    "q232_pipe_syntax": ["HashAggregate", "!Window", "!Generate",
                         "!CartesianProduct", "!ArrowEvalPython"],
    # one corpus groupBy(url); everything after is histogram-sized —
    # the >= age-spine join is the broadcast NLJ of two tiny sides
    "q233_linkrot_lifetable": ["HashAggregate", "!Window",
                               "!CartesianProduct", "!SortMergeJoin",
                               "!ArrowEvalPython"],
    # the Arrow sniffer kernel IS the subject here — ArrowEvalPython
    # required; everything around it stays a codegen'd Project
    "q234_mime_mismatch_audit": ["ArrowEvalPython", "!HashAggregate",
                                 "!CartesianProduct", "!SortMergeJoin"],
    # q234's sibling — the encoding rung of the same Arrow kernel
    "q235_encoding_ladder_audit": ["ArrowEvalPython", "!HashAggregate",
                                   "!CartesianProduct", "!SortMergeJoin"],
    # the RFC 8878 zstd kernel is the subject — mapInPandas required
    "q236_zstd_roundtrip": ["MapInPandas", "!HashAggregate",
                            "!CartesianProduct", "!SortMergeJoin"],
    # the progressive-JPEG codec kernel is the subject
    "q237_progressive_jpeg_roundtrip": ["MapInPandas", "!HashAggregate",
                                        "!CartesianProduct",
                                        "!SortMergeJoin"],
    # the OpenPGP codec kernel is the subject
    "q238_pgp_roundtrip": ["MapInPandas", "!HashAggregate",
                           "!CartesianProduct", "!SortMergeJoin"],
    # the archive-crypto kernels are the subject
    "q239_encrypted_archive_roundtrip": ["MapInPandas", "!HashAggregate",
                                         "!CartesianProduct",
                                         "!SortMergeJoin"],
    # the lz4 codec kernel is the subject
    "q240_lz4_roundtrip": ["MapInPandas", "!HashAggregate",
                           "!CartesianProduct", "!SortMergeJoin"],
    # the PDF security handler + span extractor are the subject
    "q241_encrypted_pdf_extraction": ["MapInPandas", "!HashAggregate",
                                      "!CartesianProduct",
                                      "!SortMergeJoin"],
    # the office security handlers + docx extractor are the subject
    "q242_encrypted_office_extraction": ["MapInPandas", "!HashAggregate",
                                         "!CartesianProduct",
                                         "!SortMergeJoin"],
    # the FILEPASS RC4 ladders + BIFF8 parse are the subject
    "q243_encrypted_xls_extraction": ["MapInPandas", "!HashAggregate",
                                      "!CartesianProduct",
                                      "!SortMergeJoin"],
    # the [MS-DOC] §2.2.6 stream decrypt + piece walk are the subject
    "q244_encrypted_doc_extraction": ["MapInPandas", "!HashAggregate",
                                      "!CartesianProduct",
                                      "!SortMergeJoin"],
    # the [MS-PPT] persist-object decrypt + text-atom walk are the subject
    "q245_encrypted_ppt_extraction": ["MapInPandas", "!HashAggregate",
                                      "!CartesianProduct",
                                      "!SortMergeJoin"],
    # kernel-certification queries: the Arrow pass is the subject — no
    # joins or aggregates belong in any of these plans
    # q246 materializes extraction to a checkpoint first; the audited
    # plan is the scan over it, so no Python node is expected
    "q246_filesystem_walk": ["!CartesianProduct", "!SortMergeJoin"],
    "q247_webp_roundtrip": ["MapInPandas", "!HashAggregate",
                            "!CartesianProduct", "!SortMergeJoin"],
    "q248_wat_export": ["MapInPandas", "!CartesianProduct",
                        "!SortMergeJoin"],
    "q249_flac_roundtrip": ["MapInPandas", "!HashAggregate",
                            "!CartesianProduct", "!SortMergeJoin"],
    "q250_mp3_stats": ["MapInPandas", "!HashAggregate",
                       "!CartesianProduct", "!SortMergeJoin"],
    "q251_tnef_extraction": ["MapInPandas", "!HashAggregate",
                             "!CartesianProduct", "!SortMergeJoin"],
    "q252_legacy_encodings": ["MapInPandas", "!HashAggregate",
                              "!CartesianProduct", "!SortMergeJoin"],
    "q253_vba_macros": ["MapInPandas", "!HashAggregate",
                        "!CartesianProduct", "!SortMergeJoin"],
    "q254_onenote_embedded": ["MapInPandas", "!HashAggregate",
                              "!CartesianProduct", "!SortMergeJoin"],
    "q255_dbf_tables": ["MapInPandas", "!HashAggregate",
                        "!CartesianProduct", "!SortMergeJoin"],
    "q256_wk1_tables": ["MapInPandas", "!HashAggregate",
                        "!CartesianProduct", "!SortMergeJoin"],
    "q257_visio_text": ["MapInPandas", "!HashAggregate",
                        "!CartesianProduct", "!SortMergeJoin"],
    "q258_sqlite_tables": ["MapInPandas", "!HashAggregate",
                           "!CartesianProduct", "!SortMergeJoin"],
    "q259_snappy_roundtrip": ["MapInPandas", "!HashAggregate",
                              "!CartesianProduct", "!SortMergeJoin"],
    "q260_chm_extraction": ["MapInPandas", "!HashAggregate",
                            "!CartesianProduct", "!SortMergeJoin"],
    "q261_cab_extraction": ["MapInPandas", "!HashAggregate",
                            "!CartesianProduct", "!SortMergeJoin"],
    "q262_pe_metadata": ["MapInPandas", "!HashAggregate",
                         "!CartesianProduct", "!SortMergeJoin"],
    "q263_audio_typing": ["MapInPandas", "!HashAggregate",
                          "!CartesianProduct", "!SortMergeJoin"],
    "q264_rar_roundtrip": ["MapInPandas", "!HashAggregate",
                            "!CartesianProduct", "!SortMergeJoin"],
    "q265_onenote_text": ["MapInPandas", "!HashAggregate",
                          "!CartesianProduct", "!SortMergeJoin"],
}

NOTES = {
    "q216_dedup_yield_curve": "the one BroadcastNestedLoopJoin is the "
        "1-row total-docs scalar join (q21 convention); the pair "
        "generation itself is a shingle equi-self-join — never all-pairs.",
    "q213_deterministic_walks": "per-step frontier joins are pinned "
        "behind localCheckpoint/CheckpointStore; the captured plan is "
        "the union of pinned step outputs plus the final sort.",
    "q210_heaps_law": "the cumulative-sum Window is unpartitioned by "
        "design but its input is checkpoint-count-sized (n_docs/50 rows "
        "after the aggregates) — the corpus-sized work is the explode + "
        "groupBy(token).min(doc_id), which has map-side combine.",
    "q211_bfs_hops": "per-round BFS frontier joins are materialized "
        "behind localCheckpoint/CheckpointStore (same convention as the "
        "q42 CC rounds), so only the final unreachable-marking left join "
        "appears in the captured plan.",
    "q195_bucketed_join": "at sf0.01 Catalyst correctly prefers a "
        "broadcast join over the bucketed scan (dim fits; the scan shows "
        "'Bucketed: false (disabled by query planner)') — the shuffle-free "
        "co-bucketed SortMergeJoin (no Exchange, no Sort) is pinned in "
        "tests/test_bucketing.py with broadcast disabled, which is the "
        "regime that matters at 100 TB.",
    "q156_bloom_filter": "the unpartitioned row_number window builds the "
        "deterministic PROBE set over the distinct vocabulary — a bounded "
        "(type-count) side, not the corpus; the filter build itself is one "
        "map-side-combinable bit_or aggregate.",
    "q80_bigram_coverage": "the bigram-count score join carries no "
        "broadcast hint: the bigram table grows with the corpus (unlike "
        "q73's vocabulary), so the plan must stay valid as a shuffle join "
        "at scale even if AQE broadcasts it at small SF.",
    "q82_phrase_search": "!BroadcastNestedLoopJoin is the audit's point: "
        "the pos+1/pos+2 follow-up joins only stay hash joins if Catalyst "
        "extracts the position arithmetic as equi-join keys.",
    "q84_html_tables": "no aggregate anywhere — the per-row table "
        "reshaping is one Arrow UDF plus JVM higher-order functions in a "
        "single Project.",
    "q21_cosine_topk": "BroadcastNestedLoopJoin is deliberate: the exact "
        "brute-force baseline broadcasts a 10-row query set; the scale path "
        "is q32 (LSH buckets).",
    "q26_embedding_dups": "bucket-equi join on the LSH sign-projection — "
        "the all-pairs `id_a < id_b` nested loop is gone; cosine+threshold "
        "filter runs before the pair-dedup shuffle.",
    "q31_simhash_dups": "the LeftSemi is the degenerate-bucket cap: block "
        "buckets above max_bucket are dropped before the self-join, so "
        "identical-boilerplate families cannot make it quadratic.",
    "q36_ocr_join": "OCR side sources are dimension-sized and broadcast; "
        "ocrtext is built as map<source,text> with map_from_entries over "
        "collect_set — one narrow groupBy on the tiny side table only.",
    "q30_minhash_lsh_dups": "the Jaccard-verify joins carry NO forced "
        "broadcast hint — the planner broadcasts the candidate shingle "
        "set while it is small and degrades to a shuffle join for large "
        "near-dup families (any BroadcastHashJoin below is planner/"
        "AQE-chosen from size stats).",
    "q42_dup_families": "the captured plan is the FINAL assignment join "
        "only — the CC star rounds are materialized behind localCheckpoint/"
        "CheckpointStore per round (each is one groupBy-min + one equi-join "
        "on node id), so the logical plan stays flat at any round count.",
    "q43_family_representatives": "the dedup apply step is a single "
        "max-of-struct HashAggregate (map-side partials) — keep-the-longest "
        "without a per-row Window sort.",
    "q45_host_cap": "skew-aware cap: the LeftSemi is the under-cap bypass "
        "— only rows of over-cap hosts reach the Window sort (zipfian host "
        "populations would otherwise sort the whole corpus).",
    "q48_vocab_builder": "the top-V vocab is a two-phase HashAggregate + "
        "sort-limit, then a BROADCAST left join back onto the exploded "
        "words — the corpus-sized side shuffles once (the explode), the "
        "vocab never does.",
    "q49_robots_gate": "per-row regexp extraction is a single codegen'd "
        "Project over the scan; the only Exchange below belongs to the "
        "q-entry's orderBy for oracle determinism.",
    "q50_sessionize": "both windows (lag gap-mark, running session sum) "
        "share the (user_id) partitioning and (ts, event_id) order, so "
        "Catalyst plans ONE Exchange + one sort for the whole "
        "sessionization; the rollup aggregate reuses nothing but is "
        "map-side partial as usual.",
    "q56_range_join": "interval containment as a bucketed equi-join: "
        "facts key on one 3h bucket, intervals explode to covered buckets, "
        "the exact BETWEEN filter runs inside the join — no nested loop.",
    "q57_asof_join": "union + carry-forward: NO join node of any kind — "
        "one Window per user carries the latest prior click forward; the "
        "planner cannot pick a bad join strategy because there is none.",
    "q59_salted_agg": "two HashAggregate pairs: phase 1 groups on "
        "(host, salt) so the zipfian mega-host splits across tasks; "
        "phase 2 merges mergeable partials.",
    "q46_deterministic_sample": "the operator itself is a pure "
        "multiplicative-hash filter with zero Exchange "
        "(test_sampling.py asserts it on the raw plan); the single "
        "Exchange below belongs to the q-entry's orderBy, added only for "
        "deterministic oracle comparison.",
    "q61_crawl_frontier": "one Exchange on host feeds the per-host "
        "row_number; the crawl-delay arithmetic is pure projection above "
        "it — a fetcher fleet reads its own host partitions.",
    "q62_capture_dedup": "min-per-fingerprint is a map-side-combinable "
        "HashAggregate (no Window); the resolve join broadcasts or "
        "shuffles by planner stats.",
    "q63_domain_quality_prior": "the prior table is host-sized, so the "
        "re-join is an explicit broadcast — the corpus shuffles once for "
        "the aggregate and never again.",
    "q64_stratified_sample": "per-stratum sampling is a pure filter "
        "(membership = multiplicative hash vs a per-language threshold) — "
        "no aggregate, window, or join; the single Exchange below belongs "
        "to the q-entry's orderBy for oracle determinism.",
    "q65_crawl_delta": "full-outer diff of two crawl fingerprint sets — "
        "SortMergeJoin on doc_id is the right plan (both sides corpus-"
        "sized); at 10^12 docs both crawls live in Iceberg tables "
        "bucketed by doc_id so the exchange is free.",
    "q66_anchor_text": "explode + one groupBy on target host; "
        "collect_set aggregates are map-side partial.",
    "q70_phash_near_dups": "banded 4x16-bit pHash keys make the "
        "near-dup search an equi-self-join on (band, key) — the same "
        "no-all-pairs shape as simhash; bit_count verifies JVM-side.",
    "q71_paragraph_dedup": "first-occurrence election is a MIN "
        "HashAggregate on the paragraph string (map-side partial), and "
        "the join back shares that key so AQE reuses the exchange — a "
        "hot boilerplate paragraph is one combiner cell, never a Window "
        "sort pile-up.",
    "q72_gopher_quality": "every Gopher rule is a higher-order function "
        "over one split() in a single codegen'd Project — zero shuffles "
        "except the q-entry's orderBy for oracle determinism; integer "
        "cross-multiplied bounds, no float means.",
    "q73_unigram_surprise": "the rank Window runs over the vocabulary "
        "aggregate only (thousands of rows), then broadcasts back onto "
        "the corpus-sized explode — the corpus shuffles once for the "
        "per-doc sum, the vocab never shuffles it.",
    "q74_sitemap_ingest": "sitemap parse is regexp projection over the "
        "scan + one groupBy on host; priority in integer tenths and "
        "lastmod as an integer day (date string rebuilt above the "
        "aggregate) keep the groupBy a codegen'd HashAggregate — "
        "max(string) would demote it to SortAggregate.",
    "q75_script_profile": "four regexp_count columns + an argmax CASE "
        "chain in one codegen'd Project over the scan — the orderBy "
        "Exchange below exists only for oracle determinism.",
    "q76_redirect_resolution": "three rounds of left equi-join against "
        "the hop-edge set (one shuffle each, AQE broadcasts the edge "
        "side from stats) — chain resolution without any per-row loop; "
        "long chains would switch to pointer doubling like the CC "
        "rounds in graph.py.",
    "q77_decontamination": "the eval-shingle index dedups to a small "
        "DISTINCT set the planner broadcasts into the LeftSemi from "
        "stats; the training-corpus explode shuffles once for the "
        "per-doc overlap count and never sorts.",
    "q78_robots_longest_match": "RFC 9309 longest-match: rules join on "
        "host (tiny side, planner broadcasts from stats), the winner is "
        "one max-of-struct (length, allow, prefix) HashAggregate — the "
        "q43 keep-longest shape, no per-page Window sort; unmatched "
        "pages re-enter via a LeftAnti with the RFC allow default.",
    "q79_search_facets": "CUBE plans one Expand + one HashAggregate — "
        "all three facet dimensions (and the grand total) come out of a "
        "single shuffle where three separate ES aggregations would scan "
        "the index three times.",
    "q96_pipeline_text": "the captured plan is the production DAG's "
        "gather stage over checkpointed snapshots — the dedup-election "
        "HashAggregate ran before the column-pruned parquet checkpoint "
        "(mandatory lineage truncation), so the final plan is winner "
        "scan UNION duplicate fan-out joins on the content hash; blob "
        "bytes never appear above the analyze checkpoint, and the "
        "BroadcastHashJoins are planner/AQE-sized, not hinted.",
    "q98_dsir_weights": "the weight table is ≤ n_buckets rows whatever "
        "the corpus size (the hashing trick), so its join back onto the "
        "token explode is an explicit broadcast; the single "
        "BroadcastNestedLoopJoin below is the 1-row totals scalar "
        "attach, not a pair enumeration.",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from hoover_snoop2_spark.queries import QUERIES
    from hoover_snoop2_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    out = ["# PLANS — formatted physical plans for headline queries",
           "", f"sf_dir: `{sf_dir}` (written by tools/explain_audit.py)", ""]
    audited = [n for n in AUDITED if n in only] if only else AUDITED
    for name in audited:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        verdicts = []
        for want in CHECKS.get(name, []):
            if want.startswith("!"):
                ok = want[1:] not in plan
                verdicts.append(f"{'OK' if ok else 'VIOLATION'}: no {want[1:]}")
            else:
                verdicts.append(f"{'OK' if want in plan else 'MISSING'}: {want}")
        note = NOTES.get(name)
        out += [f"## {name}", "",
                *(f"- {v}" for v in verdicts),
                *([f"", f"_{note}_"] if note else []), "",
                "```", plan.strip()[:4000], "```", ""]
        print(name, "|", "; ".join(verdicts))
    if not only:
        with open("PLANS.md", "w") as f:
            f.write("\n".join(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
