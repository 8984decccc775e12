"""Driver-window registry invariants.

The driver's CORRECTNESS harness verifies the first 50 registered queries.
These tests pin (a) that the round-3/round-4 surface sits inside that
window, (b) that the reorder is a pure permutation (nothing lost), and
(c) that every windowed query except the engine-loop one has an oracle.
"""

from crawlspark.queries import ORACLE_SQL, SPARK_QUERIES

WINDOW = 50

# Queries that have never had a driver correctness row before round 4 —
# the whole round-3 surface.  Must be inside the first-50 window.
PROMOTED = [
    # transfer_decode rotated OUT in round 5 (green driver rows r02+r04;
    # S2 stays covered by fetched_cache_staleness + the crawl e2e)
    # ann_ivf_assign rotated OUT in the round-5 continuation (r04 green;
    # ann_ivf_topk's search replays the assignment join in-window)
    # ann_ivf_topk rotated OUT in continuation batch 5 (r04 green;
    # semantic_dedup_roots + embed_quantize_int8 keep similarity windowed)
    # dedup_cluster_roots rotated OUT in continuation batch 4 (r04 green;
    # semantic_dedup_roots keeps the star-CC root kernel windowed)
    # redirect_flag / whitespace_cleanup / meta_passthrough /
    # empty_body_drop rotated OUT in round 5 (5 green driver rows each,
    # r01-r05; J3 stays covered by the crawl e2e redirect discovery,
    # C4/J2/F5 by the windowed span fixtures + e2e doc-set equality)
    # seed_file_union / stratified_sample rotated OUT in the round-5
    # continuation (fresh r04 driver-green rows; S1 stays covered by the
    # crawl e2e + test_seed_modes, curation by the windowed quartet)
    # html_domain_fallbacks / html_shallow_tail rotated OUT in the round-5
    # continuation (r04 green; branch/tstar rows keep the families windowed)
    # html_card_union rotated OUT in continuation batch 4 (r04 green;
    # html_anchor_cards + html_branch_cards keep the card family windowed)
    "stream_dedup",
    # doc_length_quantiles rotated OUT in round 5 (4 green driver rows
    # r01-r04; curation family keeps stratified_sample windowed)
    # round-4 surface (html_archive_pill / html_next_page_targeted /
    # html_attr_cards / html_attr_fallbacks / html_date_splits /
    # media_resize rotated OUT in the round-5 continuation — each with a
    # fresh r04 driver-green row and windowed family coverage)
    # html_tstar_spans / html_anchor_cards / paragraph_boilerplate rotated
    # OUT in continuation batch 5 (r04 green; html_branch_* rows + the
    # crawl e2e span equality and paragraph_dedup/c4_line_filter keep
    # those families windowed)
    # media_frame_sample / recrawl_change_report rotated OUT in
    # continuation batch 4 (r04 green; media_span_pipeline +
    # adaptive_recrawl_policy keep both families windowed)
    # round-5 surface (rule-table completion + F8 rewrites)
    "url_domain_rewrite",
    "html_branch_cards",
    "html_next_page_modes",
    "html_branch_dates",
    "html_body_include",
    "html_path_rules",
    "media_span_pipeline",
    "cdx_latest_lookup",
    "sample_weighted",
    "domain_quota_cap",
    "token_budget_pack",
    "decontam_flag",
    "repetition_ratio",
    "domain_quality_gate",
    "cuckoo_expire_readmit",
    # round-5 continuation surface (privacy/chunking/corpus-dedup/URL
    # quality/fused curation/semantic dedup)
    "pii_redact",
    "doc_chunk_windows",
    "paragraph_dedup",
    "url_quality_signals",
    "curation_decision",
    "semantic_dedup_roots",
    "token_rarity_score",
    "anchor_text_agg",
    "host_graph_edges",
    # round-5 graph/interchange trio + mixing plan
    "host_pagerank",
    "warc_record_fields",
    "sitemap_urlset_parse",
    "token_mix_plan",
    # round-5 continuation batch 2: quality batteries, posting build,
    # archive revisit dedup, NFC normalization, sitemap recursion, HRW
    # sharding, and the first oracle row for the full REP matcher
    "gopher_quality_gate",
    "c4_line_filter",
    "token_postings",
    "warc_revisit_dedup",
    "unicode_nfc_normalize",
    "sitemap_index_expand",
    "rendezvous_shard",
    "robots_rep_audit",
    # round-5 continuation batch 3: freshness policy, vector quantization,
    # sketch counting
    "adaptive_recrawl_policy",
    "embed_quantize_int8",
    "cms_heavy_hitters",
    # round-5 continuation batch 4: frontier-scale ops (HLL cardinality,
    # trap guard, budget allocation, MIME sniff, sitemap discovery).
    # interleaved_explode / html_card_union / dedup_cluster_roots /
    # recrawl_change_report / media_frame_sample rotated OUT (r04-green;
    # family coverage stays windowed — see _DEMOTED rationale)
    "hll_frontier_cardinality",
    "url_trap_detect",
    "crawl_budget_alloc",
    "media_mime_sniff",
    "robots_sitemap_discovery",
    # round-5 continuation batch 5: seed-distance BFS, Crawl-delay parser
    # oracle, exact-substring dup measurement, asymmetric containment.
    # html_tstar_spans / html_anchor_cards / paragraph_boilerplate /
    # ann_ivf_topk rotated OUT (r04-green; family coverage stays windowed
    # — see _DEMOTED rationale)
    "link_depth_bfs",
    "robots_crawl_delay",
    "exact_substring_dup_spans",
    "shingle_containment",
]


def test_promoted_queries_inside_driver_window():
    window = list(SPARK_QUERIES)[:WINDOW]
    missing = [n for n in PROMOTED if n not in window]
    assert not missing, f"round-3/4 queries outside driver window: {missing}"


def test_registry_is_a_permutation_with_no_duplicates():
    names = list(SPARK_QUERIES)
    assert len(names) == len(set(names))
    # every oracle refers to a registered query
    assert set(ORACLE_SQL) <= set(names)


def test_windowed_queries_all_have_oracles_except_engine_loop():
    window = list(SPARK_QUERIES)[:WINDOW]
    rows_only = [n for n in window if n not in ORACLE_SQL]
    assert rows_only == ["crawl_documents"], rows_only
