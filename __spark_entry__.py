"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship quality pipeline on sf0.001;
`queries()` / `oracle_sql()` expose each implemented operator from
SURVEY.md §2 with its DuckDB oracle twin (see data_quality_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_quality_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["quality_pipeline_docs"](spark, "/root/testdata/sf0.001")


# Evidence-priority ordering: the driver's correctness gate samples the FIRST
# 50 entries of queries(), so this list IS the round-5 sample — weakest prior
# driver evidence first: (a) queries NEW or CHANGED this round (no driver row
# exists for their current form: the six round-5 crawl-QA/PII/survivor queries; the
# datetime query whose recognition table grew 48→228 formats; the HTML
# extraction query with numeric charrefs; the four registered_domain
# consumers on the generated public-suffix table; the four classify()
# consumers whose type verdicts could shift with the wider date/time tables),
# then (b) every ORACLE-BACKED query NOT sampled in round 4 (their newest
# green row is r3 or older — the first-50 rotation rule), then (c) the
# pinned-VALUES-oracle entries, whose pins can silently drift and therefore
# always carry the weakest standing evidence.  The 38 entries outside the
# sample have an r4
# hash-green row on unchanged code or (HLL / approx-quantile) can only ever
# be rows-checked.
_PRIORITY = [
    # (a) new or changed in round 5
    "pii_text_scrub_docs",  # NEW: email+IPv4 text scrub
    "dedup_survivors_docs",  # NEW: keep-best-per-cluster survivor selection
    "script_profile_docs",  # NEW: per-script codepoint profile
    "mojibake_docs",  # NEW: encoding-artifact QA
    "robots_meta_pages",  # NEW: robots-meta compliance signal
    "token_budget_by_lang",  # NEW: training-mix token rollup
    "datetime_patterns_orders",  # 228-format table + SQL-CASE dispatch + 16-arm fixture
    "html_extract_pages",  # numeric character references + fixture refs
    "url_canonical_dedup",  # generated PSL + sentinel-probe registered_domain
    "domain_quality_stats",  # same registered_domain rewrite
    "outlink_graph_pages",  # same + call-site host binding
    "domain_pagerank",  # same + edges persist
    "type_profile_customer",  # classify() gained date/time formats
    "value_quality_customer",  # classify() gained date/time formats
    "dominant_type_votes",  # classify() gained date/time formats
    "profile_customer_table",  # classify() gained date/time formats
    # (b) not sampled in round 4 — newest green row is r3 or older
    "doc_textstats",
    "doc_quality_rules",
    "doc_rule_hit_counts",
    "pattern_freq_cname",
    "pattern_freq_props",
    "word_pattern_freq_pname",
    "topk_event_types",
    "cardinality_exact",
    "summary_lquantity",
    "histogram_lquantity",
    "quantiles_lquantity",
    "text_length_docs",
    "fingerprint_dedup_pname",
    "exact_dedup_docs",
    "email_check_customer",
    "email_chain_customer",
    "survivorship_orders",
    "sample_docs_k50",
    "minhash_docs",
    "standardize_nation",
    "fuzzy_standardize_names",
    "mask_customer_names",
    "events_hourly_windows",
    "quality_score_docs",
    "salted_event_counts",
    "top_order_per_status",
    # (c) pinned-oracle entries — pins can drift, keep them under the
    # gate.  The two
    # by-nature rows-only entries (cardinality_hll,
    # quantiles_approx_lquantity) are deliberately OUTSIDE the sample:
    # a no-oracle slot produces no value-hash evidence, so spending 2
    # of the 50 gate slots on them would displace verifiable queries
    # (their rows-only adjudication is already on record since r4).
    "quality_pipeline_docs",
    "mfb_clusters_parts",
    "ann_ivf_top3",
    "media_features",
    "synonym_search_modes",
    "weighted_reservoir_orders",
    "mx_verify_customer",
    "umalqura_convert_orders",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (UDF-backed queries are rows-only)."""
    return dict(ORACLES)
