"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The flagship end-to-end docs/sec (langid + perplexity + rules + scrub) is
also reported under "docs_per_sec".
"""

from __future__ import annotations

import json
import os
import time

# Host calibration: the shared box swings ±2-3× between rounds (measured;
# see VERDICT r3), so every bench line carries a busy-loop factor that
# cross-round comparisons can normalize by.  NOMINAL_BUSY_SEC anchors the
# unit: the documented 20M-iteration pure-Python loop at ~1.5 s on an
# idle sandbox vCPU.  host_factor > 1 means this run's host was slower
# than nominal by that factor.
BUSY_ITERS = 20_000_000
NOMINAL_BUSY_SEC = 1.5


def busy_loop_sec(reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x = 0
        for i in range(BUSY_ITERS):
            x += i
        best = min(best, time.perf_counter() - t0)
    return best

HEADLINE = [
    "quality_pipeline_docs",
    "doc_textstats",
    "doc_quality_rules",
    "doc_rule_hit_counts",
    "type_profile_customer",
    "pattern_freq_cname",
    "topk_event_types",
    "cardinality_exact",
    "summary_lquantity",
    "histogram_lquantity",
    "quantiles_lquantity",
    "fingerprint_dedup_pname",
    "survivorship_orders",
    "exact_dedup_norm_docs",
    "minhash_docs",
    "minhash_near_dups",
    "simhash_near_dups",
    "ann_bruteforce_top3",
    "ann_lsh_top3",
    "doc_token_counts",
    "doc_fingerprints",
    "record_linkage_parts",
    "record_clusters_parts",
    "survivorship_most_common",
    "reservoir_orders_k20",
    "keyer_profile_parts",
    "normalize_profile_parts",
    "phone_profile_customers",
    "json_quality_props",
    "datetime_patterns_orders",
    "standardize_nation",
    "events_hourly_windows",
    "quality_score_docs",
    "salted_event_counts",
    "top_order_per_status",
    "profile_customer_table",
    # round 2 additions
    "phonetic_codes_names",
    "phonetic_linkage_names",
    "mfb_clusters_parts",
    "tokenized_weight_parts",
    "cardinality_hll",
    "quantiles_approx_lquantity",
    "avro_nested_quality",
    "doc_signatures",
    "chronology_convert_orders",
    "dominant_type_votes",
    "embedding_near_dups",
    "email_chain_customer",
    "fuzzy_standardize_names",
    "matcher_weights_vocab",
    "qgram_weights_parts",
    "scrub_docs",
    "japanese_normalize_vocab",
    # round 3 additions
    "synonym_search_modes",
    "mask_customer_names",
    "media_features",
    "ann_ivf_top3",
    "sessionize_events",
    # round 4 additions
    "umalqura_convert_orders",
    "phone_metadata_customers",
    "weighted_reservoir_orders",
    "mx_verify_customer",
    "url_canonical_dedup",
    "line_dedup_docs",
    "dedup_clusters_global",
    "contamination_docs",
    "html_extract_pages",
    "domain_quality_stats",
    "dup_paragraph_docs",
    "stratified_sample_docs",
    "card_scrub_docs",
    "top_ngram_docs",
    "outlink_graph_pages",
    "domain_pagerank",
    "script_profile_docs",
    "mojibake_docs",
    "robots_meta_pages",
    "token_budget_by_lang",
    "pii_text_scrub_docs",
    "dedup_survivors_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    busy_before = busy_loop_sec()

    from data_quality_spark.queries import QUERIES
    from data_quality_spark.session import get_spark

    spark = get_spark(app_name="dqs-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    def force(df):
        """Materialize EVERY column (count() alone lets Catalyst prune the
        work away): one pass computing a checksum over all columns."""
        cols = [F.col(c).cast("string") for c in df.columns]
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64(*cols), F.lit(1_000_003))).alias("chk"),
        ).collect()[0]
        return row["n"]

    # Warm-up: fully materialize the flagship pipeline once on the tiny tier
    # so one-time costs (whole-stage-codegen compile, Python UDF worker spawn
    # + imports, JIT) don't pollute per-query timings — at real scale these
    # amortize to zero over hours of work.
    force(QUERIES["quality_pipeline_docs"](spark, "/root/testdata/sf0.001"))

    # Two runs per query, report the warm one: the first run of each distinct
    # plan pays whole-stage-codegen compilation (constant, amortized at real
    # scale); the warm run is the steady-state throughput that matters.
    timings: dict[str, float] = {}
    n_docs = 0
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            cnt = force(df)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # drop any persisted intermediates (e.g. the MinHash signature
        # table) so one query's cache does not skew the next one's timing
        spark.catalog.clearCache()
        if name == "quality_pipeline_docs":
            n_docs = cnt

    busy = min(busy_before, busy_loop_sec())
    host_factor = round(busy / NOMINAL_BUSY_SEC, 3)

    total = round(sum(timings.values()), 3)
    e2e = timings["quality_pipeline_docs"]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "docs_per_sec": round(n_docs / e2e, 1) if e2e else None,
        "e2e_docs": n_docs,
        "cpus": int(cpus),
        "n_queries": len(timings),
        # cross-round normalization: busy-loop calibration (min of 3
        # reps before + 3 after the suite); divide `value` by
        # `host_factor` (or compare `value_host_normalized` directly)
        # to compare rounds on this ±3x-noisy shared host
        "busy_loop_sec": round(busy, 3),
        "host_factor": host_factor,
        "value_host_normalized": round(total / host_factor, 3) if host_factor else None,
    }
    # Full per-query map goes to a committed file, NOT stdout: round 4's
    # 82-entry map outgrew the driver's stdout tail capture and truncated
    # the headline total (BENCH_r04.json parsed:null).  The stdout line
    # stays compact; `queries` carries only the 10 slowest (the ones a
    # reader acts on), `queries_full` points at the rest.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench", "last_run.json")
    with open(full_path, "w") as fh:
        json.dump({**summary, "queries": timings}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({**summary, "queries": slowest, "queries_full": "bench/last_run.json"}))


if __name__ == "__main__":
    main()
