"""Dup-heavy no-broadcast MinHash bench — the regime a web-scale cluster
lives in.

The driver fixture (mostly-unique docs) produces a tiny candidate-pair
set that AQE happily broadcasts, so it can't distinguish a pair-carrying
formulation from the (id, band_key)-only one — the restructure's 2.6×
shuffle win (PLANS.md round-3 table: 174.3 → 66.5 MB, 42 → 13.5 s) only
shows where candidate pairs are DENSE and broadcasts are off.  Web
crawls are exactly that regime: duplicate-heavy corpora on clusters
whose pair sets dwarf any broadcast threshold.  This bench makes that
measurement repeatable: a deterministic 2k×10 near-copy corpus (each
base doc from the seeded pages generator, copies with a per-copy token
prefix + one word dropped so true Jaccard stays ≥ the 0.7 verify
threshold), broadcast joins disabled at both planner and AQE level, warm
wall time + total shuffle write (Spark UI REST) reported as one JSON
line.

Usage: python bench/dup_heavy.py [--base 2000] [--copies 10]
Writes bench/dup_heavy_result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4055


def build_corpus(spark, base: int, copies: int):
    """base seeded pages × `copies` near-duplicates, deterministic."""
    from pyspark.sql import functions as F

    from data_quality_spark.schema import synthesize_pages

    pages = synthesize_pages(spark, base).select(
        F.col("url"), F.col("text")
    )
    dup = pages.select(
        "url",
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy"),
    )
    # per-copy mutation: a distinct leading token + drop the copy-th word —
    # small enough that intra-family Jaccard stays above the 0.7 verify
    # threshold, so the pair set is dense (the regime under test)
    words = F.split(F.col("text"), " ")
    mutated = F.concat(
        F.format_string("c%d ", F.col("copy")),
        F.array_join(
            F.filter(words, lambda w, i: i != F.col("copy")),
            " ",
        ),
    )
    return dup.select(
        F.concat_ws("#", F.col("url"), F.col("copy").cast("string")).alias("doc_id"),
        mutated.alias("text"),
    )


def shuffle_write_bytes(app_id: str) -> int:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", type=int, default=2000)
    p.add_argument("--copies", type=int, default=10)
    p.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    a = p.parse_args()

    from pyspark.sql import functions as F

    from data_quality_spark.operators.dedup import minhash_near_duplicates
    from data_quality_spark.session import get_spark

    spark = get_spark(
        app_name="dqs-dup-heavy",
        master=f"local[{a.cores}]",
        extra_conf={
            # the no-broadcast regime: at 10^12 docs the candidate-pair and
            # signature relations exceed any broadcast threshold, so disable
            # broadcasts at both the planner and the AQE re-planner
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(spark, a.base, a.copies).persist()
    n_docs = corpus.count()

    def run() -> tuple[float, int]:
        t0 = time.perf_counter()
        pairs = minhash_near_duplicates(
            corpus, "text", "doc_id", threshold=0.7, persist_signatures=True
        )
        n_pairs = pairs.count()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        corpus.persist()  # clearCache drops the corpus too; re-pin it
        corpus.count()
        return dt, n_pairs

    cold_sec, n_pairs = run()
    # two warm reps, best kept: the shared host has multi-second noise
    # windows (±3×) that a single rep can land in
    base_shuffle = shuffle_write_bytes(spark.sparkContext.applicationId)
    warm_sec, n_pairs2 = run()
    warm_shuffle = shuffle_write_bytes(spark.sparkContext.applicationId) - base_shuffle
    warm2_sec, n_pairs3 = run()
    warm_sec = min(warm_sec, warm2_sec)
    assert n_pairs == n_pairs2 == n_pairs3, (n_pairs, n_pairs2, n_pairs3)

    result = {
        "metric": "minhash_dup_heavy_no_broadcast",
        "docs": n_docs,
        "base_docs": a.base,
        "copies": a.copies,
        "verified_pairs": n_pairs,
        "cold_sec": round(cold_sec, 2),
        "warm_sec": round(warm_sec, 2),
        "warm_shuffle_mb": round(warm_shuffle / 1e6, 1),
        "cores": a.cores,
        "docs_per_sec": round(n_docs / warm_sec, 1),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "dup_heavy_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
