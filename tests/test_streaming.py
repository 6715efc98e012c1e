"""Streaming pipeline: availableNow batch-equivalence + windowed metrics +
restart/exactly-once via the sink checkpoint."""

import pyspark.sql.functions as F

from data_quality_spark.pipeline import apply_quality_pipeline, output_columns
from data_quality_spark.schema import synthesize_pages
from data_quality_spark.streaming.pipeline import (
    read_pages_stream,
    run_stream_once,
    streaming_quality,
    windowed_rule_metrics,
)


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    synthesize_pages(spark, 300, partitions=3).write.parquet(in_dir)

    run_stream_once(spark, in_dir, out_dir, ck_dir)

    got = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    want = {
        r["url"]: r
        for r in apply_quality_pipeline(spark.read.parquet(in_dir))
        .select(*output_columns())
        .collect()
    }
    assert set(got) == set(want) and len(got) == 300
    for url in want:
        assert got[url]["keep"] == want[url]["keep"]
        assert got[url]["scrubbed_text"] == want[url]["scrubbed_text"]

    # restart with nothing new → no duplicates (exactly-once via commit log)
    run_stream_once(spark, in_dir, out_dir, ck_dir)
    assert spark.read.parquet(out_dir).count() == 300

    # new files arrive → only the delta is appended
    synthesize_pages(spark, 40, seed=77, partitions=1).write.mode("append").parquet(in_dir)
    run_stream_once(spark, in_dir, out_dir, ck_dir)
    assert spark.read.parquet(out_dir).count() == 340


def test_windowed_metrics(spark, tmp_path):
    in_dir = str(tmp_path / "in2")
    synthesize_pages(spark, 200, partitions=2).write.parquet(in_dir)
    stream = streaming_quality(read_pages_stream(spark, in_dir))
    metrics = windowed_rule_metrics(stream, window="1 hour", watermark="2 hours")
    # complete mode: emit every window's current state (append mode would
    # withhold windows the watermark hasn't closed — with a single in-flight
    # window that's everything)
    q = (
        metrics.writeStream.format("memory")
        .queryName("win_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_metrics").collect()
    assert len(rows) >= 1
    total = sum(r["rows_total"] for r in rows)
    assert total > 0
    for r in rows:
        assert 0 <= r["kept_total"] <= r["rows_total"]
        assert r["non_empty_pass"] <= r["rows_total"]


def test_stream_dedup_matches_batch(spark, tmp_path):
    from data_quality_spark.operators.urltools import canonical_url
    from data_quality_spark.streaming.pipeline import dedup_pages_stream

    in_dir = str(tmp_path / "in3")
    base = synthesize_pages(spark, 150, partitions=2)
    # recrawl copies: same pages under tracking-param + fragment variants
    dup = base.withColumn("url", F.concat("url", F.lit("?utm_source=feed#x")))
    base.union(dup).write.parquet(in_dir)

    stream = dedup_pages_stream(read_pages_stream(spark, in_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT canonical_url FROM dedup_stream").collect()
    keys = [r["canonical_url"] for r in got]
    # one row per canonical key, matching the batch dedup
    want = (
        spark.read.parquet(in_dir)
        .select(canonical_url(F.col("url")).alias("c"))
        .distinct()
        .count()
    )
    assert len(keys) == len(set(keys)) == want == 150
