"""Kill/resume: a restarted job skips committed buckets and produces
identical final output (SURVEY.md §5 resume-from-checkpoint test)."""

import pytest

from data_quality_spark.checkpoint import (
    completed_buckets,
    load_progress,
    run_with_checkpoint,
)
from data_quality_spark.schema import synthesize_pages

N_BUCKETS = 4


def test_kill_and_resume(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    pages = synthesize_pages(spark, 400, partitions=4)

    # first run: crash injected after bucket 1 commits
    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_checkpoint(spark, pages, out_dir, n_buckets=N_BUCKETS, fail_after_bucket=1)
    assert completed_buckets(out_dir, N_BUCKETS) == [0, 1]

    # resume: buckets 0-1 skipped (no recompute), 2-3 processed
    summary = run_with_checkpoint(spark, pages, out_dir, n_buckets=N_BUCKETS)
    assert summary["skipped_buckets"] == [0, 1]
    assert summary["processed_buckets"] == [2, 3]

    # lineage/progress table has one row per bucket with metrics
    progress = load_progress(out_dir, N_BUCKETS)
    assert len(progress) == N_BUCKETS
    assert all("metrics" in p and p["metrics"]["rows_total"] > 0 for p in progress)
    # two lineage ids: the crashed run and the resume
    assert len({p["lineage_id"] for p in progress}) == 2

    # final output identical to a single-shot run
    resumed = spark.read.parquet(f"{out_dir}/bucket=*").select("url", "keep", "scrubbed_text")
    single_dir = str(tmp_path / "single")
    run_with_checkpoint(spark, pages, single_dir, n_buckets=1)
    single = spark.read.parquet(f"{single_dir}/bucket=*").select("url", "keep", "scrubbed_text")
    a = {r["url"]: (r["keep"], r["scrubbed_text"]) for r in resumed.collect()}
    b = {r["url"]: (r["keep"], r["scrubbed_text"]) for r in single.collect()}
    assert a == b


def test_concurrent_buckets_same_output(spark, tmp_path):
    """max_concurrency>1 must produce byte-equivalent committed output and
    identical per-bucket metrics to the serial loop."""
    from data_quality_spark.checkpoint import load_progress, run_with_checkpoint
    from data_quality_spark.schema import synthesize_pages

    pages = synthesize_pages(spark, 400)
    serial_dir, conc_dir = str(tmp_path / "serial"), str(tmp_path / "conc")
    run_with_checkpoint(spark, pages, serial_dir, n_buckets=4)
    summary = run_with_checkpoint(spark, pages, conc_dir, n_buckets=4, max_concurrency=4)
    assert summary["processed_buckets"] == [0, 1, 2, 3]

    def metrics(d):
        return {
            row["bucket"]: row["metrics"] for row in load_progress(d, 4)
        }

    assert metrics(serial_dir) == metrics(conc_dir)
    a = spark.read.parquet(f"{serial_dir}/bucket=*").orderBy("url").collect()
    b = spark.read.parquet(f"{conc_dir}/bucket=*").orderBy("url").collect()
    assert a == b
