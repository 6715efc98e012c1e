"""End-to-end quality-filter pipeline: rules → langid → perplexity → scrub →
decide, composed as ONE logical plan (single scan; Catalyst collapses the
projections; the two pandas UDFs run in one ArrowEvalPython stage each).

spark-submit entry:
    spark-submit --py-files dq.zip -m data_quality_spark.pipeline \
        --input <pages parquet/iceberg> --output <dir> [--buckets 64]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import decide, rules, scrub
from .analyze import with_analysis
from .session import get_spark


def apply_quality_pipeline(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → + rule_*, lang_detected, ppl,
    scrubbed_text, keep, reasons.

    Column-pruning note: `html` is never referenced, so the parquet scan
    never reads it (verified via .explain ReadSchema) — critical at 100 TB.
    """
    df = with_analysis(pages, text_col)          # ONE Arrow pass: features+lang+ppl
    df = rules.attach_rules(df, text_col=text_col)
    df = df.drop("lang_conf")
    df = df.withColumn("scrubbed_text", scrub.scrub_expr(F.col(text_col)))
    df = decide.with_decision(df)
    return df


def output_columns() -> list[str]:
    return [
        "url",
        "warc_ts",
        "lang",
        "lang_detected",
        "ppl",
        "keep",
        "reasons",
        "scrubbed_text",
        *[f"rule_{n}" for n in rules.RULE_NAMES],
    ]


def run(
    input_path: str,
    output_path: str,
    buckets: int = 0,
    master: str | None = None,
    bucket_concurrency: int = 1,
) -> dict:
    """Batch entry point.  With buckets>0, runs resumable per-bucket commits
    (see checkpoint.py; `bucket_concurrency` > 1 keeps a big cluster
    saturated by running that many bucket jobs at once); otherwise a
    single write."""
    spark = get_spark(app_name="dq-pipeline", master=master)
    pages = spark.read.parquet(input_path)
    if buckets > 0:
        from .checkpoint import run_with_checkpoint

        return run_with_checkpoint(
            spark, pages, output_path, n_buckets=buckets, max_concurrency=bucket_concurrency
        )
    from .metrics import observe_rule_metrics

    out = apply_quality_pipeline(pages).select(*output_columns())
    out, obs = observe_rule_metrics(out)
    out.write.mode("overwrite").partitionBy("keep").parquet(output_path)
    return dict(obs.get)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--buckets", type=int, default=0)
    p.add_argument("--bucket-concurrency", type=int, default=1)
    p.add_argument("--master", default=None)
    a = p.parse_args()
    metrics = run(
        a.input, a.output, buckets=a.buckets, master=a.master,
        bucket_concurrency=a.bucket_concurrency,
    )
    print(metrics)


if __name__ == "__main__":
    main()
