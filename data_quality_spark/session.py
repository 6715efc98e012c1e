"""SparkSession factory tuned for the quality-filter workload.

Scale notes (100 TB / 1000-executor target):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting — the
  first line of defense against domain-level skew in web corpora.
- Arrow on with a bounded batch size so model-backed pandas UDFs (langid,
  perplexity, scrub) stream bounded memory per task.
- shuffle.partitions sized for local[32] tests; on a real cluster this is
  overridden by --conf (AQE coalescing makes the initial number forgiving).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("DQS_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "data-quality-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("DQS_MASTER", "local[*]")
    builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # session-local timezone pinned for deterministic timestamp semantics
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("DQS_DRIVER_MEMORY", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register the driver testdata parquet files as temp views.

    Returns dict name -> DataFrame. Column pruning + predicate pushdown reach
    the parquet scan because these are plain `spark.read.parquet` relations.
    """
    if names is None:
        names = [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
