"""Iceberg catalog wiring (sources/iceberg.py): conf mapping, availability
probe, and the graceful parquet fallback — the north star names Iceberg
tables, the sandbox has no runtime jar, and the same CLI must work in
both environments."""

import os

from data_quality_spark.sources.iceberg import (
    iceberg_available,
    iceberg_conf,
    read_pages,
    write_output,
)


def test_iceberg_conf_shape():
    conf = iceberg_conf("prod", "s3://bucket/wh", "rest")
    assert conf["spark.sql.catalog.prod"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.prod.type"] == "rest"
    assert conf["spark.sql.catalog.prod.warehouse"] == "s3://bucket/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_iceberg_absent_in_sandbox(spark):
    # the probe must answer (not raise) so the CLI can degrade gracefully
    assert iceberg_available(spark) is False


def test_parquet_fallback_roundtrip(spark, tmp_path):
    """read_pages/write_output in parquet mode are the same I/O the
    pipeline always used; the seam must not change semantics."""
    from data_quality_spark.schema import synthesize_pages

    src = str(tmp_path / "pages")
    dst = str(tmp_path / "out")
    synthesize_pages(spark, 50).write.parquet(src)
    df = read_pages(spark, src, "parquet")
    assert df.count() == 50
    write_output(df.withColumn("keep", df.lang.isNotNull()), dst, "parquet", ["keep"])
    assert any(p.startswith("keep=") for p in os.listdir(dst))


def test_cli_iceberg_flag_falls_back(tmp_path):
    """`--format iceberg` without the runtime jars must warn and produce
    the SAME output as the parquet run (byte-identical row sets)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = str(tmp_path / "pages")
    code = (
        "from data_quality_spark.session import get_spark\n"
        "from data_quality_spark.schema import synthesize_pages\n"
        "s = get_spark(master='local[4]'); s.sparkContext.setLogLevel('ERROR')\n"
        f"synthesize_pages(s, 120).write.parquet({src!r})\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd=repo)
    outs = {}
    for fmt in ("parquet", "iceberg"):
        dst = str(tmp_path / f"out_{fmt}")
        r = subprocess.run(
            [
                sys.executable, "-m", "data_quality_spark.pipeline",
                "--input", src, "--output", dst,
                "--master", "local[4]", "--format", fmt,
            ],
            capture_output=True,
            text=True,
            cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        if fmt == "iceberg":
            assert "falling back to parquet" in r.stderr
        import duckdb

        outs[fmt] = duckdb.sql(
            "SELECT url, keep, scrubbed_text FROM "
            f"read_parquet('{dst}/keep=*/*.parquet', hive_partitioning=1) ORDER BY url"
        ).fetchall()
    assert outs["parquet"] == outs["iceberg"]
