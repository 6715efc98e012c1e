"""Build dist/dq.zip for spark-submit --py-files deployment.

Usage:
    python scripts/package.py
    spark-submit --py-files dist/dq.zip --master <cluster> \
        run_pipeline.py --input <iceberg-or-parquet> --output <dir> --buckets 256
"""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "dq.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "data_quality_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    p = build_zip()
    print(p)
    print(
        "submit: spark-submit --py-files {} --master <master> "
        "-m data_quality_spark.pipeline --input <in> --output <out> --buckets 256".format(p)
    )
