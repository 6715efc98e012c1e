"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet
dir, compare row count, column names, and exact sorted values."""

from __future__ import annotations

import math
import os


def run_oracle(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(spark, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of problems ([] = parity)."""
    problems = []
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    ocols, orows = run_oracle(sql, sf_dir)
    ocols_sorted = sorted(ocols)
    if scols != ocols_sorted:
        problems.append(f"{name}: columns differ spark={scols} oracle={ocols_sorted}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"{name}: rowcount spark={len(srows)} oracle={len(orows)}")
        return problems
    sset = sorted(tuple(_norm(r[c]) for c in scols) for r in srows)
    idx = [ocols.index(c) for c in ocols_sorted]
    oset = sorted(tuple(_norm(r[i]) for i in idx) for r in orows)
    for i, (a, b) in enumerate(zip(sset, oset)):
        if a != b:
            problems.append(f"{name}: first value mismatch at sorted-row {i}: spark={a!r} oracle={b!r}")
            break
    return problems
