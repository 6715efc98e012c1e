"""README's query/oracle counts must match the live registry (ADVICE r4:
the hand-written numbers drifted 77/75 vs an actual 82/80)."""

import re
from pathlib import Path

from data_quality_spark.queries import ORACLES, QUERIES


def test_readme_counts_match_registry():
    readme = Path(__file__).resolve().parents[1].joinpath("README.md").read_text()
    m = re.search(
        r"exposes (\d+) queries; \*\*(\d+) have exact DuckDB oracle", readme
    )
    assert m, "README correctness section reworded — update this test's regex"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries, registry has {len(QUERIES)}"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"README says {m.group(2)} oracles, registry has {len(ORACLES)}"
    )


def test_every_query_has_oracle_or_is_whitelisted_approximate():
    approximate = {"cardinality_hll", "quantiles_approx_lquantity"}
    missing = set(QUERIES) - set(ORACLES)
    assert missing == approximate, f"oracle-less queries changed: {sorted(missing)}"
