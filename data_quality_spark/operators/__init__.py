"""DataFrame-level operators (profiling, quality, dedup, matching, sampling…)."""
