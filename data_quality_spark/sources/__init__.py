"""Sources / sinks (reference §2.10 — the reference is host-embedded and
has almost none; we provide the Spark-native equivalents)."""
