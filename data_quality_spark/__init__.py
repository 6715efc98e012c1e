"""data_quality_spark — a PySpark-native data-quality / web-text quality-filter engine.

A from-scratch re-expression of the capabilities of the Talend Data Quality
libraries (reference: coheigea/data-quality) as idiomatic Spark DataFrame
pipelines: per-column quality classification, type inference, pattern
profiling, statistics sketches, validation rules, normalization/scrubbing,
record matching/dedup, survivorship, sampling — plus the web-scale
training-data operations (language-ID, perplexity filtering, heuristic
quality rules, PII/toxicity scrub, MinHash/SimHash dedup, ANN similarity
search) that a 100 TB Common-Crawl-style pipeline needs.

Design principles (see SURVEY.md §7):
- declare plans with the DataFrame API; let Catalyst/Tungsten optimize
- built-in `pyspark.sql.functions` in hot paths; Arrow pandas UDFs only
  where a model or compiled-regex chain genuinely needs Python
- every operator is a pure function of its input rows (deterministic under
  repartitioning); all aggregation state is mergeable (partial agg friendly)
"""

__version__ = "0.1.0"
