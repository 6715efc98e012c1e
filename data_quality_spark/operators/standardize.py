"""Standardization — the reference's Lucene synonym-index path (SURVEY §2.7)
re-expressed with broadcast dictionaries.

Reference: `SynonymIndexSearcher` looks a word up in a Lucene index mapping
word→synonyms with fuzzy `maxEdits` matching
(`standardization/index/SynonymIndexSearcher.java:172-237`);
`FirstNameStandardize` replaces a value by its standard form
(`standardization/query/FirstNameStandardize.java:102-156`).

Spark design: the synonym table is small by definition (it fits an index on
one node in the reference), so it becomes a **broadcast map**:
- exact standardization = `element_at(map, lower(col))` — pure expression,
  no join, no shuffle;
- fuzzy standardization = broadcast join against the distinct dictionary
  keys on a levenshtein bound (candidate space = dict size × distinct
  values, never corpus × dict).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _synonym_to_standard(synonyms: dict[str, list[str]]) -> dict[str, str]:
    """Invert standard→synonyms to synonym→standard (all lower-cased);
    standards map to themselves."""
    out: dict[str, str] = {}
    for std, syns in synonyms.items():
        out[std.lower()] = std
        for s in syns:
            out[s.lower()] = std
    return out


def standardize_expr(col: Column, synonyms: dict[str, list[str]]) -> Column:
    """Exact lookup: value → standard form, original kept when unknown
    (SynonymReplaceAction semantics).  The literal map is broadcast with
    the plan — zero shuffle."""
    lookup = _synonym_to_standard(synonyms)
    pairs = []
    for k, v in sorted(lookup.items()):
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    return F.coalesce(m.getItem(F.lower(col)), col)


def standardize_fuzzy(
    df: DataFrame,
    column: str,
    synonyms: dict[str, list[str]],
    max_edits: int = 1,
    out_col: str | None = None,
) -> DataFrame:
    """Exact map hit first; else nearest dictionary key within `max_edits`
    (Lucene fuzzy query analog, deterministic tiebreak: smallest distance,
    then shortest key, then lexicographic).

    Plan shape: distinct values (small) ⨝ broadcast dict keys → best match →
    broadcast the (value→standard) result back onto the corpus.  The corpus
    itself never shuffles.
    """
    out_col = out_col or f"{column}_std"
    lookup = _synonym_to_standard(synonyms)
    spark = df.sparkSession
    dict_df = spark.createDataFrame(
        [(k, v) for k, v in lookup.items()], "syn string, std string"
    )
    values = df.select(F.lower(F.col(column)).alias("val")).distinct()
    cand = (
        values.crossJoin(F.broadcast(dict_df))
        .withColumn("dist", F.levenshtein(F.col("val"), F.col("syn")))
        .filter(F.col("dist") <= max_edits)
    )
    w = Window.partitionBy("val").orderBy(
        F.asc("dist"), F.asc(F.length("syn")), F.asc("syn")
    )
    best = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("val", F.col("std").alias("__std"))
    )
    joined = df.join(
        F.broadcast(best), F.lower(F.col(column)) == F.col("val"), "left"
    ).drop("val")
    return joined.withColumn(out_col, F.coalesce(F.col("__std"), F.col(column))).drop("__std")


def standardize_record(
    df: DataFrame, mappings: dict[str, dict[str, list[str]]]
) -> DataFrame:
    """Multi-column standardization (SynonymRecordSearcher analog): apply
    each column's dictionary in one projection."""
    cols = []
    for c in df.columns:
        if c in mappings:
            cols.append(standardize_expr(F.col(c), mappings[c]).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


# --- masking (TextPatternUtil.replaceCharacter analog) ----------------------


def mask_same_class(col: Column, seed: int = 42) -> Column:
    """Masking: replace each char by a same-class substitute chosen by a
    seeded per-value hash (`common/pattern/TextPatternUtil.java:73-80` uses
    a Random; ours is hash-deterministic so masking is stable per value —
    re-identification-safe AND reproducible).

    Lower→x, upper→X, digit→hash-derived digit, everything else kept.

    The per-value digit offset derives from md5 (not xxhash64) so masking
    is reproducible in ANY engine — the driver's DuckDB oracle recomputes
    it exactly (same device as the MinHash/SimHash portable variants).
    """
    masked = F.regexp_replace(col, r"[a-z]", "x")
    masked = F.regexp_replace(masked, r"[A-Z]", "X")
    # digits: shift the whole string's digits by a per-value offset
    # (first 8 md5 hex chars as an integer, mod 10 — engine-agnostic)
    offset = (
        F.conv(F.substring(F.md5(F.concat(F.lit(str(seed)), col)), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    digits = "0123456789"
    shifted = [digits[i:] + digits[:i] for i in range(10)]
    expr = F.when(offset == 0, F.translate(masked, digits, shifted[0]))
    for i in range(1, 10):
        expr = expr.when(offset == i, F.translate(masked, digits, shifted[i]))
    return expr.otherwise(masked)
