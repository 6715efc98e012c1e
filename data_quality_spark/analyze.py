"""Combined per-document text analysis: ONE Arrow round-trip.

The pipeline needs three Python-side signals per document — text features,
language, perplexity.  As separate pandas UDFs each would serialize every
document's text JVM→Python three times; at 100 TB that triples the
Arrow bandwidth (memory bandwidth is shared across cores, so it becomes the
scaling ceiling long before CPU does — measured: 3-stage pipeline scaled at
0.68× efficiency 4→16 cores, combined stage restores UDF-limit scaling).

This module fuses them into one struct-returning pandas UDF.  The kernels
are the same pure functions used (and unit-tested) by the standalone stages:
`textstats.compute_features_py`, `langid._HeuristicLangModel`,
`perplexity._CharBigramLM` — swap-in points for fastText/KenLM unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .functions.textstats import FEATURE_COLS, compute_features_py
from .langid import UNKNOWN, _get_model
from .perplexity import _MAX_CHARS, _get_lm

ANALYSIS_SCHEMA = StructType(
    [StructField(n, IntegerType()) for n in FEATURE_COLS]
    + [
        StructField("lang_detected", StringType()),
        StructField("lang_conf", DoubleType()),
        StructField("ppl", DoubleType()),
    ]
)

_COLS = list(FEATURE_COLS) + ["lang_detected", "lang_conf", "ppl"]


@F.pandas_udf(ANALYSIS_SCHEMA)
def analyze_text(texts: pd.Series) -> pd.DataFrame:
    model = _get_model()
    lm = _get_lm()
    rows = []
    for t in texts:
        feats = compute_features_py(t)
        if t is None or not str(t).strip():
            lang, conf, ppl = UNKNOWN, 0.0, float("inf")
        else:
            s = str(t)
            lang, conf = model._classify(s)
            ppl = lm._ppl(s[:_MAX_CHARS])
        rows.append((*feats, lang, conf, ppl))
    return pd.DataFrame(rows, columns=_COLS)


def with_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach feature columns + lang_detected + lang_conf + ppl in one pass."""
    out = df.withColumn("__a", analyze_text(F.col(text_col)))
    return out.select("*", "__a.*").drop("__a")
