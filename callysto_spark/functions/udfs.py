"""The user-function surface (SURVEY.md §2.5 UDF/UDAF/UDTF row).

The engine's stance: built-ins first (everything in operators/ is pure
Catalyst); when Python is genuinely needed, Arrow-vectorized pandas UDFs
(scalar + grouped-agg) and Spark 4 UDTFs — never row-at-a-time Python
UDFs in a hot path (10-100× slower; reference-free claim, standard
Spark guidance).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F, types as T


@F.pandas_udf(T.DoubleType())
def zscore(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: z-score within the Arrow batch —
    demo of the Arrow path; for exact global z-scores use mean/stddev
    window/agg built-ins instead."""
    std = v.std(ddof=0)
    if std == 0 or pd.isna(std):
        return v * 0.0
    return (v - v.mean()) / std


@F.pandas_udf(T.DoubleType())
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDF (UDAF): weighted mean — use under
    ``df.groupBy(...).agg(weighted_mean(col, w))``."""
    total = float(weights.sum())
    if total == 0:
        return float("nan")
    return float((values * weights).sum() / total)


def sentence_udtf():
    """Spark 4 Python UDTF: one row per sentence with its index — the
    table-function shape (lateral-join expansion) the reference leaves
    to hand-written loops. Returned lazily: @udtf registration requires
    an active session in some environments."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, sentence string, n_words int")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            # idx is a DENSE per-document ordinal (0..n-1): consecutive
            # terminators ("Hi!? Ok.") produce empty segments, and a
            # raw-segment enumerate would leave gaps that break idx-keyed
            # joins and max(idx)+1 counts downstream
            idx = 0
            for raw in (s.strip() for s in text.replace("!", ".").replace("?", ".").split(".")):
                if raw:
                    yield idx, raw, len(raw.split())
                    idx += 1

    return SplitSentences
