"""Gap-based sessionization as a batch operator.

Streaming uses the native ``session_window``; in batch we derive session
ids with lag + a running sum of gap-breaks — one shuffle on the user
key, window exec after, fully codegen'd (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign per-key session numbers (1-based) where a gap greater than
    ``gap_seconds`` between consecutive events starts a new session.
    ``ts`` ordering must be made total by event uniqueness per (key, ts);
    equal timestamps fall in the same session either way.

    Rows with a NULL ``ts`` are dropped: an untimed event has no place
    in a gap-based timeline, and ranking it instead would diverge
    between engines (Spark windows put NULLS FIRST where DuckDB puts
    them LAST) AND poison the lag-gap of every later event in the key.
    """
    df = df.filter(F.col(ts).isNotNull())
    w = Window.partitionBy(key).orderBy(F.col(ts))
    # Microsecond epochs, not cast-to-long SECONDS: the long cast
    # truncates sub-second components, so a true gap of 1800.8s would
    # read as 1800 and fuse two sessions (and diverge from a SQL oracle
    # comparing epoch_us). Bouncing through timestamp keeps NTZ input
    # instant-preserving under a UTC session.
    epoch = F.unix_micros(F.col(ts).cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
