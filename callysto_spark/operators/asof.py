"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the scalable union-sort pattern rather than
``pd.merge_asof`` per group: tag both sides, union, then one window
``last(..., ignorenulls=True)`` ordered by time within each key. This is
a SINGLE shuffle on the join key and never materializes the (left ×
right-history) blow-up an inequality join would produce; it survives
100× scale-up as long as the key space does (skewed keys: AQE/salting).

Reference analog: callysto users do per-key lookups of "latest state"
inside agent closures against `CTable` (reference
`callysto/src/types/table.rs:81-91`); this is the declarative batch
equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) for the same key.

    Ties on the right side at equal ``right_ts`` resolve by the LAST row
    in ``right_cols`` order-of-union — callers needing total determinism
    should pre-dedup the right side to one row per (key, ts).

    NULL timestamps follow SQL ASOF JOIN semantics (a comparison with
    NULL matches nothing): right rows with NULL ``right_ts`` are dropped
    — ranked instead, Spark's NULLS FIRST would make an untimed right
    row the "earliest known state" for the whole key — and left rows
    with NULL ``left_ts`` are kept with NULL attachments (they sort
    before every timed right row, so ``last(ignorenulls)`` sees none).
    """
    right_cols = list(right_cols or [c for c in right.columns if c not in on and c != right_ts])
    # SQL join semantics: NULL keys match nothing. The union-sort window
    # would instead co-partition NULL-keyed left AND right rows together
    # (window partitioning treats NULLs as equal), handing NULL-key left
    # rows the NULL-key right history. Dropping NULL-key right rows
    # restores equi-join behavior; NULL-key left rows then sit in a
    # partition with no right rows and surface with NULL attachments.
    null_filter = F.lit(True)
    for key_col in on:
        null_filter = null_filter & F.col(key_col).isNotNull()
    right = right.filter(F.col(right_ts).isNotNull() & null_filter)

    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))

    # Right attributes travel as ONE struct, not per-column: a matched
    # right row with a legitimately NULL attribute must be attached
    # verbatim (SQL ASOF returns the row), whereas independent
    # per-column last(ignorenulls) would fill that NULL from an OLDER
    # right row — a chimera combining two rows. A struct with NULL
    # fields is itself non-null, so last(struct, ignorenulls) picks the
    # whole matched row atomically.
    r_struct_t = rt.select(F.struct(*[F.col(c) for c in right_cols]).alias("__r")).schema[
        "__r"
    ].dataType
    l_aug = lt.select(
        *on, "__ts", "__side",
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.struct(*[c for c in left.columns]).alias("__l"),
    )
    r_aug = rt.select(
        *on, "__ts", "__side",
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        F.lit(None).cast(l_aug.schema["__l"].dataType).alias("__l"),
    )
    unioned = l_aug.unionByName(r_aug)

    # Right rows sort before left rows at the same timestamp unless strict:
    # order by (ts, side) makes last() at the left row see right rows with
    # right_ts <= left_ts. For strict, flip so equal-ts right rows come after.
    order = [F.col("__ts"), F.col("__side")] if not strict else [F.col("__ts"), (1 - F.col("__side"))]
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__f")
    )
    out = filled.filter(F.col("__side") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__f.{c}").alias(c) for c in right_cols],
    )
    return out
