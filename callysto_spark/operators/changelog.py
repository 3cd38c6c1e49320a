"""Changelog materialization: compact a change stream into current
state.

Reference semantics (`stores/rocksdb.rs:395-447`,
`stores/inmemory.rs:185-226`): replay changelog records with
last-offset-wins per key, applying a delete when the payload is empty
(`types/table.rs:364-381` encodes deletes as empty values). This is the
same operator as Delta/Iceberg CDC compaction: one shuffle on the key,
rank by recency, keep winners, drop tombstones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F, Window


def changelog_materialize(
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    op_col: str = "op",
    delete_op: str = "delete",
    null_op_is_delete: bool = False,
) -> DataFrame:
    """Latest record per key (by ``order_by``, which must be a total
    order — offset, or (ts, seq)); keys whose latest op is ``delete_op``
    disappear. Exactly the reference's apply_changelog_batch, expressed
    as one window pass.

    NULL-op contract (default): a record whose ``op_col`` is NULL is
    NOT a delete — only an explicit ``delete_op`` tombstones a key. The
    null-naive ``op != delete_op`` filter would evaluate NULL and
    silently drop the key AND its last-known-good state (a malformed
    record acting as a tombstone); the null-safe comparison keeps it
    instead.

    ``null_op_is_delete=True`` opts into the reference's byte-level
    convention instead (`stores/inmemory.rs:195-207`,
    `rocksdb.rs:406-420`: an ABSENT payload is a tombstone): CDC feeds
    that map null payloads to a null op column should set this flag —
    or map them to ``delete_op`` upstream — so keys the reference would
    delete are deleted here too (r7 ADVICE)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    tombstone = F.col(op_col).eqNullSafe(delete_op)
    if null_op_is_delete:
        tombstone = tombstone | F.col(op_col).isNull()
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & ~tombstone)
        .drop("__rn")
    )
