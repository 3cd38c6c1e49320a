"""Exactly-once sink adapter.

The reference declares a ProcessingGuarantee enum but its exactly-once
path is ``todo!()`` (`types/table.rs:149-159`). On Spark the contract
is: checkpoint guarantees each batch_id is delivered at least once with
identical content; making the SINK idempotent per batch_id yields
end-to-end exactly-once. This adapter provides the idempotency: a
commit-marker directory records completed batch ids, and replayed
batches are skipped.

For transactional targets (JDBC with a txn, Delta) prefer committing
``(batch_id)`` inside the same transaction; the marker-dir variant works
for any filesystem-visible sink.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent(
    write: Callable[[DataFrame, int], None],
    marker_dir: str,
    keep_markers: int = 100,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch writer so replayed batch_ids are no-ops.

    Markers are PRUNED to the newest ``keep_markers`` ids after each
    commit: Spark's checkpoint only ever replays the most recent
    uncommitted batch, so older markers are dead weight — a 1s-trigger
    query would otherwise accrete ~86k tiny files/day in one directory
    until listing and inodes hurt. ``keep_markers`` is a generous
    safety margin over the single replayed batch, not a tunable
    correctness knob."""
    os.makedirs(marker_dir, exist_ok=True)

    def wrapped(df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return
        write(df, batch_id)
        # marker write is the commit point: crash before → batch replays
        # and overwrites/duplicates are the writer's idempotency concern;
        # crash after → replay skipped entirely.
        with open(marker, "w") as fh:
            fh.write("ok")
        # prune strictly OLDER ids than the retention window; a crash
        # mid-prune is safe (replay skips via the marker just written)
        floor = batch_id - keep_markers
        if floor > 0:
            for name in os.listdir(marker_dir):
                if name.startswith("batch-") and name.endswith(".done"):
                    try:
                        bid = int(name[len("batch-") : -len(".done")])
                    except ValueError:
                        continue
                    if bid < floor:
                        try:
                            os.remove(os.path.join(marker_dir, name))
                        except FileNotFoundError:
                            pass

    return wrapped
