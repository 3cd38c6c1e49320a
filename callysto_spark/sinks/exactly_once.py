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
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch writer so replayed batch_ids are no-ops."""
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

    return wrapped
