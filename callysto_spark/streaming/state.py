"""Keyed, durable state: the reference's `CTable` re-expressed as Spark
keyed state.

Reference semantics (`callysto/src/types/table.rs`): a partitioned KV
table whose writes dual-write to a compacted changelog topic
(`{app}-{table}-changelog`, `table.rs:59-62`), replayed on startup by a
recovery service (`runtime/recovery.rs:51-99`). Spark gives the same
durability contract from the checkpoint + state store (RocksDB provider
at scale: ``spark.sql.streaming.stateStore.providerClass``), with
recovery automatic — so get/set/del (`table.rs:81-113`) map to
GroupState get/update/remove, and the whole T4-T9 recovery machinery of
SURVEY.md §2.3 is configuration, not code.

Keying delta (documented in SURVEY.md §3.2): the reference keys state
physically by Kafka partition and lets users pick arbitrary KV within
it; Spark keys by the groupBy expression — strictly finer-grained, same
logical content.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd


@dataclass
class CTable:
    """Declarative table: key columns + state schema (DDL strings)."""

    name: str
    key_schema: str  # e.g. "parity string" — the groupBy columns
    value_schema: str  # state struct DDL, e.g. "cnt long, total double"
    output_schema: str | None = None  # rows emitted by the table agent
    data: dict = field(default_factory=dict)  # batch-mode/in-driver mirror

    @property
    def key_cols(self) -> list[str]:
        return [c.strip().split()[0] for c in self.key_schema.split(",")]


class TableState:
    """get/set/del parity shim over Spark's GroupState
    (reference `types/table.rs:81-113`), plus the TTL surface the
    reference lacks: processing/event-time timeouts for state eviction
    (SURVEY.md §7 risk register: TTL semantics)."""

    def __init__(self, group_state: Any) -> None:
        self._gs = group_state

    def get(self) -> tuple | None:
        if not self._gs.exists:
            return None
        return self._gs.get

    def set(self, *values: Any) -> None:
        self._gs.update(tuple(values))

    def delete(self) -> None:
        self._gs.remove()

    @property
    def exists(self) -> bool:
        return self._gs.exists

    @property
    def timed_out(self) -> bool:
        """True when this invocation is a timeout callback (no new rows;
        decide whether to emit/evict)."""
        return bool(self._gs.hasTimedOut)

    def set_timeout_ms(self, ms: int) -> None:
        """Arm a processing-time timeout (requires the table agent to be
        registered with timeout='ProcessingTimeTimeout')."""
        self._gs.setTimeoutDuration(ms)

    def set_timeout_timestamp_ms(self, epoch_ms: int) -> None:
        """Arm an event-time timeout (requires timeout='EventTimeTimeout'
        and a watermark on the stream)."""
        self._gs.setTimeoutTimestamp(epoch_ms)


def bind_table_agent(
    table: CTable,
    fn: Callable[[tuple, pd.DataFrame, TableState], pd.DataFrame | None],
    timeout: str = "NoTimeout",
):
    """Bind a user closure to a table → streaming transform builder.

    The closure sees (key, micro-batch rows for that key as pandas,
    TableState) and may return output rows — the
    `Fn(Option<OwnedMessage>, Tables, Context)` shape of the reference's
    table agents (`types/table_agent.rs:26-103`), batched.
    """

    def build(df):
        def wrapped(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
            ts = TableState(state)
            got_rows = False
            for pdf in pdfs:
                got_rows = True
                out = fn(key, pdf, ts)
                if out is not None and len(out):
                    yield out
            if not got_rows:
                # DEFENSE-IN-DEPTH, normally unreachable: PySpark 4.1.2
                # delivers a timed-out key as one EMPTY pandas batch, so
                # the timeout invocation flows through the loop above
                # (fn sees empty pdf + state.timed_out) — do not put
                # timeout-only logic here; this branch only fires if a
                # future runner stops synthesizing that empty batch
                out = fn(key, pd.DataFrame(), ts)
                if out is not None and len(out):
                    yield out

        return df.groupBy(*table.key_cols).applyInPandasWithState(
            wrapped,
            outputStructType=table.output_schema or table.value_schema,
            stateStructType=table.value_schema,
            outputMode="update",
            timeoutConf=timeout,
        )

    return build
