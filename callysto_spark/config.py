"""Client-config surface (reference `callysto/src/config.rs:16-161`,
`kafka/enums.rs:5-161`, SURVEY.md §2.4 L11).

The reference exposes a typed Kafka config (processing guarantee, offset
reset, auto-commit, isolation level, fetch tuning, security). Spark's
Kafka source takes ``kafka.*`` passthrough options plus a few
source-level ones — this module is the explicit mapping, so a Callysto
user's config translates mechanically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class ProcessingGuarantee(str, Enum):
    """Reference `kafka/enums.rs:6-9` — EOS there is `todo!()`
    (`types/table.rs:149-159`); on Spark BOTH modes are real:
    at-least-once = foreachBatch with non-idempotent sink; exactly-once =
    checkpoint + idempotent/transactional sink."""

    AT_LEAST_ONCE = "at_least_once"
    EXACTLY_ONCE = "exactly_once"


class OffsetReset(str, Enum):
    EARLIEST = "earliest"
    LATEST = "latest"


class IsolationLevel(str, Enum):
    READ_UNCOMMITTED = "read_uncommitted"
    READ_COMMITTED = "read_committed"


_ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_HDFS_PROVIDER = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


@dataclass
class StateStoreConfig:
    """State-store provider + RocksDB tuning surface.

    The reference ships a tuned RocksDB store for table state
    (`stores/rocksdb.rs:35-41`: 64 MB write buffer, 3 memtables, 2 GB
    block cache; `rocksdb.rs:56-62`: max-open-files from the process
    rlimit). Spark's analog is the bundled RocksDB state-store provider
    plus ``spark.sql.streaming.stateStore.rocksdb.*`` — this maps the
    reference's knobs onto those confs. Defaults mirror the reference's
    defaults where a Spark conf exists.

    At 100 TB the default HDFS-backed store (all state on the JVM heap)
    is the wrong answer for any large keyspace; RocksDB keeps state
    off-heap/on-disk with changelog (incremental) checkpointing.
    """

    provider: str = "rocksdb"  # "rocksdb" | "hdfs"
    # Incremental checkpointing: upload the changelog instead of full
    # snapshots (the reference's changelog-topic durability, table.rs:59-62).
    changelog_checkpointing: bool = True
    compact_on_commit: bool = False
    write_buffer_size_mb: int | None = 64  # rocksdb.rs:35 DEFAULT_WRITE_BUFFER_SIZE
    max_write_buffer_number: int | None = 3  # rocksdb.rs:36
    block_cache_size_mb: int | None = 2048  # rocksdb.rs:38 DEFAULT_BLOCK_CACHE_SIZE
    max_open_files: int | None = -1  # rocksdb.rs:56-62 rlimit-derived; -1 = unlimited
    bounded_memory_usage: bool = True  # cap total off-heap across stores
    track_total_rows: bool = True  # per-batch numRowsTotal metrics
    extra: dict[str, str] = field(default_factory=dict)

    def to_spark_conf(self) -> dict[str, str]:
        conf: dict[str, str] = {
            "spark.sql.streaming.stateStore.providerClass": (
                _ROCKSDB_PROVIDER if self.provider == "rocksdb" else _HDFS_PROVIDER
            )
        }
        if self.provider == "rocksdb":
            r = "spark.sql.streaming.stateStore.rocksdb."
            conf[r + "changelogCheckpointing.enabled"] = str(self.changelog_checkpointing).lower()
            conf[r + "compactOnCommit"] = str(self.compact_on_commit).lower()
            conf[r + "boundedMemoryUsage"] = str(self.bounded_memory_usage).lower()
            conf[r + "trackTotalNumberOfRows"] = str(self.track_total_rows).lower()
            if self.write_buffer_size_mb is not None:
                conf[r + "writeBufferSizeMB"] = str(self.write_buffer_size_mb)
            if self.max_write_buffer_number is not None:
                conf[r + "maxWriteBufferNumber"] = str(self.max_write_buffer_number)
            if self.block_cache_size_mb is not None:
                conf[r + "blockCacheSizeMB"] = str(self.block_cache_size_mb)
            if self.max_open_files is not None:
                conf[r + "maxOpenFiles"] = str(self.max_open_files)
        conf.update(self.extra)
        return conf

    def apply(self, spark) -> None:
        """Set on a live session: the provider is read from session conf
        at stream start, so this takes effect for queries started after."""
        for k, v in self.to_spark_conf().items():
            spark.conf.set(k, v)


@dataclass
class ConsumerConfig:
    """Typed consumer config → Spark Kafka source options.

    Field-by-field parity with the reference's defaults
    (`config.rs:133-161`). Auto-commit has no Spark equivalent by
    design: the checkpoint owns offsets (subsumes the reference's manual
    `Context::commit`, `types/context.rs:70-94`).
    """

    bootstrap_servers: str = "localhost:9092"
    auto_offset_reset: OffsetReset = OffsetReset.EARLIEST
    isolation_level: IsolationLevel = IsolationLevel.READ_UNCOMMITTED
    max_partition_fetch_bytes: int = 1024 * 1024  # config.rs:139
    fetch_max_wait_ms: int = 1500  # config.rs:141 fetch.wait.max.ms
    session_timeout_ms: int = 60_000  # config.rs:143
    max_poll_interval_ms: int = 300_000
    max_offsets_per_trigger: int | None = None  # backpressure (Spark-side)
    min_partitions: int | None = None  # fan tasks wider than kafka partitions
    security: dict[str, str] = field(default_factory=dict)  # ssl/sasl passthrough
    extra: dict[str, str] = field(default_factory=dict)

    def to_source_options(self, topic: str) -> dict[str, str]:
        opts = {
            "subscribe": topic,
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "startingOffsets": self.auto_offset_reset.value,
            "kafka.isolation.level": self.isolation_level.value,
            "kafka.max.partition.fetch.bytes": str(self.max_partition_fetch_bytes),
            "kafka.fetch.max.wait.ms": str(self.fetch_max_wait_ms),
            "kafka.session.timeout.ms": str(self.session_timeout_ms),
            "kafka.max.poll.interval.ms": str(self.max_poll_interval_ms),
        }
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        if self.min_partitions is not None:
            opts["minPartitions"] = str(self.min_partitions)
        # route through the one source-level whitelist (descriptors.py):
        # a prefix heuristic misroutes real CLIENT configs that happen to
        # start with max/min/... (max.poll.records would be emitted as an
        # unknown source option Spark silently ignores)
        from callysto_spark.sources.descriptors import kafka_option_key

        for k, v in {**self.security, **self.extra}.items():
            opts[kafka_option_key(k)] = v
        return opts
