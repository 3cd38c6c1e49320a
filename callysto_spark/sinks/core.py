"""Sinks (reference SURVEY.md §2.1 S6-S9).

The reference's sinks are buffered ``futures::Sink`` impls with
``poll_ready`` backpressure (`sinks/elasticsearch.rs:99-110`,
`sinks/postgres.rs:114-125`); in Spark the micro-batch IS the buffer and
backpressure is ``maxOffsetsPerTrigger``/trigger pacing, so every sink
here is a batch-writer callable usable both for ``df.write`` and inside
``foreachBatch`` (exactly-once via checkpoint + idempotent/transactional
writes — the guarantee the reference left ``todo!()``,
`types/table.rs:149-159`).

External-system sinks (Kafka producer `kafka/cproducer.rs:24-58`, JDBC/
Postgres `sinks/postgres.rs:24-150`, Elasticsearch
`sinks/elasticsearch.rs:22-135`) need their connector jars/servers; they
build the correct plan and fail with a clear message when the connector
is absent — the plumbing (option mapping, batching, idempotency keys) is
what the engine owns.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F


class Sink:
    def write(self, df: DataFrame, batch_id: int = 0) -> None:  # pragma: no cover
        raise NotImplementedError


def sink_to_foreach_batch(sink: "Sink") -> Callable[[DataFrame, int], None]:
    return lambda df, batch_id: sink.write(df, batch_id)


@dataclass
class ParquetSink(Sink):
    """Partitioned parquet/delta-style file sink. ``partition_by`` should
    be a low-cardinality column (date, hour) — at 100 TB this is the
    difference between object-store listing that works and one that
    doesn't."""

    path: str
    mode: str = "append"
    partition_by: tuple[str, ...] = ()

    def write(self, df: DataFrame, batch_id: int = 0) -> None:
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)


@dataclass
class MemorySink(Sink):
    """Driver-local collected rows — test parity for the reference's
    in-memory examples. Never use beyond tests (collects to driver)."""

    rows: list = field(default_factory=list)

    def write(self, df: DataFrame, batch_id: int = 0) -> None:
        self.rows.extend(df.collect())


@dataclass
class KafkaSink(Sink):
    """Keyed Kafka produce (reference `kafka/cproducer.rs:24-41`):
    key/value/partition columns map to the Kafka writer contract."""

    topic: str
    bootstrap_servers: str = "localhost:9092"
    options: dict[str, str] = field(default_factory=dict)

    def write(self, df: DataFrame, batch_id: int = 0) -> None:
        cols = [F.col("value").cast("binary").alias("value")]
        if "key" in df.columns:
            cols.insert(0, F.col("key").cast("binary").alias("key"))
        if "partition" in df.columns:
            cols.append(F.col("partition").cast("int").alias("partition"))
        out = df.select(*cols)
        try:
            (
                out.write.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option("topic", self.topic)
                .options(**self.options)
                .save()
            )
        except Exception as exc:
            raise RuntimeError(
                "Kafka sink requires the spark-sql-kafka connector jar on the classpath"
            ) from exc


@dataclass
class MemTopicSink(Sink):
    """Keyed produce to the jar-free memtopic transport (the runnable
    twin of :class:`KafkaSink`; reference `kafka/cproducer.rs:24-58`).
    Routes by crc32(key) % partitions on the EXECUTORS (foreachPartition
    — rows never funnel through the driver), appending to the topic's
    partition logs. Needs `value` (and optionally `key`) columns, same
    contract as the Kafka writer."""

    topic: str
    broker_dir: str
    n_partitions: int = 4

    def write(self, df: DataFrame, batch_id: int = 0) -> None:
        topic, broker_dir, n_parts = self.topic, self.broker_dir, self.n_partitions
        cols = [F.col("value").cast("string").alias("value")]
        has_key = "key" in df.columns
        if has_key:
            cols.insert(0, F.col("key").cast("string").alias("key"))

        def produce_partition(rows) -> None:
            from callysto_spark.sources.memtopic import produce

            msgs = [((r["key"] if has_key else None), r["value"]) for r in rows]
            if msgs:
                produce(broker_dir, topic, msgs, n_parts)

        df.select(*cols).foreachPartition(produce_partition)


@dataclass
class JdbcSink(Sink):
    """JDBC append sink (reference Postgres sink `sinks/postgres.rs`):
    pooled prepared statements → Spark's JDBC writer (per-partition
    batched inserts; `batchsize` option is the pool/buffer knob)."""

    url: str
    table: str
    mode: str = "append"
    options: dict[str, str] = field(default_factory=dict)

    def write(self, df: DataFrame, batch_id: int = 0) -> None:
        try:
            (
                df.write.mode(self.mode)
                .format("jdbc")
                .option("url", self.url)
                .option("dbtable", self.table)
                .options(**self.options)
                .save()
            )
        except Exception as exc:
            raise RuntimeError(
                "JDBC sink requires the database driver jar (e.g. postgresql.jar) on the classpath"
            ) from exc


@dataclass
class ElasticsearchSink(Sink):
    """Elasticsearch bulk-index sink (reference
    `sinks/elasticsearch.rs:112-135`: doc JSON + index(id)). Implemented
    REST-side in ``foreachBatch``: each partition posts NDJSON `_bulk`
    requests of ``bulk_size`` docs — the executor-parallel equivalent of
    the reference's buffered client, no connector jar needed."""

    index: str
    url: str = "http://localhost:9200"
    id_col: str | None = None
    bulk_size: int = 500

    def write(self, df: DataFrame, batch_id: int = 0) -> None:
        index, url, id_col, bulk_size = self.index, self.url, self.id_col, self.bulk_size

        def post_partition(rows) -> Any:
            import urllib.request

            buf: list[str] = []

            def flush() -> None:
                if not buf:
                    return
                req = urllib.request.Request(
                    f"{url}/_bulk",
                    data=("\n".join(buf) + "\n").encode(),
                    headers={"Content-Type": "application/x-ndjson"},
                )
                urllib.request.urlopen(req, timeout=30).read()
                buf.clear()

            for row in rows:
                doc = row.asDict(recursive=True)
                action: dict[str, Any] = {"index": {"_index": index}}
                if id_col is not None:
                    action["index"]["_id"] = str(doc[id_col])
                buf.append(json.dumps(action))
                buf.append(json.dumps(doc, default=str))
                if len(buf) >= 2 * bulk_size:
                    flush()
            flush()

        # foreachPartition, not rdd.mapPartitions: stays on the DataFrame
        # path (no plan-wide RDD conversion) and is an action already
        df.foreachPartition(post_partition)
