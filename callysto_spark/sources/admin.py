"""Kafka topic admin (reference `kafka/ctopic.rs:91-119` topic_declare,
SURVEY.md §2.1 S10): create topics with partition count, cleanup policy
and retention — used by the reference to auto-create changelog topics
co-partitioned with their source (`types/table.rs:246-248`).

Spark has no topic-admin surface (correctly — it's not a query concern);
this helper uses confluent-kafka/kafka-python when installed and fails
with a clear message otherwise. State co-partitioning itself is NOT
needed on Spark (the state store partitions by group key internally,
SURVEY.md §2.3 T6/T7).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class TopicSpec:
    name: str
    partitions: int = 1
    compacting: bool = False
    deleting: bool = True
    retention_ms: int | None = None

    @property
    def config(self) -> dict[str, str]:
        policy = []
        if self.compacting:
            policy.append("compact")
        if self.deleting:
            policy.append("delete")
        cfg: dict[str, str] = {"cleanup.policy": ",".join(policy) or "delete"}
        if self.retention_ms is not None:
            cfg["retention.ms"] = str(self.retention_ms)
        return cfg


def declare_memtopic(spec: TopicSpec, broker_dir: str) -> dict:
    """Declare a topic on the jar-free memtopic broker (idempotent):
    creates the topic dir + empty partition logs and records the spec's
    config next to them — the runnable twin of Kafka topic_declare
    (reference `kafka/ctopic.rs:91-119`), so changelog-style topics can
    be auto-created in tests/dev exactly as the reference does."""
    import json
    import os

    from callysto_spark.sources.memtopic import _log_path, _topic_dir

    tdir = _topic_dir(broker_dir, spec.name)
    os.makedirs(tdir, exist_ok=True)
    for pid in range(spec.partitions):
        path = _log_path(broker_dir, spec.name, pid)
        if not os.path.exists(path):
            open(path, "a").close()
    meta = {"partitions": spec.partitions, **spec.config}
    with open(os.path.join(tdir, "_config.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def declare_topic(spec: TopicSpec, bootstrap_servers: str = "localhost:9092") -> None:
    """Create the topic if absent (idempotent, like the reference's
    topic_declare)."""
    try:
        from confluent_kafka.admin import AdminClient, NewTopic  # type: ignore
    except ImportError:
        try:
            from kafka.admin import KafkaAdminClient, NewTopic as KNewTopic  # type: ignore
        except ImportError as exc:
            raise RuntimeError(
                "topic admin requires confluent-kafka or kafka-python "
                "(pip install confluent-kafka)"
            ) from exc
        admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
        try:
            admin.create_topics(
                [KNewTopic(spec.name, spec.partitions, 1, topic_configs=spec.config)]
            )
        except Exception as exc:  # already-exists is fine (idempotent),
            # same as the confluent path below — kafka-python raises
            # TopicAlreadyExistsError instead of returning it in a future
            if "already exists" not in str(exc).lower() and "TopicAlreadyExists" not in type(exc).__name__:
                raise
        finally:
            admin.close()
        return
    admin = AdminClient({"bootstrap.servers": bootstrap_servers})
    futures = admin.create_topics(
        [NewTopic(spec.name, num_partitions=spec.partitions, config=spec.config)]
    )
    for fut in futures.values():
        try:
            fut.result(timeout=30)
        except Exception as exc:  # already-exists is fine (idempotent)
            if "already exists" not in str(exc).lower():
                raise
