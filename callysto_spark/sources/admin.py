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
