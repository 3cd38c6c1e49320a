from callysto_spark.sinks.core import (
    ParquetSink,
    KafkaSink,
    JdbcSink,
    ElasticsearchSink,
    MemorySink,
    MemTopicSink,
    sink_to_foreach_batch,
)

__all__ = [
    "ParquetSink",
    "KafkaSink",
    "JdbcSink",
    "ElasticsearchSink",
    "MemorySink",
    "MemTopicSink",
    "sink_to_foreach_batch",
]
