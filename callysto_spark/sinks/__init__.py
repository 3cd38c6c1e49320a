from callysto_spark.sinks.core import (
    ParquetSink,
    KafkaSink,
    JdbcSink,
    ElasticsearchSink,
    MemorySink,
    sink_to_foreach_batch,
)

__all__ = [
    "ParquetSink",
    "KafkaSink",
    "JdbcSink",
    "ElasticsearchSink",
    "MemorySink",
    "sink_to_foreach_batch",
]
