from callysto_spark.sources.descriptors import SourceSpec

__all__ = ["SourceSpec"]
