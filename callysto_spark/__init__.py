"""callysto_spark — a PySpark-native analytics & stream-processing engine.

A from-scratch reimplementation of the *capabilities* of the reference
stream-processing framework (Jet-Engine/callysto, surveyed in SURVEY.md):
agents, changelog-backed tables, flows, sinks and lifecycle — rebuilt on
Spark Structured Streaming — plus a first-class declarative relational
operator surface (the operations callysto users hand-roll inside agent
closures, cf. reference `callysto/src/types/agent.rs:27-91`) and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Nothing here is a port: the engine is the Spark SQL / Catalyst /
Structured Streaming stack; this package contributes the framework
surface, the operator library, and the query registry.
"""

from callysto_spark.session import get_spark
from callysto_spark.app import App

__all__ = ["get_spark", "App"]
__version__ = "0.1.0"
