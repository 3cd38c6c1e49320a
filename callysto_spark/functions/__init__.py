"""Scalar function helpers shared across the engine."""

from callysto_spark.functions.compat import rnd, rewrite_oracle_round

__all__ = ["rnd", "rewrite_oracle_round"]
