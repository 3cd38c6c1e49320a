"""Scalar function helpers shared across the engine."""

from callysto_spark.functions.compat import rnd, fixed_sum, rewrite_oracle_fixed, rewrite_oracle_round

__all__ = ["rnd", "fixed_sum", "rewrite_oracle_fixed", "rewrite_oracle_round"]
