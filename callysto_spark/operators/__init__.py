"""First-class declarative operators.

The reference framework hands users a raw stream + closure and lets them
hand-roll filtering/joining/aggregation (reference
`callysto/src/types/agent.rs:120-143`, examples `basic.rs`,
`inmemory.rs`). Here the same operations — plus the ones a 100 TB
LLM-data pipeline needs — are first-class, Catalyst-optimizable
DataFrame transforms.
"""

from callysto_spark.operators.relational import top_k_per_group, pivot_on
from callysto_spark.operators.asof import asof_join
from callysto_spark.operators.sessionize import sessionize
from callysto_spark.operators.dedup import (
    dedup_exact,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash,
)
from callysto_spark.operators.similarity import cosine_topk, cosine_pairs_blocked

__all__ = [
    "top_k_per_group",
    "pivot_on",
    "asof_join",
    "sessionize",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash",
    "cosine_topk",
    "cosine_pairs_blocked",
]
