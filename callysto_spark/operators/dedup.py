"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

All four stay JVM-side (higher-order array functions + joins — no Python
UDFs), so they scale with the cluster: the only shuffles are the
candidate-pair joins, keyed so that Catalyst/AQE can split skewed
buckets. Reference has no dedup surface — its users would hand-roll this
in an agent closure (reference `callysto/src/types/agent.rs:120-143`);
here it is first-class and benchmarked.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

# Mersenne prime 2^31-1: (a*h + b) % P stays within int64 for a,b < P and
# h reduced mod P first.
_MERSENNE_P = (1 << 31) - 1


def dedup_exact(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Keep exactly one row per key, chosen by ``order_by`` (must be a
    total order for determinism — unlike ``dropDuplicates``, which keeps
    an arbitrary row). One shuffle on ``keys``.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lower-cased text (empty-safe)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def word_shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side only)."""
    toks = tokens_col(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    threshold: float = 0.4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above ``threshold``.

    Plan shape: shingle (narrow) → explode → self-join on shingle →
    count intersections → join sizes → ratio filter. ``max_doc_freq``
    drops stop-shingles (appearing in more than that many docs) before
    the pair join — at 100 TB this is what keeps the candidate-pair
    count near-linear instead of quadratic.

    Output: (doc_a, doc_b, inter, union_sz, jaccard) with doc_a < doc_b.
    jaccard is an int/int division — bit-deterministic, no rounding.
    """
    sh = (
        df.select(F.col(id_col).alias("doc"), F.explode(word_shingles(F.col(text_col), n)).alias("g"))
    )
    if max_doc_freq is not None:
        freq = sh.groupBy("g").agg(F.count("*").alias("df_"))
        sh = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "g").drop("df_")
    sh = sh.persist()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "union_sz", "jaccard")
    )
    return out


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    n: int = 4,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document over word n-gram shingles.

    Shingles are hashed with ``xxhash64`` (JVM built-in, engine-specific
    ⇒ no SQL oracle; driver records rows-only) then permuted with
    ``(a_i*h + b_i) mod 2^31-1``; the signature is the per-permutation
    minimum. All array math is higher-order functions — zero Python in
    the data path, embarrassingly parallel, no shuffle.
    """
    params = _hash_params(num_hashes, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    hashes = F.transform(
        word_shingles(F.col(text_col), n), lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P))
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                hashes,
                lambda h: F.pmod(F.element_at(a_arr, i + 1) * h + F.element_at(b_arr, i + 1), F.lit(_MERSENNE_P)),
            )
        ),
    )
    return df.select(F.col(id_col).alias("doc"), sig.alias("signature"))


def minhash_lsh_candidates(
    sig_df: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding over minhash signatures → candidate near-dup pairs.

    Each signature is cut into ``bands`` bands of ``rows_per_band``; docs
    colliding on any whole band become a candidate pair. The join is on
    (band_idx, band_hash) — high-cardinality buckets, so the shuffle is
    balanced; a hot bucket (boilerplate docs) is exactly the skew AQE
    splits. Output: distinct (doc_a, doc_b).
    """
    banded = sig_df.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")))
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash per document over whitespace tokens, as a hex string.

    Per-bit vote: +1 if the token hash has the bit set, −1 otherwise;
    sign of the total sets the output bit. Implemented as a fold over the
    token-hash array with a per-bit counter array (higher-order
    functions, per-row local — no shuffle at all). Output is a
    ``bits/4``-char hex string (avoids signed-64 overflow under ANSI).
    """
    hashes = F.transform(tokens_col(F.col(text_col)), lambda t: F.xxhash64(t))
    bit_idx = F.sequence(F.lit(bits - 1), F.lit(0))  # MSB first
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda c, i: c + F.when(F.bit_get(h, i) == 1, 1).otherwise(-1),
        ),
    )
    bitstr = F.array_join(
        F.transform(counts, lambda c: F.when(c > 0, F.lit("1")).otherwise(F.lit("0"))), ""
    )
    sim = F.lpad(F.conv(bitstr, 2, 16), bits // 4, "0")
    return df.select(F.col(id_col).alias("doc"), sim.alias("simhash"))
