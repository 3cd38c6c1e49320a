"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

All four stay JVM-side (higher-order array functions + joins — no Python
UDFs), so they scale with the cluster: the only shuffles are the
candidate-pair/bucket joins (keyed so Catalyst/AQE can split skewed
buckets) and the skew-immune document/bucket-frequency prefilters
(partial-agg count → df band → left-semi, r8) that bound what any
aggregation buffer or bucket join can be asked to hold. Reference has no
dedup surface — its users would hand-roll this in an agent closure
(reference `callysto/src/types/agent.rs:120-143`); here it is
first-class, benchmarked, and skew-probed (SCALING.md "Stop-shingle
probes").

Input contract: ``id_col`` is UNIQUE per row. Exact dedup is the
operator that ESTABLISHES that invariant for a raw corpus (its survivor
selection is total-ordered, so exact-duplicate ids collapse
deterministically — the composed clean-corpus pipeline runs it first
and is therefore duplicate-input-safe end-to-end); the similarity
primitives downstream (n-gram Jaccard, MinHash-LSH, SimHash) ASSUME it:
feeding them rows that share an id multiplies candidate pairs and
shifts df/bucket-frequency caps in engine-specific ways (measured by
the r15 duplicate-row sweep — see tests/test_dup_fuzz.py).
"""

from __future__ import annotations

import os
import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from callysto_spark.operators.util import transient_persist

# Mersenne prime 2^31-1: (a*h + b) % P stays within int64 for a,b < P and
# h reduced mod P first.
_MERSENNE_P = (1 << 31) - 1

# Hash engines for the MinHash/SimHash/LSH family. ``xxhash64`` is the
# production default — fastest, JVM-native — but engine-SPECIFIC: no
# other system can recompute it, so cross-engine verification (the
# DuckDB oracle) is impossible. ``md5_60`` is the spec-defined portable
# engine: the first 15 hex chars (60 bits) of the standard MD5 digest
# (RFC 1321) of the UTF-8 string, parsed as an integer — bit-identical
# in ANY engine with an md5() builtin (DuckDB:
# ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``; 15 chars, not 16,
# so the value always fits signed int64). Both run fully JVM-side.
HASH_ENGINES = ("xxhash64", "md5_60")

# Which implementation backs ``shingle_arrays`` (and through it every
# Jaccard/MinHash/LSH consumer): "jvm" = the higher-order-function
# expression pipeline (DEFAULT), "arrow" = the vectorized mapInArrow
# kernel (guide §4.2; see ``_arrow_shingle_batches``). Output contract
# is identical either way (pinned by the JVM-vs-Arrow parity fuzz in
# tests/test_dedup_pipeline.py). The r16 interleaved same-session A/B
# (OPTIMIZATION_r16.md) measured the Arrow kernel SLOWER on the
# isolated narrow stage at BOTH test scales — sf0.1: jvm 0.531s vs
# arrow 0.688s min; sf1: 1.08 vs 1.61 — the JVM↔Python boundary and
# Python-side dedup cost more than the interpreted-HOF eval they
# replace (guide §1.1's "fresh implementation of the ideal plan is
# usually slower" case), so the JVM form stays the default and the
# kernel remains as the measured alternative.
SHINGLE_IMPL = os.environ.get("SPARK_GRAFT_SHINGLE_IMPL", "jvm")


def string_hash(col: Column, engine: str = "xxhash64") -> Column:
    """Deterministic int64 hash of a string column, per ``engine``.

    ``xxhash64`` spans the full signed-64 range; ``md5_60`` is
    nonnegative in [0, 2^60). Every consumer either reduces mod
    ``_MERSENNE_P`` (MinHash) or tests bits 0..63 (SimHash), so the
    range difference is semantics-neutral.
    """
    if engine == "xxhash64":
        return F.xxhash64(col)
    if engine == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash engine {engine!r}; expected one of {HASH_ENGINES}")


def dedup_exact(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Keep exactly one row per key, chosen by ``order_by`` (must be a
    total order for determinism — unlike ``dropDuplicates``, which keeps
    an arbitrary row). One shuffle on ``keys``.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of case-folded text (empty-safe), under the
    pinned cross-engine tokenizer contract (functions/compat.py:
    explicit ASCII whitespace class, casefold = lower + sigma fold +
    U+0307 strip — the points where Java regex/toLowerCase and DuckDB's
    RE2/utf8proc disagree)."""
    from callysto_spark.functions.compat import WS_CLASS, casefold_col

    return F.split(F.trim(casefold_col(text)), WS_CLASS + "+")


def stage_text(df: DataFrame, text_col: str) -> DataFrame:
    """The NULL contract every token-consuming kernel inherits: NULL
    text ⇒ no tokens ⇒ doc absent (SQL unnest-of-NULL semantics).
    Ranking NULL through a tokenizer instead gives every untexted doc
    the identical '' token stream — in the shingle pipelines that pairs
    ALL of them with each other, a quadratic false-pair blowup. Also
    re-parallelizes an under-partitioned input."""
    from callysto_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df).filter(F.col(text_col).isNotNull())


def staged_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, __toks) staging shared by the shingle/winnow kernels:
    ``stage_text`` NULL contract, then the tokens array materialized
    through an ``explode(array(...))`` Generate barrier so the regex
    split runs ONCE per document (see ``shingle_arrays``)."""
    return stage_text(df, text_col).select(
        F.col(id_col).alias("doc"),
        F.explode(F.array(tokens_col(F.col(text_col)))).alias("__toks"),
    )


def word_shingles(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED tokens column.

    The tokens argument must be a genuine attribute (use
    ``shingle_arrays`` / ``with_shingles``): a lambda that references an
    inline expression (e.g. the regex split itself) re-evaluates it per
    element — measured 12× slower on the documents table.
    """
    # Unrolled element_at instead of slice(): per-element array slicing
    # measured ~50× slower than n direct element accesses. try_element_at
    # (not element_at): docs shorter than n tokens index past the end,
    # which under ANSI mode would throw; try_element_at yields NULL and
    # concat_ws skips it, producing the truncated shingle the oracle
    # definition expects.
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", *[F.try_element_at(toks, i + k) for k in range(n)]),
        )
    )


def _arrow_shingle_batches(n: int, ws_pattern: str):
    """Build the ``mapInArrow`` generator for the Arrow shingle kernel
    (see ``shingle_arrays`` for the contract and the measured A/B).

    Per batch, entirely vectorized (guide §4.2 — no per-row Python):

    1. casefold + trim + regex split via ``pyarrow.compute`` (utf8proc
       lower; the ς→σ fold and U+0307 strip make it agree with Java
       ``toLowerCase`` at the two SpecialCasing points — the same
       argument as the DuckDB oracle side, and pinned by the JVM-vs-
       Arrow parity fuzz in tests/test_dedup_pipeline.py plus
       tests/test_text_fuzz.py's pathological sweep).
    2. The normalized document (tokens joined by ' ') is ONE contiguous
       Arrow data buffer; every n-gram shingle is a byte-slice of it,
       so shingle construction is offsets arithmetic (numpy) + one
       vectorized byte gather — no per-row string building (the Arrow
       property the guide calls out for re-slicing binary columns).
    3. per-doc distinct + list assembly via Acero hash aggregation
       (``use_threads=False``: Spark already runs one task per core;
       internal Arrow threads would oversubscribe).

    Truncated-shingle and empty-text semantics are bit-identical to
    ``word_shingles``: docs with L < n tokens yield the single shingle
    joining all L tokens; blank text yields one '' shingle.
    """

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        out_type = pa.list_(pa.string())

        def run(b: "pa.RecordBatch"):
            doc = b.column(0)
            text = b.column(1)
            if text.null_count:  # stage_text already dropped these
                keep = pc.is_valid(text)
                doc, text = doc.filter(keep), text.filter(keep)
            if len(text) == 0:
                yield pa.RecordBatch.from_arrays(
                    [doc, pa.array([], type=out_type)], ["doc", "gs"]
                )
                return
            folded = pc.replace_substring(
                pc.replace_substring(pc.utf8_lower(text), "ς", "σ"),
                "̇",
                "",
            )
            toks = pc.split_pattern_regex(pc.utf8_trim(folded, " "), ws_pattern)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            tok_off = toks.offsets.to_numpy().astype(np.int64)
            tok_len = pc.binary_length(toks.values).to_numpy().astype(np.int64)
            norm = pc.binary_join(toks, " ")
            if isinstance(norm, pa.ChunkedArray):
                norm = norm.combine_chunks()
            nbufs = norm.buffers()
            norm_off = np.frombuffer(nbufs[1], dtype=np.int32)[
                norm.offset : norm.offset + len(norm) + 1
            ].astype(np.int64)
            norm_buf = np.frombuffer(nbufs[2], dtype=np.uint8)
            ndocs = len(toks)
            L = np.diff(tok_off)  # tokens per doc (>= 1: split never yields [])
            m = np.maximum(L - (n - 1), 1)  # shingles per doc, pre-distinct
            # byte position of global token t inside its doc's normalized
            # text: csum[t] - csum[first token of doc]
            csum = np.concatenate(([0], np.cumsum(tok_len + 1)))
            doc_of_sh = np.repeat(np.arange(ndocs), m)
            tot = int(m.sum())
            sh_local = np.arange(tot) - np.repeat(
                np.concatenate(([0], np.cumsum(m)[:-1])), m
            )
            t_start = tok_off[doc_of_sh] + sh_local
            t_end = np.minimum(t_start + n - 1, tok_off[doc_of_sh + 1] - 1)
            base = norm_off[doc_of_sh] - csum[tok_off[doc_of_sh]]
            b_start = base + csum[t_start]
            b_end = base + csum[t_end] + tok_len[t_end]
            lens = b_end - b_start
            out_off = np.concatenate(([0], np.cumsum(lens)))
            idx = np.repeat(b_start - out_off[:-1], lens) + np.arange(out_off[-1])
            g_all = pa.StringArray.from_buffers(
                tot,
                pa.py_buffer(out_off.astype(np.int32)),
                pa.py_buffer(norm_buf[idx]),
            )
            rows = pa.table({"doc": pc.take(doc, pa.array(doc_of_sh)), "g": g_all})
            distinct = pa.TableGroupBy(rows, ["doc", "g"], use_threads=False).aggregate([])
            arrs = pa.TableGroupBy(distinct, ["doc"], use_threads=False).aggregate(
                [("g", "list")]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    arrs.column("doc").combine_chunks(),
                    arrs.column("g_list").combine_chunks().cast(out_type),
                ],
                ["doc", "gs"],
            )

        for raw in batches:
            # int32 string offsets cap an Arrow batch's payload at 2 GiB;
            # shingle bytes are <= n x the normalized text, so slicing the
            # input at ~64 MiB of text keeps the output far under it.
            tbytes = pc.binary_length(raw.column(1)).to_numpy(zero_copy_only=False)
            cum = np.cumsum(np.nan_to_num(tbytes, nan=0.0))
            total = float(cum[-1]) if len(cum) else 0.0
            if total > 64 * 1024 * 1024:
                splits = np.searchsorted(
                    cum, np.arange(64 * 1024 * 1024, cum[-1], 64 * 1024 * 1024)
                )
                lo = 0
                for hi in list(splits + 1) + [raw.num_rows]:
                    if hi > lo:
                        yield from run(raw.slice(lo, hi - lo))
                    lo = hi
            else:
                yield from run(raw)

    return gen


def shingle_arrays_arrow(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Arrow-kernel implementation of ``shingle_arrays`` (guide §4.2):
    the tokenize → shingle → distinct pipeline runs as ONE vectorized
    ``mapInArrow`` over (id, text) batches instead of interpreted
    CodegenFallback higher-order expressions. Same output contract.
    Narrow (no shuffle) and streaming-legal like the JVM form."""
    from callysto_spark.functions.compat import WS_CLASS

    id_type = df.schema[id_col].dataType.simpleString()
    narrowed = stage_text(df, text_col).select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("__text")
    )
    return narrowed.mapInArrow(
        _arrow_shingle_batches(n, WS_CLASS + "+"),
        f"doc {id_type}, gs array<string>",
    )


def with_shingles(df: DataFrame, text_col: str, n: int, out: str = "gs") -> DataFrame:
    """df + distinct word-n-gram shingle array column (tokens
    materialized through a Generate barrier — see ``shingle_arrays``;
    input re-parallelized if under-partitioned)."""
    cols = df.columns
    return (
        stage_text(df, text_col)
        .select("*", F.explode(F.array(tokens_col(F.col(text_col)))).alias("__toks"))
        .select(*cols, word_shingles(F.col("__toks"), n).alias(out))
    )


def shingle_arrays(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, gs): DISTINCT word n-gram shingles as an IN-ROW array —
    fully narrow, no shuffle, no window.

    The tokens array is materialized through an ``explode(array(...))``
    Generate barrier: CollapseProject cannot inline an expression
    through Generate, so the regex split runs ONCE per document. (A
    ``withColumn`` "materialization" gets collapsed back into every
    per-element lambda — measured 12× slower; the earlier alternative,
    posexplode → window lead → distinct, was correct but paid two extra
    exchanges (window on doc, distinct on (doc, g)) and was measured
    2.5× slower end-to-end on the capped-Jaccard pipeline.)

    Docs shorter than n tokens yield one truncated shingle (the
    ``try_element_at`` + ``concat_ws`` NULL-skip path in
    ``word_shingles``), matching the oracle definition.

    Memory note at scale: the shingle set lives in one row, so a
    pathological document costs its full shingle array in executor
    memory (a 10 MB doc ≈ tens of MB in-row). Real pipelines length-cap
    documents upstream (see ``doc_pipeline_clean_corpus``'s token
    filter); both the old exploded form and this one keep a document
    inside a single task either way.

    Because the whole pipeline is narrow (no shuffle, no window), it is
    also STREAMING-LEGAL: the same operator runs unchanged on a
    readStream DataFrame (see tests/test_streaming.py).

    r15 plan note: a downstream ``explode(gs)`` makes
    InferFiltersFromGenerate add ``size(gs) > 0``, which pushdown
    inlines below this project — the plan then SHOWS the shingle
    expression twice (nodes (7)/(8) of
    plans/r15/doc_ngram_jaccard_capped_before.txt). Measured (r15,
    interleaved same-session A/B on the registry capped-Jaccard query):
    the duplication is NOT paid at runtime — the HOF expression makes
    both operators run interpreted with runtime subexpression
    elimination, and a third Generate barrier here (which would pin the
    single evaluation in-plan) measured within noise to slightly SLOWER
    (it materializes the full shingle array at the new operator
    boundary). Left in the measured-fastest original form.
    """
    if SHINGLE_IMPL == "arrow":
        return shingle_arrays_arrow(df, id_col, text_col, n)
    return staged_tokens(df, id_col, text_col).select(
        "doc", word_shingles(F.col("__toks"), n).alias("gs")
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """DISTINCT (doc, g) word-n-gram shingle rows (one explode over the
    in-row shingle arrays — see ``shingle_arrays`` for the plan
    rationale)."""
    return shingle_arrays(df, id_col, text_col, n).select(
        "doc", F.explode("gs").alias("g")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    threshold: float = 0.4,
    max_doc_freq: int | None = None,
    shingle_reuse: str = "persist",
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above ``threshold``.

    ``shingle_reuse`` governs how the capped path feeds its two
    consumers (the df-count pass and the semi-join probe) from one
    shingle table: ``'persist'`` (default) caches it
    (MEMORY_AND_DISK — right when the exploded shingle table, ~3-5x
    the text, fits the cluster's storage memory+disk);
    ``'recompute'`` re-derives it from the source both times — the
    narrow tokenize/shingle pipeline runs twice, measured within 10%
    of the persist path at the 30x/100x corpora (r8 A/B), and the
    right choice when caching a corpus-sized intermediate is
    infeasible or evicts hotter data at 100 TB.

    Two physical strategies behind one result contract:

    - ``max_doc_freq`` set (the 100 TB path): the document-frequency cap
      bounds every shingle bucket at ``max_doc_freq`` docs, so pairs are
      generated IN-ROW — a skew-immune ``groupBy(g).count()`` df pass,
      a left-semi join pruning shingle rows to the df-banded live set,
      then ``collect_list`` over buckets that are ≤ cap BY CONSTRUCTION
      and a bounded combinations expansion (≤ C(cap, 2) pairs per
      bucket). No corpus self-join; hot stop-shingle rows are dropped
      streaming through the semi-join probe, never buffered. ALWAYS set
      the cap at scale: it is simultaneously what keeps the pair count
      near-linear AND what makes the in-row expansion safe.
    - ``max_doc_freq`` unset (small-corpus exactness baseline): a hot
      shingle bucket is unbounded, so pairs come from a self-join on g
      (AQE splits skewed buckets) over a persisted shingle table.

    For the full 100 TB near-dup pipeline prefer ``minhash_signatures``
    → ``minhash_lsh_candidates`` → ``verify_candidate_pairs``: the
    corpus then never self-joins at all.

    Output: (doc_a, doc_b, inter, union_sz, jaccard) with doc_a < doc_b.
    jaccard is an int/int division — bit-deterministic, no rounding.
    """
    # Validate at entry, not inside the max_doc_freq branch (r8 ADVICE):
    # on the uncapped path the knob is unused, but a typo'd value must
    # still fail loudly rather than be silently accepted and ignored.
    if shingle_reuse not in ("persist", "recompute"):
        raise ValueError(
            f"shingle_reuse must be 'persist' or 'recompute', got {shingle_reuse!r}"
        )
    # In-row shingle arrays (see shingle_arrays): set size is just
    # size(gs) — no window, no distinct exchange; the explode to
    # (doc, n_sh, g) rows is narrow.
    arr = shingle_arrays(df, id_col, text_col, n)
    sh = arr.select("doc", F.size("gs").alias("n_sh"), F.explode("gs").alias("g"))
    if max_doc_freq is not None:
        # Two-pass document-frequency cap (round-7 verdict finding #1).
        # The previous one-pass — groupBy(g).collect_list(...).filter(
        # size(ds) <= cap) — applied the cap AFTER the aggregation had
        # already buffered the bucket's full member list: a true
        # stop-shingle (boilerplate n-gram present in 0.1-1% of a 100 TB
        # corpus) puts millions of (doc, n_sh) structs into ONE group's
        # aggregation buffer before the filter drops it — executor OOM
        # at exactly the scale the cap exists for. Pass 1 counts
        # document frequency per shingle: count() partial-aggregates
        # map-side, so even the hottest shingle contributes one long per
        # map partition — skew-immune by construction. Pass 2 LEFT-SEMI
        # joins the shingle rows against the df-banded live set BEFORE
        # any collect_list: hot-shingle rows stream through the join
        # probe and are dropped without ever being buffered, and every
        # bucket the aggregation sees holds 2..max_doc_freq members by
        # construction (no post-agg size filter needed). One extra
        # bounded exchange (shingle rows hashed on g) buys bounded
        # memory; the semi-join output is already partitioned on g, so
        # the collect_list groupBy rides the same exchange.
        # array_sort INSIDE the agg: collect_list order is partition-
        # dependent, and sorting there yields a materialized attribute
        # (the Aggregate is a projection barrier — an outer array_sort
        # would be CollapseProject-inlined into every element_at).
        # n_sh stays the FULL set size — standard filtered-candidate
        # jaccard divides by the true union.
        # shuffle_hash hint on the build (live) side: without it the
        # semi join plans as SortMergeJoin and SORTS the full shingle
        # table by its string key — measured 16.1s vs 3.95s at the 30x
        # corpus (the sort was 75% of the query). The hash build side
        # is only the distinct live shingles (2..cap df) per partition,
        # far smaller than the probe; at larger corpora the per-
        # partition build scales down with shuffle partitions. At small
        # SF, AQE may still upgrade it to a broadcast join — either
        # way, no sort. Residual skew note: a stop-shingle's rows are
        # never BUFFERED, but they do transit the shuffle once into one
        # probe partition's read; AQE skew-join (on — session.py) splits
        # that probe partition across tasks with the build side
        # replicated, so even the transit is parallel, not a straggler.
        if shingle_reuse == "persist":
            sh = transient_persist(sh)
        live = (
            sh.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= max_doc_freq))
            .select("g")
        )
        buckets = (
            sh.join(live.hint("shuffle_hash"), "g", "left_semi")
            .groupBy("g")
            .agg(F.array_sort(F.collect_list(F.struct("doc", "n_sh"))).alias("ds"))
        )
        ds = F.col("ds")
        combos = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size(ds) - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size(ds)),
                    lambda j: F.struct(
                        F.element_at(ds, i).alias("a"), F.element_at(ds, j).alias("b")
                    ),
                ),
            )
        )
        pairs = (
            buckets.select(F.explode(combos).alias("p"))
            .select(
                F.col("p.a.doc").alias("doc_a"),
                F.col("p.b.doc").alias("doc_b"),
                F.col("p.a.n_sh").alias("na"),
                F.col("p.b.n_sh").alias("nb"),
            )
            .groupBy("doc_a", "doc_b", "na", "nb")
            .agg(F.count("*").alias("inter"))
        )
    else:
        sh = transient_persist(sh)
        a = sh.alias("a")
        b = sh.alias("b")
        pairs = (
            a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc") < F.col("b.doc")))
            .groupBy(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                F.col("a.n_sh").alias("na"),
                F.col("b.n_sh").alias("nb"),
            )
            .agg(F.count("*").alias("inter"))
        )
    return (
        pairs.withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "union_sz", "jaccard")
    )


def verify_candidate_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact Jaccard verification restricted to CANDIDATE pairs — stage
    two of the canonical 100 TB near-dup pipeline (stage one:
    minhash_lsh_candidates). The full corpus never self-joins: shingle
    ARRAYS are built only for docs appearing in a candidate pair (semi
    join), each candidate pair picks up both docs' arrays via two
    key-equi joins, and the intersection is computed IN-ROW with
    ``array_intersect`` — no shingle explode, no pair join on the
    shingle key, total work O(|candidates| · shingles/doc).

    ``candidates``: (doc_a, doc_b) with doc_a < doc_b. Output matches
    ngram_jaccard_pairs' schema, filtered to candidates ∩ threshold.
    """
    # candidates is typically a full LSH pipeline — persist: it feeds the
    # touched-docs semi join AND both sides of the pair assembly
    cand = transient_persist(candidates.select("doc_a", "doc_b").distinct())
    touched = (
        cand.select(F.col("doc_a").alias("doc"))
        .unionByName(cand.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    # shuffle_hash hint (r15): without it this semi join plans as
    # SortMergeJoin and SORTS the corpus side by id (the same pathology
    # the capped-Jaccard df-prefilter hit — see ngram_jaccard_pairs);
    # the build side is the bounded touched-doc id set.
    narrowed = df.join(
        touched.withColumnRenamed("doc", id_col).hint("shuffle_hash"),
        id_col,
        "left_semi",
    )
    arr = transient_persist(shingle_arrays(narrowed, id_col, text_col, n))
    a = arr.select(F.col("doc").alias("doc_a"), F.col("gs").alias("gs_a"))
    b = arr.select(F.col("doc").alias("doc_b"), F.col("gs").alias("gs_b"))
    paired = cand.join(a, "doc_a").join(b, "doc_b")
    return (
        paired.select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("gs_a", "gs_b")).alias("inter"),
            (F.size("gs_a") + F.size("gs_b")).alias("__sz"),
        )
        .withColumn("union_sz", F.col("__sz") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "union_sz", "jaccard")
    )


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
    hash_engine: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document over word n-gram shingles.

    Shingles are hashed with ``string_hash(…, hash_engine)`` — xxhash64
    (production default) or the portable ``md5_60`` spec hash, which a
    SQL oracle can recompute — then permuted with
    ``(a_i*h + b_i) mod 2^31-1``; the signature is the per-permutation
    minimum, computed ENTIRELY in-row over the document's shingle-hash
    array (``array_min`` over a ``transform`` per permutation): zero
    Python in the data path, embarrassingly parallel, ZERO shuffle —
    the whole signature stage is a narrow map at any corpus size. The
    hash array is materialized through a second Generate barrier so the
    shingle-hash pass runs once, not once per permutation.
    """
    params = _hash_params(num_hashes, seed)
    arr = shingle_arrays(df, id_col, text_col, n)
    hashed = arr.select(
        "doc",
        F.explode(
            F.array(
                F.transform(
                    F.col("gs"),
                    lambda g: F.pmod(string_hash(g, hash_engine), F.lit(_MERSENNE_P)),
                )
            )
        ).alias("hs"),
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("hs"), lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_P))
                )
            )
            for a, b in params
        ]
    )
    return hashed.select("doc", sig.alias("signature"))


def minhash_lsh_candidates(
    sig_df: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    hash_engine: str = "xxhash64",
    max_bucket_freq: int | None = None,
) -> DataFrame:
    """LSH banding over minhash signatures → candidate near-dup pairs.

    Each signature is cut into ``bands`` bands of ``rows_per_band``; docs
    colliding on any whole band become a candidate pair. The join is on
    (band_idx, band_hash) — high-cardinality buckets, so the shuffle is
    balanced; a hot bucket (boilerplate docs) is exactly the skew AQE
    splits. The band hash runs through the same pluggable
    ``string_hash`` engine as the signatures (comma-joined band values
    as the input string). Output: distinct (doc_a, doc_b).

    ``max_bucket_freq`` (the 100 TB knob): a bucket shared by m docs
    emits C(m, 2) pairs — a template cluster of 1M near-identical docs
    makes the candidate OUTPUT itself quadratic, which no join strategy
    (AQE skew-split included — it balances the shuffle, not the output)
    can un-explode. Capping drops buckets with more than
    ``max_bucket_freq`` members BEFORE the self-join via the same
    skew-immune two-pass as the capped Jaccard path (partial-agg
    ``groupBy(band, bh).count()`` → df-band filter → left-semi join):
    hot-bucket rows stream through the probe and are dropped, never
    buffered or paired. Recall note: members of an over-cap bucket are
    near-identical docs that collide in MANY buckets, so they almost
    surely still pair through a below-cap band; production pipelines
    also exact-dedup before LSH, which removes the main source of
    mega-buckets. Measured in SCALING.md ("Stop-shingle probes").
    """
    # guard the banding geometry IN-PLAN: with bands*rows_per_band >
    # len(signature), F.slice past the end returns [] and every doc
    # hashes the empty string identically on the out-of-range bands —
    # the (band, bh) self-join then degenerates into a full corpus
    # cross-join (O(n^2) pairs, runaway shuffle) with zero warning.
    # raise_error at the first row beats that silently at any scale;
    # a LONGER signature is only a recall loss, flagged in the message.
    need = bands * rows_per_band
    sig_ok = F.when(
        F.size(F.col("signature")) < F.lit(need),
        F.raise_error(
            F.concat(
                F.lit(
                    f"minhash_lsh_candidates: bands({bands}) * rows_per_band"
                    f"({rows_per_band}) = {need} exceeds signature length "
                ),
                F.size(F.col("signature")).cast("string"),
                F.lit(" — pass num_hashes >= bands*rows_per_band to minhash_signatures"),
            )
        ),
    ).otherwise(F.col("signature"))
    banded = sig_df.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    string_hash(
                        F.concat_ws(",", F.transform(F.slice(sig_ok, b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string"))),
                        hash_engine,
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    banded = transient_persist(banded)
    if max_bucket_freq is not None:
        live = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= max_bucket_freq))
            .select("band", "bh")
        )
        banded = banded.join(live.hint("shuffle_hash"), ["band", "bh"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    hash_engine: str = "xxhash64",
) -> DataFrame:
    """SimHash per document over whitespace tokens, as a hex string.

    Per-bit vote: +1 if the token hash has the bit set, −1 otherwise;
    sign of the total sets the output bit. Implemented as a fold over the
    token-hash array with a per-bit counter array (higher-order
    functions, per-row local — no shuffle at all). Output is a
    ``bits/4``-char hex string (avoids signed-64 overflow under ANSI).

    Under ``hash_engine='md5_60'`` the token hash has 60 effective bits,
    so with the default ``bits=64`` the top 4 output bits are always 0
    (every token votes −1 there) — deterministic on both engines, with
    band 0 of a 4-band blocking carrying 12 useful bits instead of 16.
    """
    staged = stage_text(df, text_col).withColumn(
        "__hashes",
        F.transform(tokens_col(F.col(text_col)), lambda t: string_hash(t, hash_engine)),
    )
    hashes = F.col("__hashes")
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
    return staged.select(F.col(id_col).alias("doc"), sim.alias("simhash"))


def simhash_candidates(
    sim_df: DataFrame,
    bands: int = 4,
    max_hamming: int | None = None,
    max_bucket_freq: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs from SimHash hex signatures by banded
    blocking — the pigeonhole principle: two signatures within Hamming
    distance ``bands − 1`` MUST agree exactly on at least one of
    ``bands`` equal slices, so bucketing each slice and joining on
    (band, slice) finds every such pair without a corpus self-join.
    Same shuffle shape as ``minhash_lsh_candidates``: a high-cardinality
    (band, slice) bucket join AQE can split on skew.

    ``sim_df``: (doc, simhash) as produced by :func:`simhash`.
    ``max_hamming`` (≤ bands−1, default bands−1) additionally verifies
    the exact Hamming distance in-row on the candidate pair — still no
    extra shuffle. Output: (doc_a, doc_b, hamming) with doc_a < doc_b.

    ``max_bucket_freq``: same quadratic-output guard as
    :func:`minhash_lsh_candidates` — a (band, slice) bucket with m
    members emits C(m, 2) pairs, so template clusters are dropped
    before the self-join via the skew-immune two-pass count →
    df-band → left-semi prefilter (see that docstring for the recall
    argument and the SCALING.md measurement).
    """
    if max_hamming is None:
        max_hamming = bands - 1
    if max_hamming > bands - 1:
        raise ValueError(
            f"banded blocking with {bands} bands only guarantees recall up to "
            f"hamming {bands - 1}; raise bands or lower max_hamming"
        )
    width = (F.length("simhash") / bands).cast("int")  # bits/4 hex chars, divisible for pow-2 bands
    banded = sim_df.select(
        "doc",
        "simhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.substr("simhash", b * width + 1, width).alias("slice"),
                ),
            )
        ).alias("bk"),
    ).select("doc", "simhash", F.col("bk.band").alias("band"), F.col("bk.slice").alias("slice"))
    banded = transient_persist(banded)
    if max_bucket_freq is not None:
        live = (
            banded.groupBy("band", "slice")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= max_bucket_freq))
            .select("band", "slice")
        )
        banded = banded.join(live.hint("shuffle_hash"), ["band", "slice"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    # exact Hamming distance between hex strings, in-row: per hex digit,
    # popcount of xor — conv to int then bit_count
    ham = F.aggregate(
        F.zip_with(
            F.split(F.col("a.simhash"), ""),
            F.split(F.col("b.simhash"), ""),
            lambda x, y: F.bit_count(
                F.conv(x, 16, 10).cast("long").bitwiseXOR(F.conv(y, 16, 10).cast("long"))
            ),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
