"""Two-stage near-dup pipeline quality contracts: LSH candidates must
catch planted near-duplicates, and exact verification on candidates
must agree with the full-corpus exact operator wherever they overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from callysto_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    verify_candidate_pairs,
)
from callysto_spark.tables import load


def _planted_corpus(spark, sf_dir, n_twins=30):
    d = load(spark, sf_dir, "documents")["documents"].select("doc_id", "text")
    twins = (
        d.filter(F.col("doc_id") < n_twins)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" planted")).alias("text"),
        )
    )
    return d.unionByName(twins), n_twins


def test_lsh_recall_on_planted_near_dups(spark, sf_dir):
    corpus, n_twins = _planted_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, "doc_id", "text", num_hashes=64, n=4)
    cands = minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    planted = {(i, i + 100000) for i in range(n_twins)}
    got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    recall = len(planted & got) / len(planted)
    assert recall >= 0.95, f"LSH recall on ~0.9-jaccard twins: {recall:.2f}"


def test_verified_pairs_agree_with_exact(spark, sf_dir):
    """verify_candidate_pairs(candidates) must be exactly the exact
    operator's output restricted to the candidate set — same jaccard
    values, nothing extra."""
    corpus, _ = _planted_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, "doc_id", "text", num_hashes=64, n=4)
    cands = minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    verified = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"], r["jaccard"])
        for r in verify_candidate_pairs(corpus, cands, "doc_id", "text", n=4, threshold=0.6).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"], r["jaccard"])
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", n=4, threshold=0.6).collect()
    }
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    expected = {p: v for p, v in exact.items() if p in cand_set}
    assert verified == expected
    assert len(verified) >= 25, "planted twins must survive verification"


def test_simhash_candidates_banded_hamming(spark):
    """Pigeonhole recall: near-identical docs (small Hamming distance
    between simhashes) must surface as candidates with their EXACT
    hamming distance; unrelated docs must not pair at a tight
    max_hamming. Identical docs pair at hamming 0."""
    from callysto_spark.operators.dedup import simhash, simhash_candidates

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
        (3, "an entirely different document about database engines and shuffles"),
        (4, "the quick brown fox jumps over the lazy dog again and again today"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(4)
    sims = simhash(df, "doc_id", "text")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_candidates(sims, bands=4, max_hamming=3).collect()
    }
    assert pairs.get((1, 4)) == 0, f"identical docs must pair at hamming 0: {pairs}"
    # hamming values are exact: recompute driver-side from the signatures
    sig = {r["doc"]: r["simhash"] for r in sims.collect()}

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    for (x, y), h in pairs.items():
        assert h == ham(sig[x], sig[y]), f"pair ({x},{y}) hamming mismatch"
    for (x, y), h in pairs.items():
        assert h <= 3


def test_md5_60_spec_hash_matches_hashlib(spark):
    """The portable md5_60 engine (string_hash) is spec-defined: first
    15 hex chars of the standard MD5 digest parsed as an int. Pin the
    Spark expression against Python's hashlib so the DuckDB oracle, the
    Spark side, and the written spec can never drift independently."""
    import hashlib

    from callysto_spark.operators.dedup import string_hash

    vals = ["hello world", "", "a b c", "ünïcode tøkens", "planted"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", string_hash(F.col("s"), "md5_60").alias("h")).collect()}
    for v in vals:
        expect = int(hashlib.md5(v.encode("utf-8")).hexdigest()[:15], 16)
        assert got[v] == expect, f"md5_60({v!r}): {got[v]} != {expect}"


def test_lsh_recall_planted_md5_60_engine(spark, sf_dir):
    """The md5_60 engine (the registry/oracle default) must keep the
    same recall contract as xxhash64: every planted one-token twin is a
    candidate pair."""
    corpus, n_twins = _planted_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, "doc_id", "text", num_hashes=64, n=4, hash_engine="md5_60")
    cands = minhash_lsh_candidates(sigs, bands=16, rows_per_band=4, hash_engine="md5_60")
    planted = {(i, i + 100000) for i in range(n_twins)}
    got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    recall = len(planted & got) / len(planted)
    assert recall >= 0.9, f"md5_60 LSH recall {recall} below contract"


def test_md5_60_minhash_and_simhash_match_python_reference(spark):
    """Third-implementation parity: recompute MinHash signatures and
    SimHash hex digests in pure Python (hashlib + the published spec:
    60-bit md5-prefix hash, (a*h+b) mod 2^31-1 permutations, per-bit
    votes) and compare against the Spark operators. With the DuckDB
    oracle this gives three independent implementations agreeing
    bit-for-bit."""
    import hashlib
    import re

    from callysto_spark.operators.dedup import (
        _MERSENNE_P,
        _hash_params,
        minhash_signatures,
        simhash,
    )

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spark line column order small sort column sort fast value"),
        (2, "Short doc"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(2)

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def shingles(text: str, n: int = 4) -> list[str]:
        toks = re.split(r"\s+", text.strip().lower())
        upper = max(len(toks) - (n - 1), 1)
        return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(upper)))

    params = _hash_params(64)
    want_sig = {}
    for doc_id, text in docs:
        hs = [h60(g) % _MERSENNE_P for g in shingles(text)]
        want_sig[doc_id] = [min((a * h + b) % _MERSENNE_P for h in hs) for a, b in params]
    got_sig = {
        r["doc"]: list(r["signature"])
        for r in minhash_signatures(df, "doc_id", "text", num_hashes=64, n=4, hash_engine="md5_60").collect()
    }
    assert got_sig == want_sig

    def py_simhash(text: str, bits: int = 64) -> str:
        toks = re.split(r"\s+", text.strip().lower())
        votes = [0] * bits
        for t in toks:
            h = h60(t)
            for i in range(bits):
                votes[i] += 1 if (h >> i) & 1 else -1
        val = sum(1 << i for i in range(bits) if votes[i] > 0)
        return format(val, "016X")

    got_sim = {
        r["doc"]: r["simhash"]
        for r in simhash(df, "doc_id", "text", hash_engine="md5_60").collect()
    }
    want_sim = {doc_id: py_simhash(text) for doc_id, text in docs}
    assert got_sim == want_sim


def test_minhash_banding_geometry_guard(spark):
    """bands*rows_per_band beyond the signature length used to hash the
    empty slice identically for EVERY doc on the out-of-range bands —
    the band self-join degenerated into a full corpus cross-join
    (silent O(n^2)). The geometry is now guarded in-plan with a located
    raise_error (r7 review)."""
    import pytest

    from callysto_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i k")],
        "doc long, text string",
    )
    ok = minhash_lsh_candidates(minhash_signatures(docs, "doc", "text", num_hashes=64))
    assert ok.count() >= 1  # matching geometry still finds the near-dup pair

    short = minhash_signatures(docs, "doc", "text", num_hashes=32)
    with pytest.raises(Exception, match="exceeds signature length"):
        minhash_lsh_candidates(short).count()  # 16*4=64 > 32


def test_lsh_bucket_cap_drops_template_cluster_keeps_twins(spark, sf_dir):
    """max_bucket_freq (the 100 TB quadratic-output guard): a template
    cluster of m near-identical docs fills whole band buckets and emits
    C(m, 2) candidate pairs — output-quadratic no matter how the join
    is scheduled. With the cap below the cluster size, every cluster
    bucket is dropped BEFORE the self-join (no cluster pairs survive,
    since the cluster members collide in EVERY band), while ordinary
    planted twins keep pairing through their size-2 buckets."""
    corpus, n_twins = _planted_corpus(spark, sf_dir)
    cluster = [(10_000_000 + i, "template boilerplate header repeated across the fleet " * 4) for i in range(12)]
    corpus = corpus.unionByName(
        spark.createDataFrame(cluster, ["doc_id", "text"])
    )
    sigs = minhash_signatures(corpus, "doc_id", "text", num_hashes=64, n=4)
    planted = {(i, i + 100000) for i in range(n_twins)}
    cluster_ids = {cid for cid, _ in cluster}

    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(sigs, bands=16, rows_per_band=4).collect()
    }
    cluster_pairs = {(a, b) for (a, b) in uncapped if a in cluster_ids and b in cluster_ids}
    assert len(cluster_pairs) == 12 * 11 // 2, "identical cluster must pair quadratically uncapped"

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(
            sigs, bands=16, rows_per_band=4, max_bucket_freq=8
        ).collect()
    }
    assert not any(a in cluster_ids and b in cluster_ids for a, b in capped), (
        "cap must drop the over-cap template buckets"
    )
    recall = len(planted & capped) / len(planted)
    assert recall >= 0.95, f"cap must not hurt ordinary twin recall: {recall:.2f}"


def test_simhash_bucket_cap_drops_template_cluster(spark):
    """Same guard on the SimHash banding path: identical template docs
    share every (band, slice) bucket; with the cap below the cluster
    size no cluster pair survives, while a distinct near-identical twin
    pair (its own size-2 buckets) still surfaces."""
    from callysto_spark.operators.dedup import simhash, simhash_candidates

    docs = [(i, "template boilerplate header repeated across the fleet pages today") for i in range(10)]
    docs += [
        (100, "the quick brown fox jumps over the lazy dog again and again today"),
        (101, "the quick brown fox jumps over the lazy dog again and again tonight"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(4)
    sims = simhash(df, "doc_id", "text")
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_candidates(sims, bands=4, max_hamming=3, max_bucket_freq=4).collect()
    }
    assert (100, 101) in capped, "size-2 twin buckets must survive the cap"
    assert not any(a < 100 and b < 100 for a, b in capped), f"cluster pairs leaked: {capped}"


def test_capped_jaccard_recompute_mode_matches_persist(spark, sf_dir):
    """shingle_reuse='recompute' (for corpora where caching the exploded
    shingle table is infeasible) must produce exactly the persist
    path's pairs — same df prefilter, no cache."""
    d = load(spark, sf_dir, "documents")["documents"]
    kw = dict(n=4, threshold=0.005, max_doc_freq=20)
    a = {tuple(r) for r in ngram_jaccard_pairs(d, "doc_id", "text", **kw).collect()}
    b = {
        tuple(r)
        for r in ngram_jaccard_pairs(
            d, "doc_id", "text", shingle_reuse="recompute", **kw
        ).collect()
    }
    assert a == b and len(a) > 0


def test_lsh_banding_cap_semantics_match_python_reference(spark):
    """Property test for the FULL banding + bucket-cap semantics (r9):
    on hypothesis-generated corpora with forced duplicate clusters, the
    capped candidate set must equal exactly

        {(a, b) : a < b share a (band, band_hash) bucket
                  whose document frequency is in [2, cap]}

    recomputed by a pure-Python third implementation (hashlib md5_60
    spec hash, affine permutations, band hashes) — and the uncapped set
    must equal the same with the df ceiling removed. This pins the
    two-pass df prefilter's semantics beyond the fixed oracle corpus:
    any drift in band slicing, band hashing, df counting, or the
    [2, cap] boundary shows up as a set mismatch."""
    import hashlib
    import re
    from collections import defaultdict

    from hypothesis import HealthCheck, given, settings, strategies as st

    from callysto_spark.operators.dedup import (
        _MERSENNE_P,
        _hash_params,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    TOKENS = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]
    text_st = st.lists(st.sampled_from(TOKENS), min_size=4, max_size=20).map(" ".join)

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def shingles(text: str, n: int = 4) -> list[str]:
        toks = re.split(r"\s+", text.strip().lower())
        upper = max(len(toks) - (n - 1), 1)
        return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(upper)))

    params = _hash_params(32)

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(data=st.data())
    def run(data):
        # a small text pool sampled WITH replacement: duplicate clusters
        # are near-certain, so buckets with df > cap actually occur
        pool = data.draw(st.lists(text_st, min_size=2, max_size=5))
        texts = data.draw(st.lists(st.sampled_from(pool), min_size=4, max_size=12))
        cap = data.draw(st.integers(min_value=2, max_value=4))
        docs = list(enumerate(texts))

        want_sigs = {}
        for doc_id, text in docs:
            hs = [h60(g) % _MERSENNE_P for g in shingles(text)]
            want_sigs[doc_id] = [min((a * h + b) % _MERSENNE_P for h in hs) for a, b in params]
        buckets = defaultdict(set)
        for doc_id, sig in want_sigs.items():
            for b in range(8):
                bh = h60(",".join(str(v) for v in sig[4 * b : 4 * b + 4]))
                buckets[(b, bh)].add(doc_id)
        want_uncapped, want_capped = set(), set()
        for members in buckets.values():
            ms = sorted(members)
            pairs = {(a, b) for i, a in enumerate(ms) for b in ms[i + 1 :]}
            want_uncapped |= pairs
            if 2 <= len(members) <= cap:
                want_capped |= pairs

        df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(3)
        sigs = minhash_signatures(df, "doc_id", "text", num_hashes=32, n=4, hash_engine="md5_60")
        got_capped = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(
                sigs, bands=8, rows_per_band=4, hash_engine="md5_60", max_bucket_freq=cap
            ).collect()
        }
        got_uncapped = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(
                sigs, bands=8, rows_per_band=4, hash_engine="md5_60"
            ).collect()
        }
        assert got_capped == want_capped, f"cap={cap}: {got_capped ^ want_capped}"
        assert got_uncapped == want_uncapped
        assert got_capped <= got_uncapped

    run()


def test_simhash_candidates_semantics_match_python_reference(spark):
    """Property test for simhash_candidates (banded blocking + exact
    in-row Hamming verify + bucket cap) directly on hypothesis-generated
    hex signatures: the output must equal exactly

        {(a, b, hamming(a,b)) : a < b share a (band, slice) bucket
                                [with df in [2, cap] when capped]
                                and hamming(a, b) <= max_hamming}

    recomputed in pure Python. Pins slice widths, the bucket-df
    boundary, and the per-hex-digit popcount Hamming fold on arbitrary
    signature clusters (mutated copies of a base — shared slices and
    near-misses are forced)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from callysto_spark.operators.dedup import simhash_candidates

    HEX = "0123456789ABCDEF"

    def ham(x: str, y: str) -> int:
        return sum(bin(int(a, 16) ^ int(b, 16)).count("1") for a, b in zip(x, y))

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(data=st.data())
    def run(data):
        base = data.draw(st.text(HEX, min_size=16, max_size=16))
        n_docs = data.draw(st.integers(4, 10))
        sigs = {}
        for doc in range(n_docs):
            s = list(base)
            for _ in range(data.draw(st.integers(0, 4))):
                pos = data.draw(st.integers(0, 15))
                s[pos] = data.draw(st.sampled_from(HEX))
            sigs[doc] = "".join(s)
        bands = data.draw(st.sampled_from([2, 4]))
        cap = data.draw(st.sampled_from([None, 2, 3]))
        max_hamming = data.draw(st.integers(1, bands - 1)) if bands > 2 else 1

        width = 16 // bands
        from collections import defaultdict

        buckets = defaultdict(set)
        for doc, s in sigs.items():
            for b in range(bands):
                buckets[(b, s[b * width : (b + 1) * width])].add(doc)
        want = set()
        for members in buckets.values():
            if cap is not None and not (2 <= len(members) <= cap):
                continue
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b2 in ms[i + 1 :]:
                    h = ham(sigs[a], sigs[b2])
                    if h <= max_hamming:
                        want.add((a, b2, h))

        df = spark.createDataFrame(list(sigs.items()), ["doc", "simhash"]).repartition(3)
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_candidates(
                df, bands=bands, max_hamming=max_hamming, max_bucket_freq=cap
            ).collect()
        }
        assert got == want, f"bands={bands} cap={cap} mh={max_hamming}: {got ^ want}"

    run()


def test_arrow_shingle_kernel_matches_jvm_on_pathological_text(spark):
    """The Arrow mapInArrow shingle kernel (r16, guide §4.2) must be
    bit-identical to the JVM higher-order-function pipeline — the
    tokenizer-contract twin check that lets ``SHINGLE_IMPL`` swap freely.
    Exercises every divergence class the text fuzz ever caught (Java
    SpecialCasing vs utf8proc: final sigma, Turkish İ; \\x0B whitespace;
    trailing-empty split semantics; truncated shingles; blank text) plus
    titlecase digraphs, ligatures and a deterministic random soup."""
    import random

    import callysto_spark.operators.dedup as D

    rng = random.Random(0xC0FFEE)
    alphabet = (
        "ab σΣςİIıẞßǄǅǆ̇\t\n\x0b\x0c\r  你🚀ﬁⅢ​.*(" + "e"
    )
    soup = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(160)
    ]
    fixed = [
        "", "   \t\n  ", "one two three four five six",
        "İstanbul ΣΑΣ ΤΕΛΟΣ Σ. straße GROSSẞ",
        "a\tb\x0bc\x0cd\re\nf", "x" * 2000, ("tok " * 50).strip(),
        "  leading and trailing  ", "end\tσ", "ǅungla ǄUNGLA ǆungla",
    ]
    rows = [(i, t) for i, t in enumerate(fixed + soup)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 4):
        old = D.SHINGLE_IMPL
        try:
            D.SHINGLE_IMPL = "jvm"
            jvm = {
                (r["doc"], frozenset(r["gs"]), len(r["gs"]))
                for r in D.shingle_arrays(df, "doc_id", "text", n).collect()
            }
            D.SHINGLE_IMPL = "arrow"
            arrow = {
                (r["doc"], frozenset(r["gs"]), len(r["gs"]))
                for r in D.shingle_arrays(df, "doc_id", "text", n).collect()
            }
        finally:
            D.SHINGLE_IMPL = old
        assert jvm == arrow, (
            f"n={n}: arrow kernel diverges from JVM kernel: "
            f"{list(jvm ^ arrow)[:4]}"
        )


def test_arrow_shingle_kernel_null_and_type_contract(spark):
    """NULL text rows are absent (stage_text contract) and the doc
    column keeps the id column's type through the Arrow kernel."""
    import callysto_spark.operators.dedup as D

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, "")], "doc_id long, text string"
    )
    old = D.SHINGLE_IMPL
    try:
        D.SHINGLE_IMPL = "arrow"
        out = D.shingle_arrays(df, "doc_id", "text", 4)
        assert dict(out.dtypes) == {"doc": "bigint", "gs": "array<string>"}
        rows = {r["doc"]: r["gs"] for r in out.collect()}
    finally:
        D.SHINGLE_IMPL = old
    assert set(rows) == {1, 3}, "NULL text must drop the doc, '' must keep it"
    assert rows[3] == [""], "blank text yields the single empty shingle"
    assert sorted(rows[1]) == ["a b c d", "b c d e"]
