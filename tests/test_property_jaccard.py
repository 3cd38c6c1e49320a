"""Property-based check: both ngram_jaccard_pairs strategies (self-join
exact baseline and the capped in-row scale path) match a brute-force
Python reference on random small corpora. With the cap at/above the
corpus size no shingle is dropped, so capped must equal exact."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from callysto_spark.operators.dedup import ngram_jaccard_pairs

WORDS = ["red", "blue", "fox", "dog", "jumps", "over", "lazy", "quick"]


def reference_pairs(docs, n, threshold):
    def shingles(text):
        toks = text.split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sh = {i: shingles(t) for i, t in docs}
    out = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= threshold:
                out[(a, b)] = (inter, union)
    return out


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        length = draw(st.integers(1, 12))
        words = draw(st.lists(st.sampled_from(WORDS), min_size=length, max_size=length))
        docs.append((i, " ".join(words)))
    thr = draw(st.sampled_from([0.1, 0.4, 0.8]))
    return docs, thr


@settings(max_examples=8, deadline=None)
@given(corpus())
def test_jaccard_both_strategies_match_reference(data):
    from callysto_spark.session import get_spark

    spark = get_spark("jac-prop", cpus=4)
    docs, thr = data
    want = reference_pairs(docs, 3, thr)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for cap in (None, len(docs)):  # exact self-join path, then capped in-row path
        got = {
            (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"])
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=thr, max_doc_freq=cap
            ).collect()
        }
        assert got == want, f"cap={cap} thr={thr}: {got} != {want}"
