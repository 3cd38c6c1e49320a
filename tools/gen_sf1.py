#!/usr/bin/env python
"""Generate an sf1-equivalent dataset (10x sf0.1 row counts) for the
one-off large-scale oracle parity run (round-5 VERDICT item 7).

The driver's testdata is read-only and capped at sf0.1, so this builds
sf1 by REPLICATING sf0.1 ten times with disjoint key spaces: copy c
shifts every key column by c*SHIFT (foreign keys shifted consistently,
so join cardinalities scale exactly 10x), perturbs price-like doubles
by (1 + c*1e-4) so accumulated sums see 10x distinct magnitudes (the
point of the run: certify the fixed-point/rnd contracts at row counts
where float accumulation-order drift is largest), rewrites each
document copy's text with copy-specific marker tokens interleaved at
every 4th position (rotation alone keeps replicas as 10-deep NEAR-dup
cliques — see _vary_text — which would quadratically explode the
near-dup oracles; the markers break every spanning 4-gram), rotates
embedding coordinates per copy, and leaves dimension-like tables
(region, nation) as-is.

Oracle parity needs no distributional fidelity beyond schema + ranges:
the driver-style check runs Spark AND DuckDB on the SAME files and
compares values, so any well-shaped corpus exercises the contracts.

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sf1)
Then:  SPARK_GRAFT_TEST_SF_DIR=/tmp/sf1 python -m pytest tests/test_oracle.py -q
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PERTURB_COLS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice"],
    "events": ["value"],
}
COPY_AS_IS = ["region", "nation"]


def _vary_text(text: str, c: int) -> str:
    """Rewrite copy c's text so replicas are genuinely DISTINCT under
    shingling, not near-dups: a pure rotation preserves almost the
    whole linear n-gram set (a 100-word doc rotated by 3 shares ~94 of
    ~97 4-gram shingles — a 10-deep near-dup clique per source doc,
    and byte-identical copies whenever len(words) divides the shift).
    Interleaving a copy-specific marker token every 4th position breaks
    every 4-gram that would span it, leaving cross-copy Jaccard near
    zero while keeping realistic text shape."""
    words = text.split(" ")
    k = (c * 3) % max(len(words), 1)
    words = words[k:] + words[:k]
    out = []
    for j, w in enumerate(words):
        if j % 4 == 0:
            out.append(f"c{c}x{j // 4 % 7}")
        out.append(w)
    return " ".join(out)


def make_copy(name: str, tab: pa.Table, c: int) -> pa.Table:
    cols = {col: tab.column(col) for col in tab.column_names}
    for k in KEY_COLS.get(name, []):
        cols[k] = pc.add(cols[k], pa.scalar(c * SHIFT, type=cols[k].type))
    for k in PERTURB_COLS.get(name, []):
        cols[k] = pc.multiply(cols[k], pa.scalar(1.0 + c * 1e-4))
    if name == "documents" and c > 0:
        texts = [_vary_text(t, c) for t in cols["text"].to_pylist()]
        cols["text"] = pa.chunked_array([pa.array(texts, type=pa.string())])
        cols["n_chars"] = pa.chunked_array(
            [pa.array([len(t) for t in texts], type=pa.int64())]
        )
    if name == "embeddings" and c > 0:
        vecs = [v[c % len(v) :] + v[: c % len(v)] if v else v for v in cols["embedding"].to_pylist()]
        cols["embedding"] = pa.chunked_array(
            [pa.array(vecs, type=pa.list_(pa.float32()))]
        )
    return pa.table({n: cols[n] for n in tab.column_names})


def generate(out: str) -> None:
    """Build the sf1 corpus at ``out``. Importable so the env-gated sf1
    parity suite (tests/test_sf1_parity.py) can regenerate a missing
    corpus instead of depending on a manual one-off run.

    Scaled tables are written as DIRECTORIES of one parquet file per
    copy (``{table}.parquet/part-Nc.parquet``, 10 files) rather than a
    single concatenated file (r13 verdict item 4): the single-file
    layout made sf1 lineitem one 122 MB scan unit, so sf1 ingest trials
    lacked parallel-file admission discipline and self-flagged 30-40%
    spreads — and a single file is also the wrong 100 TB shape (one
    scan task regardless of cluster width). Spark reads the directory
    natively; DuckDB oracles glob ``dir/*.parquet`` (the sf1 parity
    suite handles both layouts)."""
    os.makedirs(out, exist_ok=True)
    for name in COPY_AS_IS:
        tab = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(tab, f"{out}/{name}.parquet")
        print(f"{name}: {tab.num_rows} rows (copied)")
    for name in KEY_COLS:
        tab = pq.read_table(f"{SRC}/{name}.parquet")
        d = f"{out}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        total = 0
        for c in range(COPIES):
            part = make_copy(name, tab, c)
            pq.write_table(part, f"{d}/part-{c:02d}.parquet")
            total += part.num_rows
        print(f"{name}: {tab.num_rows} -> {total} rows in {COPIES} files")


def main() -> None:
    generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")


if __name__ == "__main__":
    main()
