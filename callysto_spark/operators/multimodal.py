"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Design for 100 TB: the binary payload never leaves the executor, flows
Arrow-batched into Python exactly once per operator, and the decode/
transform emits fixed-schema columns so downstream stays relational.
Partitioning discipline: media rows are large → size partitions by
``spark.sql.files.maxPartitionBytes``, never groupBy on raw bytes (hash
the metadata key instead).

The actual codec calls (PIL/ffmpeg/soundfile) are NOT in this
container; ``decoder='stub'`` raises NotImplementedError at the exact
seam a codec plugs into, and ``decoder='fake'`` derives deterministic
pseudo-features from the bytes so the Spark-side plumbing (schema,
batch shape, partitioning) is fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, digest string, feature array<float>"


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: sha256-seeded floats in [0,1).
    Stands in for a real encoder; stable across runs/engines."""
    out: list[float] = []
    seed = payload or b"\x00"
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decoder: str = "fake",
    batch_hint: int = 256,
) -> DataFrame:
    """binary media column → fixed-dim feature vectors via mapInPandas.

    ``decoder='stub'`` marks where a real codec (PIL decode, resize,
    frame-sample, mel-spectrogram) plugs in; 'fake' produces
    deterministic features for plumbing tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real media decode requires an image/audio codec library; "
                    "plug PIL/ffmpeg here (decode → resize/frame-sample → encode features)"
                )
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_features(b or b"", dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
