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


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    decoder: str = "fake",
) -> DataFrame:
    """Resize the image payloads, preserving the media schema (1→1 rows).

    'stub' marks the decode→resize→re-encode codec seam; 'fake' emits a
    deterministic payload of the target dimensions' byte budget so batch
    shape and schema round-trip is testable. Output schema == input
    MEDIA_SCHEMA with width/height updated — resize composes with any
    downstream media operator.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real resize requires an image codec; plug PIL here "
                    "(decode → resize((w,h)) → encode)"
                )
            out = pdf.copy()

            def fake_resize(b: bytes | None) -> bytes:
                # deterministic stand-in sized ~ w*h: digest-tiled bytes
                seed = hashlib.sha256((b or b"") + f"{width}x{height}".encode()).digest()
                need = min(width * height, 4096)
                return (seed * (need // len(seed) + 1))[:need]

            out["content"] = pdf["content"].map(fake_resize)
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms int, content binary, width int, height int"


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    decoder: str = "fake",
) -> DataFrame:
    """Sample frames from video/audio payloads at a fixed period
    (1→N row expansion inside the Arrow batch — the frame table stays
    distributed; no driver involvement, no shuffle).

    'stub' is the ffmpeg seam; 'fake' derives ``duration_ms/every_ms``
    deterministic frames per row (capped at ``max_frames``), so the
    exploding batch shape, schema, and cap are all testable. Rows with
    no duration (e.g. still images) yield one frame at ts 0.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/av; plug it here "
                    "(demux → seek every_ms → decode frame → encode)"
                )
            out: dict[str, list] = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "content", "width", "height")}
            for _, row in pdf.iterrows():
                dur = row["duration_ms"]
                n = 1 if dur is None or pd.isna(dur) else max(1, min(int(dur) // every_ms, max_frames))
                for i in range(n):
                    ts = i * every_ms
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["content"].append(
                        hashlib.sha256((row["content"] or b"") + ts.to_bytes(8, "big")).digest()
                    )
                    out["width"].append(row["width"])
                    out["height"].append(row["height"])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
