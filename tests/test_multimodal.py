"""Multimodal plumbing: binary columns through mapInPandas with stable
schema + deterministic fake features (real codecs stubbed — see
operators/multimodal.py)."""

from __future__ import annotations

import pytest

from callysto_spark.operators.multimodal import MEDIA_SCHEMA, extract_features


def _media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", 64, 64, None),
        (2, "audio", b"RIFF fake wav", "audio/wav", None, None, 1200),
        (3, "image", None, "image/png", 0, 0, None),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_fake_decoder_schema_and_determinism(spark):
    df = _media_df(spark)
    out1 = extract_features(df, dim=8).collect()
    out2 = extract_features(df, dim=8).collect()
    assert {r["media_id"] for r in out1} == {1, 2, 3}
    by_id = {r["media_id"]: r for r in out1}
    assert by_id[1]["n_bytes"] == len(b"\x89PNG fake bytes")
    assert by_id[3]["n_bytes"] == 0
    assert all(len(r["feature"]) == 8 for r in out1)
    # deterministic across runs (fake features are content-derived)
    assert sorted(map(str, out1)) == sorted(map(str, out2))


def test_stub_decoder_raises_at_seam(spark):
    df = _media_df(spark)
    with pytest.raises(Exception) as err:
        extract_features(df, dim=4, decoder="stub").collect()
    assert "NotImplementedError" in str(err.value) or "codec" in str(err.value)


def test_resize_preserves_schema_and_composes(spark):
    from callysto_spark.operators.multimodal import resize_media

    df = _media_df(spark)
    resized = resize_media(df, 32, 32)
    assert resized.schema == df.schema  # media → media: composable
    rows = {r["media_id"]: r for r in resized.collect()}
    assert rows[1]["width"] == 32 and rows[1]["height"] == 32
    assert len(rows[1]["content"]) == 32 * 32
    # deterministic + composes with feature extraction downstream
    feats = extract_features(resize_media(df, 32, 32), dim=4).collect()
    assert {r["media_id"] for r in feats} == {1, 2, 3}


def test_frame_sampling_explodes_within_batches(spark):
    from callysto_spark.operators.multimodal import sample_frames

    df = _media_df(spark)
    frames = sample_frames(df, every_ms=300, max_frames=3).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # audio row: 1200ms / 300ms = 4 → capped at 3 frames
    assert len(by_id[2]) == 3
    assert sorted(f["ts_ms"] for f in by_id[2]) == [0, 300, 600]
    # imagery / null payloads yield exactly one frame at ts 0
    assert len(by_id[1]) == 1 and by_id[1][0]["ts_ms"] == 0
    assert len(by_id[3]) == 1
    # frame payloads are deterministic content digests
    again = sample_frames(df, every_ms=300, max_frames=3).collect()
    assert sorted(map(str, frames)) == sorted(map(str, again))
