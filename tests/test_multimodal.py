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
