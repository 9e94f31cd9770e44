"""Multimodal plumbing tests: schema, Arrow batch shapes, decode stub
behavior, one-to-many expansion, determinism."""

from __future__ import annotations

import pytest

from bakery_big_data_spark.operators.multimodal import (
    attach_media_columns,
    decode_image_real,
    fake_decode_bytes,
    frame_sample,
    image_features,
)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x00\x01")


def test_fake_decode_deterministic():
    a1, w, h = fake_decode_bytes(b"hello world!", width=4)
    a2, _, _ = fake_decode_bytes(b"hello world!", width=4)
    assert (a1 == a2).all() and w == 4 and h == 3


def test_media_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_media_columns(docs, "text", "doc_id")
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["kind"] == "string"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_media_columns(docs, "text", "doc_id")
    feats = image_features(media).collect()
    n_docs = docs.count()
    assert len(feats) == n_docs  # exactly one feature row per asset
    by_id = {r.media_id: r for r in feats}
    sample = docs.limit(5).collect()
    for d in sample:
        raw = d.text.encode("utf-8")
        r = by_id[d.doc_id]
        assert r.n_bytes == len(raw)
        assert r.byte_checksum == sum(raw)
        assert r.fake_height == (len(raw) + 15) // 16


def test_frame_sample_expansion(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_media_columns(docs, "text", "doc_id")
    frames = frame_sample(media, frame_bytes=64, every=2).collect()
    assert len(frames) > docs.count() * 0  # one-to-many rows exist
    # spot-check one doc's expansion against python
    d = docs.limit(1).collect()[0]
    raw = d.text.encode("utf-8")
    expect = [
        (idx, len(raw[idx * 64 : (idx + 1) * 64]))
        for idx in range(0, (len(raw) + 63) // 64, 2)
    ]
    got = sorted(
        (r.frame_idx, r.frame_len) for r in frames if r.media_id == d.doc_id
    )
    assert got == expect
