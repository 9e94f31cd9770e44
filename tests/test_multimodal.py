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


def test_wav_roundtrip_pure_python():
    """decode_audio_real is REAL container parsing: RIFF magic, mono/16-bit
    validation, exact int16 sample round-trip (no Spark)."""
    import numpy as np

    from bakery_big_data_spark.operators.multimodal import (
        decode_audio_real,
        wav_encode_pcm16,
    )

    samples = [0, 1, -1, 127, -32768, 32767, 42]
    payload = wav_encode_pcm16(samples, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out = decode_audio_real(payload)
    assert out.dtype == np.int64
    assert out.tolist() == samples
    # corrupted container must raise, as a production decode stage would
    with pytest.raises(Exception):
        decode_audio_real(b"\x00\x01\x02\x03not a wav")


def test_wav_media_real_decode_rms_matches_fake_path(spark, sf_dir):
    """The real-WAV RMS row must produce exactly the values the byte-level
    fake path produced (the PCM stream IS the codepoint stream), proving the
    oracle continuity of the re-pointed row AND that genuine RIFF bytes flow
    through the Spark plan."""
    from bakery_big_data_spark.operators.multimodal import (
        attach_media_columns,
        attach_wav_audio,
        audio_window_rms,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    wav_media = attach_wav_audio(docs, "text", "doc_id")
    row = wav_media.select("payload", "codec", "sample_rate").first()
    assert bytes(row.payload)[:4] == b"RIFF"  # genuine container on the wire
    assert row.codec == "pcm_s16le" and row.sample_rate == 16000

    real = sorted(
        map(
            tuple,
            audio_window_rms(wav_media, window=100, real_decode=True).collect(),
        )
    )
    fake = sorted(
        map(
            tuple,
            audio_window_rms(
                attach_media_columns(docs, "text", "doc_id"), window=100
            ).collect(),
        )
    )
    assert real == fake and len(real) > 0


def test_bmp_roundtrip_pure_python():
    """decode_image_bmp is REAL container parsing: magic/planes/bpp/
    compression validation, bottom-up row re-flip, exact pixel-stream
    round-trip modulo the deterministic row pad."""
    from bakery_big_data_spark.operators.multimodal import (
        bmp_encode_raw24,
        decode_image_bmp,
    )

    s = b"the quick brown fox jumps over the lazy dog" * 3
    payload = bmp_encode_raw24(s, width=16)
    assert payload[:2] == b"BM"
    data, w, h = decode_image_bmp(payload)
    pad = (48 - len(s) % 48) % 48
    assert data == s + b"\x00" * pad and w == 16 and h == len(data) // 48
    with pytest.raises(ValueError):
        decode_image_bmp(b"XXnot a bmp at all")
    # corrupted bpp field must be rejected, not silently mis-decoded
    bad = bytearray(payload)
    bad[28] = 8  # biBitCount 24 -> 8
    with pytest.raises(ValueError):
        decode_image_bmp(bytes(bad))


def test_y4m_roundtrip_pure_python():
    """decode_video_y4m is REAL container parsing: stream magic, header
    params, every FRAME marker and frame length validated."""
    from bakery_big_data_spark.operators.multimodal import (
        decode_video_y4m,
        y4m_encode_mono,
    )

    s = bytes(range(256)) * 2 + b"tail"
    payload = y4m_encode_mono(s, width=16, height=16)
    assert payload.startswith(b"YUV4MPEG2 ")
    frames, w, h = decode_video_y4m(payload)
    assert w == 16 and h == 16 and all(len(f) == 256 for f in frames)
    pad = (256 - len(s) % 256) % 256
    assert b"".join(frames) == s + b"\x00" * pad
    with pytest.raises(ValueError):
        decode_video_y4m(b"NOTY4M W16 H16\nFRAME\n" + b"\x00" * 256)
    # truncated final frame must raise
    with pytest.raises(ValueError):
        decode_video_y4m(payload[:-10])


def test_decode_quarantine_split(spark, sf_dir):
    """Dead-letter decode semantics: the id-keyed fault injection lands
    every corrupted asset in quarantine with the RIGHT diagnosis, no
    asset is dropped, and the clean side's features are byte-identical
    to a decode of the uncorrupted corpus (one rotten object never
    perturbs its batch-mates)."""
    from bakery_big_data_spark.operators.multimodal import (
        attach_bmp_images,
        bmp_decode_quarantine,
        bmp_image_features,
        corrupt_bmp_payloads,
    )
    from bakery_big_data_spark.plans.base import t

    docs = t(spark, sf_dir, "documents")
    media = attach_bmp_images(docs, text_col="text", id_col="doc_id")
    out = bmp_decode_quarantine(corrupt_bmp_payloads(media)).collect()

    n_docs = docs.count()
    assert len(out) == n_docs, "quarantine stage dropped assets"
    expected_reason = {3: "bad_magic", 5: "bad_header", 6: "truncated_pixels"}
    by_id = {r.media_id: r for r in out}
    assert set(by_id) == {r.doc_id for r in docs.select("doc_id").collect()}
    n_bad = 0
    for mid, r in by_id.items():
        want = expected_reason.get(mid % 7)
        if want is None:
            assert r.status == "ok" and r.reason is None
            assert r.n_bytes is not None and r.byte_checksum is not None
        else:
            n_bad += 1
            assert r.status == "quarantined" and r.reason == want
            assert r.n_bytes is None and r.byte_checksum is None
    assert n_bad > 0, "corpus too small to inject any fault"

    clean = {
        r.media_id: (r.n_bytes, r.byte_checksum)
        for r in bmp_image_features(media).collect()
    }
    for mid, r in by_id.items():
        if r.status == "ok":
            assert (r.n_bytes, r.byte_checksum) == clean[mid]
