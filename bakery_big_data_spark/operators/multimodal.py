"""Multimodal (binary-column) operators: typed media schema, decode stubs,
feature extraction, frame sampling — Arrow-batched ``mapInPandas`` plumbing.

LLM-data-pipeline extension family.  Media payloads are opaque ``BINARY``
columns with typed metadata (the lakehouse-native layout: bytes inline for
small assets, object-store URIs for large ones — same schema either way).

The image/video codecs (PIL/ffmpeg) are NOT in this environment, so
``decode_image_real`` raises ``NotImplementedError`` after an import probe,
and those pipelines run on clearly-marked **deterministic fake decoders**
(bytes → uint8 sample grid).  **Audio decode is REAL**: WAV (RIFF/PCM) is
parseable with the stdlib alone, so :func:`decode_audio_real` does genuine
container parsing (``wave`` + numpy frombuffer on the int16 frame bytes)
and :func:`attach_wav_audio` writes genuine RIFF containers — the audio RMS
row certifies real-bytes decode end to end (r09 verdict task 4; reference
analog: the equipment sensor payloads, generate_equipment_metrics.py:106-141).
Everything Spark-side — schema, Arrow batch handling, ``mapInPandas``
signatures, one-to-many frame expansion, partition balance — is real and
tested (tests/test_multimodal.py), which is the part that has to survive a
100 TB corpus: decode is embarrassingly parallel, map-only, no shuffle;
batches stream through Arrow without materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Typed metadata carried beside every payload (all modalities; unused
#: fields are NULL) — mirrors an asset-catalog row.
MEDIA_META_DDL = (
    "media_id LONG, kind STRING, payload BINARY, "
    "width INT, height INT, sample_rate INT, duration_ms INT, codec STRING"
)

FEATURES_DDL = (
    "media_id LONG, n_bytes INT, byte_checksum LONG, mean_byte DOUBLE, "
    "fake_width INT, fake_height INT"
)

FRAMES_DDL = "media_id LONG, frame_idx INT, frame_len INT, frame_checksum LONG"

RMS_DDL = "media_id LONG, window_idx INT, rms DOUBLE"

PHASH_DDL = "media_id LONG, phash_hi LONG, phash_lo LONG"


def decode_image_real(payload: bytes):
    """Real image decode — unavailable here by design (no codec libs)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # the only path in this container
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "use fake_decode_bytes (deterministic stand-in)"
        ) from exc
    raise NotImplementedError("real decode path intentionally stubbed")


def wav_encode_pcm16(samples, sample_rate: int = 16000) -> bytes:
    """Write a genuine mono 16-bit PCM RIFF/WAV container around ``samples``
    (any int iterable in [-32768, 32767]) — stdlib ``wave`` only."""
    import io
    import wave

    import numpy as np

    pcm = np.asarray(list(samples), dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_audio_real(payload: bytes):
    """REAL audio decode: parse a RIFF/WAV container (stdlib ``wave``) and
    return the mono int16 PCM samples as an int64 numpy array.

    This is not a stub — the RIFF magic, chunk lengths, channel count and
    sample width are all validated by the container parser, so a corrupted
    or non-WAV payload raises, exactly as a production decode stage would.
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"expected mono 16-bit PCM, got {w.getnchannels()}ch "
                f"{8 * w.getsampwidth()}-bit"
            )
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2").astype(np.int64)


def bmp_encode_raw24(samples: bytes, width: int = 16) -> bytes:
    """Write a genuine 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER) whose pixel array IS ``samples`` zero-padded to a
    whole number of rows — stdlib ``struct`` only.

    ``width`` pixels × 3 bytes = 48-byte rows (4-byte aligned by
    construction, so no per-row pad ambiguity); rows are stored bottom-up
    per the BMP spec and re-flipped by the decoder, making the round trip
    byte-exact."""
    import struct

    row = width * 3
    n = len(samples)
    pad = row if n == 0 else (row - n % row) % row
    data = samples + b"\x00" * pad
    height = len(data) // row
    # bottom-up row order (positive biHeight)
    pixels = b"".join(
        data[r * row : (r + 1) * row] for r in range(height - 1, -1, -1)
    )
    offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return file_header + info_header + pixels


class BmpDecodeError(ValueError):
    """BMP container validation failure with a machine-readable ``reason``
    code (``bad_magic`` / ``bad_header`` / ``truncated_pixels``) — the
    quarantine router classifies on this field, never on message text, so
    rewording a message can never silently diverge from the registered
    oracle's reason taxonomy."""

    def __init__(self, reason: str, message: str):
        super().__init__(message)
        self.reason = reason


def decode_image_bmp(payload: bytes):
    """REAL image decode: parse an uncompressed 24-bit BMP container
    (stdlib ``struct``) and return (top-down flat pixel bytes, width,
    height).  Magic, header size, plane count, bit depth, compression
    mode and pixel-array offset are all validated — a corrupted or
    non-BMP payload raises :class:`BmpDecodeError`, exactly as a
    production decode stage would."""
    import struct

    if payload[:2] != b"BM":
        raise BmpDecodeError("bad_magic", "not a BMP payload (missing BM magic)")
    _, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    (
        hdr_size, width, height, planes, bpp, compression, _img_size,
        _xppm, _yppm, _clr, _imp,
    ) = struct.unpack_from("<IiiHHIIiiII", payload, 14)
    if hdr_size != 40 or planes != 1 or bpp != 24 or compression != 0:
        raise BmpDecodeError(
            "bad_header",
            f"expected uncompressed 24-bit BITMAPINFOHEADER, got "
            f"hdr={hdr_size} planes={planes} bpp={bpp} comp={compression}",
        )
    row = width * 3
    rows = [
        payload[offset + r * row : offset + (r + 1) * row]
        for r in range(height)
    ]
    if any(len(r) != row for r in rows):
        raise BmpDecodeError("truncated_pixels", "truncated BMP pixel array")
    return b"".join(reversed(rows)), width, height


def y4m_encode_mono(samples: bytes, width: int = 16, height: int = 16) -> bytes:
    """Write a genuine YUV4MPEG2 stream (mono chroma mode): the documented
    plain-text stream header, then one ``FRAME`` marker + width×height
    luma bytes per frame; ``samples`` is zero-padded to whole frames."""
    frame = width * height
    n = len(samples)
    pad = 0 if n == 0 else (frame - n % frame) % frame
    data = samples + b"\x00" * pad
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    out = [header]
    for f in range(len(data) // frame):
        out.append(b"FRAME\n")
        out.append(data[f * frame : (f + 1) * frame])
    return b"".join(out)


def decode_video_y4m(payload: bytes):
    """REAL video decode: parse a YUV4MPEG2 (mono) stream and return
    (list of frame byte strings, width, height).  Stream magic, header
    parameters, every FRAME marker and every frame length are validated."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii")
    parts = header.split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    params = {p[0]: p[1:] for p in parts[1:] if p}
    if params.get("C", "420") != "mono":
        raise ValueError(f"expected Cmono, got C{params.get('C')}")
    width, height = int(params["W"]), int(params["H"])
    frame = width * height
    frames = []
    pos = nl + 1
    while pos < len(payload):
        marker_end = payload.index(b"\n", pos)
        if payload[pos:marker_end].split(b" ")[0] != b"FRAME":
            raise ValueError("malformed frame marker")
        start = marker_end + 1
        chunk = payload[start : start + frame]
        if len(chunk) != frame:
            raise ValueError("truncated frame")
        frames.append(chunk)
        pos = start + frame
    return frames, width, height


def fake_decode_bytes(payload: bytes, width: int = 16):
    """Deterministic fake decode: raw bytes as a uint8 sample grid.

    Stands in for pixel/PCM decoding; byte-for-byte reproducible so feature
    outputs are stable across runs and engines.
    """
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    h = (len(arr) + width - 1) // width
    return arr, width, h


def attach_media_columns(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a typed media frame from a text table: payload = UTF-8 bytes
    (deterministic, verifiable byte-level in any engine), kind round-robin
    over modalities, metadata typed per kind."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(kind == "image", F.lit(16)).cast("int").alias("width"),
        F.when(kind == "image", F.lit(16)).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(100)).cast("int").alias("sample_rate"),
        F.when(kind == "video", F.lit(4000)).cast("int").alias("duration_ms"),
        F.lit("fake/raw").alias("codec"),
    )


def attach_wav_audio(
    df: DataFrame, text_col: str, id_col: str, sample_rate: int = 16000
) -> DataFrame:
    """Build a typed audio-media frame whose payloads are GENUINE RIFF/WAV
    bytes: each document's UTF-8 codepoints become the int16 PCM sample
    stream (deterministic, so the DuckDB oracle can restate the decoded
    samples as ``unicode(c)`` without parsing the container).  Arrow-batched
    mapInPandas encode — map-only, nothing partition-sized in memory."""

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                samples = text.encode("utf-8")
                rows.append(
                    (
                        int(did),
                        "audio",
                        wav_encode_pcm16(samples, sample_rate),
                        None,
                        None,
                        sample_rate,
                        (len(samples) * 1000) // sample_rate,
                        "pcm_s16le",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "payload",
                    "width",
                    "height",
                    "sample_rate",
                    "duration_ms",
                    "codec",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(encode, MEDIA_META_DDL)


def attach_bmp_images(
    df: DataFrame, text_col: str, id_col: str, width: int = 16
) -> DataFrame:
    """Typed image-media frame with GENUINE 24-bit BMP payloads: the
    document's UTF-8 bytes are the pixel array (zero-padded to whole
    rows), so the container parse is real while the oracle restates the
    decoded pixels as codepoints + a deterministic pad."""

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                samples = text.encode("utf-8")
                payload = bmp_encode_raw24(samples, width)
                h = (len(payload) - 54) // (width * 3)
                rows.append(
                    (int(did), "image", payload, width, h, None, None, "bmp24")
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "sample_rate", "duration_ms", "codec",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(encode, MEDIA_META_DDL)


def attach_y4m_videos(
    df: DataFrame, text_col: str, id_col: str,
    width: int = 16, height: int = 16,
) -> DataFrame:
    """Typed video-media frame with GENUINE YUV4MPEG2 payloads (mono):
    document bytes become the luma plane stream, zero-padded to whole
    width×height frames."""

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                samples = text.encode("utf-8")
                n_frames = (len(samples) + width * height - 1) // (
                    width * height
                )
                rows.append(
                    (
                        int(did), "video",
                        y4m_encode_mono(samples, width, height),
                        width, height, None, n_frames * 40, "y4m_mono",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "sample_rate", "duration_ms", "codec",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(encode, MEDIA_META_DDL)


def bmp_image_features(media: DataFrame) -> DataFrame:
    """Per-asset pixel features over REAL BMP decode: container-validated
    parse, then size / checksum / mean over the top-down pixel stream.
    Same Arrow iterator shape as :func:`image_features`."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data, w, h = decode_image_bmp(bytes(payload))
                total = sum(data)
                rows.append(
                    (
                        int(mid), len(data), total,
                        total / len(data) if data else 0.0, w, h,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "byte_checksum", "mean_byte",
                    "fake_width", "fake_height",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, FEATURES_DDL
    )


def y4m_frame_stats(media: DataFrame) -> DataFrame:
    """Per-frame stats over REAL Y4M decode: every validated frame emits
    (media_id, frame_idx, frame_len, frame_checksum) — the real-container
    analog of :func:`frame_sample`'s one-to-many expansion."""

    def stats(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "frame_idx": [], "frame_len": [],
                "frame_checksum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _w, _h = decode_video_y4m(bytes(payload))
                for idx, fr in enumerate(frames):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(fr))
                    out["frame_checksum"].append(sum(fr))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(stats, FRAMES_DDL)


def image_features(media: DataFrame, grid_width: int = 16) -> DataFrame:
    """Per-asset byte features via Arrow-batched mapInPandas: size, checksum,
    mean sample, fake-decoded grid dims.  One output row per input row;
    batches stream (Iterator → Iterator), nothing partition-sized in memory.
    """

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr, w, h = fake_decode_bytes(bytes(payload), grid_width)
                total = int(arr.sum())
                rows.append(
                    (
                        int(mid),
                        int(arr.size),
                        total,
                        total / arr.size if arr.size else 0.0,
                        w,
                        h,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "byte_checksum",
                    "mean_byte",
                    "fake_width",
                    "fake_height",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, FEATURES_DDL
    )


def perceptual_hash(media: DataFrame) -> DataFrame:
    """dHash-style perceptual fingerprint over the decoded sample stream:
    downsample the payload into 127 equal spans, emit one gradient
    bit per adjacent span pair (``mean(span_k) > mean(span_k+1)``, compared
    as the exact integer cross product ``sum_k·len_k+1 > sum_k+1·len_k``),
    packed into two 63-bit BIGINT halves — the same ``(id, hi, lo)``
    signature shape the SimHash family's banded-Hamming join consumes
    (:func:`bakery_big_data_spark.operators.dedup.simhash_banded_pairs`).

    On real images this is the classic resize-9×8 → adjacent-pixel-gradient
    dHash (robust to re-encoding and brightness shifts, since only the
    gradient SIGN survives); here the decode is the deterministic byte
    stand-in, so every bit is restatable in ANSI SQL and the DuckDB oracle
    certifies the fingerprint math end to end.  Map-only Arrow batches —
    fingerprinting adds no shuffle at any corpus size.
    """
    # 127 chunks -> 126 gradient bits, packed as two 63-bit BIGINT halves.
    # The signature WIDTH is the banded-Hamming join's scale dial: at a
    # fixed Hamming cut of 9, pigeonhole needs >= 10 bands, so a 62-bit
    # signature forces ~6-bit band values (<= 128 distinct buckets per
    # band) and candidate volume degenerates to ~n²/64 — measured as a
    # 200 s wall at a 50 k-doc corpus (r09 sf1-equivalent stress).  126
    # bits give 12/13-bit bands (4-8 k buckets per band): same Hamming
    # cut, same pigeonhole recall guarantee, ~64x fewer candidates, and
    # the per-doc cost stays one cumulative-sum pass.
    n_chunks = 127

    def ph(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        ks = np.arange(n_chunks + 1, dtype=np.int64)
        out_cols = ["media_id", "phash_hi", "phash_lo"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr, _, _ = fake_decode_bytes(bytes(payload))
                n = arr.size
                b = (ks * n) // n_chunks
                csum = np.concatenate(
                    ([0], np.cumsum(arr, dtype=np.int64))
                )
                cs = csum[b[1:]] - csum[b[:-1]]
                cl = b[1:] - b[:-1]
                # zero-length spans (payload shorter than n_chunks) sum to
                # 0 with length 0, making both cross products 0 — bit 0,
                # matching the oracle's NULL-comparison semantics
                bits = cs[:-1] * cl[1:] > cs[1:] * cl[:-1]
                lo = int(sum(1 << k for k in range(63) if bits[k]))
                hi = int(sum(1 << k for k in range(63) if bits[k + 63]))
                rows.append((int(mid), hi, lo))
            yield pd.DataFrame(rows, columns=out_cols)

    return media.select("media_id", "payload").mapInPandas(ph, PHASH_DDL)


def frame_sample(
    media: DataFrame, frame_bytes: int = 256, every: int = 4
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from each payload —
    one-to-many mapInPandas expansion (media → frames), the shape a real
    video frame-sampler has."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_len": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every):
                    chunk = b[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(chunk))
                    out["frame_checksum"].append(sum(chunk))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(sample, FRAMES_DDL)


def audio_window_rms(
    media: DataFrame, window: int = 100, real_decode: bool = False
) -> DataFrame:
    """Windowed RMS over decoded PCM samples: one row per ``window``
    samples — int-exact sum of squares, one sqrt per window.

    ``real_decode=True`` runs :func:`decode_audio_real` (genuine RIFF/WAV
    container parsing) on each payload; the default fake decoder reads the
    raw bytes as the sample grid.  Either way the kernel is a map-only
    Arrow-batched pass — decode parallelism is per-asset, no shuffle."""

    def rms(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "window_idx": [], "rms": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if real_decode:
                    arr = decode_audio_real(bytes(payload))
                else:
                    arr, _, _ = fake_decode_bytes(bytes(payload))
                for widx in range(0, (len(arr) + window - 1) // window):
                    chunk = arr[widx * window : (widx + 1) * window].astype("int64")
                    out["media_id"].append(int(mid))
                    out["window_idx"].append(widx)
                    out["rms"].append(
                        math.sqrt(int((chunk * chunk).sum()) / len(chunk))
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(rms, RMS_DDL)


def video_frame_near_dup(
    media: DataFrame,
    frame_bytes: int = 256,
    every: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """Clip-level partial-duplicate detection across videos: videos
    sharing ``min_shared`` or more sampled frames — the multimodal analog
    of C4 cross-document span dedup (a training-data pipeline drops or
    links videos that contain the same footage, not just whole-file
    duplicates).

    Every ``every``-th fixed-size frame of each video payload is hashed
    and equi-joined across videos on the 32-byte hex ``md5(frame)`` as
    the ONLY join column — the shuffle carries (media_id, md5) per
    sampled frame, never the 256-byte chunks themselves (joining on the
    raw chunk, or adding a chunk-equality conjunct, would make the chunk
    a shuffle key: Catalyst's ExtractEquiJoinKeys promotes every
    cross-side equality — even one written as a post-join filter — into
    the hash-join key).  Two distinct chunks only pair on a full md5
    collision (2^-128; no verification re-fetch is worth that risk
    profile for near-dup LINKING, and a second join to re-fetch chunks
    would shuffle more than it saves).  Pairs then aggregate by
    shared-frame count.  Entirely built-in expressions: the frame
    slicing is a ``sequence``+``transform`` projection, no UDF, so the
    sampler runs inside whole-stage codegen and the only shuffle is the
    frame-hash join.  Deterministic fake codec as elsewhere in this
    module: payload bytes stand in for decoded frames, and md5 is
    engine-portable, so the DuckDB oracle restates the IDENTICAL
    candidate predicate (join on md5(chunk)) — same-predicate
    certification, not certification-at-toy-scale.
    """
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", F.decode(F.col("payload"), "UTF-8").alias("_txt")
    )
    n_frames = F.ceil(F.length("_txt") / F.lit(frame_bytes)).cast("int")
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every))
    ).otherwise(F.array().cast("array<int>"))
    frames = vids.select(
        "media_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("frame_idx"),
                    F.substring(
                        F.col("_txt"), i * frame_bytes + 1, F.lit(frame_bytes)
                    ).alias("chunk"),
                ),
            )
        ).alias("f"),
    ).select(
        "media_id",
        F.md5(F.col("f.chunk")).alias("_fh"),
    )
    a = frames.select(
        F.col("media_id").alias("id_a"), F.col("_fh").alias("_ha")
    )
    b = frames.select(
        F.col("media_id").alias("id_b"), F.col("_fh").alias("_hb")
    )
    return (
        a.join(
            b,
            (F.col("_ha") == F.col("_hb")) & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared)
    )


QUARANTINE_DDL = (
    "media_id LONG, status STRING, reason STRING, "
    "n_bytes LONG, byte_checksum LONG"
)


def corrupt_bmp_payloads(media: DataFrame) -> DataFrame:
    """Deterministic decode-fault injection: damage a fixed, id-keyed
    subset of BMP payloads in the three ways real object-store corpora
    rot — wrong container magic, an in-header field flip, and a
    truncated pixel array — leaving every other asset byte-identical.

    ``media_id % 7`` selects the fault (3 → magic, 5 → bpp header
    field, 6 → truncation), so the quarantine split downstream is a pure
    function of the id and an ANSI-SQL oracle can restate exactly which
    assets land on the dead-letter side and why.  The modulus is FIXED:
    the registered oracle and the parity tests restate ``% 7`` literally,
    so a tunable knob here would be a silent oracle-divergence trap.  Map-only Arrow pass,
    same schema in and out — at 100 TB this stage is the test double for
    "the lake contains corrupt objects", not a production operator."""

    schema = media.schema

    def corrupt(batches: Iterator) -> Iterator:
        for pdf in batches:
            payloads = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                m = int(mid) % 7
                if m == 3:
                    b = b"XX" + b[2:]
                elif m == 5:
                    # bpp field (offset 28 in BITMAPINFOHEADER): 24 -> 8
                    b = b[:28] + b"\x08\x00" + b[30:]
                elif m == 6:
                    b = b[: max(0, len(b) - 10)]
                payloads.append(b)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    return media.mapInPandas(corrupt, schema)


def bmp_decode_quarantine(media: DataFrame) -> DataFrame:
    """Decode stage with dead-letter routing — the batch analog of
    ``streaming/ingest.py::start_dlq_sink`` applied to REAL container
    decode: every asset is parsed by :func:`decode_image_bmp`; success
    emits ``status='ok'`` plus the usual size/checksum features, any
    decode failure emits ``status='quarantined'`` with a categorized
    reason (``bad_magic`` / ``bad_header`` / ``truncated_pixels`` /
    ``decode_error``) and NULL features, and NO asset is ever dropped
    silently (reference analog: the processing_status quality-quarantine
    flow, bronze_to_silver.py:23-33, docs/data_quality.md:1-6).

    One map-only Arrow pass; per-asset try/except costs nothing JVM-side
    and keeps a single corrupt object from poisoning its whole batch —
    the property a 100 TB decode fleet actually depends on."""

    def route(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    data, _w, _h = decode_image_bmp(bytes(payload))
                except Exception as exc:  # any decode failure -> DLQ row
                    # typed reason code when the codec classified the
                    # fault; anything else (struct.error on a sub-header
                    # payload, ...) is an uncategorized decode_error
                    reason = getattr(exc, "reason", "decode_error")
                    rows.append(
                        (int(mid), "quarantined", reason, None, None)
                    )
                else:
                    rows.append(
                        (int(mid), "ok", None, len(data), sum(data))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "status", "reason", "n_bytes",
                    "byte_checksum",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        route, QUARANTINE_DDL
    )
