"""Pure-Python BMP/WAV codec tests (ext/media_codecs.py) — the offline
multimodal decode gate. Round-trip identity, header-field conformance to
the public specs, padding behavior at every width class mod 4, and loud
rejection of anything outside the implemented profile."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from glue_etl_framework_spark.ext.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)

# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=13),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_identity(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    out = decode_bmp(encode_bmp(w, h, px))
    assert out["width"] == w
    assert out["height"] == h
    assert out["n_channels"] == 3
    assert out["pixels"] == px


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 6, 7, 8])
def test_bmp_row_padding_every_width_class(w):
    """Rows pad to 4-byte boundaries; every width mod 4 class must
    round-trip and produce the spec-exact file size."""
    h = 3
    px = bytes(range(w * h * 3 % 256)) * 0 + bytes((i * 7) % 256 for i in range(w * h * 3))
    blob = encode_bmp(w, h, px)
    stride = (w * 3 + 3) & ~3
    assert len(blob) == 54 + stride * h
    assert decode_bmp(blob)["pixels"] == px


def test_bmp_header_fields_match_spec():
    blob = encode_bmp(2, 2, bytes(12))
    assert blob[:2] == b"BM"
    file_size, _, _, offset = struct.unpack_from("<IHHI", blob, 2)
    assert file_size == len(blob)
    assert offset == 54
    hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
        "<IiiHH I".replace(" ", ""), blob, 14
    )
    assert (hdr_size, width, height, planes, bpp, compression) == (40, 2, 2, 1, 24, 0)


def test_bmp_bottom_up_row_order():
    """Spec: positive height stores rows bottom-up; first stored row must be
    the image's LAST row, in BGR."""
    # 1x2 image: top pixel RGB=(1,2,3), bottom pixel RGB=(4,5,6)
    blob = encode_bmp(1, 2, bytes([1, 2, 3, 4, 5, 6]))
    stride = 4  # 1*3 padded to 4
    first_stored = blob[54 : 54 + 3]
    assert first_stored == bytes([6, 5, 4])  # bottom row, BGR
    assert blob[54 + stride : 54 + stride + 3] == bytes([3, 2, 1])


def test_bmp_top_down_negative_height_decodes():
    """Third-party top-down files (negative height) decode too."""
    blob = bytearray(encode_bmp(1, 2, bytes([1, 2, 3, 4, 5, 6])))
    # flip height sign and swap stored rows -> same logical image
    struct.pack_into("<i", blob, 22, -2)
    stride = 4
    row0 = bytes(blob[54 : 54 + stride])
    row1 = bytes(blob[54 + stride : 54 + 2 * stride])
    blob[54 : 54 + stride] = row1
    blob[54 + stride : 54 + 2 * stride] = row0
    assert decode_bmp(bytes(blob))["pixels"] == bytes([1, 2, 3, 4, 5, 6])


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XX" + b[2:], "magic"),
        (lambda b: b[:28] + struct.pack("<H", 8) + b[30:], "24-bit"),
        (lambda b: b[:30] + struct.pack("<I", 1) + b[34:], "compress"),
        (lambda b: b[:60], "truncated"),
    ],
)
def test_bmp_rejects_outside_profile(mutate, msg):
    blob = encode_bmp(4, 4, bytes(48))
    with pytest.raises(ValueError):
        decode_bmp(mutate(blob))


def test_bmp_encode_validates_buffer():
    with pytest.raises(ValueError):
        encode_bmp(2, 2, bytes(11))
    with pytest.raises(ValueError):
        encode_bmp(0, 2, b"")


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


@given(
    rate=st.integers(min_value=1, max_value=192_000),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_identity(rate, samples):
    out = decode_wav(encode_wav(rate, samples))
    assert out["sample_rate"] == rate
    assert out["n_channels"] == 1
    assert out["samples"] == samples


def test_wav_stereo_roundtrip():
    samples = [1, -1, 100, -100, 32767, -32768]
    out = decode_wav(encode_wav(44100, samples, n_channels=2))
    assert out["n_channels"] == 2
    assert out["samples"] == samples


def test_wav_header_fields_match_spec():
    blob = encode_wav(8000, [0, 1, -1])
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    assert riff_size == len(blob) - 8
    assert blob[12:16] == b"fmt "
    fmt, ch, rate, brate, balign, bits = struct.unpack_from("<HHIIHH", blob, 20)
    assert (fmt, ch, rate, brate, balign, bits) == (1, 1, 8000, 16000, 2, 16)
    assert blob[36:40] == b"data"
    assert len(blob) == 44 + 6


def test_wav_extra_chunks_are_skipped():
    """RIFF chunk walking: a LIST chunk between fmt and data must not
    break the decode (word-aligned odd-size chunk exercised too)."""
    base = encode_wav(8000, [5, -5, 7])
    fmt_chunk = base[12:36]
    data_chunk = base[36:]
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size, padded
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    out = decode_wav(blob)
    assert out["samples"] == [5, -5, 7]


def test_wav_rejects_outside_profile():
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + bytes(40))
    blob = bytearray(encode_wav(8000, [1, 2]))
    struct.pack_into("<H", blob, 20, 3)  # IEEE-float format code
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError):
        encode_wav(8000, [1, 2, 3], n_channels=2)  # odd interleave


def test_wav_rejects_truncated_chunk():
    """A data chunk whose declared size exceeds the remaining bytes must
    raise, not silently decode fewer samples ('reject loudly', matching
    decode_bmp on truncated pixel data)."""
    blob = encode_wav(8000, [1, 2, 3, 4])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(blob[:-2])  # chop the last sample's low byte + high byte
    # declared size inflated past EOF, body intact
    tampered = bytearray(blob)
    struct.pack_into("<I", tampered, 40, 1000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(bytes(tampered))


def test_wav_rejects_short_fmt_chunk():
    """A fmt chunk whose declared size is under the 16-byte PCM header
    must raise ValueError, not leak struct.error from the header unpack
    (found by the mutation fuzz: one byte flip, 0x10 -> 0x0F, at the fmt
    size field)."""
    blob = bytearray(encode_wav(8000, [1, 2, 3, 4]))
    struct.pack_into("<I", blob, 16, 15)  # fmt chunk size: 16 -> 15
    with pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(bytes(blob))


# ---------------------------------------------------------------------------
# Decoder dispatch in ext/multimodal
# ---------------------------------------------------------------------------


def test_default_decoders_decode_real_bytes():
    from glue_etl_framework_spark.ext.multimodal import (
        default_audio_decoder,
        default_image_decoder,
    )

    px = bytes((i * 3) % 256 for i in range(8 * 4 * 3))
    feat = default_image_decoder(encode_bmp(8, 4, px))
    assert (feat["width"], feat["height"], feat["n_channels"]) == (8, 4, 3)
    assert feat["mean_luma"] == (sum(px) / len(px)) / 255.0

    au = default_audio_decoder(encode_wav(16000, [10, -20, 30]))
    assert au["n_samples"] == 3
    assert au["sample_sum"] == 20
    assert au["peak"] == 30


def test_default_decoders_still_gate_unknown_formats():
    from glue_etl_framework_spark.ext.multimodal import (
        default_audio_decoder,
        default_image_decoder,
    )

    # PNG/GIF now have real decoders: malformed bytes in a RECOGNIZED
    # container are a decode ERROR (ValueError), not an unimplemented format
    with pytest.raises(ValueError):
        default_image_decoder(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(ValueError):
        default_image_decoder(b"GIF89a garbage")
    with pytest.raises(NotImplementedError):
        default_image_decoder(b"II*\x00 tiff garbage")
    with pytest.raises(NotImplementedError):
        default_audio_decoder(b"ID3\x03 mp3 garbage")


# ---------------------------------------------------------------------------
# G.711 mu-law
# ---------------------------------------------------------------------------


def test_mulaw_canonical_values():
    from glue_etl_framework_spark.ext.media_codecs import (
        mulaw_decode_byte,
        mulaw_encode_sample,
    )

    # spec anchor points (CCITT G.711 / Sun g711.c)
    assert mulaw_decode_byte(0xFF) == 0       # +0
    assert mulaw_decode_byte(0x7F) == 0       # -0
    assert mulaw_decode_byte(0x00) == -32124  # negative full scale
    assert mulaw_decode_byte(0x80) == 32124   # positive full scale
    assert mulaw_encode_sample(0) == 0xFF
    assert mulaw_encode_sample(32767) == 0x80
    assert mulaw_encode_sample(-32768) == 0x00


def test_mulaw_decode_monotone_and_symmetric():
    from glue_etl_framework_spark.ext.media_codecs import mulaw_decode_byte

    pos = [mulaw_decode_byte(b) for b in range(0xFF, 0x7F, -1)]  # FF..80
    assert pos == sorted(pos)  # increasing magnitude
    for b in range(128):
        assert mulaw_decode_byte(b) == -mulaw_decode_byte(b | 0x80)


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=100))
@settings(max_examples=60, deadline=None)
def test_mulaw_roundtrip_within_companding_error(samples):
    from glue_etl_framework_spark.ext.media_codecs import (
        mulaw_decode_byte,
        mulaw_encode_sample,
    )

    for s in samples:
        rec = mulaw_decode_byte(mulaw_encode_sample(s))
        # segment quantization step is 2^(exp+3); worst relative error ~3%
        assert abs(rec - max(-32635, min(32635, s))) <= max(16, abs(s) * 0.04)


def test_wav_mulaw_container_roundtrip():
    from glue_etl_framework_spark.ext.media_codecs import (
        decode_wav,
        encode_wav_mulaw,
        mulaw_decode_byte,
        mulaw_encode_sample,
    )

    samples = [0, 100, -100, 5000, -5000, 32767, -32768, 7, -7]
    blob = encode_wav_mulaw(8000, samples, n_channels=1)
    # header says format 7, 8 bits
    fmt, ch, rate, _br, balign, bits = struct.unpack_from("<HHIIHH", blob, 20)
    assert (fmt, ch, rate, balign, bits) == (7, 1, 8000, 1, 8)
    out = decode_wav(blob)
    assert out["sample_rate"] == 8000
    assert out["samples"] == [
        mulaw_decode_byte(mulaw_encode_sample(s)) for s in samples
    ]


# ---------------------------------------------------------------------------
# G.711 A-law
# ---------------------------------------------------------------------------


def test_alaw_canonical_values_and_involution():
    from glue_etl_framework_spark.ext.media_codecs import (
        alaw_decode_byte,
        alaw_encode_sample,
    )

    # spec anchors (CCITT G.711 / Sun g711.c, even bits inverted)
    assert alaw_decode_byte(0x55) == -8     # smallest negative magnitude
    assert alaw_decode_byte(0xD5) == 8      # smallest positive magnitude
    assert alaw_decode_byte(0xAA) == 32256  # positive full scale
    assert alaw_decode_byte(0x2A) == -32256 # negative full scale
    # decoded values are segment midpoints: re-encoding returns the byte
    for b in range(256):
        assert alaw_encode_sample(alaw_decode_byte(b)) == b


def test_alaw_decode_symmetric():
    from glue_etl_framework_spark.ext.media_codecs import alaw_decode_byte

    for b in range(128):
        assert alaw_decode_byte(b) == -alaw_decode_byte(b | 0x80)


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=100))
@settings(max_examples=60, deadline=None)
def test_alaw_roundtrip_within_companding_error(samples):
    from glue_etl_framework_spark.ext.media_codecs import (
        alaw_decode_byte,
        alaw_encode_sample,
    )

    for s in samples:
        rec = alaw_decode_byte(alaw_encode_sample(s))
        # segment 0 step is 16 (abs error <= 8); higher segments ~6% relative
        assert abs(rec - max(-32767, min(32767, s))) <= max(8, abs(s) * 0.07)


def test_wav_alaw_container_roundtrip():
    from glue_etl_framework_spark.ext.media_codecs import (
        alaw_decode_byte,
        alaw_encode_sample,
        decode_wav,
        encode_wav_alaw,
    )

    samples = [0, 100, -100, 5000, -5000, 32767, -32768, 7, -7]
    blob = encode_wav_alaw(8000, samples)
    fmt, ch, rate, _br, balign, bits = struct.unpack_from("<HHIIHH", blob, 20)
    assert (fmt, ch, rate, balign, bits) == (6, 1, 8000, 1, 8)
    out = decode_wav(blob)
    assert out["samples"] == [
        alaw_decode_byte(alaw_encode_sample(s)) for s in samples
    ]
