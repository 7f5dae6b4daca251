"""Conformance tests for the pure-Python baseline JPEG codec
(ext/jpeg_py.py, implemented from ITU-T T.81 / Annex K): lossy round-trip
PSNR bounds across sampling modes and restart intervals, exact DC-only
behavior on solid colors, marker-layout structural checks, and loud
rejection of everything outside the baseline profile."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from glue_etl_framework_spark.ext.jpeg_py import (
    _quality_scale,
    QTAB_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _test_image(w: int, h: int, seed: int = 7) -> np.ndarray:
    """Smooth gradient + mild noise: representative photographic-ish
    content where baseline JPEG at q85 should exceed 30 dB."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    img = x * 0.6 + y * 0.4 + rng.normal(0, 4, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_roundtrip_psnr(subsample, restart_interval):
    w, h = 70, 45  # not multiples of 16: exercises padding + cropping
    img = _test_image(w, h)
    blob = encode_jpeg(
        w, h, img.tobytes(), quality=85,
        subsample=subsample, restart_interval=restart_interval,
    )
    out = decode_jpeg(blob)
    assert (out["width"], out["height"], out["n_channels"]) == (w, h, 3)
    rec = np.frombuffer(out["pixels"], np.uint8).reshape(h, w, 3)
    assert _psnr(img, rec) > 30.0
    if restart_interval:
        assert b"\xff\xdd" in blob  # DRI present
        assert b"\xff\xd0" in blob  # at least one RST0


def test_grayscale_roundtrip():
    w, h = 64, 48
    g = _test_image(w, h)[:, :, 0].copy()
    blob = encode_jpeg(w, h, g.tobytes(), quality=85, grayscale=True)
    out = decode_jpeg(blob)
    assert out["n_channels"] == 1
    rec = np.frombuffer(out["pixels"], np.uint8).reshape(h, w)
    assert _psnr(g, rec) > 35.0


@given(
    r=st.integers(0, 255), g=st.integers(0, 255), b=st.integers(0, 255),
    w=st.integers(1, 24), h=st.integers(1, 24),
    sub=st.sampled_from(["444", "420"]),
)
@settings(max_examples=40, deadline=None)
def test_solid_color_near_exact(r, g, b, w, h, sub):
    """Solid colors are pure-DC blocks: the only loss is DC quantization
    (<= q00/16 per channel in Y'CbCr), so every decoded pixel must be
    identical and within a small bound of the input."""
    img = np.full((h, w, 3), (r, g, b), dtype=np.uint8)
    blob = encode_jpeg(w, h, img.tobytes(), quality=90, subsample=sub)
    out = decode_jpeg(blob)
    rec = np.frombuffer(out["pixels"], np.uint8).reshape(h, w, 3)
    # uniformity: every pixel decodes identically
    assert (rec == rec[0, 0]).all()
    assert np.abs(rec.astype(int) - img.astype(int)).max() <= 4


def test_quality_monotone_size():
    w, h = 64, 64
    img = _test_image(w, h)
    sizes = [len(encode_jpeg(w, h, img.tobytes(), quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_marker_layout_fields():
    """Structural cross-check of the emitted interchange stream."""
    blob = encode_jpeg(10, 6, bytes(10 * 6 * 3), quality=85)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
    # find SOF0 and check dimensions + 4:4:4 factors
    i = blob.find(b"\xff\xc0")
    assert i > 0
    prec, h, w, nc = struct.unpack_from(">BHHB", blob, i + 4)
    assert (prec, h, w, nc) == (8, 6, 10, 3)
    comps = [tuple(blob[i + 10 + 3 * k : i + 13 + 3 * k]) for k in range(3)]
    assert comps == [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    # DQT carries the quality-85-scaled Annex K luma table in zigzag order
    j = blob.find(b"\xff\xdb")
    qt = _quality_scale(QTAB_LUMA, 85)
    stored = list(blob[j + 5 : j + 5 + 64])
    assert stored == [int(qt[z]) for z in ZIGZAG]


def test_entropy_byte_stuffing_roundtrips():
    """An image tuned to emit 0xFF bytes in the entropy stream must still
    decode (stuffed 0x00 removal)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)  # noisy -> long codes
    blob = encode_jpeg(40, 40, img.tobytes(), quality=95)
    sos = blob.find(b"\xff\xda")
    assert b"\xff\x00" in blob[sos:], "fixture no longer exercises stuffing"
    out = decode_jpeg(blob)
    assert out["width"] == out["height"] == 40


def test_rejects_outside_profile():
    blob = bytearray(encode_jpeg(8, 8, bytes(8 * 8 * 3)))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"XX" + bytes(blob[2:]))
    # progressive SOF2
    i = blob.find(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    # 12-bit precision
    twelve = bytearray(blob)
    twelve[i + 4] = 12
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(twelve))
    # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob[: len(blob) // 2]))
    # encoder input validation
    with pytest.raises(ValueError):
        encode_jpeg(0, 8, b"")
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, bytes(10))
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, bytes(8 * 8 * 3), subsample="422")
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, bytes(8 * 8 * 3), quality=0)


def test_appn_and_comment_segments_skipped():
    blob = encode_jpeg(8, 8, bytes(range(8 * 8 * 3 - 64)) + bytes(64))
    # splice an APP1 (EXIF-style) and a COM right after SOI
    extra = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00" \
        + b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    spliced = blob[:2] + extra + blob[2:]
    out = decode_jpeg(spliced)
    assert (out["width"], out["height"]) == (8, 8)


def test_default_image_decoder_dispatches_jpeg():
    from glue_etl_framework_spark.ext.multimodal import default_image_decoder

    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    blob = encode_jpeg(16, 16, img.tobytes(), quality=90)
    feats = default_image_decoder(blob)
    assert (feats["width"], feats["height"], feats["n_channels"]) == (16, 16, 3)
    assert 0.7 < feats["mean_luma"] < 0.85  # ~200/255


def test_half_up_rounding_is_sql_replicable():
    """The codec's two rounding sites use floor(x+0.5), chosen so the
    decode-stats oracle can replay them in SQL: verify the scalar DC-path
    replica predicts the decoder's output within +-1 for a solid color
    (the encoder's FDCT accumulates through BLAS matmul, whose summation
    order is build-dependent, so the replica can differ by an ulp at a
    floor boundary — the registry entry's kernel assert uses the same
    +-1 contract)."""
    r, g, b = 57, 201, 133
    q = 85
    ql = int(_quality_scale(QTAB_LUMA, q)[0])
    from glue_etl_framework_spark.ext.jpeg_py import QTAB_CHROMA

    qc = int(_quality_scale(QTAB_CHROMA, q)[0])
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    import math

    s = math.sqrt(0.125)

    def dc_cycle(v, qq):
        # F00 of a uniform block is mathematically 8*(v-128); the codec's
        # matmul accumulates it in a BLAS-dependent order, hence the +-1
        # output contract. The reconstruction chain (single nonzero
        # coefficient) IS replicated operation-for-operation.
        coef = 8.0 * (v - 128.0)
        qdc = math.floor(coef / qq + 0.5)
        return (s * float(qdc * qq)) * s + 128.0

    y2, cb2, cr2 = dc_cycle(y, ql), dc_cycle(cb, qc), dc_cycle(cr, qc)
    rr = min(255, max(0, math.floor(y2 + 1.402 * (cr2 - 128.0) + 0.5)))
    gg = min(255, max(0, math.floor(
        y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0) + 0.5)))
    bb = min(255, max(0, math.floor(y2 + 1.772 * (cb2 - 128.0) + 0.5)))
    blob = encode_jpeg(8, 8, bytes([r, g, b] * 64), quality=q)
    rec = np.frombuffer(decode_jpeg(blob)["pixels"], np.uint8).reshape(8, 8, 3)
    assert (rec == rec[0, 0]).all()
    assert max(abs(int(rec[0, 0][k]) - v) for k, v in enumerate((rr, gg, bb))) <= 1


@pytest.mark.parametrize("n_fill", [1, 2, 3])
def test_fill_bytes_before_markers_skipped(n_fill):
    """B.1.1.2: markers may be preceded by any number of 0xFF fill bytes —
    odd-length runs must not orphan the marker that follows."""
    blob = encode_jpeg(8, 8, bytes(8 * 8 * 3))
    i = blob.find(b"\xff\xdb")  # splice fills before the first DQT
    padded = blob[:i] + b"\xff" * n_fill + blob[i:]
    out = decode_jpeg(padded)
    assert (out["width"], out["height"]) == (8, 8)
