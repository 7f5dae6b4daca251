"""Conformance tests for the pure-Python GIF codec (ext/gif_py.py):
byte-exact palettized round trips, LZW dictionary-reset stress, the KwKwK
code case, hand-interlaced streams, extension/animation handling, and loud
rejection of malformed containers."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from glue_etl_framework_spark.ext.gif_py import (
    _INTERLACE_PASSES,
    _lzw_compress,
    decode_gif,
    encode_gif,
)


def _palettized(w: int, h: int, n_colors: int, seed: int) -> bytes:
    rng = random.Random(seed)
    pal = [bytes(rng.randrange(256) for _ in range(3)) for _ in range(n_colors)]
    # ensure distinctness (collisions would just shrink the palette — fine)
    return b"".join(pal[rng.randrange(n_colors)] for _ in range(w * h))


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    n_colors=st.sampled_from([1, 2, 5, 16, 64]),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_roundtrip_byte_exact(w, h, n_colors, seed):
    px = _palettized(w, h, n_colors, seed)
    out = decode_gif(encode_gif(w, h, px))
    assert (out["width"], out["height"], out["n_channels"]) == (w, h, 3)
    assert out["pixels"] == px
    assert out["n_frames"] == 1


def test_dictionary_reset_stress():
    """A 256-color noisy image overflows the 4096-entry LZW dictionary
    several times; resets on both sides must stay in sync."""
    rng = random.Random(3)
    pal = [bytes([i, (i * 7) % 256, (i * 13) % 256]) for i in range(256)]
    px = b"".join(pal[rng.randrange(256)] for _ in range(150 * 120))
    assert decode_gif(encode_gif(150, 120, px))["pixels"] == px


def test_kwkwk_case():
    """Solid-color images drive the code == len(table) branch."""
    px = bytes([9, 8, 7]) * (40 * 33)
    assert decode_gif(encode_gif(40, 33, px))["pixels"] == px


def test_interlaced_stream_decodes():
    """Re-emit an encoded image with interlaced row order + the interlace
    flag; the decoder must un-interlace back to the original."""
    w, h = 13, 11
    px = _palettized(w, h, 8, seed=5)
    blob = encode_gif(w, h, px)
    out = decode_gif(blob)
    idx_rows = []  # recover palette indices from the decoded RGB
    pal: dict[bytes, int] = {}
    indices = []
    for i in range(0, len(px), 3):
        c = px[i : i + 3]
        indices.append(pal.setdefault(c, len(pal)))
    rows = [indices[r * w : (r + 1) * w] for r in range(h)]
    inter_rows = []
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            inter_rows.append(rows[y])
    flat = bytes(v for row in inter_rows for v in row)
    # rebuild: header + GCT from the original blob, new image block
    bits = max(1, (len(pal) - 1).bit_length())
    gct_len = 3 * (1 << bits)
    head = blob[: 13 + gct_len]
    mcs = max(2, bits)
    data = _lzw_compress(flat, mcs)
    body = bytearray(b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x40")  # interlace flag
    body.append(mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        body.append(len(block))
        body += block
    body += b"\x00\x3b"
    out2 = decode_gif(head + bytes(body))
    assert out2["pixels"] == px


def test_extensions_skipped_and_frames_counted():
    w, h = 6, 4
    px = _palettized(w, h, 4, seed=9)
    blob = encode_gif(w, h, px)
    # splice a GCE + comment extension before the image descriptor
    i = blob.find(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    spliced = blob[:i] + gce + comment + blob[i:]
    out = decode_gif(spliced)
    assert out["pixels"] == px
    # duplicate the image block -> 2 frames, first frame returned
    img_block = blob[i:-1]  # up to (not incl.) trailer
    two = blob[:i] + img_block + img_block + b"\x3b"
    out2 = decode_gif(two)
    assert out2["n_frames"] == 2
    assert out2["pixels"] == px


def test_rejects_outside_profile():
    px = _palettized(8, 8, 4, seed=1)
    blob = encode_gif(8, 8, px)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"XX" + blob[2:])
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2])  # truncated
    # >256 distinct colors
    many = bytes((i % 256, (i // 256) % 256, 0)[k] for i in range(300) for k in range(3))
    with pytest.raises(ValueError, match="256"):
        encode_gif(300, 1, many)
    with pytest.raises(ValueError):
        encode_gif(0, 1, b"")
    with pytest.raises(ValueError):
        encode_gif(2, 2, bytes(5))


def test_default_image_decoder_dispatches_gif():
    from glue_etl_framework_spark.ext.multimodal import default_image_decoder

    px = bytes([100, 150, 200]) * 64
    blob = encode_gif(8, 8, px)
    feats = default_image_decoder(blob)
    assert (feats["width"], feats["height"], feats["n_channels"]) == (8, 8, 3)
    assert abs(feats["mean_luma"] - (150 / 255.0)) < 0.01
