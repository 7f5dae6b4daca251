"""Corruption fuzz for the pure-Python codecs' fail-loudly contract.

Every decoder (BMP, WAV, PNG, GIF, JPEG) promises to raise ValueError on
damaged input — never to leak an internal IndexError/struct.error/
ZeroDivisionError, hang, or silently return a misdecoded frame. This
test mutates and truncates valid streams and asserts the only outcomes
are (a) a successful decode (mutations can land in don't-care bytes or
produce a different-but-valid stream) or (b) ValueError.

This class of bug is real here: fuzzing found the JPEG decoder leaking
IndexError from truncated DHT/SOF/SOS segments and ZeroDivisionError
from zero sampling factors (all fixed in ext/jpeg_py.py, alongside the
ADVICE-flagged ZRL overflow). Deterministic seeds keep the suite stable;
iteration counts are sized to run in a few seconds.
"""

from __future__ import annotations

import random
import zlib

import pytest

from glue_etl_framework_spark.ext.gif_py import decode_gif, encode_gif
from glue_etl_framework_spark.ext.jpeg_py import decode_jpeg, encode_jpeg
from glue_etl_framework_spark.ext.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from glue_etl_framework_spark.ext.png_py import decode_png, encode_png

N_MUTATIONS = 1500


def _samples():
    rng = random.Random(7)
    px24 = bytes(rng.randrange(256) for _ in range(8 * 4 * 3))
    pal = [bytes((i * 16, i * 8, i * 4)) for i in range(16)]
    return [
        ("bmp", encode_bmp(8, 4, px24), decode_bmp),
        (
            "wav",
            encode_wav(8000, [rng.randrange(-32768, 32767) for _ in range(64)]),
            decode_wav,
        ),
        (
            "png",
            encode_png(
                6, 5, bytes(rng.randrange(256) for _ in range(6 * 5 * 3)), n_channels=3
            ),
            decode_png,
        ),
        (
            "gif",
            encode_gif(8, 4, b"".join(pal[rng.randrange(16)] for _ in range(32))),
            decode_gif,
        ),
        (
            "jpeg",
            encode_jpeg(
                16,
                16,
                bytes(rng.randrange(256) for _ in range(16 * 16 * 3)),
                quality=85,
                subsample="420",
                restart_interval=2,
            ),
            decode_jpeg,
        ),
    ]


@pytest.mark.parametrize("name,blob,dec", _samples(), ids=lambda v: v if isinstance(v, str) else "")
def test_mutated_streams_decode_or_valueerror(name, blob, dec):
    # zlib.crc32, NOT hash(): str hashing is salted per process, so the
    # old seed silently made every run explore a different mutation set —
    # useful fuzzing, but a flaky suite (a run-specific wav leak appeared
    # once in dozens of runs). Randomized exploration belongs in the deep
    # fuzz probes; the committed suite must be reproducible.
    rng = random.Random(zlib.crc32(name.encode()) & 0xFFFF)
    for _ in range(N_MUTATIONS):
        b = bytearray(blob)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            dec(bytes(b))
        except ValueError:
            pass  # the contract: corrupt input fails loudly and typed


@pytest.mark.parametrize("name,blob,dec", _samples(), ids=lambda v: v if isinstance(v, str) else "")
def test_every_truncation_decodes_or_valueerror(name, blob, dec):
    for cut in range(1, len(blob)):
        try:
            dec(blob[:cut])
        except ValueError:
            pass


def test_avro_container_mutations_fail_typed():
    """Same contract for the pure-Python Avro container codec: corrupt
    bytes raise ValueError (UnicodeDecodeError/JSONDecodeError are
    ValueError subclasses), capability gaps raise AvroSchemaError —
    nothing else (fuzzing originally leaked raw zlib.error / KeyError /
    IndexError / EOFError from deep in the block walk). Known format
    limit, asserted separately below: truncation AT a block boundary is
    undetectable (Avro has no row-count footer)."""
    from glue_etl_framework_spark.io.avro_py import (
        AvroSchemaError,
        decode_container,
        encode_container,
    )

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "vals", "type": {"type": "array", "items": "double"}},
    ]}
    rows = [{"id": i, "name": None if i % 3 == 0 else f"n{i}", "vals": [i * 0.5]}
            for i in range(20)]
    blob = bytes(encode_container(schema, rows))
    rng = random.Random(zlib.crc32(b"avro") & 0xFFFF)
    for _ in range(N_MUTATIONS):
        b = bytearray(blob)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_container(bytes(b))
        except (ValueError, AvroSchemaError):
            pass
    for cut in range(1, len(blob)):
        try:
            _, recs = decode_container(blob[:cut])
            assert len(recs) <= len(rows)  # block-boundary cuts lose rows silently
        except (ValueError, AvroSchemaError):
            pass
