"""Payload-byte hash pins for the JPEG and FLAC encoders.

Round 16 rewrote both encoders' entropy layers (kernels/bitpack.py) and
verified BYTE-IDENTITY against the pre-rewrite implementations on large
dev-time golden corpora.  Those corpora were ephemeral; these pins
freeze representative payloads IN the tree so any future change that
silently shifts encoder output (and with it the lossy-decode pixel
values some closed-form DuckDB oracles assume) fails here first, with a
message that says what drifted.

A payload change is not automatically a bug — a deliberate encoder
improvement may re-pin — but it must be deliberate: re-verify the
affected oracle queries (multimodal_decode / multimodal_audio) before
updating a hash.
"""

import hashlib

import numpy as np
import pytest

from scanner_spark.kernels.flac import decode_flac, encode_flac
from scanner_spark.kernels.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

_RAW = ("the quick brown fox jumps over the lazy dog " * 80).encode()

# name -> (sha256 hex, payload length); pinned at round 16 against the
# pre-vectorization encoders (bit-identical by construction)
_PINS = {
    "jpeg_base_q85_420": (
        "e27f7c1bb29695dead41963ee39f2e9162d06f4ca1de123c67ef55a2af5582bb", 1787),
    "jpeg_base_q95_444": (
        "d642d503f59d42213551a46e3e80e6449bbb9908fe1ed098ff93a36e34b167fb", 3673),
    "jpeg_base_gray_rst3": (
        "00128e5ad4cf6afd5e15a2d579bdb64b1b47bab85a697c188d230d140fff5542", 1460),
    "jpeg_prog_q85_420": (
        "33df32b6b1d7d85e07a65c001d8033ded2fdccd8adf7a6264acecd0433ae38e1", 2009),
    "jpeg_prog_odd_rst2": (
        "7452b13ce93adf44c4f968eae469fd9df1945c00cc3d2b109f2e46c5aa4b3456", 2200),
    "flac_mono": (
        "73a4e878af3db7c025abb6f4f6507f08aa827fa0144e277968e03c2de3a3d189", 2108),
    "flac_stereo_ms": (
        "26a3f5b6ee1fb96f0e9174dd9861210b56722b144cd0f59d538bf92ba964e9cb", 4166),
    "flac_no_lpc": (
        "d392c8c52c37f61ce7163cd19760733b1f32d18a59ee5e63b6ed875277de99a6", 2108),
}


def _inputs():
    arr = np.frombuffer(_RAW[: 32 * 32 * 3], np.uint8).reshape(32, 32, 3).copy()
    i = np.arange(1300, dtype=np.int64)
    clip = ((((i * 11) % 256) - 128) * 64).astype(np.int16)
    return arr, clip


def _payloads():
    arr, clip = _inputs()
    g = arr[:, :, 0].copy()
    odd = arr[:31, :29].copy()
    st = np.stack([clip, np.roll(clip, 7)], axis=1)
    return {
        "jpeg_base_q85_420": encode_jpeg(arr, 85),
        "jpeg_base_q95_444": encode_jpeg(arr, 95, subsample=False),
        "jpeg_base_gray_rst3": encode_jpeg(g, 85, restart_interval=3),
        "jpeg_prog_q85_420": encode_jpeg_progressive(arr, 85),
        "jpeg_prog_odd_rst2": encode_jpeg_progressive(
            odd, 90, restart_interval=2),
        "flac_mono": encode_flac(clip, 16000),
        "flac_stereo_ms": encode_flac(st, 16000),
        "flac_no_lpc": encode_flac(clip, 8000, use_lpc=False),
    }


@pytest.mark.parametrize("name", sorted(_PINS))
def test_encoder_payload_bytes_pinned(name):
    pay = _payloads()[name]
    want_hash, want_len = _PINS[name]
    assert (hashlib.sha256(pay).hexdigest(), len(pay)) == (want_hash, want_len), (
        f"{name}: encoder output drifted from its round-16 pin — if this "
        "change is deliberate, re-verify the multimodal oracle queries and "
        "re-pin"
    )


def test_pinned_payloads_still_decode():
    arr, clip = _inputs()
    pays = _payloads()
    assert decode_jpeg(pays["jpeg_base_q85_420"]).shape == (32, 32, 3)
    assert np.array_equal(
        decode_jpeg(pays["jpeg_prog_q85_420"]),
        decode_jpeg(pays["jpeg_base_q85_420"]),
    )  # Annex-G: both transports carry the same quantized coefficients
    dec, rate = decode_flac(pays["flac_mono"])
    assert rate == 16000
    assert np.array_equal(dec[:, 0].astype(np.int16), clip)
