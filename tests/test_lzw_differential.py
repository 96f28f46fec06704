# Differential fuzz pins for the round-17 vectorized entropy decoders
# (TIFF LZW, GIF LZW, WebP VP8L prefix reads): each new decoder is run
# against a literal copy of the RETIRED per-symbol implementation on the
# same streams — valid encodes (long enough to cycle code widths and
# force table-full clears), truncated prefixes, and random canonical
# code sets — and must produce identical output everywhere the reference
# does.

from __future__ import annotations

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Reference decoders: the pre-round-17 per-symbol bit loops, verbatim.
# ---------------------------------------------------------------------------

_LZW_CLEAR, _LZW_EOI = 256, 257


def _tiff_lzw_decode_ref(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, bitbuf, bitcnt, pos, n = 9, 0, 0, 0, len(data)
    prev: bytes | None = None
    while True:
        while bitcnt < width:
            if pos >= n:
                return bytes(out)  # stream ended without EOI: tolerate
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        bitcnt -= width
        code = (bitbuf >> bitcnt) & ((1 << width) - 1)
        if code == _LZW_EOI:
            return bytes(out)
        if code == _LZW_CLEAR:
            del table[258:]
            width, prev = 9, None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("LZW stream: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK case
        else:
            raise ValueError(f"LZW stream: code {code} beyond table")
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW stream: output exceeds strip size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _gif_lzw_decode_ref(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


# ---------------------------------------------------------------------------
# TIFF LZW
# ---------------------------------------------------------------------------


def _tiff_corpora(rng: np.random.Generator) -> list[bytes]:
    out = [
        b"",
        b"\x00",
        b"ab" * 3,
        bytes(rng.integers(0, 256, 100, dtype=np.uint8)),
        # tiny alphabet -> deep dictionary chains + KwKwK cases
        bytes(rng.integers(0, 2, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 30000, dtype=np.uint8)),
        # long random stream: fills the table past every width bump and
        # forces at least one encoder-side CLEAR + schedule restart
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),
        bytes(np.tile(rng.integers(0, 256, 64, dtype=np.uint8), 600)),
    ]
    return out


def test_tiff_lzw_differential_valid_streams():
    from scanner_spark.kernels.tiff import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0xC0DEC)
    for raw in _tiff_corpora(rng):
        enc = _lzw_encode(raw)
        assert _lzw_decode(enc, len(raw) + 16) == raw
        assert _tiff_lzw_decode_ref(enc, len(raw) + 16) == raw


def test_tiff_lzw_differential_truncated_streams():
    from scanner_spark.kernels.tiff import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0x7EC0)
    raw = bytes(rng.integers(0, 8, 20000, dtype=np.uint8))
    enc = _lzw_encode(raw)
    cuts = sorted(set(rng.integers(0, len(enc), 60).tolist()) | {0, 1, 2, len(enc) - 1})
    for cut in cuts:
        frag = enc[:cut]
        assert _lzw_decode(frag, len(raw) + 16) == _tiff_lzw_decode_ref(
            frag, len(raw) + 16
        )


def test_tiff_lzw_differential_corrupt_streams():
    from scanner_spark.kernels.tiff import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0xBAD)
    raw = bytes(rng.integers(0, 16, 4000, dtype=np.uint8))
    enc = bytearray(_lzw_encode(raw))
    for _ in range(40):
        mut = bytearray(enc)
        mut[rng.integers(0, len(mut))] ^= int(rng.integers(1, 256))
        mut = bytes(mut)
        try:
            want: object = _tiff_lzw_decode_ref(mut, len(raw) + 16)
        except ValueError:
            want = ValueError
        try:
            got: object = _lzw_decode(mut, len(raw) + 16)
        except ValueError:
            got = ValueError
        assert got == want


# ---------------------------------------------------------------------------
# GIF LZW
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mcs", [2, 3, 5, 7, 8])
def test_gif_lzw_differential_valid_streams(mcs):
    from scanner_spark.kernels.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(1000 + mcs)
    hi = 1 << mcs
    corpora = [
        np.zeros(0, dtype=np.uint8),
        np.zeros(1, dtype=np.uint8),
        rng.integers(0, hi, 50, dtype=np.uint8),
        rng.integers(0, min(2, hi), 4000, dtype=np.uint8),
        # long enough to fill the 4096-entry table -> encoder CLEAR
        rng.integers(0, hi, 30000, dtype=np.uint8),
        np.tile(rng.integers(0, hi, 37, dtype=np.uint8), 400),
    ]
    for idx in corpora:
        enc = _lzw_encode(idx, mcs)
        ref = _gif_lzw_decode_ref(enc, mcs)
        got = _lzw_decode(enc, mcs)
        assert got.dtype == np.uint8
        assert got.tolist() == ref
        assert ref == idx.tolist()


def test_gif_lzw_differential_truncated_streams():
    from scanner_spark.kernels.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0x61F)
    idx = rng.integers(0, 4, 20000, dtype=np.uint8)
    enc = _lzw_encode(idx, 2)
    cuts = sorted(set(rng.integers(0, len(enc), 60).tolist()) | {0, 1, len(enc) - 1})
    for cut in cuts:
        frag = enc[:cut]
        assert _lzw_decode(frag, 2).tolist() == _gif_lzw_decode_ref(frag, 2)


def test_gif_lzw_differential_corrupt_streams():
    from scanner_spark.kernels.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0xFACE)
    idx = rng.integers(0, 8, 4000, dtype=np.uint8)
    enc = _lzw_encode(idx, 3)
    for _ in range(40):
        mut = bytearray(enc)
        mut[rng.integers(0, len(mut))] ^= int(rng.integers(1, 256))
        mut = bytes(mut)
        try:
            want: object = _gif_lzw_decode_ref(mut, 3)
        except (ValueError, KeyError):
            want = "raise"
        try:
            got: object = _lzw_decode(mut, 3).tolist()
        except (ValueError, KeyError):
            got = "raise"
        assert got == want


# ---------------------------------------------------------------------------
# WebP VP8L prefix decoding: LUT fast path vs the retired bit walk
# ---------------------------------------------------------------------------


def _prefix_read_ref(table: dict, data: bytes, pos: int) -> tuple[int, int]:
    """The retired bit-by-bit walk over (length, code) -> symbol."""
    code = 0
    for ln in range(1, 16):
        byte = data[pos >> 3]
        code = (code << 1) | ((byte >> (pos & 7)) & 1)
        pos += 1
        if (ln, code) in table:
            return table[(ln, code)], pos
    raise ValueError("corrupt prefix code")


def _random_kraft_lengths(rng: np.random.Generator, nsym: int, maxlen: int) -> list[int]:
    """Random complete canonical code: split symbols over lengths so the
    Kraft sum is exactly 1 (build by repeatedly splitting a leaf)."""
    lens = [0] * nsym
    # start with two 1-bit symbols, then repeatedly split a random symbol
    order = rng.permutation(nsym).tolist()
    lens[order[0]] = 1
    lens[order[1]] = 1
    for s in order[2:]:
        # pick a symbol to split (its length grows by 1, new symbol gets same)
        cands = [i for i in order if lens[i] and lens[i] < maxlen]
        if not cands:
            break
        pick = cands[int(rng.integers(0, len(cands)))]
        lens[pick] += 1
        lens[s] = lens[pick]
    return lens


@pytest.mark.parametrize("maxlen,seed", [(8, 1), (11, 2), (15, 3)])
def test_webp_prefix_differential(maxlen, seed):
    from scanner_spark.kernels.webp import (
        _canonical_codes,
        _LsbReader,
        _LsbWriter,
        _PrefixDecoder,
    )

    rng = np.random.default_rng(seed)
    if maxlen == 15:
        # degenerate chain code: lengths 1..14 plus two 15s — Kraft-complete
        # with a genuine 15-bit code, forcing the non-LUT walk fallback
        lengths = list(range(1, 15)) + [15, 15]
    else:
        nsym = int(rng.integers(8, 40))
        lengths = _random_kraft_lengths(rng, nsym, maxlen)
    cc = _canonical_codes(lengths)
    syms = [s for s, ln in enumerate(lengths) if ln]
    seq = [syms[i] for i in rng.integers(0, len(syms), 500)]

    w = _LsbWriter()
    for s in seq:
        code, ln = cc[s]
        for k in range(ln - 1, -1, -1):  # MSB first, as the walk reads
            w.u((code >> k) & 1, 1)
    w.u(0, 7)  # flush padding
    data = bytes(w.buf)

    dec = _PrefixDecoder(lengths)
    dec._ensure_lut()  # lazy since round 17: built on first read
    real_max = max(ln for ln in lengths if ln)
    if real_max <= 11:
        assert dec.lut is not None  # fast path engaged
    else:
        assert dec.lut is None  # falls back to the walk

    table = {(ln, code): sym for sym, (code, ln) in cc.items()}
    br = _LsbReader(data)
    pos = 0
    for s in seq:
        got = dec.read(br)
        want, pos = _prefix_read_ref(table, data, pos)
        assert got == want == s
        assert br.pos == pos


def test_tiff_lzw_eoi_at_early_change_boundary():
    """Encoder flush off-by-one (fixed round 17): the decoder appends a
    table entry for the FINAL data code too, so a strip whose flush lands
    exactly at 510 entries must emit EOI at 10 bits.  253 distinct bytes
    force 252 in-loop emissions + 1 flush — the exact boundary.  Before
    the fix both decoders read a 10-bit garbage code (514) and raised."""
    from scanner_spark.kernels.tiff import _lzw_decode, _lzw_encode

    raw = bytes(range(253))
    enc = _lzw_encode(raw)
    assert _lzw_decode(enc, len(raw) + 16) == raw
    assert _tiff_lzw_decode_ref(enc, len(raw) + 16) == raw


def test_tiff_round_trip_lzw_boundary_image():
    """The hypothesis falsifying example that exposed the flush bug
    (h=11, w=23, c=1, seed=0, lzw, predictor=2), pinned deterministically."""
    from scanner_spark.kernels.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (11, 23, 1), dtype=np.uint8)
    out = decode_tiff(encode_tiff(img, compression="lzw", predictor=2))
    assert np.array_equal(out, img)


def test_gif_lzw_eoi_at_width_boundary():
    """Same flush off-by-one in the GIF encoder: 255 distinct indices at
    min_code_size=8 put the decoder's post-flush next_code at 512, so EOI
    must be emitted at 10 bits."""
    from scanner_spark.kernels.gif import _lzw_decode, _lzw_encode

    idx = np.arange(255, dtype=np.int64)
    enc = _lzw_encode(idx, 8)
    assert _gif_lzw_decode_ref(enc, 8) == idx.tolist()
    assert _lzw_decode(enc, 8).tolist() == idx.tolist()
