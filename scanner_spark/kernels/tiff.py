"""Baseline TIFF codec (TIFF 6.0, uncompressed, chunky 8-bit).

Fourth real still-image codec (after PNG/JPEG/GIF): covers the
archival/scan format of document corpora.  Scope is the TIFF 6.0 baseline
that uncompressed scanners and exporters actually write — Compression=1,
8 bits per sample, chunky planar configuration, grey / RGB / RGBA, any
strip layout, both byte orders.  LZW/PackBits/JPEG-in-TIFF variants raise
(they would fall to ``multimodal._fake_decode``'s documented WebP-class
fallback if routed there; the sniffer routes them here so the error is
explicit instead).

The encoder writes a single-strip, little-endian, chunky RGB8 (or grey)
file with a minimal-but-complete IFD — byte-exact round trips with the
decoder and readable by any TIFF reader.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

# tag ids (TIFF 6.0 §8)
_W, _H, _BPS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT, _PLANAR = 273, 277, 278, 279, 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_tag_values(buf: bytes, e: str, typ: int, count: int, val_off: int) -> list[int]:
    size = _TYPE_SIZES.get(typ)
    if size is None or typ not in _TYPE_FMT:
        return []
    total = size * count
    if total <= 4:
        raw = buf[val_off : val_off + total]
    else:
        (off,) = struct.unpack_from(f"{e}I", buf, val_off)
        raw = buf[off : off + total]
    return list(struct.unpack(f"{e}{count}{_TYPE_FMT[typ]}", raw))


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> (H, W, C) uint8 (first IFD)."""
    if data[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF payload")
    e = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(f"{e}I", data, 4)
    (n_tags,) = struct.unpack_from(f"{e}H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{e}HHI", data, off)
        tags[tag] = _read_tag_values(data, e, typ, count, off + 8)
    for required in (_W, _H, _STRIP_OFF, _STRIP_CNT):
        if required not in tags:
            raise ValueError(f"TIFF missing required tag {required}")
    w, h = tags[_W][0], tags[_H][0]
    comp = tags.get(_COMP, [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (baseline uncompressed "
            "only; LZW/PackBits/JPEG variants are out of codec scope)"
        )
    spp = tags.get(_SPP, [1])[0]
    bps = tags.get(_BPS, [8])
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps}: 8-bit only")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2 not supported")
    # PhotometricInterpretation (tag 262): 0 = WhiteIsZero (greyscale,
    # inverted — common in fax/scanner output), 1 = BlackIsZero, 2 = RGB.
    # Anything else (palette=3, CMYK=5, YCbCr=6) is out of baseline scope.
    photo = tags.get(_PHOTO, [1])[0]
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric interpretation {photo} not supported "
            "(WhiteIsZero/BlackIsZero/RGB only)"
        )
    strips = b"".join(
        bytes(data[o : o + n])
        for o, n in zip(tags[_STRIP_OFF], tags[_STRIP_CNT])
    )
    need = h * w * spp
    if len(strips) < need:
        raise ValueError(f"TIFF strip data truncated: {len(strips)} < {need}")
    img = np.frombuffer(strips[:need], dtype=np.uint8).reshape(h, w, spp)
    if photo == 0:  # WhiteIsZero: 0 = white -> invert to BlackIsZero
        img = 255 - img
    return img


def encode_tiff(img: np.ndarray) -> bytes:
    """(H, W, C) uint8 (C in 1/3/4) -> single-strip little-endian TIFF."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3, 4):
        raise ValueError("encode_tiff expects 1, 3, or 4 channels")
    photo = 1 if c == 1 else 2  # BlackIsZero / RGB
    pixels = img.tobytes()
    # layout: header (8) + pixel strip + [bps array if c>1] + IFD
    strip_off = 8
    bps_off = strip_off + len(pixels)
    n_tags = 10
    ifd_off = bps_off + (2 * c if c > 1 else 0)
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += pixels
    if c > 1:
        out += struct.pack(f"<{c}H", *([8] * c))

    def tag(t, typ, count, value):
        return struct.pack("<HHI", t, typ, count) + struct.pack("<I", value)

    def tag_short(t, value):
        # SHORT value lives left-justified in the 4-byte field
        return struct.pack("<HHI", t, 3, 1) + struct.pack("<HH", value, 0)

    entries = [
        tag(_W, 4, 1, w),
        tag(_H, 4, 1, h),
        (tag_short(_BPS, 8) if c == 1 else tag(_BPS, 3, c, bps_off)),
        tag_short(_COMP, 1),
        tag_short(_PHOTO, photo),
        tag(_STRIP_OFF, 4, 1, strip_off),
        tag_short(_SPP, c),
        tag(_ROWS_PER_STRIP, 4, 1, h),
        tag(_STRIP_CNT, 4, 1, len(pixels)),
        tag_short(_PLANAR, 1),
    ]
    assert len(entries) == n_tags
    out += struct.pack("<H", n_tags) + b"".join(entries) + struct.pack("<I", 0)
    return bytes(out)
