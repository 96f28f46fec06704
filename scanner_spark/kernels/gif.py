"""Pure-numpy GIF codec (GIF87a/89a, LZW).

Third real still-image codec after PNG (``kernels/image.py``) and baseline
JPEG (``kernels/jpeg.py``): shrinks ``multimodal._fake_decode``'s surface
to WebP-class formats only.  The reference ingests image format groups
opaquely and hands decode to kernels (scanner/engine/ingest.cpp:1004);
here the codec itself is in-repo because the container ships no image
libraries.

Scope: still images — the FIRST image of an animation is decoded (the
multimodal image column contract is one frame per payload; animations are
FrameColumn/video territory).  Both global and local color tables,
interlaced images, image-descriptor placement (the first frame is
composited onto the logical-screen canvas at its (x0, y0), background
color filling the rest — output dims are always the header's sw x sh),
and the GCE transparency flag (transparent pixels show the background
canvas) are handled.  The encoder writes non-interlaced GIF89a with a power-of-two
global color table and REAL variable-width LZW (with dictionary resets at
code 4096 per spec), so encode→decode round-trips are byte-exact for any
image of ≤256 distinct colors — the property the tests pin.

Everything is stdlib+numpy; the LZW hot loops are per-code (not per-pixel)
Python over the driver-bounded payload sizes the suite uses — the Spark
side runs this inside Arrow-batched ``mapInPandas`` like every other codec.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")
MAX_CODE = 4096  # 12-bit LZW ceiling, per spec


# ---------------------------------------------------------------------------
# LZW (GIF variant: little-endian bit packing, variable code width,
# clear/EOI codes, width grows AFTER the code that fills the table)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary: code -> byte sequence; rebuilt on every clear
    def fresh():
        d = {i: (i,) for i in range(clear)}
        return d

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
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
        if prev is not None and next_code < MAX_CODE:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev: tuple[int, ...] = ()
    for v in indices.tolist():
        cur = prev + (v,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < MAX_CODE:
            table[cur] = next_code
            # decoder grows width when ITS next_code reaches 2^width; the
            # encoder's next_code leads by one, so grow after assignment
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            # table full: reset, as real encoders do
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = (v,)
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _read_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF sub-blocks starting at ``pos``; returns (bytes,
    position past the terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            break  # truncated: tolerate, like the LZW path
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        pos += n
    return b"".join(chunks), pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 RGB of the first image."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    transparent = None  # GCE transparent color index, if flagged
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks (GCE/comment/app...)
            label = data[pos + 1] if pos + 1 < len(data) else 0
            pos += 2
            blocks, pos = _read_blocks(data, pos)
            if label == 0xF9 and len(blocks) >= 4 and (blocks[0] & 0x01):
                transparent = blocks[3]
        elif b == 0x2C:  # image descriptor
            x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code_size = data[pos]
            pos += 1
            lzw, pos = _read_blocks(data, pos)
            idx = np.asarray(
                _lzw_decode(lzw, min_code_size), dtype=np.int64
            )
            if idx.size < w * h:  # truncated image: pad with 0
                idx = np.concatenate(
                    [idx, np.zeros(w * h - idx.size, dtype=np.int64)]
                )
            idx = idx[: w * h].reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                deinter = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, h, step)
                    for r in rows:
                        deinter[r] = idx[src]
                        src += 1
                idx = deinter
            rgb = ct[np.clip(idx, 0, len(ct) - 1)]
            if x0 == 0 and y0 == 0 and w == sw and h == sh and transparent is None:
                return rgb  # full-screen opaque image: no compositing
            # composite the first frame onto the logical screen at its
            # (x0, y0) placement: canvas = background color (GCT entry of
            # the header's bg index; black without a GCT), transparent
            # pixels (GCE flag) leave the canvas showing through.  Output
            # dims always == the header's logical screen (sw, sh).
            # the logical-screen background_color_index refers to the GLOBAL
            # color table (GIF89a §18) — not the frame's active (possibly
            # local) table
            bg_rgb = (
                gct[min(bg, len(gct) - 1)]
                if gct is not None
                else np.zeros(3, dtype=np.uint8)
            )
            canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
            ch = min(h, max(sh - y0, 0))
            cw = min(w, max(sw - x0, 0))
            if ch > 0 and cw > 0:
                patch = rgb[:ch, :cw]
                if transparent is not None:
                    mask = idx[:ch, :cw] != transparent
                    region = canvas[y0 : y0 + ch, x0 : x0 + cw]
                    canvas[y0 : y0 + ch, x0 : x0 + cw] = np.where(
                        mask[:, :, None], patch, region
                    )
                else:
                    canvas[y0 : y0 + ch, x0 : x0 + cw] = patch
            return canvas
        elif b == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB (≤256 distinct colors) -> GIF89a bytes.
    Exact: decode_gif(encode_gif(img)) == img pixel-for-pixel."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_gif expects (H, W, 3)")
    flat = img.reshape(-1, 3)
    # pack RGB into one int before unique: np.unique(axis=0) sorts rows
    # through a void-dtype argsort (~0.4 ms for a 32x32 image — half the
    # encode cost); the packed scalar path sorts natively and yields the
    # SAME lexicographic (r, g, b) order, so palette bytes and index
    # stream are unchanged
    packed = (
        (flat[:, 0].astype(np.int32) << 16)
        | (flat[:, 1].astype(np.int32) << 8)
        | flat[:, 2].astype(np.int32)
    )
    upacked, idx = np.unique(packed, return_inverse=True)
    palette = np.stack(
        [(upacked >> 16) & 255, (upacked >> 8) & 255, upacked & 255], axis=1
    ).astype(np.uint8)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(
            f"GIF is palettized: {n_colors} distinct colors > 256 "
            "(quantize first)"
        )
    # color table size: power of two >= n_colors, minimum 2
    bits = max(1, int(np.ceil(np.log2(max(n_colors, 2)))))
    table_n = 1 << bits
    ct = np.zeros((table_n, 3), dtype=np.uint8)
    ct[:n_colors] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += ct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    min_code_size = max(2, bits)
    out.append(min_code_size)
    lzw = _lzw_encode(idx.astype(np.int64), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
