"""Pure-Python/numpy H.264 (ITU-T Rec. H.264 / MPEG-4 AVC) codec:
I_PCM, I_16x16, I_4x4, P_L0_16x16 / P_Skip, and B_L0 / B_L1 / B_Bi
16x16 macroblocks, CAVLC entropy coding, 4:2:0 chroma.

This is the engine's answer to the reference's core asset — its
decode-on-demand H.264 pipeline (scanner/video/decoder_automata.cpp,
scanner/video/h264_byte_stream_index_creator.cpp, interval planning in
scanner/engine/column_source.cpp:120-180).  The reference wraps ffmpeg /
NVDEC for the pixel work; this container ships neither, so the DSP lives
in-repo like the PNG/JPEG/GIF codecs.  Scope now covers the reference's
decode model end to end: IDR keyframes plus forward P-frame decode
through a GOP, so GOP-pruned sparse loads decode keyframe-forward like
decoder_automata does.

What is implemented, per the spec's clause numbers:
- NAL units (§7.3.1) with emulation-prevention, SPS (§7.3.2.1) and PPS
  (§7.3.2.2) covering the baseline feature set, IDR and non-IDR slice
  headers (§7.3.3) for I and P slices.
- Macroblock layer (§7.3.5): I_PCM, I_16x16 (4 pred modes x CBP packed
  into mb_type), I_4x4 with prev_intra4x4_pred_mode signalling,
  P_L0_16x16 with mvd + median MV prediction (§8.4.1.3), P_Skip with the
  §8.4.1.1 skip-MV derivation, mb_skip_run (P_Skip and, round 13,
  B_Skip via the spatial direct derivation), intra types inside P slices
  (offset 5), CBP via both Table 9-4 columns.
- Intra prediction (§8.3): all four 16x16 luma modes (V/H/DC/Plane), all
  nine 4x4 luma modes, all four 8x8 chroma modes; round 13 adds the nine
  Intra_8x8 modes over §8.3.2.2.1-filtered references (High profile).
- transform_size_8x8 (§8.5.13, High profile / FRExt, round 13): I_NxN
  macroblocks may be Intra_8x8 and 16x16 inter macroblocks may carry
  8x8 residual blocks, both entropies — CAVLC as the four interleaved
  4x4 sub-blocks of §7.3.5.3.2, CABAC as ctxBlockCat-5 blocks (no
  coded_block_flag; significance classes structural, see
  h264_cabac._sig_key8) — with the §8.5.13.2 weighted dequant fed by
  SPS/PPS-coded 8x8 scaling lists (absent lists = normative defaults =
  loud refusal, same posture as the 4x4 lists) and the §8.7
  internal-edge deblocking skip.
- Inter prediction (§8.4.2): motion compensation at FULL QUARTER-pel
  luma precision — 6-tap half-pel FIR with the (+16)>>5 / two-stage
  (+512)>>10 rounding and the Table 8-12 quarter-pel averages — and full
  1/8-pel bilinear chroma per §8.4.2.2.2.  The encoder refines its
  integer search to half then quarter pel through the same interpolator.
- B slices (§7.3.5, Table 7-14): B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
  with one reference per list (RefPicList0[0] = nearest past,
  RefPicList1[0] = nearest future, §8.2.4.2.3), per-list median MV
  prediction, and default (p0+p1+1)>>1, explicit weighted (idc 1), or
  implicit POC-distance weighted (idc 2) bi-prediction (§8.4.2.3).
  B pictures may be references (hierarchical pyramids) and B-bearing
  streams are poc-type-0 / Main profile.  B_Direct_16x16 decodes via the
  §8.4.1.2.2 SPATIAL derivation (round 13; at this codec's whole-MB
  scope the per-4x4 colZeroFlag clause collapses to one flag per MB —
  exact within the envelope, since sub-MB-partitioned col pictures are
  refused when they decode).  B_Skip decodes as the same derivation
  with no residual (round 13).  TEMPORAL direct
  (direct_spatial_mv_pred_flag == 0) decodes via the §8.4.1.2.3
  POC-scaled co-located-motion derivation (round 13; round 14 lifts
  both direct modes to per-4x4/per-quadrant sampling of the co-located
  grids — needs POC-tagged reference states for temporal, the container
  walk supplies them; untagged decodes refuse).
- Sub-macroblock partitions (round 14, §7.3.5.1/.2): P 16x8 / 8x16 /
  P_8x8 / P_8x8ref0 and every Table 7-14 B 16x8/8x16 list combination
  plus B_8x8 with all Table 7-18 sub_mb_types (Direct/L0/L1/Bi at
  8x8/8x4/4x8/4x4) — per-4x4 motion grids, partition-granular
  §8.4.1.3 prediction with the 16x8/8x16 directional shortcuts,
  per-8x8 ref_idx, per-4x4 deblock bS; encode via
  ``part_mode=`` on encode_picture_p/b (forced layouts or the
  SAD-adaptive P chooser).
- Multi-reference P prediction (round 11): num_ref_idx_l0_active > 1
  with te(v) ref_idx_l0 per MB, the §8.4.1.3.1 same-refIdx MV-predictor
  rule, and the full RefPicList0 ordering/modification resolved by the
  container walk (sources/mp4.decode_range).  Round 12 extends this to
  multi-reference B lists (both entropies: te(v) / CABAC unary ref_idx),
  per-reference explicit weight tables, adaptive ref-pic marking (MMCO
  long-term references; round 13 completes the op set with MMCO 5's
  DPB flush + frame_num/POC rebase), and bitstream-coded scaling
  matrices;
  Round 13 adds spatial AND temporal B_Direct_16x16 / B_Skip (encode
  via b_direct=True, direct_mode="spatial"/"temporal");
  interlace / SP-SI / slice groups stay refusals.
- CAVLC residual (§9.2): coeff_token (Table 9-5 incl. the chroma-DC nC=-1
  column), trailing-one signs, adaptive-suffix level decoding,
  total_zeros (Tables 9-7/9-8/9-9a) and run_before (Table 9-10).
- Transforms (§8.5): 4x4 integer core transform, 4x4 luma-DC Hadamard,
  2x2 chroma-DC Hadamard, with the standard V/MF scale tables.
- In-loop deblocking (§8.7, round 11): streams signalling
  ``disable_deblocking_filter_idc != 1`` decode THROUGH the shared
  filter in kernels/h264_deblock.py; the encoder's ``deblock=True``
  emits idc 0 and filters its reconstruction identically (threshold-
  table provenance documented in that module).  ``deblock=False``
  (default) keeps the conformant idc=1 skip.

Conformance posture: the VLC tables are transcribed from the spec and
checked structurally in tests (prefix-freeness, Kraft completeness); no
third-party H.264 implementation exists in this environment to co-test
against.  The coeff_token long tail (Table 9-5 columns 2<=nC<4 rows
TotalCoeff>=8 and 4<=nC<8 rows >=13) could NOT be transcribed with
confidence: those decode-table rows are canonical placeholders, the
ENCODER NEVER EMITS THEM (macroblocks that would need one are re-encoded
as I_PCM, which is always conformant), and the DECODER REFUSES them with
NotImplementedError instead of misparsing an external stream.  Every
stream this module writes therefore uses only spec-verbatim codes.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# bitstream
# ---------------------------------------------------------------------------


class BitReader:
    """MSB-first bit reader over an RBSP (emulation bytes already removed)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("corrupt exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def more_rbsp_data(self) -> bool:
        """True if payload remains before the rbsp_stop_one_bit: the stop
        bit is the LAST set bit in the stream, everything after is padding."""
        if self.bits_left() <= 0:
            return False
        i = len(self.data) - 1
        while i >= 0 and self.data[i] == 0:
            i -= 1
        if i < 0:
            return False
        low = self.data[i] & -self.data[i]
        stop = i * 8 + 7 - (low.bit_length() - 1)
        return self.pos < stop


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def ue(self, v: int) -> None:
        v += 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self) -> None:
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def byte_align_one(self) -> None:
        """cabac_alignment_one_bit padding (§7.3.4): 1-bits to the next
        byte boundary; none when already aligned."""
        if self.nbits:
            self.u((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        self.byte_align_zero()

    def bytes(self) -> bytes:
        assert self.nbits == 0, "call rbsp_trailing()/byte_align first"
        return bytes(self.buf)


def rbsp_to_nal(nal_ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    """Add the NAL header and emulation-prevention bytes (§7.4.1.1)."""
    out = bytearray([(nal_ref_idc << 5) | nal_type])
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal_to_rbsp(nal: bytes) -> tuple[int, int, bytes]:
    """Strip the NAL header and emulation-prevention bytes."""
    hdr = nal[0]
    out = bytearray()
    zeros = 0
    i = 1
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3 and i + 1 < len(nal) and nal[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return (hdr >> 5) & 3, hdr & 0x1F, bytes(out)


def _cabac_marker_uuid() -> bytes:
    import hashlib

    return hashlib.md5(b"scanner-spark-cabac-uniform-init-v1").digest()


CABAC_MARKER_UUID = _cabac_marker_uuid()


def cabac_marker_nal() -> bytes:
    """SEI user_data_unregistered NAL (type 6, payloadType 5) carrying
    this repo's CABAC origin UUID.  The encoder prepends it to every
    CABAC access unit; decode_picture refuses CABAC payloads without it
    (the uniform context init decodes only this encoder's streams —
    kernels/cabac.py provenance note)."""
    w = BitWriter()
    w.u(5, 8)  # payload type: user_data_unregistered
    w.u(16, 8)  # payload size
    for b in CABAC_MARKER_UUID:
        w.u(b, 8)
    w.rbsp_trailing()
    return rbsp_to_nal(0, 6, w.bytes())


def is_cabac_marker(nal: bytes) -> bool:
    if not nal or nal[0] & 0x1F != 6:
        return False
    _, _, rbsp = nal_to_rbsp(nal)
    return len(rbsp) >= 18 and rbsp[0] == 5 and rbsp[2:18] == CABAC_MARKER_UUID


# ---------------------------------------------------------------------------
# CAVLC tables (transcribed from ITU-T H.264 §9.2; every table is a
# complete prefix code — tests/test_h264.py checks prefix-freeness and
# Kraft completeness of each, which catches transcription slips)
# ---------------------------------------------------------------------------

# Table 9-5: coeff_token as (TotalCoeff, TrailingOnes) -> bitstring.
# Column A: 0 <= nC < 2
_CT_A = {
    (0, 0): "1",
    (1, 0): "000101", (1, 1): "01",
    (2, 0): "00000111", (2, 1): "000100", (2, 2): "001",
    (3, 0): "000000111", (3, 1): "00000110", (3, 2): "0000101", (3, 3): "00011",
    (4, 0): "0000000111", (4, 1): "000000110", (4, 2): "00000101", (4, 3): "000011",
    (5, 0): "00000000111", (5, 1): "0000000110", (5, 2): "000000101", (5, 3): "0000100",
    (6, 0): "0000000001111", (6, 1): "00000000110", (6, 2): "0000000101", (6, 3): "00000100",
    (7, 0): "0000000001011", (7, 1): "0000000001110", (7, 2): "00000000101", (7, 3): "000000100",
    (8, 0): "0000000001000", (8, 1): "0000000001010", (8, 2): "0000000001101", (8, 3): "0000000100",
    (9, 0): "00000000001111", (9, 1): "00000000001110", (9, 2): "0000000001001", (9, 3): "00000000100",
    (10, 0): "00000000001011", (10, 1): "00000000001010", (10, 2): "00000000001101", (10, 3): "0000000001100",
    (11, 0): "000000000001111", (11, 1): "000000000001110", (11, 2): "00000000001001", (11, 3): "00000000001100",
    (12, 0): "000000000001011", (12, 1): "000000000001010", (12, 2): "000000000001101", (12, 3): "00000000001000",
    (13, 0): "0000000000001111", (13, 1): "000000000000001", (13, 2): "000000000001001", (13, 3): "000000000001100",
    (14, 0): "0000000000001011", (14, 1): "0000000000001110", (14, 2): "0000000000001101", (14, 3): "000000000001000",
    (15, 0): "0000000000000111", (15, 1): "0000000000001010", (15, 2): "0000000000001001", (15, 3): "0000000000001100",
    (16, 0): "0000000000000100", (16, 1): "0000000000000110", (16, 2): "0000000000000101", (16, 3): "0000000000001000",
}

# Column B: 2 <= nC < 4.  Rows TotalCoeff <= _CT_B_VERBATIM_MAX are
# spec-verbatim; rows 8-16 are canonical PLACEHOLDERS (no authoritative
# source in this environment to transcribe the long tail).  The encoder
# NEVER emits placeholder rows (encode_residual raises _NonVerbatimCode
# and the macroblock falls back to I_PCM) and the decoder REFUSES them
# (decode_residual raises NotImplementedError on resolving one) — see
# the module docstring's conformance posture.
_CT_B = {
    (0, 0): "11",
    (1, 0): "001011", (1, 1): "10",
    (2, 0): "000111", (2, 1): "00111", (2, 2): "011",
    (3, 0): "0000111", (3, 1): "001010", (3, 2): "001001", (3, 3): "0101",
    (4, 0): "00000111", (4, 1): "000110", (4, 2): "000101", (4, 3): "0100",
    (5, 0): "00000100", (5, 1): "0000110", (5, 2): "0000101", (5, 3): "00110",
    (6, 0): "000000111", (6, 1): "00000110", (6, 2): "00000101", (6, 3): "001000",
    (7, 0): "00000001111", (7, 1): "000000110", (7, 2): "000000101", (7, 3): "000100",
    (8, 0): "00000001110", (8, 1): "00000001101", (8, 2): "00000001100", (8, 3): "0000100",
    (9, 0): "000000001111", (9, 1): "00000010011", (9, 2): "00000010010", (9, 3): "000000010",
    (10, 0): "000000001110", (10, 1): "000000001101", (10, 2): "000000001100", (10, 3): "00000010001",
    (11, 0): "000000001011", (11, 1): "000000001010", (11, 2): "000000001001", (11, 3): "00000010000",
    (12, 0): "0000000001111", (12, 1): "0000000001110", (12, 2): "0000000001101", (12, 3): "000000001000",
    (13, 0): "0000000001100", (13, 1): "0000000001011", (13, 2): "0000000001010", (13, 3): "0000000001001",
    (14, 0): "0000000001000", (14, 1): "00000000001011", (14, 2): "00000000001010", (14, 3): "0000000000111",
    (15, 0): "00000000001001", (15, 1): "00000000001000", (15, 2): "00000000000111", (15, 3): "0000000000110",
    (16, 0): "00000000000110", (16, 1): "00000000000101", (16, 2): "00000000000100", (16, 3): "00000000000011",
}

# Column C: 4 <= nC < 8.  Rows TotalCoeff <= _CT_C_VERBATIM_MAX
# spec-verbatim; rows 13-16 placeholders (same contract as _CT_B)
_CT_C = {
    (0, 0): "1111",
    (1, 0): "001111", (1, 1): "1110",
    (2, 0): "001011", (2, 1): "01111", (2, 2): "1101",
    (3, 0): "001000", (3, 1): "01100", (3, 2): "01110", (3, 3): "1100",
    (4, 0): "0001111", (4, 1): "01010", (4, 2): "01011", (4, 3): "1011",
    (5, 0): "0001011", (5, 1): "01000", (5, 2): "01001", (5, 3): "1010",
    (6, 0): "0001001", (6, 1): "001110", (6, 2): "001101", (6, 3): "1001",
    (7, 0): "0001000", (7, 1): "001010", (7, 2): "001001", (7, 3): "1000",
    (8, 0): "00001111", (8, 1): "0001110", (8, 2): "0001101", (8, 3): "01101",
    (9, 0): "00001011", (9, 1): "00001110", (9, 2): "00001101", (9, 3): "0001010",
    (10, 0): "000001111", (10, 1): "00001010", (10, 2): "00001001", (10, 3): "0001100",
    (11, 0): "000001011", (11, 1): "000001110", (11, 2): "000001101", (11, 3): "00001100",
    (12, 0): "000001000", (12, 1): "000001010", (12, 2): "000001001", (12, 3): "00001000",
    (13, 0): "000001100", (13, 1): "000000111", (13, 2): "000000110", (13, 3): "000000101",
    (14, 0): "000000100", (14, 1): "000000011", (14, 2): "000000010", (14, 3): "000000001",
    (15, 0): "001100000", (15, 1): "001100111", (15, 2): "001100110", (15, 3): "001100101",
    (16, 0): "001100100", (16, 1): "001100011", (16, 2): "001100010", (16, 3): "001100001",
}

# chroma DC (nC == -1), 2x2: TotalCoeff 0..4
_CT_CHROMA = {
    (0, 0): "01",
    (1, 0): "000111", (1, 1): "1",
    (2, 0): "000100", (2, 1): "000110", (2, 2): "001",
    (3, 0): "000011", (3, 1): "0000011", (3, 2): "0000010", (3, 3): "000101",
    (4, 0): "000010", (4, 1): "00000011", (4, 2): "00000010", (4, 3): "0000000",
}

# Tables 9-7/9-8: total_zeros for 4x4 blocks, by TotalCoeff (1..15);
# entry i is the code for total_zeros == i
_TOTAL_ZEROS = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
        "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
        "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# Table 9-9(a): total_zeros for chroma DC 2x2, by TotalCoeff (1..3)
_TOTAL_ZEROS_CHROMA = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# Table 9-10: run_before by zerosLeft (1..6, then >6)
_RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001", "00001",
        "000001", "0000001", "00000001", "000000001", "0000000001",
        "00000000001"],
}


_CT_B_VERBATIM_MAX = 7  # TotalCoeff rows above these are placeholders
_CT_C_VERBATIM_MAX = 12


class _NonVerbatimCode(Exception):
    """Encoder-internal: the residual needs a placeholder coeff_token row
    (Table 9-5 long tail not transcribed) — caller re-encodes as I_PCM."""


def _decode_table(table: dict | list, verbatim_max: int | None = None) -> dict[str, object]:
    """code-string -> value map for VLC decoding.  Entries whose
    TotalCoeff exceeds ``verbatim_max`` map to a refusal sentinel."""
    if isinstance(table, dict):
        return {
            code: (key if verbatim_max is None or key[0] <= verbatim_max
                   else ("nonverbatim", *key))
            for key, code in table.items()
        }
    return {code: i for i, code in enumerate(table)}


_CT_DECODE = {
    0: _decode_table(_CT_A),
    2: _decode_table(_CT_B, _CT_B_VERBATIM_MAX),
    4: _decode_table(_CT_C, _CT_C_VERBATIM_MAX),
    -1: _decode_table(_CT_CHROMA),
}
_TZ_DECODE = {k: _decode_table(v) for k, v in _TOTAL_ZEROS.items()}
_TZC_DECODE = {k: _decode_table(v) for k, v in _TOTAL_ZEROS_CHROMA.items()}
_RB_DECODE = {k: _decode_table(v) for k, v in _RUN_BEFORE.items()}


def _read_vlc(r: BitReader, dec: dict, what: str):
    code = ""
    for _ in range(24):
        code += "1" if r.u(1) else "0"
        if code in dec:
            return dec[code]
    raise ValueError(f"invalid {what} VLC code {code!r}")


# ---------------------------------------------------------------------------
# CAVLC residual block (§9.2): decode + encode of one 4x4 (or 2x2 chroma
# DC) coefficient list in zigzag order
# ---------------------------------------------------------------------------


def _ct_decode_table(nC: int) -> dict | None:
    if nC == -1:
        return _CT_DECODE[-1]
    if nC < 2:
        return _CT_DECODE[0]
    if nC < 4:
        return _CT_DECODE[2]
    if nC < 8:
        return _CT_DECODE[4]
    return None  # FLC regime


def _ct_encode_table(nC: int) -> dict | None:
    if nC == -1:
        return _CT_CHROMA
    if nC < 2:
        return _CT_A
    if nC < 4:
        return _CT_B
    if nC < 8:
        return _CT_C
    return None


def decode_residual(r: BitReader, nC: int, max_coeffs: int) -> list[int]:
    """One CAVLC residual block -> ``max_coeffs`` coefficients in scan
    (zigzag) order."""
    dec = _ct_decode_table(nC)
    if dec is None:  # nC >= 8: 6-bit FLC
        code = r.u(6)
        if code == 0b000011:
            tc, t1 = 0, 0
        else:
            tc, t1 = (code >> 2) + 1, code & 3
    else:
        val = _read_vlc(r, dec, "coeff_token")
        if isinstance(val, tuple) and val[0] == "nonverbatim":
            raise NotImplementedError(
                f"coeff_token (TotalCoeff={val[1]}, T1={val[2]}, nC={nC}) "
                "is beyond the spec-verbatim Table 9-5 transcription — "
                "refusing to decode an external stream with a placeholder "
                "code (in-repo streams never emit these; see module "
                "docstring)"
            )
        tc, t1 = val
    coeffs = [0] * max_coeffs
    if tc == 0:
        return coeffs
    levels: list[int] = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(t1, tc):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("corrupt level_prefix")
        size = suffix_len
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        suffix = r.u(size) if size else 0
        code = (min(15, prefix) << suffix_len) + suffix
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if tc < max_coeffs:
        tzdec = _TZC_DECODE[tc] if nC == -1 else _TZ_DECODE[tc]
        total_zeros = _read_vlc(r, tzdec, "total_zeros")
    else:
        total_zeros = 0
    runs: list[int] = []
    zeros_left = total_zeros
    for i in range(tc - 1):
        if zeros_left > 0:
            rb = _read_vlc(r, _RB_DECODE[min(zeros_left, 7)], "run_before")
        else:
            rb = 0
        runs.append(rb)
        zeros_left -= rb
    runs.append(zeros_left)
    pos = tc + total_zeros - 1
    for i in range(tc):
        coeffs[pos] = levels[i]
        pos -= 1 + runs[i]
    return coeffs


def _encode_level(w: BitWriter, level: int, suffix_len: int, boost: bool) -> int:
    """Write one non-trailing-one level; returns the updated suffix_len.
    ``boost`` marks the first level after <3 trailing ones (its code is
    biased by 2, §9.2.2.1)."""
    code = 2 * level - 2 if level > 0 else -2 * level - 1
    if boost:
        code -= 2
    if suffix_len == 0:
        if code < 14:
            w.u(1, code + 1)  # unary prefix=code
        elif code < 14 + 16:
            w.u(1, 15)  # prefix 14
            w.u(code - 14, 4)
        else:
            c = code - 15  # decoder adds 15 when suffix_len==0, prefix>=15
            _escape_level(w, c, 0)
    else:
        if (code >> suffix_len) < 15:
            w.u(1, (code >> suffix_len) + 1)
            w.u(code & ((1 << suffix_len) - 1), suffix_len)
        else:
            _escape_level(w, code, suffix_len)
    if suffix_len == 0:
        suffix_len = 1
    if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
        suffix_len += 1
    return suffix_len


def _escape_level(w: BitWriter, code: int, suffix_len: int) -> None:
    """prefix >= 15 escape: find the smallest prefix whose suffix range
    reaches ``code`` (mirrors the decoder's levelCode arithmetic)."""
    for prefix in range(15, 32):
        size = prefix - 3
        base = 15 << suffix_len
        if prefix >= 16:
            base += (1 << size) - 4096
        suffix = code - base
        if 0 <= suffix < (1 << size):
            w.u(1, prefix + 1)  # prefix zeros then the 1
            w.u(suffix, size)
            return
    raise ValueError(f"level code {code} out of escape range")


def encode_residual(w: BitWriter, coeffs: list[int], nC: int) -> int:
    """Encode one zigzag-order coefficient list; returns TotalCoeff (the
    caller tracks it as the nC context for neighbours)."""
    max_coeffs = len(coeffs)
    nz = [i for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    # trailing ones: consecutive +-1s at the high-frequency end, max 3
    t1 = 0
    for i in reversed(nz):
        if abs(coeffs[i]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    enc = _ct_encode_table(nC)
    if enc is None:
        w.u(0b000011 if tc == 0 else ((tc - 1) << 2) | t1, 6)
    else:
        # never emit a placeholder row (module docstring): the caller
        # re-encodes the macroblock as I_PCM, which is always conformant
        if (enc is _CT_B and tc > _CT_B_VERBATIM_MAX) or (
            enc is _CT_C and tc > _CT_C_VERBATIM_MAX
        ):
            raise _NonVerbatimCode(f"TotalCoeff={tc} nC={nC}")
        code = enc[(tc, t1)]
        w.u(int(code, 2), len(code))
    if tc == 0:
        return 0
    # levels high-frequency-first
    order = list(reversed(nz))
    for i in range(t1):
        w.u(1 if coeffs[order[i]] < 0 else 0, 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(t1, tc):
        suffix_len = _encode_level(
            w, coeffs[order[i]], suffix_len, i == t1 and t1 < 3
        )
    total_zeros = nz[-1] + 1 - tc
    if tc < max_coeffs:
        tztab = _TOTAL_ZEROS_CHROMA[tc] if nC == -1 else _TOTAL_ZEROS[tc]
        code = tztab[total_zeros]
        w.u(int(code, 2), len(code))
    zeros_left = total_zeros
    for i in range(tc - 1):
        run = order[i] - order[i + 1] - 1
        if zeros_left > 0:
            code = _RUN_BEFORE[min(zeros_left, 7)][run]
            w.u(int(code, 2), len(code))
        zeros_left -= run
    return tc


# ---------------------------------------------------------------------------
# transforms + quantization (§8.5; encoder side follows the JM reference
# arithmetic, which the inverse side reconstructs exactly per spec)
# ---------------------------------------------------------------------------

ZIGZAG_4x4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# dequant scale V (§8.5.9) and forward quant MF, rows qp%6, cols by
# coefficient position class: 0 -> (0,0),(0,2),(2,0),(2,2); 1 -> (1,1),
# (1,3),(3,1),(3,3); 2 -> others
_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16), (14, 23, 18), (16, 25, 20), (18, 29, 23)]
_MF = [(13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
       (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559)]

# (0,0),(0,2),(2,0),(2,2)->0 ; (1,1),(1,3),(3,1),(3,3)->1 ; rest 2
_POS_CLASS = np.full((4, 4), 2, dtype=np.int64)
for _i in (0, 2):
    for _j in (0, 2):
        _POS_CLASS[_i, _j] = 0
for _i in (1, 3):
    for _j in (1, 3):
        _POS_CLASS[_i, _j] = 1

# chroma QP from luma QP (Table 8-15; chroma_qp_index_offset = 0)
_QPC = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                          36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]


def chroma_qp(qp: int) -> int:
    return _QPC[min(max(qp, 0), 51)]


_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
               dtype=np.int64)
def fdct4(block: np.ndarray) -> np.ndarray:
    """Forward 4x4 core transform W = Cf . X . Cf^T (integer)."""
    x = block.astype(np.int64)
    return _CF @ x @ _CF.T


def idct4(d: np.ndarray) -> np.ndarray:
    """Inverse 4x4 core transform with the spec's half-pel taps done in
    integer arithmetic (>>1 on the odd basis), final rounding (x+32)>>6."""
    d = d.astype(np.int64)
    # horizontal
    e = np.empty_like(d)
    for i in range(4):
        a, b, c, f = d[i]
        p0 = a + c
        p1 = a - c
        p2 = (b >> 1) - f
        p3 = b + (f >> 1)
        e[i] = (p0 + p3, p1 + p2, p1 - p2, p0 - p3)
    # vertical
    out = np.empty_like(e)
    for j in range(4):
        a, b, c, f = e[:, j]
        p0 = a + c
        p1 = a - c
        p2 = (b >> 1) - f
        p3 = b + (f >> 1)
        out[:, j] = (p0 + p3, p1 + p2, p1 - p2, p0 - p3)
    return (out + 32) >> 6


def hadamard4(block: np.ndarray) -> np.ndarray:
    h = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
                 dtype=np.int64)
    return h @ block.astype(np.int64) @ h.T


# --- scaling matrices (§7.3.2.1.1 / §8.5.9) -------------------------------
# The active 4x4 weight matrices for the CURRENT picture being coded or
# decoded: a tuple of six (4, 4) int64 arrays in the §8.5.9 list order
# (Sl_4x4_Intra_Y, _Cb, _Cr, Sl_4x4_Inter_Y, _Cb, _Cr), or None for the
# flat-16 default (Baseline/Main; also High without coded matrices).
# decode_picture / encode_picture_* set it around the picture body — a
# ContextVar so concurrent decodes in one worker cannot cross-pollute.
import contextvars as _contextvars

_SCALING4: "_contextvars.ContextVar" = _contextvars.ContextVar(
    "h264_scaling4", default=None
)

# The active 8x8 weight matrices (High profile, transform_8x8): a tuple of
# two (8, 8) int64 arrays in list order (Sl_8x8_Intra_Y, Sl_8x8_Inter_Y —
# the only 8x8 lists for 4:2:0), or None for the flat-16 default.  Same
# scoping discipline as _SCALING4.
_SCALING8: "_contextvars.ContextVar" = _contextvars.ContextVar(
    "h264_scaling8", default=None
)


def _set_encoder_scaling(scaling4) -> None:
    """Activate (or clear) the picture's weight matrices for an encode
    call.  Set unconditionally at every encode_picture_* entry; the
    ``_scaling_scope`` decorator on those entry points restores the
    previous value on return (mirroring decode_picture's try/finally), so
    a direct quant4/dequant4 call with ``sl != None`` between encodes can
    never silently inherit the previous picture's matrices."""
    if scaling4 is None:
        _SCALING4.set(None)
        return
    _SCALING4.set(
        tuple(np.asarray(m, dtype=np.int64).reshape(4, 4) for m in scaling4)
    )


def _set_encoder_scaling8(scaling8) -> None:
    """Activate (or clear) the picture's 8x8 weight matrices for an
    encode call (see :func:`_set_encoder_scaling`; the same
    ``_scaling_scope`` decorators restore it)."""
    if scaling8 is None:
        _SCALING8.set(None)
        return
    _SCALING8.set(
        tuple(np.asarray(m, dtype=np.int64).reshape(8, 8) for m in scaling8)
    )


def _scaling_scope(fn):
    """Restore ``_SCALING4`` to its pre-call state when ``fn`` returns:
    ContextVar.reset(token) discards every set() made inside the body, so
    the encode entry points stay leak-free without indenting their whole
    bodies into try/finally blocks."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        tok = _SCALING4.set(_SCALING4.get())
        tok8 = _SCALING8.set(_SCALING8.get())
        try:
            return fn(*args, **kwargs)
        finally:
            _SCALING8.reset(tok8)
            _SCALING4.reset(tok)

    return wrapper


def _wsl(sl: "int | None") -> "np.ndarray | None":
    """The (4,4) weightScale for scaling-list index ``sl`` (0..5), or
    None when flat (no matrices active / site opted out)."""
    if sl is None:
        return None
    sc = _SCALING4.get()
    return None if sc is None else sc[sl]


def quant4(w: np.ndarray, qp: int, intra: bool = True,
           sl: "int | None" = None) -> np.ndarray:
    mf = np.array(_MF[qp % 6], dtype=np.int64)[_POS_CLASS]
    w16 = _wsl(sl)
    if w16 is not None:
        # encoder-side: scale the multiplier by 16/weight so dequant with
        # weight W reconstructs the intended magnitude (an encoder
        # CHOICE — conformance constrains only the decoder's dequant)
        mf = (mf * 16) // w16
    shift = 15 + qp // 6
    f = (1 << shift) // 3 if intra else (1 << shift) // 6
    s = np.sign(w)
    return (s * ((np.abs(w) * mf + f) >> shift)).astype(np.int64)


def dequant4(z: np.ndarray, qp: int, sl: "int | None" = None) -> np.ndarray:
    v = np.array(_V[qp % 6], dtype=np.int64)[_POS_CLASS]
    w16 = _wsl(sl)
    if w16 is None:
        return (z.astype(np.int64) * v) << (qp // 6)
    # §8.5.12.2 general form: LevelScale4x4 = weightScale * normAdjust;
    # with flat weight 16 this reduces bit-exactly to the fast path
    ls = w16 * v
    z = z.astype(np.int64)
    if qp >= 24:
        return (z * ls) << (qp // 6 - 4)
    return (z * ls + (1 << (3 - qp // 6))) >> (4 - qp // 6)


def quant_dc4(wd: np.ndarray, qp: int, sl: "int | None" = None) -> np.ndarray:
    """Luma 16x16 DC: forward Hadamard output /2 then quant with MF[0,0]."""
    mf = _MF[qp % 6][0]
    w16 = _wsl(sl)
    if w16 is not None:
        mf = (mf * 16) // int(w16[0, 0])
    shift = 16 + qp // 6
    f = (1 << shift) // 3
    s = np.sign(wd)
    return (s * ((np.abs(wd // 2) * mf + f) >> shift)).astype(np.int64)


def dequant_dc4(cd: np.ndarray, qp: int,
                sl: "int | None" = None) -> np.ndarray:
    """Luma DC dequant after inverse Hadamard (§8.5.10).  The normative
    LevelScale(m,0,0) = weightScale(i,j=0,0) times _V[m][0] — weightScale
    is 16 (flat) unless the SPS/PPS carries scaling matrices."""
    w16 = _wsl(sl)
    w00 = 16 if w16 is None else int(w16[0, 0])
    ls = w00 * _V[qp % 6][0]
    if qp >= 36:
        return (cd * ls) << (qp // 6 - 6)
    return (cd * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)


# --- 8x8 transform (§8.5.13, High profile / FRExt) -------------------------
# The 8x8 zig-zag FRAME scan (Table 8-8) is the conventional 8x8 diagonal
# zigzag (identical to JPEG's): generated, not transcribed.


def _make_zigzag8() -> list[int]:
    order = []
    x = y = 0
    for _ in range(64):
        order.append(y * 8 + x)
        if (x + y) % 2 == 0:  # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:  # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return order


ZIGZAG_8x8 = _make_zigzag8()

# §8.5.13.2 normAdjust8x8 position classes over (i%4, j%4): the matrix is
# periodic with period 4 in both axes and symmetric; six distinct values
# a..f per qp%6 row:
#   a: (0,0)   b: (odd,odd)   c: (2,2)
#   d: (0,odd)|(odd,0)        e: (0,2)|(2,0)        f: (2,odd)|(odd,2)
_POS_CLASS8 = np.empty((8, 8), dtype=np.int64)
for _i in range(8):
    for _j in range(8):
        im, jm = _i % 4, _j % 4
        if im == 0 and jm == 0:
            c = 0
        elif im % 2 == 1 and jm % 2 == 1:
            c = 1
        elif im == 2 and jm == 2:
            c = 2
        elif im == 0 or jm == 0:
            c = 3
        elif im == 2 or jm == 2:
            c = 5
        else:  # unreachable: the cases above cover the 4x4 period
            raise AssertionError
        if c == 3 and (im == 2 or jm == 2):
            c = 4  # (0,2)/(2,0)
        _POS_CLASS8[_i, _j] = c
del _i, _j, im, jm, c

# Dequant scale V8 (§8.5.13.2 normAdjust8x8) and forward quant MF8 (the
# JM reference encoder's quant_coef8 — an encoder CHOICE paired to V8 so
# dequant(quant(x)) ~= x; conformance constrains only V8).  Same
# provenance posture as the module header: transcribed from the published
# tables, structurally cross-checked in tests (the a..f class layout, the
# DC round trip fdct8 -> quant8 -> dequant8 -> idct8 == identity at qp 0,
# and MF8*V8 ~= 2^22 per class within the tables' rounding).
_V8 = [(20, 18, 32, 19, 25, 24), (22, 19, 35, 21, 28, 26),
       (26, 23, 42, 24, 33, 31), (28, 25, 45, 26, 35, 33),
       (32, 28, 51, 30, 40, 38), (36, 32, 58, 34, 46, 43)]
_MF8 = [(13107, 11428, 20972, 12222, 16777, 15481),
        (11916, 10826, 19174, 11058, 14980, 14290),
        (10082, 8943, 15978, 9675, 12710, 11985),
        (9362, 8228, 14913, 8931, 11984, 11259),
        (8192, 7346, 13159, 7740, 10486, 9777),
        (7282, 6428, 11570, 6830, 9118, 8640)]


def _idct8_1d(d: np.ndarray, axis: int) -> np.ndarray:
    """One §8.5.13.1 inverse-transform pass along ``axis`` of (8, 8)."""
    w = np.moveaxis(d, axis, 0)
    a = np.empty_like(w)
    a[0] = w[0] + w[4]
    a[4] = w[0] - w[4]
    a[2] = (w[2] >> 1) - w[6]
    a[6] = w[2] + (w[6] >> 1)
    a[1] = -w[3] + w[5] - w[7] - (w[7] >> 1)
    a[3] = w[1] + w[7] - w[3] - (w[3] >> 1)
    a[5] = -w[1] + w[7] + w[5] + (w[5] >> 1)
    a[7] = w[3] + w[5] + w[1] + (w[1] >> 1)
    b = np.empty_like(a)
    b[0] = a[0] + a[6]
    b[2] = a[4] + a[2]
    b[4] = a[4] - a[2]
    b[6] = a[0] - a[6]
    b[1] = a[1] + (a[7] >> 2)
    b[7] = a[7] - (a[1] >> 2)
    b[3] = a[3] + (a[5] >> 2)
    b[5] = (a[3] >> 2) - a[5]
    out = np.empty_like(b)
    out[0] = b[0] + b[7]
    out[7] = b[0] - b[7]
    out[1] = b[2] + b[5]
    out[6] = b[2] - b[5]
    out[2] = b[4] + b[3]
    out[5] = b[4] - b[3]
    out[3] = b[6] + b[1]
    out[4] = b[6] - b[1]
    return np.moveaxis(out, 0, axis)


def idct8(d: np.ndarray) -> np.ndarray:
    """Inverse 8x8 transform (§8.5.13.1): horizontal pass, vertical pass,
    final rounding (x + 32) >> 6."""
    e = _idct8_1d(d.astype(np.int64), 1)
    return (_idct8_1d(e, 0) + 32) >> 6


def _fdct8_1d(d: np.ndarray, axis: int) -> np.ndarray:
    """One forward 8x8 butterfly pass (the JM reference encoder's
    forward8x8 — the adjoint of the §8.5.13.1 inverse up to the
    quant/dequant scale split)."""
    w = np.moveaxis(d, axis, 0)
    a = np.empty_like(w)
    a[0] = w[0] + w[7]
    a[1] = w[1] + w[6]
    a[2] = w[2] + w[5]
    a[3] = w[3] + w[4]
    a[4] = w[0] - w[7]
    a[5] = w[1] - w[6]
    a[6] = w[2] - w[5]
    a[7] = w[3] - w[4]
    b = np.empty_like(a)
    b[0] = a[0] + a[3]
    b[1] = a[1] + a[2]
    b[2] = a[0] - a[3]
    b[3] = a[1] - a[2]
    b[4] = a[5] + a[6] + ((a[4] >> 1) + a[4])
    b[5] = a[4] - a[7] - ((a[6] >> 1) + a[6])
    b[6] = a[4] + a[7] - ((a[5] >> 1) + a[5])
    b[7] = a[5] - a[6] + ((a[7] >> 1) + a[7])
    out = np.empty_like(b)
    out[0] = b[0] + b[1]
    out[2] = b[2] + (b[3] >> 1)
    out[4] = b[0] - b[1]
    out[6] = (b[2] >> 1) - b[3]
    out[1] = b[4] + (b[7] >> 2)
    out[3] = b[5] + (b[6] >> 2)
    out[5] = b[6] - (b[5] >> 2)
    out[7] = (b[4] >> 2) - b[7]
    return np.moveaxis(out, 0, axis)


def fdct8(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 transform (encoder side; see :func:`_fdct8_1d`)."""
    e = _fdct8_1d(block.astype(np.int64), 1)
    return _fdct8_1d(e, 0)


def _wsl8(sl8: "int | None") -> "np.ndarray | None":
    """The (8,8) weightScale for 8x8 list index ``sl8`` (0 = Intra Y,
    1 = Inter Y), or None when flat."""
    if sl8 is None:
        return None
    sc = _SCALING8.get()
    return None if sc is None else sc[sl8]


def quant8(w: np.ndarray, qp: int, intra: bool = True,
           sl8: "int | None" = None) -> np.ndarray:
    """Forward 8x8 quantization (JM pairing to §8.5.13.2's dequant):
    shift = 16 + qp/6, deadzone f = (1<<shift)/3 intra, /6 inter."""
    mf = np.array(_MF8[qp % 6], dtype=np.int64)[_POS_CLASS8]
    w8 = _wsl8(sl8)
    if w8 is not None:
        mf = (mf * 16) // w8
    shift = 16 + qp // 6
    f = (1 << shift) // 3 if intra else (1 << shift) // 6
    s = np.sign(w)
    return (s * ((np.abs(w) * mf + f) >> shift)).astype(np.int64)


def dequant8(z: np.ndarray, qp: int, sl8: "int | None" = None) -> np.ndarray:
    """§8.5.13.2: LevelScale8x8 = weightScale8x8 (flat 16 without coded
    lists) * normAdjust8x8; d = (c*LS) << (qp/6 - 6) for qp >= 36, else
    (c*LS + (1 << (5 - qp/6))) >> (6 - qp/6)."""
    v = np.array(_V8[qp % 6], dtype=np.int64)[_POS_CLASS8]
    w8 = _wsl8(sl8)
    ls = (16 if w8 is None else w8) * v
    z = z.astype(np.int64)
    if qp >= 36:
        return (z * ls) << (qp // 6 - 6)
    return (z * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def _zz_to_mat8(coeffs: "list[int]") -> np.ndarray:
    m = np.zeros(64, dtype=np.int64)
    for i, pos in enumerate(ZIGZAG_8x8):
        m[pos] = coeffs[i]
    return m.reshape(8, 8)


def _mat_to_zz8(m: np.ndarray) -> "list[int]":
    f = m.reshape(-1)
    return [int(f[pos]) for pos in ZIGZAG_8x8]


def quant_dc2(wd: np.ndarray, qp: int, sl: "int | None" = None) -> np.ndarray:
    """Chroma 2x2 DC quant."""
    mf = _MF[qp % 6][0]
    w16 = _wsl(sl)
    if w16 is not None:
        mf = (mf * 16) // int(w16[0, 0])
    shift = 16 + qp // 6
    f = (1 << shift) // 3
    s = np.sign(wd)
    return (s * ((np.abs(wd) * mf + f) >> shift)).astype(np.int64)


def dequant_dc2(cd: np.ndarray, qp: int,
                sl: "int | None" = None) -> np.ndarray:
    """Chroma DC dequant (§8.5.11): ((f * LS00) << (qp/6)) >> 5 with
    LevelScale = weightScale(0,0) * _V[m][0]."""
    w16 = _wsl(sl)
    w00 = 16 if w16 is None else int(w16[0, 0])
    ls = w00 * _V[qp % 6][0]
    return ((cd * ls) << (qp // 6)) >> 5


# ---------------------------------------------------------------------------
# intra prediction (§8.3) — operates on the reconstructed plane being
# built (decoder and encoder run the identical predictor)
# ---------------------------------------------------------------------------


def pred16(plane: np.ndarray, y: int, x: int, mode: int,
           up_ok: bool = True, left_ok: bool = True,
           ul_ok: bool = True) -> np.ndarray:
    """16x16 luma prediction at MB origin (y, x).  Modes: 0=V 1=H 2=DC
    3=Plane.  ``plane`` is the reconstruction so far (uint8-valued).
    ``up_ok``/``left_ok``/``ul_ok`` gate neighbour availability beyond
    the frame-edge check — False when the neighbour MB is in a different
    slice (§8.3.3's constrained availability)."""
    up = plane[y - 1, x : x + 16].astype(np.int64) if y > 0 and up_ok else None
    left = plane[y : y + 16, x - 1].astype(np.int64) if x > 0 and left_ok else None
    if mode == 0:
        if up is None:
            raise ValueError("V pred without top neighbour")
        return np.tile(up, (16, 1))
    if mode == 1:
        if left is None:
            raise ValueError("H pred without left neighbour")
        return np.tile(left[:, None], (1, 16))
    if mode == 2:
        if up is not None and left is not None:
            dc = (int(up.sum()) + int(left.sum()) + 16) >> 5
        elif up is not None:
            dc = (int(up.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int64)
    if mode == 3:  # plane
        if up is None or left is None or x == 0 or y == 0 or not ul_ok:
            raise ValueError("plane pred needs both neighbours")
        ul = int(plane[y - 1, x - 1])
        # i == 7 reaches p[-1,-1]: must be the corner sample, not a numpy
        # wrap-around to up[15]
        h = sum(
            (i + 1) * (int(up[8 + i]) - (int(up[6 - i]) if i < 7 else ul))
            for i in range(8)
        )
        vv = sum(
            (i + 1)
            * (int(plane[y + 8 + i, x - 1]) - (int(plane[y + 6 - i, x - 1]) if i < 7 else ul))
            for i in range(8)
        )
        b = (5 * h + 32) >> 6
        c = (5 * vv + 32) >> 6
        a = 16 * (int(left[15]) + int(up[15]))
        yy, xx = np.mgrid[0:16, 0:16]
        p = (a + b * (xx - 7) + c * (yy - 7) + 16) >> 5
        return np.clip(p, 0, 255)
    raise ValueError(f"bad 16x16 mode {mode}")


def pred_chroma(plane: np.ndarray, y: int, x: int, mode: int,
                up_ok: bool = True, left_ok: bool = True,
                ul_ok: bool = True) -> np.ndarray:
    """8x8 chroma prediction.  Modes: 0=DC 1=H 2=V 3=Plane (§8.3.4).
    Availability flags as in :func:`pred16` (slice boundaries)."""
    up = plane[y - 1, x : x + 8].astype(np.int64) if y > 0 and up_ok else None
    left = plane[y : y + 8, x - 1].astype(np.int64) if x > 0 and left_ok else None
    if mode == 0:
        out = np.empty((8, 8), dtype=np.int64)
        for by in (0, 4):
            for bx in (0, 4):
                u = up[bx : bx + 4] if up is not None else None
                lf = left[by : by + 4] if left is not None else None
                # corner blocks prefer their own edge (§8.3.4.1)
                if u is not None and lf is not None:
                    if (by, bx) == (0, 4):
                        dc = (int(u.sum()) + 2) >> 2
                    elif (by, bx) == (4, 0):
                        dc = (int(lf.sum()) + 2) >> 2
                    else:
                        dc = (int(u.sum()) + int(lf.sum()) + 4) >> 3
                elif u is not None:
                    dc = (int(u.sum()) + 2) >> 2
                elif lf is not None:
                    dc = (int(lf.sum()) + 2) >> 2
                else:
                    dc = 128
                out[by : by + 4, bx : bx + 4] = dc
        return out
    if mode == 1:
        if left is None:
            raise ValueError("chroma H pred without left")
        return np.tile(left[:, None], (1, 8))
    if mode == 2:
        if up is None:
            raise ValueError("chroma V pred without top")
        return np.tile(up, (8, 1))
    if mode == 3:
        if up is None or left is None or not ul_ok:
            raise ValueError("chroma plane needs both")
        ul = int(plane[y - 1, x - 1])
        h = sum(
            (i + 1) * (int(up[4 + i]) - (int(up[2 - i]) if i < 3 else ul))
            for i in range(4)
        )
        vv = sum(
            (i + 1)
            * (int(plane[y + 4 + i, x - 1]) - (int(plane[y + 2 - i, x - 1]) if i < 3 else ul))
            for i in range(4)
        )
        b = (17 * h + 16) >> 5
        c = (17 * vv + 16) >> 5
        a = 16 * (int(left[7]) + int(up[7]))
        yy, xx = np.mgrid[0:8, 0:8]
        p = (a + b * (xx - 3) + c * (yy - 3) + 16) >> 5
        return np.clip(p, 0, 255)
    raise ValueError(f"bad chroma mode {mode}")


# 4x4 luma prediction modes (§8.3.1): 0=V 1=H 2=DC 3=DDL 4=DDR 5=VR 6=HD
# 7=VL 8=HU
def pred4(plane: np.ndarray, y: int, x: int, mode: int,
          up_right_avail: bool, up_ok: bool = True, left_ok: bool = True,
          ul_ok: bool = True) -> np.ndarray:
    up = plane[y - 1, x : x + 4].astype(np.int64) if y > 0 and up_ok else None
    left = plane[y : y + 4, x - 1].astype(np.int64) if x > 0 and left_ok else None
    ul = int(plane[y - 1, x - 1]) if (y > 0 and x > 0 and ul_ok) else None
    if up is not None:
        if up_right_avail:
            ur = plane[y - 1, x + 4 : x + 8].astype(np.int64)
            if len(ur) < 4:  # frame edge: replicate last sample (§8.3.1.2)
                ur = np.concatenate([ur, np.full(4 - len(ur), up[3], dtype=np.int64)])
        else:
            ur = np.full(4, up[3], dtype=np.int64)
    else:
        ur = None
    out = np.empty((4, 4), dtype=np.int64)
    if mode == 0:
        if up is None:
            raise ValueError("V without top")
        return np.tile(up, (4, 1))
    if mode == 1:
        if left is None:
            raise ValueError("H without left")
        return np.tile(left[:, None], (1, 4))
    if mode == 2:
        if up is not None and left is not None:
            dc = (int(up.sum()) + int(left.sum()) + 4) >> 3
        elif up is not None:
            dc = (int(up.sum()) + 2) >> 2
        elif left is not None:
            dc = (int(left.sum()) + 2) >> 2
        else:
            dc = 128
        return np.full((4, 4), dc, dtype=np.int64)
    if mode == 3:  # diagonal down-left
        if up is None:
            raise ValueError("DDL without top")
        p = np.concatenate([up, ur])
        for j in range(4):
            for i in range(4):
                k = i + j
                if k == 6:
                    out[j, i] = (p[6] + 3 * p[7] + 2) >> 2
                else:
                    out[j, i] = (p[k] + 2 * p[k + 1] + p[k + 2] + 2) >> 2
        return out
    if mode == 4:  # diagonal down-right (§8.3.1.2.4)
        if up is None or left is None or ul is None:
            raise ValueError("DDR needs top+left+corner")

        def zr(i, j):
            d = i - j
            if d > 0:
                vals = [ul, up[0], up[1], up[2], up[3]]
                # sample (i,j) uses up[d-2], up[d-1], up[d] with ul at -1
                def q(k):
                    return ul if k < 0 else up[k]
                return (q(d - 2) + 2 * q(d - 1) + q(d) + 2) >> 2
            if d < 0:
                def q(k):
                    return ul if k < 0 else left[k]
                e = -d
                return (q(e - 2) + 2 * q(e - 1) + q(e) + 2) >> 2
            return (up[0] + 2 * ul + left[0] + 2) >> 2
        for j in range(4):
            for i in range(4):
                out[j, i] = zr(i, j)
        return out
    if mode == 5:  # vertical-right
        if up is None or left is None or ul is None:
            raise ValueError("VR needs top+left+corner")
        def q_up(k):
            return ul if k < 0 else up[k]
        for j in range(4):
            for i in range(4):
                z = 2 * i - j
                if z >= 0 and z % 2 == 0:
                    k = i - (j >> 1)
                    out[j, i] = (q_up(k - 1) + q_up(k) + 1) >> 1
                elif z >= 0:
                    k = i - (j >> 1)
                    out[j, i] = (q_up(k - 2) + 2 * q_up(k - 1) + q_up(k) + 2) >> 2
                elif z == -1:
                    out[j, i] = (left[0] + 2 * ul + up[0] + 2) >> 2
                else:
                    out[j, i] = (left[j - 1] + 2 * left[j - 2] + left[j - 3] + 2) >> 2 \
                        if j - 3 >= 0 else (left[j - 1] + 2 * left[j - 2] + ul + 2) >> 2
        return out
    if mode == 6:  # horizontal-down
        if up is None or left is None or ul is None:
            raise ValueError("HD needs top+left+corner")
        def q_l(k):
            return ul if k < 0 else left[k]
        for j in range(4):
            for i in range(4):
                z = 2 * j - i
                if z >= 0 and z % 2 == 0:
                    k = j - (i >> 1)
                    out[j, i] = (q_l(k - 1) + q_l(k) + 1) >> 1
                elif z >= 0:
                    k = j - (i >> 1)
                    out[j, i] = (q_l(k - 2) + 2 * q_l(k - 1) + q_l(k) + 2) >> 2
                elif z == -1:
                    out[j, i] = (up[0] + 2 * ul + left[0] + 2) >> 2
                else:
                    out[j, i] = (up[i - 1] + 2 * up[i - 2] + up[i - 3] + 2) >> 2 \
                        if i - 3 >= 0 else (up[i - 1] + 2 * up[i - 2] + ul + 2) >> 2
        return out
    if mode == 7:  # vertical-left
        if up is None:
            raise ValueError("VL without top")
        p = np.concatenate([up, ur])
        for j in range(4):
            for i in range(4):
                k = i + (j >> 1)
                if j % 2 == 0:
                    out[j, i] = (p[k] + p[k + 1] + 1) >> 1
                else:
                    out[j, i] = (p[k] + 2 * p[k + 1] + p[k + 2] + 2) >> 2
        return out
    if mode == 8:  # horizontal-up
        if left is None:
            raise ValueError("HU without left")
        for j in range(4):
            for i in range(4):
                z = i + 2 * j
                if z > 5:
                    out[j, i] = left[3]
                elif z == 5:
                    out[j, i] = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    k = j + (i >> 1)
                    out[j, i] = (left[k] + left[k + 1] + 1) >> 1
                else:
                    k = j + (i >> 1)
                    out[j, i] = (left[k] + 2 * left[k + 1] + left[k + 2] + 2) >> 2
        return out
    raise ValueError(f"bad 4x4 mode {mode}")


# 8x8 luma prediction modes (§8.3.2, High profile): same nine mode
# identities as 4x4, computed over REFERENCE SAMPLES LOW-PASS FILTERED
# first (§8.3.2.2.1's [1,2,1] pass — the defining difference from 4x4).
def pred8(plane: np.ndarray, y: int, x: int, mode: int,
          up_right_avail: bool, up_ok: bool = True, left_ok: bool = True,
          ul_ok: bool = True) -> np.ndarray:
    up_av = y > 0 and up_ok
    left_av = x > 0 and left_ok
    ul_av = y > 0 and x > 0 and ul_ok
    t = l = c = None
    if up_av:
        t = plane[y - 1, x : x + 8].astype(np.int64)
        if up_right_avail:
            ur = plane[y - 1, x + 8 : x + 16].astype(np.int64)
            if len(ur) < 8:  # frame edge: replicate (§8.3.2.2.1)
                ur = np.concatenate(
                    [ur, np.full(8 - len(ur), t[7], dtype=np.int64)]
                )
        else:
            ur = np.full(8, t[7], dtype=np.int64)
        t = np.concatenate([t, ur])  # t[0..15]
    if left_av:
        l = plane[y : y + 8, x - 1].astype(np.int64)
    if ul_av:
        c = int(plane[y - 1, x - 1])

    # --- §8.3.2.2.1 reference filtering ------------------------------
    tf = lf = cf = None
    if t is not None:
        tf = np.empty(16, dtype=np.int64)
        tf[0] = ((c + 2 * t[0] + t[1] + 2) >> 2) if c is not None else (
            (3 * t[0] + t[1] + 2) >> 2)
        tf[1:15] = (t[0:14] + 2 * t[1:15] + t[2:16] + 2) >> 2
        tf[15] = (t[14] + 3 * t[15] + 2) >> 2
    if l is not None:
        lf = np.empty(8, dtype=np.int64)
        lf[0] = ((c + 2 * l[0] + l[1] + 2) >> 2) if c is not None else (
            (3 * l[0] + l[1] + 2) >> 2)
        lf[1:7] = (l[0:6] + 2 * l[1:7] + l[2:8] + 2) >> 2
        lf[7] = (l[6] + 3 * l[7] + 2) >> 2
    if c is not None:
        if t is not None and l is not None:
            cf = (t[0] + 2 * c + l[0] + 2) >> 2
        elif t is not None:
            cf = (3 * c + t[0] + 2) >> 2
        else:
            cf = (3 * c + l[0] + 2) >> 2

    out = np.empty((8, 8), dtype=np.int64)
    if mode == 0:
        if tf is None:
            raise ValueError("V without top")
        return np.tile(tf[:8], (8, 1))
    if mode == 1:
        if lf is None:
            raise ValueError("H without left")
        return np.tile(lf[:, None], (1, 8))
    if mode == 2:
        if tf is not None and lf is not None:
            dc = (int(tf[:8].sum()) + int(lf.sum()) + 8) >> 4
        elif tf is not None:
            dc = (int(tf[:8].sum()) + 4) >> 3
        elif lf is not None:
            dc = (int(lf.sum()) + 4) >> 3
        else:
            dc = 128
        return np.full((8, 8), dc, dtype=np.int64)
    if mode == 3:  # diagonal down-left (§8.3.2.2.4)
        if tf is None:
            raise ValueError("DDL without top")
        for j in range(8):
            for i in range(8):
                k = i + j
                if k == 14:
                    out[j, i] = (tf[14] + 3 * tf[15] + 2) >> 2
                else:
                    out[j, i] = (tf[k] + 2 * tf[k + 1] + tf[k + 2] + 2) >> 2
        return out
    if mode == 4:  # diagonal down-right (§8.3.2.2.5)
        if tf is None or lf is None or cf is None:
            raise ValueError("DDR needs top+left+corner")
        for j in range(8):
            for i in range(8):
                d = i - j
                if d > 0:
                    q = lambda k: cf if k < 0 else tf[k]  # noqa: E731
                    out[j, i] = (q(d - 2) + 2 * q(d - 1) + q(d) + 2) >> 2
                elif d < 0:
                    q = lambda k: cf if k < 0 else lf[k]  # noqa: E731
                    e = -d
                    out[j, i] = (q(e - 2) + 2 * q(e - 1) + q(e) + 2) >> 2
                else:
                    out[j, i] = (tf[0] + 2 * cf + lf[0] + 2) >> 2
        return out
    if mode == 5:  # vertical-right (§8.3.2.2.6)
        if tf is None or lf is None or cf is None:
            raise ValueError("VR needs top+left+corner")

        def q_up(k):
            return cf if k < 0 else tf[k]

        def q_l(k):
            return cf if k < 0 else lf[k]

        for j in range(8):
            for i in range(8):
                z = 2 * i - j
                if z >= 0 and z % 2 == 0:
                    k = i - (j >> 1)
                    out[j, i] = (q_up(k - 1) + q_up(k) + 1) >> 1
                elif z >= 0:
                    k = i - (j >> 1)
                    out[j, i] = (
                        q_up(k - 2) + 2 * q_up(k - 1) + q_up(k) + 2
                    ) >> 2
                elif z == -1:
                    out[j, i] = (lf[0] + 2 * cf + tf[0] + 2) >> 2
                else:
                    e = j - 2 * i
                    out[j, i] = (
                        q_l(e - 1) + 2 * q_l(e - 2) + q_l(e - 3) + 2
                    ) >> 2
        return out
    if mode == 6:  # horizontal-down (§8.3.2.2.7)
        if tf is None or lf is None or cf is None:
            raise ValueError("HD needs top+left+corner")

        def q_up(k):
            return cf if k < 0 else tf[k]

        def q_l(k):
            return cf if k < 0 else lf[k]

        for j in range(8):
            for i in range(8):
                z = 2 * j - i
                if z >= 0 and z % 2 == 0:
                    k = j - (i >> 1)
                    out[j, i] = (q_l(k - 1) + q_l(k) + 1) >> 1
                elif z >= 0:
                    k = j - (i >> 1)
                    out[j, i] = (
                        q_l(k - 2) + 2 * q_l(k - 1) + q_l(k) + 2
                    ) >> 2
                elif z == -1:
                    out[j, i] = (tf[0] + 2 * cf + lf[0] + 2) >> 2
                else:
                    e = i - 2 * j
                    out[j, i] = (
                        q_up(e - 1) + 2 * q_up(e - 2) + q_up(e - 3) + 2
                    ) >> 2
        return out
    if mode == 7:  # vertical-left (§8.3.2.2.8)
        if tf is None:
            raise ValueError("VL without top")
        for j in range(8):
            for i in range(8):
                k = i + (j >> 1)
                if j % 2 == 0:
                    out[j, i] = (tf[k] + tf[k + 1] + 1) >> 1
                else:
                    out[j, i] = (tf[k] + 2 * tf[k + 1] + tf[k + 2] + 2) >> 2
        return out
    if mode == 8:  # horizontal-up (§8.3.2.2.9)
        if lf is None:
            raise ValueError("HU without left")
        for j in range(8):
            for i in range(8):
                z = i + 2 * j
                if z > 13:
                    out[j, i] = lf[7]
                elif z == 13:
                    out[j, i] = (lf[6] + 3 * lf[7] + 2) >> 2
                elif z % 2 == 0:
                    k = j + (i >> 1)
                    out[j, i] = (lf[k] + lf[k + 1] + 1) >> 1
                else:
                    k = j + (i >> 1)
                    out[j, i] = (lf[k] + 2 * lf[k + 1] + lf[k + 2] + 2) >> 2
        return out
    raise ValueError(f"bad 8x8 mode {mode}")


def _avail_modes8(up: bool, left: bool, ul: bool) -> list[int]:
    """Available Intra_8x8 modes (same identities as :func:`_avail_modes4`;
    up-right never gates a mode — §8.3.2.2.1 substitutes p[7,-1] when the
    above-right samples are unavailable, so DDL/VL need only ``up``)."""
    m = [2]
    if up:
        m += [0, 3, 7]
    if left:
        m += [1, 8]
    if up and left and ul:
        m += [4, 5, 6]
    return m


# ---------------------------------------------------------------------------
# parameter sets + slice header (§7.3.2, §7.3.3) — the baseline-intra
# feature set this codec emits and accepts
# ---------------------------------------------------------------------------

# Table 9-4 (intra column): coded_block_pattern codeNum -> cbp for I_NxN
_CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
              16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
              8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}

# Table 9-4, Inter column: codeNum -> coded_block_pattern for P/B
# macroblocks.  Structural property (pinned in tests): a permutation of
# 0..47, favouring single-8x8 and chroma-only patterns at short codes.
_CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
              14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45,
              46, 17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22,
              25, 38, 41]
_CBP_INTER_INV = {cbp: i for i, cbp in enumerate(_CBP_INTER)}

# luma 4x4 block scan order within a MB: blkIdx -> (x, y) pixel offsets
_BLK4_POS = [(0, 0), (4, 0), (0, 4), (4, 4), (8, 0), (12, 0), (8, 4), (12, 4),
             (0, 8), (4, 8), (0, 12), (4, 12), (8, 8), (12, 8), (8, 12), (12, 12)]
# luma 8x8 block scan order within a MB (transform_size_8x8 / Intra_8x8)
_B8_POS = [(0, 0), (8, 0), (0, 8), (8, 8)]
# blkIdx whose up-right neighbour is not yet decoded (§8.3.1, MB-internal)
_NO_UPRIGHT = {3, 7, 11, 13, 15}
# chroma 4x4 block scan order within the 8x8 plane block
_CBLK_POS = [(0, 0), (4, 0), (0, 4), (4, 4)]


def write_sps(w_pix: int, h_pix: int, num_ref_frames: int = 1,
              poc_type: int = 2,
              scaling4: "tuple | list | None" = None,
              scaling8: "tuple | list | None" = None,
              high_profile: bool = False) -> bytes:
    """SPS for a frame_mbs_only stream with ``num_ref_frames`` references
    (1 covers the P-GOP encoder; 0 is legal for all-IDR); crops encode
    non-multiple-of-16 sizes (even, 4:2:0).  ``poc_type=2`` (display ==
    decode order) for I/P streams; B-frame streams need ``poc_type=0``
    (explicit pic_order_cnt_lsb carries display order) and profile Main —
    poc type 2 forbids reordering (§7.4.2.1) and Baseline forbids B
    slices (A.2.1)."""
    if w_pix % 2 or h_pix % 2:
        raise ValueError("4:2:0 needs even dimensions")
    if poc_type not in (0, 2):
        raise ValueError("writer supports poc_type 0 and 2 only")
    if scaling8 is not None and scaling4 is None:
        raise ValueError(
            "scaling8 needs scaling4: absent 4x4 lists under "
            "seq_scaling_matrix_present would invoke the normative "
            "defaults this codec refuses"
        )
    mbw, mbh = (w_pix + 15) // 16, (h_pix + 15) // 16
    crop_r = (mbw * 16 - w_pix) // 2  # crop units: 2 luma px (4:2:0)
    crop_b = (mbh * 16 - h_pix) // 2
    w = BitWriter()
    high = high_profile or scaling4 is not None
    if high:
        # scaling matrices / transform_8x8 need the High-profile SPS
        # layout (§7.3.2.1's chroma/bit-depth block)
        w.u(100, 8)  # profile_idc: High
    else:
        w.u(66 if poc_type == 2 else 77, 8)  # profile_idc: Baseline / Main
    w.u(0, 8)  # constraint flags + reserved
    w.u(30, 8)  # level_idc 3.0
    w.ue(0)  # sps_id
    if high:
        w.ue(1)  # chroma_format_idc: 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)  # qpprime_y_zero_transform_bypass
        w.u(1 if scaling4 is not None else 0, 1)  # seq_scaling_matrix

    def _write_list(vals: list) -> None:
        last = 8
        for v in vals:
            if not 1 <= v <= 255:
                raise ValueError("scaling weights must be 1..255")
            delta = (v - last) % 256
            if delta > 127:
                delta -= 256
            w.se(delta)
            last = v

    if scaling4 is not None:
        if len(scaling4) != 6:
            raise ValueError("scaling4 must carry six 4x4 lists")
        if scaling8 is not None and len(scaling8) != 2:
            raise ValueError("scaling8 must carry two 8x8 lists "
                             "(Intra Y, Inter Y)")
        for i in range(8):
            if i >= 6:
                if scaling8 is None:
                    # 8x8 lists absent: legal while the PPS keeps the
                    # 8x8 transform off (their values are unreachable)
                    w.u(0, 1)
                    continue
                w.u(1, 1)
                _write_list(
                    _mat_to_zz8(np.asarray(scaling8[i - 6], dtype=np.int64))
                )
                continue
            w.u(1, 1)  # seq_scaling_list_present_flag[i]
            _write_list(_mat_to_zz(np.asarray(scaling4[i], dtype=np.int64)))
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(poc_type)  # pic_order_cnt_type
    if poc_type == 0:
        w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4 -> 8-bit poc_lsb
    w.ue(num_ref_frames)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed
    w.ue(mbw - 1)
    w.ue(mbh - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present
    w.rbsp_trailing()
    return w.bytes()


def _parse_scaling_list(r: BitReader, size: int):
    """§7.3.2.1.1 scaling_list(): returns the decoded list in SCAN order
    (zigzag for 4x4) or the string "default" when the
    use-default marker (first delta driving nextScale to 0) is coded."""
    out = []
    last, nxt = 8, 8
    for j in range(size):
        if nxt != 0:
            delta = r.se()
            nxt = (last + delta + 256) % 256
            if j == 0 and nxt == 0:
                # consume nothing further: the marker means "use the
                # normative default list" for the whole list
                return "default"
        v = last if nxt == 0 else nxt
        out.append(v)
        last = v
    return out


def _scaling4_from_lists(lists: "list") -> tuple:
    """Six scan-order 4x4 lists -> tuple of (4,4) weightScale arrays
    (raster order via the inverse zigzag)."""
    mats = []
    for vals in lists:
        m = np.zeros(16, dtype=np.int64)
        for i, pos in enumerate(ZIGZAG_4x4):
            m[pos] = vals[i]
        mats.append(m.reshape(4, 4))
    return tuple(mats)


def _scaling8_from_lists(lists: "list") -> tuple:
    """8x8 scan-order lists -> tuple of (8,8) weightScale arrays or the
    "default" marker passed through (refused at use time)."""
    mats = []
    for vals in lists:
        if isinstance(vals, str):
            mats.append(vals)
            continue
        m = np.zeros(64, dtype=np.int64)
        for i, pos in enumerate(ZIGZAG_8x8):
            m[pos] = vals[i]
        mats.append(m.reshape(8, 8))
    return tuple(mats)


def _parse_scaling_matrix(r: BitReader, n_lists: int,
                          base: "tuple | None") -> tuple:
    """The seq/pic scaling-matrix list loop (§7.3.2.1/§7.3.2.2) ->
    (scaling4, scaling8).

    Supported subset — zero memorized tables: every used 4x4 list must be
    EXPLICITLY CODED or fall back to the PREVIOUS list of the same
    matrix / the same index of ``base`` (rule B's seq fallback).  The
    normative DEFAULT lists (fall-back rule A for absent list 0/3, or
    the in-list use-default marker) are not transcribable from memory
    here, so those streams refuse loudly.  The same applies to the 8x8
    lists (index 6 = Intra Y 8x8, 7 = Inter Y 8x8 at 4:2:0): an absent
    or marker-coded 8x8 list is recorded as the "default" sentinel,
    refused by decode_picture IF a transform_8x8 PPS makes it reachable
    (a 4x4-only stream never reads it, so those streams stay accepted).
    ``scaling8`` is None when ``n_lists <= 6`` (no 8x8 syntax coded)."""
    lists: list = []
    for i in range(n_lists):
        present = r.u(1)
        size = 16 if i < 6 else 64
        if not present:
            if i >= 6:
                # absent 8x8 list: recorded as the "default" sentinel,
                # refused at decode if a transform_8x8 PPS makes it
                # reachable.  (Rule B's fall-back-to-seq-matrix cannot
                # apply here: the standalone PPS parser never sees the
                # SPS — ADVICE r13 removed the dead base8 plumbing that
                # implied otherwise.)
                lists.append("default")
                continue
            if i in (0, 3):
                if base is not None:
                    # fall-back rule B: list 0/3 falls back to the seq
                    # matrix's same-index list
                    lists.append(_mat_to_zz(base[i]))
                    continue
                raise NotImplementedError(
                    "scaling matrix falls back to the normative DEFAULT "
                    "list (absent list 0/3 without a seq matrix) — the "
                    "default tables are not available in this "
                    "environment; streams must code their lists"
                )
            lists.append(lists[i - 1])  # fall-back: previous list
            continue
        got = _parse_scaling_list(r, size)
        if got == "default":
            if i >= 6:
                lists.append("default")
                continue
            raise NotImplementedError(
                "scaling list codes the use-default marker — the "
                "normative default tables are not available in this "
                "environment"
            )
        lists.append(got)
    scaling4 = _scaling4_from_lists(lists[:6])
    if n_lists <= 6:
        return scaling4, None
    l8 = [
        (_mat_to_zz8(v) if isinstance(v, np.ndarray) else v)
        for v in lists[6:8]
    ]
    return scaling4, _scaling8_from_lists(l8)


def parse_sps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    profile = r.u(8)
    r.u(8)
    level = r.u(8)
    sps_id = r.ue()
    scaling4 = scaling8 = None
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma = r.ue()
        if chroma == 3:
            r.u(1)
        r.ue()
        r.ue()
        r.u(1)
        if r.u(1):  # seq_scaling_matrix_present_flag
            scaling4, scaling8 = _parse_scaling_matrix(
                r, 12 if chroma == 3 else 8, None
            )
    log2_mfn = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 4
    if poc_type == 0:
        # ADVICE r05: MUST be stored — decode_slice reads this many bits
        # of pic_order_cnt_lsb; discarding it misaligns every poc-type-0
        # slice header with minus4 != 0
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    num_ref_frames = r.ue()  # max_num_ref_frames: sizes the DPB walk
    r.u(1)
    mbw = r.ue() + 1
    mbh_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlaced streams not supported")
    direct8_inf = r.u(1)  # direct_8x8_inference_flag (conditions the
    # inter transform_size_8x8_flag's presence on B_Direct MBs, §7.3.5)
    crop = (0, 0, 0, 0)
    if r.u(1):
        crop = (r.ue(), r.ue(), r.ue(), r.ue())  # l, r, t, b in chroma units
    return {
        "profile": profile, "level": level, "sps_id": sps_id,
        "log2_max_frame_num": log2_mfn, "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "num_ref_frames": num_ref_frames,
        "mb_width": mbw, "mb_height": mbh_units,
        "width": mbw * 16 - 2 * (crop[0] + crop[1]),
        "height": mbh_units * 16 - 2 * (crop[2] + crop[3]),
        "crop": crop,
        "scaling4": scaling4,
        "scaling8": scaling8,
        "direct_8x8_inference": bool(direct8_inf),
    }


def write_pps(qp: int, cabac: bool = False, weighted_pred: bool = False,
              weighted_bipred_idc: int = 0,
              transform_8x8: bool = False) -> bytes:
    if weighted_bipred_idc not in (0, 1, 2):
        raise ValueError("weighted_bipred_idc must be 0 (default), "
                         "1 (explicit) or 2 (implicit)")
    w = BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(1 if cabac else 0, 1)  # entropy_coding_mode: CABAC / CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(1 if weighted_pred else 0, 1)  # weighted_pred (P explicit WP)
    w.u(weighted_bipred_idc, 2)  # weighted_bipred_idc (B: 1 = explicit)
    w.se(qp - 26)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(1, 1)  # deblocking_filter_control_present
    w.u(0, 1)  # constrained_intra_pred
    w.u(0, 1)  # redundant_pic_cnt_present
    if transform_8x8:
        # PPS extension (§7.3.2.2, High profile): 8x8 transform on,
        # no PPS-carried scaling lists, second chroma offset mirrors
        # chroma_qp_index_offset (0)
        w.u(1, 1)  # transform_8x8_mode_flag
        w.u(0, 1)  # pic_scaling_matrix_present_flag
        w.se(0)  # second_chroma_qp_index_offset
    w.rbsp_trailing()
    return w.bytes()


def parse_pps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    # entropy_coding_mode 1 = CABAC: parse proceeds; decode_picture gates
    # on the in-repo origin marker (kernels/cabac.py provenance note)
    cabac = r.u(1)
    r.u(1)
    if r.ue() != 0:
        raise NotImplementedError("slice groups not supported")
    num_ref_l0 = r.ue()
    num_ref_l1 = r.ue()
    weighted_pred = r.u(1)
    weighted_bipred_idc = r.u(2)
    init_qp = r.se() + 26
    r.se()
    chroma_qp_off = r.se()
    deblock_ctrl = r.u(1)
    constrained_intra = r.u(1)
    r.u(1)
    # PPS extension (§7.3.2.2, present when more RBSP data follows):
    # previously unparsed — a foreign High-profile PPS carrying
    # pic-scaling lists or a second chroma offset would have decoded
    # silently wrong instead of refusing or applying them
    pic_scaling = pic_scaling8 = None
    transform_8x8 = False
    if r.more_rbsp_data():
        transform_8x8 = bool(r.u(1))  # transform_8x8_mode_flag (§8.5.13)
        if r.u(1):  # pic_scaling_matrix_present_flag
            # n_lists = 6 + 2*transform_8x8.  The PPS parser cannot see
            # the SPS, so rule B's fall-back-to-seq-matrix for an absent
            # list 0/3 refuses (base None) — PPS matrices must code
            # their 4x4 lists (or previous-list fallback); absent 8x8
            # lists record the "default" sentinel, refused at decode if
            # transform_8x8 makes them reachable
            pic_scaling, pic_scaling8 = _parse_scaling_matrix(
                r, 6 + 2 * transform_8x8, None
            )
        second_off = r.se()
        if second_off != chroma_qp_off:
            raise NotImplementedError(
                "second_chroma_qp_index_offset differing from the Cb "
                "offset not supported (single chroma QP offset model)"
            )
    return {
        "pps_id": pps_id, "sps_id": sps_id, "init_qp": init_qp,
        "chroma_qp_offset": chroma_qp_off,
        "deblocking_control_present": bool(deblock_ctrl),
        "constrained_intra": bool(constrained_intra),
        "num_ref_l0": num_ref_l0, "num_ref_l1": num_ref_l1,
        "weighted_pred": bool(weighted_pred),
        "weighted_bipred_idc": weighted_bipred_idc,
        "cabac": bool(cabac),
        "pic_scaling": pic_scaling,
        "pic_scaling8": pic_scaling8,
        "transform_8x8": transform_8x8,
    }


# ---------------------------------------------------------------------------
# frame codec state
# ---------------------------------------------------------------------------


class _FrameState:
    """Reconstruction planes + the per-4x4 TotalCoeff grids that feed the
    CAVLC nC context (§9.2.1) — identical in encoder and decoder."""

    def __init__(self, mbw: int, mbh: int):
        self.mbw, self.mbh = mbw, mbh
        self.W, self.H = mbw * 16, mbh * 16
        self.y = np.zeros((self.H, self.W), dtype=np.int64)
        self.cb = np.zeros((self.H // 2, self.W // 2), dtype=np.int64)
        self.cr = np.zeros((self.H // 2, self.W // 2), dtype=np.int64)
        # TotalCoeff per 4x4 block; -1 = not yet decoded/unavailable
        self.nzy = np.full((self.H // 4, self.W // 4), -1, dtype=np.int64)
        self.nzc = np.full((2, self.H // 8, self.W // 8), -1, dtype=np.int64)
        # Intra4x4PredMode per 4x4 block; -1 = unavailable, DC (2) for
        # non-I4x4 macroblocks (§8.3.1.1)
        self.modes4 = np.full((self.H // 4, self.W // 4), -1, dtype=np.int64)
        # per-MB inter state (16x16 partitions only): coded-inter flag and
        # quarter-pel (mvx, mvy) — the §8.4.1.3 prediction context
        self.mb_inter = np.zeros((mbh, mbw), dtype=bool)
        self.mv = np.zeros((mbh, mbw, 2), dtype=np.int64)
        # B-slice per-list context: (mvx, mvy) per list + uses-list flags
        # (a B_L0 MB uses only list 0, B_L1 only list 1, B_Bi both)
        self.mv_l = np.zeros((mbh, mbw, 2, 2), dtype=np.int64)
        self.use_l = np.zeros((mbh, mbw, 2), dtype=bool)
        # per-MB reference index per list (§8.4.1.3.2's refIdxLXN): -1 =
        # intra/unused list; P MBs record list 0.  Feeds the multi-ref MV
        # predictor's same-refIdx rule and the deblocking bS ref compare.
        self.ref_l = np.full((mbh, mbw, 2), -1, dtype=np.int64)
        # per-4x4-BLOCK motion (round 14, sub-macroblock partitions): the
        # §8.4.1.3 prediction context, the §8.7.2.1 bS derivation, and the
        # §8.4.1.2 direct derivations all operate at 4x4 granularity once
        # an MB can hold 16x8/8x16/8x8/8x4/4x8/4x4 partitions.  Every
        # inter write goes through record_motion, which ALSO mirrors the
        # per-MB arrays above (they remain as coarse summaries for the
        # self-interop CABAC context increments and for tests; a
        # partitioned MB's summary is its last-recorded partition).
        self.mv4 = np.zeros((mbh * 4, mbw * 4, 2, 2), dtype=np.int64)
        self.use4 = np.zeros((mbh * 4, mbw * 4, 2), dtype=bool)
        self.ref4 = np.full((mbh * 4, mbw * 4, 2), -1, dtype=np.int64)
        # per-MB flag: this MB's motion went through record_motion (the
        # grids are authoritative); False = legacy per-MB fallback for
        # hand-built test states
        self.rec4 = np.zeros((mbh, mbw), dtype=bool)
        # multi-slice context: which slice decoded/encoded each MB, and
        # the slice being worked on.  Neighbours in a DIFFERENT slice are
        # unavailable for intra prediction, mv prediction, and CAVLC nC
        # (§8.3/§8.4/§9.2: slices decode independently).  Defaults (all 0,
        # cur_slice 0) make single-slice behaviour identical to the
        # pre-multi-slice code — nothing needs marking unless a caller
        # drives multiple slices through one state.
        self.slice_no = np.zeros((mbh, mbw), dtype=np.int64)
        self.cur_slice = 0
        # CABAC-only neighbour context (maintained by the CabacReader/
        # CabacWriter pair in kernels/h264_cabac.py; the CAVLC entropy
        # layer never reads or writes these): per-MB kind enum
        # (h264_cabac.MB_*), coded_block_pattern, intra chroma pred mode,
        # per-list absolute-ish mvd, and the DC coded_block_flags that
        # nzy/nzc (AC counts) cannot represent.  -1 = not decoded.
        self.mb_kind = np.full((mbh, mbw), -1, dtype=np.int64)
        self.mb_cbp = np.full((mbh, mbw), -1, dtype=np.int64)
        self.mb_cmode = np.zeros((mbh, mbw), dtype=np.int64)
        self.mvd_l = np.zeros((mbh, mbw, 2, 2), dtype=np.int64)
        self.cbf_ydc = np.full((mbh, mbw), -1, dtype=np.int64)
        self.cbf_cdc = np.full((2, mbh, mbw), -1, dtype=np.int64)
        # per-MB luma QP (the running slice QP after the MB's qp_delta):
        # the §8.7 deblocking filter's alpha/beta/tc0 lookups need QPp and
        # QPq per macroblock pair.  -1 = not yet coded.
        self.mb_qp = np.full((mbh, mbw), -1, dtype=np.int64)
        # §8.7: I_PCM macroblocks contribute qP = 0 to the deblocking
        # alpha/beta/tc0 lookups regardless of the running slice QP.
        self.mb_pcm = np.zeros((mbh, mbw), dtype=bool)
        # High profile: per-MB transform_size_8x8_flag (feeds the CABAC
        # t8 context increment and §8.7's internal-edge skip), plus the
        # picture-level enables set by decode_picture / encode_picture_*
        # (t8_mode = the PPS transform_8x8_mode_flag; direct8_inf = the
        # SPS direct_8x8_inference_flag conditioning the flag's presence
        # on B_Direct MBs).
        self.mb_t8 = np.zeros((mbh, mbw), dtype=bool)
        self.t8_mode = False
        self.direct8_inf = True
        # POC tags (round 13, §8.4.1.2.3 temporal direct): the picture's
        # own PicOrderCnt and the POCs of the RefPicList0/1 its slices
        # predicted from.  None = untagged — temporal direct then refuses
        # loudly.  Set by the container walk (sources/mp4.decode_range),
        # by decode_picture(cur_poc=...), and by the encoders
        # (poc_lsb-derived; exact for streams shorter than a POC wrap).
        self.poc: "int | None" = None
        self.ref_pocs0: "list | None" = None
        self.ref_pocs1: "list | None" = None

    def mb_same_slice(self, mbx: int, mby: int) -> bool:
        """In-frame AND belongs to the slice currently being coded."""
        return (
            0 <= mbx < self.mbw
            and 0 <= mby < self.mbh
            and self.slice_no[mby, mbx] == self.cur_slice
        )

    def up_ok(self, mbx: int, mby: int) -> bool:
        return self.mb_same_slice(mbx, mby - 1)

    def left_ok(self, mbx: int, mby: int) -> bool:
        return self.mb_same_slice(mbx - 1, mby)

    def ul_ok(self, mbx: int, mby: int) -> bool:
        return self.mb_same_slice(mbx - 1, mby - 1)

    def record_motion(self, by0: int, bx0: int, ph4: int, pw4: int,
                      lst: int, mv, ridx: int) -> None:
        """Record one partition's FINAL motion for list ``lst`` over the
        4x4-block rectangle at (by0, bx0) spanning ph4 x pw4 blocks: the
        authoritative per-4x4 grids (read by mv_pred_blk, the §8.4.1.2
        direct derivations, and the §8.7.2.1 bS derivation), plus the
        legacy per-MB summaries (self-interop CABAC context increments
        and tests; a partitioned MB's summary is its LAST partition —
        symmetric between encoder and decoder because both record in
        partition decode order)."""
        self.use4[by0 : by0 + ph4, bx0 : bx0 + pw4, lst] = True
        self.mv4[by0 : by0 + ph4, bx0 : bx0 + pw4, lst] = mv
        self.ref4[by0 : by0 + ph4, bx0 : bx0 + pw4, lst] = ridx
        mby, mbx = by0 >> 2, bx0 >> 2
        self.rec4[mby, mbx] = True
        was0 = self.use_l[mby, mbx, 0]
        self.use_l[mby, mbx, lst] = True
        self.mv_l[mby, mbx, lst] = mv
        self.ref_l[mby, mbx, lst] = ridx
        if lst == 0 or not was0:
            self.mv[mby, mbx] = mv

    def blk_ok(self, by: int, bx: int, mbx: int, mby: int,
               done=None) -> bool:
        """§6.4.12.2 neighbouring-4x4-block availability as seen from
        inside MB (mbx, mby): in the frame, in the current slice, and
        already decoded — an earlier MB in raster order, or an
        already-derived partition of the CURRENT MB (``done`` mask,
        MB-local 4x4 indexing)."""
        if by < 0 or bx < 0 or by >= self.mbh * 4 or bx >= self.mbw * 4:
            return False
        nmbx, nmby = bx >> 2, by >> 2
        if nmbx == mbx and nmby == mby:
            return done is not None and bool(done[by & 3, bx & 3])
        if nmby > mby or (nmby == mby and nmbx > mbx):
            return False  # later in raster order: not yet decoded
        return self.slice_no[nmby, nmbx] == self.cur_slice

    def _blk_motion(self, by: int, bx: int, lst: int | None = None):
        """(available_inter, mv, refIdx) for one 4x4 block; intra blocks
        and blocks not predicting from ``lst`` contribute mv (0,0) with
        ref -1 (§8.4.1.3.2).  ``lst`` None = list 0 (P slices).  States
        never touched by :meth:`record_motion` (hand-built test states)
        fall back to the legacy per-MB summaries."""
        zero = np.zeros(2, dtype=np.int64)
        l = 0 if lst is None else lst
        mby, mbx = by >> 2, bx >> 2
        if self.rec4[mby, mbx]:
            if not self.use4[by, bx, l]:
                return False, zero, -1
            return True, self.mv4[by, bx, l], max(int(self.ref4[by, bx, l]), 0)
        if lst is None:
            if not self.mb_inter[mby, mbx]:
                return False, zero, -1
            # unset ref_l on an inter MB reads as refIdx 0 (states built
            # before multi-ref recording existed stay bit-compatible)
            return True, self.mv[mby, mbx], max(int(self.ref_l[mby, mbx, 0]), 0)
        if not self.use_l[mby, mbx, lst]:
            return False, zero, -1
        return True, self.mv_l[mby, mbx, lst], max(
            int(self.ref_l[mby, mbx, lst]), 0)

    def _neigh_abc(self, by0: int, bx0: int, pw4: int,
                   lst: int | None, done, mbx: int, mby: int):
        """The §8.4.1.3.2 neighbour triple for a partition at 4x4-block
        origin (by0, bx0) of width pw4 blocks: ((availA, mvA, refA),
        (B...), (C...), b_edge).  C = above-right of the top-right
        block, replaced by D = above-left when unavailable; ``b_edge``
        is the B-C-D-all-unavailable shortcut condition."""
        zero = np.zeros(2, dtype=np.int64)
        okA = self.blk_ok(by0, bx0 - 1, mbx, mby, done)
        okB = self.blk_ok(by0 - 1, bx0, mbx, mby, done)
        okC = self.blk_ok(by0 - 1, bx0 + pw4, mbx, mby, done)
        okD = self.blk_ok(by0 - 1, bx0 - 1, mbx, mby, done)
        a = (self._blk_motion(by0, bx0 - 1, lst)
             if okA else (False, zero, -1))
        b = (self._blk_motion(by0 - 1, bx0, lst)
             if okB else (False, zero, -1))
        if okC:
            c = self._blk_motion(by0 - 1, bx0 + pw4, lst)
        elif okD:
            c = self._blk_motion(by0 - 1, bx0 - 1, lst)
        else:
            c = (False, zero, -1)
        return a, b, c, not (okB or okC or okD)

    def mv_pred_blk(self, by0: int, bx0: int, ph4: int, pw4: int,
                    lst: int | None = None, ref_idx: int = 0,
                    done=None, shape=None) -> np.ndarray:
        """§8.4.1.3 luma MV prediction for one partition at 4x4-block
        origin (by0, bx0) spanning ph4 x pw4 blocks.  Neighbours are
        read from the per-4x4 grids, so partitions inside one MB see
        earlier partitions' final vectors (``done`` marks them);
        ``shape`` = ("16x8", idx) / ("8x16", idx) applies the §8.4.1.3
        directional shortcuts for the two-partition MB types (checked
        against the FINAL C after the D substitution); the median rule
        with the exactly-one-same-refIdx shortcut otherwise."""
        mbx, mby = bx0 >> 2, by0 >> 2
        (availA, mvA, refA), (availB, mvB, refB), (availC, mvC, refC), \
            b_edge = self._neigh_abc(by0, bx0, pw4, lst, done, mbx, mby)
        if shape == ("16x8", 0) and refB == ref_idx:
            return mvB.copy()
        if shape == ("16x8", 1) and refA == ref_idx:
            return mvA.copy()
        if shape == ("8x16", 0) and refA == ref_idx:
            return mvA.copy()
        if shape == ("8x16", 1) and refC == ref_idx:
            return mvC.copy()
        if b_edge:
            # §8.4.1.3.1: B, C, D all unavailable -> mvLXA (the zero
            # vector when A itself is unavailable or intra)
            return mvA.copy()
        same = [
            (avail and ref == ref_idx, mv)
            for avail, mv, ref in
            ((availA, mvA, refA), (availB, mvB, refB), (availC, mvC, refC))
        ]
        n_same = sum(1 for s, _ in same if s)
        if n_same == 1:
            return next(mv for s, mv in same if s).copy()
        stacked = np.stack([mvA, mvB, mvC])
        return np.median(stacked, axis=0).astype(np.int64)

    def mv_pred(self, mbx: int, mby: int, lst: int | None = None,
                ref_idx: int = 0) -> np.ndarray:
        """Median MV predictor for a 16x16 partition (§8.4.1.3) — the
        whole-MB view of :meth:`mv_pred_blk`."""
        return self.mv_pred_blk(mby * 4, mbx * 4, 4, 4, lst, ref_idx)

    def _direct_cells(self):
        """The §8.4.1.2 sampling grid in MB-local 4x4-block units:
        (sy, sx, h4, w4, cy, cx) regions with their co-located sampling
        block — the 8x8 quadrants' corner blocks under
        direct_8x8_inference (§8.4.1.2.1), else every 4x4 block."""
        if self.direct8_inf:
            return ((0, 0, 2, 2, 0, 0), (0, 2, 2, 2, 0, 3),
                    (2, 0, 2, 2, 3, 0), (2, 2, 2, 2, 3, 3))
        return tuple((sy, sx, 1, 1, sy, sx)
                     for sy in range(4) for sx in range(4))

    def spatial_direct(self, mbx: int, mby: int, col):
        """§8.4.1.2.2 spatial direct motion derivation: returns
        (refIdxL0, refIdxL1, [mvL0 | None, mvL1 | None], zmask).

        - refIdxLX = MinPositive over neighbours A, B, C (C replaced by
          D = above-left when unavailable, as in :meth:`mv_pred`);
          intra / unavailable / list-unused neighbours contribute -1.
        - both lists empty -> directZeroPredictionFlag: refIdx 0/0 with
          zero MVs (zmask all True — uniformly zero).
        - ``zmask`` is the (4, 4) per-4x4-block colZeroFlag grid: the
          CO-LOCATED block's motion (sampled per :meth:`_direct_cells`,
          from ``col`` = the RefPicList1[0] reconstruction state) is
          near-zero (both quarter-pel components in [-1, 1]) against ITS
          refIdx 0, and the col picture is short-term.  A block's mvLX
          collapses to zero where (zmask and refIdxLX == 0) — see
          :meth:`direct_motion` / :func:`_direct_block_mvs`.
        - per list: refIdx < 0 -> list unused; else the §8.4.1.3.1
          median predictor at the derived refIdx."""

        def min_pos(a: int, b: int) -> int:
            return min(a, b) if (a >= 0 and b >= 0) else max(a, b)

        by0, bx0 = mby * 4, mbx * 4
        derived = []
        for lst in (0, 1):
            (_, _, ra), (_, _, rb), (_, _, rc), _ = self._neigh_abc(
                by0, bx0, 4, lst, None, mbx, mby)
            derived.append(min_pos(ra, min_pos(rb, rc)))
        ridx0, ridx1 = derived
        direct_zero = ridx0 < 0 and ridx1 < 0
        if direct_zero:
            ridx0 = ridx1 = 0
        zmask = np.zeros((4, 4), dtype=bool)
        if direct_zero:
            zmask[:] = True
        elif col is not None and not getattr(col, "is_long_term", False):
            for sy, sx, h4, w4, cy, cx in self._direct_cells():
                mv_col, ref_col, _ = _col_block_motion(
                    col, by0 + cy, bx0 + cx)
                if (
                    mv_col is not None
                    and ref_col == 0
                    and abs(int(mv_col[0])) <= 1
                    and abs(int(mv_col[1])) <= 1
                ):
                    zmask[sy : sy + h4, sx : sx + w4] = True
        mvs: list = [None, None]
        for lst, ridx in ((0, ridx0), (1, ridx1)):
            if ridx < 0:
                continue
            if direct_zero:
                mvs[lst] = np.zeros(2, dtype=np.int64)
            else:
                mvs[lst] = self.mv_pred(mbx, mby, lst, ref_idx=ridx)
        return ridx0, ridx1, mvs, zmask

    def _temporal_scale(self, mv_col, rc: int, ref_pocs, refs0, col):
        """§8.4.1.2.3 per-block refIdx mapping + MV scaling: returns
        (refIdxL0, mvL0, mvL1) for one co-located block's motion.

        - refIdxL0 = the lowest current-list-0 index holding the picture
          the co-located motion references (matched by POC tag).
        - MV scaling: td = Clip3(-128, 127, POC(col) - POC(colRef)),
          tb likewise for the current picture; tx = (16384 +
          Abs(td/2)) / td (C truncating division); DistScaleFactor =
          Clip3(-1024, 1023, (tb*tx + 32) >> 6); mvL0 = (DSF*mvCol +
          128) >> 8; mvL1 = mvL0 - mvCol.  td == 0 or a long-term
          colRef short-circuits to mvL0 = mvCol, mvL1 = 0."""
        if ref_pocs is None or rc >= len(ref_pocs) or ref_pocs[rc] is None:
            raise NotImplementedError(
                "temporal direct: the co-located picture carries no "
                "reference-POC tags (un-walked state)"
            )
        poc_col_ref = ref_pocs[rc]
        ridx0 = next(
            (i for i, r in enumerate(refs0)
             if getattr(r, "poc", None) == poc_col_ref),
            None,
        )
        if ridx0 is None:
            raise NotImplementedError(
                "temporal direct: the co-located reference picture "
                f"(POC {poc_col_ref}) is not in the current RefPicList0"
            )
        mv_col = np.asarray(mv_col, dtype=np.int64)
        td = min(max(int(col.poc) - poc_col_ref, -128), 127)
        if td == 0 or getattr(refs0[ridx0], "is_long_term", False):
            return ridx0, mv_col.copy(), np.zeros(2, dtype=np.int64)
        tb = min(max(int(self.poc) - poc_col_ref, -128), 127)
        q = 16384 + (abs(td) >> 1)
        tx = q // td if td > 0 else -(q // -td)  # C truncating division
        dsf = min(max((tb * tx + 32) >> 6, -1024), 1023)
        mv0 = (dsf * mv_col + 128) >> 8  # arithmetic shift (floor)
        return ridx0, mv0, mv0 - mv_col

    def temporal_direct(self, mbx: int, mby: int, refs0, refs1):
        """§8.4.1.2.3 temporal direct motion derivation for
        B_Direct_16x16 / B_Skip / B_Direct_8x8 under
        ``direct_spatial_mv_pred_flag == 0``: returns the region list
        [(sy, sx, h4, w4, refIdxL0, refIdxL1 == 0, mvL0, mvL1)] in
        MB-local 4x4-block units — one whole-MB region when the
        co-located motion is uniform (every 16x16-partition stream),
        else one region per :meth:`_direct_cells` sample.  Temporal
        direct always predicts from BOTH lists.

        Per region: the co-located block's list-0 motion is used when
        present, else list 1, else (intra) zero motion with refIdxCol =
        0 — mapped through colPic's OWN reference-POC tags into the
        current RefPicList0 (falling back to index 0 only when the
        current list holds a single picture, where the mapping cannot
        matter); scaling per :meth:`_temporal_scale`.

        POC-untagged states (raw decode_picture calls without
        cur_poc / un-walked references) refuse loudly rather than
        guess."""
        col = refs1[0] if refs1 else None
        if col is None:
            raise ValueError("temporal direct needs RefPicList1[0]")
        by0, bx0 = mby * 4, mbx * 4
        out = []
        for sy, sx, h4, w4, cy, cx in self._direct_cells():
            mv_col, rc, ref_pocs = _col_block_motion(
                col, by0 + cy, bx0 + cx)
            if mv_col is None:
                # intra (or PCM) co-located block: mvCol = 0, refIdxCol
                # = 0 (§8.4.1.2.1) — the scaled vectors are zero
                # regardless of POC distances, but refIdxL0 must map
                # colPic's RefPicList0[0] into the CURRENT list (ADVICE
                # r13: with multi-ref L0 and per-ref explicit weights,
                # silently assuming index 0 could weight from the wrong
                # picture)
                z = np.zeros(2, dtype=np.int64)
                if len(refs0) == 1:
                    ridx0 = 0  # the mapping cannot matter
                elif col.ref_pocs0 and col.ref_pocs0[0] is not None:
                    poc0 = col.ref_pocs0[0]
                    ridx0 = next(
                        (i for i, r in enumerate(refs0)
                         if getattr(r, "poc", None) == poc0),
                        None,
                    )
                    if ridx0 is None:
                        raise NotImplementedError(
                            "temporal direct: the intra co-located "
                            f"block's refIdxCol = 0 picture (POC {poc0})"
                            " is not in the current RefPicList0"
                        )
                else:
                    raise NotImplementedError(
                        "temporal direct: intra co-located block with a "
                        "multi-picture RefPicList0 needs colPic "
                        "reference-POC tags to map refIdxCol = 0"
                    )
                out.append((sy, sx, h4, w4, ridx0, 0, z, z.copy()))
                continue
            if self.poc is None or col.poc is None:
                raise NotImplementedError(
                    "temporal direct needs POC-tagged pictures (decode "
                    "through the container walk, or pass "
                    "decode_picture(cur_poc=...) with .poc/.ref_pocs0 "
                    "set on every reference state)"
                )
            ridx0, mv0, mv1 = self._temporal_scale(
                mv_col, rc, ref_pocs, refs0, col)
            out.append((sy, sx, h4, w4, ridx0, 0, mv0, mv1))
        first = out[0]
        if all(
            r[4] == first[4]
            and np.array_equal(r[6], first[6])
            and np.array_equal(r[7], first[7])
            for r in out[1:]
        ):
            return [(0, 0, 4, 4) + first[4:]]
        return out

    def skip_mv(self, mbx: int, mby: int) -> np.ndarray:
        """P_Skip motion vector (§8.4.1.1): zero when at the left/top
        edge or when either A or B is a zero-MV refIdx-0 inter block,
        else the median predictor with refIdxL0 = 0.  A/B are the 4x4
        blocks adjacent to the MB's top-left corner, so a PARTITIONED
        left neighbour contributes its right-column top partition."""
        by0, bx0 = mby * 4, mbx * 4
        # A/B block-unavailable (frame edge OR slice boundary) -> zero MV
        if not self.blk_ok(by0, bx0 - 1, mbx, mby):
            return np.zeros(2, dtype=np.int64)
        if not self.blk_ok(by0 - 1, bx0, mbx, mby):
            return np.zeros(2, dtype=np.int64)
        availA, mvA, refA = self._blk_motion(by0, bx0 - 1)
        availB, mvB, refB = self._blk_motion(by0 - 1, bx0)
        if availA and refA == 0 and mvA[0] == 0 and mvA[1] == 0:
            return np.zeros(2, dtype=np.int64)
        if availB and refB == 0 and mvB[0] == 0 and mvB[1] == 0:
            return np.zeros(2, dtype=np.int64)
        return self.mv_pred(mbx, mby)

    def direct_motion(self, mbx: int, mby: int, refs0, refs1,
                      spatial: bool = True):
        """Direct-mode motion for one MB as a region list
        [(sy, sx, h4, w4, refIdxL0, refIdxL1, mvL0 | None, mvL1 | None)]
        in MB-local 4x4-block units, merged to the coarsest uniform
        granularity (whole MB / 8x8 quadrants / single blocks).  The
        spatial path applies the per-block colZero collapse
        (§8.4.1.2.2) to the MB-level prediction; the temporal path is
        per-block by construction (§8.4.1.2.3)."""
        if not spatial:
            return self.temporal_direct(mbx, mby, refs0, refs1)
        col = refs1[0] if refs1 else None
        ridx0, ridx1, mvs, zmask = self.spatial_direct(mbx, mby, col)
        zeroable = (ridx0 == 0 and mvs[0] is not None) or (
            ridx1 == 0 and mvs[1] is not None)
        if not zeroable or bool(zmask.all()) or not zmask.any():
            m = _direct_block_mvs(ridx0, ridx1, mvs, bool(zmask[0, 0]))
            return [(0, 0, 4, 4, ridx0, ridx1, m[0], m[1])]
        out = []
        for sy, sx, h4, w4, _, _ in self._direct_cells():
            m = _direct_block_mvs(ridx0, ridx1, mvs, bool(zmask[sy, sx]))
            out.append((sy, sx, h4, w4, ridx0, ridx1, m[0], m[1]))
        return out

    def nC(self, grid: np.ndarray, by: int, bx: int, bsz: int = 4) -> int:
        """CAVLC nC context (§9.2.1).  ``bsz`` = 4x4 blocks per MB side in
        ``grid`` (4 for luma nzy, 2 for chroma nzc) — it maps a block to
        its MB so cross-slice neighbours read as unavailable."""
        nA = (
            grid[by, bx - 1]
            if bx > 0 and self.mb_same_slice((bx - 1) // bsz, by // bsz)
            else -1
        )
        nB = (
            grid[by - 1, bx]
            if by > 0 and self.mb_same_slice(bx // bsz, (by - 1) // bsz)
            else -1
        )
        if nA >= 0 and nB >= 0:
            return (int(nA) + int(nB) + 1) >> 1
        if nA >= 0:
            return int(nA)
        if nB >= 0:
            return int(nB)
        return 0

    def pred_mode4(self, by: int, bx: int) -> int:
        """Predicted Intra4x4PredMode = min(left, above); DC when a
        neighbour is unavailable or not I_4x4 (mode stored as 2)."""
        a = (
            self.modes4[by, bx - 1]
            if bx > 0 and self.mb_same_slice((bx - 1) // 4, by // 4)
            else -1
        )
        b = (
            self.modes4[by - 1, bx]
            if by > 0 and self.mb_same_slice(bx // 4, (by - 1) // 4)
            else -1
        )
        if a < 0 or b < 0:
            return 2
        return int(min(a, b))


def _tap6(p0, p1, p2, p3, p4, p5):
    """The spec's 6-tap FIR (1, -5, 20, 20, -5, 1) — unrounded."""
    return p0 - 5 * p1 + 20 * p2 + 20 * p3 - 5 * p4 + p5


def _col_block_motion(col, by: int, bx: int):
    """One co-located 4x4 block's motion for the §8.4.1.2 direct
    derivations: (mv, refIdx, ref_pocs) through the block's list 0 when
    used, else list 1, else (None, -1, None) for intra/PCM.  States
    never touched by record_motion fall back to the per-MB summaries
    (hand-built test states)."""
    mby, mbx = by >> 2, bx >> 2
    if col.rec4[mby, mbx]:
        if col.use4[by, bx, 0]:
            return (col.mv4[by, bx, 0],
                    max(int(col.ref4[by, bx, 0]), 0), col.ref_pocs0)
        if col.use4[by, bx, 1]:
            return (col.mv4[by, bx, 1],
                    max(int(col.ref4[by, bx, 1]), 0), col.ref_pocs1)
        return None, -1, None
    if col.use_l[mby, mbx, 0]:
        return (col.mv_l[mby, mbx, 0],
                max(int(col.ref_l[mby, mbx, 0]), 0), col.ref_pocs0)
    if col.use_l[mby, mbx, 1]:
        return (col.mv_l[mby, mbx, 1],
                max(int(col.ref_l[mby, mbx, 1]), 0), col.ref_pocs1)
    if col.mb_inter[mby, mbx]:  # legacy P-coded state (list-0 only)
        return (col.mv[mby, mbx],
                max(int(col.ref_l[mby, mbx, 0]), 0), col.ref_pocs0)
    return None, -1, None


def _direct_block_mvs(ridx0: int, ridx1: int, mvs, z: bool):
    """Effective spatial-direct MVs for one block: a used list's vector
    collapses to zero when (colZeroFlag and refIdxLX == 0)
    (§8.4.1.2.2)."""
    out = [None, None]
    for lst, ridx in ((0, ridx0), (1, ridx1)):
        if mvs[lst] is None:
            continue
        out[lst] = (np.zeros(2, dtype=np.int64)
                    if (z and ridx == 0) else mvs[lst])
    return out


def mc_luma(ref_y: np.ndarray, oy: int, ox: int, mv,
            bh: int = 16, bw: int = 16) -> np.ndarray:
    """``bh`` x ``bw`` luma motion compensation at full QUARTER-pel
    precision (§8.4.2.2.1): integer fast path; half-pel via the 6-tap
    FIR with (+16)>>5 rounding (center position j via the two-stage
    unrounded filter and (+512)>>10); quarter positions as the spec's
    +1>>1 averages (Table 8-12).  Reference coords edge-clamped per
    spec.  Default 16x16; sub-MB partitions pass their own size (the
    interpolation is position-invariant, so a partitioned MC equals the
    matching window of a whole-MB MC)."""
    mvx, mvy = int(mv[0]), int(mv[1])
    xi, xf = mvx >> 2, mvx & 3
    yi, yf = mvy >> 2, mvy & 3
    H_, W_ = ref_y.shape
    if xf == 0 and yf == 0:
        rows = np.clip(np.arange(oy + yi, oy + yi + bh), 0, H_ - 1)
        cols = np.clip(np.arange(ox + xi, ox + xi + bw), 0, W_ - 1)
        return ref_y[np.ix_(rows, cols)]
    # padded window: integer grid from -2 to +bh+2 around the target
    rows = np.clip(np.arange(oy + yi - 2, oy + yi + bh + 3), 0, H_ - 1)
    cols = np.clip(np.arange(ox + xi - 2, ox + xi + bw + 3), 0, W_ - 1)
    P = ref_y[np.ix_(rows, cols)].astype(np.int64)  # (bh+5, bw+5)

    def clip1(v):
        return np.clip(v, 0, 255)

    G = P[2 : bh + 2, 2 : bw + 2]
    Hn = P[2 : bh + 2, 3 : bw + 3]   # integer right neighbour
    M = P[3 : bh + 3, 2 : bw + 2]    # integer below neighbour
    # horizontal 6-tap, unrounded: b1[r, x] over all bh+5 window rows
    b1 = _tap6(P[:, 0:bw], P[:, 1 : bw + 1], P[:, 2 : bw + 2],
               P[:, 3 : bw + 3], P[:, 4 : bw + 4], P[:, 5 : bw + 5])
    b = clip1((b1[2 : bh + 2, :] + 16) >> 5)    # half right of G
    s = clip1((b1[3 : bh + 3, :] + 16) >> 5)    # b shifted one row down
    # vertical 6-tap, unrounded: h1[y, c] over all bw+5 window cols
    h1 = _tap6(P[0:bh, :], P[1 : bh + 1, :], P[2 : bh + 2, :],
               P[3 : bh + 3, :], P[4 : bh + 4, :], P[5 : bh + 5, :])
    h = clip1((h1[:, 2 : bw + 2] + 16) >> 5)    # half below G
    m = clip1((h1[:, 3 : bw + 3] + 16) >> 5)    # h shifted one col right
    # center j: vertical 6-tap over unrounded horizontal values
    j1 = _tap6(b1[0:bh, :], b1[1 : bh + 1, :], b1[2 : bh + 2, :],
               b1[3 : bh + 3, :], b1[4 : bh + 4, :], b1[5 : bh + 5, :])
    j = clip1((j1 + 512) >> 10)
    pos = (xf, yf)
    if pos == (2, 0):
        return b
    if pos == (0, 2):
        return h
    if pos == (2, 2):
        return j
    if pos == (1, 0):
        return (G + b + 1) >> 1
    if pos == (3, 0):
        return (Hn + b + 1) >> 1
    if pos == (0, 1):
        return (G + h + 1) >> 1
    if pos == (0, 3):
        return (M + h + 1) >> 1
    if pos == (1, 1):
        return (b + h + 1) >> 1
    if pos == (3, 1):
        return (b + m + 1) >> 1
    if pos == (1, 3):
        return (h + s + 1) >> 1
    if pos == (3, 3):
        return (m + s + 1) >> 1
    if pos == (2, 1):
        return (b + j + 1) >> 1
    if pos == (1, 2):
        return (h + j + 1) >> 1
    if pos == (2, 3):
        return (j + s + 1) >> 1
    if pos == (3, 2):
        return (j + m + 1) >> 1
    raise AssertionError(f"unreachable fraction {pos}")


def mc_chroma(ref_c: np.ndarray, cy: int, cx: int, mv,
              bh: int = 8, bw: int = 8) -> np.ndarray:
    """``bh`` x ``bw`` chroma motion compensation, full 1/8-pel bilinear
    (§8.4.2.2.2): the chroma vector IS the luma vector reinterpreted in
    eighth-pel chroma units (any luma fraction maps to a legal 1/8
    chroma position).  Reference coords edge-clamped.  Default 8x8 (a
    16x16 luma partition); sub-MB partitions pass half their luma
    size."""
    mvx, mvy = int(mv[0]), int(mv[1])
    xi, xf = mvx >> 3, mvx & 7
    yi, yf = mvy >> 3, mvy & 7
    H_, W_ = ref_c.shape
    rows = np.clip(np.arange(cy + yi, cy + yi + bh + 1), 0, H_ - 1)
    cols = np.clip(np.arange(cx + xi, cx + xi + bw + 1), 0, W_ - 1)
    blk = ref_c[np.ix_(rows, cols)]
    a = blk[:bh, :bw]
    b = blk[:bh, 1 : bw + 1]
    c = blk[1 : bh + 1, :bw]
    d = blk[1 : bh + 1, 1 : bw + 1]
    return (
        (8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
        + (8 - xf) * yf * c + xf * yf * d + 32
    ) >> 6


def _zz_to_mat(coeffs: list[int]) -> np.ndarray:
    m = np.zeros(16, dtype=np.int64)
    for i, pos in enumerate(ZIGZAG_4x4):
        m[pos] = coeffs[i]
    return m.reshape(4, 4)


def _mat_to_zz(m: np.ndarray) -> list[int]:
    f = m.reshape(-1)
    return [int(f[pos]) for pos in ZIGZAG_4x4]


def hadamard2(m: np.ndarray) -> np.ndarray:
    h = np.array([[1, 1], [1, -1]], dtype=np.int64)
    return h @ m.astype(np.int64) @ h


# ---------------------------------------------------------------------------
# entropy layer abstraction: the macroblock walk is entropy-agnostic; a
# reader/writer pair supplies every syntax element.  CavlcReader/Writer
# wrap the exp-Golomb + residual-VLC functions above; the CABAC pair
# lives in kernels/h264_cabac.py (arithmetic engine in kernels/cabac.py).
# ---------------------------------------------------------------------------


class CavlcReader:
    """CAVLC syntax-element reader (§9.1 exp-Golomb + §9.2 residuals).
    Positional arguments carried for the CABAC twin's neighbour-context
    needs are unused here."""

    cabac = False

    def __init__(self, r: BitReader):
        self.r = r

    def mb_type(self, st, mbx, mby, sl: str) -> int:
        return self.r.ue()

    def sub_mb_type(self, st, mbx, mby, sl: str) -> int:
        # §7.3.5.2: plain ue(v) per 8x8 (Table 7-17 P / 7-18 B)
        return self.r.ue()

    def mvd_pair(self, st, mbx, mby, lst: int):
        return self.r.se(), self.r.se()

    def ref_idx(self, st, mbx, mby, n_active: int, lst: int = 0) -> int:
        # te(v), §9.1.1: one inverted bit when the range max is 1, ue(v)
        # otherwise (``lst`` only conditions the CABAC twin's contexts)
        if n_active == 2:
            return 1 - self.r.u(1)
        return self.r.ue()

    def cbp(self, st, mbx, mby, intra: bool) -> int:
        return (_CBP_INTRA if intra else _CBP_INTER)[self.r.ue()]

    def t8_flag(self, st, mbx, mby) -> bool:
        # transform_size_8x8_flag, u(1) (§7.3.5)
        return bool(self.r.u(1))

    def qp_delta(self, st, mbx, mby) -> int:
        return self.r.se()

    def intra4_mode(self, st, by, bx, pred: int) -> int:
        if self.r.u(1):
            return pred
        rem = self.r.u(3)
        return rem if rem < pred else rem + 1

    def chroma_mode(self, st, mbx, mby) -> int:
        return self.r.ue()

    def pcm_samples(self, st, mbx, mby):
        r = self.r
        r.byte_align()
        lum = np.array([r.u(8) for _ in range(256)], dtype=np.int64)
        cbs = np.array([r.u(8) for _ in range(64)], dtype=np.int64)
        crs = np.array([r.u(8) for _ in range(64)], dtype=np.int64)
        return lum.reshape(16, 16), cbs.reshape(8, 8), crs.reshape(8, 8)

    def res_luma_dc16(self, st, mbx, mby) -> list:
        nC = st.nC(st.nzy, mby * 4, mbx * 4)
        return decode_residual(self.r, nC, 16)

    def res_luma(self, st, by, bx, ac: bool) -> list:
        nC = st.nC(st.nzy, by, bx)
        return decode_residual(self.r, nC, 15 if ac else 16)

    def res_chroma_dc(self, st, comp, mbx, mby) -> list:
        return decode_residual(self.r, -1, 4)

    def res_chroma_ac(self, st, comp, cby, cbx) -> list:
        nC = st.nC(st.nzc[comp], cby, cbx, bsz=2)
        return decode_residual(self.r, nC, 15)


class CavlcWriter:
    """CAVLC syntax-element writer, mirror of :class:`CavlcReader`.
    Residual methods return the block's TotalCoeff (the nC context the
    caller records in nzy/nzc) and may raise :class:`_NonVerbatimCode`
    (the I_PCM fallback path)."""

    cabac = False

    def __init__(self, w: BitWriter):
        self.w = w

    def checkpoint(self):
        """Bit-exact rollback point (the I_PCM fallback path unwinds a
        partially written MB).  The CABAC writer has no checkpoint —
        arithmetic coding is not unwindable — and never needs one: it
        has no non-verbatim codes, so nothing raises."""
        return len(self.w.buf), self.w.acc, self.w.nbits

    def rollback(self, cp) -> None:
        del self.w.buf[cp[0]:]
        self.w.acc, self.w.nbits = cp[1], cp[2]

    def mb_type(self, st, mbx, mby, sl: str, t: int) -> None:
        self.w.ue(t)

    def sub_mb_type(self, st, mbx, mby, sl: str, t: int) -> None:
        self.w.ue(t)

    def mvd_pair(self, st, mbx, mby, lst: int, mvd) -> None:
        self.w.se(int(mvd[0]))
        self.w.se(int(mvd[1]))

    def ref_idx(self, st, mbx, mby, n_active: int, v: int,
                lst: int = 0) -> None:
        # te(v) mirror of CavlcReader.ref_idx
        if n_active == 2:
            self.w.u(1 - v, 1)
        else:
            self.w.ue(v)

    def cbp(self, st, mbx, mby, intra: bool, cbp: int) -> None:
        self.w.ue((_CBP_INTRA_INV if intra else _CBP_INTER_INV)[cbp])

    def t8_flag(self, st, mbx, mby, v: bool) -> None:
        self.w.u(1 if v else 0, 1)

    def qp_delta(self, st, mbx, mby, d: int) -> None:
        self.w.se(d)

    def intra4_mode(self, st, by, bx, pred: int, mode: int) -> None:
        if mode == pred:
            self.w.u(1, 1)
        else:
            self.w.u(0, 1)
            self.w.u(mode if mode < pred else mode - 1, 3)

    def chroma_mode(self, st, mbx, mby, mode: int) -> None:
        self.w.ue(mode)

    def pcm_samples(self, st, mbx, mby, lum, cbs, crs) -> None:
        w = self.w
        w.byte_align_zero()
        for v in lum.reshape(-1):
            w.u(int(v), 8)
        for v in cbs.reshape(-1):
            w.u(int(v), 8)
        for v in crs.reshape(-1):
            w.u(int(v), 8)

    def res_luma_dc16(self, st, mbx, mby, zz: list) -> int:
        nC = st.nC(st.nzy, mby * 4, mbx * 4)
        return encode_residual(self.w, zz, nC)

    def res_luma(self, st, by, bx, ac: bool, zz: list) -> int:
        nC = st.nC(st.nzy, by, bx)
        return encode_residual(self.w, zz, nC)

    def res_chroma_dc(self, st, comp, mbx, mby, zz: list) -> int:
        return encode_residual(self.w, zz, -1)

    def res_chroma_ac(self, st, comp, cby, cbx, zz: list) -> int:
        nC = st.nC(st.nzc[comp], cby, cbx, bsz=2)
        return encode_residual(self.w, zz, nC)


# ---------------------------------------------------------------------------
# slice decode (§7.3.3 header + §7.3.5 macroblock layer, I and P slices)
# ---------------------------------------------------------------------------


def _crop_planes(st: _FrameState, sps: dict):
    crop = sps["crop"]
    H_, W_ = sps["height"], sps["width"]
    y0, x0 = 2 * crop[2], 2 * crop[0]
    y = st.y[y0 : y0 + H_, x0 : x0 + W_]
    cb = st.cb[y0 // 2 : y0 // 2 + H_ // 2, x0 // 2 : x0 // 2 + W_ // 2]
    cr = st.cr[y0 // 2 : y0 // 2 + H_ // 2, x0 // 2 : x0 // 2 + W_ // 2]
    return (y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8))


def _parse_slice_header(
    r: BitReader, sps: dict, pps: dict, strict: bool,
    idr: bool, nal_ref_idc: int,
    ref: "_FrameState | None", ref1: "_FrameState | None",
) -> tuple[int, int, int, "dict | None"]:
    """§7.3.3 slice header -> (first_mb_in_slice, slice_type mod 5, qp,
    weighted-prediction table or None).  Validates the feature envelope
    (refusing loudly outside it) and that the needed reference states
    were supplied."""
    first_mb = r.ue()
    slice_type = r.ue()
    st_mod = slice_type % 5
    if st_mod not in (0, 1, 2):
        raise NotImplementedError(
            f"slice_type {slice_type}: only I, P, and B slices (SP/SI out "
            "of scope)"
        )
    is_p = st_mod == 0
    is_b = st_mod == 1
    if is_p and ref is None:
        raise ValueError("P slice needs the previous frame's state (ref=)")
    if is_b and (ref is None or ref1 is None):
        raise ValueError(
            "B slice needs both reference states (ref= past, ref1= future)"
        )
    r.ue()  # pps_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    if idr:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps.get("log2_max_poc_lsb", 4))  # pic_order_cnt_lsb
    direct_spatial = True
    if is_b:
        # spatial direct is the supported derivation; temporal direct is
        # refused at the first direct MB (the flag alone is harmless)
        direct_spatial = bool(r.u(1))
    n_l0 = pps.get("num_ref_l0", 0) + 1
    n_l1 = pps.get("num_ref_l1", 0) + 1
    if is_p or is_b:
        if r.u(1):  # num_ref_idx_active_override_flag
            n_l0 = r.ue() + 1  # num_ref_idx_l0_active_minus1
            if is_b:
                n_l1 = r.ue() + 1  # num_ref_idx_l1_active_minus1
        # ref_pic_list_modification: parsed and SKIPPED — by contract the
        # caller supplies the FINAL list heads (ref = RefPicList0[0],
        # ref1 = RefPicList1[0]); the container walk resolves the
        # modification against its DPB via slice_header_info
        _parse_list_mods(r)
        if is_b:
            _parse_list_mods(r)
    wp = None
    if (pps.get("weighted_pred") and is_p) or (
        is_b and pps.get("weighted_bipred_idc", 0) == 1
    ):
        wp = _parse_pred_weight_table(r, is_b, n_l0, n_l1)
    elif is_b and pps.get("weighted_bipred_idc", 0) == 2:
        # implicit mode carries NO pred_weight_table (§7.3.3): weights
        # derive from POC distances, resolved by decode_picture's pocs
        if n_l0 > 1 or n_l1 > 1:
            raise NotImplementedError(
                "implicit weighted bi-prediction with multi-reference "
                "lists not supported (weights would need per-MB POC "
                "distances of the chosen references)"
            )
        wp = "implicit"
    # dec_ref_pic_marking (§7.3.3.3): parsed and DISCARDED — reference
    # marking is a DPB operation owned by the container walk
    # (sources/mp4.decode_range), which re-reads it via slice_header_info;
    # pixel decode only needs the syntax consumed so the QP/deblock
    # fields that follow parse correctly
    if idr:
        r.u(1)  # no_output_of_prior_pics
        r.u(1)  # long_term_reference
    elif nal_ref_idc != 0:
        _parse_mmco_ops(r)
    if pps.get("cabac") and st_mod != 2:
        r.ue()  # cabac_init_idc (ignored: uniform init, kernels/cabac.py)
    qp = pps["init_qp"] + r.se()
    # deblocking control (§7.3.3): absent syntax means "filter with zero
    # offsets" (§8.7's inferred idc 0), NOT "skip" — the pre-round-11
    # refusal is replaced by the shared kernels/h264_deblock.py filter
    dbl = (0, 0, 0)
    if pps["deblocking_control_present"]:
        idc = r.ue()
        if idc != 1:
            dbl = (idc, r.se() * 2, r.se() * 2)
        else:
            dbl = (1, 0, 0)
    return first_mb, st_mod, qp, wp, dbl, n_l0, n_l1, direct_spatial


def _decode_slice_mbs(
    r: BitReader, st: _FrameState, sps: dict, pps: dict, st_mod: int,
    qp: int, refs, refs1, mb_start: int, wp: dict | None = None,
    n_l0: int = 1, n_l1: int = 1, direct_spatial: bool = True,
) -> int:
    """Decode one slice's macroblock run starting at ``mb_start``,
    marking each MB with the current slice id.  The run length is not
    coded — CAVLC slices end when the payload runs out
    (more_rbsp_data, §7.3.4) — so this returns the next undecoded MB
    address for the cross-slice coverage check."""
    mbw, mbh = sps["mb_width"], sps["mb_height"]
    n_mbs = mbw * mbh
    mb = mb_start
    er = CavlcReader(r)

    def mark(m: int) -> tuple[int, int]:
        mbx, mby = m % mbw, m // mbw
        st.slice_no[mby, mbx] = st.cur_slice
        return mbx, mby

    if st_mod == 2:  # I
        while r.more_rbsp_data():
            if mb >= n_mbs:
                raise ValueError("slice data continues past picture end")
            mbx, mby = mark(mb)
            qp = _decode_mb(er, st, mbx, mby, qp, pps)
            st.mb_qp[mby, mbx] = qp
            mb += 1
    elif st_mod == 0:  # P
        while mb < n_mbs and r.more_rbsp_data():
            skip_run = r.ue()
            for _ in range(skip_run):
                if mb >= n_mbs:
                    raise ValueError("mb_skip_run past end of slice")
                mbx, mby = mark(mb)
                _reconstruct_skip(st, refs[0], mbx, mby, wp)
                st.mb_qp[mby, mbx] = qp  # skip MBs keep the running QP
                mb += 1
            if mb >= n_mbs or not r.more_rbsp_data():
                break
            mbx, mby = mark(mb)
            qp = _decode_mb_p(er, st, refs, mbx, mby, qp, pps, wp,
                              n_ref=n_l0)
            st.mb_qp[mby, mbx] = qp
            mb += 1
    else:  # B
        while mb < n_mbs and r.more_rbsp_data():
            skip_run = r.ue()
            for _ in range(skip_run):
                if mb >= n_mbs:
                    raise ValueError("mb_skip_run past end of slice")
                mbx, mby = mark(mb)
                _reconstruct_b_skip(st, refs, refs1, mbx, mby, wp,
                                    direct_spatial)
                st.mb_qp[mby, mbx] = qp  # skip MBs keep the running QP
                mb += 1
            if mb >= n_mbs or not r.more_rbsp_data():
                break
            mbx, mby = mark(mb)
            qp = _decode_mb_b(er, st, refs, refs1,
                              mbx, mby, qp, pps, wp, n_l0, n_l1,
                              direct_spatial)
            st.mb_qp[mby, mbx] = qp
            mb += 1
    return mb


def _decode_slice_mbs_cabac(
    r: BitReader, st: _FrameState, sps: dict, pps: dict, st_mod: int,
    qp: int, refs, refs1, mb_start: int, wp: dict | None = None,
    n_l0: int = 1, n_l1: int = 1, direct_spatial: bool = True,
) -> int:
    """CABAC twin of :func:`_decode_slice_mbs`: per-MB mb_skip_flag
    instead of skip runs, end_of_slice_flag (a terminate bin) instead of
    more_rbsp_data.  The slice header's cabac_alignment_one_bit padding
    is consumed here."""
    from scanner_spark.kernels.h264_cabac import CabacReader

    r.byte_align()
    er = CabacReader(r)
    mbw, mbh = sps["mb_width"], sps["mb_height"]
    n_mbs = mbw * mbh
    mb = mb_start
    while True:
        if mb >= n_mbs:
            raise ValueError("slice data continues past picture end")
        mbx, mby = mb % mbw, mb // mbw
        st.slice_no[mby, mbx] = st.cur_slice
        er.begin_mb(st, mbx, mby)
        if st_mod == 2:  # I
            qp = _decode_mb(er, st, mbx, mby, qp, pps)
        elif st_mod == 0:  # P
            if er.read_skip(st, mbx, mby, False):
                _reconstruct_skip(st, refs[0], mbx, mby, wp)
            else:
                qp = _decode_mb_p(er, st, refs, mbx, mby, qp, pps, wp,
                                  n_ref=n_l0)
        else:  # B
            if er.read_skip(st, mbx, mby, True):
                _reconstruct_b_skip(st, refs, refs1, mbx, mby, wp,
                                    direct_spatial)
            else:
                qp = _decode_mb_b(er, st, refs, refs1,
                                  mbx, mby, qp, pps, wp, n_l0, n_l1,
                                  direct_spatial)
        st.mb_qp[mby, mbx] = qp
        er.end_mb(st, mbx, mby)
        mb += 1
        if er.end_of_slice():
            return mb


def decode_picture(
    slices: "list[tuple[bytes, bool, int]]", sps: dict, pps: dict,
    strict: bool = True, ref: "_FrameState | None" = None,
    return_state: bool = False, ref1: "_FrameState | None" = None,
    cabac_marked: bool = False,
    pocs: "tuple[int, int, int] | None" = None,
    cur_poc: "int | None" = None,
):
    """All VCL slices of one access unit, in decode order, -> (y, cb, cr)
    uint8 planes (SPS crop applied).  ``slices`` holds
    (rbsp, idr, nal_ref_idc) per slice NAL.

    Real encoders split frames into slices for thread parallelism; each
    slice covers a contiguous raster run of macroblocks and decodes
    independently — neighbours across the boundary are unavailable for
    intra prediction, MV prediction, and CAVLC contexts (the slice-aware
    checks in :class:`_FrameState`).  Slices must cover the picture
    contiguously in order (FMO/ASO — pps slice groups / arbitrary slice
    order — are refused at PPS parse / here).

    I slices decode standalone.  P slices additionally need ``ref``, the
    PADDED reconstruction state of the previous decoded reference frame
    (``return_state=True`` returns it alongside the planes so a GOP
    decode loop can chain).  B slices need both ``ref`` (RefPicList0[0],
    the nearest past reference) and ``ref1`` (RefPicList1[0], the nearest
    future reference — §8.2.4.2.3 list initialization at our
    one-ref-per-list scope).  ``idr``/``nal_ref_idc`` come from each NAL
    header and select the §7.3.3 header layout (idr_pic_id and the
    dec_ref_pic_marking form differ — ADVICE r05: non-IDR slices
    previously misparsed against the IDR layout)."""
    cabac = bool(pps.get("cabac"))
    if cabac and not cabac_marked:
        raise NotImplementedError(
            "CABAC stream without this repo's origin-marker SEI: the "
            "normative context-initialization tables are not available "
            "here, so foreign CABAC payloads would decode to garbage — "
            "refused instead (provenance note in kernels/cabac.py); "
            "streams from this encoder carry the marker and decode "
            "bit-exactly"
        )
    mbw, mbh = sps["mb_width"], sps["mb_height"]
    n_mbs = mbw * mbh
    st = _FrameState(mbw, mbh)
    st.slice_no[:] = -1  # nothing decoded yet
    # §8.5.9: the picture's 4x4 weightScale matrices — PPS lists override
    # the SPS's; None = flat 16 (the fast dequant path)
    _scal_tok = _SCALING4.set(
        pps.get("pic_scaling") or sps.get("scaling4")
    )
    scaling8 = pps.get("pic_scaling8") or sps.get("scaling8")
    if pps.get("transform_8x8") and scaling8 is not None and any(
        isinstance(m, str) for m in scaling8
    ):
        _SCALING4.reset(_scal_tok)
        raise NotImplementedError(
            "transform_8x8 stream whose 8x8 scaling list falls back to "
            "the normative DEFAULT table — the default tables are not "
            "available in this environment; streams must code their "
            "8x8 lists"
        )
    _scal8_tok = _SCALING8.set(
        scaling8 if pps.get("transform_8x8") else None
    )
    st.t8_mode = bool(pps.get("transform_8x8"))
    st.direct8_inf = bool(sps.get("direct_8x8_inference", True))
    # POC tag for §8.4.1.2.3 temporal direct (None = untagged: temporal
    # MBs refuse; the container walk always passes the derived full POC)
    st.poc = cur_poc if cur_poc is not None else (
        pocs[0] if pocs is not None else None
    )
    try:
        return _decode_picture_body(
            slices, sps, pps, strict, return_state, cabac, st, refs0_in=ref,
            ref1_in=ref1, cabac_marked=cabac_marked, pocs=pocs,
            mbw=mbw, mbh=mbh, n_mbs=n_mbs,
        )
    finally:
        _SCALING8.reset(_scal8_tok)
        _SCALING4.reset(_scal_tok)


def _decode_picture_body(slices, sps, pps, strict, return_state, cabac,
                         st, refs0_in, ref1_in, cabac_marked, pocs,
                         mbw, mbh, n_mbs):
    ref, ref1 = refs0_in, ref1_in
    # RefPicList0 may be a single state (the list head — the historical
    # contract) or the full ordered list for multi-ref P slices
    refs0 = list(ref) if isinstance(ref, (list, tuple)) else (
        [ref] if ref is not None else []
    )
    # RefPicList1 takes the same single-state-or-list contract
    refs1 = list(ref1) if isinstance(ref1, (list, tuple)) else (
        [ref1] if ref1 is not None else []
    )
    mb_next = 0
    slice_dbl: dict[int, tuple[int, int, int]] = {}
    for si, (rbsp, idr, nal_ref_idc) in enumerate(slices):
        st.cur_slice = si
        r = BitReader(rbsp)
        first_mb, st_mod, qp, wp, dbl, n_l0, n_l1, direct_spatial = _parse_slice_header(
            r, sps, pps, strict, idr, nal_ref_idc,
            refs0[0] if refs0 else None, refs1[0] if refs1 else None
        )
        slice_dbl[si] = dbl
        if wp == "implicit":
            # weighted_bipred_idc 2: weights derive from POC distances
            # (cur, RefPicList0[0], RefPicList1[0]) — the container walk
            # supplies full POCs
            if pocs is None:
                raise ValueError(
                    "implicit weighted bi-prediction needs pocs=(cur, "
                    "poc0, poc1)"
                )
            wp = _implicit_wp(*pocs)
        if st_mod in (0, 1) and n_l0 > len(refs0):
            raise ValueError(
                f"slice {si} needs {n_l0} list-0 references, caller "
                f"supplied {len(refs0)}"
            )
        if st_mod == 1 and n_l1 > len(refs1):
            raise ValueError(
                f"slice {si} needs {n_l1} list-1 references, caller "
                f"supplied {len(refs1)}"
            )
        if first_mb != mb_next:
            raise NotImplementedError(
                f"slice {si} starts at mb {first_mb}, expected {mb_next}: "
                "non-contiguous slice coverage (FMO/ASO) not supported"
            )
        loop = _decode_slice_mbs_cabac if cabac else _decode_slice_mbs
        mb_next = loop(
            r, st, sps, pps, st_mod, qp, refs0, refs1, mb_next, wp,
            n_l0, n_l1, direct_spatial,
        )
    if mb_next != n_mbs:
        raise ValueError(
            f"picture ended at mb {mb_next} of {n_mbs} — remaining "
            "slices missing from the access unit"
        )
    if any(d[0] != 1 for d in slice_dbl.values()):
        from scanner_spark.kernels.h264_deblock import deblock_picture

        deblock_picture(st, slice_dbl,
                        chroma_qp_offset=pps.get("chroma_qp_offset", 0))
    planes = _crop_planes(st, sps)
    return (planes, st) if return_state else planes


def decode_slice(
    rbsp: bytes, sps: dict, pps: dict, strict: bool = True,
    idr: bool = True, nal_ref_idc: int = 3, ref: "_FrameState | None" = None,
    return_state: bool = False, ref1: "_FrameState | None" = None,
    cabac_marked: bool = False,
):
    """Single-slice picture decode (see :func:`decode_picture`)."""
    return decode_picture(
        [(rbsp, idr, nal_ref_idc)], sps, pps, strict=strict, ref=ref,
        return_state=return_state, ref1=ref1, cabac_marked=cabac_marked,
    )


def _reconstruct_skip(st: _FrameState, ref: _FrameState, mbx: int, mby: int,
                      wp: dict | None = None) -> None:
    """P_Skip: motion-compensate with the §8.4.1.1 vector, no residual.
    Explicit weighted prediction applies to skip MBs like any inter MB."""
    ox, oy = mbx * 16, mby * 16
    mv = st.skip_mv(mbx, mby)
    py = mc_luma(ref.y, oy, ox, mv)
    cy, cx = oy // 2, ox // 2
    pcb = mc_chroma(ref.cb, cy, cx, mv)
    pcr = mc_chroma(ref.cr, cy, cx, mv)
    if wp is not None:
        l0 = wp["l0"][0]  # P_Skip predicts from refIdxL0 = 0
        py = _wp_single(py, l0[0], l0[1], wp["logwd_y"])
        pcb = _wp_single(pcb, l0[2], l0[3], wp["logwd_c"])
        pcr = _wp_single(pcr, l0[4], l0[5], wp["logwd_c"])
    st.y[oy : oy + 16, ox : ox + 16] = py
    st.cb[cy : cy + 8, cx : cx + 8] = pcb
    st.cr[cy : cy + 8, cx : cx + 8] = pcr
    by0, bx0 = oy // 4, ox // 4
    st.nzy[by0 : by0 + 4, bx0 : bx0 + 4] = 0
    st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2] = 0
    st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
    st.mb_inter[mby, mbx] = True
    st.record_motion(by0, bx0, 4, 4, 0, mv, 0)  # refIdxL0 = 0 (§8.4.1.1)


def _record_direct_regions(st: _FrameState, regions, mbx: int, mby: int,
                           done=None, qbox=None) -> None:
    """Record direct-mode region motion without predicting (the encoder
    defers recording until the direct candidate wins; the decoder
    records inside :func:`_pred_direct_regions`)."""
    for sy, sx, h4, w4, r0, r1, mv0, mv1 in regions:
        if qbox is not None:
            sy, sx, h4, w4 = _clip_region(sy, sx, h4, w4, qbox)
            if h4 == 0:
                continue
        for lst, mv, ridx in ((0, mv0, r0), (1, mv1, r1)):
            if mv is not None:
                st.record_motion(mby * 4 + sy, mbx * 4 + sx, h4, w4,
                                 lst, mv, ridx)
        if done is not None:
            done[sy : sy + h4, sx : sx + w4] = True
    st.mb_inter[mby, mbx] = True


def _clip_region(sy, sx, h4, w4, qbox):
    """Intersect one MB-local region with a sub-MB box; h4 == 0 signals
    an empty intersection."""
    qy, qx, qh, qw = qbox
    ny0, nx0 = max(sy, qy), max(sx, qx)
    ny1, nx1 = min(sy + h4, qy + qh), min(sx + w4, qx + qw)
    if ny0 >= ny1 or nx0 >= nx1:
        return 0, 0, 0, 0
    return ny0, nx0, ny1 - ny0, nx1 - nx0


def _pred_direct_regions(st: _FrameState, refs0, refs1, regions,
                         mbx: int, mby: int, wp: dict | None,
                         p16: np.ndarray, pcb: np.ndarray,
                         pcr: np.ndarray, done=None, qbox=None,
                         record: bool = True) -> None:
    """Predict + record the direct-mode ``regions`` of one MB (from
    :meth:`_FrameState.direct_motion`) into caller-supplied prediction
    planes (p16 16x16 luma, pcb/pcr 8x8 chroma, MB-local).  ``qbox`` =
    (qy, qx, h4, w4) restricts to one sub-MB (B_Direct_8x8); ``done``
    is the partition-derivation mask to mark (same-MB later partitions
    may reference the direct blocks' motion)."""
    for sy, sx, h4, w4, r0, r1, mv0, mv1 in regions:
        if qbox is not None:
            sy, sx, h4, w4 = _clip_region(sy, sx, h4, w4, qbox)
            if h4 == 0:
                continue
        use0, use1 = mv0 is not None, mv1 is not None
        if use0 and r0 >= len(refs0):
            raise ValueError(f"derived refIdxL0 {r0} beyond RefPicList0")
        if use1 and r1 >= len(refs1):
            raise ValueError(f"derived refIdxL1 {r1} beyond RefPicList1")
        rpair = (r0 if use0 else 0, r1 if use1 else 0)
        ref0, ref1 = refs0[rpair[0]], refs1[rpair[1]]
        mvs = [mv0, mv1]
        gy, gx = mby * 16 + sy * 4, mbx * 16 + sx * 4
        hh, ww = h4 * 4, w4 * 4
        p16[sy * 4 : sy * 4 + hh, sx * 4 : sx * 4 + ww] = _bipred(
            ref0.y, ref1.y, gy, gx, mvs, mc_luma, wp, "y", rpair,
            bh=hh, bw=ww)
        cyy, cxx = gy // 2, gx // 2
        pcb[sy * 2 : sy * 2 + h4 * 2, sx * 2 : sx * 2 + w4 * 2] = _bipred(
            ref0.cb, ref1.cb, cyy, cxx, mvs, mc_chroma, wp, "cb", rpair,
            bh=h4 * 2, bw=w4 * 2)
        pcr[sy * 2 : sy * 2 + h4 * 2, sx * 2 : sx * 2 + w4 * 2] = _bipred(
            ref0.cr, ref1.cr, cyy, cxx, mvs, mc_chroma, wp, "cr", rpair,
            bh=h4 * 2, bw=w4 * 2)
        if record:
            for lst, use, mv, ridx in ((0, use0, mv0, rpair[0]),
                                       (1, use1, mv1, rpair[1])):
                if use:
                    st.record_motion(mby * 4 + sy, mbx * 4 + sx, h4, w4,
                                     lst, mv, ridx)
            if done is not None:
                done[sy : sy + h4, sx : sx + w4] = True
    if record:
        st.mb_inter[mby, mbx] = True


def _reconstruct_b_skip(st: _FrameState, refs0, refs1, mbx: int, mby: int,
                        wp: dict | None = None,
                        direct_spatial: bool = True) -> None:
    """B_Skip: the §8.4.1.2.2 spatial (or §8.4.1.2.3 temporal) direct
    derivation with no residual (mb_type inferred, nothing else coded).
    Identical motion to a B_Direct_16x16 whose cbp is zero."""
    regions = st.direct_motion(mbx, mby, refs0, refs1, direct_spatial)
    ox, oy = mbx * 16, mby * 16
    cy, cx = oy // 2, ox // 2
    p16 = np.zeros((16, 16), dtype=np.int64)
    pcb = np.zeros((8, 8), dtype=np.int64)
    pcr = np.zeros((8, 8), dtype=np.int64)
    _pred_direct_regions(st, refs0, refs1, regions, mbx, mby, wp,
                         p16, pcb, pcr)
    st.y[oy : oy + 16, ox : ox + 16] = np.clip(p16, 0, 255)
    st.cb[cy : cy + 8, cx : cx + 8] = np.clip(pcb, 0, 255)
    st.cr[cy : cy + 8, cx : cx + 8] = np.clip(pcr, 0, 255)
    by0, bx0 = oy // 4, ox // 4
    st.nzy[by0 : by0 + 4, bx0 : bx0 + 4] = 0
    st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2] = 0
    st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2


def _read_luma8(er, st: _FrameState, gy: int, gx: int) -> list:
    """One coded luma 8x8 block's 64 coefficients (8x8 zig-zag order) at
    pixel origin (gy, gx).  CAVLC codes it as FOUR INTERLEAVED 4x4 blocks
    (§7.3.5.3.2: sub-block i4 holds coefficients 4*k + i4 of the 8x8
    scan; each sub-block's TotalCoeff feeds nC as usual); CABAC codes one
    ctxBlockCat-5 block (nzy records coded/not per covered 4x4 — the
    value later cbf contexts and deblocking read)."""
    if er.cabac:
        zz8 = er.res_luma8(st, gy // 4, gx // 4)
        st.nzy[gy // 4 : gy // 4 + 2, gx // 4 : gx // 4 + 2] = (
            1 if any(zz8) else 0
        )
        return zz8
    zz8 = [0] * 64
    for i4, (x, yb) in enumerate(_CBLK_POS):
        by, bx = (gy + yb) // 4, (gx + x) // 4
        c4 = er.res_luma(st, by, bx, False)
        st.nzy[by, bx] = sum(1 for c in c4 if c)
        for k in range(16):
            zz8[4 * k + i4] = c4[k]
    return zz8


def _write_luma8(ew, st: _FrameState, gy: int, gx: int, zz8: list) -> None:
    """Mirror of :func:`_read_luma8` (same interleave, same nzy
    bookkeeping)."""
    if ew.cabac:
        ew.res_luma8(st, gy // 4, gx // 4, zz8)
        st.nzy[gy // 4 : gy // 4 + 2, gx // 4 : gx // 4 + 2] = (
            1 if any(zz8) else 0
        )
        return
    for i4, (x, yb) in enumerate(_CBLK_POS):
        by, bx = (gy + yb) // 4, (gx + x) // 4
        sub = [zz8[4 * k + i4] for k in range(16)]
        tc = ew.res_luma(st, by, bx, False, sub)
        st.nzy[by, bx] = tc


def _decode_inter_luma8(er, st: _FrameState, mbx: int, mby: int,
                        cbp_l: int, qp: int, p16: np.ndarray) -> None:
    """Inter luma reconstruction under transform_size_8x8_flag: per coded
    8x8 block, residual -> §8.5.13 dequant (Inter Y list) -> idct8."""
    ox, oy = mbx * 16, mby * 16
    for i8, (x8, y8) in enumerate(_B8_POS):
        gy, gx = oy + y8, ox + x8
        if cbp_l & (1 << i8):
            zz8 = _read_luma8(er, st, gy, gx)
            d = dequant8(_zz_to_mat8(zz8), qp, sl8=1)  # Inter Y 8x8
            rec = p16[y8 : y8 + 8, x8 : x8 + 8] + idct8(d)
        else:
            st.nzy[gy // 4 : gy // 4 + 2, gx // 4 : gx // 4 + 2] = 0
            rec = p16[y8 : y8 + 8, x8 : x8 + 8]
        st.y[gy : gy + 8, gx : gx + 8] = np.clip(rec, 0, 255)


def _blk8_avail(st: _FrameState, mbx: int, mby: int, i8: int,
                up_mb: bool, left_mb: bool, ul_mb: bool):
    """(upright, up, left, ul) availability for an 8x8 luma block
    (Intra_8x8's §8.3.2.2 sample gathering): interior blocks see same-MB
    neighbours already reconstructed; edge blocks inherit the MB flags;
    block 1's up-right lives in the above-RIGHT MB, block 3's is
    undecoded."""
    if i8 == 0:
        return up_mb, up_mb, left_mb, ul_mb
    if i8 == 1:
        return st.mb_same_slice(mbx + 1, mby - 1), up_mb, True, up_mb
    if i8 == 2:
        return True, True, left_mb, left_mb
    return False, True, True, True


# --- sub-macroblock partition geometry (round 14) --------------------------
# MB-local 4x4-block rectangles (sy, sx, h4, w4) in partition decode order.

# Table 7-13/7-14 two-partition shapes
_PART2_GEOM = {
    "16x8": ((0, 0, 2, 4), (2, 0, 2, 4)),
    "8x16": ((0, 0, 4, 2), (0, 2, 4, 2)),
}

# Table 7-14 B mb_types 4..21 -> (pred(part0), pred(part1)); even types
# are 16x8, odd 8x16
_B_PART_PRED = {
    4: ("L0", "L0"), 5: ("L0", "L0"), 6: ("L1", "L1"), 7: ("L1", "L1"),
    8: ("L0", "L1"), 9: ("L0", "L1"), 10: ("L1", "L0"), 11: ("L1", "L0"),
    12: ("L0", "Bi"), 13: ("L0", "Bi"), 14: ("L1", "Bi"), 15: ("L1", "Bi"),
    16: ("Bi", "L0"), 17: ("Bi", "L0"), 18: ("Bi", "L1"), 19: ("Bi", "L1"),
    20: ("Bi", "Bi"), 21: ("Bi", "Bi"),
}

# sub-partition rectangles within one 8x8, by geometry class (8x8 /
# 8x4 / 4x8 / 4x4), §7.3.5.2 decode order
_SUB_GEOM = {
    0: ((0, 0, 2, 2),),
    1: ((0, 0, 1, 2), (1, 0, 1, 2)),
    2: ((0, 0, 2, 1), (0, 1, 2, 1)),
    3: ((0, 0, 1, 1), (0, 1, 1, 1), (1, 0, 1, 1), (1, 1, 1, 1)),
}

# Table 7-17: P sub_mb_type -> geometry class (pred is always L0)
_P_SUB_GEOMCLASS = {0: 0, 1: 1, 2: 2, 3: 3}

# Table 7-18: B sub_mb_type -> (pred, geometry class)
_B_SUB = {
    0: ("Direct", 0), 1: ("L0", 0), 2: ("L1", 0), 3: ("Bi", 0),
    4: ("L0", 1), 5: ("L0", 2), 6: ("L1", 1), 7: ("L1", 2),
    8: ("Bi", 1), 9: ("Bi", 2), 10: ("L0", 3), 11: ("L1", 3),
    12: ("Bi", 3),
}


def _pred_part(refs0, refs1, rpair, mvs, gy, gx, hh, ww, wp):
    """Luma + chroma prediction for one inter partition at pixel origin
    (gy, gx), size hh x ww: single-list MC or bi-prediction with
    weighting via :func:`_bipred`.  For P partitions pass refs1 = refs0
    (list 1 unused).  Returns (py, pcb, pcr) blocks."""
    r0 = refs0[rpair[0]]
    r1 = refs1[rpair[1]]
    py = _bipred(r0.y, r1.y, gy, gx, mvs, mc_luma, wp, "y", rpair,
                 bh=hh, bw=ww)
    pcb = _bipred(r0.cb, r1.cb, gy // 2, gx // 2, mvs, mc_chroma, wp,
                  "cb", rpair, bh=hh // 2, bw=ww // 2)
    pcr = _bipred(r0.cr, r1.cr, gy // 2, gx // 2, mvs, mc_chroma, wp,
                  "cr", rpair, bh=hh // 2, bw=ww // 2)
    return py, pcb, pcr


def _decode_inter_tail(er, st: _FrameState, mbx: int, mby: int, qp: int,
                       pps: dict, p16, pcb, pcr,
                       allow_t8: bool = True) -> int:
    """Shared inter-MB residual tail (§7.3.5 after the prediction
    syntax): cbp, transform_size_8x8_flag (present only with luma
    residual and NoSubMbPartSizeLessThan8x8, ``allow_t8``), mb_qp_delta,
    luma 4x4/8x8 residuals against ``p16``, chroma against
    ``pcb``/``pcr``."""
    ox, oy = mbx * 16, mby * 16
    cbp = er.cbp(st, mbx, mby, False)
    cbp_l, cbp_c = cbp & 15, cbp >> 4
    t8 = False
    if st.t8_mode and cbp_l and allow_t8:
        t8 = er.t8_flag(st, mbx, mby)
    st.mb_t8[mby, mbx] = t8
    if cbp:
        qp += er.qp_delta(st, mbx, mby)
    if t8:
        _decode_inter_luma8(er, st, mbx, mby, cbp_l, qp, p16)
    else:
        for blk in range(16):
            x, yb = _BLK4_POS[blk]
            gy, gx = oy + yb, ox + x
            by, bx = gy // 4, gx // 4
            if cbp_l & (1 << (blk // 4)):
                coeffs = er.res_luma(st, by, bx, False)
                st.nzy[by, bx] = sum(1 for c in coeffs if c)
                d = dequant4(_zz_to_mat(coeffs), qp, sl=3)  # Inter Y
                rec = p16[yb : yb + 4, x : x + 4] + idct4(d)
            else:
                st.nzy[by, bx] = 0
                rec = p16[yb : yb + 4, x : x + 4]
            st.y[gy : gy + 4, gx : gx + 4] = np.clip(rec, 0, 255)
    _decode_chroma(er, st, ox, oy, 0, cbp_c, qp, pps,
                   pred_fn=lambda comp: (pcb, pcr)[comp])
    st.modes4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4] = 2
    return qp


def _decode_mb_inter_part(er, st: _FrameState, refs0, refs1,
                          mbx: int, mby: int, qp: int, pps: dict,
                          wp: dict | None, n_l0: int, n_l1: int,
                          mb_type: int, sl: str,
                          direct_spatial: bool = True) -> int:
    """One PARTITIONED inter macroblock: P mb_types 1-4 (Table 7-13:
    P_L0_L0_16x8 / _8x16, P_8x8, P_8x8ref0) and B mb_types 4-22 (Table
    7-14: the 16x8/8x16 list combinations and B_8x8).  Syntax per
    §7.3.5.1 mb_pred / §7.3.5.2 sub_mb_pred (sub_mb_types, then every
    ref_idx_l0, ref_idx_l1, then every mvd_l0, mvd_l1); MV derivation
    per partition in decode order so later partitions' §8.4.1.3
    predictors see earlier partitions' FINAL vectors (the ``done``
    mask).  B_Direct_8x8 sub-MBs take their quadrant of the MB-level
    §8.4.1.2 derivation.  Reference: the reference engine decodes these
    streams via ffmpeg (scanner/video/decoder_automata.cpp,
    software/software_video_decoder.cpp)."""
    ox, oy = mbx * 16, mby * 16
    by0, bx0 = oy // 4, ox // 4
    if sl == "P":
        refs1 = refs0  # list 1 never used; keeps _pred_part uniform
    # ---- partition structure -------------------------------------------
    # parts: [sy, sx, h4, w4, pred, shape, group] — ``group`` indexes the
    # ref_idx unit (the partition itself for two-part types, the 8x8
    # sub-MB for P_8x8/B_8x8)
    parts = []
    n_groups = 2
    group_pred = []
    allow_t8 = True
    ref0_forced = sl == "P" and mb_type == 4  # P_8x8ref0
    if sl == "P" and mb_type in (1, 2):
        shape = "16x8" if mb_type == 1 else "8x16"
        group_pred = ["L0", "L0"]
        for i, (sy, sx, h4, w4) in enumerate(_PART2_GEOM[shape]):
            parts.append((sy, sx, h4, w4, "L0", (shape, i), i))
    elif sl == "B" and 4 <= mb_type <= 21:
        shape = "16x8" if mb_type % 2 == 0 else "8x16"
        group_pred = list(_B_PART_PRED[mb_type])
        for i, (sy, sx, h4, w4) in enumerate(_PART2_GEOM[shape]):
            parts.append((sy, sx, h4, w4, group_pred[i], (shape, i), i))
    else:  # P_8x8 (3) / P_8x8ref0 (4) / B_8x8 (22)
        n_groups = 4
        for q in range(4):
            t = er.sub_mb_type(st, mbx, mby, sl)
            if sl == "P":
                if not 0 <= t <= 3:
                    raise ValueError(f"P sub_mb_type {t} invalid")
                pred, g = "L0", _P_SUB_GEOMCLASS[t]
                if t != 0:
                    allow_t8 = False
            else:
                if not 0 <= t <= 12:
                    raise ValueError(f"B sub_mb_type {t} invalid")
                pred, g = _B_SUB[t]
                if g != 0 or (pred == "Direct" and not st.direct8_inf):
                    allow_t8 = False
            group_pred.append(pred)
            qy, qx = (q >> 1) * 2, (q & 1) * 2
            for sy, sx, h4, w4 in _SUB_GEOM[g]:
                parts.append((qy + sy, qx + sx, h4, w4, pred, None, q))
    # ---- reference indices (§7.3.5.1/.2 order: all l0, then all l1) ----
    ridx = [[0] * n_groups, [0] * n_groups]
    for lst, n_act in ((0, n_l0), (1, n_l1)):
        for g in range(n_groups):
            pred = group_pred[g]
            uses = (pred in ("L0", "Bi") if lst == 0
                    else pred in ("L1", "Bi"))
            if uses and n_act > 1 and not ref0_forced:
                ridx[lst][g] = er.ref_idx(st, mbx, mby, n_act, lst=lst)
    # ---- motion vector differences (all l0, then all l1) ---------------
    mvds = [[None] * len(parts), [None] * len(parts)]
    for lst in (0, 1):
        for i, (_, _, _, _, pred, _, _) in enumerate(parts):
            uses = (pred in ("L0", "Bi") if lst == 0
                    else pred in ("L1", "Bi"))
            if uses:
                mvds[lst][i] = np.array(
                    er.mvd_pair(st, mbx, mby, lst), dtype=np.int64)
    # ---- derivation + prediction in partition decode order -------------
    done = np.zeros((4, 4), dtype=bool)
    p16 = np.zeros((16, 16), dtype=np.int64)
    pcb = np.zeros((8, 8), dtype=np.int64)
    pcr = np.zeros((8, 8), dtype=np.int64)
    d_regions = None
    for i, (sy, sx, h4, w4, pred, shape, g) in enumerate(parts):
        if pred == "Direct":
            if d_regions is None:
                d_regions = st.direct_motion(mbx, mby, refs0, refs1,
                                             direct_spatial)
            _pred_direct_regions(st, refs0, refs1, d_regions, mbx, mby,
                                 wp, p16, pcb, pcr, done=done,
                                 qbox=(sy, sx, h4, w4))
            continue
        use0 = pred in ("L0", "Bi")
        use1 = pred in ("L1", "Bi")
        r0, r1 = ridx[0][g], ridx[1][g]
        if use0 and r0 >= len(refs0):
            raise ValueError(f"ref_idx_l0 {r0} beyond RefPicList0")
        if use1 and r1 >= len(refs1):
            raise ValueError(f"ref_idx_l1 {r1} beyond RefPicList1")
        mvs = [None, None]
        for lst, use, r in ((0, use0, r0), (1, use1, r1)):
            if use:
                mvp = st.mv_pred_blk(by0 + sy, bx0 + sx, h4, w4, lst,
                                     r, done, shape)
                mvs[lst] = mvp + mvds[lst][i]
        rpair = (r0 if use0 else 0, r1 if use1 else 0)
        gy, gx = oy + sy * 4, ox + sx * 4
        hh, ww = h4 * 4, w4 * 4
        py, pb, pr = _pred_part(refs0, refs1, rpair, mvs, gy, gx, hh, ww,
                                wp)
        p16[sy * 4 : sy * 4 + hh, sx * 4 : sx * 4 + ww] = py
        pcb[sy * 2 : sy * 2 + h4 * 2, sx * 2 : sx * 2 + w4 * 2] = pb
        pcr[sy * 2 : sy * 2 + h4 * 2, sx * 2 : sx * 2 + w4 * 2] = pr
        for lst, use, r in ((0, use0, r0), (1, use1, r1)):
            if use:
                st.record_motion(by0 + sy, bx0 + sx, h4, w4, lst,
                                 mvs[lst], r)
        done[sy : sy + h4, sx : sx + w4] = True
    st.mb_inter[mby, mbx] = True
    return _decode_inter_tail(er, st, mbx, mby, qp, pps, p16, pcb, pcr,
                              allow_t8)


def _decode_mb_p(er, st: _FrameState, refs: "list[_FrameState]",
                 mbx: int, mby: int, qp: int, pps: dict,
                 wp: dict | None = None, n_ref: int = 1) -> int:
    """One coded P-slice macroblock: P_L0_16x16 (type 0), a partitioned
    type (1-4, round 14 — see :func:`_decode_mb_inter_part`), or an
    intra type (offset 5, Table 7-13).  ``refs`` is the final ordered
    RefPicList0 (§8.2.4); with ``n_ref > 1`` each partition codes
    ref_idx_l0 as te(v) and the §8.4.1.3.1 same-refIdx MV-predictor
    rule applies.  ``wp`` applies explicit weighted prediction
    (§8.4.2.3.2) to the compensated samples."""
    mb_type = er.mb_type(st, mbx, mby, "P")
    if mb_type >= 5:
        return _decode_mb_intra(er, st, mbx, mby, qp, pps, mb_type - 5)
    if mb_type in (1, 2, 3, 4):
        # 16x8 / 8x16 / P_8x8 / P_8x8ref0 partitioning (Table 7-13)
        return _decode_mb_inter_part(er, st, refs, None, mbx, mby, qp,
                                     pps, wp, n_ref, 1, mb_type, "P")
    if mb_type != 0:
        raise ValueError(f"P mb_type {mb_type} invalid (Table 7-13)")
    ox, oy = mbx * 16, mby * 16
    by0, bx0 = oy // 4, ox // 4
    ridx = er.ref_idx(st, mbx, mby, n_ref) if n_ref > 1 else 0
    if ridx >= len(refs):
        raise ValueError(f"ref_idx_l0 {ridx} beyond RefPicList0")
    ref = refs[ridx]
    mvd = np.array(er.mvd_pair(st, mbx, mby, 0), dtype=np.int64)
    mv = st.mv_pred(mbx, mby, ref_idx=ridx) + mvd
    p16 = mc_luma(ref.y, oy, ox, mv)
    cy, cx = oy // 2, ox // 2
    pcb = mc_chroma(ref.cb, cy, cx, mv)
    pcr = mc_chroma(ref.cr, cy, cx, mv)
    if wp is not None:
        w0 = wp["l0"][ridx]  # per-ref_idx explicit weights (§8.4.2.3.2)
        p16 = _wp_single(p16, w0[0], w0[1], wp["logwd_y"])
        pcb = _wp_single(pcb, w0[2], w0[3], wp["logwd_c"])
        pcr = _wp_single(pcr, w0[4], w0[5], wp["logwd_c"])
    st.mb_inter[mby, mbx] = True
    st.record_motion(by0, bx0, 4, 4, 0, mv, ridx)
    # a 16x16 partition always qualifies for transform_size_8x8
    return _decode_inter_tail(er, st, mbx, mby, qp, pps, p16, pcb, pcr)


def _decode_mb_b(er, st: _FrameState, refs0, refs1,
                 mbx: int, mby: int, qp: int,
                 pps: dict, wp: dict | None = None,
                 n_l0: int = 1, n_l1: int = 1,
                 direct_spatial: bool = True) -> int:
    """One coded B-slice macroblock (Table 7-14): B_Direct_16x16 (0,
    spatial derivation §8.4.1.2.2 — no motion syntax), B_L0_16x16 (1),
    B_L1_16x16 (2), B_Bi_16x16 (3) — default bi-prediction
    (p0 + p1 + 1) >> 1 or the explicit weighted forms when ``wp`` is
    set — or an intra type (offset 23).  ``refs0``/``refs1`` are the
    final ordered RefPicList0/1 (§8.2.4); with multiple active refs the
    MB codes te(v) ref_idx_lX per used list, and weighted prediction /
    the §8.4.1.3.1 MV predictor follow the chosen index.  Partitioned
    types 4..22 (round 14) dispatch to
    :func:`_decode_mb_inter_part`."""
    mb_type = er.mb_type(st, mbx, mby, "B")
    if mb_type >= 23:
        return _decode_mb_intra(er, st, mbx, mby, qp, pps, mb_type - 23)
    if 4 <= mb_type <= 22:
        # 16x8 / 8x16 list combinations and B_8x8 (Table 7-14)
        return _decode_mb_inter_part(er, st, refs0, refs1, mbx, mby, qp,
                                     pps, wp, n_l0, n_l1, mb_type, "B",
                                     direct_spatial)
    if mb_type not in (0, 1, 2, 3):
        raise ValueError(f"B mb_type {mb_type} invalid (Table 7-14)")
    ox, oy = mbx * 16, mby * 16
    by0, bx0 = oy // 4, ox // 4
    cy, cx = oy // 2, ox // 2
    if mb_type == 0:
        regions = st.direct_motion(mbx, mby, refs0, refs1,
                                   direct_spatial)
        p16 = np.zeros((16, 16), dtype=np.int64)
        pcb = np.zeros((8, 8), dtype=np.int64)
        pcr = np.zeros((8, 8), dtype=np.int64)
        _pred_direct_regions(st, refs0, refs1, regions, mbx, mby, wp,
                             p16, pcb, pcr)
    else:
        use0 = mb_type in (1, 3)
        use1 = mb_type in (2, 3)
        # §7.3.5.1 order: ref_idx_l0, ref_idx_l1, mvd_l0, mvd_l1
        ridx0 = (er.ref_idx(st, mbx, mby, n_l0, lst=0)
                 if (use0 and n_l0 > 1) else 0)
        ridx1 = (er.ref_idx(st, mbx, mby, n_l1, lst=1)
                 if (use1 and n_l1 > 1) else 0)
        if use0 and ridx0 >= len(refs0):
            raise ValueError(f"ref_idx_l0 {ridx0} beyond RefPicList0")
        if use1 and ridx1 >= len(refs1):
            raise ValueError(f"ref_idx_l1 {ridx1} beyond RefPicList1")
        ref0 = refs0[ridx0 if use0 else 0]
        ref1 = refs1[ridx1 if use1 else 0]
        mvs = [None, None]
        if use0:
            mvd0 = np.array(er.mvd_pair(st, mbx, mby, 0), dtype=np.int64)
            mvs[0] = st.mv_pred(mbx, mby, 0, ref_idx=ridx0) + mvd0
        if use1:
            mvd1 = np.array(er.mvd_pair(st, mbx, mby, 1), dtype=np.int64)
            mvs[1] = st.mv_pred(mbx, mby, 1, ref_idx=ridx1) + mvd1
        rpair = (ridx0, ridx1)
        p16 = _bipred(ref0.y, ref1.y, oy, ox, mvs, mc_luma, wp, "y",
                      rpair)
        pcb = _bipred(ref0.cb, ref1.cb, cy, cx, mvs, mc_chroma, wp,
                      "cb", rpair)
        pcr = _bipred(ref0.cr, ref1.cr, cy, cx, mvs, mc_chroma, wp,
                      "cr", rpair)
        for lst, ridx in ((0, ridx0), (1, ridx1)):
            if mvs[lst] is not None:
                st.record_motion(by0, bx0, 4, 4, lst, mvs[lst], ridx)
        st.mb_inter[mby, mbx] = True
    # §7.3.5: B_Direct_16x16 carries the transform_size_8x8_flag only
    # when the SPS set direct_8x8_inference_flag
    return _decode_inter_tail(er, st, mbx, mby, qp, pps, p16, pcb, pcr,
                              allow_t8=mb_type != 0 or st.direct8_inf)


def _wp_single(p: np.ndarray, w: int, o: int, logwd: int) -> np.ndarray:
    """Explicit single-list weighted sample prediction (§8.4.2.3.2):
    Clip1(((p*w + 2^(logWD-1)) >> logWD) + o), degenerate shift at 0."""
    if logwd >= 1:
        return np.clip(((p * w + (1 << (logwd - 1))) >> logwd) + o, 0, 255)
    return np.clip(p * w + o, 0, 255)


def _wp_bi(p0, p1, w0: int, o0: int, w1: int, o1: int, logwd: int):
    """Explicit bi-predictive weighted combine (§8.4.2.3.2):
    Clip1(((p0*w0 + p1*w1 + 2^logWD) >> (logWD+1)) + (o0+o1+1)>>1)."""
    return np.clip(
        ((p0 * w0 + p1 * w1 + (1 << logwd)) >> (logwd + 1))
        + ((o0 + o1 + 1) >> 1),
        0, 255,
    )


def implicit_bipred_weights(poc_cur: int, poc0: int, poc1: int
                            ) -> tuple[int, int]:
    """Implicit-mode bi-prediction weights (w0, w1), logWD = 5, zero
    offsets (§8.4.2.3.1, weighted_bipred_idc == 2): the POC-distance
    scale DistScaleFactor = (tb * tx + 32) >> 6 with the same tb/td/tx
    derivation temporal direct mode uses; equal ref POCs or an
    out-of-range scale fall back to the 32/32 average."""
    if poc1 == poc0:
        return 32, 32
    tb = min(max(poc_cur - poc0, -128), 127)
    td = min(max(poc1 - poc0, -128), 127)
    # C-style truncating division: tx = (16384 + Abs(td / 2)) / td
    tx = (16384 + (abs(td) >> 1)) // abs(td)
    if td < 0:
        tx = -tx
    dsf = min(max((tb * tx + 32) >> 6, -1024), 1023)
    w1 = dsf >> 2
    if w1 < -64 or w1 > 128:
        return 32, 32
    return 64 - w1, w1


def _implicit_wp(poc_cur: int, poc0: int, poc1: int) -> dict:
    """wp dict for implicit mode: weights apply ONLY to bi-predicted
    partitions — single-list B partitions use default prediction
    (§8.4.2.3.1), which _bipred honours via the ``implicit`` flag."""
    w0, w1 = implicit_bipred_weights(poc_cur, poc0, poc1)
    return {"implicit": True, "logwd_y": 5, "logwd_c": 5,
            "l0": [(w0, 0, w0, 0, w0, 0)], "l1": [(w1, 0, w1, 0, w1, 0)]}


# column layout of a per-list weight tuple: (w_y, o_y, w_cb, o_cb, w_cr, o_cr)
_WP_COMP = {"y": (0, 1, "logwd_y"), "cb": (2, 3, "logwd_c"),
            "cr": (4, 5, "logwd_c")}


def _parse_pred_weight_table(r: BitReader, is_b: bool,
                             n_l0: int = 1, n_l1: int = 1) -> dict:
    """§7.3.3.2 pred_weight_table: log2 denominators, then flagged
    (weight, offset) pairs for luma and chroma of EACH active reference
    of RefPicList0 (and RefPicList1 for B slices).  ``l0``/``l1`` in the
    result are per-ref_idx lists of (wy, oy, wcb, ocb, wcr, ocr)."""
    logwd_y = r.ue()
    logwd_c = r.ue()  # chroma_format_idc != 0 (always 4:2:0 here)
    if logwd_y > 7 or logwd_c > 7:
        raise ValueError("pred_weight_table log2 denominator out of range")

    def one_ref():
        wy, oy = 1 << logwd_y, 0
        wcb = wcr = 1 << logwd_c
        ocb = ocr = 0
        if r.u(1):  # luma_weight_flag
            wy, oy = r.se(), r.se()
        if r.u(1):  # chroma_weight_flag
            wcb, ocb = r.se(), r.se()
            wcr, ocr = r.se(), r.se()
        return (wy, oy, wcb, ocb, wcr, ocr)

    l0 = [one_ref() for _ in range(max(n_l0, 1))]
    l1 = [one_ref() for _ in range(max(n_l1, 1))] if is_b else None
    return {"logwd_y": logwd_y, "logwd_c": logwd_c, "l0": l0, "l1": l1}


def _write_pred_weight_table(w: BitWriter, wp: dict) -> None:
    """Mirror of :func:`_parse_pred_weight_table` for the encoder —
    ``l0``/``l1`` are per-ref_idx lists."""
    w.ue(wp["logwd_y"])
    w.ue(wp["logwd_c"])
    for lst in ("l0", "l1"):
        refs = wp.get(lst)
        if refs is None:
            continue
        for t in refs:
            _write_one_weight_ref(w, wp, t)


def _write_one_weight_ref(w: BitWriter, wp: dict, t: tuple) -> None:
    wy, oy, wcb, ocb, wcr, ocr = t
    if wy == (1 << wp["logwd_y"]) and oy == 0:
        w.u(0, 1)
    else:
        w.u(1, 1)
        w.se(wy)
        w.se(oy)
    dc = 1 << wp["logwd_c"]
    if (wcb, ocb, wcr, ocr) == (dc, 0, dc, 0):
        w.u(0, 1)
    else:
        w.u(1, 1)
        w.se(wcb)
        w.se(ocb)
        w.se(wcr)
        w.se(ocr)


def _bipred(plane0: np.ndarray, plane1: np.ndarray, oy: int, ox: int,
            mvs, mc_fn, wp: dict | None = None,
            comp: str = "y", ridx: tuple = (0, 0),
            bh: int | None = None, bw: int | None = None) -> np.ndarray:
    """List prediction for one B partition: single-list MC or the B_Bi
    combine — default (p0+p1+1)>>1 (§8.4.2.3.1) when ``wp`` is None,
    else the explicit weighted forms (§8.4.2.3.2) using ``comp``'s
    column of the weight tuples for the partition's (refIdxL0,
    refIdxL1) = ``ridx``.  ``bh``/``bw`` select the partition size
    (default: the mc function's own — 16x16 luma / 8x8 chroma)."""
    kw = {} if bh is None else {"bh": bh, "bw": bw}
    p0 = (mc_fn(plane0, oy, ox, mvs[0], **kw)
          if mvs[0] is not None else None)
    p1 = (mc_fn(plane1, oy, ox, mvs[1], **kw)
          if mvs[1] is not None else None)
    if wp is None:
        if p0 is None:
            return p1
        if p1 is None:
            return p0
        return (p0 + p1 + 1) >> 1
    if wp.get("implicit") and (p0 is None or p1 is None):
        return p1 if p0 is None else p0  # implicit mode weights bi only
    wi, oi, ld = _WP_COMP[comp]
    logwd = wp[ld]
    if p0 is None:
        t1 = wp["l1"][ridx[1]]
        return _wp_single(p1, t1[wi], t1[oi], logwd)
    if p1 is None:
        t0 = wp["l0"][ridx[0]]
        return _wp_single(p0, t0[wi], t0[oi], logwd)
    t0, t1 = wp["l0"][ridx[0]], wp["l1"][ridx[1]]
    return _wp_bi(p0, p1, t0[wi], t0[oi], t1[wi], t1[oi], logwd)


def _decode_mb(er, st: _FrameState, mbx: int, mby: int, qp: int,
               pps: dict) -> int:
    return _decode_mb_intra(er, st, mbx, mby, qp, pps,
                            er.mb_type(st, mbx, mby, "I"))


def _decode_mb_intra(er, st: _FrameState, mbx: int, mby: int,
                     qp: int, pps: dict, mb_type: int) -> int:
    ox, oy = mbx * 16, mby * 16
    bx0, by0 = ox // 4, oy // 4
    # MB-level neighbour availability (frame edge + slice boundary)
    up_mb = st.up_ok(mbx, mby)
    left_mb = st.left_ok(mbx, mby)
    ul_mb = st.ul_ok(mbx, mby)
    if mb_type == 25:  # I_PCM
        st.mb_pcm[mby, mbx] = True
        lum, cbs, crs = er.pcm_samples(st, mbx, mby)
        st.y[oy : oy + 16, ox : ox + 16] = lum
        st.cb[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8] = cbs
        st.cr[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8] = crs
        st.nzy[by0 : by0 + 4, bx0 : bx0 + 4] = 16
        st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2] = 16
        st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        return qp
    if mb_type == 0 and st.t8_mode and er.t8_flag(st, mbx, mby):
        # I_NxN with transform_size_8x8_flag: Intra_8x8 (§8.3.2) — four
        # 8x8 blocks, each a filtered-reference 9-mode prediction plus an
        # §8.5.13 8x8 residual; modes share the 4x4 grid (replicated)
        st.mb_t8[mby, mbx] = True
        modes = []
        for i8, (x8, y8) in enumerate(_B8_POS):
            by, bx = (oy + y8) // 4, (ox + x8) // 4
            pred = st.pred_mode4(by, bx)
            mode = er.intra4_mode(st, by, bx, pred)
            st.modes4[by : by + 2, bx : bx + 2] = mode
            modes.append(mode)
        chroma_mode = er.chroma_mode(st, mbx, mby)
        cbp = er.cbp(st, mbx, mby, True)
        cbp_l, cbp_c = cbp & 15, cbp >> 4
        if cbp:
            qp += er.qp_delta(st, mbx, mby)
        for i8, (x8, y8) in enumerate(_B8_POS):
            gy, gx = oy + y8, ox + x8
            upright, b_up, b_left, b_ul = _blk8_avail(
                st, mbx, mby, i8, up_mb, left_mb, ul_mb
            )
            p = pred8(st.y, gy, gx, modes[i8], upright, b_up, b_left, b_ul)
            if cbp_l & (1 << i8):
                zz8 = _read_luma8(er, st, gy, gx)
                d = dequant8(_zz_to_mat8(zz8), qp, sl8=0)  # Intra Y 8x8
                rec = p + idct8(d)
            else:
                st.nzy[gy // 4 : gy // 4 + 2, gx // 4 : gx // 4 + 2] = 0
                rec = p
            st.y[gy : gy + 8, gx : gx + 8] = np.clip(rec, 0, 255)
        _decode_chroma(er, st, ox, oy, chroma_mode, cbp_c, qp, pps,
                       up_ok=up_mb, left_ok=left_mb, ul_ok=ul_mb)
        return qp
    if mb_type == 0:  # I_NxN (4x4)
        modes = []
        for blk in range(16):
            x, yb = _BLK4_POS[blk]
            by, bx = (oy + yb) // 4, (ox + x) // 4
            pred = st.pred_mode4(by, bx)
            mode = er.intra4_mode(st, by, bx, pred)
            st.modes4[by, bx] = mode
            modes.append(mode)
        chroma_mode = er.chroma_mode(st, mbx, mby)
        cbp = er.cbp(st, mbx, mby, True)
        cbp_l, cbp_c = cbp & 15, cbp >> 4
        if cbp:
            qp += er.qp_delta(st, mbx, mby)
        for blk in range(16):
            x, yb = _BLK4_POS[blk]
            gy, gx = oy + yb, ox + x
            by, bx = gy // 4, gx // 4
            upright, b_up, b_left, b_ul = _blk4_avail(
                st, mby, blk, x, yb, gx, up_mb, left_mb, ul_mb
            )
            p = pred4(st.y, gy, gx, modes[blk], upright, b_up, b_left, b_ul)
            if cbp_l & (1 << (blk // 4)):
                coeffs = er.res_luma(st, by, bx, False)
                st.nzy[by, bx] = sum(1 for c in coeffs if c)
                d = dequant4(_zz_to_mat(coeffs), qp, sl=0)  # Intra Y
                rec = p + idct4(d)
            else:
                st.nzy[by, bx] = 0
                rec = p
            st.y[gy : gy + 4, gx : gx + 4] = np.clip(rec, 0, 255)
        _decode_chroma(er, st, ox, oy, chroma_mode, cbp_c, qp, pps,
                       up_ok=up_mb, left_ok=left_mb, ul_ok=ul_mb)
        return qp
    if not 1 <= mb_type <= 24:
        raise ValueError(f"mb_type {mb_type} is not an I-slice macroblock")
    # I_16x16: pred mode + cbp packed in mb_type (Table 7-11)
    pm = (mb_type - 1) % 4
    cbp_c = ((mb_type - 1) // 4) % 3
    cbp_l = 15 if mb_type - 1 >= 12 else 0
    chroma_mode = er.chroma_mode(st, mbx, mby)
    qp += er.qp_delta(st, mbx, mby)
    p16 = pred16(st.y, oy, ox, pm, up_mb, left_mb, ul_mb)
    dc_zz = er.res_luma_dc16(st, mbx, mby)
    dc = dequant_dc4(hadamard4(_zz_to_mat(dc_zz)), qp, sl=0)
    for blk in range(16):
        x, yb = _BLK4_POS[blk]
        gy, gx = oy + yb, ox + x
        by, bx = gy // 4, gx // 4
        d = np.zeros((4, 4), dtype=np.int64)
        if cbp_l:
            ac = er.res_luma(st, by, bx, True)
            st.nzy[by, bx] = sum(1 for c in ac if c)
            d = dequant4(_zz_to_mat([0] + ac), qp, sl=0)
        else:
            st.nzy[by, bx] = 0
        d[0, 0] = dc[yb // 4, x // 4]
        rec = p16[yb : yb + 4, x : x + 4] + idct4(d)
        st.y[gy : gy + 4, gx : gx + 4] = np.clip(rec, 0, 255)
    _decode_chroma(er, st, ox, oy, chroma_mode, cbp_c, qp, pps,
                   up_ok=up_mb, left_ok=left_mb, ul_ok=ul_mb)
    return qp


def _blk4_avail(st: _FrameState, mby: int, blk: int, x: int, yb: int,
                gx: int, up_mb: bool, left_mb: bool, ul_mb: bool):
    """(upright, up, left, ul) availability for a 4x4 luma block at MB
    offset (x, yb): blocks interior to the MB see same-MB neighbours;
    edge blocks inherit the MB-level flags; the up-right of a top-row
    block lives in the above(-right) MB, so it needs that MB same-slice
    (§8.3.1's neighbouring-sample availability with slice boundaries)."""
    if yb == 0:
        upright = (
            blk not in _NO_UPRIGHT
            and gx + 8 <= st.W
            and st.mb_same_slice((gx + 4) // 16, mby - 1)
        )
    else:
        upright = blk not in _NO_UPRIGHT
    b_up = up_mb if yb == 0 else True
    b_left = left_mb if x == 0 else True
    if yb == 0 and x == 0:
        b_ul = ul_mb
    elif yb == 0:
        b_ul = up_mb
    elif x == 0:
        b_ul = left_mb
    else:
        b_ul = True
    return upright, b_up, b_left, b_ul


def _decode_chroma(er, st: _FrameState, ox: int, oy: int,
                   mode: int, cbp_c: int, qp: int, pps: dict,
                   pred_fn=None, up_ok: bool = True, left_ok: bool = True,
                   ul_ok: bool = True) -> None:
    """``pred_fn(comp) -> 8x8 prediction`` overrides intra chroma
    prediction — the inter path supplies motion-compensated blocks."""
    qpc = chroma_qp(qp + pps.get("chroma_qp_offset", 0))
    cx, cy = ox // 2, oy // 2
    mbx, mby = ox // 16, oy // 16
    # §8.5.9 list index: Intra Cb/Cr = 1/2, Inter Cb/Cr = 4/5 (the inter
    # path is exactly the pred_fn-override one)
    sl0 = 1 if pred_fn is None else 4
    dcs = []
    for comp in range(2):
        if cbp_c:
            zz = er.res_chroma_dc(st, comp, mbx, mby)
            m = np.array([[zz[0], zz[1]], [zz[2], zz[3]]], dtype=np.int64)
            dcs.append(dequant_dc2(hadamard2(m), qpc, sl=sl0 + comp))
        else:
            dcs.append(np.zeros((2, 2), dtype=np.int64))
    for comp, plane in ((0, st.cb), (1, st.cr)):
        p8 = (
            pred_fn(comp)
            if pred_fn is not None
            else pred_chroma(plane, cy, cx, mode, up_ok, left_ok, ul_ok)
        )
        for blk, (x, yb) in enumerate(_CBLK_POS):
            cby, cbx = (cy + yb) // 4, (cx + x) // 4
            d = np.zeros((4, 4), dtype=np.int64)
            if cbp_c == 2:
                ac = er.res_chroma_ac(st, comp, cby, cbx)
                st.nzc[comp, cby, cbx] = sum(1 for c in ac if c)
                d = dequant4(_zz_to_mat([0] + ac), qpc, sl=sl0 + comp)
            else:
                st.nzc[comp, cby, cbx] = 0
            d[0, 0] = dcs[comp][yb // 4, x // 4]
            rec = p8[yb : yb + 4, x : x + 4] + idct4(d)
            plane[cy + yb : cy + yb + 4, cx + x : cx + x + 4] = np.clip(rec, 0, 255)


# ---------------------------------------------------------------------------
# slice encode (non-normative side; runs the same reconstruction as the
# decoder so prediction contexts stay bit-identical)
# ---------------------------------------------------------------------------


def _sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def _avail_modes16(st: _FrameState, mbx: int, mby: int) -> list[int]:
    """Usable Intra_16x16 modes given frame-edge AND slice-boundary
    availability (plane mode additionally needs the up-left corner)."""
    up, left = st.up_ok(mbx, mby), st.left_ok(mbx, mby)
    m = [2]
    if up:
        m.append(0)
    if left:
        m.append(1)
    if up and left and st.ul_ok(mbx, mby):
        m.append(3)
    return m


def _avail_modes_chroma(st: _FrameState, mbx: int, mby: int) -> list[int]:
    up, left = st.up_ok(mbx, mby), st.left_ok(mbx, mby)
    m = [0]
    if left:
        m.append(1)
    if up:
        m.append(2)
    if up and left and st.ul_ok(mbx, mby):
        m.append(3)
    return m


def _avail_modes4(up: bool, left: bool, ul: bool, upright: bool) -> list[int]:
    m = [2]
    if up:
        m += [0, 7] if upright else [0]
        # DDL needs up (up-right replicates when absent is allowed only
        # when up itself exists)
        m.append(3)
    if left:
        m += [1, 8]
    if up and left and ul:
        m += [4, 5, 6]
    return m


def _encode_chroma(st: _FrameState, ox: int, oy: int,
                   src_cb: np.ndarray, src_cr: np.ndarray, qp: int,
                   mode: int, pred_fn=None, intra: bool = True,
                   up_ok: bool = True, left_ok: bool = True,
                   ul_ok: bool = True) -> tuple[int, list]:
    """Transform+quant both chroma components; returns (cbp_chroma,
    emission list).  Reconstruction is applied to the state planes.
    ``pred_fn(comp) -> 8x8`` overrides intra prediction (inter MC)."""
    qpc = chroma_qp(qp)
    cx, cy = ox // 2, oy // 2
    comps = []
    any_dc = any_ac = False
    for comp, (src, plane) in enumerate(((src_cb, st.cb), (src_cr, st.cr))):
        p8 = (
            pred_fn(comp)
            if pred_fn is not None
            else pred_chroma(plane, cy, cx, mode, up_ok, left_ok, ul_ok)
        )
        resid = src[cy : cy + 8, cx : cx + 8].astype(np.int64) - p8
        dcm = np.zeros((2, 2), dtype=np.int64)
        acs = []
        slc = (1 if intra else 4) + comp  # §8.5.9 chroma list index
        for blk, (x, yb) in enumerate(_CBLK_POS):
            wv = fdct4(resid[yb : yb + 4, x : x + 4])
            z = quant4(wv, qpc, intra=intra, sl=slc)
            dcm[yb // 4, x // 4] = wv[0, 0]
            z[0, 0] = 0
            acs.append(z)
        zdc = quant_dc2(hadamard2(dcm), qpc, sl=slc)
        if zdc.any():
            any_dc = True
        if any(a.any() for a in acs):
            any_ac = True
        comps.append((zdc, acs, p8))
    cbp_c = 2 if any_ac else (1 if any_dc else 0)
    # reconstruct + build emission: spec order is BOTH DC blocks (Cb then
    # Cr), then the 4 Cb AC blocks, then the 4 Cr AC blocks (§7.3.5.3.2)
    emit_dc, emit_ac = [], []
    for comp, (zdc, acs, p8) in enumerate(comps):
        slc = (1 if intra else 4) + comp
        if cbp_c:
            zz = [int(zdc[0, 0]), int(zdc[0, 1]), int(zdc[1, 0]), int(zdc[1, 1])]
            emit_dc.append(("dc", comp, ox // 16, oy // 16, zz))
        dc = (
            dequant_dc2(hadamard2(zdc), qpc, sl=slc)
            if cbp_c
            else np.zeros((2, 2), dtype=np.int64)
        )
        plane = (st.cb, st.cr)[comp]
        for blk, (x, yb) in enumerate(_CBLK_POS):
            cby, cbx = (cy + yb) // 4, (cx + x) // 4
            z = acs[blk] if cbp_c == 2 else np.zeros((4, 4), dtype=np.int64)
            ac_zz = _mat_to_zz(z)[1:]
            if cbp_c == 2:
                emit_ac.append(("ac", comp, cby, cbx, ac_zz))
            else:
                # decoder records 0 for unsent AC blocks — the nC context
                # of the NEXT macroblock depends on it, so mirror exactly
                st.nzc[comp, cby, cbx] = 0
            d = dequant4(z, qpc, sl=slc)
            d[0, 0] = dc[yb // 4, x // 4]
            rec = p8[yb : yb + 4, x : x + 4] + idct4(d)
            plane[cy + yb : cy + yb + 4, cx + x : cx + x + 4] = np.clip(rec, 0, 255)
    return cbp_c, emit_dc + emit_ac


def _flush_chroma(ew, st: _FrameState, emit: list, cbp_c: int) -> None:
    for e in emit:
        if e[0] == "dc":
            _, comp, mbx, mby, zz = e
            ew.res_chroma_dc(st, comp, mbx, mby, zz)
        else:
            _, comp, cby, cbx, ac_zz = e
            tc = ew.res_chroma_ac(st, comp, cby, cbx, ac_zz)
            st.nzc[comp, cby, cbx] = tc
    if cbp_c != 2:
        # decoder records zeros; mirror it
        pass


def _mb_snapshot(st: _FrameState, mbx: int, mby: int):
    """Copy the MB-local slices of every state field (cheap rollback for
    the I_PCM fallback — full-plane copies would be per-MB quadratic)."""
    ox, oy = mbx * 16, mby * 16
    return (
        st.y[oy : oy + 16, ox : ox + 16].copy(),
        st.cb[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8].copy(),
        st.cr[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8].copy(),
        st.nzy[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4].copy(),
        st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2].copy(),
        st.modes4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4].copy(),
        bool(st.mb_inter[mby, mbx]),
        st.mv[mby, mbx].copy(),
        st.ref_l[mby, mbx].copy(),
        bool(st.mb_t8[mby, mbx]),
        st.use_l[mby, mbx].copy(),
        st.mv_l[mby, mbx].copy(),
        bool(st.rec4[mby, mbx]),
        st.use4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4].copy(),
        st.mv4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4].copy(),
        st.ref4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4].copy(),
    )


def _mb_restore(st: _FrameState, mbx: int, mby: int, snap) -> None:
    ox, oy = mbx * 16, mby * 16
    (y, cb, cr, nzy, nzc, modes4, inter, mv, ref_l, t8,
     use_l, mv_l, rec4, use4, mv4, ref4) = snap
    st.mb_t8[mby, mbx] = t8
    st.y[oy : oy + 16, ox : ox + 16] = y
    st.cb[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8] = cb
    st.cr[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8] = cr
    st.nzy[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4] = nzy
    st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2] = nzc
    st.modes4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4] = modes4
    st.mb_inter[mby, mbx] = inter
    st.mv[mby, mbx] = mv
    st.ref_l[mby, mbx] = ref_l
    st.use_l[mby, mbx] = use_l
    st.mv_l[mby, mbx] = mv_l
    st.rec4[mby, mbx] = rec4
    st.use4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4] = use4
    st.mv4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4] = mv4
    st.ref4[oy // 4 : oy // 4 + 4, ox // 4 : ox // 4 + 4] = ref4


def _encode_mb_pcm(ew, st: _FrameState, mbx: int, mby: int,
                   src_y: np.ndarray, src_cb: np.ndarray, src_cr: np.ndarray,
                   type_offset: int = 0) -> None:
    """I_PCM (mb_type 25, +5 inside P slices): raw samples, always
    conformant — the universal fallback when a residual would need a
    placeholder coeff_token row."""
    ox, oy = mbx * 16, mby * 16
    bx0, by0 = ox // 4, oy // 4
    sl = {0: "I", 5: "P", 23: "B"}[type_offset]
    st.mb_pcm[mby, mbx] = True
    ew.mb_type(st, mbx, mby, sl, 25 + type_offset)
    lum = src_y[oy : oy + 16, ox : ox + 16]
    cbs = src_cb[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8]
    crs = src_cr[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8]
    ew.pcm_samples(st, mbx, mby, lum, cbs, crs)
    st.y[oy : oy + 16, ox : ox + 16] = lum
    st.cb[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8] = cbs
    st.cr[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8] = crs
    st.nzy[by0 : by0 + 4, bx0 : bx0 + 4] = 16
    st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2] = 16
    st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
    st.mb_inter[mby, mbx] = False


def _encode_mb(ew, st: _FrameState, mbx: int, mby: int,
               src_y: np.ndarray, src_cb: np.ndarray, src_cr: np.ndarray,
               qp: int, mb_mode: str) -> None:
    ox, oy = mbx * 16, mby * 16
    bx0, by0 = ox // 4, oy // 4
    src = src_y[oy : oy + 16, ox : ox + 16].astype(np.int64)

    if mb_mode == "pcm":
        _encode_mb_pcm(ew, st, mbx, mby, src_y, src_cb, src_cr)
        return

    if ew.cabac:
        # CABAC binarizes every residual exactly — no non-verbatim
        # placeholder rows exist, so no fallback path is reachable
        _encode_mb_coded(ew, st, mbx, mby, src, src_y, src_cb, src_cr,
                         qp, mb_mode)
        return
    snap = _mb_snapshot(st, mbx, mby)
    wpos = ew.checkpoint()
    try:
        _encode_mb_coded(ew, st, mbx, mby, src, src_y, src_cb, src_cr,
                         qp, mb_mode)
    except _NonVerbatimCode:
        ew.rollback(wpos)
        _mb_restore(st, mbx, mby, snap)
        _encode_mb_pcm(ew, st, mbx, mby, src_y, src_cb, src_cr)


def _encode_mb_coded(ew, st: _FrameState, mbx: int, mby: int,
                     src: np.ndarray, src_y: np.ndarray,
                     src_cb: np.ndarray, src_cr: np.ndarray,
                     qp: int, mb_mode: str) -> None:
    ox, oy = mbx * 16, mby * 16
    bx0, by0 = ox // 4, oy // 4
    up_mb, left_mb = st.up_ok(mbx, mby), st.left_ok(mbx, mby)
    ul_mb = st.ul_ok(mbx, mby)
    # pick the luma strategy
    m16 = min(_avail_modes16(st, mbx, mby),
              key=lambda m: _sad(src, pred16(st.y, oy, ox, m,
                                             up_mb, left_mb, ul_mb)))
    use_i4 = mb_mode in ("i4", "i8")
    if mb_mode == "auto":
        # I_4x4 / Intra_8x8 wins when the MB is detail-heavy: compare the
        # 16x16 prediction SAD against a DC-per-4x4-block proxy
        sad16 = _sad(src, pred16(st.y, oy, ox, m16, up_mb, left_mb, ul_mb))
        sad4 = sum(
            _sad(
                src[yb : yb + 4, x : x + 4],
                np.full((4, 4), src[yb : yb + 4, x : x + 4].mean()),
            )
            for x, yb in _BLK4_POS
        )
        use_i4 = sad4 + 256 < sad16
    cmode = min(_avail_modes_chroma(st, mbx, mby),
                key=lambda m: _sad(src_cb[oy // 2 : oy // 2 + 8, ox // 2 : ox // 2 + 8],
                                   pred_chroma(st.cb, oy // 2, ox // 2, m,
                                               up_mb, left_mb, ul_mb)))

    if use_i4:
        # transform_8x8 pictures code their I_NxN macroblocks as
        # Intra_8x8 (mb_mode "i4" still forces the 4x4 flavour — both
        # are legal under a transform_8x8 PPS, flag 1 vs 0)
        if st.t8_mode and mb_mode != "i4":
            _encode_mb_i8(ew, st, mbx, mby, src, src_cb, src_cr, qp, cmode)
        else:
            _encode_mb_i4(ew, st, mbx, mby, src, src_cb, src_cr, qp, cmode)
        return

    # ---- I_16x16 ----
    p16 = pred16(st.y, oy, ox, m16, up_mb, left_mb, ul_mb)
    resid = src - p16
    dcm = np.zeros((4, 4), dtype=np.int64)
    acs = []
    for blk in range(16):
        x, yb = _BLK4_POS[blk]
        wv = fdct4(resid[yb : yb + 4, x : x + 4])
        dcm[yb // 4, x // 4] = wv[0, 0]
        z = quant4(wv, qp, sl=0)
        z[0, 0] = 0
        acs.append(z)
    zdc = quant_dc4(hadamard4(dcm), qp, sl=0)
    cbp_l = 15 if any(a.any() for a in acs) else 0
    # chroma first to know cbp_c (emission order restores spec order)
    cbp_c, cemit = _encode_chroma(st, ox, oy, src_cb, src_cr, qp, cmode,
                                  up_ok=up_mb, left_ok=left_mb, ul_ok=ul_mb)
    mb_type = 1 + m16 + 4 * cbp_c + 12 * (1 if cbp_l else 0)
    ew.mb_type(st, mbx, mby, "I", mb_type)
    ew.chroma_mode(st, mbx, mby, cmode)
    ew.qp_delta(st, mbx, mby, 0)
    ew.res_luma_dc16(st, mbx, mby, _mat_to_zz(zdc))
    dc = dequant_dc4(hadamard4(zdc), qp, sl=0)
    for blk in range(16):
        x, yb = _BLK4_POS[blk]
        gy, gx = oy + yb, ox + x
        by, bx = gy // 4, gx // 4
        z = acs[blk]
        if cbp_l:
            tc = ew.res_luma(st, by, bx, True, _mat_to_zz(z)[1:])
            st.nzy[by, bx] = tc
        else:
            st.nzy[by, bx] = 0
        d = dequant4(z if cbp_l else np.zeros((4, 4), dtype=np.int64), qp,
                     sl=0)
        d[0, 0] = dc[yb // 4, x // 4]
        rec = p16[yb : yb + 4, x : x + 4] + idct4(d)
        st.y[gy : gy + 4, gx : gx + 4] = np.clip(rec, 0, 255)
    st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
    _flush_chroma(ew, st, cemit, cbp_c)


def _encode_mb_i4(ew, st: _FrameState, mbx: int, mby: int,
                  src: np.ndarray, src_cb: np.ndarray, src_cr: np.ndarray,
                  qp: int, cmode: int) -> None:
    ox, oy = mbx * 16, mby * 16
    up_mb, left_mb = st.up_ok(mbx, mby), st.left_ok(mbx, mby)
    ul_mb = st.ul_ok(mbx, mby)
    blocks = []  # (mode, pred_bits, zz_coeffs)
    for blk in range(16):
        x, yb = _BLK4_POS[blk]
        gy, gx = oy + yb, ox + x
        by, bx = gy // 4, gx // 4
        upright, b_up, b_left, b_ul = _blk4_avail(
            st, mby, blk, x, yb, gx, up_mb, left_mb, ul_mb
        )
        cand = _avail_modes4(
            gy > 0 and b_up, gx > 0 and b_left,
            gy > 0 and gx > 0 and b_ul, upright,
        )
        sblk = src[yb : yb + 4, x : x + 4]
        mode = min(cand, key=lambda m: _sad(
            sblk, pred4(st.y, gy, gx, m, upright, b_up, b_left, b_ul)))
        p = pred4(st.y, gy, gx, mode, upright, b_up, b_left, b_ul)
        z = quant4(fdct4(sblk - p), qp, sl=0)
        zz = _mat_to_zz(z)
        blocks.append((mode, zz))
        # reconstruct now so the next block predicts from decoded pixels
        rec = p + idct4(dequant4(z, qp, sl=0))
        st.y[gy : gy + 4, gx : gx + 4] = np.clip(rec, 0, 255)
        st.modes4[by, bx] = mode
    cbp_l = 0
    for i8 in range(4):
        if any(any(blocks[i8 * 4 + k][1]) for k in range(4)):
            cbp_l |= 1 << i8
    cbp_c, cemit = _encode_chroma(st, ox, oy, src_cb, src_cr, qp, cmode,
                                  up_ok=up_mb, left_ok=left_mb, ul_ok=ul_mb)
    cbp = cbp_l | (cbp_c << 4)
    ew.mb_type(st, mbx, mby, "I", 0)  # I_NxN
    if st.t8_mode:
        # a transform_8x8 PPS makes the flag present on every I_NxN MB
        ew.t8_flag(st, mbx, mby, False)
    # mode signalling (prediction replays the decoder's min rule)
    saved = st.modes4.copy()
    for blk in range(16):
        x, yb = _BLK4_POS[blk]
        by, bx = (oy + yb) // 4, (ox + x) // 4
        st.modes4[by, bx] = -2  # mark not-yet-signalled
    for blk in range(16):
        x, yb = _BLK4_POS[blk]
        by, bx = (oy + yb) // 4, (ox + x) // 4
        pred = st.pred_mode4(by, bx)
        mode = blocks[blk][0]
        ew.intra4_mode(st, by, bx, pred, mode)
        st.modes4[by, bx] = mode
    st.modes4[:] = saved
    ew.chroma_mode(st, mbx, mby, cmode)
    ew.cbp(st, mbx, mby, True, cbp)
    if cbp:
        ew.qp_delta(st, mbx, mby, 0)
    for blk in range(16):
        x, yb = _BLK4_POS[blk]
        by, bx = (oy + yb) // 4, (ox + x) // 4
        if cbp_l & (1 << (blk // 4)):
            tc = ew.res_luma(st, by, bx, False, blocks[blk][1])
            st.nzy[by, bx] = tc
        else:
            st.nzy[by, bx] = 0
    _flush_chroma(ew, st, cemit, cbp_c)


def _encode_mb_i8(ew, st: _FrameState, mbx: int, mby: int,
                  src: np.ndarray, src_cb: np.ndarray, src_cr: np.ndarray,
                  qp: int, cmode: int) -> None:
    """Intra_8x8 macroblock (I_NxN + transform_size_8x8_flag): per 8x8
    block the best of the nine §8.3.2 filtered-reference modes by SAD,
    §8.5.13 8x8 transform residual.  Mirror of :func:`_encode_mb_i4`."""
    ox, oy = mbx * 16, mby * 16
    up_mb, left_mb = st.up_ok(mbx, mby), st.left_ok(mbx, mby)
    ul_mb = st.ul_ok(mbx, mby)
    blocks = []  # (mode, zz8)
    for i8, (x8, y8) in enumerate(_B8_POS):
        gy, gx = oy + y8, ox + x8
        upright, b_up, b_left, b_ul = _blk8_avail(
            st, mbx, mby, i8, up_mb, left_mb, ul_mb
        )
        cand = _avail_modes8(
            gy > 0 and b_up, gx > 0 and b_left,
            gy > 0 and gx > 0 and b_ul,
        )
        sblk = src[y8 : y8 + 8, x8 : x8 + 8]
        mode = min(cand, key=lambda m: _sad(
            sblk, pred8(st.y, gy, gx, m, upright, b_up, b_left, b_ul)))
        p = pred8(st.y, gy, gx, mode, upright, b_up, b_left, b_ul)
        z = quant8(fdct8(sblk - p), qp, sl8=0)
        blocks.append((mode, _mat_to_zz8(z)))
        # reconstruct now so the next block predicts from decoded pixels
        rec = p + idct8(dequant8(z, qp, sl8=0))
        st.y[gy : gy + 8, gx : gx + 8] = np.clip(rec, 0, 255)
        st.modes4[gy // 4 : gy // 4 + 2, gx // 4 : gx // 4 + 2] = mode
    cbp_l = 0
    for i8 in range(4):
        if any(blocks[i8][1]):
            cbp_l |= 1 << i8
    cbp_c, cemit = _encode_chroma(st, ox, oy, src_cb, src_cr, qp, cmode,
                                  up_ok=up_mb, left_ok=left_mb, ul_ok=ul_mb)
    cbp = cbp_l | (cbp_c << 4)
    ew.mb_type(st, mbx, mby, "I", 0)  # I_NxN
    ew.t8_flag(st, mbx, mby, True)
    st.mb_t8[mby, mbx] = True
    # mode signalling (prediction replays the decoder's min rule)
    saved = st.modes4.copy()
    for x8, y8 in _B8_POS:
        by, bx = (oy + y8) // 4, (ox + x8) // 4
        st.modes4[by : by + 2, bx : bx + 2] = -2  # not-yet-signalled
    for i8, (x8, y8) in enumerate(_B8_POS):
        by, bx = (oy + y8) // 4, (ox + x8) // 4
        pred = st.pred_mode4(by, bx)
        mode = blocks[i8][0]
        ew.intra4_mode(st, by, bx, pred, mode)
        st.modes4[by : by + 2, bx : bx + 2] = mode
    st.modes4[:] = saved
    ew.chroma_mode(st, mbx, mby, cmode)
    ew.cbp(st, mbx, mby, True, cbp)
    if cbp:
        ew.qp_delta(st, mbx, mby, 0)
    for i8, (x8, y8) in enumerate(_B8_POS):
        gy, gx = oy + y8, ox + x8
        if cbp_l & (1 << i8):
            _write_luma8(ew, st, gy, gx, blocks[i8][1])
        else:
            st.nzy[gy // 4 : gy // 4 + 2, gx // 4 : gx // 4 + 2] = 0
    _flush_chroma(ew, st, cemit, cbp_c)


def _slice_bounds(n_mbs: int, slices: int) -> list[tuple[int, int]]:
    """Balanced contiguous raster MB runs (first runs get the remainder)
    — the slice partition real encoders use for thread parallelism."""
    slices = max(1, min(int(slices), n_mbs))
    base, rem = divmod(n_mbs, slices)
    out, s = [], 0
    for i in range(slices):
        e = s + base + (1 if i < rem else 0)
        out.append((s, e))
        s = e
    return out


def _write_deblock(w: BitWriter, deblock: bool) -> None:
    """Slice-header deblocking control (§7.3.3): idc 0 + zero offsets when
    the encoder runs the shared kernels/h264_deblock.py loop filter on its
    reconstruction, idc 1 (conformant skip) otherwise."""
    if deblock:
        w.ue(0)  # disable_deblocking_filter_idc: filter all edges
        w.se(0)  # slice_alpha_c0_offset_div2
        w.se(0)  # slice_beta_offset_div2
    else:
        w.ue(1)  # disable_deblocking_filter_idc: OFF (conformant skip)


def _encoder_deblock(st: "_FrameState", n_slices: int,
                     deblock: bool) -> None:
    """Apply the in-loop filter to a fully encoded picture's recon so the
    state used as a reference (and returned to callers) matches what a
    decoder reconstructs."""
    if deblock:
        from scanner_spark.kernels.h264_deblock import deblock_picture

        deblock_picture(st, {si: (0, 0, 0) for si in range(n_slices)})


@_scaling_scope
def encode_picture_i(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     qp: int = 26, mb_mode: str = "auto",
                     poc_lsb: int | None = None,
                     slices: int = 1,
                     entropy: str = "cavlc",
                     deblock: bool = False,
                     long_term: bool = False,
                     scaling4: "tuple | list | None" = None,
                     scaling8: "tuple | list | None" = None,
                     transform_8x8: bool = False,
                     ) -> tuple[list[bytes], _FrameState]:
    """(y, cb, cr) uint8 planes (padded to MB multiples by the caller via
    :func:`pad_planes`) -> (IDR slice RBSPs, reconstruction state) — the
    state seeds P-frame encoding of the following GOP frames.
    ``poc_lsb`` is written for poc-type-0 streams (B GOPs).  With
    ``slices > 1`` the picture is split into balanced contiguous MB runs,
    each an independently decodable slice (prediction and CAVLC contexts
    never cross the boundary — the encode path shares the slice-aware
    neighbour checks with the decoder, so reconstruction stays
    bit-identical)."""
    H_, W_ = y.shape
    assert H_ % 16 == 0 and W_ % 16 == 0, "pad planes first (pad_planes)"
    if mb_mode == "i8" and not transform_8x8:
        # loud refusal (ADVICE r13): without the transform_8x8 PPS the
        # coded stream would silently fall back to Intra_4x4
        raise ValueError('mb_mode="i8" needs transform_8x8=True')
    _set_encoder_scaling(scaling4)
    _set_encoder_scaling8(scaling8 if transform_8x8 else None)
    mbw, mbh = W_ // 16, H_ // 16
    st = _FrameState(mbw, mbh)
    st.t8_mode = transform_8x8  # pair with write_pps(transform_8x8=True)
    st.poc = poc_lsb  # POC tag (temporal direct; exact pre-wrap)
    st.slice_no[:] = -1  # mark as we code: mirrors the decoder exactly
    rbsps = []
    for si, (mb0, mb1) in enumerate(_slice_bounds(mbw * mbh, slices)):
        st.cur_slice = si
        w = BitWriter()
        w.ue(mb0)  # first_mb_in_slice
        w.ue(7)  # slice_type: I (all slices in picture)
        w.ue(0)  # pps_id
        w.u(0, 4)  # frame_num (log2_max_frame_num = 4)
        w.ue(0)  # idr_pic_id
        if poc_lsb is not None:
            w.u(poc_lsb & 0xFF, 8)  # pic_order_cnt_lsb (poc_type 0)
        w.u(0, 1)  # no_output_of_prior_pics
        # long_term_reference_flag: the IDR enters the DPB as
        # LongTermFrameIdx 0 (§8.2.5.1) — the walk keeps it past the
        # sliding window until an MMCO releases it
        w.u(1 if long_term else 0, 1)
        w.se(0)  # slice_qp_delta (QP == pic_init_qp)
        _write_deblock(w, deblock)
        if entropy == "cabac":
            if mb_mode == "pcm":
                raise ValueError(
                    "I_PCM under CABAC not supported (never needed: "
                    "arithmetic coding has no non-verbatim fallback)"
                )
            from scanner_spark.kernels.h264_cabac import CabacWriter

            w.byte_align_one()
            ew = CabacWriter()
            for mb in range(mb0, mb1):
                mbx, mby = mb % mbw, mb // mbw
                st.slice_no[mby, mbx] = si
                st.mb_qp[mby, mbx] = qp
                ew.begin_mb(st, mbx, mby)
                _encode_mb(ew, st, mbx, mby, y, cb, cr, qp, mb_mode)
                ew.end_mb(st, mbx, mby)
                ew.end_of_slice(mb == mb1 - 1)
            rbsps.append(w.bytes() + ew.bytes())
            continue
        ew = CavlcWriter(w)
        for mb in range(mb0, mb1):
            mbx, mby = mb % mbw, mb // mbw
            st.slice_no[mby, mbx] = si
            st.mb_qp[mby, mbx] = qp
            _encode_mb(ew, st, mbx, mby, y, cb, cr, qp, mb_mode)
        w.rbsp_trailing()
        rbsps.append(w.bytes())
    _encoder_deblock(st, max(slices, 1), deblock)
    return rbsps, st


def encode_slice(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                 qp: int = 26, mb_mode: str = "auto",
                 poc_lsb: int | None = None) -> tuple[bytes, _FrameState]:
    """Single-slice IDR picture (see :func:`encode_picture_i`)."""
    rbsps, st = encode_picture_i(y, cb, cr, qp=qp, mb_mode=mb_mode,
                                 poc_lsb=poc_lsb, slices=1)
    return rbsps[0], st


def _motion_search(ref_y: np.ndarray, src: np.ndarray, oy: int, ox: int,
                   search: int, subpel: bool = True) -> np.ndarray:
    """Integer-pel full search +-search px, then half- and quarter-pel
    refinement through the normative interpolator; returns quarter-pel
    mv.  Ties break toward (0,0)-closest then raster order.  ``src``'s
    shape selects the partition size (16x16 whole MB down to 4x4
    sub-partitions)."""
    H_, W_ = ref_y.shape
    bh, bw = src.shape
    best = (1 << 60, 0, np.zeros(2, dtype=np.int64))
    for dy in range(-search, search + 1):
        ry = oy + dy
        if ry < -(bh - 1) or ry + bh > H_ + bh - 1:
            continue
        for dx in range(-search, search + 1):
            rx = ox + dx
            if rx < -(bw - 1) or rx + bw > W_ + bw - 1:
                continue
            rows = np.clip(np.arange(ry, ry + bh), 0, H_ - 1)
            cols = np.clip(np.arange(rx, rx + bw), 0, W_ - 1)
            sad = int(np.abs(src - ref_y[np.ix_(rows, cols)]).sum())
            bias = abs(dx) + abs(dy)
            if (sad, bias) < (best[0], best[1]):
                best = (sad, bias, np.array([4 * dx, 4 * dy], dtype=np.int64))
    if not subpel:
        return best[2]
    # half- then quarter-pel refinement around the integer winner, SAD
    # through the same §8.4.2.2.1 interpolation the decoder runs
    sad_best, _, mv = best[0], best[1], best[2].copy()
    for step in (2, 1):
        improved = True
        while improved:
            improved = False
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    if dx == 0 and dy == 0:
                        continue
                    cand = mv + (dx, dy)
                    sad = int(np.abs(src - mc_luma(
                        ref_y, oy, ox, cand, bh, bw)).sum())
                    if sad < sad_best:
                        sad_best, mv, improved = sad, cand, True
    return mv


def _inter_residuals(ref: _FrameState, src: np.ndarray,
                     src_cb: np.ndarray, src_cr: np.ndarray,
                     oy: int, ox: int, mv, qp: int,
                     wp: dict | None = None, l0_idx: int = 0,
                     t8: bool = False):
    """Quantized inter residuals for one MB at ``mv``: returns
    (cbp, luma_z list, chroma (zdc, acs, p8) per comp, p16).  ``wp``
    weights the compensated samples with ``l0_idx``'s tuple (normative
    order: interpolate, then weight — §8.4.2.3.2)."""
    cy, cx = oy // 2, ox // 2
    p16 = mc_luma(ref.y, oy, ox, mv)
    p8s = (mc_chroma(ref.cb, cy, cx, mv), mc_chroma(ref.cr, cy, cx, mv))
    if wp is not None:
        l0, ly, lc = wp["l0"][l0_idx], wp["logwd_y"], wp["logwd_c"]
        p16 = _wp_single(p16, l0[0], l0[1], ly)
        p8s = (_wp_single(p8s[0], l0[2], l0[3], lc),
               _wp_single(p8s[1], l0[4], l0[5], lc))
    return _inter_residuals_from_pred(src, src_cb, src_cr, oy, ox, p16, p8s,
                                      qp, t8=t8)


def _inter_residuals_from_pred(src: np.ndarray, src_cb: np.ndarray,
                               src_cr: np.ndarray, oy: int, ox: int,
                               p16: np.ndarray, p8s, qp: int,
                               t8: bool = False):
    """Quantized inter residuals against a caller-supplied prediction
    (single-list MC or B bi-prediction): returns
    (cbp, luma_z list, chroma (zdc, acs, p8) per comp, p16).  With
    ``t8`` the luma residual is four 8x8 transform blocks (High profile
    transform_size_8x8) instead of sixteen 4x4s."""
    qpc = chroma_qp(qp)
    resid = src - p16
    luma_z = []
    cbp_l = 0
    if t8:
        for i8, (x8, y8) in enumerate(_B8_POS):
            z8 = quant8(fdct8(resid[y8 : y8 + 8, x8 : x8 + 8]), qp,
                        intra=False, sl8=1)  # Inter Y 8x8
            luma_z.append(z8)
            if z8.any():
                cbp_l |= 1 << i8
    else:
        for blk in range(16):
            x, yb = _BLK4_POS[blk]
            luma_z.append(quant4(fdct4(resid[yb : yb + 4, x : x + 4]), qp,
                                 intra=False, sl=3))
        for i8 in range(4):
            if any(luma_z[i8 * 4 + k].any() for k in range(4)):
                cbp_l |= 1 << i8
    cy, cx = oy // 2, ox // 2
    comps = []
    any_dc = any_ac = False
    for comp, srcc in ((0, src_cb), (1, src_cr)):
        p8 = p8s[comp]
        residc = srcc[cy : cy + 8, cx : cx + 8].astype(np.int64) - p8
        dcm = np.zeros((2, 2), dtype=np.int64)
        acs = []
        for blk, (x, yb) in enumerate(_CBLK_POS):
            wv = fdct4(residc[yb : yb + 4, x : x + 4])
            z = quant4(wv, qpc, intra=False, sl=4 + comp)
            dcm[yb // 4, x // 4] = wv[0, 0]
            z[0, 0] = 0
            acs.append(z)
        zdc = quant_dc2(hadamard2(dcm), qpc, sl=4 + comp)
        if zdc.any():
            any_dc = True
        if any(a.any() for a in acs):
            any_ac = True
        comps.append((zdc, acs, p8))
    cbp_c = 2 if any_ac else (1 if any_dc else 0)
    return cbp_l | (cbp_c << 4), luma_z, comps, p16


def _reconstruct_inter(st: _FrameState, oy: int, ox: int, cbp: int,
                       luma_z, comps, p16, qp: int,
                       t8: bool = False) -> None:
    """Apply the decoder's reconstruction for an inter MB (bit-identical
    contexts; also updates nzy/nzc for uncoded blocks)."""
    qpc = chroma_qp(qp)
    cbp_l, cbp_c = cbp & 15, cbp >> 4
    if t8 and cbp_l:
        for i8, (x8, y8) in enumerate(_B8_POS):
            gy, gx = oy + y8, ox + x8
            if cbp_l & (1 << i8):
                rec = p16[y8 : y8 + 8, x8 : x8 + 8] + idct8(
                    dequant8(luma_z[i8], qp, sl8=1))
            else:
                rec = p16[y8 : y8 + 8, x8 : x8 + 8]
            st.y[gy : gy + 8, gx : gx + 8] = np.clip(rec, 0, 255)
    else:
        for blk in range(16):
            x, yb = _BLK4_POS[blk]
            gy, gx = oy + yb, ox + x
            if cbp_l & (1 << (blk // 4)):
                rec = p16[yb : yb + 4, x : x + 4] + idct4(
                    dequant4(luma_z[blk], qp, sl=3))
            else:
                rec = p16[yb : yb + 4, x : x + 4]
            st.y[gy : gy + 4, gx : gx + 4] = np.clip(rec, 0, 255)
    cy, cx = oy // 2, ox // 2
    for comp, (zdc, acs, p8) in enumerate(comps):
        plane = (st.cb, st.cr)[comp]
        dc = (
            dequant_dc2(hadamard2(zdc), qpc, sl=4 + comp)
            if cbp_c
            else np.zeros((2, 2), dtype=np.int64)
        )
        for blk, (x, yb) in enumerate(_CBLK_POS):
            z = acs[blk] if cbp_c == 2 else np.zeros((4, 4), dtype=np.int64)
            d = dequant4(z, qpc, sl=4 + comp)
            d[0, 0] = dc[yb // 4, x // 4]
            rec = p8[yb : yb + 4, x : x + 4] + idct4(d)
            plane[cy + yb : cy + yb + 4, cx + x : cx + x + 4] = np.clip(rec, 0, 255)


def _write_inter_mb(ew, st: _FrameState, mbx: int, mby: int,
                    mv, mvd, cbp: int, luma_z, comps, qp: int,
                    mb_type: int = 0, mvd2=None,
                    ref_idx: int | None = None, n_ref: int = 1,
                    ref_idx1: int | None = None, n_ref1: int = 1,
                    sl: str | None = None, t8: bool = False) -> None:
    """Bitstream emission for a 16x16 inter MB + nzy/nzc updates:
    P_L0_16x16 (mb_type 0) or a B 16x16 type (0 = B_Direct with
    ``sl="B"``, 1/2/3) with ``mvd`` for the first coded list and ``mvd2``
    for list 1 of B_Bi.  With ``n_ref > 1`` (active list-0 refs)
    ``ref_idx`` is coded te(v) between mb_type and the mvds, and
    ``n_ref1``/``ref_idx1`` likewise for list 1 of B types (§7.3.5.1
    order: ref_idx_l0, ref_idx_l1, mvd_l0, mvd_l1).  ``sl`` overrides
    the historical mb_type-0-means-P inference (required to emit
    B_Direct, which carries NO motion syntax)."""
    oy, ox = mby * 16, mbx * 16
    cbp_l, cbp_c = cbp & 15, cbp >> 4
    if sl is None:
        sl = "P" if mb_type == 0 else "B"
    ew.mb_type(st, mbx, mby, sl, mb_type)
    direct = sl == "B" and mb_type == 0
    uses0 = mb_type in (0, 1, 3) and not direct
    uses1 = mb_type in (2, 3)
    if n_ref > 1 and uses0:
        ew.ref_idx(st, mbx, mby, n_ref, int(ref_idx), lst=0)
    if n_ref1 > 1 and uses1:
        ew.ref_idx(st, mbx, mby, n_ref1, int(ref_idx1), lst=1)
    if mvd is not None:
        # list 0 unless this is B_L1_16x16 (its single mvd is list 1)
        ew.mvd_pair(st, mbx, mby, 1 if mb_type == 2 else 0, mvd)
    if mvd2 is not None:
        ew.mvd_pair(st, mbx, mby, 1, mvd2)
    _write_inter_tail(ew, st, mbx, mby, cbp, luma_z, comps, qp, t8,
                      not direct or st.direct8_inf)


def _write_inter_tail(ew, st: _FrameState, mbx: int, mby: int, cbp: int,
                      luma_z, comps, qp: int, t8: bool,
                      t8_allowed: bool) -> None:
    """Writer twin of :func:`_decode_inter_tail`: cbp, the §7.3.5 inter
    transform_size_8x8_flag (between cbp and mb_qp_delta, present only
    with luma residual and ``t8_allowed`` — NoSubMbPartSizeLessThan8x8 /
    B_Direct's direct_8x8_inference condition), mb_qp_delta, luma and
    chroma residual emission + nzy/nzc bookkeeping."""
    oy, ox = mby * 16, mbx * 16
    cbp_l, cbp_c = cbp & 15, cbp >> 4
    ew.cbp(st, mbx, mby, False, cbp)
    flag_present = st.t8_mode and cbp_l and t8_allowed
    eff_t8 = bool(t8 and flag_present)
    assert not (t8 and cbp_l and not flag_present), (
        "8x8 residuals built for an MB whose flag cannot be coded"
    )
    if flag_present:
        ew.t8_flag(st, mbx, mby, eff_t8)
    st.mb_t8[mby, mbx] = eff_t8
    if cbp:
        ew.qp_delta(st, mbx, mby, 0)
    if eff_t8:
        for i8, (x, yb) in enumerate(_B8_POS):
            gy, gx = oy + yb, ox + x
            if cbp_l & (1 << i8):
                _write_luma8(ew, st, gy, gx, _mat_to_zz8(luma_z[i8]))
            else:
                st.nzy[gy // 4 : gy // 4 + 2, gx // 4 : gx // 4 + 2] = 0
    else:
        for blk in range(16):
            x, yb = _BLK4_POS[blk]
            by, bx = (oy + yb) // 4, (ox + x) // 4
            if cbp_l & (1 << (blk // 4)):
                tc = ew.res_luma(st, by, bx, False, _mat_to_zz(luma_z[blk]))
                st.nzy[by, bx] = tc
            else:
                st.nzy[by, bx] = 0
    # chroma: both DCs, then Cb ACs, then Cr ACs (§7.3.5.3.2)
    if cbp_c:
        for comp, (zdc, _acs, _p8) in enumerate(comps):
            zz = [int(zdc[0, 0]), int(zdc[0, 1]), int(zdc[1, 0]), int(zdc[1, 1])]
            ew.res_chroma_dc(st, comp, mbx, mby, zz)
    for comp, (_zdc, acs, _p8) in enumerate(comps):
        for blk, (x, yb) in enumerate(_CBLK_POS):
            cby, cbx = (oy // 2 + yb) // 4, (ox // 2 + x) // 4
            if cbp_c == 2:
                tc = ew.res_chroma_ac(st, comp, cby, cbx,
                                      _mat_to_zz(acs[blk])[1:])
                st.nzc[comp, cby, cbx] = tc
            else:
                st.nzc[comp, cby, cbx] = 0


# encoder-side inverse partition tables ------------------------------------
_B_PART_TYPE = {
    ("16x8" if _t % 2 == 0 else "8x16", _p0, _p1): _t
    for _t, (_p0, _p1) in _B_PART_PRED.items()
}
_B_SUB_TYPE = {_v: _k for _k, _v in _B_SUB.items()}


def _adaptive_p_layout(ysrc, search_refs, oy: int, ox: int,
                       search: int) -> str:
    """Per-MB P partition layout by integer-pel SAD (over the
    best reference) plus a flat 24-per-extra-mvd penalty approximating
    the syntax cost — an encoder CHOICE; every layout is conformant.
    Returns "auto" (16x16) / "16x8" / "8x16" / "8x8"."""
    def sad(gy, gx, hh, ww):
        blk = ysrc[gy : gy + hh, gx : gx + ww]
        best = None
        for sp in search_refs:
            mv = _motion_search(sp, blk, gy, gx, search, subpel=False)
            s = int(np.abs(blk - mc_luma(sp, gy, gx, mv, hh, ww)).sum())
            best = s if best is None else min(best, s)
        return best

    s16 = sad(oy, ox, 16, 16)
    s168 = sad(oy, ox, 8, 16) + sad(oy + 8, ox, 8, 16) + 24
    s816 = sad(oy, ox, 16, 8) + sad(oy, ox + 8, 16, 8) + 24
    s88 = sum(sad(oy + dy, ox + dx, 8, 8)
              for dy in (0, 8) for dx in (0, 8)) + 72
    m = min(s16, s168, s816, s88)
    if m == s16:
        return "auto"
    if m == s168:
        return "16x8"
    if m == s816:
        return "8x16"
    return "8x8"


def _encode_inter_part(ew, st: _FrameState, mbx: int, mby: int,
                       ysrc, cbsrc, crsrc, qp: int,
                       refs0, refs1, search0, search1,
                       wp: dict | None, n0: int, n1: int, sl: str,
                       part_mode: str, search: int, transform_8x8: bool,
                       direct_spatial: bool = True,
                       b_direct: bool = False) -> None:
    """Encoder twin of :func:`_decode_mb_inter_part`: one partitioned
    inter MB.  ``part_mode`` selects the layout — "16x8"/"8x16" (two MB
    partitions; B picks each partition's L0/L1/Bi by SAD, Table 7-14),
    "8x8"/"8x8ref0"/"8x4"/"4x8"/"4x4" (P_8x8/B_8x8 with that
    sub-partition geometry; B picks each 8x8's prediction by SAD,
    including B_Direct_8x8 when ``b_direct``).  Per-partition motion
    search runs per active reference on the (weighted-proxy) planes;
    MV predictors replay the decoder's §8.4.1.3 derivation order.  May
    raise :class:`_NonVerbatimCode` under CAVLC (caller unwinds to
    I_PCM)."""
    oy, ox = mby * 16, mbx * 16
    by0, bx0 = oy // 4, ox // 4
    src = ysrc[oy : oy + 16, ox : ox + 16]
    if sl == "P":
        refs1, search1, n1 = refs0, search0, 1
    implicit = wp is not None and wp.get("implicit")

    def search_blk(gy, gx, hh, ww, refs, searches, wkey, ref_cap=None):
        """(sad, ref_idx, mv, raw_pred, weighted_pred) — cheapest
        weighted compensated SAD over the active references."""
        blk = ysrc[gy : gy + hh, gx : gx + ww]
        cands = []
        n_try = 1 if ref_cap else len(refs)
        for ri in range(n_try):
            mvi = _motion_search(searches[ri], blk, gy, gx, search)
            pi = mc_luma(refs[ri].y, gy, gx, mvi, hh, ww)
            if wp is not None and not implicit:
                t = wp[wkey][ri]
                pc = _wp_single(pi, t[0], t[1], wp["logwd_y"])
            else:
                pc = pi
            cands.append((int(np.abs(blk - pc).sum()), ri, mvi, pi, pc))
        return min(cands, key=lambda c: (c[0], c[1]))

    # ---- layout + per-group prediction choice ---------------------------
    ref0_forced = part_mode == "8x8ref0"
    two_part = part_mode in ("16x8", "8x16")
    d_regions = None
    d_p16 = d_pcb = d_pcr = None
    if b_direct and sl == "B" and not two_part:
        d_regions = st.direct_motion(mbx, mby, refs0, refs1,
                                     direct_spatial)
        d_p16 = np.zeros((16, 16), dtype=np.int64)
        d_pcb = np.zeros((8, 8), dtype=np.int64)
        d_pcr = np.zeros((8, 8), dtype=np.int64)
        _pred_direct_regions(st, refs0, refs1, d_regions, mbx, mby, wp,
                             d_p16, d_pcb, d_pcr, record=False)

    def choose_pred(gy, gx, hh, ww):
        """For one B group: cheapest of L0 / L1 / Bi (and the direct
        quadrant when available) -> (pred, r0, r1).  Per-sub-part MVs
        are searched afterwards against the chosen references."""
        s0, r0, _, p0raw, p0c = search_blk(gy, gx, hh, ww, refs0,
                                           search0, "l0")
        s1, r1, _, p1raw, p1c = search_blk(gy, gx, hh, ww, refs1,
                                           search1, "l1")
        blk = ysrc[gy : gy + hh, gx : gx + ww]
        if wp is None:
            pbi = (p0raw + p1raw + 1) >> 1
        elif implicit:
            l0w, l1w = wp["l0"][0], wp["l1"][0]
            pbi = _wp_bi(p0raw, p1raw, l0w[0], l0w[1], l1w[0], l1w[1],
                         wp["logwd_y"])
        else:
            t0, t1 = wp["l0"][r0], wp["l1"][r1]
            pbi = _wp_bi(p0raw, p1raw, t0[0], t0[1], t1[0], t1[1],
                         wp["logwd_y"])
        sbi = int(np.abs(blk - pbi).sum())
        cands = [(s0, "L0", r0, 0), (s1, "L1", 0, r1),
                 (sbi, "Bi", r0, r1)]
        if d_regions is not None and hh == 8:
            dblk = d_p16[gy - oy : gy - oy + hh, gx - ox : gx - ox + ww]
            sd = int(np.abs(blk - dblk).sum())
            # direct codes no motion syntax: FIRST so ties pick it
            cands.insert(0, (sd, "Direct", 0, 0))
        best = min(cands, key=lambda c: c[0])
        return best[1], best[2], best[3]

    groups = []  # (qbox(sy,sx,h4,w4), pred, r0, r1, geom_class)
    if two_part:
        geo = _PART2_GEOM[part_mode]
        for i, (sy, sx, h4, w4) in enumerate(geo):
            gy, gx, hh, ww = oy + sy * 4, ox + sx * 4, h4 * 4, w4 * 4
            if sl == "P":
                _, r0, _, _, _ = search_blk(gy, gx, hh, ww, refs0,
                                            search0, "l0")
                groups.append(((sy, sx, h4, w4), "L0", r0, 0, None))
            else:
                pred, r0, r1 = choose_pred(gy, gx, hh, ww)
                groups.append(((sy, sx, h4, w4), pred, r0, r1, None))
        if sl == "P":
            mb_type = 1 if part_mode == "16x8" else 2
            sub_types = None
        else:
            mb_type = _B_PART_TYPE[(part_mode, groups[0][1],
                                    groups[1][1])]
            sub_types = None
    else:
        gclass = {"8x8": 0, "8x8ref0": 0, "8x4": 1, "4x8": 2,
                  "4x4": 3}[part_mode]
        sub_types = []
        for q in range(4):
            qy, qx = (q >> 1) * 2, (q & 1) * 2
            gy, gx = oy + qy * 4, ox + qx * 4
            if sl == "P":
                _, r0, _, _, _ = search_blk(gy, gx, 8, 8, refs0,
                                            search0, "l0",
                                            ref_cap=ref0_forced)
                groups.append(((qy, qx, 2, 2), "L0", r0, 0, gclass))
                sub_types.append(gclass)  # Table 7-17: class == type
            else:
                pred, r0, r1 = choose_pred(gy, gx, 8, 8)
                if pred == "Direct" and gclass != 0:
                    pred, r0, r1 = "Bi", 0, 0  # direct only at 8x8 geom
                groups.append(((qy, qx, 2, 2), pred, r0, r1, gclass))
                sub_types.append(_B_SUB_TYPE[(pred, 0 if pred ==
                                              "Direct" else gclass)])
        mb_type = (4 if sl == "P" and ref0_forced
                   else 3 if sl == "P" else 22)
    # ---- per-sub-part search + derivation (decoder order) --------------
    done = np.zeros((4, 4), dtype=bool)
    p16 = np.zeros((16, 16), dtype=np.int64)
    pcb = np.zeros((8, 8), dtype=np.int64)
    pcr = np.zeros((8, 8), dtype=np.int64)
    allow_t8 = True
    part_mvds = [[], []]  # emission order per list
    for gi, ((sy0, sx0, gh4, gw4), pred, r0, r1, gclass) in \
            enumerate(groups):
        if pred == "Direct":
            _pred_direct_regions(st, refs0, refs1, d_regions, mbx, mby,
                                 wp, p16, pcb, pcr, done=done,
                                 qbox=(sy0, sx0, gh4, gw4))
            if not st.direct8_inf:
                allow_t8 = False
            continue
        if gclass is not None and gclass != 0:
            allow_t8 = False
        use0 = pred in ("L0", "Bi")
        use1 = pred in ("L1", "Bi")
        shape = (part_mode, gi) if two_part else None
        subs = (((0, 0, gh4, gw4),) if gclass is None
                else _SUB_GEOM[gclass])
        for (dsy, dsx, h4, w4) in subs:
            sy, sx = sy0 + dsy, sx0 + dsx
            gy, gx = oy + sy * 4, ox + sx * 4
            hh, ww = h4 * 4, w4 * 4
            blk = ysrc[gy : gy + hh, gx : gx + ww]
            mvs = [None, None]
            for lst, use, r, refs, searches in (
                (0, use0, r0, refs0, search0),
                (1, use1, r1, refs1, search1),
            ):
                if not use:
                    continue
                mv = _motion_search(searches[r], blk, gy, gx, search)
                mvp = st.mv_pred_blk(by0 + sy, bx0 + sx, h4, w4, lst,
                                     r, done, shape)
                mvs[lst] = mv
                part_mvds[lst].append(mv - mvp)
            rpair = (r0 if use0 else 0, r1 if use1 else 0)
            py, pb, pr = _pred_part(refs0, refs1, rpair, mvs, gy, gx,
                                    hh, ww, wp)
            p16[sy * 4 : sy * 4 + hh, sx * 4 : sx * 4 + ww] = py
            pcb[sy * 2 : sy * 2 + h4 * 2, sx * 2 : sx * 2 + w4 * 2] = pb
            pcr[sy * 2 : sy * 2 + h4 * 2, sx * 2 : sx * 2 + w4 * 2] = pr
            for lst, use, r in ((0, use0, r0), (1, use1, r1)):
                if use:
                    st.record_motion(by0 + sy, bx0 + sx, h4, w4, lst,
                                     mvs[lst], r)
            done[sy : sy + h4, sx : sx + w4] = True
    st.mb_inter[mby, mbx] = True
    # ---- residuals + emission + reconstruction --------------------------
    t8 = bool(transform_8x8 and allow_t8)
    cbp, luma_z, comps, _ = _inter_residuals_from_pred(
        src, cbsrc, crsrc, oy, ox, p16, (pcb, pcr), qp, t8=t8)
    ew.mb_type(st, mbx, mby, sl, mb_type)
    if sub_types is not None:
        for t in sub_types:
            ew.sub_mb_type(st, mbx, mby, sl, t)
    for lst, n_act in ((0, n0), (1, n1)):
        for (_, pred, r0, r1, _g) in groups:
            uses = (pred in ("L0", "Bi") if lst == 0
                    else pred in ("L1", "Bi"))
            if uses and n_act > 1 and not ref0_forced:
                ew.ref_idx(st, mbx, mby, n_act, (r0, r1)[lst], lst=lst)
    for lst in (0, 1):
        for mvd in part_mvds[lst]:
            ew.mvd_pair(st, mbx, mby, lst, mvd)
    _write_inter_tail(ew, st, mbx, mby, cbp, luma_z, comps, qp, t8,
                      allow_t8)
    _reconstruct_inter(st, oy, ox, cbp, luma_z, comps, p16, qp, t8=t8)
    st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
    # chroma reconstruction used _reconstruct_inter's comps path against
    # the assembled predictions — nothing further to paste


@_scaling_scope
def encode_picture_p(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     ref: _FrameState, qp: int = 26, frame_num: int = 1,
                     search: int = 4, poc_lsb: int | None = None,
                     slices: int = 1,
                     entropy: str = "cavlc",
                     l0_ref_fn: int | None = None,
                     intra_slices: int = 0,
                     mb_mode: str = "auto",
                     weight: tuple | None = None,
                     deblock: bool = False,
                     mmco: "list[tuple[int, int, int]] | None" = None,
                     l0_mods: "list[tuple[int, int]] | None" = None,
                     scaling4: "tuple | list | None" = None,
                     scaling8: "tuple | list | None" = None,
                     transform_8x8: bool = False,
                     part_mode: str = "auto",
                     ) -> tuple[list[bytes], _FrameState]:
    """P picture: per-MB integer-pel motion search against the previous
    reconstruction, P_Skip where the compensated residual quantizes to
    zero, P_L0_16x16 otherwise, I_PCM fallback for placeholder-code
    macroblocks.  ``slices`` as in :func:`encode_picture_i` (skip runs
    and all prediction contexts reset at each slice boundary).  Returns
    (slice RBSPs, reconstruction state).

    ``l0_ref_fn``: frame_num of the DPB picture ``ref`` holds.  When the
    default RefPicList0 head (highest PicNum, i.e. the most recently
    decoded reference) is NOT that picture — after a referenced B in a
    pyramid mini-GOP — the header must carry a ref_pic_list_modification
    reordering it to index 0 (§7.3.3.1); pass the frame_num and the op
    is emitted, matching :func:`resolve_list_mod` on the decode side.

    ``intra_slices=k`` codes the picture's FIRST k slices as I slices
    (slice_type 2, intra MBs only) and the rest as P — the legal
    mixed-slice-kind picture real encoders emit for intra refresh
    (§7.4.3: slice_type may vary per slice unless the picture signals
    7/5).  Leading placement keeps intra prediction from ever reading
    inter-coded neighbours (slice boundaries block cross-slice
    prediction, so constrained_intra_pred is not needed).

    ``weight=(logwd, w_y, o_y, w_c, o_c)`` emits an explicit
    pred_weight_table (§7.3.3.2) and predicts through the §8.4.2.3.2
    weighted forms — the x264 ``weightp`` fade tool.  Requires a PPS
    with ``weighted_pred=True`` (every P slice must then carry a
    table).

    ``part_mode`` (round 14): "auto" = whole-MB P_L0_16x16 (the
    historical encoder); "16x8" / "8x16" / "8x8" / "8x8ref0" / "8x4" /
    "4x8" / "4x4" force that partitioning on every coded inter MB
    (P_Skip still wins where the skip residual is zero); "adaptive"
    picks per MB among 16x16 / 16x8 / 8x16 / 8x8 by SAD with a flat
    per-extra-partition penalty."""
    H_, W_ = y.shape
    assert H_ % 16 == 0 and W_ % 16 == 0, "pad planes first (pad_planes)"
    if mb_mode == "i8" and not transform_8x8:
        raise ValueError('mb_mode="i8" needs transform_8x8=True')
    mbw, mbh = W_ // 16, H_ // 16
    # multi-reference P: ``ref`` may be the full ordered RefPicList0
    # (most-recent-first); each MB then picks its reference by SAD and
    # codes ref_idx_l0 (decoder twin in _decode_mb_p)
    refs = list(ref) if isinstance(ref, (list, tuple)) else [ref]
    n0 = len(refs)
    ref = refs[0]
    for rf in refs:
        assert (rf.H, rf.W) == (H_, W_), "reference dims mismatch"
    if n0 > 1:
        if l0_ref_fn is not None:
            raise NotImplementedError(
                "ref-list modification with an explicit multi-ref list "
                "not supported (pass the final ordered list instead)"
            )
    if not 0 <= intra_slices < max(slices, 1):
        raise ValueError("intra_slices must leave at least one P slice")
    _set_encoder_scaling(scaling4)
    _set_encoder_scaling8(scaling8 if transform_8x8 else None)
    wp = None
    search_refs = [rf.y for rf in refs]
    if weight is not None:
        # single-ref form (logwd, w_y, o_y, w_c, o_c), or the multi-ref
        # form (logwd, [(w_y, o_y, w_c, o_c) per active reference])
        if isinstance(weight[1], (list, tuple)) and not np.isscalar(
            weight[1]
        ):
            logwd, wl = weight
        else:
            logwd, wy_, oy_, wc_, oc_ = weight
            wl = [(wy_, oy_, wc_, oc_)]
        if len(wl) != n0:
            raise ValueError(
                "weight must carry one (w_y, o_y, w_c, o_c) tuple per "
                "active reference"
            )
        wp = {"logwd_y": logwd, "logwd_c": logwd,
              "l0": [(wy, oy_, wc, oc, wc, oc) for wy, oy_, wc, oc in wl],
              "l1": None}
        # motion-search proxies: pre-weighted full-pel reference planes
        # (the per-MB residual below re-applies the weight through the
        # NORMATIVE interpolate-then-weight order)
        search_refs = [
            _wp_single(rf.y.astype(np.int64), t[0], t[1], logwd)
            for rf, t in zip(refs, wp["l0"])
        ]
    st = _FrameState(mbw, mbh)
    st.t8_mode = transform_8x8
    st.poc = poc_lsb  # POC tags (temporal direct; exact pre-wrap)
    st.ref_pocs0 = [getattr(r, "poc", None) for r in refs]
    st.slice_no[:] = -1
    rbsps = []
    ysrc = y.astype(np.int64)
    for si, (mb0, mb1) in enumerate(_slice_bounds(mbw * mbh, slices)):
        st.cur_slice = si
        w = BitWriter()
        if si < intra_slices:
            # I slice inside a non-IDR reference picture: slice_type 2
            # (NOT 7 — the picture is mixed), no ref fields, sliding-
            # window marking like any reference slice
            w.ue(mb0)  # first_mb_in_slice
            w.ue(2)  # slice_type: I (this slice only)
            w.ue(0)  # pps_id
            w.u(frame_num & 15, 4)  # frame_num
            if poc_lsb is not None:
                w.u(poc_lsb & 0xFF, 8)  # pic_order_cnt_lsb (poc_type 0)
            w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag
            w.se(0)  # slice_qp_delta
            _write_deblock(w, deblock)
            if entropy == "cabac":
                from scanner_spark.kernels.h264_cabac import CabacWriter

                w.byte_align_one()
                cw_i = CabacWriter()
                for mb in range(mb0, mb1):
                    mbx, mby = mb % mbw, mb // mbw
                    st.slice_no[mby, mbx] = si
                    st.mb_qp[mby, mbx] = qp
                    cw_i.begin_mb(st, mbx, mby)
                    _encode_mb(cw_i, st, mbx, mby, y, cb, cr, qp, mb_mode)
                    cw_i.end_mb(st, mbx, mby)
                    cw_i.end_of_slice(mb == mb1 - 1)
                rbsps.append(w.bytes() + cw_i.bytes())
            else:
                ew_i = CavlcWriter(w)
                for mb in range(mb0, mb1):
                    mbx, mby = mb % mbw, mb // mbw
                    st.slice_no[mby, mbx] = si
                    st.mb_qp[mby, mbx] = qp
                    _encode_mb(ew_i, st, mbx, mby, y, cb, cr, qp, mb_mode)
                w.rbsp_trailing()
                rbsps.append(w.bytes())
            continue
        w.ue(mb0)  # first_mb_in_slice
        w.ue(5)  # slice_type: P (this slice)
        w.ue(0)  # pps_id
        w.u(frame_num & 15, 4)  # frame_num (log2_max_frame_num = 4)
        if poc_lsb is not None:
            w.u(poc_lsb & 0xFF, 8)  # pic_order_cnt_lsb (poc_type 0)
        if n0 > 1:
            w.u(1, 1)  # num_ref_idx_active_override_flag
            w.ue(n0 - 1)  # num_ref_idx_l0_active_minus1
        else:
            w.u(0, 1)  # num_ref_idx_active_override_flag
        if l0_mods is not None:
            # caller-supplied §7.3.3.1 op sequence (e.g. idc 2 moving a
            # long-term anchor to the list head) — must describe the
            # order of the ``ref`` list actually searched against
            w.u(1, 1)  # ref_pic_list_modification_flag_l0
            for idc_, val_ in l0_mods:
                w.ue(idc_)
                w.ue(val_)
            w.ue(3)  # terminator
        elif l0_ref_fn is None or (l0_ref_fn & 15) == (frame_num & 15):
            w.u(0, 1)  # ref_pic_list_modification_flag_l0
        else:
            # one §7.3.3.1 op: abs_diff_pic_num from picNumPred == curr
            # frame_num down (idc 0) or up (idc 1) to the wanted PicNum
            diff = (frame_num - l0_ref_fn) & 15
            w.u(1, 1)  # ref_pic_list_modification_flag_l0
            if diff <= 8:
                w.ue(0)  # idc: subtract
                w.ue(diff - 1)  # abs_diff_pic_num_minus1
            else:
                w.ue(1)  # idc: add (shorter walk the other way round)
                w.ue(15 - diff)  # (16 - diff) - 1
            w.ue(3)  # terminator
        if wp is not None:
            _write_pred_weight_table(w, wp)  # §7.3.3: after rplm
        if mmco is not None:
            # adaptive dec_ref_pic_marking (§7.3.3.3): the decode walk
            # replays these through apply_ref_pic_marking
            w.u(1, 1)  # adaptive_ref_pic_marking_mode_flag
            for op_, a_, b_ in mmco:
                w.ue(op_)
                if op_ == 3:
                    w.ue(a_)
                    w.ue(b_)
                elif op_ in (1, 2, 4, 6):
                    w.ue(a_)
            w.ue(0)  # terminator
        else:
            w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag (sliding)
        if entropy == "cabac":
            w.ue(0)  # cabac_init_idc (uniform init, kernels/cabac.py)
        w.se(0)  # slice_qp_delta
        _write_deblock(w, deblock)
        if entropy == "cabac":
            from scanner_spark.kernels.h264_cabac import CabacWriter

            w.byte_align_one()
            cw = CabacWriter()
        else:
            cw = None
        ew = cw if cw is not None else CavlcWriter(w)
        skip_run = 0
        for mb in range(mb0, mb1):
            mbx, mby = mb % mbw, mb // mbw
            st.slice_no[mby, mbx] = si
            st.mb_qp[mby, mbx] = qp
            oy, ox = mby * 16, mbx * 16
            src = ysrc[oy : oy + 16, ox : ox + 16]
            if cw is not None:
                cw.begin_mb(st, mbx, mby)
            # P_Skip trial: motion-compensate at the derived skip vector
            # (quarter-pel; the interpolator handles any fraction)
            mv_skip = st.skip_mv(mbx, mby)
            cbp_s, lz_s, comps_s, p16_s = _inter_residuals(
                ref, src, cb, cr, oy, ox, mv_skip, qp, wp,
                t8=transform_8x8
            )
            if cbp_s == 0:
                if cw is not None:
                    cw.write_skip(st, mbx, mby, False, True)
                _reconstruct_inter(st, oy, ox, 0, lz_s, comps_s, p16_s, qp)
                by0, bx0 = oy // 4, ox // 4
                st.nzy[by0 : by0 + 4, bx0 : bx0 + 4] = 0
                st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2] = 0
                st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
                st.mb_inter[mby, mbx] = True
                st.record_motion(by0, bx0, 4, 4, 0, mv_skip, 0)
                skip_run += 1
                if cw is not None:
                    cw.end_mb(st, mbx, mby)
                    cw.end_of_slice(mb == mb1 - 1)
                continue
            if cw is not None:
                cw.write_skip(st, mbx, mby, False, False)
            else:
                w.ue(skip_run)
            skip_run = 0
            eff_part = part_mode
            if part_mode == "adaptive":
                eff_part = _adaptive_p_layout(ysrc, search_refs, oy, ox,
                                              search)
            if eff_part != "auto":
                if cw is not None:
                    _encode_inter_part(
                        ew, st, mbx, mby, ysrc, cb, cr, qp, refs, None,
                        search_refs, None, wp, n0, 1, "P", eff_part,
                        search, transform_8x8)
                    cw.end_mb(st, mbx, mby)
                    cw.end_of_slice(mb == mb1 - 1)
                else:
                    snap = _mb_snapshot(st, mbx, mby)
                    wpos = ew.checkpoint()
                    try:
                        _encode_inter_part(
                            ew, st, mbx, mby, ysrc, cb, cr, qp, refs,
                            None, search_refs, None, wp, n0, 1, "P",
                            eff_part, search, transform_8x8)
                    except _NonVerbatimCode:
                        ew.rollback(wpos)
                        _mb_restore(st, mbx, mby, snap)
                        _encode_mb_pcm(ew, st, mbx, mby, y, cb, cr,
                                       type_offset=5)
                continue
            if n0 > 1:
                # per-reference search: cheapest (weighted) compensated
                # SAD wins, ties to the lowest index (shorter te(v))
                cands = []
                for ri, (rf, sy) in enumerate(zip(refs, search_refs)):
                    mvi = _motion_search(sy, src, oy, ox, search)
                    pi = mc_luma(rf.y, oy, ox, mvi)
                    if wp is not None:
                        t = wp["l0"][ri]
                        pi = _wp_single(pi, t[0], t[1], wp["logwd_y"])
                    sad = int(np.abs(pi - src).sum())
                    cands.append((sad, ri, mvi))
                _, best, mv = min(cands, key=lambda c: (c[0], c[1]))
            else:
                best = 0
                mv = _motion_search(search_refs[0], src, oy, ox, search)
            mvp = st.mv_pred(mbx, mby, ref_idx=best)
            cbp, luma_z, comps, p16 = _inter_residuals(
                refs[best], src, cb, cr, oy, ox, mv, qp, wp, l0_idx=best,
                t8=transform_8x8
            )
            if cw is not None:
                _write_inter_mb(ew, st, mbx, mby, mv, mv - mvp, cbp,
                                luma_z, comps, qp, ref_idx=best, n_ref=n0,
                                t8=transform_8x8)
                _reconstruct_inter(st, oy, ox, cbp, luma_z, comps, p16, qp,
                                   t8=transform_8x8)
                by0, bx0 = oy // 4, ox // 4
                st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
                st.mb_inter[mby, mbx] = True
                st.record_motion(by0, bx0, 4, 4, 0, mv, best)
                cw.end_mb(st, mbx, mby)
                cw.end_of_slice(mb == mb1 - 1)
                continue
            snap = _mb_snapshot(st, mbx, mby)
            wpos = ew.checkpoint()
            try:
                _write_inter_mb(ew, st, mbx, mby, mv, mv - mvp, cbp,
                                luma_z, comps, qp, ref_idx=best, n_ref=n0,
                                t8=transform_8x8)
                _reconstruct_inter(st, oy, ox, cbp, luma_z, comps, p16, qp,
                                   t8=transform_8x8)
                by0, bx0 = oy // 4, ox // 4
                st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
                st.mb_inter[mby, mbx] = True
                st.record_motion(by0, bx0, 4, 4, 0, mv, best)
            except _NonVerbatimCode:
                ew.rollback(wpos)
                _mb_restore(st, mbx, mby, snap)
                _encode_mb_pcm(ew, st, mbx, mby, y, cb, cr, type_offset=5)
        if cw is not None:
            rbsps.append(w.bytes() + cw.bytes())
            continue
        if skip_run:
            w.ue(skip_run)
        w.rbsp_trailing()
        rbsps.append(w.bytes())
    _encoder_deblock(st, max(slices, 1), deblock)
    return rbsps, st


def encode_slice_p(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                   ref: _FrameState, qp: int = 26, frame_num: int = 1,
                   search: int = 4,
                   poc_lsb: int | None = None) -> tuple[bytes, _FrameState]:
    """Single-slice P picture (see :func:`encode_picture_p`)."""
    rbsps, st = encode_picture_p(y, cb, cr, ref, qp=qp, frame_num=frame_num,
                                 search=search, poc_lsb=poc_lsb, slices=1)
    return rbsps[0], st


@_scaling_scope
def encode_picture_b(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     ref0: _FrameState, ref1: _FrameState, qp: int = 26,
                     frame_num: int = 1, search: int = 4,
                     poc_lsb: int = 0,
                     slices: int = 1,
                     entropy: str = "cavlc",
                     referenced: bool = False,
                     weights: tuple | None = None,
                     deblock: bool = False,
                     implicit_pocs: "tuple[int, int, int] | None" = None,
                     scaling4: "tuple | list | None" = None,
                     b_direct: bool = False,
                     scaling8: "tuple | list | None" = None,
                     transform_8x8: bool = False,
                     direct_mode: str = "spatial",
                     part_mode: str = "auto",
                     ) -> tuple[list[bytes], _FrameState]:
    """B picture: per-MB motion search against BOTH the
    past (list 0) and future (list 1) reference reconstructions, choosing
    the cheapest of B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 by prediction
    SAD, I_PCM fallback for placeholder-code macroblocks.  With
    ``b_direct=True`` the §8.4.1.2.2 spatial-direct prediction joins the
    candidate set and wins ties (it codes no motion syntax); the encoder
    replays the decoder's exact derivation against its own running state,
    so reconstruction stays bit-identical; a chosen direct MB whose
    residual quantizes to zero is emitted as B_Skip (nothing coded at
    all — CAVLC skip runs / CABAC mb_skip_flag).  ``slices`` as
    in :func:`encode_picture_i`.  Returns (slice RBSPs, reconstruction
    state).

    ``referenced=True`` emits the header of a REFERENCE B picture (the
    middle level of a hierarchical mini-GOP): dec_ref_pic_marking is
    written (sliding window) and the state DOES enter the DPB — pack the
    NALs with nal_ref_idc > 0 and count the picture in frame_num.

    ``weights=(logwd, (w_y0, o_y0, w_c0, o_c0), (w_y1, o_y1, w_c1,
    o_c1))`` emits explicit pred_weight_tables for both lists and
    combines through the §8.4.2.3.2 weighted forms — requires a PPS with
    ``weighted_bipred_idc=1``.  ``ref0``/``ref1`` may each be the full
    ordered RefPicList (multi-reference B, both entropies — CAVLC codes
    te(v) ref_idx_lX, CABAC the §9.3 unary binarization via
    CabacReader/CabacWriter.ref_idx): each MB then picks its reference
    per list by weighted-prediction SAD; with multi-ref, each
    ``weights`` list entry is a PER-REF list of (w_y, o_y, w_c, o_c)
    tuples."""
    H_, W_ = y.shape
    assert H_ % 16 == 0 and W_ % 16 == 0, "pad planes first (pad_planes)"
    if direct_mode not in ("spatial", "temporal"):
        raise ValueError(f"unknown direct_mode {direct_mode!r}")
    mbw, mbh = W_ // 16, H_ // 16
    _set_encoder_scaling(scaling4)
    _set_encoder_scaling8(scaling8 if transform_8x8 else None)
    refs0 = list(ref0) if isinstance(ref0, (list, tuple)) else [ref0]
    refs1 = list(ref1) if isinstance(ref1, (list, tuple)) else [ref1]
    n0, n1 = len(refs0), len(refs1)
    ref0, ref1 = refs0[0], refs1[0]
    for rf in refs0 + refs1:
        assert (rf.H, rf.W) == (H_, W_), "reference dims mismatch"
    if n0 > 1 or n1 > 1:
        if implicit_pocs is not None:
            raise NotImplementedError(
                "implicit weighted bi-prediction with multi-reference "
                "lists not supported (matches the decoder's refusal)"
            )
    wp = None
    search0 = [rf.y for rf in refs0]
    search1 = [rf.y for rf in refs1]
    if implicit_pocs is not None:
        # weighted_bipred_idc == 2: POC-distance weights for B_Bi only,
        # nothing coded in the header (pair with
        # write_pps(weighted_bipred_idc=2))
        if weights is not None:
            raise ValueError("weights and implicit_pocs are exclusive")
        wp = _implicit_wp(*implicit_pocs)
    if weights is not None:
        logwd, wl0, wl1 = weights
        if not isinstance(wl0[0], (list, tuple)):
            wl0 = [wl0]
        if not isinstance(wl1[0], (list, tuple)):
            wl1 = [wl1]
        if len(wl0) != n0 or len(wl1) != n1:
            raise ValueError(
                "weights must carry one (w_y, o_y, w_c, o_c) tuple per "
                "active reference of each list"
            )
        wp = {"logwd_y": logwd, "logwd_c": logwd,
              "l0": [(wy, oy_, wc, oc, wc, oc) for wy, oy_, wc, oc in wl0],
              "l1": [(wy, oy_, wc, oc, wc, oc) for wy, oy_, wc, oc in wl1]}
        # motion-search proxies: pre-weighted full-pel reference planes
        search0 = [
            _wp_single(rf.y.astype(np.int64), t[0], t[1], logwd)
            for rf, t in zip(refs0, wp["l0"])
        ]
        search1 = [
            _wp_single(rf.y.astype(np.int64), t[0], t[1], logwd)
            for rf, t in zip(refs1, wp["l1"])
        ]
    st = _FrameState(mbw, mbh)
    st.t8_mode = transform_8x8
    st.poc = poc_lsb  # POC tags (temporal direct; exact pre-wrap)
    st.ref_pocs0 = [getattr(r, "poc", None) for r in refs0]
    st.ref_pocs1 = [getattr(r, "poc", None) for r in refs1]
    st.slice_no[:] = -1
    rbsps = []
    ysrc = y.astype(np.int64)
    for si, (mb0, mb1) in enumerate(_slice_bounds(mbw * mbh, slices)):
        st.cur_slice = si
        w = BitWriter()
        w.ue(mb0)  # first_mb_in_slice
        w.ue(6)  # slice_type: B (all slices in picture)
        w.ue(0)  # pps_id
        w.u(frame_num & 15, 4)  # frame_num (log2_max_frame_num = 4)
        w.u(poc_lsb & 0xFF, 8)  # pic_order_cnt_lsb (poc_type 0 required)
        # direct_spatial_mv_pred_flag: §8.4.1.2.2 spatial (1) or
        # §8.4.1.2.3 temporal POC-scaled (0) derivation for direct MBs
        w.u(1 if direct_mode == "spatial" else 0, 1)
        if n0 > 1 or n1 > 1:
            w.u(1, 1)  # num_ref_idx_active_override_flag
            w.ue(n0 - 1)  # num_ref_idx_l0_active_minus1
            w.ue(n1 - 1)  # num_ref_idx_l1_active_minus1
        else:
            w.u(0, 1)  # num_ref_idx_active_override_flag
        w.u(0, 1)  # ref_pic_list_modification_flag_l0
        w.u(0, 1)  # ref_pic_list_modification_flag_l1
        if wp is not None and not wp.get("implicit"):
            _write_pred_weight_table(w, wp)  # weighted_bipred_idc == 1
        if referenced:  # nal_ref_idc > 0: sliding-window ref marking
            w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag
        # else nal_ref_idc == 0: no dec_ref_pic_marking
        if entropy == "cabac":
            w.ue(0)  # cabac_init_idc (uniform init, kernels/cabac.py)
        w.se(0)  # slice_qp_delta
        _write_deblock(w, deblock)
        if entropy == "cabac":
            from scanner_spark.kernels.h264_cabac import CabacWriter

            w.byte_align_one()
            cw = CabacWriter()
        else:
            cw = None
        ew = cw if cw is not None else CavlcWriter(w)
        skip_run = 0
        for mb in range(mb0, mb1):
            mbx, mby = mb % mbw, mb // mbw
            st.slice_no[mby, mbx] = si
            st.mb_qp[mby, mbx] = qp
            oy, ox = mby * 16, mbx * 16
            src = ysrc[oy : oy + 16, ox : ox + 16]
            if part_mode != "auto":
                # forced B partitioning (round 14): each partition /
                # 8x8 sub-MB picks L0/L1/Bi (and Direct under
                # ``b_direct``) by SAD inside _encode_inter_part
                if cw is not None:
                    cw.begin_mb(st, mbx, mby)
                    cw.write_skip(st, mbx, mby, True, False)
                    _encode_inter_part(
                        ew, st, mbx, mby, ysrc, cb, cr, qp, refs0,
                        refs1, search0, search1, wp, n0, n1, "B",
                        part_mode, search, transform_8x8,
                        direct_mode == "spatial", b_direct)
                    cw.end_mb(st, mbx, mby)
                    cw.end_of_slice(mb == mb1 - 1)
                else:
                    snap = _mb_snapshot(st, mbx, mby)
                    wpos = ew.checkpoint()
                    w.ue(skip_run)
                    try:
                        _encode_inter_part(
                            ew, st, mbx, mby, ysrc, cb, cr, qp, refs0,
                            refs1, search0, search1, wp, n0, n1, "B",
                            part_mode, search, transform_8x8,
                            direct_mode == "spatial", b_direct)
                    except _NonVerbatimCode:
                        ew.rollback(wpos)
                        _mb_restore(st, mbx, mby, snap)
                        w.ue(skip_run)
                        _encode_mb_pcm(ew, st, mbx, mby, y, cb, cr,
                                       type_offset=23)
                    skip_run = 0
                continue

            def best_for(refs, searches, key):
                # per-reference search: cheapest WEIGHTED compensated
                # SAD wins, ties to the lowest index (shorter te(v))
                cands_ = []
                for ri, (rf, sy) in enumerate(zip(refs, searches)):
                    mvi = _motion_search(sy, src, oy, ox, search)
                    pi = mc_luma(rf.y, oy, ox, mvi)
                    if wp is not None and not wp.get("implicit"):
                        t = wp[key][ri]
                        pc = _wp_single(pi, t[0], t[1], wp["logwd_y"])
                    else:
                        pc = pi
                    cands_.append(
                        (int(np.abs(src - pc).sum()), ri, mvi, pi, pc)
                    )
                return min(cands_, key=lambda c: (c[0], c[1]))

            _, ridx0, mv0, p0, p0c = best_for(refs0, search0, "l0")
            _, ridx1, mv1, p1, p1c = best_for(refs1, search1, "l1")
            if wp is None:
                pbi = (p0 + p1 + 1) >> 1
            elif wp.get("implicit"):
                # single-list candidates stay default; only Bi weighted
                l0w, l1w = wp["l0"][0], wp["l1"][0]
                pbi = _wp_bi(p0, p1, l0w[0], l0w[1], l1w[0], l1w[1],
                             wp["logwd_y"])
            else:
                t0, t1 = wp["l0"][ridx0], wp["l1"][ridx1]
                pbi = _wp_bi(p0, p1, t0[0], t0[1], t1[0], t1[1],
                             wp["logwd_y"])
            cands = [
                (1, [mv0, None], p0c, (ridx0, 0)),
                (2, [None, mv1], p1c, (0, ridx1)),
                (3, [mv0, mv1], pbi, (ridx0, ridx1)),
            ]
            d_regions = d_pcb = d_pcr = None
            if b_direct:
                # replay the decoder's derivation on the running state;
                # FIRST in the list so equal-SAD ties pick the mode that
                # codes no ref_idx/mvd bits (recording deferred until
                # the candidate wins)
                d_regions = st.direct_motion(
                    mbx, mby, refs0, refs1, direct_mode == "spatial")
                d_p16 = np.zeros((16, 16), dtype=np.int64)
                d_pcb = np.zeros((8, 8), dtype=np.int64)
                d_pcr = np.zeros((8, 8), dtype=np.int64)
                _pred_direct_regions(st, refs0, refs1, d_regions, mbx,
                                     mby, wp, d_p16, d_pcb, d_pcr,
                                     record=False)
                cands.insert(0, (0, [None, None], d_p16, (0, 0)))
            mb_type, mvs, p16, rpair = min(
                cands, key=lambda c: int(np.abs(src - c[2]).sum())
            )
            cy, cx = oy // 2, ox // 2
            if mb_type == 0:
                p8s = (d_pcb, d_pcr)
            else:
                rpair = (rpair[0] if mvs[0] is not None else 0,
                         rpair[1] if mvs[1] is not None else 0)
                p8s = tuple(
                    _bipred(getattr(refs0[rpair[0]], pl),
                            getattr(refs1[rpair[1]], pl), cy, cx, mvs,
                            mc_chroma, wp, pl, rpair)
                    for pl in ("cb", "cr")
                )
            cbp, luma_z, comps, _ = _inter_residuals_from_pred(
                src, cb, cr, oy, ox, p16, p8s, qp, t8=transform_8x8
            )
            if mb_type == 0 and cbp == 0:
                # B_Skip: the chosen direct prediction has an all-zero
                # quantized residual — code NOTHING (CAVLC: extend the
                # skip run; CABAC: mb_skip_flag = 1).  Reconstruction
                # and recorded motion are identical to the direct MB.
                _reconstruct_inter(st, oy, ox, 0, luma_z, comps, p16, qp)
                by0, bx0 = oy // 4, ox // 4
                st.nzy[by0 : by0 + 4, bx0 : bx0 + 4] = 0
                st.nzc[:, oy // 8 : oy // 8 + 2, ox // 8 : ox // 8 + 2] = 0
                st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
                _record_direct_regions(st, d_regions, mbx, mby)
                if cw is not None:
                    cw.begin_mb(st, mbx, mby)
                    cw.write_skip(st, mbx, mby, True, True)
                    cw.end_mb(st, mbx, mby)
                    cw.end_of_slice(mb == mb1 - 1)
                else:
                    skip_run += 1
                continue
            mvd0 = (
                (mvs[0] - st.mv_pred(mbx, mby, 0, ref_idx=rpair[0]))
                if (mvs[0] is not None and mb_type != 0) else None
            )
            mvd1 = (
                (mvs[1] - st.mv_pred(mbx, mby, 1, ref_idx=rpair[1]))
                if (mvs[1] is not None and mb_type != 0) else None
            )
            if cw is not None:
                cw.begin_mb(st, mbx, mby)
                cw.write_skip(st, mbx, mby, True, False)
                _write_inter_mb(
                    ew, st, mbx, mby, mvs[0],
                    mvd0 if mvd0 is not None else mvd1,
                    cbp, luma_z, comps, qp, mb_type=mb_type,
                    mvd2=mvd1 if (mvd0 is not None and mvd1 is not None)
                    else None,
                    ref_idx=rpair[0], n_ref=n0,
                    ref_idx1=rpair[1], n_ref1=n1, sl="B",
                    t8=transform_8x8,
                )
                _reconstruct_inter(st, oy, ox, cbp, luma_z, comps, p16, qp,
                                   t8=transform_8x8)
                by0, bx0 = oy // 4, ox // 4
                st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
                st.mb_inter[mby, mbx] = True
                if mb_type == 0:
                    _record_direct_regions(st, d_regions, mbx, mby)
                else:
                    for lst in (0, 1):
                        if mvs[lst] is not None:
                            st.record_motion(by0, bx0, 4, 4, lst,
                                             mvs[lst], rpair[lst])
                cw.end_mb(st, mbx, mby)
                cw.end_of_slice(mb == mb1 - 1)
                continue
            snap = _mb_snapshot(st, mbx, mby)
            wpos = ew.checkpoint()
            w.ue(skip_run)  # mb_skip_run before this coded MB
            try:
                _write_inter_mb(
                    ew, st, mbx, mby, mvs[0],
                    mvd0 if mvd0 is not None else mvd1,
                    cbp, luma_z, comps, qp, mb_type=mb_type,
                    mvd2=mvd1 if (mvd0 is not None and mvd1 is not None)
                    else None,
                    ref_idx=rpair[0], n_ref=n0,
                    ref_idx1=rpair[1], n_ref1=n1, sl="B",
                    t8=transform_8x8,
                )
                _reconstruct_inter(st, oy, ox, cbp, luma_z, comps, p16, qp,
                                   t8=transform_8x8)
                by0, bx0 = oy // 4, ox // 4
                st.modes4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
                st.mb_inter[mby, mbx] = True
                if mb_type == 0:
                    _record_direct_regions(st, d_regions, mbx, mby)
                else:
                    for lst in (0, 1):
                        if mvs[lst] is not None:
                            st.record_motion(by0, bx0, 4, 4, lst,
                                             mvs[lst], rpair[lst])
            except _NonVerbatimCode:
                ew.rollback(wpos)
                _mb_restore(st, mbx, mby, snap)
                w.ue(skip_run)  # mb_skip_run before the replacement MB
                _encode_mb_pcm(ew, st, mbx, mby, y, cb, cr, type_offset=23)
            skip_run = 0
        if cw is not None:
            rbsps.append(w.bytes() + cw.bytes())
            continue
        if skip_run:
            w.ue(skip_run)  # trailing skipped MBs end the slice (§7.3.4)
        w.rbsp_trailing()
        rbsps.append(w.bytes())
    _encoder_deblock(st, max(slices, 1), deblock)
    return rbsps, st


def encode_slice_b(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                   ref0: _FrameState, ref1: _FrameState, qp: int = 26,
                   frame_num: int = 1, search: int = 4,
                   poc_lsb: int = 0) -> tuple[bytes, _FrameState]:
    """Single-slice B picture (see :func:`encode_picture_b`)."""
    rbsps, st = encode_picture_b(y, cb, cr, ref0, ref1, qp=qp,
                                 frame_num=frame_num, search=search,
                                 poc_lsb=poc_lsb, slices=1)
    return rbsps[0], st


def pad_planes(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """Edge-replicate planes to MB multiples (SPS crop undoes it)."""
    H_, W_ = y.shape
    ph, pw = -H_ % 16, -W_ % 16
    if ph or pw:
        y = np.pad(y, ((0, ph), (0, pw)), mode="edge")
        cb = np.pad(cb, ((0, ph // 2), (0, pw // 2)), mode="edge")
        cr = np.pad(cr, ((0, ph // 2), (0, pw // 2)), mode="edge")
    return y, cb, cr


def encode_frame_nals(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                      qp: int = 26, mb_mode: str = "auto",
                      slices: int = 1, entropy: str = "cavlc",
                      deblock: bool = False,
                      scaling4: "tuple | list | None" = None,
                      scaling8: "tuple | list | None" = None,
                      transform_8x8: bool = False) -> list:
    """One frame -> the picture's IDR slice NALs (no start code / length
    prefix), ALWAYS a list — one entry per slice.  Type-stable multi-slice
    API (ADVICE r08); :func:`encode_frame` is the scalar single-slice
    convenience."""
    yp, cbp_, crp = pad_planes(y, cb, cr)
    rbsps, _st = encode_picture_i(yp, cbp_, crp, qp=qp, mb_mode=mb_mode,
                                  slices=slices, entropy=entropy,
                                  scaling4=scaling4, scaling8=scaling8,
                                  transform_8x8=transform_8x8,
                                  deblock=deblock)
    return [rbsp_to_nal(3, 5, r) for r in rbsps]


def encode_frame(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                 qp: int = 26, mb_mode: str = "auto") -> bytes:
    """One frame -> its single IDR slice NAL (scalar convenience; use
    :func:`encode_frame_nals` for multi-slice pictures)."""
    return encode_frame_nals(y, cb, cr, qp=qp, mb_mode=mb_mode, slices=1)[0]


def encode_stream_nals(frames_yuv, gop: int = 8, qp: int = 26,
                       mb_mode: str = "auto", search: int = 4,
                       b_frames: int = 0,
                       slices: int = 1,
                       entropy: str = "cavlc",
                       b_pyramid: bool = False,
                       p_intra_slices: int = 0,
                       deblock: bool = False,
                       p_refs: int = 1,
                       implicit_bipred: bool = False,
                       ref_mode: str = "sliding",
                       b_refs: int = 1,
                       scaling4: "tuple | list | None" = None,
                       b_direct: bool = False,
                       scaling8: "tuple | list | None" = None,
                       transform_8x8: bool = False,
                       direct_mode: str = "spatial",
                       part_mode: str = "auto",
                       ) -> list[tuple[list, bool, int]]:
    """[(y, cb, cr)] in DISPLAY order -> [(slice NAL, is_idr,
    display_index)] in DECODE order: every ``gop``-th display frame an
    IDR, reference P frames every ``b_frames + 1`` display positions
    inside the GOP, non-reference B frames between consecutive
    references (bi-predicted from both RECONSTRUCTIONS, so decode drift
    is zero by construction) — the GOP structure the engine's pruned
    loads plan against (decoder_automata's keyframe -> forward model).
    With ``b_frames > 0`` the stream is poc-type-0 (pair it with
    ``write_sps(..., num_ref_frames=2, poc_type=0)``) and each
    reference P is emitted BEFORE the B frames it back-predicts; with
    ``b_frames = 0`` this reduces to the classic I-P chain (decode ==
    display order, poc-type-2 SPS).

    ``slices > 1`` splits every picture into that many independently
    decodable slices (encode_picture_*); every stream entry ALWAYS
    carries the picture's LIST of slice NALs (type-stable, ADVICE r08 —
    the mp4 layer packs them into one length-prefixed sample).  See
    :func:`encode_stream` for the scalar single-slice convenience.

    ``b_pyramid=True`` (needs ``b_frames >= 2``) emits hierarchical B
    mini-GOPs: the middle B of each inter-reference gap is itself a
    REFERENCE picture (nal_ref_idc > 0, enters the DPB) and the outer Bs
    predict from it — the x264 ``b-pyramid`` structure.  Consequences a
    decoder must handle, all covered by the general DPB walk in
    sources/mp4.decode_range: three live references (pair the stream
    with ``write_sps(..., num_ref_frames=3, poc_type=0)``), default B
    list initialization by POC distance, and an explicit
    ref_pic_list_modification on each following P (its L0 default head
    would be the B reference, not the P it predicts from).

    ``p_intra_slices=k`` (needs ``slices > k``) codes the first k slices
    of every P picture as I slices — mixed slice-kind pictures (intra
    refresh, §7.4.3; see encode_picture_p)."""
    if ref_mode not in ("sliding", "mmco_anchor", "lt_idr", "lt_anchor",
                        "mmco5_refresh"):
        raise ValueError(f"unknown ref_mode {ref_mode!r}")
    if ref_mode != "sliding":
        # §8.2.5 adaptive-marking GOP shapes (all keep a GOP-head anchor
        # reachable beyond the sliding window, so a decoder that ignores
        # the marking MISSES a reference and fails loudly — the
        # observable-difference property the fixtures need):
        #   mmco_anchor: every P from the 2nd on emits MMCO 1 removing
        #     the short-term ref it just replaced, keeping the IDR as a
        #     SHORT-TERM anchor the window would have evicted
        #   lt_idr: the IDR signals long_term_reference_flag and anchors
        #     as LongTermFrameIdx 0; P pictures window normally
        #   lt_anchor: the first P marks ITSELF long-term (MMCO 4 + 6)
        #     and the next P reorders it to the list head with a
        #     long-term (idc 2) ref_pic_list_modification
        #   mmco5_refresh: the SECOND P emits MMCO 5 (§8.2.5.4.5: every
        #     reference unused + the picture rebases to frame_num 0 /
        #     POC 0); later Ps restart frame_num at 1 and name their
        #     reference by REBASED PicNum — a decoder ignoring the op
        #     resolves the PicNum against unrebased numbers and fails
        if b_frames:
            raise NotImplementedError(
                f"ref_mode {ref_mode!r} is an I-P GOP shape (b_frames=0)"
            )
        if ref_mode == "mmco5_refresh":
            if p_refs != 1:
                raise ValueError("mmco5_refresh is a single-reference "
                                 "chain (p_refs=1)")
        elif p_refs != 2:
            raise ValueError(f"ref_mode {ref_mode!r} needs p_refs=2")
        if gop > 15:
            raise ValueError(
                "anchor ref_modes need gop <= 15: at log2_max_frame_num "
                "= 4 a longer GOP wraps frame_num onto the anchor's"
            )
    if p_refs > 1:
        if b_frames:
            raise NotImplementedError(
                "multi-reference P with B frames not supported (the "
                "decoder's default list would interleave referenced Bs; "
                "use p_refs with plain I-P GOPs)"
            )
    if implicit_bipred and not b_frames:
        raise ValueError("implicit_bipred needs B frames (b_frames > 0)")
    if b_pyramid and b_frames < 2:
        raise ValueError("b_pyramid needs b_frames >= 2 (a gap to split)")
    if b_refs > 1:
        # multi-reference B: each B's list 0 is [nearest past ref, the
        # reference before it] (the walk's default POC-descending order
        # at num_ref_frames=3); list 1 stays the bracketing future ref
        if not b_frames:
            raise ValueError("b_refs needs B frames (b_frames > 0)")
        if b_pyramid:
            raise NotImplementedError(
                "b_refs with b_pyramid not supported (the mid-B reference "
                "would interleave the default past order)"
            )
        if implicit_bipred:
            raise NotImplementedError(
                "implicit weighted bi-prediction with multi-reference "
                "lists not supported (matches the decoder's refusal)"
            )
        if b_refs != 2:
            raise ValueError("b_refs must be 1 or 2")
    frames = [pad_planes(y, cb, cr) for y, cb, cr in frames_yuv]
    out: list[tuple[list, bool, int]] = []
    poc0 = b_frames > 0  # poc-type-0 headers carry display order
    step = b_frames + 1

    def pack(rbsps: list[bytes], ref_idc: int, typ: int) -> list:
        return [rbsp_to_nal(ref_idc, typ, r) for r in rbsps]

    for g0 in range(0, len(frames), gop):
        gL = min(gop, len(frames) - g0)  # this GOP's display length
        yp, cbp_, crp = frames[g0]
        rbsps, prev_st = encode_picture_i(
            yp, cbp_, crp, qp=qp, mb_mode=mb_mode,
            poc_lsb=0 if poc0 else None, slices=slices, entropy=entropy,
            deblock=deblock, long_term=ref_mode == "lt_idr",
            scaling4=scaling4, scaling8=scaling8,
            transform_8x8=transform_8x8,
        )
        out.append((pack(rbsps, 3, 5), True, g0))
        ref_list = [prev_st]  # decode-order-recent first (RefPicList0)
        idr_st = anchor_st = prev_st  # GOP-head anchor (adaptive modes)
        older_st = None  # the reference before prev (b_refs=2 list tail)
        p_idx = 0  # P pictures emitted in this GOP so far
        fnum, prev_d = 1, 0
        prev_fn = 0  # frame_num of prev_st's picture
        prev_gap_bref = False  # previous gap emitted a reference B
        while prev_d < gL - 1:
            nxt_d = min(prev_d + step, gL - 1)
            yp, cbp_, crp = frames[g0 + nxt_d]
            # adaptive-marking GOP shapes: choose this P's reference
            # list, MMCO ops, and list-modification ops (see the
            # ref_mode note above; the decode walk must replay each
            # piece or the anchor reference goes missing)
            mmco_ops = l0_mods = None
            if ref_mode == "sliding":
                enc_ref = ref_list[:p_refs] if p_refs > 1 else prev_st
            elif ref_mode == "mmco5_refresh":
                enc_ref = prev_st
                if p_idx == 1:
                    mmco_ops = [(5, 0, 0)]  # refresh: DPB empties here
                elif p_idx >= 2:
                    # name the reference by its REBASED PicNum (curr - 1)
                    l0_mods = [(0, 0)]
            elif p_idx == 0:
                # first P: only the GOP head is referenceable
                enc_ref = prev_st
                if ref_mode == "lt_anchor":
                    # this P becomes the long-term anchor (MMCO 4 caps
                    # MaxLongTermFrameIdx, MMCO 6 marks current as LT 0)
                    mmco_ops = [(4, 1, 0), (6, 0, 0)]
            else:
                enc_ref = [prev_st, anchor_st]
                # every adaptive-mode P names BOTH refs with explicit
                # §7.3.3.1 ops (the default order would match too, but
                # positional defaults resolve against ANY two-deep DPB —
                # explicit PicNum / LongTermFrameIdx naming makes a
                # decoder that ignored the marking fail loudly instead
                # of silently predicting from the wrong picture)
                if ref_mode == "mmco_anchor":
                    # drop the short-term ref just replaced (PicNum =
                    # CurrPicNum - 1), keeping the GOP head as a
                    # SHORT-TERM anchor the sliding window would evict
                    mmco_ops = [(1, 0, 0)]
                    l0_mods = [(0, 0), (0, (fnum - 2) & 15)]
                elif ref_mode == "lt_anchor" and p_idx == 1:
                    # anchor (prev) is long-term: the default list is
                    # [IDR(st), anchor(lt)] — reorder LT 0 to the head
                    enc_ref = [prev_st, idr_st]
                    l0_mods = [(2, 0), (0, fnum - 1)]
                else:  # lt_idr, or lt_anchor past the second P
                    l0_mods = [(0, 0), (2, 0)]
            rbsps, nxt_st = encode_picture_p(
                yp, cbp_, crp,
                enc_ref,
                qp=qp, frame_num=fnum, search=search,
                poc_lsb=2 * nxt_d if poc0 else None, slices=slices,
                entropy=entropy, intra_slices=p_intra_slices,
                mb_mode=mb_mode, deblock=deblock,
                # after a reference B, the default L0 head (highest
                # PicNum) is that B, not prev_st — reorder explicitly
                l0_ref_fn=prev_fn if prev_gap_bref else None,
                mmco=mmco_ops, l0_mods=l0_mods, scaling4=scaling4,
                scaling8=scaling8, transform_8x8=transform_8x8,
                part_mode=part_mode,
            )
            if ref_mode == "lt_anchor" and p_idx == 0:
                anchor_st = nxt_st  # the self-marked LT picture
            p_idx += 1
            out.append((pack(rbsps, 2, 1), False, g0 + nxt_d))
            nxt_fn, fnum = fnum, (fnum + 1) & 15
            if ref_mode == "mmco5_refresh" and p_idx == 2:
                # the refresh P rebased itself to frame_num 0: the chain
                # restarts — the next P codes frame_num 1
                nxt_fn, fnum = 0, 1
            bds = list(range(prev_d + 1, nxt_d))
            if b_pyramid and len(bds) >= 2:
                m = (prev_d + nxt_d) // 2
                yp, cbp_, crp = frames[g0 + m]
                rbsps, mid_st = encode_picture_b(
                    yp, cbp_, crp, prev_st, nxt_st, qp=qp, frame_num=fnum,
                    search=search, poc_lsb=2 * m, slices=slices,
                    entropy=entropy, referenced=True, deblock=deblock,
                    implicit_pocs=(2 * m, 2 * prev_d, 2 * nxt_d)
                    if implicit_bipred else None,
                    scaling4=scaling4, b_direct=b_direct,
                    scaling8=scaling8, transform_8x8=transform_8x8,
                    direct_mode=direct_mode, part_mode=part_mode,
                )
                out.append((pack(rbsps, 2, 1), False, g0 + m))
                fnum = (fnum + 1) & 15
                for d in bds:
                    if d == m:
                        continue
                    r0, r1 = (prev_st, mid_st) if d < m else (mid_st, nxt_st)
                    p0d, p1d = (prev_d, m) if d < m else (m, nxt_d)
                    yp, cbp_, crp = frames[g0 + d]
                    rbsps, _ = encode_picture_b(
                        yp, cbp_, crp, r0, r1, qp=qp, frame_num=fnum,
                        search=search, poc_lsb=2 * d, slices=slices,
                        entropy=entropy, deblock=deblock,
                        implicit_pocs=(2 * d, 2 * p0d, 2 * p1d)
                        if implicit_bipred else None,
                        scaling4=scaling4, b_direct=b_direct,
                        scaling8=scaling8, transform_8x8=transform_8x8,
                        direct_mode=direct_mode, part_mode=part_mode,
                    )
                    out.append((pack(rbsps, 0, 1), False, g0 + d))
                prev_gap_bref = True
            else:
                for d in bds:
                    yp, cbp_, crp = frames[g0 + d]
                    b_ref0 = (
                        [prev_st, older_st]
                        if b_refs > 1 and older_st is not None
                        else prev_st
                    )
                    rbsps, _ = encode_picture_b(
                        yp, cbp_, crp, b_ref0, nxt_st, qp=qp,
                        frame_num=fnum,
                        search=search, poc_lsb=2 * d, slices=slices,
                        entropy=entropy, deblock=deblock,
                        implicit_pocs=(2 * d, 2 * prev_d, 2 * nxt_d)
                        if implicit_bipred else None,
                        scaling4=scaling4, b_direct=b_direct,
                        scaling8=scaling8, transform_8x8=transform_8x8,
                        direct_mode=direct_mode, part_mode=part_mode,
                    )
                    out.append((pack(rbsps, 0, 1), False, g0 + d))
                prev_gap_bref = False
            ref_list.insert(0, nxt_st)
            ref_list = ref_list[:max(p_refs, 1)]
            older_st = prev_st
            prev_st, prev_d, prev_fn = nxt_st, nxt_d, nxt_fn
    return out


def encode_stream(frames_yuv, gop: int = 8, qp: int = 26,
                  mb_mode: str = "auto", search: int = 4,
                  b_frames: int = 0) -> list[tuple[bytes, bool, int]]:
    """Scalar single-slice convenience over :func:`encode_stream_nals`:
    each entry is (slice NAL bytes, is_idr, display_index)."""
    return [
        (nals[0], is_idr, disp)
        for nals, is_idr, disp in encode_stream_nals(
            frames_yuv, gop=gop, qp=qp, mb_mode=mb_mode, search=search,
            b_frames=b_frames, slices=1,
        )
    ]


def decode_frame(nal: bytes, sps: dict, pps: dict, strict: bool = True,
                 ref: _FrameState | None = None, return_state: bool = False,
                 ref1: _FrameState | None = None,
                 cabac_marked: bool = False):
    """Slice NAL -> (y, cb, cr) uint8 planes (cropped).  IDR/non-IDR and
    the ref-marking form are selected from the NAL header (ADVICE r05);
    P slices need ``ref`` (previous reference's state), B slices ``ref``
    + ``ref1`` (past + future references); a GOP decode loop passes
    ``return_state=True`` to chain."""
    ref_idc, nal_type, rbsp = nal_to_rbsp(nal)
    if nal_type not in (1, 5):
        raise ValueError(f"not a slice NAL (type {nal_type})")
    return decode_slice(
        rbsp, sps, pps, strict=strict, idr=nal_type == 5,
        nal_ref_idc=ref_idc, ref=ref, return_state=return_state, ref1=ref1,
        cabac_marked=cabac_marked,
    )


def decode_picture_nals(nals: "list[bytes]", sps: dict, pps: dict,
                        strict: bool = True,
                        ref: _FrameState | None = None,
                        return_state: bool = False,
                        ref1: _FrameState | None = None,
                        cabac_marked: bool = False,
                        pocs: "tuple[int, int, int] | None" = None,
                        cur_poc: "int | None" = None):
    """All NALs of one access unit -> decoded picture (the multi-slice
    entry point for container layers; see :func:`decode_picture`).  SEI
    NALs are skipped, except that this repo's CABAC origin-marker SEI
    unlocks CABAC decoding (kernels/cabac.py provenance note)."""
    slices = []
    for nal in nals:
        ref_idc, nal_type, rbsp = nal_to_rbsp(nal)
        if nal_type == 6:
            cabac_marked = cabac_marked or is_cabac_marker(nal)
            continue
        if nal_type not in (1, 5):
            raise ValueError(f"not a slice NAL (type {nal_type})")
        slices.append((rbsp, nal_type == 5, ref_idc))
    return decode_picture(
        slices, sps, pps, strict=strict, ref=ref,
        return_state=return_state, ref1=ref1, cabac_marked=cabac_marked,
        pocs=pocs, cur_poc=cur_poc,
    )


def slice_kind(nal: bytes) -> tuple[str, bool]:
    """Peek a slice NAL's type without decoding it: returns
    ('I'|'P'|'B', is_reference) from the first two ue(v) fields of the
    header — what a GOP decode walk needs to maintain its two-slot DPB."""
    ref_idc, nal_type, rbsp = nal_to_rbsp(nal)
    if nal_type not in (1, 5):
        raise ValueError(f"not a slice NAL (type {nal_type})")
    r = BitReader(rbsp)
    r.ue()  # first_mb_in_slice
    st_mod = r.ue() % 5
    kind = {0: "P", 1: "B", 2: "I"}.get(st_mod)
    if kind is None:
        raise NotImplementedError(f"slice_type mod 5 == {st_mod} unsupported")
    return kind, ref_idc != 0


def _parse_list_mods(r: BitReader) -> list[tuple[int, int]] | None:
    """ref_pic_list_modification op sequence for one list (§7.3.3.1):
    None when the flag is 0, else [(idc, value), ...] up to the idc-3
    terminator.  idc 0/1 select short-term PicNums, idc 2 a
    long_term_pic_num (resolved in :func:`resolve_list_mods_full`)."""
    if not r.u(1):
        return None
    ops = []
    while True:
        idc = r.ue()
        if idc == 3:
            return ops
        if idc not in (0, 1, 2):
            raise ValueError(f"ref_pic_list_modification idc {idc} invalid")
        ops.append((idc, r.ue()))
        if len(ops) > 16:
            raise ValueError("runaway ref_pic_list_modification")


def _parse_mmco_ops(r: BitReader) -> "list[tuple[int, int, int]] | None":
    """Non-IDR dec_ref_pic_marking (§7.3.3.3): None when
    adaptive_ref_pic_marking_mode_flag is 0 (the §8.2.5.3 sliding
    window), else the [(op, a, b)] memory_management_control_operation
    list (terminator op 0 consumed, not returned).  Operands: op 1/3 →
    difference_of_pic_nums_minus1, op 2 → long_term_pic_num, op 3's b /
    op 6 → long_term_frame_idx, op 4 → max_long_term_frame_idx_plus1."""
    if not r.u(1):  # adaptive_ref_pic_marking_mode_flag
        return None
    ops = []
    while True:
        op = r.ue()
        if op == 0:
            return ops
        if op == 3:
            ops.append((3, r.ue(), r.ue()))
        elif op in (1, 2, 4, 6):
            ops.append((op, r.ue(), 0))
        elif op == 5:
            ops.append((5, 0, 0))
        else:
            raise ValueError(
                f"memory_management_control_operation {op} invalid"
            )
        if len(ops) > 32:
            raise ValueError("runaway dec_ref_pic_marking")


def resolve_list_mod(ops, curr_fn: int, max_fn: int) -> int:
    """Apply short-term modification ops (§8.2.4.3.1's picNumPred walk)
    and return the selected reference's frame_num (single-op scope: the
    in-repo encoder reorders only the list HEAD, which is all a
    one-ref-per-list decode consumes)."""
    pred = curr_fn
    target = None
    for idc, val in ops:
        if idc == 0:
            pred = (pred - (val + 1)) % max_fn
        else:
            pred = (pred + val + 1) % max_fn
        if target is None:
            target = pred
    return target if target is not None else curr_fn


def resolve_list_mods_full(ops, curr_fn: int, max_fn: int,
                           default_refs: "list",
                           n_active: int) -> "list":
    """§8.2.4.3.1 in full: apply modification ops to the default
    RefPicList order, returning the final list truncated to
    ``n_active``.  Entries are tagged ``("st", frame_num)`` /
    ``("lt", long_term_frame_idx)``; plain ints are accepted (and
    returned) as short-term frame_nums for short-term-only streams.
    idc 0/1 walk picNumPred over short-term PicNums; idc 2 selects a
    long-term picture by long_term_pic_num (== LongTermFrameIdx at
    frame-coding scope).  Each op inserts the selected picture at the
    next index and removes its later duplicate."""
    plain = all(not isinstance(x, tuple) for x in default_refs)
    lst = [x if isinstance(x, tuple) else ("st", x) for x in default_refs]
    pred = curr_fn
    ridx = 0
    for idc, val in ops:
        if idc == 0:
            pred = (pred - (val + 1)) % max_fn
            ent = ("st", pred)
        elif idc == 1:
            pred = (pred + val + 1) % max_fn
            ent = ("st", pred)
        else:  # idc 2: long-term selection
            ent = ("lt", val)
            if plain:
                raise ValueError(
                    "long-term list modification against a short-term-"
                    "only default list"
                )
        lst.insert(ridx, ent)
        ridx += 1
        for j in range(ridx, len(lst)):
            if lst[j] == ent:
                del lst[j]
                break
    lst = lst[:n_active]
    return [fn for _, fn in lst] if plain else lst


def apply_ref_pic_marking(dpb: "list[tuple]", cur: tuple,
                          mmco: "list[tuple[int, int, int]] | None",
                          max_fn: int, n_ref: int) -> "list[tuple]":
    """§8.2.5 decoded-reference-picture marking, applied after decoding
    reference picture ``cur`` = (frame_num, poc, state, lt).  ``dpb`` is
    a decode-order list of the same 4-tuples with ``lt`` None for
    short-term pictures, else the picture's LongTermFrameIdx.

    ``mmco`` None runs the §8.2.5.3 sliding window: when the reference
    count has reached ``n_ref``, the OLDEST short-term picture (smallest
    FrameNumWrap = earliest decode order at this walk's scope) is
    removed before ``cur`` enters; long-term pictures are never evicted
    by the window.  Otherwise the §8.2.5.4 adaptive operations run IN
    ORDER and no sliding window applies this picture.  MMCO 5
    (§8.2.5.4.5) marks EVERY reference picture unused — short- and
    long-term — and rebases the current picture to frame_num 0 / POC 0
    (tempPicOrderCnt subtracted); the container walk resets its POC
    predictors when it sees the op, so the chain continues from the
    rebased origin.  Returns a new list; the input is not mutated."""
    dpb = list(dpb)
    cur_fn, cur_poc, cur_st, cur_lt = cur
    if mmco is None:
        while len(dpb) >= max(n_ref, 1) and any(
            e[3] is None for e in dpb
        ):
            i = next(i for i, e in enumerate(dpb) if e[3] is None)
            del dpb[i]
        dpb.append(cur)
        return dpb

    def pic_num(fn: int) -> int:
        # §8.2.4.1 PicNum: FrameNumWrap at frame-coding scope
        return fn if fn <= cur_fn else fn - max_fn

    for op, a, b in mmco:
        if op == 1:  # mark a short-term picture unused
            x = cur_fn - (a + 1)
            hits = [i for i, e in enumerate(dpb)
                    if e[3] is None and pic_num(e[0]) == x]
            if not hits:
                raise ValueError(f"MMCO 1 targets PicNum {x}, not in DPB")
            del dpb[hits[-1]]
        elif op == 2:  # mark a long-term picture unused
            hits = [i for i, e in enumerate(dpb) if e[3] == a]
            if not hits:
                raise ValueError(
                    f"MMCO 2 targets LongTermPicNum {a}, not in DPB"
                )
            del dpb[hits[-1]]
        elif op == 3:  # short-term -> long-term with idx b
            x = cur_fn - (a + 1)
            dpb = [e for e in dpb if e[3] != b]  # idx b is reassigned
            hits = [i for i, e in enumerate(dpb)
                    if e[3] is None and pic_num(e[0]) == x]
            if not hits:
                raise ValueError(f"MMCO 3 targets PicNum {x}, not in DPB")
            fn_, poc_, st_, _ = dpb[hits[-1]]
            dpb[hits[-1]] = (fn_, poc_, st_, b)
        elif op == 4:  # cap MaxLongTermFrameIdx at a - 1
            dpb = [e for e in dpb if e[3] is None or e[3] <= a - 1]
        elif op == 6:  # current picture becomes long-term with idx a
            dpb = [e for e in dpb if e[3] != a]
            cur_lt = a
        else:  # op 5: everything unused, current rebases to fn 0 / POC 0
            dpb = []
            cur_fn, cur_poc = 0, 0
            if getattr(cur_st, "poc", None) is not None:
                cur_st.poc = 0  # keep the temporal-direct tag consistent
    dpb.append((cur_fn, cur_poc, cur_st, cur_lt))
    return dpb


def default_ref_list0_p(dpb: "list[tuple]") -> "list[tuple]":
    """§8.2.4.2.1 default P RefPicList0 over tagged DPB entries:
    short-term pictures by PicNum descending (== most recent decode
    order at this walk's scope), then long-term pictures by
    LongTermFrameIdx ascending.  Returns [("st", frame_num) | ("lt",
    idx)] for :func:`resolve_list_mods_full`."""
    st_part = [("st", e[0]) for e in reversed(dpb) if e[3] is None]
    lt_part = [("lt", e[3]) for e in
               sorted((e for e in dpb if e[3] is not None),
                      key=lambda e: e[3])]
    return st_part + lt_part


def slice_header_info(nal: bytes, sps: dict, pps: dict) -> dict:
    """Peek the slice-header fields a DPB-maintaining GOP walk needs —
    kind, reference-ness, frame_num, picture order count, and any
    ref-list modification — without decoding pixels (§7.3.3).  Replaces
    the two-slot prev/cur model's (kind, is_ref) peek: with these the
    walk resolves RefPicList0[0]/RefPicList1[0] against an arbitrary-
    depth decoded-picture buffer (hierarchical / referenced-B streams;
    the reference decodes them via ffmpeg, decoder_automata.cpp)."""
    ref_idc, nal_type, rbsp = nal_to_rbsp(nal)
    if nal_type not in (1, 5):
        raise ValueError(f"not a slice NAL (type {nal_type})")
    idr = nal_type == 5
    r = BitReader(rbsp)
    r.ue()  # first_mb_in_slice
    st_mod = r.ue() % 5
    kind = {0: "P", 1: "B", 2: "I"}.get(st_mod)
    if kind is None:
        raise NotImplementedError(f"slice_type mod 5 == {st_mod} unsupported")
    r.ue()  # pps_id
    fn = r.u(sps["log2_max_frame_num"])
    if idr:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        poc = r.u(sps.get("log2_max_poc_lsb", 4))
    else:
        # poc_type 2: display order == decode order; 2*fn ranks refs and
        # non-refs consistently at this walk's single-GOP scope
        poc = 2 * fn
    l0_mod = l1_mod = None
    n_l0 = pps.get("num_ref_l0", 0) + 1
    n_l1 = pps.get("num_ref_l1", 0) + 1
    if kind == "B":
        r.u(1)  # direct_spatial_mv_pred_flag
    if kind in ("P", "B"):
        if r.u(1):  # num_ref_idx_active_override_flag
            n_l0 = r.ue() + 1
            if kind == "B":
                n_l1 = r.ue() + 1
        l0_mod = _parse_list_mods(r)
        if kind == "B":
            l1_mod = _parse_list_mods(r)
    # pred_weight_table sits between the list mods and
    # dec_ref_pic_marking (§7.3.3) — consume it so marking parses
    if (pps.get("weighted_pred") and kind == "P") or (
        kind == "B" and pps.get("weighted_bipred_idc", 0) == 1
    ):
        _parse_pred_weight_table(r, kind == "B", n_l0, n_l1)
    # dec_ref_pic_marking: the DPB facts this walk exists to collect —
    # mmco is None for sliding-window pictures, [] is impossible (op 0
    # alone still means adaptive mode chose to mark nothing)
    idr_lt = False
    mmco = None
    if idr:
        r.u(1)  # no_output_of_prior_pics_flag
        idr_lt = bool(r.u(1))  # long_term_reference_flag
    elif ref_idc != 0:
        mmco = _parse_mmco_ops(r)
    return {
        "kind": kind, "is_ref": ref_idc != 0, "idr": idr,
        "frame_num": fn, "poc": poc, "l0_mod": l0_mod, "l1_mod": l1_mod,
        "n_l0": n_l0, "n_l1": n_l1, "mmco": mmco, "idr_lt": idr_lt,
    }


# ---------------------------------------------------------------------------
# 4:2:0 color plumbing (full-range BT.601, the same matrix as the JPEG
# codec) — the mp4 layer stores RGB frames as YCbCr 4:2:0
# ---------------------------------------------------------------------------


def yuv420_from_rgb(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(H, W, 3) uint8 RGB -> (y, cb, cr) uint8 planes, chroma 2x2-mean
    subsampled.  Even dimensions required (4:2:0)."""
    h, w, _ = img.shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
    return clip(y), clip(cb), clip(cr)


def rgb_from_yuv420(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """(y, cb, cr) planes -> (H, W, 3) uint8 RGB (nearest upsample)."""
    cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(np.float64) - 128.0
    cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(np.float64) - 128.0
    yf = y.astype(np.float64)
    r = yf + 1.402 * cru
    g = yf - 0.344136 * cbu - 0.714136 * cru
    b = yf + 1.772 * cbu
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def split_length_prefixed(sample: bytes, length_size: int = 4) -> list[bytes]:
    """avcC-style sample payload -> list of NAL units."""
    out, off = [], 0
    while off + length_size <= len(sample):
        n = int.from_bytes(sample[off : off + length_size], "big")
        off += length_size
        out.append(sample[off : off + n])
        off += n
    return out
