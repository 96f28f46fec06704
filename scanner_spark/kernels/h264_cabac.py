"""CABAC syntax layer for the h264 kernel: §9.3.2 binarizations and
§9.3.3.1 context selection, bridging the entropy-agnostic macroblock
walk in kernels/h264.py to the arithmetic engine in kernels/cabac.py.

Context identities are symbolic (family, increment) tuples rather than
normative ctxIdx numbers: with the uniform initialization documented in
kernels/cabac.py the numbering carries no information, and the symbolic
form keeps the neighbour-conditioned increments — the part of CABAC's
context modelling that actually drives adaptation — explicit and
testable.  The spec structures mirrored here, per element:

- mb_skip_flag: ctxIdxInc = condA + condB, cond = neighbour decoded and
  not skipped (§9.3.3.1.1.1-ish).
- mb_type: I-slice bin0 conditioned on neighbours not being I_NxN; the
  P prefix ('000' = P_L0_16x16, '1' = intra escape) and B prefix
  ('0' = Direct, '100'/'101' = L0/L1, '110000' = Bi, '111101' = intra
  escape) follow Table 9-34/9-37 for the types this codec emits; other
  patterns refuse loudly.  The I_16x16 suffix packs cbp_l / cbp_c /
  pred-mode bins; the I_PCM escape (a terminate bin) is refused — this
  encoder never emits PCM under CABAC because arithmetic coding has no
  non-verbatim residual rows to fall back from.
- coded_block_pattern: four luma bins conditioned on the 8x8 neighbour
  bits (same-MB bits decoded earlier in this very element), two chroma
  bins conditioned on neighbour cbp_c (§9.3.3.1.1.4).
- mb_qp_delta: unary over the (2|d|-[d>0]) mapping, bin0 conditioned on
  the previous MB having a non-zero delta.
- intra modes: prev_intra4x4_pred_mode_flag + 3-bin rem; chroma mode TU
  with bin0 conditioned on neighbours using a non-DC chroma mode.
- mvd: UEG3 (uCoff 9), bin0 conditioned on the neighbour |mvd| sum
  thresholds <3 / <=32 / >32 per component and list (§9.3.3.1.1.7).
- residual_block_cabac (§9.3.3.1.1.9 + §9.3.2.3): coded_block_flag per
  block category (0 luma-DC16, 1 luma-AC16, 2 luma4x4, 3 chroma-DC,
  4 chroma-AC) conditioned on the neighbour blocks' flags; per-position
  significant/last maps; levels decoded in reverse scan order with
  UEG0 (uCoff 14) and the numEq1/numGt1-driven increments; signs bypass.

Neighbour defaults where the spec's edge cases are not reproducible
verbatim here (all symmetric between this encoder and decoder, so
round-trips are exact; only foreign-stream ctx choice could differ, and
foreign streams are gated off — kernels/cabac.py): an undecoded /
out-of-slice block's coded_block_flag reads 1 inside intra MBs and 0
inside inter MBs; an MB without a given DC block leaves its cbf grid at
-1, which reads as the undecoded default.

Reference parity: the reference decodes CABAC streams through ffmpeg
(scanner/video/decoder_automata.cpp; software backend
scanner/video/software/).
"""

from __future__ import annotations

import numpy as np

from scanner_spark.kernels.cabac import CabacDecoder, CabacEncoder

# mb_kind enum stored in _FrameState.mb_kind
MB_I4, MB_I16, MB_PCM, MB_INTER, MB_SKIP, MB_DIRECT = 0, 1, 2, 3, 4, 5

# 4x4-block zigzag max coeff counts per residual category; 5 = the FRExt
# luma 8x8 category (transform_size_8x8_flag, 64 coefficients — §9.3.2.3's
# ctxBlockCat 5)
_CAT_LUMA_DC, _CAT_LUMA_AC, _CAT_LUMA4, _CAT_CHROMA_DC, _CAT_CHROMA_AC = (
    0, 1, 2, 3, 4,
)
_CAT_LUMA8 = 5
_CAT_MAX = {0: 16, 1: 15, 2: 16, 3: 4, 4: 15, 5: 64}


def _sig_key8(i: int) -> tuple:
    """Significance-map context key for an 8x8-block position.  The spec
    maps the 63 positions onto shared context classes (Table 9-43's 8x8
    column); with this codec's symbolic uniform-init contexts the exact
    normative grouping carries no information, so a structural grouping
    (diagonal-band quartets, 15 classes — same cardinality as the spec's)
    stands in.  Symmetric between reader and writer, so round trips are
    exact; only foreign-stream ctx choice could differ, and foreign CABAC
    is gated off (kernels/cabac.py provenance note)."""
    return ("sig", _CAT_LUMA8, min(i >> 2, 14))


def _last_key8(i: int) -> tuple:
    return ("last", _CAT_LUMA8, i >> 3)


class _CtxSide:
    """Context-increment helpers shared by the reader and the writer.
    All neighbour lookups are slice-aware through _FrameState."""

    def _ab(self, st, mbx, mby):
        a = (mbx - 1, mby) if st.mb_same_slice(mbx - 1, mby) else None
        b = (mbx, mby - 1) if st.mb_same_slice(mbx, mby - 1) else None
        return a, b

    def _skip_inc(self, st, mbx, mby) -> int:
        inc = 0
        for n in self._ab(st, mbx, mby):
            if n is not None and st.mb_kind[n[1], n[0]] not in (-1, MB_SKIP):
                inc += 1
        return inc

    def _imb_inc(self, st, mbx, mby) -> int:
        inc = 0
        for n in self._ab(st, mbx, mby):
            if n is not None and st.mb_kind[n[1], n[0]] not in (-1, MB_I4):
                inc += 1
        return inc

    def _bmb_inc(self, st, mbx, mby) -> int:
        # §9.3.3.1.1.3: condTermFlag(N) = 0 when N is unavailable,
        # B_Skip, or B_Direct_16x16
        inc = 0
        for n in self._ab(st, mbx, mby):
            if n is not None and st.mb_kind[n[1], n[0]] not in (
                -1, MB_SKIP, MB_DIRECT,
            ):
                inc += 1
        return inc

    def _t8_inc(self, st, mbx, mby) -> int:
        """transform_size_8x8_flag ctxIdxInc (§9.3.3.1.1.10): condTermA +
        condTermB, cond = neighbour decoded in-slice with its own
        transform_size_8x8_flag set."""
        inc = 0
        for n in self._ab(st, mbx, mby):
            if n is not None and st.mb_t8[n[1], n[0]]:
                inc += 1
        return inc

    def _cmode_inc(self, st, mbx, mby) -> int:
        inc = 0
        for n in self._ab(st, mbx, mby):
            if (
                n is not None
                and st.mb_kind[n[1], n[0]] in (MB_I4, MB_I16)
                and st.mb_cmode[n[1], n[0]] != 0
            ):
                inc += 1
        return inc

    def _ref_inc(self, st, mbx, mby, lst: int) -> int:
        """ref_idx_lX bin0 increment (§9.3.3.1.1.6): condTermA +
        2*condTermB, cond = neighbour decoded in-slice, inter, predicts
        from this list, and has refIdxLX > 0.  The same neighbour
        approximations as the module header apply (symmetric encoder/
        decoder; foreign streams are gated off)."""
        def cond(x, y):
            if not st.mb_same_slice(x, y):
                return 0
            if not st.mb_inter[y, x]:
                return 0
            if st.use_l[y, x].any() and not st.use_l[y, x, lst]:
                return 0  # B neighbour not predicting from this list
            return 1 if st.ref_l[y, x, lst] > 0 else 0

        return cond(mbx - 1, mby) + 2 * cond(mbx, mby - 1)

    def _qpd_key(self, i: int):
        if i == 0:
            return ("qpd", 1 if self._prev_qp_nz else 0)
        return ("qpd", 2) if i == 1 else ("qpd", 3)

    def _cbp_bit(self, st, mbx, mby, bit: int) -> int:
        """cbp of a neighbour MB, -1 when undecoded; PCM counts fully
        coded (0x2F)."""
        if not st.mb_same_slice(mbx, mby):
            return -1
        v = st.mb_cbp[mby, mbx]
        if v < 0:
            k = st.mb_kind[mby, mbx]
            if k == MB_PCM:
                v = 0x2F
            else:
                return -1
        return (v >> bit) & 1 if bit < 6 else 0

    def _cbp_luma_key(self, st, mbx, mby, i: int, own_bits: list):
        """Context key for luma cbp bin ``i``; ``own_bits`` holds the
        bins of THIS element decoded/written before it (same-MB 8x8
        neighbours)."""
        x8, y8 = i & 1, i >> 1
        if x8 > 0:
            condA = 1 if own_bits[i - 1] == 0 else 0
        else:
            nb = self._cbp_bit(st, mbx - 1, mby, 2 * y8 + 1)
            condA = 1 if nb == 0 else 0  # unavailable (-1) -> 0
        if y8 > 0:
            condB = 1 if own_bits[i - 2] == 0 else 0
        else:
            nb = self._cbp_bit(st, mbx, mby - 1, 2 + x8)
            condB = 1 if nb == 0 else 0
        return ("cbp_l", condA + 2 * condB)

    def _cbp_c_of(self, st, mbx, mby) -> int:
        if not st.mb_same_slice(mbx, mby):
            return -1
        if st.mb_kind[mby, mbx] == MB_PCM:
            return 2
        v = st.mb_cbp[mby, mbx]
        return -1 if v < 0 else v >> 4

    def _cbp_chroma_key(self, st, mbx, mby, binidx: int):
        ca = self._cbp_c_of(st, mbx - 1, mby)
        cb = self._cbp_c_of(st, mbx, mby - 1)
        if binidx == 0:
            inc = (1 if ca > 0 else 0) + 2 * (1 if cb > 0 else 0)
            return ("cbp_c0", inc)
        inc = (1 if ca == 2 else 0) + 2 * (1 if cb == 2 else 0)
        return ("cbp_c1", inc)

    def _mvd_key_fn(self, st, mbx, mby, lst: int, comp: int):
        s = 0
        for n in self._ab(st, mbx, mby):
            if n is not None:
                s += abs(int(st.mvd_l[n[1], n[0], lst, comp]))
        inc = 0 if s < 3 else (1 if s <= 32 else 2)

        def kf(i: int):
            if i == 0:
                return ("mvd", comp, inc)
            return ("mvdp", comp, min(i, 4))

        return kf

    # --- coded_block_flag neighbour increments per category ------------
    def _cbf_default(self) -> int:
        return 1 if self._cur_intra else 0

    def _cbf_grid(self, grid, by, bx, avail: bool) -> int:
        if not avail:
            return self._cbf_default()
        v = grid[by, bx]
        if v < 0:
            return self._cbf_default()
        return 1 if v > 0 else 0

    def _cbf_inc(self, st, cat: int, mbx, mby, by=0, bx=0, comp=0) -> int:
        if cat == _CAT_LUMA_DC:
            a, b = self._ab(st, mbx, mby)
            ca = self._cbf_grid(st.cbf_ydc, a[1], a[0], True) if a else (
                self._cbf_default())
            cb = self._cbf_grid(st.cbf_ydc, b[1], b[0], True) if b else (
                self._cbf_default())
        elif cat in (_CAT_LUMA_AC, _CAT_LUMA4):
            av = bx > 0 and st.mb_same_slice((bx - 1) // 4, by // 4)
            bv = by > 0 and st.mb_same_slice(bx // 4, (by - 1) // 4)
            ca = self._cbf_grid(st.nzy, by, bx - 1, av)
            cb = self._cbf_grid(st.nzy, by - 1, bx, bv)
        elif cat == _CAT_CHROMA_DC:
            a, b = self._ab(st, mbx, mby)
            g = st.cbf_cdc[comp]
            ca = self._cbf_grid(g, a[1], a[0], True) if a else (
                self._cbf_default())
            cb = self._cbf_grid(g, b[1], b[0], True) if b else (
                self._cbf_default())
        else:  # chroma AC: (by, bx) are chroma 4x4 coords, 2 per MB side
            av = bx > 0 and st.mb_same_slice((bx - 1) // 2, by // 2)
            bv = by > 0 and st.mb_same_slice(bx // 2, (by - 1) // 2)
            g = st.nzc[comp]
            ca = self._cbf_grid(g, by, bx - 1, av)
            cb = self._cbf_grid(g, by - 1, bx, bv)
        return ca + 2 * cb

    # --- grid bookkeeping shared by both sides --------------------------
    def _note_mb_type_i(self, st, mbx, mby, t: int) -> None:
        self._cur_intra = True
        if t == 0:
            st.mb_kind[mby, mbx] = MB_I4
        else:
            st.mb_kind[mby, mbx] = MB_I16
            cbp_l = 15 if t - 1 >= 12 else 0
            cbp_c = ((t - 1) // 4) % 3
            st.mb_cbp[mby, mbx] = cbp_l | (cbp_c << 4)

    def _note_inter(self, st, mbx, mby) -> None:
        self._cur_intra = False
        st.mb_kind[mby, mbx] = MB_INTER

    def _note_direct(self, st, mbx, mby) -> None:
        self._cur_intra = False
        st.mb_kind[mby, mbx] = MB_DIRECT


class CabacReader(_CtxSide):
    """CABAC syntax-element reader; the slice loop drives begin_mb /
    read_skip / end_of_slice, the shared MB walk drives the rest."""

    cabac = True

    def __init__(self, bit_reader):
        self.d = CabacDecoder(bit_reader)
        self._prev_qp_nz = False
        self._qp_nz = False
        self._cur_intra = False

    # slice-loop surface -------------------------------------------------
    def begin_mb(self, st, mbx, mby) -> None:
        self._qp_nz = False

    def end_mb(self, st, mbx, mby) -> None:
        self._prev_qp_nz = self._qp_nz

    def read_skip(self, st, mbx, mby, is_b: bool) -> bool:
        fam = "skip_b" if is_b else "skip_p"
        bit = self.d.decision((fam, self._skip_inc(st, mbx, mby)))
        if bit:
            st.mb_kind[mby, mbx] = MB_SKIP
            st.mb_cbp[mby, mbx] = 0
            self._cur_intra = False
        return bool(bit)

    def end_of_slice(self) -> bool:
        return bool(self.d.terminate())

    # macroblock-walk surface ---------------------------------------------
    def _i_mbtype(self, st, mbx, mby, suffix: bool) -> int:
        d = self.d
        if suffix:
            b0 = d.decision(("imb_sfx", 0))
        else:
            b0 = d.decision(("imb", self._imb_inc(st, mbx, mby)))
        if b0 == 0:
            return 0
        if d.terminate():
            raise NotImplementedError(
                "I_PCM under CABAC not supported (this codec never emits "
                "it: arithmetic coding has no non-verbatim fallback need)"
            )
        cbp_l = d.decision(("imb16", 0))
        cbp_c = 0
        if d.decision(("imb16", 1)):
            cbp_c = 1 + d.decision(("imb16", 2))
        pm = 2 * d.decision(("imb16", 3)) + d.decision(("imb16", 4))
        return 1 + pm + 4 * cbp_c + 12 * cbp_l

    def mb_type(self, st, mbx, mby, sl: str) -> int:
        d = self.d
        if sl == "I":
            t = self._i_mbtype(st, mbx, mby, suffix=False)
            self._note_mb_type_i(st, mbx, mby, t)
            return t
        if sl == "P":
            if d.decision(("pmb", 0)):
                t = self._i_mbtype(st, mbx, mby, suffix=True)
                self._note_mb_type_i(st, mbx, mby, t)
                return 5 + t
            # Table 9-34 P prefix: '000' P_L0_16x16, '001' P_8x8,
            # '011' P_L0_L0_16x8, '010' P_L0_L0_8x16.  Bin 2's context
            # depends on bin 1 (§9.3.3.1.2); P_8x8ref0 (value 4) has no
            # CABAC binarization — it is a CAVLC-only type.
            if not d.decision(("pmb", 1)):
                t = 3 * d.decision(("pmb", 2))
            else:
                t = 2 - d.decision(("pmb", 3))
            self._note_inter(st, mbx, mby)
            return t
        # B slice (Table 9-34): '0' direct; '10x' L0/L1 16x16; '11' +
        # 4 bins v: v<8 -> 3+v (B_Bi_16x16 .. B_L1_L0_16x8), 13 intra
        # escape, 14 B_L1_L0_8x16, 15 B_8x8, 8..12 take a 5th bin ->
        # (v<<1|b)-4 (types 12..21)
        if not d.decision(("bmb", self._bmb_inc(st, mbx, mby))):
            # '0' = B_Direct_16x16 (spatial derivation, no motion syntax)
            self._note_direct(st, mbx, mby)
            return 0
        if not d.decision(("bmb", 3)):
            t = 1 + d.decision(("bmb", 5))  # '100' B_L0 / '101' B_L1
            self._note_inter(st, mbx, mby)
            return t
        v = 0
        for _ in range(4):
            v = (v << 1) | d.decision(("bmb", 5))
        if v == 13:  # '111101' intra escape
            t = self._i_mbtype(st, mbx, mby, suffix=True)
            self._note_mb_type_i(st, mbx, mby, t)
            return 23 + t
        self._note_inter(st, mbx, mby)
        if v < 8:
            return v + 3
        if v == 14:
            return 11
        if v == 15:
            return 22
        v = (v << 1) | d.decision(("bmb", 5))
        return v - 4

    def sub_mb_type(self, st, mbx, mby, sl: str) -> int:
        """Table 9-38 sub_mb_type binarization.  P: '1' P_L0_8x8, '00'
        8x4, '011' 4x8, '010' 4x4.  B: '0' Direct, '10x' L0/L1 8x8,
        '110'+2 bins types 3..6, '1110'+2 bins types 7..10, '1111'+1
        bin types 11..12.  Context keys are the repo's self-interop
        dialect families ("smbp"/"smbb", positional)."""
        d = self.d
        if sl == "P":
            if d.decision(("smbp", 0)):
                return 0
            if not d.decision(("smbp", 1)):
                return 1
            return 2 if d.decision(("smbp", 2)) else 3
        if not d.decision(("smbb", 0)):
            return 0
        if not d.decision(("smbb", 1)):
            return 1 + d.decision(("smbb", 3))
        t = 3
        if d.decision(("smbb", 2)):
            if d.decision(("smbb", 3)):
                return 11 + d.decision(("smbb", 3))
            t += 4
        t += 2 * d.decision(("smbb", 3))
        t += d.decision(("smbb", 3))
        return t

    def ref_idx(self, st, mbx, mby, n_active: int, lst: int = 0) -> int:
        # §9.3.2.4: unary binarization; bin0 ctx from the neighbour
        # refIdx conditions, bin1 inc 4, bins >= 2 inc 5
        if not self.d.decision(("ref", self._ref_inc(st, mbx, mby, lst))):
            return 0
        v = 1
        while self.d.decision(("ref", 4 if v == 1 else 5)):
            v += 1
            if v > 32:
                raise ValueError("corrupt ref_idx")
        return v

    def mvd_pair(self, st, mbx, mby, lst: int):
        dx = self.d.ueg(self._mvd_key_fn(st, mbx, mby, lst, 0), 9, 3, True)
        dy = self.d.ueg(self._mvd_key_fn(st, mbx, mby, lst, 1), 9, 3, True)
        st.mvd_l[mby, mbx, lst, 0] = abs(dx)
        st.mvd_l[mby, mbx, lst, 1] = abs(dy)
        return dx, dy

    def cbp(self, st, mbx, mby, intra: bool) -> int:
        d = self.d
        bits: list = []
        for i in range(4):
            key = self._cbp_luma_key(st, mbx, mby, i, bits)
            bits.append(d.decision(key))
        cbp_l = bits[0] | (bits[1] << 1) | (bits[2] << 2) | (bits[3] << 3)
        cbp_c = 0
        if d.decision(self._cbp_chroma_key(st, mbx, mby, 0)):
            cbp_c = 1 + d.decision(self._cbp_chroma_key(st, mbx, mby, 1))
        cbp = cbp_l | (cbp_c << 4)
        st.mb_cbp[mby, mbx] = cbp
        return cbp

    def t8_flag(self, st, mbx, mby) -> bool:
        return bool(self.d.decision(("t8", self._t8_inc(st, mbx, mby))))

    def qp_delta(self, st, mbx, mby) -> int:
        k = 0
        while self.d.decision(self._qpd_key(k)):
            k += 1
            if k > 104:
                raise ValueError("corrupt mb_qp_delta")
        self._qp_nz = k != 0
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def intra4_mode(self, st, by, bx, pred: int) -> int:
        d = self.d
        if d.decision(("i4p", 0)):
            return pred
        rem = 0
        for _ in range(3):
            rem = (rem << 1) | d.decision(("i4r", 0))
        return rem if rem < pred else rem + 1

    def chroma_mode(self, st, mbx, mby) -> int:
        inc = self._cmode_inc(st, mbx, mby)
        m = self.d.tu(
            lambda i: ("cmode", inc if i == 0 else 3), 3
        )
        st.mb_cmode[mby, mbx] = m
        return m

    def pcm_samples(self, st, mbx, mby):
        raise NotImplementedError("I_PCM under CABAC not supported")

    # residual blocks ------------------------------------------------------
    def _residual(self, st, cat: int, mbx, mby, by, bx, comp) -> list:
        d = self.d
        max_n = _CAT_MAX[cat]
        if cat != _CAT_LUMA8:
            # ctxBlockCat 5 (luma 8x8) codes NO coded_block_flag: the
            # cbp luma bit already implies the block is coded (§7.4.5.3.3)
            inc = self._cbf_inc(st, cat, mbx, mby, by, bx, comp)
            if not d.decision(("cbf", cat, inc)):
                return [0] * max_n
        sig = []
        last_seen = False
        for i in range(max_n - 1):
            skey = _sig_key8(i) if cat == _CAT_LUMA8 else ("sig", cat, i)
            if d.decision(skey):
                sig.append(i)
                lkey = (_last_key8(i) if cat == _CAT_LUMA8
                        else ("last", cat, i))
                if d.decision(lkey):
                    last_seen = True
                    break
        if not last_seen:
            sig.append(max_n - 1)
        out = [0] * max_n
        num_eq1 = num_gt1 = 0
        for pos in reversed(sig):
            inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
            incp = 5 + min(4, num_gt1)

            def kf(i, a=inc0, b=incp):
                return ("lvl", cat, a) if i == 0 else ("lvlp", cat, b)

            m1 = d.ueg(kf, 14, 0, False)
            level = m1 + 1
            if d.bypass():
                level = -level
            out[pos] = level
            if m1 == 0:
                num_eq1 += 1
            else:
                num_gt1 += 1
        return out

    def res_luma_dc16(self, st, mbx, mby) -> list:
        cf = self._residual(st, _CAT_LUMA_DC, mbx, mby, 0, 0, 0)
        st.cbf_ydc[mby, mbx] = 1 if any(cf) else 0
        return cf

    def res_luma(self, st, by, bx, ac: bool) -> list:
        cat = _CAT_LUMA_AC if ac else _CAT_LUMA4
        return self._residual(st, cat, bx // 4, by // 4, by, bx, 0)

    def res_luma8(self, st, by, bx) -> list:
        """One luma 8x8 block (ctxBlockCat 5), 64 coefficients in 8x8
        zig-zag order; (by, bx) are the 4x4-grid coords of its top-left
        quarter."""
        return self._residual(st, _CAT_LUMA8, bx // 4, by // 4, by, bx, 0)

    def res_chroma_dc(self, st, comp, mbx, mby) -> list:
        cf = self._residual(st, _CAT_CHROMA_DC, mbx, mby, 0, 0, comp)
        st.cbf_cdc[comp, mby, mbx] = 1 if any(cf) else 0
        return cf

    def res_chroma_ac(self, st, comp, cby, cbx) -> list:
        return self._residual(
            st, _CAT_CHROMA_AC, cbx // 2, cby // 2, cby, cbx, comp
        )


class CabacWriter(_CtxSide):
    """CABAC syntax-element writer, exact mirror of :class:`CabacReader`
    (same context keys, same grid bookkeeping, same bin order)."""

    cabac = True

    def __init__(self):
        self.e = CabacEncoder()
        self._prev_qp_nz = False
        self._qp_nz = False
        self._cur_intra = False

    # slice-loop surface -------------------------------------------------
    def begin_mb(self, st, mbx, mby) -> None:
        self._qp_nz = False

    def end_mb(self, st, mbx, mby) -> None:
        self._prev_qp_nz = self._qp_nz

    def write_skip(self, st, mbx, mby, is_b: bool, skipped: bool) -> None:
        fam = "skip_b" if is_b else "skip_p"
        self.e.decision((fam, self._skip_inc(st, mbx, mby)),
                        1 if skipped else 0)
        if skipped:
            st.mb_kind[mby, mbx] = MB_SKIP
            st.mb_cbp[mby, mbx] = 0
            self._cur_intra = False

    def end_of_slice(self, last: bool) -> None:
        self.e.terminate(1 if last else 0)

    def bytes(self) -> bytes:
        return self.e.bytes()

    # macroblock-walk surface ---------------------------------------------
    def _i_mbtype(self, st, mbx, mby, suffix: bool, t: int) -> None:
        e = self.e
        if t == 25:
            raise NotImplementedError("I_PCM under CABAC not supported")
        key0 = ("imb_sfx", 0) if suffix else (
            "imb", self._imb_inc(st, mbx, mby))
        if t == 0:
            e.decision(key0, 0)
            return
        e.decision(key0, 1)
        e.terminate(0)  # not I_PCM
        v = t - 1
        cbp_l = 1 if v >= 12 else 0
        cbp_c = (v // 4) % 3
        pm = v % 4
        e.decision(("imb16", 0), cbp_l)
        if cbp_c == 0:
            e.decision(("imb16", 1), 0)
        else:
            e.decision(("imb16", 1), 1)
            e.decision(("imb16", 2), cbp_c - 1)
        e.decision(("imb16", 3), (pm >> 1) & 1)
        e.decision(("imb16", 4), pm & 1)

    def mb_type(self, st, mbx, mby, sl: str, t: int) -> None:
        e = self.e
        if sl == "I":
            self._i_mbtype(st, mbx, mby, False, t)
            self._note_mb_type_i(st, mbx, mby, t)
            return
        if sl == "P":
            if t >= 5:
                e.decision(("pmb", 0), 1)
                self._i_mbtype(st, mbx, mby, True, t - 5)
                self._note_mb_type_i(st, mbx, mby, t - 5)
                return
            # Table 9-34 P prefix (mirror of CabacReader.mb_type);
            # P_8x8ref0 (4) has no CABAC binarization
            assert 0 <= t <= 3, "P mb_type 4 (P_8x8ref0) is CAVLC-only"
            e.decision(("pmb", 0), 0)
            if t in (0, 3):
                e.decision(("pmb", 1), 0)
                e.decision(("pmb", 2), 1 if t == 3 else 0)
            else:
                e.decision(("pmb", 1), 1)
                e.decision(("pmb", 3), 1 if t == 1 else 0)
            self._note_inter(st, mbx, mby)
            return
        # B slice
        if t >= 23:
            for key, bit in ((("bmb", self._bmb_inc(st, mbx, mby)), 1),
                             (("bmb", 3), 1), (("bmb", 5), 1),
                             (("bmb", 5), 1), (("bmb", 5), 0),
                             (("bmb", 5), 1)):
                e.decision(key, bit)  # '111101' intra escape
            self._i_mbtype(st, mbx, mby, True, t - 23)
            self._note_mb_type_i(st, mbx, mby, t - 23)
            return
        if t == 0:  # B_Direct_16x16: single '0' bin
            e.decision(("bmb", self._bmb_inc(st, mbx, mby)), 0)
            self._note_direct(st, mbx, mby)
            return
        if t in (1, 2):
            e.decision(("bmb", self._bmb_inc(st, mbx, mby)), 1)
            e.decision(("bmb", 3), 0)
            e.decision(("bmb", 5), t - 1)
        else:
            # '11' + 4 bins (+ a 5th for types 12..21) — mirror of the
            # reader's Table 9-34 tree
            e.decision(("bmb", self._bmb_inc(st, mbx, mby)), 1)
            e.decision(("bmb", 3), 1)
            if 3 <= t <= 10:
                bits, n = t - 3, 4
            elif t == 11:
                bits, n = 14, 4
            elif t == 22:
                bits, n = 15, 4
            else:  # 12..21
                bits, n = t + 4, 5
            for shift in range(n - 1, -1, -1):
                e.decision(("bmb", 5), (bits >> shift) & 1)
        self._note_inter(st, mbx, mby)

    def sub_mb_type(self, st, mbx, mby, sl: str, t: int) -> None:
        """Mirror of CabacReader.sub_mb_type (Table 9-38)."""
        e = self.e
        if sl == "P":
            if t == 0:
                e.decision(("smbp", 0), 1)
                return
            e.decision(("smbp", 0), 0)
            if t == 1:
                e.decision(("smbp", 1), 0)
                return
            e.decision(("smbp", 1), 1)
            e.decision(("smbp", 2), 1 if t == 2 else 0)
            return
        if t == 0:
            e.decision(("smbb", 0), 0)
            return
        e.decision(("smbb", 0), 1)
        if t in (1, 2):
            e.decision(("smbb", 1), 0)
            e.decision(("smbb", 3), t - 1)
            return
        e.decision(("smbb", 1), 1)
        if 3 <= t <= 6:
            e.decision(("smbb", 2), 0)
            v = t - 3
        elif 7 <= t <= 10:
            e.decision(("smbb", 2), 1)
            e.decision(("smbb", 3), 0)
            v = t - 7
        else:  # 11, 12
            e.decision(("smbb", 2), 1)
            e.decision(("smbb", 3), 1)
            e.decision(("smbb", 3), t - 11)
            return
        e.decision(("smbb", 3), (v >> 1) & 1)
        e.decision(("smbb", 3), v & 1)

    def ref_idx(self, st, mbx, mby, n_active: int, v: int,
                lst: int = 0) -> None:
        # unary mirror of CabacReader.ref_idx
        inc0 = self._ref_inc(st, mbx, mby, lst)
        if v == 0:
            self.e.decision(("ref", inc0), 0)
            return
        self.e.decision(("ref", inc0), 1)
        for k in range(1, v):
            self.e.decision(("ref", 4 if k == 1 else 5), 1)
        self.e.decision(("ref", 4 if v == 1 else 5), 0)

    def mvd_pair(self, st, mbx, mby, lst: int, mvd) -> None:
        dx, dy = int(mvd[0]), int(mvd[1])
        self.e.ueg(self._mvd_key_fn(st, mbx, mby, lst, 0), 9, 3, True, dx)
        self.e.ueg(self._mvd_key_fn(st, mbx, mby, lst, 1), 9, 3, True, dy)
        st.mvd_l[mby, mbx, lst, 0] = abs(dx)
        st.mvd_l[mby, mbx, lst, 1] = abs(dy)

    def cbp(self, st, mbx, mby, intra: bool, cbp: int) -> None:
        e = self.e
        bits: list = []
        for i in range(4):
            key = self._cbp_luma_key(st, mbx, mby, i, bits)
            bit = (cbp >> i) & 1
            e.decision(key, bit)
            bits.append(bit)
        cbp_c = cbp >> 4
        if cbp_c == 0:
            e.decision(self._cbp_chroma_key(st, mbx, mby, 0), 0)
        else:
            e.decision(self._cbp_chroma_key(st, mbx, mby, 0), 1)
            e.decision(self._cbp_chroma_key(st, mbx, mby, 1), cbp_c - 1)
        st.mb_cbp[mby, mbx] = cbp

    def t8_flag(self, st, mbx, mby, v: bool) -> None:
        self.e.decision(("t8", self._t8_inc(st, mbx, mby)), 1 if v else 0)

    def qp_delta(self, st, mbx, mby, dqp: int) -> None:
        k = 2 * dqp - 1 if dqp > 0 else -2 * dqp
        for i in range(k):
            self.e.decision(self._qpd_key(i), 1)
        self.e.decision(self._qpd_key(k), 0)
        self._qp_nz = k != 0

    def intra4_mode(self, st, by, bx, pred: int, mode: int) -> None:
        e = self.e
        if mode == pred:
            e.decision(("i4p", 0), 1)
            return
        e.decision(("i4p", 0), 0)
        rem = mode if mode < pred else mode - 1
        for shift in (2, 1, 0):
            e.decision(("i4r", 0), (rem >> shift) & 1)

    def chroma_mode(self, st, mbx, mby, mode: int) -> None:
        inc = self._cmode_inc(st, mbx, mby)
        self.e.tu(lambda i: ("cmode", inc if i == 0 else 3), 3, mode)
        st.mb_cmode[mby, mbx] = mode

    def pcm_samples(self, st, mbx, mby, lum, cbs, crs) -> None:
        raise NotImplementedError("I_PCM under CABAC not supported")

    # residual blocks ------------------------------------------------------
    def _residual(self, st, cat: int, mbx, mby, by, bx, comp,
                  zz: list) -> int:
        e = self.e
        max_n = _CAT_MAX[cat]
        vals = list(zz) + [0] * (max_n - len(zz))
        sig = [i for i, v in enumerate(vals) if v]
        if cat == _CAT_LUMA8:
            # no coded_block_flag (see the reader); the caller only emits
            # a luma 8x8 block whose cbp bit is set, i.e. non-empty
            assert sig, "luma 8x8 residual must carry coefficients"
        else:
            inc = self._cbf_inc(st, cat, mbx, mby, by, bx, comp)
            if not sig:
                e.decision(("cbf", cat, inc), 0)
                return 0
            e.decision(("cbf", cat, inc), 1)
        last = sig[-1]
        for i in range(max_n - 1):
            if i > last:
                break
            is_sig = 1 if vals[i] else 0
            skey = _sig_key8(i) if cat == _CAT_LUMA8 else ("sig", cat, i)
            e.decision(skey, is_sig)
            if is_sig:
                lkey = (_last_key8(i) if cat == _CAT_LUMA8
                        else ("last", cat, i))
                e.decision(lkey, 1 if i == last else 0)
        num_eq1 = num_gt1 = 0
        for pos in reversed(sig):
            inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
            incp = 5 + min(4, num_gt1)

            def kf(i, a=inc0, b=incp):
                return ("lvl", cat, a) if i == 0 else ("lvlp", cat, b)

            v = int(vals[pos])
            m1 = abs(v) - 1
            e.ueg(kf, 14, 0, False, m1)
            e.bypass(1 if v < 0 else 0)
            if m1 == 0:
                num_eq1 += 1
            else:
                num_gt1 += 1
        return len(sig)

    def res_luma_dc16(self, st, mbx, mby, zz: list) -> int:
        tc = self._residual(st, _CAT_LUMA_DC, mbx, mby, 0, 0, 0, zz)
        st.cbf_ydc[mby, mbx] = 1 if tc else 0
        return tc

    def res_luma(self, st, by, bx, ac: bool, zz: list) -> int:
        cat = _CAT_LUMA_AC if ac else _CAT_LUMA4
        return self._residual(st, cat, bx // 4, by // 4, by, bx, 0, zz)

    def res_luma8(self, st, by, bx, zz: list) -> int:
        return self._residual(st, _CAT_LUMA8, bx // 4, by // 4, by, bx, 0,
                              zz)

    def res_chroma_dc(self, st, comp, mbx, mby, zz: list) -> int:
        tc = self._residual(st, _CAT_CHROMA_DC, mbx, mby, 0, 0, comp, zz)
        st.cbf_cdc[comp, mby, mbx] = 1 if tc else 0
        return tc

    def res_chroma_ac(self, st, comp, cby, cbx, zz: list) -> int:
        return self._residual(
            st, _CAT_CHROMA_AC, cbx // 2, cby // 2, cby, cbx, comp, zz
        )
