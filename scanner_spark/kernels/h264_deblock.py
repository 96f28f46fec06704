"""H.264 in-loop deblocking filter (ITU-T H.264 §8.7), shared by the
encoder and decoder in :mod:`scanner_spark.kernels.h264`.

Reference parity: the reference engine delegates deblocking to its
hardware/ffmpeg decoders (``scanner/video/decoder_automata.cpp``,
``scanner/video/software/software_video_decoder.cpp``); this module is the
corresponding conformance stage for the in-repo pure-Python codec, so
streams that signal ``disable_deblocking_filter_idc != 1`` reconstruct with
the loop filter instead of refusing (the pre-round-11 behaviour).

Scope and structure follow §8.7 for progressive 4:2:0 frames at this
codec's partition scope (16x16 MB partitions, one MV set per MB per list):

- per-MB raster order; per MB: luma vertical edges left-to-right, luma
  horizontal edges top-to-bottom, then the chroma edges (0 and 2 of the
  luma grid) — later edges read samples already modified by earlier ones,
  exactly the sample-recursion §8.7 specifies;
- boundary strength (§8.7.2.1): 4 intra at an MB edge, 3 intra elsewhere,
  2 when either 4x4 block carries residual levels, 1 on reference or
  >=1-integer-pel motion differences, else 0 (unfiltered);
- sample filtering (§8.7.2.3-4): the bS<4 clipped-delta filter with the
  ap/aq luma extra taps, and the bS=4 strong/weak filter pair.

TABLE PROVENANCE — read before trusting conformance: no copy of the spec
text or of a conformant decoder exists in this environment, so the three
threshold tables are transcribed from memory of the published standard
(Table 8-16/8-17, widely reprinted, e.g. Wiegand/Sullivan/Bjontegaard/
Luthra, IEEE TCSVT 2003):

- ``ALPHA``  — direct recall of the published Table 8-16 values,
  structurally cross-checked against the approximate closed form
  ``round(0.8 * (2^(idx/6) - 1))`` (clipped to 255): the form tracks the
  table to within a few counts everywhere (e.g. the table's 226 at index
  49 vs the form's 229), so the check validates the shape, not each cell.
- ``BETA``   — high-confidence recall of the published ramp (the
  characteristic ``4,4,4,6`` skip-5 step included); structurally checked
  (monotone, zero below index 16, endpoint 18).
- ``TC0``    — BEST-EFFORT: the low-index head (<= 35) is direct recall;
  indices 36..51 are log-space interpolated between the recalled index-35
  cells and the recalled endpoints (13, 17, 25) at index 51, which
  reproduces the table's documented geometric growth but may differ from
  Table 8-17 by +-1 in some mid-range cells.

Because the encoder and decoder share THIS module, in-repo round trips are
bit-exact regardless of cell-level conformance.  Decoding a FOREIGN
conformant stream with these tables may therefore differ from a normative
decoder by small per-edge clipping amounts — accepted and documented here
(the alternative, refusing every deblocked stream, blocked all real-world
baseline CAVLC mp4s; see VERDICT r10 item 2).
"""

from __future__ import annotations

import numpy as np

# --- Table 8-16: alpha / beta thresholds, indexed by Clip3(0,51,qp+off) ---

ALPHA = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
       32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
       162, 182, 203, 226, 255, 255],
    dtype=np.int64,
)

BETA = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
       9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
       16, 16, 17, 17, 18, 18],
    dtype=np.int64,
)


def _tc0_tail(v35: int, v51: int) -> list[int]:
    """Log-space interpolation for TC0 indices 36..51 (see module
    docstring's provenance note)."""
    lo, hi = np.log(max(v35, 1)), np.log(v51)
    out = []
    prev = v35
    for i in range(36, 52):
        v = int(round(float(np.exp(lo + (hi - lo) * (i - 35) / 16.0))))
        v = max(v, prev)  # enforce monotone
        out.append(v)
        prev = v
    out[-1] = v51
    return out


# --- Table 8-17: tc0 clipping, rows = indexA 0..51, cols = bS 1..3 ---

_TC0_HEAD = {
    # indexA: (bS1, bS2, bS3) — direct recall for the small-value head
    17: (0, 0, 1), 18: (0, 0, 1), 19: (0, 0, 1), 20: (0, 0, 1),
    21: (0, 0, 1), 22: (0, 1, 1), 23: (0, 1, 1), 24: (1, 1, 1),
    25: (1, 1, 1), 26: (1, 1, 1), 27: (1, 1, 1), 28: (1, 1, 1),
    29: (1, 1, 1), 30: (1, 1, 2), 31: (1, 1, 2), 32: (1, 2, 2),
    33: (1, 2, 2), 34: (1, 2, 3), 35: (1, 2, 3),
}

TC0 = np.zeros((52, 3), dtype=np.int64)
for _i, _v in _TC0_HEAD.items():
    TC0[_i] = _v
for _c, _end in enumerate((13, 17, 25)):
    TC0[36:52, _c] = _tc0_tail(int(TC0[35, _c]), _end)
del _i, _v, _c, _end


def _clip3(lo, hi, v):
    return np.minimum(np.maximum(v, lo), hi)


def _mb_motion(st, mby: int, mbx: int):
    """(is_intra, uses_lists(2,), mvs(2,2), refs(2,)) for one decoded MB
    from the legacy per-MB summaries (hand-built test states only;
    recorded states go through :func:`_blk_motion`).  P-coded MBs
    present as list-0-only."""
    u = st.use_l[mby, mbx]
    # unset ref_l on used lists reads as refIdx 0 (legacy-populated
    # states; mirrors _FrameState._blk_motion)
    refs = np.maximum(st.ref_l[mby, mbx], 0)
    if u.any():
        return False, u.copy(), st.mv_l[mby, mbx].copy(), refs
    if st.mb_inter[mby, mbx]:
        mvs = np.zeros((2, 2), dtype=np.int64)
        mvs[0] = st.mv[mby, mbx]
        return False, np.array([True, False]), mvs, refs
    return (True, np.array([False, False]),
            np.zeros((2, 2), dtype=np.int64), refs.copy())


def _blk_motion(st, by: int, bx: int):
    """(is_intra, uses_lists(2,), mvs(2,2), refs(2,)) for one 4x4 block
    — the §8.7.2.1 bS derivation's motion view at sub-MB-partition
    granularity (round 14).  States never touched by record_motion fall
    back to the per-MB summaries."""
    mby, mbx = by >> 2, bx >> 2
    rec4 = getattr(st, "rec4", None)
    if rec4 is None or not rec4[mby, mbx]:
        return _mb_motion(st, mby, mbx)
    u = st.use4[by, bx]
    if u.any():
        return (False, u.copy(), st.mv4[by, bx].copy(),
                np.maximum(st.ref4[by, bx], 0))
    return (True, u.copy(), np.zeros((2, 2), dtype=np.int64),
            np.zeros(2, dtype=np.int64))


def _nz_any(st, by: int, bx: int) -> bool:
    """Does the 4x4 block carry residual levels, for the bS=2 test?  In a
    transform_size_8x8 MB the CODED unit is the covering 8x8 block, so
    its status applies to every 4x4 it covers (under CAVLC the per-4x4
    nzy holds the interleaved SUB-BLOCK TotalCoeff for nC purposes — a
    zero sub-count inside a coded 8x8 must still deblock as coded)."""
    t8 = getattr(st, "mb_t8", None)
    if t8 is not None and t8[by // 4, bx // 4]:
        b0y, b0x = (by >> 1) << 1, (bx >> 1) << 1
        return int(st.nzy[b0y : b0y + 2, b0x : b0x + 2].max()) > 0
    return st.nzy[by, bx] > 0


def _bs_group(st, pmby, pmbx, qmby, qmbx, pby, pbx, qby, qbx,
              mb_edge: bool) -> int:
    """Boundary strength for one 4-sample edge group (§8.7.2.1 at
    4x4-block granularity — sub-MB partitions give internal edges real
    motion differences; within one picture a (list, ref_idx) pair
    denotes the same reference picture for every slice, so list-usage +
    ref-index equality stands in for reference-picture equality)."""
    p_intra, pu, pmv, pref = _blk_motion(st, pby, pbx)
    q_intra, qu, qmv, qref = _blk_motion(st, qby, qbx)
    if p_intra or q_intra:
        return 4 if mb_edge else 3
    if _nz_any(st, pby, pbx) or _nz_any(st, qby, qbx):
        return 2
    if not np.array_equal(pu, qu):
        return 1  # different number of MVs
    for lst in range(2):
        if pu[lst] and pref[lst] != qref[lst]:
            return 1  # different reference pictures
    for lst in range(2):
        if pu[lst] and np.abs(pmv[lst] - qmv[lst]).max() >= 4:
            return 1
    return 0


def _filter_luma_edge(S: np.ndarray, bs: np.ndarray, alpha: int, beta: int,
                      tc0_row: np.ndarray) -> np.ndarray:
    """§8.7.2.3/8.7.2.4 luma filtering of one edge.  ``S`` is (N, 8)
    int64 lines [p3 p2 p1 p0 q0 q1 q2 q3]; ``bs`` is per-line strength;
    ``tc0_row`` is TC0[indexA] (bS 1..3).  Returns the filtered copy."""
    p3, p2, p1, p0 = S[:, 0], S[:, 1], S[:, 2], S[:, 3]
    q0, q1, q2, q3 = S[:, 4], S[:, 5], S[:, 6], S[:, 7]
    out = S.copy()
    filt = (
        (bs > 0)
        & (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    if not filt.any():
        return out
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta

    weak = filt & (bs < 4)
    if weak.any():
        tc0 = np.where(bs >= 1, tc0_row[np.clip(bs, 1, 3) - 1], 0)
        tc = tc0 + ap.astype(np.int64) + aq.astype(np.int64)
        delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
        np0 = np.clip(p0 + delta, 0, 255)
        nq0 = np.clip(q0 - delta, 0, 255)
        np1 = p1 + _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
        nq1 = q1 + _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
        out[:, 3] = np.where(weak, np0, out[:, 3])
        out[:, 4] = np.where(weak, nq0, out[:, 4])
        out[:, 2] = np.where(weak & ap, np1, out[:, 2])
        out[:, 5] = np.where(weak & aq, nq1, out[:, 5])

    strong = filt & (bs == 4)
    if strong.any():
        close = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        sp = strong & ap & close
        sq = strong & aq & close
        out[:, 3] = np.where(
            strong,
            np.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                     (2 * p1 + p0 + q1 + 2) >> 2),
            out[:, 3],
        )
        out[:, 2] = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, out[:, 2])
        out[:, 1] = np.where(
            sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, out[:, 1]
        )
        out[:, 4] = np.where(
            strong,
            np.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                     (2 * q1 + q0 + p1 + 2) >> 2),
            out[:, 4],
        )
        out[:, 5] = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, out[:, 5])
        out[:, 6] = np.where(
            sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, out[:, 6]
        )
    return out


def _filter_chroma_edge(S: np.ndarray, bs: np.ndarray, alpha: int,
                        beta: int, tc0_row: np.ndarray) -> np.ndarray:
    """Chroma filtering of one edge: only p0/q0 move (§8.7.2.3's chroma
    branch; tc = tc0 + 1, and the bS=4 form is the weak 3-tap)."""
    p1, p0, q0, q1 = S[:, 0], S[:, 1], S[:, 2], S[:, 3]
    out = S.copy()
    filt = (
        (bs > 0)
        & (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    if not filt.any():
        return out
    weak = filt & (bs < 4)
    if weak.any():
        tc = np.where(bs >= 1, tc0_row[np.clip(bs, 1, 3) - 1], 0) + 1
        delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
        out[:, 1] = np.where(weak, np.clip(p0 + delta, 0, 255), out[:, 1])
        out[:, 2] = np.where(weak, np.clip(q0 - delta, 0, 255), out[:, 2])
    strong = filt & (bs == 4)
    if strong.any():
        out[:, 1] = np.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, out[:, 1])
        out[:, 2] = np.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, out[:, 2])
    return out


def _edge_bs(st, mby: int, mbx: int, edge: int, vertical: bool) -> np.ndarray:
    """Per-4x4-group boundary strengths (4,) for one luma edge of MB
    (mbx, mby): ``edge`` 0..3, vertical edges at x = 16*mbx + 4*edge."""
    bs = np.zeros(4, dtype=np.int64)
    for k in range(4):
        if vertical:
            qby, qbx = mby * 4 + k, mbx * 4 + edge
            pby, pbx = qby, qbx - 1
        else:
            qby, qbx = mby * 4 + edge, mbx * 4 + k
            pby, pbx = qby - 1, qbx
        pmby, pmbx = pby // 4, pbx // 4
        bs[k] = _bs_group(
            st, pmby, pmbx, mby, mbx, pby, pbx, qby, qbx, edge == 0
        )
    return bs


def deblock_picture(st, slice_params: dict, chroma_qp_offset: int = 0,
                    chroma_qp_fn=None) -> None:
    """Filter ``st``'s reconstruction planes in place.

    ``slice_params`` maps slice index -> (disable_idc, alpha_off,
    beta_off) from that slice's header (§7.3.3: offsets are the
    *_div2 syntax values doubled by the caller).  ``st.mb_qp`` and
    ``st.slice_no`` must be populated for every MB.  ``chroma_qp_fn``
    maps luma QP -> QPc (defaults to h264.chroma_qp to avoid a cyclic
    import)."""
    if chroma_qp_fn is None:
        from scanner_spark.kernels.h264 import chroma_qp as chroma_qp_fn
    mbw, mbh = st.mbw, st.mbh
    # hoisted out of the raster scan (ADVICE r12): the helpers close over
    # st's arrays once; per-MB values (qp_q, idc, si, cqp_q) are plain
    # locals rebound each iteration, not re-created closures
    pcm = getattr(st, "mb_pcm", None)
    mb_qp_arr = st.mb_qp
    slice_no = st.slice_no

    def mbqp(pmby, pmbx):
        # §8.7: I_PCM macroblocks contribute qP = 0 to the
        # alpha/beta/tc0 lookups, not the running slice QP.
        if pcm is not None and pcm[pmby, pmbx]:
            return 0
        return int(mb_qp_arr[pmby, pmbx])

    def qpair(pmby, pmbx, qp_q):
        return (mbqp(pmby, pmbx) + qp_q + 1) >> 1

    def boundary_ok(pmby, pmbx, idc, si):
        if idc == 2 and slice_no[pmby, pmbx] != si:
            return False  # §8.7: no filtering across slice edges
        return True

    def cqpav_for(e, pmby, pmbx, cqp_q):
        if e != 0:
            return cqp_q
        qp_p = chroma_qp_fn(min(max(
            mbqp(pmby, pmbx) + chroma_qp_offset, 0), 51))
        return (qp_p + cqp_q + 1) >> 1

    for mby in range(mbh):
        for mbx in range(mbw):
            si = int(slice_no[mby, mbx])
            idc, off_a, off_b = slice_params.get(si, (0, 0, 0))
            if idc == 1:
                continue
            qp_q = mbqp(mby, mbx)
            ox, oy = mbx * 16, mby * 16

            # §8.7: a transform_size_8x8 MB's luma transform edges are
            # the 8x8 grid — internal 4-offset edges (1 and 3) are not
            # filtered; the MB edge (0) and the 8-offset edge (2) are
            t8g = getattr(st, "mb_t8", None)
            t8_mb = t8g is not None and bool(t8g[mby, mbx])

            # --- luma vertical edges ---
            for e in range(4):
                if t8_mb and e in (1, 3):
                    continue
                if e == 0:
                    if mbx == 0 or not boundary_ok(mby, mbx - 1, idc, si):
                        continue
                    qpav = qpair(mby, mbx - 1, qp_q)
                else:
                    qpav = qp_q
                idx_a = min(max(qpav + off_a, 0), 51)
                idx_b = min(max(qpav + off_b, 0), 51)
                alpha, beta = int(ALPHA[idx_a]), int(BETA[idx_b])
                if alpha == 0 or beta == 0:
                    continue
                bs4 = _edge_bs(st, mby, mbx, e, True)
                if not bs4.any():
                    continue
                x = ox + 4 * e
                S = st.y[oy : oy + 16, x - 4 : x + 4]
                st.y[oy : oy + 16, x - 4 : x + 4] = _filter_luma_edge(
                    S.astype(np.int64), np.repeat(bs4, 4), alpha, beta,
                    TC0[idx_a],
                )
            # --- luma horizontal edges ---
            for e in range(4):
                if t8_mb and e in (1, 3):
                    continue
                if e == 0:
                    if mby == 0 or not boundary_ok(mby - 1, mbx, idc, si):
                        continue
                    qpav = qpair(mby - 1, mbx, qp_q)
                else:
                    qpav = qp_q
                idx_a = min(max(qpav + off_a, 0), 51)
                idx_b = min(max(qpav + off_b, 0), 51)
                alpha, beta = int(ALPHA[idx_a]), int(BETA[idx_b])
                if alpha == 0 or beta == 0:
                    continue
                bs4 = _edge_bs(st, mby, mbx, e, False)
                if not bs4.any():
                    continue
                yy = oy + 4 * e
                S = st.y[yy - 4 : yy + 4, ox : ox + 16].T
                st.y[yy - 4 : yy + 4, ox : ox + 16] = _filter_luma_edge(
                    S.astype(np.int64), np.repeat(bs4, 4), alpha, beta,
                    TC0[idx_a],
                ).T
            # --- chroma edges (4:2:0: luma edges 0 and 2) ---
            # §8.7 ordering: ALL vertical chroma edges left-to-right,
            # THEN the horizontal ones (matching the luma pass above);
            # interleaving them changes the sample recursion where a
            # vertical and a horizontal edge both trigger near their
            # intersection (ADVICE r11).
            cqp_q = chroma_qp_fn(
                min(max(qp_q + chroma_qp_offset, 0), 51)
            )
            cx0, cy0 = ox // 2, oy // 2

            for e in (0, 2):
                # vertical chroma edge at cx0 + 2*e
                if e == 0 and (mbx == 0 or not boundary_ok(mby, mbx - 1, idc, si)):
                    continue
                cqpav = cqpav_for(e, mby, mbx - 1, cqp_q)
                idx_a = min(max(cqpav + off_a, 0), 51)
                idx_b = min(max(cqpav + off_b, 0), 51)
                alpha, beta = int(ALPHA[idx_a]), int(BETA[idx_b])
                if alpha == 0 or beta == 0:
                    continue
                bs4 = _edge_bs(st, mby, mbx, e, True)
                if not bs4.any():
                    continue
                cx = cx0 + 2 * e
                bs8 = np.repeat(bs4, 2)
                for plane in (st.cb, st.cr):
                    S = plane[cy0 : cy0 + 8, cx - 2 : cx + 2]
                    plane[cy0 : cy0 + 8, cx - 2 : cx + 2] = (
                        _filter_chroma_edge(
                            S.astype(np.int64), bs8, alpha, beta,
                            TC0[idx_a],
                        )
                    )
            for e in (0, 2):
                # horizontal chroma edge at cy0 + 2*e
                if e == 0 and (mby == 0 or not boundary_ok(mby - 1, mbx, idc, si)):
                    continue
                cqpav = cqpav_for(e, mby - 1, mbx, cqp_q)
                idx_a = min(max(cqpav + off_a, 0), 51)
                idx_b = min(max(cqpav + off_b, 0), 51)
                alpha, beta = int(ALPHA[idx_a]), int(BETA[idx_b])
                if alpha == 0 or beta == 0:
                    continue
                bs4 = _edge_bs(st, mby, mbx, e, False)
                if not bs4.any():
                    continue
                cy = cy0 + 2 * e
                bs8 = np.repeat(bs4, 2)
                for plane in (st.cb, st.cr):
                    S = plane[cy - 2 : cy + 2, cx0 : cx0 + 8].T
                    plane[cy - 2 : cy + 2, cx0 : cx0 + 8] = (
                        _filter_chroma_edge(
                            S.astype(np.int64), bs8, alpha, beta,
                            TC0[idx_a],
                        ).T
                    )
