"""In-loop deblocking filter (kernels/h264_deblock.py, §8.7): table
structure, encoder/decoder round-trip exactness with the filter active
(the conformance property available in this environment — provenance note
in the module docstring), GOP-chain drift, and mp4 end-to-end.

Reference parity: the reference delegates deblocking to its decoders
(scanner/video/software/software_video_decoder.cpp); here the in-repo
codec must reconstruct deblocked streams instead of refusing them."""

import numpy as np
import pytest

from scanner_spark.kernels import h264 as H
from scanner_spark.kernels import h264_deblock as D


# ---------------------------------------------------------------------------
# threshold tables: structural invariants
# ---------------------------------------------------------------------------


def test_alpha_matches_published_closed_form():
    # ALPHA approximates round(0.8 * (2^(i/6) - 1)) clipped to [0, 255],
    # zero below index 16 — the documented construction of Table 8-16's
    # alpha column; the published table itself rounds a few tail cells
    # slightly differently (e.g. 226 at index 49 vs the formula's 229),
    # so this is a drift check, not a definition
    for i in range(52):
        expect = int(round(0.8 * (2 ** (i / 6.0) - 1)))
        expect = min(expect, 255)
        if i < 16:
            assert D.ALPHA[i] == 0
        else:
            assert abs(int(D.ALPHA[i]) - expect) <= 3, (i, D.ALPHA[i], expect)
    assert D.ALPHA[51] == 255
    assert (np.diff(D.ALPHA) >= 0).all()


def test_beta_and_tc0_structure():
    assert D.BETA.shape == (52,) and D.TC0.shape == (52, 3)
    assert (D.BETA[:16] == 0).all() and (D.TC0[:17] == 0).all()
    assert D.BETA[51] == 18
    assert list(D.TC0[51]) == [13, 17, 25]  # recalled endpoints
    # monotone non-decreasing in qp index and in bS
    assert (np.diff(D.BETA) >= 0).all()
    assert (np.diff(D.TC0, axis=0) >= 0).all()
    assert (np.diff(D.TC0, axis=1) >= 0).all()
    # tc0 never exceeds alpha (clipping bound sanity)
    assert (D.TC0.max(axis=1) <= np.maximum(D.ALPHA, 1)).all()


def test_filter_inactive_below_qp16():
    # indexA < 16 -> alpha == 0 -> §8.7 filtering disabled entirely
    y = np.random.RandomState(0).randint(0, 256, (32, 32)).astype(np.uint8)
    c = np.full((16, 16), 90, np.uint8)
    _, st_on = H.encode_slice(y, c, c, qp=12)
    rb, st_dbl = H.encode_picture_i(*H.pad_planes(y, c, c), qp=12,
                                    deblock=True)
    assert np.array_equal(st_on.y, st_dbl.y)
    assert np.array_equal(st_on.cb, st_dbl.cb)


# ---------------------------------------------------------------------------
# encoder recon == decoder recon with the filter ACTIVE
# ---------------------------------------------------------------------------


def _mk(seed, h=32, w=48):
    rng = np.random.RandomState(seed)

    def smooth(a):
        a = a.astype(np.int64)
        return ((a + np.roll(a, 1, 0) + np.roll(a, 1, 1)) // 3).astype(
            np.uint8
        )

    return (
        smooth(rng.randint(0, 256, (h, w)).astype(np.uint8)),
        smooth(rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)),
        smooth(rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)),
    )


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
@pytest.mark.parametrize("slices", [1, 2])
def test_deblocked_idr_round_trip_exact(entropy, slices):
    y, cb, cr = _mk(3)
    rbsps, est = H.encode_picture_i(
        *H.pad_planes(y, cb, cr), qp=32, entropy=entropy, slices=slices,
        deblock=True,
    )
    # the filter must actually fire at qp 32 on this content
    rb_off, est_off = H.encode_picture_i(
        *H.pad_planes(y, cb, cr), qp=32, entropy=entropy, slices=slices,
    )
    assert not np.array_equal(est.y, est_off.y)
    sps = H.parse_sps(H.write_sps(48, 32))
    pps = H.parse_pps(H.write_pps(32, cabac=entropy == "cabac"))
    slc = [(r, True, 3) for r in rbsps]
    _, st = H.decode_picture(slc, sps, pps, return_state=True,
                             cabac_marked=entropy == "cabac")
    assert np.array_equal(st.y, est.y)
    assert np.array_equal(st.cb, est.cb)
    assert np.array_equal(st.cr, est.cr)


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_deblocked_p_and_b_round_trip_exact(entropy):
    """P and B pictures predicting from FILTERED references reconstruct
    bit-exactly — the drift-free property the in-loop placement exists
    for."""
    cab = entropy == "cabac"
    f0, f1, f2 = _mk(5), _mk(6), _mk(7)
    sps = H.parse_sps(H.write_sps(48, 32, num_ref_frames=2, poc_type=0))
    pps = H.parse_pps(H.write_pps(30, cabac=cab))
    _, st0 = H.encode_picture_i(*H.pad_planes(*f0), qp=30, poc_lsb=0,
                                entropy=entropy, deblock=True)
    rb_p, st2 = H.encode_picture_p(*H.pad_planes(*f2), st0, qp=30,
                                   frame_num=1, poc_lsb=4,
                                   entropy=entropy, deblock=True)
    rb_b, st1 = H.encode_picture_b(*H.pad_planes(*f1), st0, st2, qp=30,
                                   frame_num=2, poc_lsb=2,
                                   entropy=entropy, deblock=True)
    _, dp = H.decode_picture([(rb_p[0], False, 2)], sps, pps, ref=st0,
                             return_state=True, cabac_marked=cab)
    assert np.array_equal(dp.y, st2.y) and np.array_equal(dp.cb, st2.cb)
    _, db = H.decode_picture([(rb_b[0], False, 0)], sps, pps, ref=st0,
                             ref1=st2, return_state=True, cabac_marked=cab)
    assert np.array_equal(db.y, st1.y) and np.array_equal(db.cr, st1.cr)


def test_deblocked_gop_chain_no_drift():
    """I-P-P-P chain: the decode chain tracks the encoder's FILTERED
    reference chain frame-exactly (mirrors encode_stream_nals' bf=0
    schedule)."""
    frames = [_mk(10 + i) for i in range(4)]
    sps = H.parse_sps(H.write_sps(48, 32))
    pps = H.parse_pps(H.write_pps(30))
    stream = H.encode_stream_nals(frames, gop=8, qp=30, deblock=True)
    # mirror the encoder to capture recon states
    rb0, est = H.encode_picture_i(*H.pad_planes(*frames[0]), qp=30,
                                  deblock=True)
    ests = [est]
    for i in range(1, 4):
        rb, est = H.encode_picture_p(*H.pad_planes(*frames[i]), ests[-1],
                                     qp=30, frame_num=i, deblock=True)
        ests.append(est)
    dref = None
    for i, (nals, idr, disp) in enumerate(stream):
        _, t, rbsp = H.nal_to_rbsp(nals[0])
        _, dst = H.decode_picture([(rbsp, idr, 3 if idr else 2)], sps, pps,
                                  ref=dref, return_state=True)
        assert np.array_equal(dst.y, ests[i].y), f"frame {i} luma drift"
        assert np.array_equal(dst.cb, ests[i].cb)
        assert np.array_equal(dst.cr, ests[i].cr)
        dref = dst


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
@pytest.mark.parametrize(
    "kw",
    [dict(gop=4, b_frames=1), dict(gop=8, b_frames=3, b_pyramid=True),
     dict(gop=4, slices=2, p_intra_slices=1)],
)
def test_mp4_deblocked_stream_decodes(entropy, kw):
    """encode_mp4_avc1(deblock=True) end-to-end through the container
    decode walk: every frame decodes, stays within the lossy envelope of
    the unfiltered stream, and the filter demonstrably ran."""
    from scanner_spark.frames import synthetic_frame
    from scanner_spark.sources import mp4

    frames = [synthetic_frame(9, i, 32, 48, 3) for i in range(12)]
    buf_on = mp4.encode_mp4_avc1(frames, qp=30, entropy=entropy,
                                 deblock=True, **kw)
    buf_off = mp4.encode_mp4_avc1(frames, qp=30, entropy=entropy, **kw)
    meta, entries = mp4.parse_index(buf_on)
    out_on = mp4.decode_range(buf_on, entries[0].offset, meta,
                              set(range(12)))
    meta2, entries2 = mp4.parse_index(buf_off)
    out_off = mp4.decode_range(buf_off, entries2[0].offset, meta2,
                               set(range(12)))
    assert any(
        not np.array_equal(out_on[f], out_off[f]) for f in range(12)
    )
    err_on = max(
        int(np.abs(out_on[f].astype(int) - frames[f].astype(int)).max())
        for f in range(12)
    )
    err_off = max(
        int(np.abs(out_off[f].astype(int) - frames[f].astype(int)).max())
        for f in range(12)
    )
    # filtering must not blow up the error envelope (drift would)
    assert err_on <= err_off + 16, (err_on, err_off)


def test_foreign_deblock_header_now_decodes():
    """A slice header demanding the loop filter decodes THROUGH the
    filter (the pre-round-11 strict-mode refusal is retired): rewriting
    an idc=1 header to idc=0 must yield exactly the deblock=True
    encoder's reconstruction."""
    y, cb, cr = _mk(21, 16, 16)
    nal = H.encode_frame(y, cb, cr, qp=32)
    _, t, rbsp = H.nal_to_rbsp(nal)
    r = H.BitReader(rbsp)
    w = H.BitWriter()
    for _ in range(3):
        w.ue(r.ue())
    w.u(r.u(4), 4)
    w.ue(r.ue())
    w.u(r.u(2), 2)
    w.se(r.se())
    assert r.ue() == 1  # original: deblocking disabled
    w.ue(0)  # now: enabled, zero offsets follow
    w.se(0)
    w.se(0)
    tail_bits = r.bits_left()
    while r.bits_left() >= 8:
        w.u(r.u(8), 8)
    w.u(r.u(r.bits_left()), tail_bits % 8)
    nal2 = H.rbsp_to_nal(3, 5, w.bytes())
    sps = H.parse_sps(H.write_sps(16, 16))
    pps = H.parse_pps(H.write_pps(32))
    out = H.decode_frame(nal2, sps, pps)
    _, est = H.encode_picture_i(*H.pad_planes(y, cb, cr), qp=32,
                                deblock=True)
    assert np.array_equal(out[0], est.y.astype(np.uint8))
    assert np.array_equal(out[1], est.cb.astype(np.uint8))


def test_boundary_strength_decision_table():
    """§8.7.2.1 bS decisions pinned directly against a hand-built state:
    intra MB edges 4, intra internal 3, residual-bearing inter 2, motion
    difference >= 1 integer pel 1, different refs 1, still inter 0."""
    st = H._FrameState(3, 1)
    # MB0 intra; MB1 inter ref0 mv (0,0) no residual; MB2 inter ref0
    st.slice_no[:] = 0
    st.mb_qp[:] = 30
    st.mb_inter[0, 1] = st.mb_inter[0, 2] = True
    st.ref_l[0, 1, 0] = st.ref_l[0, 2, 0] = 0
    st.nzy[:] = 0

    def bs(e, mbx=1):
        return list(D._edge_bs(st, 0, mbx, e, True))

    # intra(0) | inter(1) MB edge -> 4
    assert bs(0) == [4, 4, 4, 4]
    # internal edges of the intra MB -> 3
    assert list(D._edge_bs(st, 0, 0, 2, True)) == [3, 3, 3, 3]
    # inter | inter, same ref, same mv, no residual -> 0
    assert bs(0, mbx=2) == [0, 0, 0, 0]
    # residual on one side -> 2 (only the groups containing the block)
    st.nzy[0, 8] = 3  # first 4x4 row of MB2's left column
    assert bs(0, mbx=2) == [2, 0, 0, 0]
    st.nzy[0, 8] = 0
    # quarter-pel mv difference < 4 -> 0, >= 4 (one integer pel) -> 1
    st.mv[0, 2] = (3, 0)
    assert bs(0, mbx=2) == [0, 0, 0, 0]
    st.mv[0, 2] = (4, 0)
    assert bs(0, mbx=2) == [1, 1, 1, 1]
    st.mv[0, 2] = (0, 0)
    # different reference indices -> 1
    st.ref_l[0, 2, 0] = 1
    assert bs(0, mbx=2) == [1, 1, 1, 1]
    st.ref_l[0, 2, 0] = 0
    # different list usage (L0-only vs bi) -> 1
    st.use_l[0, 2] = [True, True]
    st.ref_l[0, 2] = [0, 0]
    assert bs(0, mbx=2) == [1, 1, 1, 1]


# ---------------------------------------------------------------------------
# §8.7 I_PCM handling: qP = 0 in the threshold lookups
# ---------------------------------------------------------------------------


def test_pcm_mb_uses_qp_zero_in_lookups():
    """A PCM|PCM edge looks up alpha/beta at qPav = 0 -> unfiltered,
    even when the running slice QP would otherwise fire the filter."""
    # flat MBs with a 10-level step at the MB edge: |p0-q0| < alpha(40),
    # gradients 0 < beta -> the qp-40 filter fires unless PCM zeros qPav
    y = np.full((16, 32), 100, np.uint8)
    y[:, 16:] = 110

    def run(pcm):
        st = H._FrameState(2, 1)
        st.slice_no[:] = 0
        st.mb_qp[:] = 40
        st.mb_pcm[:] = pcm
        st.nzy[:] = 3  # residual everywhere -> bS >= 2 on the MB edge
        st.y = y.astype(np.int64).copy()
        st.cb = np.full((8, 16), 90, np.int64)
        st.cr = np.full((8, 16), 170, np.int64)
        D.deblock_picture(st, {0: (0, 0, 0)})
        return st.y

    assert not np.array_equal(run(False), y)   # filter fires at qp 40
    assert np.array_equal(run(True), y)        # PCM edges: qPav 0 -> off


def test_pcm_round_trip_exact_with_deblock():
    """All-PCM picture with deblocking signalled round-trips bit-exactly
    and the decoder marks every MB as PCM."""
    y, cb, cr = _mk(11)
    rbsps, est = H.encode_picture_i(
        *H.pad_planes(y, cb, cr), qp=36, mb_mode="pcm", deblock=True,
    )
    sps = H.parse_sps(H.write_sps(48, 32))
    pps = H.parse_pps(H.write_pps(36))
    _, st = H.decode_picture([(r, True, 3) for r in rbsps], sps, pps,
                             return_state=True)
    assert st.mb_pcm.all()
    assert np.array_equal(st.y, est.y)
    # PCM with qP = 0 in the lookups -> the filter must not have touched
    # the raw samples at all
    assert np.array_equal(st.y.astype(np.uint8), H.pad_planes(y, cb, cr)[0])
