"""CABAC entropy coding: engine round trips, table invariants, I/P/B
GOP reconstruction exactness, mp4 e2e, and the foreign-stream gate.

Reference capability: the reference decodes CABAC (Main/High-profile)
H.264 via ffmpeg (scanner/video/decoder_automata.cpp, software backend
scanner/video/software/).  Conformance posture documented in
kernels/cabac.py: in-repo streams round-trip bit-exactly; foreign CABAC
refuses loudly via the origin-marker SEI gate.
"""

import random

import numpy as np
import pytest

from scanner_spark.kernels import h264 as H
from scanner_spark.kernels.cabac import (
    RANGE_TAB_LPS,
    TRANS_IDX_LPS,
    TRANS_IDX_MPS,
    CabacDecoder,
    CabacEncoder,
)

rng = np.random.default_rng(909)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


def test_range_table_invariants():
    """Structural checks on the transcribed engine tables: monotone
    geometric decay down states, monotone growth across range quanta,
    the published anchor rows, and transition-table sanity."""
    assert len(RANGE_TAB_LPS) == 64
    assert RANGE_TAB_LPS[0] == (128, 176, 208, 240)
    assert RANGE_TAB_LPS[63] == (2, 2, 2, 2)
    for s in range(62):
        for q in range(4):
            assert RANGE_TAB_LPS[s][q] >= RANGE_TAB_LPS[s + 1][q]
    for s in range(63):
        for q in range(3):
            assert RANGE_TAB_LPS[s][q] <= RANGE_TAB_LPS[s][q + 1]
        # LPS interval always fits the minimum renormalized range, and
        # decay tracks alpha ~ 0.949 (Marpe et al. 2003) loosely
        assert 2 <= RANGE_TAB_LPS[s][0] and RANGE_TAB_LPS[s][3] <= 240
    assert len(TRANS_IDX_LPS) == 64 and len(TRANS_IDX_MPS) == 64
    for s in range(62):
        assert TRANS_IDX_LPS[s] <= TRANS_IDX_LPS[s + 1] or s + 1 == 63
        assert TRANS_IDX_LPS[s] <= s  # LPS never increases confidence
        assert TRANS_IDX_MPS[s] == min(s + 1, 62)


def test_engine_round_trip_fuzz():
    """Random mixes of context-coded decisions, bypass bins, TU and
    UEGk values, with interleaved end-of-slice terminates, decode back
    exactly (200 random sequences)."""
    pyrng = random.Random(7)
    for _ in range(120):
        ops = []
        for _ in range(pyrng.randint(1, 300)):
            kind = pyrng.choice("dddbug")
            if kind == "d":
                ops.append(("d", pyrng.randint(0, 5), pyrng.randint(0, 1)))
            elif kind == "b":
                ops.append(("b", 0, pyrng.randint(0, 1)))
            elif kind == "u":
                ops.append(("u", pyrng.randint(0, 3), pyrng.randint(0, 7)))
            else:
                ops.append(("g", pyrng.randint(0, 2),
                            pyrng.randint(-900, 900)))
        enc = CabacEncoder()
        for kind, key, v in ops:
            if kind == "d":
                enc.decision(("c", key), v)
            elif kind == "b":
                enc.bypass(v)
            elif kind == "u":
                enc.tu(lambda i, k=key: ("u", k, min(i, 2)), 7, v)
            else:
                enc.ueg(lambda i, k=key: ("g", k, min(i, 3)), 9, 3, True, v)
            enc.terminate(0)
        enc.terminate(1)
        dec = CabacDecoder(H.BitReader(enc.bytes()))
        for kind, key, v in ops:
            if kind == "d":
                assert dec.decision(("c", key)) == v
            elif kind == "b":
                assert dec.bypass() == v
            elif kind == "u":
                assert dec.tu(lambda i, k=key: ("u", k, min(i, 2)), 7) == v
            else:
                assert dec.ueg(
                    lambda i, k=key: ("g", k, min(i, 3)), 9, 3, True) == v
            assert dec.terminate() == 0
        assert dec.terminate() == 1


def test_engine_adapts_to_skewed_source():
    """A heavily skewed bin sequence must compress well below 1 bit/bin
    (context adaptation working) and still round-trip."""
    bits = [1] * 2000
    bits[100] = bits[700] = bits[1500] = 0
    enc = CabacEncoder()
    for b in bits:
        enc.decision(("s",), b)
    enc.terminate(1)
    data = enc.bytes()
    assert len(data) * 8 < len(bits) // 4  # < 0.25 bits per bin
    dec = CabacDecoder(H.BitReader(data))
    assert [dec.decision(("s",)) for _ in bits] == bits
    assert dec.terminate() == 1


# ---------------------------------------------------------------------------
# slice codec round trips
# ---------------------------------------------------------------------------


def _parsed(w_pix, h_pix, qp, b=False):
    sps = H.parse_sps(H.write_sps(
        w_pix, h_pix, num_ref_frames=2 if b else 1, poc_type=0 if b else 2))
    pps = H.parse_pps(H.write_pps(qp, cabac=True))
    return sps, pps


def test_cabac_pps_flag_parses():
    assert H.parse_pps(H.write_pps(20, cabac=True))["cabac"] is True
    assert H.parse_pps(H.write_pps(20))["cabac"] is False


@pytest.mark.parametrize("qp", [4, 12, 26])
def test_cabac_i_frame_exact_recon(qp):
    y = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    cb = np.full((16, 24), 90, np.uint8)
    cr = np.full((16, 24), 170, np.uint8)
    sps, pps = _parsed(48, 32, qp)
    rbsps, st_enc = H.encode_picture_i(y, cb, cr, qp=qp, entropy="cabac")
    (_, _, _), st_dec = H.decode_picture(
        [(rbsps[0], True, 3)], sps, pps, return_state=True,
        cabac_marked=True)
    assert np.array_equal(st_dec.y, st_enc.y)
    assert np.array_equal(st_dec.cb, st_enc.cb)
    assert np.array_equal(st_dec.cr, st_enc.cr)


def test_cabac_ipb_chain_exact_recon():
    base = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    cbp = np.full((16, 24), 128, np.uint8)
    sps, pps = _parsed(48, 32, 12, b=True)
    f = [np.roll(base, i, axis=1) for i in range(3)]
    rb_i, st_i = H.encode_picture_i(f[0], cbp, cbp, qp=12, poc_lsb=0,
                                    entropy="cabac")
    rb_p, st_p = H.encode_picture_p(f[2], cbp, cbp, st_i, qp=12,
                                    frame_num=1, poc_lsb=4, entropy="cabac")
    rb_b, st_b = H.encode_picture_b(f[1], cbp, cbp, st_i, st_p, qp=12,
                                    frame_num=2, poc_lsb=2, entropy="cabac")
    (_, _, _), d_i = H.decode_picture([(rb_i[0], True, 3)], sps, pps,
                                      return_state=True, cabac_marked=True)
    (_, _, _), d_p = H.decode_picture([(rb_p[0], False, 2)], sps, pps,
                                      ref=d_i, return_state=True,
                                      cabac_marked=True)
    (_, _, _), d_b = H.decode_picture([(rb_b[0], False, 0)], sps, pps,
                                      ref=d_i, ref1=d_p, return_state=True,
                                      cabac_marked=True)
    for dec, enc in ((d_i, st_i), (d_p, st_p), (d_b, st_b)):
        assert np.array_equal(dec.y, enc.y)
        assert np.array_equal(dec.cb, enc.cb)
        assert np.array_equal(dec.cr, enc.cr)


def test_cabac_multi_slice_exact_recon():
    base = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    cbp = np.full((24, 24), 128, np.uint8)
    sps, pps = _parsed(48, 48, 12)
    rbsps, st_enc = H.encode_picture_i(base, cbp, cbp, qp=12, slices=3,
                                       entropy="cabac")
    assert len(rbsps) == 3
    (_, _, _), st_dec = H.decode_picture(
        [(r, True, 3) for r in rbsps], sps, pps, return_state=True,
        cabac_marked=True)
    assert np.array_equal(st_dec.y, st_enc.y)
    assert np.array_equal(st_dec.cb, st_enc.cb)


def test_cabac_gop_fuzz_round_trip():
    """Random CABAC GOP chains (shifting content, random chroma, random
    qp, B frames) decode through the two-slot DPB walk with the same
    lossy envelope as the source — and the decoded reference states are
    self-consistent (P frames chain without drift errors)."""
    for seed in (1, 2, 3):
        r2 = np.random.default_rng(seed)
        h_, w_ = 32, 32
        base = r2.integers(0, 256, (h_, w_), dtype=np.uint8)
        yuv = []
        for i in range(5):
            y = np.roll(base, int(r2.integers(0, 3)) * i, axis=1)
            c = np.full((h_ // 2, w_ // 2), int(r2.integers(0, 256)),
                        np.uint8)
            yuv.append((y, c, c))
        qp = int(r2.integers(6, 16))
        stream = H.encode_stream_nals(yuv, gop=5, qp=qp, b_frames=1,
                                      entropy="cabac")
        assert sorted(d for _, _, d in stream) == list(range(5))
        sps = H.parse_sps(H.write_sps(w_, h_, num_ref_frames=2, poc_type=0))
        pps = H.parse_pps(H.write_pps(qp, cabac=True))
        ref_prev = ref_cur = None
        for nals, _idr, d in stream:
            kind, _ = H.slice_kind(nals[0])
            if kind == "I":
                (y, cb, cr), st = H.decode_picture_nals(
                    nals, sps, pps, return_state=True, cabac_marked=True)
                ref_prev, ref_cur = None, st
            elif kind == "P":
                (y, cb, cr), st = H.decode_picture_nals(
                    nals, sps, pps, ref=ref_cur, return_state=True,
                    cabac_marked=True)
                ref_prev, ref_cur = ref_cur, st
            else:
                (y, cb, cr), _ = H.decode_picture_nals(
                    nals, sps, pps, ref=ref_prev, ref1=ref_cur,
                    return_state=True, cabac_marked=True)
            err = np.abs(y.astype(int) - yuv[d][0].astype(int)).mean()
            assert err < 6.0, (seed, d, err)


def test_cabac_smaller_than_cavlc_on_static_scene():
    """Adaptation sanity: a flat static frame must cost fewer bytes
    under CABAC than CAVLC (contexts converge to near-determinism)."""
    y = np.full((32, 32), 60, np.uint8)
    c = np.full((16, 16), 128, np.uint8)
    rb_cabac, _ = H.encode_picture_i(y, c, c, qp=20, entropy="cabac")
    rb_cavlc, _ = H.encode_picture_i(y, c, c, qp=20)
    assert len(rb_cabac[0]) < len(rb_cavlc[0])


def test_cabac_pcm_refused():
    y = np.full((16, 16), 60, np.uint8)
    c = np.full((8, 8), 128, np.uint8)
    with pytest.raises(ValueError, match="I_PCM under CABAC"):
        H.encode_picture_i(y, c, c, qp=20, mb_mode="pcm", entropy="cabac")


# ---------------------------------------------------------------------------
# the foreign-stream gate
# ---------------------------------------------------------------------------


def test_unmarked_cabac_refuses():
    """decode_picture must refuse a CABAC payload that does not carry
    the in-repo origin-marker SEI (foreign streams would decode to
    garbage under uniform context init — kernels/cabac.py)."""
    y = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    c = np.full((8, 8), 128, np.uint8)
    sps, pps = _parsed(16, 16, 12)
    rbsps, _ = H.encode_picture_i(y, c, c, qp=12, entropy="cabac")
    with pytest.raises(NotImplementedError, match="origin-marker"):
        H.decode_picture([(rbsps[0], True, 3)], sps, pps)


def test_marker_sei_round_trip():
    nal = H.cabac_marker_nal()
    assert nal[0] & 0x1F == 6
    assert H.is_cabac_marker(nal)
    assert not H.is_cabac_marker(b"\x06\x05\x10" + b"\x00" * 16)
    # decode_picture_nals unlocks CABAC when the marker NAL accompanies
    # the slices
    y = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    c = np.full((8, 8), 128, np.uint8)
    sps, pps = _parsed(16, 16, 12)
    rbsps, st_enc = H.encode_picture_i(y, c, c, qp=12, entropy="cabac")
    slice_nal = H.rbsp_to_nal(3, 5, rbsps[0])
    (_, _, _), st_dec = H.decode_picture_nals(
        [nal, slice_nal], sps, pps, return_state=True)
    assert np.array_equal(st_dec.y, st_enc.y)


# ---------------------------------------------------------------------------
# mp4 end-to-end
# ---------------------------------------------------------------------------


def test_mp4_cabac_gop_decode_matches_kernel_and_bounds_error():
    from scanner_spark.frames import synthetic_frame
    from scanner_spark.sources import mp4

    frames = [synthetic_frame(0, i, 24, 32, 3) for i in range(10)]
    buf = mp4.encode_mp4_avc1(frames, qp=10, gop=5, b_frames=1,
                              entropy="cabac")
    buf_cavlc = mp4.encode_mp4_avc1(frames, qp=10, gop=5, b_frames=1)
    assert len(buf) < len(buf_cavlc)  # arithmetic coding wins
    m, e = mp4.parse_index(buf)
    out = mp4.decode_range(buf, 0, m, set(range(10)), index=(m, e))
    # lossy bound vs source, same envelope as the CAVLC path
    for i in range(10):
        err = np.abs(out[i].astype(int) - frames[i].astype(int)).mean()
        assert err < 9.0, (i, err)
    # sparse pruned load: only the second GOP's window decodes
    part = mp4.decode_range(buf, 0, m, {7, 9}, index=(m, e))
    assert np.array_equal(part[7], out[7])
    assert np.array_equal(part[9], out[9])


def test_mp4_cabac_marker_stripped_refuses():
    from scanner_spark.frames import synthetic_frame
    from scanner_spark.sources import mp4

    frames = [synthetic_frame(0, i, 16, 16, 3) for i in range(4)]
    buf = bytearray(mp4.encode_mp4_avc1(frames, qp=10, entropy="cabac"))
    mark = H.cabac_marker_nal()
    idx = buf.find(mark)
    assert idx > 0
    buf[idx + 8] ^= 0xFF  # corrupt the first marker's uuid
    m, e = mp4.parse_index(bytes(buf))
    with pytest.raises(NotImplementedError, match="origin-marker"):
        mp4.decode_range(bytes(buf), 0, m, {0}, index=(m, e))


def test_mp4_cabac_multi_slice_e2e():
    from scanner_spark.frames import synthetic_frame
    from scanner_spark.sources import mp4

    frames = [synthetic_frame(0, i, 32, 32, 3) for i in range(4)]
    buf = mp4.encode_mp4_avc1(frames, qp=10, gop=4, slices=2,
                              entropy="cabac")
    ref = mp4.encode_mp4_avc1(frames, qp=10, gop=4, slices=1,
                              entropy="cabac")
    m, e = mp4.parse_index(buf)
    m2, e2 = mp4.parse_index(ref)
    out = mp4.decode_range(buf, 0, m, set(range(4)), index=(m, e))
    out_ref = mp4.decode_range(ref, 0, m2, set(range(4)), index=(m2, e2))
    for i in range(4):
        # multi-slice reconstruction differs at slice boundaries from
        # single-slice (contexts reset) but stays within the envelope
        err = np.abs(out[i].astype(int) - frames[i].astype(int)).mean()
        ref_err = np.abs(out_ref[i].astype(int) - frames[i].astype(int)).mean()
        assert err < ref_err + 2.0


def test_cabac_multi_ref_p_and_b_round_trip_exact():
    """ref_idx under CABAC (§9.3.2.4 unary, §9.3.3.1.1.6 neighbour
    contexts): multi-ref P and B pictures round-trip bit-exactly with
    per-MB reference choices preserved — the round-12 lift of the
    'multi-reference under CABAC' refusal (in-repo marked streams are
    the only CABAC streams decoded, so uniform-init context choice is
    self-consistent by construction)."""
    import numpy as np

    from scanner_spark.kernels import h264 as H

    def smooth(seed, h=48, w=64):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, 3)).astype(np.int64)
        return ((a + np.roll(a, 1, 0) + np.roll(a, 1, 1)) // 3).astype(
            np.uint8)

    A, B = smooth(101), smooth(102)
    fr = [H.yuv420_from_rgb(f) for f in (A, B, A)]
    _, st0 = H.encode_picture_i(*H.pad_planes(*fr[0]), qp=28,
                                entropy="cabac")
    rb1, st1 = H.encode_picture_p(*H.pad_planes(*fr[1]), [st0], qp=28,
                                  frame_num=1, entropy="cabac")
    rb2, st2 = H.encode_picture_p(*H.pad_planes(*fr[2]), [st1, st0],
                                  qp=28, frame_num=2, entropy="cabac")
    assert (st2.ref_l[:, :, 0] == 1).any()
    sps = H.parse_sps(H.write_sps(64, 48, num_ref_frames=2))
    pps = H.parse_pps(H.write_pps(28, cabac=True))
    _, d1 = H.decode_picture([(rb1[0], False, 2)], sps, pps, ref=[st0],
                             return_state=True, cabac_marked=True)
    _, d2 = H.decode_picture([(rb2[0], False, 2)], sps, pps,
                             ref=[d1, st0], return_state=True,
                             cabac_marked=True)
    assert np.array_equal(d2.y, st2.y)
    assert np.array_equal(d2.ref_l, st2.ref_l)
    fr3 = H.yuv420_from_rgb(smooth(103))
    rbb, stb = H.encode_picture_b(*H.pad_planes(*fr3), [st1, st0], [st2],
                                  qp=28, frame_num=3, poc_lsb=5,
                                  entropy="cabac")
    spsb = H.parse_sps(H.write_sps(64, 48, num_ref_frames=3, poc_type=0))
    _, db = H.decode_picture([(rbb[0], False, 0)], spsb, pps,
                             ref=[d1, st0], ref1=[d2], return_state=True,
                             cabac_marked=True)
    assert np.array_equal(db.y, stb.y)
    assert np.array_equal(db.cb, stb.cb)
    assert np.array_equal(db.ref_l, stb.ref_l)


def test_cabac_multi_ref_mmco_mp4_end_to_end():
    """CABAC entropy composed with the mmco_anchor adaptive-marking GOP
    shape through the full container walk."""
    import numpy as np

    from scanner_spark.sources import mp4

    def smooth(seed, h=48, w=64):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, 3)).astype(np.int64)
        return ((a + np.roll(a, 1, 0) + np.roll(a, 1, 1)) // 3).astype(
            np.uint8)

    A, B = smooth(104), smooth(105)
    frames = [(A, B)[i % 2] for i in range(7)]
    buf = mp4.encode_mp4_avc1(frames, qp=28, gop=7, p_refs=2,
                              entropy="cabac", ref_mode="mmco_anchor")
    meta, entries = mp4.parse_index(buf)
    out = mp4.decode_range(buf, entries[0].offset, meta, set(range(7)))
    for f in range(7):
        err = int(np.abs(out[f].astype(int) - frames[f].astype(int)).max())
        assert err < 160, (f, err)


def test_cat5_sig_last_context_class_cardinality():
    """Structural pin (ADVICE r13): the ctxBlockCat-5 significance /
    last maps use exactly 15 and 8 context classes over the 63 scan
    positions — the spec's Table 9-43 cardinality — so a future
    transcription of the normative position->class map is a drop-in
    swap of the two key functions."""
    from scanner_spark.kernels.h264_cabac import _last_key8, _sig_key8

    sig = {_sig_key8(i) for i in range(63)}
    last = {_last_key8(i) for i in range(63)}
    assert len(sig) == 15, sorted(sig)
    assert len(last) == 8, sorted(last)
    # class index must be a pure function of position (determinism)
    assert all(_sig_key8(i) == _sig_key8(i) for i in range(63))
