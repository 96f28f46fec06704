"""Property-based tests (hypothesis): the sampler algebra holds for
arbitrary parameters, matching an independent pandas model of the
reference semantics (sampler.cpp).  Examples are kept few — each runs
real Spark jobs — but parameters are adversarial, not hand-picked."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from scanner_spark import streams as S

N = 24  # rows per stream


@pytest.fixture(scope="module")
def stream(spark):
    rows = [(str(s), i, float(100 * s + i)) for s in range(2) for i in range(N)]
    return spark.createDataFrame(
        rows, "stream_id string, idx long, value double"
    ).cache()


def model(df):
    """Collect a stream to a pandas frame keyed (stream, idx) -> value."""
    pdf = df.toPandas().sort_values(["stream_id", "idx"]).reset_index(drop=True)
    return list(map(tuple, pdf[["stream_id", "idx", "value"]].itertuples(index=False)))


SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@SETTINGS
@given(a=st.integers(1, 5), b=st.integers(1, 5))
def test_stride_composes(stream, a, b):
    lhs = model(S.stride(S.stride(stream, a), b))
    rhs = model(S.stride(stream, a * b))
    assert lhs == rhs


@SETTINGS
@given(n=st.integers(1, 4))
def test_repeat_then_stride_is_identity(stream, n):
    assert model(S.stride(S.repeat(stream, n), n)) == model(stream)


@SETTINGS
@given(g=st.integers(1, 30))
def test_slice_unslice_roundtrip(stream, g):
    assert model(S.unslice(S.slice_strided(stream, g), g)) == model(stream)


@SETTINGS
@given(rows=st.lists(st.integers(0, N - 1), min_size=1, max_size=8))
def test_gather_preserves_requested_order_and_duplicates(stream, rows):
    got = S.gather(stream, rows).toPandas()
    for sid in ("0", "1"):
        sub = got[got.stream_id == sid].sort_values("idx")
        # downstream idx is dense 0..len-1 and value follows rows[i]
        assert list(sub["idx"]) == list(range(len(rows)))
        expect = [float(100 * int(sid) + r) for r in rows]
        assert list(sub["value"]) == expect


@SETTINGS
@given(
    start=st.integers(0, N - 1),
    length=st.integers(0, N),
    s=st.integers(1, 5),
)
def test_strided_range_matches_python_slice(stream, start, length, s):
    end = min(start + length, N)
    got = S.strided_range(stream, start, end, s).toPandas()
    expect_idx = list(range(start, end, s))
    for sid in ("0", "1"):
        sub = got[got.stream_id == sid].sort_values("idx")
        assert list(sub["value"]) == [float(100 * int(sid) + i) for i in expect_idx]
        assert list(sub["idx"]) == list(range(len(expect_idx)))


# ---------------------------------------------------------------------------
# Adversarial skew: one hot LSH bucket / one hot label bucket covering ~20%
# of the corpus.  These prove the operators' skew mitigations actually bound
# wall time on the worst realistic key distribution:
#
# - exact-duplicate collapse (dedup._text_groups / the vector groupBy in
#   cosine_dup_pairs) removes identical members BEFORE any quadratic stage;
# - NEAR-identical members (distinct texts/vectors in one bucket) are the
#   irreducible case — their pair OUTPUT is inherently quadratic in the
#   bucket, so the operators must complete in time proportional to that
#   output (m^2 pairs), not degrade super-quadratically, and AQE's skew
#   join keeps one hot key from serializing a single task.
#
# If a bound trips: first check the exact-dup collapse still runs before
# the self-join, then the AQE skew-join conf (spark.sql.adaptive.
# skewJoin.enabled) the session pins on.
# ---------------------------------------------------------------------------


def _skew_docs(spark, n_total=2500, hot_frac=0.2):
    """~20% of docs are one-token variants of a single base paragraph
    (distinct texts -> NOT collapsible; near-identical shingle sets -> one
    hot MinHash band bucket), the rest unique random-ish text."""
    import random

    rnd = random.Random(99)
    words = [f"w{j}" for j in range(500)]
    base = " ".join(f"b{j}" for j in range(40))
    hot = int(n_total * hot_frac)
    rows = []
    for i in range(hot):
        rows.append((i, base + f" v{i}"))  # unique suffix token
    for i in range(hot, n_total):
        rows.append((i, " ".join(rnd.choice(words) for _ in range(30))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_hot_band_bucket_bounded(spark):
    import time

    from scanner_spark.functions import dedup
    from scanner_spark import caching

    docs = _skew_docs(spark)
    t0 = time.monotonic()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    n = pairs.count()
    dt = time.monotonic() - t0
    caching.release_all()
    hot = int(2500 * 0.2)
    # the hot bucket's members really are near-dups: (almost) all pairs out
    assert n >= 0.9 * hot * (hot - 1) / 2
    # bounded: proportional to the quadratic OUTPUT, no runaway beyond it
    assert dt < 90.0, f"hot-bucket LSH took {dt:.1f}s — skew mitigation regressed"


def test_cosine_hot_label_bucket_bounded(spark):
    import time

    import numpy as np

    from scanner_spark.functions import dedup
    from scanner_spark import caching

    rng = np.random.default_rng(17)
    dim = 16
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    rows = []
    n_total, hot = 2500, 500
    for i in range(hot):
        # tiny distinct perturbations: same label, same LSH bucket, not
        # bitwise-equal (so the vector dup-collapse cannot remove them)
        v = base + 1e-4 * rng.normal(size=dim)
        rows.append((i, "hotlabel", [float(x) for x in v]))
    for i in range(hot, n_total):
        v = rng.normal(size=dim)
        rows.append((i, f"label{i % 7}", [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, label string, embedding array<float>")
    t0 = time.monotonic()
    pairs = dedup.cosine_dup_pairs(
        df, vec_col="embedding", id_col="id", block_col="label", threshold=0.99
    )
    n = pairs.count()
    dt = time.monotonic() - t0
    caching.release_all()
    assert n >= 0.9 * hot * (hot - 1) / 2
    assert dt < 90.0, f"hot-bucket cosine took {dt:.1f}s — skew mitigation regressed"


# ---------------------------------------------------------------------------
# codec properties (no Spark session needed): round trips under random
# shapes/content — the fuzz layer over the unit pins in test_kernels /
# test_h264
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
    palette=st.booleans(),
)
def test_webp_round_trip_property(h, w, c, seed, palette):
    import numpy as np

    from scanner_spark.kernels import webp as W

    rng = np.random.default_rng(seed)
    if palette:  # few-color content exercises short/padded flat codes
        colors = rng.integers(0, 256, (rng.integers(1, 5), c), dtype=np.uint8)
        img = colors[rng.integers(0, len(colors), (h, w))]
    else:
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    out = W.decode_webp(W.encode_webp(img))
    want = img if c == 4 else np.dstack([img, np.full((h, w), 255, np.uint8)])
    assert np.array_equal(out, want)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    comp=st.sampled_from(["none", "lzw", "packbits"]),
    pred=st.sampled_from([1, 2]),
    smooth=st.booleans(),
)
def test_tiff_round_trip_property(h, w, c, seed, comp, pred, smooth):
    import numpy as np

    from scanner_spark.kernels.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    if smooth:  # gradient content exercises predictor + LZW table growth
        base = (np.arange(w)[None, :] + np.arange(h)[:, None]) % 256
        img = np.dstack([(base + 31 * k) % 256 for k in range(c)]).astype(np.uint8)
    else:
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    out = decode_tiff(encode_tiff(img, compression=comp, predictor=pred))
    assert np.array_equal(out, img)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    seed=st.integers(0, 2**31 - 1),
    sub=st.booleans(),
    q=st.sampled_from([50, 85, 95]),
    flat=st.booleans(),
)
def test_jpeg_progressive_equals_baseline_property(h, w, seed, sub, q, flat):
    """For ANY image, the progressive (SOF2) encoding decodes to pixels
    identical to the baseline encoding — the Annex G transport changes,
    the quantized coefficients do not."""
    import numpy as np

    from scanner_spark.kernels.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    rng = np.random.default_rng(seed)
    img = (np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8) if flat
           else rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    b = decode_jpeg(encode_jpeg(img, q, subsample=sub))
    p = decode_jpeg(encode_jpeg_progressive(img, q, subsample=sub))
    assert np.array_equal(b, p)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(0, 3000),
    kind=st.sampled_from(["noise", "saw", "smooth", "const", "extremes"]),
    stereo=st.booleans(),
    bs=st.sampled_from([256, 1024, 4096]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_round_trip_property(n, kind, stereo, bs, seed):
    import numpy as np

    from scanner_spark.kernels.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    i = np.arange(n)
    if kind == "noise":
        s = rng.integers(-32768, 32768, n).astype(np.int16)
    elif kind == "saw":
        s = ((((i * 17) % 256) - 128) * 64).astype(np.int16)
    elif kind == "smooth":
        s = (9000 * np.sin(i / 17.0)).astype(np.int16)
    elif kind == "const":
        s = np.full(n, int(rng.integers(-32768, 32768)), np.int16)
    else:
        s = np.resize(np.array([32767, -32768], np.int16), n)
    if stereo:
        s = np.stack([s, np.roll(s, 1)], axis=1) if n else s.reshape(0, 1)
    enc = encode_flac(s, 8000, block_size=bs)
    dec, rate = decode_flac(enc)
    want = (s if s.ndim == 2 else s[:, None]).astype(np.int32)
    assert rate == 8000 and np.array_equal(dec, want)


@settings(max_examples=10, deadline=None)
@given(
    hw=st.sampled_from([(16, 16), (32, 16), (18, 22)]),
    gop=st.integers(1, 4),
    qp=st.sampled_from([4, 12, 26]),
    seed=st.integers(0, 2**31 - 1),
)
def test_h264_gop_stream_decode_matches_encoder_state(hw, gop, qp, seed):
    """Any random GOP stream decodes without desync and every decoded
    frame equals the ENCODER's own reconstruction (the P-frame chain's
    invariant: prediction always runs over decoded, not source, pixels)."""
    import numpy as np

    from scanner_spark.kernels import h264 as H

    h, w = hw
    rng = np.random.default_rng(seed)
    yuv = []
    base = rng.integers(0, 256, (h, w), dtype=np.uint8)
    for i in range(5):
        y = np.roll(base, i * rng.integers(0, 3), axis=1)
        cb = np.full((h // 2, w // 2), int(rng.integers(0, 256)), np.uint8)
        cr = np.full((h // 2, w // 2), int(rng.integers(0, 256)), np.uint8)
        yuv.append((y, cb, cr))
    nals = H.encode_stream(yuv, gop=gop, qp=qp)
    sps = H.parse_sps(H.write_sps(w, h))
    pps = H.parse_pps(H.write_pps(qp))
    ref = None
    for i, (nal, is_idr, disp) in enumerate(nals):
        assert is_idr == (i % gop == 0)
        (dy, dcb, dcr), st2 = H.decode_frame(nal, sps, pps, ref=ref, return_state=True)
        # cropped decode equals the decoder's own padded state interior
        assert np.array_equal(st2.y[:h, :w].astype(np.uint8), dy)
        assert dy.shape == (h, w)
        ref = st2


@settings(max_examples=8, deadline=None)
@given(
    hw=st.sampled_from([(16, 16), (32, 16)]),
    gop=st.integers(3, 6),
    b_frames=st.integers(1, 2),
    qp=st.sampled_from([6, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_h264_b_gop_stream_decode_matches_encoder_recon(hw, gop, b_frames,
                                                        qp, seed):
    """Any random I/P/B GOP stream decodes without desync through a
    two-slot DPB walk, covers every display index exactly once, and every
    decoded reference frame equals the decoder's own padded state (the
    zero-drift invariant extended to bi-prediction)."""
    import numpy as np

    from scanner_spark.kernels import h264 as H

    h, w = hw
    rng = np.random.default_rng(seed)
    yuv = []
    base = rng.integers(0, 256, (h, w), dtype=np.uint8)
    for i in range(7):
        y = np.roll(base, i * rng.integers(0, 3), axis=1)
        cb = np.full((h // 2, w // 2), int(rng.integers(0, 256)), np.uint8)
        cr = np.full((h // 2, w // 2), int(rng.integers(0, 256)), np.uint8)
        yuv.append((y, cb, cr))
    nals = H.encode_stream(yuv, gop=gop, qp=qp, b_frames=b_frames)
    assert sorted(d for _, _, d in nals) == list(range(7))
    sps = H.parse_sps(H.write_sps(w, h, num_ref_frames=2, poc_type=0))
    pps = H.parse_pps(H.write_pps(qp))
    ref_prev = ref_cur = None
    seen = set()
    for nal, is_idr, d in nals:
        kind, is_ref = H.slice_kind(nal)
        assert is_idr == (kind == "I")
        assert is_ref == (kind != "B")  # B frames are non-reference
        if kind == "I":
            (dy, _, _), st2 = H.decode_frame(nal, sps, pps, return_state=True)
            ref_prev, ref_cur = None, st2
        elif kind == "P":
            (dy, _, _), st2 = H.decode_frame(
                nal, sps, pps, ref=ref_cur, return_state=True
            )
            ref_prev, ref_cur = ref_cur, st2
        else:
            (dy, _, _), st2 = H.decode_frame(
                nal, sps, pps, ref=ref_prev, ref1=ref_cur, return_state=True
            )
        assert np.array_equal(st2.y[:h, :w].astype(np.uint8), dy)
        assert dy.shape == (h, w)
        seen.add(d)
    assert seen == set(range(7))

@settings(max_examples=6, deadline=None)
@given(
    hw=st.sampled_from([(16, 16), (32, 16)]),
    gop=st.integers(6, 9),
    b_frames=st.integers(2, 3),
    n_frames=st.integers(8, 14),
    qp=st.sampled_from([6, 14]),
    seed=st.integers(0, 2**31 - 1),
)
def test_h264_b_pyramid_mp4_decode_exhaustive(hw, gop, b_frames, n_frames,
                                              qp, seed):
    """Any random hierarchical-B (b_pyramid) mp4 decodes every display
    frame through the general sliding-window DPB walk — referenced B
    pictures enter the DPB, trailing P frames resolve their explicit
    ref_pic_list_modification, and any single-frame sparse load is
    bit-identical to the full decode (GOP-walk determinism)."""
    import numpy as np

    from scanner_spark.kernels import h264 as H
    from scanner_spark.sources import mp4

    h, w = hw
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    frames = [
        np.roll(base, i * int(rng.integers(0, 3)), axis=1) for i in range(n_frames)
    ]
    buf = mp4.encode_mp4_avc1(frames, qp=qp, gop=gop, b_frames=b_frames,
                              b_pyramid=True)
    meta, _entries = mp4.parse_index(buf)
    out = mp4.decode_range(buf, 0, meta, set(range(n_frames)))
    assert set(out) == set(range(n_frames))
    pick = int(rng.integers(0, n_frames))
    sparse = mp4.decode_range(buf, 0, meta, {pick})
    assert np.array_equal(sparse[pick], out[pick])
