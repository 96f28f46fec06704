"""Sampler/spacing/slice behavior, mirroring the reference's expectations
(/root/reference/tests/py_test.py:274-436) test-for-test on synthetic
streams."""

import pytest

from scanner_spark import streams as S


def by_idx(df, stream="0"):
    rows = df.filter(f"stream_id = '{stream}'").orderBy("idx").collect()
    assert [r.idx for r in rows] == list(range(len(rows))), "idx must be dense"
    return [r.value for r in rows]


def test_stride(two_streams):
    vals = by_idx(S.stride(two_streams, 8))
    assert vals == [0.0, 8.0, 16.0, 24.0]
    vals1 = by_idx(S.stride(two_streams, 8), stream="1")
    assert vals1 == [100.0, 108.0, 116.0, 124.0]


def test_range(two_streams):
    assert by_idx(S.srange(two_streams, 10, 14)) == [10.0, 11.0, 12.0, 13.0]


def test_strided_range(two_streams):
    assert by_idx(S.strided_range(two_streams, 4, 20, 5)) == [4.0, 9.0, 14.0, 19.0]


def test_ranges_with_overlap(two_streams):
    # overlapping ranges duplicate rows, concatenated in range order
    vals = by_idx(S.ranges(two_streams, [(0, 3), (2, 5)]))
    assert vals == [0.0, 1.0, 2.0, 2.0, 3.0, 4.0]


def test_strided_ranges(two_streams):
    vals = by_idx(S.strided_ranges(two_streams, [(0, 10), (20, 30)], 4))
    assert vals == [0.0, 4.0, 8.0, 20.0, 24.0, 28.0]


def test_gather_preserves_requested_order(two_streams):
    vals = by_idx(S.gather(two_streams, [7, 3, 3, 12]))
    assert vals == [7.0, 3.0, 3.0, 12.0]


def test_repeat(two_streams):
    vals = by_idx(S.repeat(S.srange(two_streams, 0, 3), 4))
    assert vals == [0.0] * 4 + [1.0] * 4 + [2.0] * 4


def test_repeat_null(two_streams):
    vals = by_idx(S.repeat_null(S.srange(two_streams, 0, 3), 4))
    expect = []
    for v in (0.0, 1.0, 2.0):
        expect += [v, None, None, None]
    assert vals == expect


def test_slice_unslice_roundtrip(two_streams):
    sliced = S.slice_strided(two_streams, 7)
    back = S.unslice(sliced, group_size=7)
    assert by_idx(back) == [float(i) for i in range(30)]
    # general-path unslice (computed slice lengths) must agree
    back2 = S.unslice(sliced)
    assert by_idx(back2) == [float(i) for i in range(30)]


def test_overlapping_slices_with_per_slice_range(two_streams):
    # mirror of py_test.py:361-377: slices (0,15),(5,25),(15,35) sampled
    # per-slice with [(0,10),(5,15),(5,15)] -> 30 rows after unslice
    sliced = S.slice_ranges(two_streams, [(0, 15), (5, 25), (15, 30)])
    sampled = S.srange_per_slice(sliced, [(0, 10), (5, 15), (5, 15)])
    out = S.unslice(sampled)
    vals = by_idx(out)
    assert len(vals) == 30
    assert vals[:10] == [float(i) for i in range(10)]  # slice 0 local 0..9
    assert vals[10:20] == [float(i) for i in range(10, 20)]  # slice 1 local 5..14 -> global 10..19
    assert vals[20:] == [float(i) for i in range(20, 30)]  # slice 2 local 5..14 -> global 20..29


def test_make_stream_dense_idx(spark):
    df = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 3, 2.0), ("b", 5, 3.0)], "k string, ord long, value double"
    )
    st = S.make_stream(df, "k", "ord")
    got = {(r.stream_id, r.idx): r.value for r in st.collect()}
    assert got == {("a", 0): 2.0, ("a", 1): 1.0, ("b", 0): 3.0}


def test_sampler_validation(two_streams):
    with pytest.raises(ValueError):
        S.stride(two_streams, 0)
    with pytest.raises(ValueError):
        S.repeat(two_streams, -1)


def test_make_stream_distributed_matches_window_impl(spark, sf_dir):
    """The two-phase scale path produces the identical dense index as the
    per-stream window implementation."""
    from scanner_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    a = S.make_stream(ev, stream_col="event_type", order_col="event_id").select(
        "stream_id", "idx", "event_id"
    )
    b = S.make_stream_distributed(
        ev, stream_col="event_type", order_col="event_id", num_partitions=7
    ).select("stream_id", "idx", "event_id")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
