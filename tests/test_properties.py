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
