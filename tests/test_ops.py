"""Op-compiler behavior: elementwise, batch, stencil boundaries, state,
warmup — mirroring /root/reference/tests/py_test.py:407-556."""

import pandas as pd
import pytest

from scanner_spark import streams as S
from scanner_spark.ops import BoundaryMode, register_op
from scanner_spark.kernels import increment_bounded_op, increment_unbounded_op


def vals(df, col, stream="0"):
    rows = df.filter(f"stream_id = '{stream}'").orderBy("idx").collect()
    return [r[col] for r in rows]


def test_elementwise_scalar(two_streams):
    @register_op
    def double_it(v):
        return v * 2

    out = double_it(two_streams, ["value"], "out", "double")
    assert vals(out, "out")[:4] == [0.0, 2.0, 4.0, 6.0]


def test_elementwise_batch(two_streams):
    @register_op(batch=True)
    def add_ten(v: pd.Series) -> pd.Series:
        return v + 10

    out = add_ten(two_streams, ["value"], "out", "double")
    assert vals(out, "out")[:3] == [10.0, 11.0, 12.0]


def test_elementwise_variadic(two_streams):
    @register_op(batch=True)
    def combine(a, b):
        return a + b

    df = two_streams.withColumn("value2", two_streams.value * 10)
    out = combine(df, ["value", "value2"], "out", "double")
    assert vals(out, "out")[:3] == [0.0, 11.0, 22.0]


def test_elementwise_skips_null_elements(two_streams):
    # NullElements (from repeat_null spacing) pass through kernels as NULL
    @register_op
    def inc(v):
        return v + 1

    spaced = S.repeat_null(S.srange(two_streams, 0, 3), 2)
    out = inc(spaced, ["value"], "out", "double")
    assert vals(out, "out") == [1.0, None, 2.0, None, 3.0, None]


def test_stencil_repeat_edge(two_streams):
    # [-1, 0, 1] sum with REPEAT_EDGE: head=v0*2+v1, tail=v28+v29*2
    @register_op(stencil=[-1, 0, 1], boundary=BoundaryMode.REPEAT_EDGE)
    def wsum(win):
        return float(sum(win))

    out = wsum(S.srange(two_streams, 0, 5), ["value"], "out", "double")
    assert vals(out, "out") == [1.0, 3.0, 6.0, 9.0, 11.0]


def test_stencil_null_boundary(two_streams):
    @register_op(stencil=[-1, 0, 1], boundary=BoundaryMode.NULL)
    def wlist(win):
        return [None if v is None else float(v) for v in win]

    out = wlist(S.srange(two_streams, 0, 3), ["value"], "out", "array<double>")
    assert vals(out, "out") == [
        [None, 0.0, 1.0],
        [0.0, 1.0, 2.0],
        [1.0, 2.0, None],
    ]


def test_stencil_sparse_offsets(two_streams):
    # non-contiguous stencil [-2, 0] like OpticalFlow's [-1, 0] but wider
    @register_op(stencil=[-2, 0])
    def diff(win):
        return float(win[1] - win[0])

    out = diff(S.srange(two_streams, 0, 5), ["value"], "out", "double")
    assert vals(out, "out") == [0.0, 1.0, 2.0, 2.0, 2.0]


def test_stencil_respects_slices(two_streams):
    # stencil windows must not cross slice boundaries
    @register_op(stencil=[-1, 0], boundary=BoundaryMode.REPEAT_EDGE)
    def prev_sum(win):
        return float(win[0] + win[1])

    sliced = S.slice_strided(S.srange(two_streams, 0, 6), 3)
    out = prev_sum(sliced, ["value"], "out", "double")
    got = (
        out.filter("stream_id = '0'").orderBy("slice_id", "idx").select("out").collect()
    )
    # slice 0: [0,1,2] -> [0,1,3]; slice 1: [3,4,5] -> [6,7,9] (edge repeats at 3)
    assert [r.out for r in got] == [0.0, 1.0, 3.0, 6.0, 7.0, 9.0]


def test_unbounded_state_counter(two_streams):
    out = increment_unbounded_op(two_streams, ["value"], "out", "long")
    assert vals(out, "out") == list(range(30))
    assert vals(out, "out", stream="1") == list(range(30))


def test_unbounded_state_resets_per_slice(two_streams):
    sliced = S.slice_strided(two_streams, 10)
    out = S.unslice(increment_unbounded_op(sliced, ["value"], "out", "long"), 10)
    assert vals(out, "out") == list(range(10)) * 3


def test_bounded_state_gather_warmup(two_streams):
    # py_test.py:407-424: warmup w, gather [0,10,25,26,27] -> [0,w,w,w+1,w+2]
    w = increment_bounded_op.bounded_state
    out = increment_bounded_op.apply_gather_with_warmup(
        two_streams, [0, 10, 25, 26, 27], ["value"], "out", "long"
    )
    assert vals(out, "out") == [0, w, w, w + 1, w + 2]


def test_stencil_error_boundary(two_streams):
    @register_op(stencil=[-1, 0], boundary=BoundaryMode.ERROR)
    def bad(win):
        return float(win[0])

    out = bad(S.srange(two_streams, 0, 3), ["value"], "out", "double")
    with pytest.raises(Exception):
        out.collect()


def test_on_error_null_isolates_poison_rows(two_streams):
    """on_error='null': a raising element yields NULL, the job survives
    (the reference's blacklisting analog, master.cpp:986-1018)."""

    @register_op(on_error="null")
    def picky(v):
        if v == 2.0:
            raise ValueError("poison")
        return v * 2

    out = picky(two_streams, ["value"], "out", "double")
    got = vals(out, "out")[:4]
    assert got[0] == 0.0 and got[1] == 2.0 and got[3] == 6.0
    assert got[2] is None


def test_on_error_null_batch_falls_back_per_element(two_streams):
    @register_op(batch=True, on_error="null")
    def picky_batch(v: pd.Series) -> pd.Series:
        if (v == 2.0).any():
            raise ValueError("poison batch")
        return v * 2

    out = picky_batch(two_streams, ["value"], "out", "double")
    got = vals(out, "out")
    assert got.count(None) == 1  # value==2.0 exists once (stream 0, idx 2)
    assert got[3] == 6.0  # neighbors in the poisoned batch recovered
    assert vals(out, "out", stream="1")[0] == 200.0  # other stream untouched


def test_on_error_null_blacklists_stateful_group(two_streams):
    """A raising stateful kernel nulls its whole (stream, slice) group;
    the other stream's outputs are intact."""

    class Poisoned:
        def reset(self):
            pass

        def execute(self, values: pd.Series) -> pd.Series:
            if (values >= 100.0).any():  # stream '1' has values 100..129
                raise ValueError("bad stream")
            return values.cumsum()

    op = register_op(Poisoned, unbounded_state=True, on_error="null", name="P")
    out = op(two_streams, ["value"], "out", "double").collect()
    by_stream = {}
    for r in out:
        by_stream.setdefault(r.stream_id, []).append(r.out)
    assert all(v is None for v in by_stream["1"])
    assert all(v is not None for v in by_stream["0"])


def test_on_error_raise_is_default(two_streams):
    @register_op
    def bad(v):
        raise RuntimeError("boom")

    with pytest.raises(Exception):
        bad(two_streams, ["value"], "out", "double").collect()


def test_unbounded_state_expr_fast_path_matches_rows_path(spark):
    """state_expr (codegen window aggregate) must equal the Python rows
    path bit-for-bit — including slice-boundary resets and exact .5-cent
    values where half-away-from-zero differs from banker's rounding."""
    import pandas as pd

    from scanner_spark import streams as S
    from scanner_spark.ops import register_op
    from scanner_spark.queries import CumCentsKernel, _cum_cents_expr

    rows = []
    vals = [1.005, -2.335, 0.125, 3.0, -0.005, 7.77, 0.015, -1.115]
    for st_i in range(3):
        for i in range(40):
            rows.append((f"s{st_i}", i, vals[(i + st_i) % len(vals)] * (i + 1)))
    df = spark.createDataFrame(rows, "stream_id string, idx long, value double")
    st = S.make_stream(df, stream_col="stream_id", order_col="idx")
    sliced = S.slice_strided(st, 16)
    rows_op = register_op(CumCentsKernel, unbounded_state=True,
                          name="CumCentsRows")
    expr_op = register_op(CumCentsKernel, unbounded_state=True,
                          name="CumCentsExpr", state_expr=_cum_cents_expr)
    a = rows_op(sliced, ["value"], "c", "long").orderBy(
        "stream_id", "slice_id", "idx").select(
        "stream_id", "slice_id", "idx", "c").toPandas()
    b = expr_op(sliced, ["value"], "c", "long").orderBy(
        "stream_id", "slice_id", "idx").select(
        "stream_id", "slice_id", "idx", "c").toPandas()
    pd.testing.assert_frame_equal(a, b)
    # the expr plan must contain a window aggregate and NO Python stage
    plan = expr_op(sliced, ["value"], "c", "long")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_stencil_gapped_idx_repeat_edge(spark):
    """Round 15: the vectorized realignment must reproduce the dict
    realigner's REPEAT_EDGE min/max-key semantics when idx has GAPS
    (rowsBetween is physical rows, so window entries' relative offsets
    can fall outside [lo, hi] — they are never exact tap matches but
    still anchor the edge fallback).  No in-repo sampler produces gapped
    idx today; this pins the defensive contract directly.

    Deliberate-contract note (ADVICE r15): this freezes a counter-
    intuitive extension — a missing tap t >= min(window idx) repeats the
    window's MAX-key value even when t falls between existing keys
    before the center (idx=2's tap 1 gets idx 3's value), diverging from
    nearest-key clamping.  The reference defines REPEAT_EDGE only over
    dense rows, so either choice is an in-repo extension; this test pins
    the legacy-dict-realigner behavior.  If a gapped sampler ever
    appears, nearest-key clamping is the alternative to consider — update
    this pin deliberately rather than treating it as an oracle."""
    rows = [("0", 0, 10.0), ("0", 2, 20.0), ("0", 3, 30.0), ("0", 7, 70.0)]
    df = spark.createDataFrame(rows, "stream_id string, idx long, value double")

    @register_op(stencil=[-1, 0, 1], boundary=BoundaryMode.REPEAT_EDGE,
                 name="GapSum")
    def gap_sum(win):
        return float(sum(win))

    out = gap_sum(df, ["value"], "out", "double")
    # per row: a missing tap t repeats the window's min key iff
    # t < min(window idx), else its max key — e.g. idx=2's window is
    # {0, 2, 3}, tap t=1 is missing and 1 >= 0, so it repeats idx 3's 30
    assert vals(out, "out") == [40.0, 80.0, 120.0, 210.0]


def test_stencil_gapped_idx_null_boundary(spark):
    rows = [("0", 0, 10.0), ("0", 2, 20.0), ("0", 3, 30.0), ("0", 7, 70.0)]
    df = spark.createDataFrame(rows, "stream_id string, idx long, value double")

    @register_op(stencil=[-1, 0, 1], boundary=BoundaryMode.NULL,
                 name="GapList")
    def gap_list(win):
        return [None if v is None else float(v) for v in win]

    out = gap_list(df, ["value"], "out", "array<double>")
    assert vals(out, "out") == [
        [None, 10.0, None],
        [None, 20.0, 30.0],
        [20.0, 30.0, None],
        [None, 70.0, None],
    ]


def test_stencil_integer_input_repeat_edge(spark):
    """Round 15: pure-int64 window values take the realigner's
    zeros-null-mask branch (no NaN representation to misread)."""
    rows = [("0", i, 10 * i) for i in range(5)]
    df = spark.createDataFrame(rows, "stream_id string, idx long, value long")

    @register_op(stencil=[-1, 0, 1], boundary=BoundaryMode.REPEAT_EDGE,
                 name="IntSum")
    def int_sum(win):
        return int(sum(win))

    out = int_sum(df, ["value"], "out", "long")
    assert vals(out, "out") == [10, 30, 60, 90, 110]


def test_stencil_integer_null_center_passthrough(spark):
    """A NULL element in an int64 input column arrives as an object
    window array: the center row's kernel is skipped (NullElement
    passthrough) and neighbours see None for that tap."""
    rows = [("0", 0, 0), ("0", 1, 10), ("0", 2, None), ("0", 3, 30),
            ("0", 4, 40)]
    df = spark.createDataFrame(rows, "stream_id string, idx long, value long")

    @register_op(stencil=[-1, 0, 1], boundary=BoundaryMode.NULL,
                 name="IntNullSum")
    def nn_sum(win):
        return int(sum(v for v in win if v is not None))

    out = nn_sum(df, ["value"], "out", "long")
    assert vals(out, "out") == [10, 10, None, 70, 70]
