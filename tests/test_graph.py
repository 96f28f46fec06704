"""Graph builder job semantics (reference: py_test.py job tests —
multi-stream jobs, CacheMode, per-stream/per-slice args)."""

import pytest
from pyspark.sql import functions as F

from scanner_spark.catalog import Database
from scanner_spark.ops import register_op
from scanner_spark.plans import CacheMode, Graph


@pytest.fixture()
def db(spark, tmp_path):
    d = Database(spark, str(tmp_path / "db"))
    for j in range(2):
        rows = [{"idx": i, "value": float(100 * j + i)} for i in range(20)]
        d.new_table(f"in{j}", rows, schema="idx long, value double")
    return d


def test_sparse_load_rows_and_ranges(spark, tmp_path):
    from scanner_spark.catalog import Database, sparse_load

    d = Database(spark, str(tmp_path / "db"))
    rows = [{"idx": i, "value": float(i), "other": "x" * 5} for i in range(500)]
    d.new_table("t", rows, schema="idx long, value double, other string")
    # dense run (gaps < threshold), isolated points, plus a half-open range
    got = d.load(
        "t",
        columns=["idx", "value"],
        rows=[3, 4, 5, 9, 200, 401],
        ranges=[(100, 110)],
    )
    assert got.columns == ["idx", "value"]  # projection pruned
    idxs = sorted(r.idx for r in got.collect())
    assert idxs == [3, 4, 5, 9, 100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 200, 401]
    # predicates reach the parquet scan (row-group prunable at scale)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "Or(" in plan
    # gap-coalescing must never return unrequested rows
    exact = sparse_load(d.table("t"), rows=[0, 7, 14], idx_col="idx")
    assert sorted(r.idx for r in exact.collect()) == [0, 7, 14]
    # missing index column is an explicit error
    with pytest.raises(ValueError, match="index column"):
        sparse_load(d.table("t").drop("idx"), rows=[1])
    # explicit EMPTY requests mean zero rows, not the whole table
    assert sparse_load(d.table("t"), rows=[]).count() == 0
    assert sparse_load(d.table("t"), ranges=[]).count() == 0
    assert sparse_load(d.table("t"), rows=[], ranges=[]).count() == 0
    # and rows=[] combined with a real range still returns the range
    assert sparse_load(d.table("t"), rows=[], ranges=[(5, 8)]).count() == 3


def test_coalesce_rows_heuristic():
    from scanner_spark.catalog import _coalesce_rows

    # pure dense run -> one exact interval
    assert _coalesce_rows([1, 2, 3, 4], 8) == ([(1, 4)], [], True)
    # sub-threshold gaps merge (inexact); isolated rows stay singles
    iv, si, exact = _coalesce_rows([1, 3, 5, 50, 100, 101], 8)
    assert iv == [(1, 5), (100, 101)] and si == [50] and not exact
    # gap >= threshold splits
    iv, si, exact = _coalesce_rows([1, 9, 17], 8)
    assert iv == [] and si == [1, 9, 17] and exact


def test_multi_stream_job_with_sampler(db):
    g = Graph(db)
    inp = g.input(["in0", "in1"], order_col="idx")
    sampled = g.stride(inp, 5)
    g.output(sampled, ["out0", "out1"])
    res = g.run()
    v0 = [r.value for r in res["out0"].orderBy("idx").collect()]
    v1 = [r.value for r in res["out1"].orderBy("idx").collect()]
    assert v0 == [0.0, 5.0, 10.0, 15.0]
    assert v1 == [100.0, 105.0, 110.0, 115.0]


def test_cache_mode_semantics(db):
    g = Graph(db)
    g.output(g.stride(g.input(["in0"], order_col="idx"), 2), ["out"])
    g.run()
    # ERROR refuses to clobber
    g2 = Graph(db)
    g2.output(g2.stride(g2.input(["in0"], order_col="idx"), 2), ["out"])
    with pytest.raises(ValueError, match="CacheMode.ERROR"):
        g2.run()
    # IGNORE reuses without recompute
    res = g2.run(cache_mode=CacheMode.IGNORE)
    assert res["out"].count() == 10
    # OVERWRITE replaces
    g3 = Graph(db)
    g3.output(g3.stride(g3.input(["in0"], order_col="idx"), 4), ["out"])
    res = g3.run(cache_mode=CacheMode.OVERWRITE)
    assert res["out"].count() == 5


def test_per_stream_args(db):
    # reference: per-job args via new_stream (py_test.py:379-405)
    @register_op(batch=True)
    def tag(values, args):
        return args

    g = Graph(db)
    inp = g.input(["in0", "in1"], order_col="idx")
    tagged = g.apply(tag, inp, inputs=["value", "args"], output="tag",
                     output_type="string", stream_args=["alpha", "beta"])
    g.output(tagged, ["t0", "t1"])
    res = g.run(cache_mode=CacheMode.OVERWRITE)
    assert {r.tag for r in res["t0"].collect()} == {"alpha"}
    assert {r.tag for r in res["t1"].collect()} == {"beta"}


def test_per_slice_args(db):
    # reference: SliceList args (py_test.py test_slice_args)
    @register_op(batch=True)
    def tag(values, args):
        return args

    g = Graph(db)
    inp = g.input(["in0"], order_col="idx")
    sliced = g.slice(inp, 10)
    tagged = g.apply(tag, sliced, inputs=["value", "args"], output="tag",
                     output_type="string", slice_args=[["s0", "s1"]])
    out = g.unslice(tagged, 10)
    g.output(out, ["sliced_out"])
    res = g.run(cache_mode=CacheMode.OVERWRITE)
    rows = res["sliced_out"].orderBy("idx").collect()
    assert [r.tag for r in rows] == ["s0"] * 10 + ["s1"] * 10


def test_multiple_sinks_single_upstream(db):
    g = Graph(db)
    inp = g.input(["in0", "in1"], order_col="idx")
    r = g.range(inp, 0, 3)
    g.output(r, ["a0", "a1"])
    res = g.run(cache_mode=CacheMode.OVERWRITE)
    assert res["a0"].count() == 3 and res["a1"].count() == 3
