"""Dataflow graph builder: the reference's client surface on DataFrames.

Mirrors scannerpy's job model (reference: python/scannerpy/client.py
``run`` at client.py:1282-1590, io.py Input/Output, job.py): a user builds
Sources -> stream ops / kernels -> Sinks, binds N streams ("jobs") to the
graph, and runs it as one bulk action.

Spark-first translation (SURVEY.md §3.1): all N streams ride in ONE
DataFrame keyed by ``stream_id`` — Scanner's per-job task scheduling
becomes ordinary Spark partition parallelism, and per-stream args become
columns broadcast-joined on stream_id.  The graph is captured as node
closures over DataFrames, so "planning" is just function composition and
Catalyst sees one lazy plan per sink.

CacheMode reproduces client.py:1386-1448: Error (refuse to clobber),
Ignore (skip recompute, reuse stored output), Overwrite.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from enum import Enum

from pyspark.sql import DataFrame, functions as F

from scanner_spark import streams as S
from scanner_spark.catalog import Database
from scanner_spark.ops import Op


class CacheMode(str, Enum):
    ERROR = "error"
    IGNORE = "ignore"
    OVERWRITE = "overwrite"


class Node:
    """One op in the graph: a closure DataFrame -> DataFrame plus lineage."""

    def __init__(self, graph: "Graph", fn: Callable[[DataFrame], DataFrame], parents: list["Node"], label: str):
        self.graph = graph
        self.fn = fn
        self.parents = parents
        self.label = label

    def _resolve(self) -> DataFrame:
        if not self.parents:
            return self.fn(None)
        # single-input chains; variadic ops pre-join their inputs
        return self.fn(self.parents[0]._resolve())


class Graph:
    """Builder + runner for one dataflow graph over a Database.

    >>> g = Graph(db)
    >>> inp = g.input(["t0", "t1"])             # N streams = N jobs
    >>> sampled = g.stride(inp, 2)
    >>> hist = g.apply(histogram_op, sampled, inputs=[...], output="h", output_type="...")
    >>> g.output(hist, ["out0", "out1"])
    >>> g.run(cache_mode=CacheMode.OVERWRITE)
    """

    def __init__(self, db: Database):
        self.db = db
        self.spark = db.spark
        self._sinks: list[tuple[Node, list[str]]] = []
        self._input_names: list[str] | None = None

    # -- sources -------------------------------------------------------------
    def input(self, tables: Sequence[str] | Sequence[DataFrame], order_col: str | None = None) -> Node:
        """Bind N stored streams (by table name) or N DataFrames as the
        graph's jobs; they are unioned with stream_id = job index
        (client.py's struct-of-arrays -> one Job per stream, collapsed into
        one keyed DataFrame)."""

        def load(_: DataFrame | None) -> DataFrame:
            dfs = []
            for j, t in enumerate(tables):
                df = self.db.stream(t, order_col=order_col) if isinstance(t, str) else (
                    t if S.IDX_COL in t.columns else S.make_stream(t, None, order_col)
                )
                dfs.append(df.withColumn(S.STREAM_COL, F.lit(str(j))))
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out

        if all(isinstance(t, str) for t in tables):
            self._input_names = list(tables)
        return Node(self, load, [], "input")

    # -- stream (index-domain) ops --------------------------------------------
    def stride(self, node: Node, s: int) -> Node:
        return Node(self, lambda df: S.stride(df, s), [node], f"stride({s})")

    def range(self, node: Node, start: int, end: int) -> Node:
        return Node(self, lambda df: S.srange(df, start, end), [node], "range")

    def ranges(self, node: Node, intervals) -> Node:
        return Node(self, lambda df: S.ranges(df, intervals), [node], "ranges")

    def strided_range(self, node: Node, start: int, end: int, s: int) -> Node:
        return Node(self, lambda df: S.strided_range(df, start, end, s), [node], "strided_range")

    def gather(self, node: Node, rows) -> Node:
        return Node(self, lambda df: S.gather(df, rows), [node], "gather")

    def repeat(self, node: Node, n: int) -> Node:
        return Node(self, lambda df: S.repeat(df, n), [node], f"repeat({n})")

    def repeat_null(self, node: Node, n: int) -> Node:
        return Node(self, lambda df: S.repeat_null(df, n), [node], f"repeat_null({n})")

    def slice(self, node: Node, group_size: int = 250) -> Node:
        return Node(self, lambda df: S.slice_strided(df, group_size), [node], "slice")

    def slice_ranges(self, node: Node, intervals) -> Node:
        return Node(self, lambda df: S.slice_ranges(df, intervals), [node], "slice_ranges")

    def unslice(self, node: Node, group_size: int | None = None) -> Node:
        return Node(self, lambda df: S.unslice(df, group_size), [node], "unslice")

    # -- kernels ------------------------------------------------------------------
    def apply(
        self,
        op: Op,
        node: Node,
        inputs: Sequence[str],
        output: str,
        output_type: str = "double",
        stream_args: Sequence | None = None,
        slice_args: Sequence[Sequence] | None = None,
    ) -> Node:
        """Apply a registered kernel.  ``stream_args`` binds one arg value
        per input stream (reference new_stream/per-job args,
        kernel.h:174-180); ``slice_args`` binds per-(stream, slice) values
        (SliceList, op.py:18-21).  Args arrive as an ``args`` column the
        kernel can consume as an extra input."""

        def run(df: DataFrame) -> DataFrame:
            if stream_args is not None:
                spec = self.spark.createDataFrame(
                    [(str(j), a) for j, a in enumerate(stream_args)],
                    schema=f"{S.STREAM_COL} string, args string",
                )
                df = df.join(F.broadcast(spec), S.STREAM_COL, "left")
            if slice_args is not None:
                rows = [
                    (str(j), k, str(v))
                    for j, per_stream in enumerate(slice_args)
                    for k, v in enumerate(per_stream)
                ]
                spec = self.spark.createDataFrame(
                    rows, schema=f"{S.STREAM_COL} string, {S.SLICE_COL} long, args string"
                )
                df = df.join(F.broadcast(spec), [S.STREAM_COL, S.SLICE_COL], "left")
            return op(df, inputs, output, output_type)

        return Node(self, run, [node], f"op:{op.name}")

    def map(self, node: Node, fn: Callable[[DataFrame], DataFrame], label: str = "map") -> Node:
        """Escape hatch: arbitrary DataFrame transformation as a node."""
        return Node(self, fn, [node], label)

    # -- sinks ----------------------------------------------------------------------
    def output(self, node: Node, tables: Sequence[str]) -> Node:
        """Declare per-stream output tables (stream j -> tables[j])."""
        self._sinks.append((node, list(tables)))
        return node

    # -- execution ---------------------------------------------------------------------
    def run(self, cache_mode: CacheMode = CacheMode.ERROR) -> dict[str, DataFrame]:
        """Execute every sink.  Returns {table_name: DataFrame}.

        One Spark action per sink table; the shared upstream plan is left
        to Catalyst (and the parquet committer gives atomic per-table
        commit, mirroring the reference's committed-flag protocol).
        """
        if not self._sinks:
            raise ValueError("graph has no outputs; call g.output(...)")
        results: dict[str, DataFrame] = {}
        for node, tables in self._sinks:
            existing = [t for t in tables if self.db.has_table(t)]
            if existing and cache_mode is CacheMode.ERROR:
                raise ValueError(
                    f"output table(s) {existing} exist (CacheMode.ERROR; "
                    "pass IGNORE to reuse or OVERWRITE to replace)"
                )
            if existing and cache_mode is CacheMode.IGNORE and len(existing) == len(tables):
                for t in tables:
                    results[t] = self.db.table(t)
                continue
            df = node._resolve()
            if len(tables) > 1:
                df = df.persist()  # one upstream computation, N stream writes
            try:
                for j, t in enumerate(tables):
                    out = df.filter(F.col(S.STREAM_COL) == str(j)).drop(S.STREAM_COL)
                    self.db.write_table(t, out, overwrite=True)
                    results[t] = self.db.table(t)
            finally:
                if len(tables) > 1:
                    df.unpersist()
        return results
