"""User-op compiler: Scanner kernel attributes -> Spark physical plans.

Scanner's single computational operator is an element-wise map kernel with
declared attributes — batch, stencil (temporal window), bounded/unbounded
state, per-stream args (reference: /root/reference/scanner/api/kernel.h,
python/scannerpy/op.py:317-615, registration client.py:805-908).  This
module compiles the same attribute surface onto Spark:

==================  =======================================================
attribute           physical strategy
==================  =======================================================
(plain)             Arrow ``pandas_udf`` — JVM->Arrow->pandas batches; stays
                    inside whole-stage codegen on the JVM side
batch               the same (Arrow batching is free in Spark); batch=False
                    merely wraps a scalar fn element-wise inside the batch
stencil             ``Window.partitionBy(stream).orderBy(idx).rowsBetween``
                    + ``collect_list``; boundary REPEAT_EDGE / NULL / ERROR
                    padded in the UDF (reference: rpc.proto:254-259,
                    dag_analysis.cpp:1634-1657)
bounded state       warmup-row expansion before an ordered
                    ``applyInPandas`` group, warmup outputs discarded
                    (reference: dag_analysis.cpp:1607-1620)
unbounded state     ordered ``applyInPandas`` over the whole
                    (stream, slice) group — slice first to parallelize,
                    exactly the reference's answer
                    (dag_analysis.cpp:1621-1626)
==================  =======================================================

Scale notes: elementwise ops are narrow (no shuffle).  Stencil and stateful
ops shuffle once on (stream_id[, slice_id]); state parallelism is bounded by
slicing, same contract as the reference.  NULL payload rows (NullElements
from repeat_null spacing) pass through kernels untouched — kernels see only
non-null rows, mirroring evaluate_worker's null-element skip.
"""

from __future__ import annotations

import functools
from collections.abc import Callable, Sequence
from enum import Enum

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DataType, StructField, StructType, _parse_datatype_string

from scanner_spark.streams import IDX_COL, SLICE_COL, STREAM_COL


class BoundaryMode(str, Enum):
    """Stencil out-of-bounds handling (reference: rpc.proto:254-259)."""

    REPEAT_EDGE = "repeat_edge"
    NULL = "null"
    ERROR = "error"


def _parse_type(t: str | DataType) -> DataType:
    return t if isinstance(t, DataType) else _parse_datatype_string(t)


class Op:
    """A registered kernel; calling it rewrites a stream DataFrame."""

    def __init__(
        self,
        fn: Callable,
        *,
        batch: bool = False,
        stencil: Sequence[int] | None = None,
        bounded_state: int = 0,
        unbounded_state: bool = False,
        boundary: BoundaryMode = BoundaryMode.REPEAT_EDGE,
        name: str | None = None,
        on_error: str = "raise",
        expr: Callable | None = None,
        state_expr: Callable | None = None,
    ):
        if on_error not in ("raise", "null"):
            raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
        if bounded_state and unbounded_state:
            raise ValueError("an op is bounded- or unbounded-state, not both")
        if stencil is not None and (bounded_state or unbounded_state):
            raise ValueError("stencil and state are mutually exclusive attributes")
        if expr is not None and stencil is None:
            raise ValueError("expr fast path currently applies to stencil ops only")
        if state_expr is not None and not unbounded_state:
            raise ValueError(
                "state_expr fast path applies to unbounded-state ops only "
                "(bounded-state warmup semantics need the rows path)"
            )
        self.fn = fn
        self.batch = batch
        self.stencil = sorted(stencil) if stencil else None
        self.bounded_state = bounded_state
        self.unbounded_state = unbounded_state
        self.boundary = BoundaryMode(boundary)
        self.on_error = on_error
        # optional JVM compilation of an arithmetic stencil: a callable with
        # the SAME signature as fn but over pyspark Columns — the op then
        # compiles to lag/lead window expressions (whole-stage codegen, no
        # Python in the hot path).  fn stays as the rows-path twin.
        self.expr = expr
        # optional JVM compilation of an arithmetic UNBOUNDED-STATE kernel:
        # state_expr(cols, w) -> Column, where w is the running
        # (unboundedPreceding..currentRow) window over (stream, slice)
        # ordered by idx — e.g. a cumulative sum compiles to one window
        # aggregate in codegen instead of ordered per-group Python.
        self.state_expr = state_expr
        self.name = name or fn.__name__
        functools.update_wrapper(self, fn)

    # -- public application --------------------------------------------------
    def __call__(
        self,
        df: DataFrame,
        inputs: Sequence[str],
        output: str,
        output_type: str | DataType = "double",
    ) -> DataFrame:
        out_dt = _parse_type(output_type)
        if self.stencil is not None:
            return self._apply_stencil(df, list(inputs), output, out_dt)
        if self.unbounded_state or self.bounded_state:
            return self._apply_stateful(df, list(inputs), output, out_dt)
        return self._apply_elementwise(df, list(inputs), output, out_dt)

    # -- elementwise ----------------------------------------------------------
    def _apply_elementwise(self, df, inputs, output, out_dt) -> DataFrame:
        fn, batch = self.fn, self.batch
        null_on_error = self.on_error == "null"
        struct_out = isinstance(out_dt, StructType)

        # on_error='null' is the engine's fault-isolation analog of the
        # reference's job blacklisting (master.cpp:986-1018,1088-1096): a
        # poisoned element yields a NULL output row instead of failing the
        # whole bulk job; downstream ops skip NULLs like NullElements.
        def _safe(vals):
            try:
                return fn(*vals)
            except Exception:
                if null_on_error:
                    return None
                raise

        def _safe_batch_elem(vals):
            # batch kernels take Series; re-invoke on a singleton batch
            try:
                r = fn(*[pd.Series([v]) for v in vals])
                return r.iloc[0] if hasattr(r, "iloc") else list(r)[0]
            except Exception:
                if null_on_error:
                    return None
                raise

        def is_null(v):
            return v is None or (not hasattr(v, "__len__") and pd.isna(v))

        def _null_mask(series):
            # NullElement rows (spacing nulls) skip the kernel on BOTH the
            # scalar and the batch path — mirroring evaluate_worker's
            # null-element skip; a batch kernel must never compute on NaN
            # standing in for a NullElement.
            mask = None
            for s in series:
                m = s.isna() if s.dtype.kind in "fiumM" else s.map(is_null)
                mask = m if mask is None else (mask | m)
            return mask.to_numpy()

        def _emit(out):
            if struct_out:
                # struct-returning pandas UDFs exchange a DataFrame
                return pd.DataFrame([o if o is not None else {} for o in out])
            return pd.Series(out)

        def _run(series):
            if batch:
                mask = _null_mask(series)
                if not mask.any():
                    try:
                        res = fn(*series)
                    except Exception:
                        if not null_on_error:
                            raise
                        # batch poisoned: isolate per element
                        res = [_safe_batch_elem(vals) for vals in zip(*series)]
                    return res if struct_out else pd.Series(res)
                # invoke the kernel on the non-null subset, reinsert None at
                # masked positions (same contract as the scalar path)
                keep = ~mask
                sub = [s[keep].reset_index(drop=True) for s in series]
                if not sub[0].empty:
                    try:
                        res = fn(*sub)
                    except Exception:
                        if not null_on_error:
                            raise
                        res = [_safe_batch_elem(vals) for vals in zip(*sub)]
                    vals = (
                        res.to_dict("records")
                        if isinstance(res, pd.DataFrame)
                        else list(res)
                    )
                else:
                    vals = []
                it = iter(vals)
                out = [None if m else next(it) for m in mask]
                return _emit(out)
            # scalar kernel applied per element inside the Arrow batch —
            # Scanner's non-batched kernel path (kernel.h:135-144).
            out = [
                None if any(is_null(v) for v in vals) else _safe(vals)
                for vals in zip(*series)
            ]
            return _emit(out)

        # Spark 4 infers the UDF eval type from type hints
        if struct_out:

            def call(*series: pd.Series) -> pd.DataFrame:
                return _run(series)

        else:

            def call(*series: pd.Series) -> pd.Series:
                return _run(series)

        udf = F.pandas_udf(call, returnType=out_dt)
        return df.withColumn(output, udf(*[F.col(c) for c in inputs]))

    # -- stencil ---------------------------------------------------------------
    def _apply_stencil(self, df, inputs, output, out_dt) -> DataFrame:
        if self.expr is not None:
            return self._apply_stencil_expr(df, inputs, output, out_dt)
        lo, hi = self.stencil[0], self.stencil[-1]
        stencil = list(self.stencil)
        part = [STREAM_COL] + ([SLICE_COL] if SLICE_COL in df.columns else [])
        w = Window.partitionBy(*part).orderBy(IDX_COL).rowsBetween(lo, hi)
        # collect (idx, value) STRUCTS, not bare values: collect_list drops
        # NULL elements, so a bare-value window would silently shrink around
        # NullElement rows and misalign every neighbor; the struct row
        # survives (only its value field is NULL) and the UDF realigns by
        # absolute idx.
        win_cols = [f"__w_{c}" for c in inputs]
        out = df
        for c, wc in zip(inputs, win_cols):
            out = out.withColumn(
                wc,
                F.collect_list(
                    F.struct(F.col(IDX_COL).alias("i"), F.col(c).alias("v"))
                ).over(w),
            )
        # split each struct window into parallel (i, v) ARRAYS before the
        # UDF (round 15): Arrow then delivers the idx lists as dense
        # int64 ndarrays and the values as one ndarray per row — the UDF
        # realigns taps with numpy index arithmetic instead of building a
        # per-row Python dict per input (the last per-row cost in the
        # round-14 batch stencil path)
        split_cols: list = []
        for wc in win_cols:
            split_cols.append(F.col(wc)["i"].alias(f"{wc}_i"))
            split_cols.append(F.col(wc)["v"].alias(f"{wc}_v"))
        keep = [c for c in out.columns if c not in win_cols]
        out = out.select(*keep, *split_cols)
        flat_win_cols = [f"{wc}_{s}" for wc in win_cols for s in ("i", "v")]

        fn, boundary, name = self.fn, self.boundary, self.name
        batch = self.batch
        struct_out = isinstance(out_dt, StructType)
        lo_b, hi_b = lo, hi
        width = hi - lo + 1
        has_center = lo <= 0 <= hi

        def _flat_null(flat_v):
            if flat_v.dtype == object:
                return pd.isnull(flat_v)
            if flat_v.dtype.kind == "f":
                return np.isnan(flat_v)
            return np.zeros(flat_v.size, dtype=bool)

        def _run_stencil(idx_s, arrs):
            n = len(idx_s)
            if n == 0:
                return pd.DataFrame() if struct_out else pd.Series([], dtype=object)
            idx = idx_s.to_numpy(dtype=np.int64, copy=False)
            center_null = np.zeros(n, dtype=bool)
            per_input: list = []  # [input] -> [tap] -> object array (len n)
            for k in range(0, len(arrs), 2):
                iarrs = arrs[k].to_numpy()
                varrs = arrs[k + 1].to_numpy()
                lengths = np.fromiter((a.size for a in iarrs), np.int64, n)
                total = int(lengths.sum())
                offsets = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(lengths, out=offsets[1:])
                flat_i = (
                    np.concatenate(iarrs).astype(np.int64, copy=False)
                    if total
                    else np.empty(0, np.int64)
                )
                flat_v = (
                    np.concatenate(varrs) if total else np.empty(0, object)
                )
                flat_null = _flat_null(flat_v)
                row_ids = np.repeat(np.arange(n), lengths)
                rel = flat_i - idx[row_ids]
                # rowsBetween is PHYSICAL rows: with idx gaps a window
                # entry's rel offset can fall outside [lo, hi]; such
                # entries are never exact tap matches (tap targets are
                # idx+s, s in stencil ⊆ [lo, hi]) but still anchor the
                # REPEAT_EDGE first/last fallback, exactly like the old
                # dict's min/max keys
                pos = np.full((n, width), -1, dtype=np.int64)
                in_band = (rel >= lo_b) & (rel <= hi_b)
                pos[row_ids[in_band], rel[in_band] - lo_b] = np.flatnonzero(
                    in_band
                )
                nonempty = lengths > 0
                first_j = offsets[:-1]
                last_j = offsets[1:] - 1
                first_rel = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
                first_rel[nonempty] = rel[first_j[nonempty]]
                if has_center:
                    j0 = pos[:, -lo_b]
                    center_null |= (j0 >= 0) & flat_null[np.maximum(j0, 0)]
                taps: list = []
                for s in stencil:
                    j = pos[:, s - lo_b]
                    missing = j < 0
                    if boundary is BoundaryMode.ERROR and missing.any():
                        raise ValueError(
                            f"op {name}: stencil out of bounds at "
                            f"idx={int(idx[int(missing.argmax())])}"
                        )
                    if boundary is BoundaryMode.REPEAT_EDGE:
                        fallback = np.where(s < first_rel, first_j, last_j)
                        j_eff = np.where(missing & nonempty, fallback, j)
                        as_null = missing & ~nonempty
                    else:  # NULL (ERROR raised above)
                        j_eff = j
                        as_null = missing
                    safe_j = np.maximum(j_eff, 0)
                    vals = np.empty(n, dtype=object)
                    if total:
                        vals[:] = flat_v[safe_j]
                        vals[as_null | flat_null[safe_j]] = None
                    else:
                        vals[:] = None
                    taps.append(vals)
                per_input.append(taps)

            res: list = []
            batch_args, batch_slots = [], []  # batch kernels: deferred
            n_taps = len(stencil)
            for i in range(n):
                if center_null[i]:
                    # NullElement passthrough: a null payload on the row
                    # itself skips the kernel (window neighbors may still
                    # legitimately be None inside other rows' stencils)
                    res.append(None)
                    continue
                padded = [
                    [taps[t][i] for t in range(n_taps)] for taps in per_input
                ]
                if batch:
                    # batch stencil kernel (round 14): ONE call per Arrow
                    # batch with the aligned-tap argument tuples — the
                    # kernel vectorizes across rows (per-row numpy
                    # dispatch on small frames was the dominant cost)
                    res.append(None)
                    batch_slots.append(len(res) - 1)
                    batch_args.append(padded)
                else:
                    res.append(fn(*padded))
            if batch and batch_args:
                outs = fn(batch_args)
                for j, o in zip(batch_slots, outs):
                    res[j] = o
            if struct_out:
                return pd.DataFrame([o if o is not None else {} for o in res])
            return pd.Series(res)

        if struct_out:

            def call(idx_s: pd.Series, *arrs: pd.Series) -> pd.DataFrame:
                return _run_stencil(idx_s, arrs)

        else:

            def call(idx_s: pd.Series, *arrs: pd.Series) -> pd.Series:
                return _run_stencil(idx_s, arrs)

        udf = F.pandas_udf(call, returnType=out_dt)
        out = out.withColumn(
            output, udf(F.col(IDX_COL), *[F.col(c) for c in flat_win_cols])
        )
        return out.drop(*flat_win_cols)

    def _apply_stencil_expr(self, df, inputs, output, out_dt) -> DataFrame:
        """JVM fast path for arithmetic stencils: each stencil tap compiles
        to a ``lag``/``lead`` window expression and boundary handling to a
        CASE over the partition's min/max idx — the whole op stays inside
        whole-stage codegen (no Python, no collect_list).  Semantics are
        identical to the rows path: out-of-partition taps REPEAT_EDGE to
        the partition's first/last VALUE, NULL taps pass NULL payloads
        through untouched (lag/lead already return NULL both out of bounds
        and for genuine NULL payloads, which is exactly the NULL-boundary
        contract)."""
        part = [STREAM_COL] + ([SLICE_COL] if SLICE_COL in df.columns else [])
        w = Window.partitionBy(*part).orderBy(IDX_COL)
        wp = Window.partitionBy(*part)
        wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        min_i, max_i = F.min(IDX_COL).over(wp), F.max(IDX_COL).over(wp)
        per_input = []
        for c in inputs:
            vals = []
            for s in self.stencil:
                raw = (
                    F.col(c)
                    if s == 0
                    else (F.lag(c, -s).over(w) if s < 0 else F.lead(c, s).over(w))
                )
                tgt = F.col(IDX_COL) + F.lit(s)
                if self.boundary is BoundaryMode.REPEAT_EDGE:
                    v = (
                        F.when(tgt < min_i, F.first(c).over(wfull))
                        .when(tgt > max_i, F.last(c).over(wfull))
                        .otherwise(raw)
                    )
                elif self.boundary is BoundaryMode.NULL:
                    v = raw
                else:  # ERROR
                    v = F.when(
                        (tgt < min_i) | (tgt > max_i),
                        F.raise_error(
                            F.concat(
                                F.lit(f"op {self.name}: stencil out of bounds at idx="),
                                F.col(IDX_COL).cast("string"),
                            )
                        ),
                    ).otherwise(raw)
                vals.append(v)
            per_input.append(vals)
        return df.withColumn(output, self.expr(*per_input).cast(out_dt))

    # -- stateful ---------------------------------------------------------------
    def _apply_stateful(self, df, inputs, output, out_dt) -> DataFrame:
        """Ordered per-(stream, slice) execution WITHOUT per-group Python
        round-trips: hash-repartition on the group key, sort within
        partitions, then stream every group of a partition through ONE
        ``mapInPandas`` worker (a streaming group-by over the Arrow batch
        iterator).  With many small slices this beats ``applyInPandas`` by
        the per-group invocation overhead; parallelism is unchanged (all
        of a group's rows land in one partition)."""
        if self.state_expr is not None and self.on_error == "raise":
            # JVM fast path: the kernel is a running window expression —
            # one hash partition on the group key + per-partition sort,
            # evaluated in whole-stage codegen (the on_error='null'
            # blacklisting contract needs the Python rows path)
            part = [STREAM_COL] + (
                [SLICE_COL] if SLICE_COL in df.columns else []
            )
            w = (
                Window.partitionBy(*part)
                .orderBy(IDX_COL)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return df.withColumn(
                output,
                self.state_expr([F.col(c) for c in inputs], w).cast(out_dt),
            )
        part = [STREAM_COL] + ([SLICE_COL] if SLICE_COL in df.columns else [])
        out_schema = StructType(list(df.schema.fields) + [StructField(output, out_dt, True)])
        fn = self.fn
        null_on_error = self.on_error == "null"

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            kernel = fn() if isinstance(fn, type) else fn
            if hasattr(kernel, "reset"):
                kernel.reset()  # fresh state per (stream, slice) group
            exec_fn = kernel.execute if hasattr(kernel, "execute") else kernel
            try:
                result = exec_fn(pdf[inputs] if len(inputs) > 1 else pdf[inputs[0]])
            except Exception:
                if not null_on_error:
                    raise
                # stream/slice "blacklisted" (reference master.cpp:986-1018):
                # its whole group emits NULL outputs; other groups proceed
                result = [None] * len(pdf)
            pdf = pdf.copy()
            pdf[output] = list(result)
            return pdf

        def run_partition(batches):
            # streaming group-by: groups arrive contiguously (sorted within
            # the partition); buffer only the current group across batch
            # boundaries — memory is bounded by group size, as with
            # applyInPandas, but one Python worker handles ALL groups.
            pending: pd.DataFrame | None = None
            for pdf in batches:
                if pdf.empty:
                    continue
                keys = pdf[part].apply(tuple, axis=1)
                boundaries = keys.ne(keys.shift()).to_numpy().nonzero()[0]
                start_positions = list(boundaries) + [len(pdf)]
                for i in range(len(start_positions) - 1):
                    chunk = pdf.iloc[start_positions[i] : start_positions[i + 1]]
                    if pending is not None and i == 0 and tuple(pending[part].iloc[-1]) == tuple(chunk[part].iloc[0]):
                        pending = pd.concat([pending, chunk], ignore_index=True)
                        continue
                    if pending is not None:
                        yield run_group(pending)
                    pending = chunk.reset_index(drop=True)
            if pending is not None:
                yield run_group(pending)

        # explicit partition count: AQE's byte-size coalescing would fold a
        # few-MB shuffle into ONE partition and serialize the Python stage —
        # bytes are the wrong cost model for kernel-bound work
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
        prepared = df.repartition(n, *[F.col(c) for c in part]).sortWithinPartitions(
            *part, IDX_COL
        )
        return prepared.mapInPandas(run_partition, schema=out_schema)

    # -- bounded-state warmup over a gathered subset ------------------------------
    def apply_gather_with_warmup(
        self,
        df: DataFrame,
        rows: Sequence[int],
        inputs: Sequence[str],
        output: str,
        output_type: str | DataType = "double",
    ) -> DataFrame:
        """Run a bounded-state kernel for a gathered row subset with warmup.

        Scanner's scheduler prepends ``warmup`` rows before each requested
        row run and discards their outputs (dag_analysis.cpp:1607-1620;
        expected behavior tests/py_test.py:407-424: gather [0,10,25,26,27]
        with warmup w -> [0, w, w, w+1, w+2]).  Driver-side: expand each
        requested idx r to [max(0, r-w), r], merge overlapping expansions
        into runs (state carries *within* a run, resets *between* runs —
        each run starts from a reset kernel, exactly the reference).
        """
        if not self.bounded_state:
            raise ValueError("warmup gather only applies to bounded-state ops")
        w = self.bounded_state
        # merge [r-w, r] intervals into maximal runs (literal spec, driver-side)
        wanted = sorted(set(int(r) for r in rows))
        runs: list[list[int]] = []
        for r in wanted:
            lo = max(0, r - w)
            if runs and lo <= runs[-1][1] + 1:
                runs[-1][1] = max(runs[-1][1], r)
            else:
                runs.append([lo, r])
        spark = df.sparkSession
        run_spec = spark.createDataFrame(
            [(rid, lo, hi) for rid, (lo, hi) in enumerate(runs)],
            schema="__run long, __lo long, __hi long",
        )
        expanded = df.join(
            F.broadcast(run_spec),
            (F.col(IDX_COL) >= F.col("__lo")) & (F.col(IDX_COL) <= F.col("__hi")),
            "inner",
        )
        out_dt = _parse_type(output_type)
        base_fields = [f for f in expanded.schema.fields]
        out_schema = StructType(base_fields + [StructField(output, out_dt, True)])
        fn, inputs = self.fn, list(inputs)

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(IDX_COL).reset_index(drop=True)
            kernel = fn() if isinstance(fn, type) else fn
            if hasattr(kernel, "reset"):
                kernel.reset()
            exec_fn = kernel.execute if hasattr(kernel, "execute") else kernel
            result = exec_fn(pdf[inputs] if len(inputs) > 1 else pdf[inputs[0]])
            pdf[output] = list(result)
            return pdf

        part = [STREAM_COL, "__run"]
        ran = expanded.groupBy(*part).applyInPandas(run_group, schema=out_schema)
        # keep only requested rows, re-identify by position in the request
        # list (gather preserves requested order/duplicates, sampler.cpp:283-299)
        pos = spark.createDataFrame(
            [(i, int(r)) for i, r in enumerate(rows)], schema="__pos long, __want long"
        )
        out = (
            ran.join(F.broadcast(pos), F.col(IDX_COL) == F.col("__want"), "inner")
            .drop(IDX_COL, "__want", "__run", "__lo", "__hi")
            .withColumnRenamed("__pos", IDX_COL)
        )
        rest = [c for c in out.columns if c not in (STREAM_COL, IDX_COL)]
        return out.select(STREAM_COL, IDX_COL, *rest)


def register_op(
    fn: Callable | None = None,
    *,
    batch: bool = False,
    stencil: Sequence[int] | None = None,
    bounded_state: int = 0,
    unbounded_state: bool = False,
    boundary: BoundaryMode = BoundaryMode.REPEAT_EDGE,
    name: str | None = None,
    on_error: str = "raise",
    expr: Callable | None = None,
    state_expr: Callable | None = None,
):
    """Decorator mirroring ``@scannerpy.register_python_op`` (reference:
    python/scannerpy/op.py:317-615) with the same attribute surface.

    ``expr``: optional Column-level twin of ``fn`` for arithmetic stencil
    kernels — when given, the stencil compiles to JVM lag/lead expressions
    instead of a collect_list + pandas UDF.

    ``state_expr``: optional Column-level twin for arithmetic
    UNBOUNDED-STATE kernels — ``state_expr(cols, w) -> Column`` with
    ``w`` the running (unboundedPreceding..currentRow) window over
    (stream, slice) ordered by idx; the op then compiles to one codegen
    window aggregate instead of ordered per-group Python (used when
    ``on_error='raise'``; blacklisting keeps the rows path)."""

    def wrap(f):
        return Op(
            f,
            batch=batch,
            stencil=stencil,
            bounded_state=bounded_state,
            unbounded_state=unbounded_state,
            boundary=boundary,
            name=name,
            on_error=on_error,
            expr=expr,
            state_expr=state_expr,
        )

    return wrap(fn) if fn is not None else wrap
