"""Index-domain stream operators (Scanner's sample/space/slice algebra).

A *stream* is a DataFrame with a ``stream_id`` column (any type), a dense
``idx: long`` column (row identity 0..N-1 within each stream), and arbitrary
value columns.  Scanner's sampling/spacing operators re-map row *indices*,
not values (reference semantics: /root/reference/scanner/engine/sampler.cpp,
/root/reference/python/scannerpy/streams.py); here each is a closed-form
DataFrame rewrite.

Scale notes
-----------
Every sampler except ``gather`` is a **narrow** transformation: because
upstream ``idx`` is dense, the downstream index is a closed-form function of
the upstream index (``idx // stride``, ``idx - start + base_offset``, ...),
so no shuffle, no window, no join — the rewrite survives any scale-up and
filters push down to the parquet scan.  ``gather`` broadcasts the requested
index list (small by construction: it is literal user input) so it is also
shuffle-free.  ``unslice`` with non-uniform slice sizes needs slice lengths;
those are computed with one tiny aggregate over slice ids (#slices rows, not
#rows) and broadcast back.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

STREAM_COL = "stream_id"
IDX_COL = "idx"
SLICE_COL = "slice_id"


# Catalyst-stats size above which the DEFAULT make_stream dispatches to the
# distributed two-pass layout.  A `row_number() OVER (PARTITION BY stream)`
# funnels each stream through ONE task; once the input exceeds roughly a
# shuffle-partition's worth of bytes, that task is a straggler (and at 100 TB
# an OOM), so the default path must never plan it.
AUTO_DISTRIBUTE_BYTES = 128 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate in bytes — file sizes for
    scans, computed stats for synthetic relations.  No job is run."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def make_stream(
    df: DataFrame,
    stream_col: str | None = None,
    order_col: str | None = None,
    distribute: bool | str = "auto",
    distribute_threshold: int = AUTO_DISTRIBUTE_BYTES,
    num_partitions: int | None = None,
) -> DataFrame:
    """Materialize dense row identity on an arbitrary DataFrame.

    Scanner tables have positional row identity (dense index 0..N-1,
    reference: scanner/metadata.proto:120-128); Spark rows do not, so the
    engine materializes ``idx`` explicitly.  Two physical strategies, both
    hash-identical (checked by ``scanner_all_distributed`` sharing
    ``scanner_all``'s oracle):

    - small inputs: one ``row_number`` window per stream — a single shuffle,
      lowest constant cost, but each stream is ONE task;
    - large inputs: :func:`make_stream_distributed` — windows bounded by
      physical partition, never by stream size (the reference's analog:
      master.cpp:1555-1607 chunks output domains so a stream is never one
      task).

    ``distribute="auto"`` (the default) picks by Catalyst's plan-stats size
    estimate — no job is run for the decision; ``True``/``False`` force a
    strategy.
    """
    if distribute is True or (
        distribute == "auto" and plan_size_bytes(df) > distribute_threshold
    ):
        return make_stream_distributed(df, stream_col, order_col, num_partitions)
    if stream_col is None:
        df = df.withColumn(STREAM_COL, F.lit("0"))
    elif stream_col != STREAM_COL:
        df = df.withColumn(STREAM_COL, F.col(stream_col))
    if order_col is None:
        order_col = IDX_COL if IDX_COL in df.columns else df.columns[0]
    w = Window.partitionBy(STREAM_COL).orderBy(F.col(order_col).asc())
    return df.withColumn(IDX_COL, F.row_number().over(w) - F.lit(1))


# cached range-partition layouts from make_stream_distributed; the newest
# call evicts the previous one so repeated calls can't leak storage memory
_PERSISTED_LAYOUTS: list[DataFrame] = []


def release_cached() -> None:
    """Drop any partition layout still cached by make_stream_distributed."""
    while _PERSISTED_LAYOUTS:
        cached = _PERSISTED_LAYOUTS.pop()
        try:
            cached.unpersist(blocking=False)
        except Exception:
            pass  # owning session already stopped; its blocks are gone


def make_stream_distributed(
    df: DataFrame,
    stream_col: str | None = None,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Scale path for ``make_stream``: dense row identity WITHOUT a
    per-stream window.

    ``make_stream``'s ``row_number() OVER (PARTITION BY stream)`` funnels
    each stream through ONE task — fine for many small streams, a
    straggler for a 100 TB table with a handful of giant streams.  This
    variant computes the same index in two passes, both fully parallel:

    1. range-partition by (stream, order) and stamp the physical partition
       id (persisted, so the layout is computed once);
    2. aggregate per-(partition, stream) row counts — #partitions x
       #streams rows, tiny — cumulate them into per-partition base
       offsets on the driver, broadcast-join them back, and window only
       WITHIN (partition, stream): window state is bounded by partition
       size, never by stream size.

    Same contract as ``make_stream`` (order ties must not straddle
    partitions — range partitioning keeps equal keys together)."""
    if stream_col is None:
        df = df.withColumn(STREAM_COL, F.lit("0"))
    elif stream_col != STREAM_COL:
        df = df.withColumn(STREAM_COL, F.col(stream_col))
    if order_col is None:
        order_col = IDX_COL if IDX_COL in df.columns else df.columns[0]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, F.col(STREAM_COL), F.col(order_col).asc())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    # bound cache accumulation in long-lived sessions: at most one layout
    # stays cached; the previous call's blocks are dropped here (callers can
    # also force-release via release_cached())
    release_cached()
    _PERSISTED_LAYOUTS.append(parted)
    counts = (
        parted.groupBy("__pid", STREAM_COL)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    by_stream: dict = {}
    for r in sorted(counts, key=lambda r: (str(r[STREAM_COL]), r["__pid"])):
        sid = r[STREAM_COL]
        base = by_stream.setdefault(sid, [])
        prev = base[-1][1] + base[-1][2] if base else 0
        base.append((r["__pid"], prev, r["__n"]))
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    stream_field = parted.schema[STREAM_COL]
    spec = parted.sparkSession.createDataFrame(
        [(pid, sid, off) for sid, rows in by_stream.items() for pid, off, _ in rows],
        schema=StructType(
            [
                StructField("__pid", IntegerType()),
                StructField(STREAM_COL, stream_field.dataType),
                StructField("__base", LongType()),
            ]
        ),
    )
    w = Window.partitionBy("__pid", STREAM_COL).orderBy(F.col(order_col).asc())
    out = (
        parted.join(F.broadcast(spec), ["__pid", STREAM_COL], "inner")
        .withColumn(IDX_COL, F.col("__base") + F.row_number().over(w) - F.lit(1))
        .drop("__pid", "__base")
    )
    return out


def _reorder(df: DataFrame) -> DataFrame:
    """Put (stream_id, idx) first for readability; value columns follow."""
    rest = [c for c in df.columns if c not in (STREAM_COL, IDX_COL)]
    return df.select(STREAM_COL, IDX_COL, *rest)


# ---------------------------------------------------------------------------
# Sampling (subset the index domain)
# ---------------------------------------------------------------------------

def sample_all(df: DataFrame) -> DataFrame:
    """Identity sampler (reference: sampler.cpp:33-76)."""
    return df


def stride(df: DataFrame, s: int) -> DataFrame:
    """Keep every s-th row: downstream i <- upstream i*s.

    Reference: streams.py:90-120, sampler.cpp:78-138.  Narrow: new idx is
    ``idx / s`` — no reindexing shuffle needed because upstream idx is dense.
    """
    if s <= 0:
        raise ValueError(f"stride must be positive, got {s}")
    out = df.filter(F.col(IDX_COL) % s == 0).withColumn(
        IDX_COL, (F.col(IDX_COL) / s).cast("long")
    )
    return _reorder(out)


def srange(df: DataFrame, start: int, end: int) -> DataFrame:
    """Rows [start, end): downstream i <- upstream start+i.

    Reference: streams.py:122-161.  Narrow filter + shift.
    """
    out = df.filter((F.col(IDX_COL) >= start) & (F.col(IDX_COL) < end)).withColumn(
        IDX_COL, F.col(IDX_COL) - F.lit(start)
    )
    return _reorder(out)


def strided_range(df: DataFrame, start: int, end: int, s: int) -> DataFrame:
    """Strided rows of [start, end): i <- start + i*s.

    Reference: streams.py:205-244, sampler.cpp:140-263.
    """
    if s <= 0:
        raise ValueError(f"stride must be positive, got {s}")
    cond = (
        (F.col(IDX_COL) >= start)
        & (F.col(IDX_COL) < end)
        & ((F.col(IDX_COL) - start) % s == 0)
    )
    out = df.filter(cond).withColumn(
        IDX_COL, ((F.col(IDX_COL) - start) / s).cast("long")
    )
    return _reorder(out)


def _range_bases(intervals: Sequence[tuple[int, int]], s: int = 1) -> list[int]:
    """Cumulative downstream base offset of each interval (driver-side
    arithmetic over the literal spec — #intervals values, never data)."""
    bases, acc = [], 0
    for lo, hi in intervals:
        bases.append(acc)
        n = max(0, hi - lo)
        acc += (n + s - 1) // s
    return bases


def ranges(df: DataFrame, intervals: Sequence[tuple[int, int]]) -> DataFrame:
    """Concatenation of [lo, hi) ranges, overlap allowed.

    Reference: streams.py:163-203.  Implemented as a union of per-range
    narrow filters with a precomputed base offset per range — preserves
    duplicates for overlapping ranges and never shuffles.
    """
    return strided_ranges(df, intervals, 1)


def strided_ranges(
    df: DataFrame, intervals: Sequence[tuple[int, int]], s: int
) -> DataFrame:
    """Strided concatenation of ranges (reference: streams.py:246-285,
    sampler.cpp:140-263)."""
    if s <= 0:
        raise ValueError(f"stride must be positive, got {s}")
    if not intervals:
        raise ValueError("strided_ranges needs at least one interval")
    bases = _range_bases(intervals, s)
    parts = []
    for (lo, hi), base in zip(intervals, bases):
        cond = (
            (F.col(IDX_COL) >= lo)
            & (F.col(IDX_COL) < hi)
            & ((F.col(IDX_COL) - lo) % s == 0)
        )
        parts.append(
            df.filter(cond).withColumn(
                IDX_COL,
                (F.lit(base) + (F.col(IDX_COL) - lo) / s).cast("long"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _reorder(out)


def gather(df: DataFrame, rows: Sequence[int], validate: bool = False) -> DataFrame:
    """Arbitrary row selection preserving the *requested* order:
    downstream i <- rows[i].

    Reference: streams.py:287-317, sampler.cpp:265-334 (order preserved —
    sampler.cpp:283-299).  The request list is literal user input, hence
    small: build a (pos, want) DataFrame and broadcast-join it, so the big
    side never shuffles.  Duplicate requests duplicate rows, as in the
    reference.

    ``validate=True`` reproduces the reference's out-of-bounds error
    (sampler.cpp:183-199) with one eager aggregate over the stream lengths
    (#streams rows); the default stays lazy and silently drops OOB indices.
    """
    spark = df.sparkSession
    want = spark.createDataFrame(
        [(i, int(r)) for i, r in enumerate(rows)], schema="__pos long, __want long"
    )
    if validate:
        mx = max(int(r) for r in rows)
        short = (
            df.groupBy(STREAM_COL)
            .agg(F.max(IDX_COL).alias("__n"))
            .filter(F.col("__n") < mx)
            .collect()
        )
        if short:
            raise IndexError(
                f"gather index {mx} out of bounds for stream(s) "
                f"{[r[STREAM_COL] for r in short]} (len {[r['__n'] + 1 for r in short]})"
            )
    out = (
        df.join(F.broadcast(want), F.col(IDX_COL) == F.col("__want"), "inner")
        .drop(IDX_COL, "__want")
        .withColumnRenamed("__pos", IDX_COL)
    )
    return _reorder(out)


# ---------------------------------------------------------------------------
# Spacing (grow the index domain)
# ---------------------------------------------------------------------------

def repeat(df: DataFrame, n: int) -> DataFrame:
    """Repeat every row n times: output length n*N, downstream idx
    ``up_idx*n + offset``.

    Reference: streams.py:351-380, sampler.cpp:400-454.  Narrow:
    explode a literal 0..n-1 sequence.
    """
    if n <= 0:
        raise ValueError(f"repeat factor must be positive, got {n}")
    out = df.withColumn("__off", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    out = out.withColumn(
        IDX_COL, (F.col(IDX_COL) * n + F.col("__off")).cast("long")
    ).drop("__off")
    return _reorder(out)


def repeat_null(df: DataFrame, n: int, value_cols: Sequence[str] | None = None) -> DataFrame:
    """Space rows n apart with NULL elements between: output row j carries
    upstream row j/n when ``j % n == 0``, else a NullElement (all value
    columns NULL).

    Reference: streams.py:320-349, sampler.cpp:337-397 (the -1 upstream
    mapping at sampler.cpp:384-387 is what materializes here as NULLs);
    NullElement model: python/scannerpy/storage.py:8-16.  Narrow transform.
    """
    if n <= 0:
        raise ValueError(f"spacing factor must be positive, got {n}")
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in (STREAM_COL, IDX_COL)]
    out = df.withColumn("__off", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    for c in value_cols:
        out = out.withColumn(
            c, F.when(F.col("__off") == 0, F.col(c)).otherwise(F.lit(None))
        )
    out = out.withColumn(
        IDX_COL, (F.col(IDX_COL) * n + F.col("__off")).cast("long")
    ).drop("__off")
    return _reorder(out)


# ---------------------------------------------------------------------------
# Slice / Unslice (partitioned sub-stream execution)
# ---------------------------------------------------------------------------

def slice_strided(df: DataFrame, group_size: int = 250) -> DataFrame:
    """Partition each stream into contiguous groups of ``group_size`` rows;
    adds ``slice_id`` and rebases ``idx`` within the slice.

    Reference: streams.py:23-48, partitioner.py:6-55 (default group 250 at
    partitioner.py:4), sampler.cpp:505-583.  Narrow: slice id and local idx
    are modular arithmetic on the dense index.  Downstream stateful ops key
    their groups by (stream_id, slice_id) — this is how Scanner (and this
    engine) parallelizes unbounded-state kernels.
    """
    if group_size <= 0:
        raise ValueError(f"group_size must be positive, got {group_size}")
    out = df.withColumn(
        SLICE_COL, (F.col(IDX_COL) / group_size).cast("long")
    ).withColumn(IDX_COL, F.col(IDX_COL) % group_size)
    return out


def slice_ranges(df: DataFrame, intervals: Sequence[tuple[int, int]]) -> DataFrame:
    """Partition by explicit (possibly overlapping) [lo, hi) ranges — one
    slice per range, rows duplicated into every covering slice.

    Reference: overlapping-slice behavior verified by the reference's test
    at tests/py_test.py:361-377 (ranges (0,15),(5,25),(15,35) -> 30 rows).
    Implemented as a union of narrow filters (interval list is literal).
    """
    parts = []
    for k, (lo, hi) in enumerate(intervals):
        parts.append(
            df.filter((F.col(IDX_COL) >= lo) & (F.col(IDX_COL) < hi))
            .withColumn(SLICE_COL, F.lit(k).cast("long"))
            .withColumn(IDX_COL, F.col(IDX_COL) - F.lit(lo))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def srange_per_slice(df: DataFrame, slice_specs: Sequence[tuple[int, int]]) -> DataFrame:
    """Per-slice Range with a ``SliceList`` of (start, end) specs — slice k
    keeps its local rows [start_k, end_k), rebased to 0.

    Reference: per-slice sampler args via SliceList (python/scannerpy/op.py:18-21),
    behavior fixed by tests/py_test.py:361-377 (slices (0,15),(5,25),(15,35)
    sampled with [(0,10),(5,15),(5,15)] -> 30 rows).  Narrow union of
    literal filters, like `ranges`.
    """
    if SLICE_COL not in df.columns:
        raise ValueError("srange_per_slice requires a sliced stream")
    parts = []
    for k, (lo, hi) in enumerate(slice_specs):
        parts.append(
            df.filter(
                (F.col(SLICE_COL) == k) & (F.col(IDX_COL) >= lo) & (F.col(IDX_COL) < hi)
            ).withColumn(IDX_COL, F.col(IDX_COL) - F.lit(lo))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def unslice(df: DataFrame, group_size: int | None = None) -> DataFrame:
    """Concatenate sub-streams back into one dense stream in slice order.

    Reference: streams.py:50-63, unslice_op row remap
    scanner/engine/dag_analysis.cpp:1572-1597.

    With a uniform ``group_size`` (the strided partitioner) the global index
    is closed-form (``slice_id*group_size + idx``) and the op stays narrow.
    Otherwise slice lengths are aggregated (#slices rows — tiny) and
    broadcast back to compute per-slice base offsets.
    """
    if SLICE_COL not in df.columns:
        raise ValueError("unslice requires a slice_id column (apply slice_* first)")
    if group_size is not None:
        out = df.withColumn(
            IDX_COL, (F.col(SLICE_COL) * group_size + F.col(IDX_COL)).cast("long")
        ).drop(SLICE_COL)
        return _reorder(out)
    sizes = df.groupBy(STREAM_COL, SLICE_COL).agg(
        (F.max(IDX_COL) + 1).alias("__len")
    )
    w = (
        Window.partitionBy(STREAM_COL)
        .orderBy(SLICE_COL)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = sizes.withColumn(
        "__base", F.coalesce(F.sum("__len").over(w), F.lit(0))
    ).select(STREAM_COL, SLICE_COL, "__base")
    out = (
        df.join(F.broadcast(bases), [STREAM_COL, SLICE_COL], "inner")
        .withColumn(IDX_COL, (F.col("__base") + F.col(IDX_COL)).cast("long"))
        .drop(SLICE_COL, "__base")
    )
    return _reorder(out)
