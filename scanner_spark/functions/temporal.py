"""Temporal relational operators: as-of join.

The reference engine has no relational layer at all (SURVEY.md §2.7); the
as-of join is the point-in-time-correct feature join every event/feature
pipeline needs (pandas ``merge_asof``, Flink temporal join, kdb ``aj``).
Spark has no native asof join, and the naive range join explodes
quadratically per key — this implementation uses the union-tag shape
instead:

1. tag right rows 0 and left rows 1, union them on (by, ts, tag);
2. one window per ``by`` key ordered by (ts, tag) carries the most recent
   right row forward (``last(..., ignorenulls=True)``);
3. keep the left rows, now annotated with their as-of match.

Cost: ONE shuffle on the key columns (the same shuffle a plain equi-join
would pay), state bounded per key, no pair blow-up — the shape that holds
at 100 TB.  Ordering ties: a right row at exactly left.ts sorts before
the left probe (tag 0 < 1), so "at-or-before" includes equal timestamps,
matching ``pd.merge_asof(direction='backward')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = ("user_id",),
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the largest ``on`` <=
    left's (``direction='backward'``) or smallest ``on`` >= left's
    (``'forward'``) within the same ``by`` key.

    ``value_cols``: right columns to carry (default: all but ``on``/``by``).
    ``tolerance``: optional max |left.on - right.on| as a Column-compatible
    literal (same units as ``on``); matches outside it become NULL.
    Returns every left row (left outer semantics) with matched columns
    suffixed."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    # right payload travels as one struct (match ts first, for tolerance)
    rstruct = F.struct(
        F.col(on).alias("__match_on"), *[F.col(c) for c in value_cols]
    )
    r2 = right.select(
        *by, F.col(on).alias("__ts"), F.lit(0).alias("__tag"), rstruct.alias("__r")
    )
    rtype = r2.schema["__r"].dataType
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(rtype).alias("__r"),
        lstruct.alias("__l"),
    )
    r2 = r2.withColumn("__l", F.lit(None).cast(l2.schema["__l"].dataType))
    u = l2.unionByName(r2)
    # __r last in the ordering: right rows sharing (ts) sort by payload, so
    # last() deterministically takes the LARGEST payload struct among ties
    # (otherwise the match would flip with partitioning).  Left probes
    # (__tag 1, __r NULL) still sort after all right rows at equal ts.
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__tag").asc(), F.col("__r").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:
        order = [F.col("__ts").desc(), F.col("__tag").asc(), F.col("__r").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(*frame)
    filled = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = filled.filter(F.col("__tag") == 1)
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__match.__match_on")
            if direction == "backward"
            else F.col("__match.__match_on") - F.col("__ts")
        )
        out = out.withColumn(
            "__match",
            F.when(gap <= tolerance, F.col("__match")),
        )
    return out.select(
        F.col("__l.*"),
        F.col("__match.__match_on").alias(f"{on}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
