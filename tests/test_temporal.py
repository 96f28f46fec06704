"""asof_join vs the pandas merge_asof reference semantics."""

import pandas as pd
import pytest

from scanner_spark.functions.temporal import asof_join

LEFT = [
    # (id, key, ts)
    (1, "a", 10),
    (2, "a", 25),
    (3, "a", 5),
    (4, "b", 10),
    (5, "b", 40),
    (6, "c", 7),  # key with no right rows
]
RIGHT = [
    # (key, ts, px)
    ("a", 8, 1.0),
    ("a", 10, 2.0),  # tie with left id=1 at ts=10
    ("a", 20, 3.0),
    ("b", 30, 4.0),
]


def _ref(direction, tolerance=None):
    l = (
        pd.DataFrame(LEFT, columns=["id", "key", "ts"])
        .sort_values("ts")
        .reset_index(drop=True)
    )
    r = (
        pd.DataFrame(RIGHT, columns=["key", "ts", "px"])
        .sort_values("ts")
        .reset_index(drop=True)
    )
    m = pd.merge_asof(
        l, r, on="ts", by="key", direction=direction, tolerance=tolerance,
        suffixes=("", "_r"),
    )
    return {
        int(row.id): (None if pd.isna(row.px) else float(row.px))
        for row in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(spark, direction):
    l = spark.createDataFrame(LEFT, "id long, key string, ts long")
    r = spark.createDataFrame(RIGHT, "key string, ts long, px double")
    out = asof_join(l, r, on="ts", by=["key"], direction=direction)
    got = {row.id: row.px_r for row in out.collect()}
    assert got == _ref(direction)


def test_asof_join_tie_is_inclusive(spark):
    l = spark.createDataFrame(LEFT, "id long, key string, ts long")
    r = spark.createDataFrame(RIGHT, "key string, ts long, px double")
    out = {row.id: row for row in asof_join(l, r, on="ts", by=["key"]).collect()}
    # left id=1 at ts=10 must take the right row AT ts=10, not ts=8
    assert out[1].px_r == 2.0 and out[1].ts_r == 10
    # and every left row survives (left-outer semantics)
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert out[6].px_r is None


def test_asof_join_right_ties_deterministic(spark):
    """Two right rows at the same (key, ts): the match must be stable
    across runs/partitionings (largest payload struct wins)."""
    l = spark.createDataFrame([(1, "a", 20)], "id long, key string, ts long")
    r = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 10, 2.0)], "key string, ts long, px double"
    )
    for _ in range(3):
        out = asof_join(l, r, on="ts", by=["key"]).collect()
        assert out[0].px_r == 2.0


def test_asof_join_tolerance(spark):
    l = spark.createDataFrame(LEFT, "id long, key string, ts long")
    r = spark.createDataFrame(RIGHT, "key string, ts long, px double")
    out = {
        row.id: row.px_r
        for row in asof_join(l, r, on="ts", by=["key"], tolerance=5).collect()
    }
    assert out == _ref("backward", tolerance=5)
