"""Stateful test kernels defining the engine's state semantics.

Mirrors the reference's TestIncrementBounded / TestIncrementUnbounded
(/root/reference/tests/test_ops.cpp:173-234), which define what
bounded/unbounded state *means*: a counter that increments per element
processed, resetting on new stream/slice.  Expected behavior reproduced
from /root/reference/tests/py_test.py:407-436 (gather [0,10,25,26,27] with
warmup w -> [0, w, w, w+1, w+2]).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from scanner_spark.ops import register_op

WARMUP = 2  # reference test uses warmup() kernels with small windows


class IncrementBounded:
    """Counter kernel with bounded state (warmup window)."""

    def __init__(self):
        self.count = 0

    def reset(self):
        self.count = 0

    def execute(self, values: pd.Series) -> pd.Series:
        # vectorized: output i = count-before + i
        start = self.count
        n = len(values)
        self.count += n
        return pd.Series(np.arange(start, start + n, dtype="int64"))


class IncrementUnbounded(IncrementBounded):
    """Counter kernel needing all prior elements (unbounded state) —
    identical computation; the difference is scheduling: the compiler may
    never split an unbounded-state group (dag_analysis.cpp:1621-1626)."""


increment_bounded_op = register_op(
    IncrementBounded, bounded_state=WARMUP, name="TestIncrementBounded"
)
increment_unbounded_op = register_op(
    IncrementUnbounded, unbounded_state=True, name="TestIncrementUnbounded"
)
