"""Reading the engine's table formats from any SparkSession.

Central place for source-format quirks so query code stays declarative.
The driver's ``events.ts`` column has shipped in three parquet flavors, and
``normalize_events_ts`` maps every one to a plain session-TZ TIMESTAMP by
*dtype inspection* (never by session conf — the driver builds its own
SparkSession with stock confs, so any fix that lives in ``session.py``
defaults is invisible to the gate):

- ``TIMESTAMP(NANOS)``: unreadable by stock Spark; ``read_table`` flips the
  legacy conf to read it as long nanos and truncates to microseconds
  (integer division — no double round-trip, which would lose precision at
  1.7e18 ns).
- ``timestamp[us] isAdjustedToUTC=false``: a default Spark 4 session infers
  TIMESTAMP_NTZ, which ``unix_micros``/``withWatermark`` reject; cast to
  TIMESTAMP (lossless — session TZ is UTC in both our session and the
  driver's).
- plain ``TIMESTAMP(MICROS)``: passes through unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize_events_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as a plain TIMESTAMP, whatever parquet
    flavor it was read as (long nanos / TIMESTAMP_NTZ / TIMESTAMP).

    Dtype-driven so it is correct under ANY SparkSession (batch or
    streaming) regardless of ``inferTimestampNTZ`` / ``nanosAsLong``
    session settings."""
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # long nanos -> microsecond timestamp (truncation matches DuckDB's
        # TIMESTAMP_NS -> TIMESTAMP cast)
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        # NTZ wall clock -> the UTC instant with that wall clock, computed
        # SESSION-TIMEZONE-PROOF: microseconds since the NTZ epoch is pure
        # wall-clock integer arithmetic (no tz, no DST), and
        # timestamp_micros() builds the instant from epoch micros directly.
        # A plain cast("timestamp") would interpret the wall clock in the
        # session timezone — correct only on UTC sessions, and the driver
        # builds its own session (see the round-2 regression).
        ntz_epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.timestamp_diff("MICROSECOND", ntz_epoch, F.col(col))
            ),
        )
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}
