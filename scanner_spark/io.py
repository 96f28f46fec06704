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
        # session TZ is UTC, so NTZ -> TIMESTAMP is a pure type relabel
        return df.withColumn(col, F.col(col).cast("timestamp"))
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
