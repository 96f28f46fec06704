"""Reading the engine's table formats from any SparkSession.

Central place for source-format quirks so query code stays declarative:

- ns-precision parquet timestamps (the driver's ``events`` table is
  TIMESTAMP(NANOS)) are unreadable by stock Spark; ``read_table`` flips the
  runtime conf to read them as long nanos and materializes a proper
  microsecond ``ts`` timestamp column (integer division — no double
  round-trip, which would lose precision at 1.7e18 ns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes ns timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # long nanos -> microsecond timestamp (truncation matches DuckDB's
        # TIMESTAMP_NS -> TIMESTAMP cast); a TIMESTAMP(MICROS) file needs no
        # conversion (driver testdata has shipped both precisions)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}
