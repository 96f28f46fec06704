import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scanner_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "scanner-spark-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def stock_spark(spark):
    """A session with STOCK Spark 4 confs — mimics the driver's own
    SparkSession, which does not apply get_spark()'s defaults.  Round 2
    shipped a config-masked bug (events.ts read as TIMESTAMP_NTZ under
    the driver, masked locally by the pinned inferTimestampNTZ=false);
    every event-time query must also pass under this session."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    yield ns


@pytest.fixture(scope="session")
def nonutc_spark(spark):
    """Stock parquet inference AND a non-UTC session timezone: the
    events-ts normalization must be timezone-PROOF (wall-clock epoch
    arithmetic), not merely correct on UTC hosts."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield ns


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def two_streams(spark):
    """Two deterministic streams of 30 elements: value = 100*stream + idx."""
    rows = [
        (str(s), i, float(100 * s + i)) for s in range(2) for i in range(30)
    ]
    return spark.createDataFrame(rows, "stream_id string, idx long, value double").cache()
