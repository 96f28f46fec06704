"""Structured Streaming module: windowed aggs match their batch twins;
stateful op accumulates across micro-batches; parquet sink is exactly-once
shaped (checkpointed)."""

import os

import pytest
from pyspark.sql import functions as F

from scanner_spark import streaming as ss

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """events-shaped rows written as parquet files (two batches)."""
    rows1 = [
        (1, "2024-01-01 00:05:00", 1, "click", 1.0),
        (2, "2024-01-01 00:20:00", 1, "click", 2.0),
        (3, "2024-01-01 01:10:00", 2, "view", 3.0),
    ]
    rows2 = [
        (4, "2024-01-01 01:30:00", 2, "view", 4.0),
        (5, "2024-01-01 02:15:00", 1, "click", 5.0),
    ]
    d = str(tmp_path / "in")
    for rows in (rows1, rows2):
        src = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string, value double")
        src.withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    return d


def _drain(q):
    q.awaitTermination(120)


def test_tumbling_matches_batch(spark, stream_dir):
    st = ss.from_stored(spark, stream_dir, SCHEMA)
    agg = ss.tumbling(st, "ts", "1 hour", "10 minutes", ["event_type"], {"value": "sum"})
    q = ss.to_memory(agg, "tumb", output_mode="append")
    _drain(q)
    got = {
        (r.event_type, str(r.window_start)): r.sum_value
        for r in spark.sql("select * from tumb").collect()
    }
    batch = spark.read.parquet(stream_dir)
    expect = {
        (r.event_type, str(r.ws)): r.sv
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.sum("value").alias("sv")).collect()
    }
    # append mode emits only windows sealed by the watermark (max ts 02:15
    # - 10 min = 02:05): the open 02:00-03:00 window is correctly withheld
    closed = {k: v for k, v in expect.items() if not k[1].startswith("2024-01-01 02")}
    assert got == closed and len(got) == 2


def test_session_window(spark, stream_dir):
    st = ss.from_stored(spark, stream_dir, SCHEMA)
    sess = ss.session(st, "ts", "30 minutes", "10 minutes", ["user_id"], {"value": "sum"})
    q = ss.to_memory(sess, "sess", output_mode="append")
    _drain(q)
    rows = spark.sql("select * from sess order by user_id, session_start").collect()
    # user 1: events at 00:05+00:20 merge (gap 15m < 30m); user 2: 01:10+01:30
    # merge (gap 20m).  User 1's 02:15 session is open at watermark 02:05 and
    # correctly withheld in append mode.
    assert [(r.user_id, r.sum_value) for r in rows] == [(1, 3.0), (2, 7.0)]


def test_stateful_running_agg(spark, stream_dir):
    st = ss.from_stored(spark, stream_dir, SCHEMA)
    run = ss.stateful_running_agg(st, ["event_type"], "value")
    q = ss.to_memory(run, "runagg", output_mode="update")
    _drain(q)
    rows = spark.sql(
        "select event_type, max(n) n, max(sum_cents) c from runagg group by event_type"
    ).collect()
    got = {(r.event_type): (r.n, r.c) for r in rows}
    assert got["click"] == (3, 800)
    assert got["view"] == (2, 700)


def test_parquet_sink_checkpointed(spark, stream_dir, tmp_path):
    st = ss.from_stored(spark, stream_dir, SCHEMA)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = ss.to_parquet(st.filter("value > 1"), out, ckpt)
    _drain(q)
    assert spark.read.parquet(out).count() == 4
    assert os.path.exists(os.path.join(ckpt, "offsets"))
    # restart with same checkpoint: no reprocessing, no duplicates
    q2 = ss.to_parquet(
        ss.from_stored(spark, stream_dir, SCHEMA).filter("value > 1"), out, ckpt
    )
    _drain(q2)
    assert spark.read.parquet(out).count() == 4


def test_stream_queries_leave_caller_conf_untouched(spark, sf_dir):
    """Per-query conf isolation: the streaming suite queries size their
    state-store partitions and parquet read flags on their OWN session
    (spark.newSession()), so a concurrent query on the caller's session
    can never observe a mutated conf."""
    from scanner_spark import queries as Q

    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.legacy.parquet.nanosAsLong",
        )
    }
    out = Q.q_stream_events_hourly(spark, sf_dir)
    assert out.count() > 0
    after = {k: spark.conf.get(k, None) for k in before}
    assert after == before
