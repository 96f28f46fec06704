"""Round-17 recon: attribute stream_dedup_minhash_lsh's sf10 cost.

Three timings (fresh session, min-of-2 each, same harness shape as the
declared query):

  full     — the declared query end-to-end (source -> banded rows ->
             repartition -> applyInPandasWithState scoring -> parquet
             sink -> distinct read-back)
  no_state — identical pipeline but the stateful fn only counts rows
             (no state read/write, no scoring): source + narrow
             signature phase + state-exchange + micro-batch + sink
             machinery
  passthru_state — fn reads+writes state exactly like the real one
             (entries rebuild + update) but skips scoring: adds the
             state (de)serialization cost on top of no_state

full - passthru_state ~= the Python scoring loop itself;
passthru_state - no_state ~= state serialization;
no_state ~= harness floor (the part no state rewrite can touch).

Usage: python .bench_out/stream_lsh_probe_r16.py [sf_dir]
Writes stream_lsh_probe_r17.json next to itself.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: E402

from scanner_spark import queries as Q  # noqa: E402
from scanner_spark.streaming.dedup import (  # noqa: E402
    PAIR_SCHEMA,
    _STATE_SCHEMA,
    banded_minhash_rows,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf10"
HERE = os.path.dirname(os.path.abspath(__file__))

import importlib  # noqa: E402

qmod = importlib.import_module("scanner_spark.queries")
_stream_session = qmod._stream_session
_stream_tmpdir = qmod._stream_tmpdir


def build_and_run(mode: str) -> float:
    from scanner_spark.session import get_spark

    spark = get_spark("lsh-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ss = _stream_session(spark, max_parts=32)
    raw_schema = ss.read.parquet(os.path.join(SF, "documents.parquet")).schema
    sdf = (
        ss.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF)
    )
    sdf = sdf.repartition(ss.sparkContext.defaultParallelism)
    banded = banded_minhash_rows(sdf)
    t0 = time.monotonic()
    if mode == "full":
        from scanner_spark.streaming.dedup import lsh_dedup_pairs

        pairs = lsh_dedup_pairs(banded, threshold=Q.MINHASH_THRESHOLD)
    else:
        keep_state = mode == "passthru_state"

        def fn(key, pdfs, state):
            n = 0
            if keep_state:
                entries = []
                if state.exists:
                    st_bss, st_docs, st_sigs = state.get
                    entries = [
                        (b, int(d), [int(x) for x in s])
                        for b, d, s in zip(st_bss, st_docs, st_sigs)
                    ]
                for pdf in pdfs:
                    for doc, sig, bs in zip(pdf["doc"], pdf["sig"], pdf["bs"]):
                        entries.append((bs, int(doc), [int(x) for x in sig]))
                        n += 1
                state.update((
                    [b for b, _, _ in entries],
                    [d for _, d, _ in entries],
                    [s for _, _, s in entries],
                ))
            else:
                for pdf in pdfs:
                    n += len(pdf)
            yield pd.DataFrame(
                {"doc_a": [n], "doc_b": [n], "est_jaccard": [0.0]}
            )

        sharded = banded.withColumn(
            "shard", F.crc32(F.col("bs").cast("binary")) % F.lit(32)
        )
        pairs = sharded.groupBy("band", "shard").applyInPandasWithState(
            fn,
            outputStructType=PAIR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    base = _stream_tmpdir(f"lsh_probe_{mode}_")
    sink_dir = os.path.join(base, "sink")
    q = (
        pairs.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = (
        spark.read.parquet(sink_dir)
        .select("doc_a", "doc_b", "est_jaccard")
        .distinct()
        .count()
    )
    dt = round(time.monotonic() - t0, 2)
    print(mode, dt, "rows", n, flush=True)
    spark.stop()
    return dt


if __name__ == "__main__":
    out = {}
    for mode in ("no_state", "passthru_state", "full", "full"):
        key = mode if mode not in out else mode + "_2"
        out[key] = build_and_run(mode)
    with open(os.path.join(HERE, "stream_lsh_probe_r17.json"), "w") as f:
        json.dump({"sf_dir": SF, "timings_s": out}, f, indent=1)
    print(json.dumps(out))
