"""Build a larger benchmark dataset by replicating the driver's sf0.1
tables with key offsets (default x10 ~= "sf1").

Dims (region/nation/customer/supplier/part) are copied as-is; fact-ish
tables (orders, lineitem, events, documents, embeddings) are replicated
REPLICAS times with primary keys offset per replica so cardinalities scale
while foreign keys keep their original fan-in (each dim row serves 10x the
facts — the usual shape of a scale-up).  documents/embeddings content is
copied verbatim: a 10x-duplicated corpus is exactly what dedup operators
face in production, so pair generation is benchmarked under load, not
around it.

events.ts is written as BIGINT epoch-nanos, the same long-nanos layout
scanner_spark.io.read_table already normalizes.

Bounded duplication (replicas > MAX_DUP): in production the duplicate RATE
does not grow with corpus size — a 10x bigger crawl has ~the same fraction
of copies, not 10x-deeper copy groups.  Unbounded replication would also
make every pair-emitting dedup query's OUTPUT quadratic in the replica
count (m copies -> m(m-1)/2 pairs), which benchmarks the print statement,
not the engine.  So replicas are grouped into blocks of MAX_DUP; block 0
is verbatim, and every later block perturbs content so similarity across
blocks falls below every dedup threshold while WITHIN-block replicas stay
exact duplicates:
- documents: a block tag token is injected between every pair of words
  (disjoint shingle/bigram sets across blocks; n_chars recomputed);
- embeddings: the first coordinate is shifted by 1000*block (cosine to any
  other block ~0 while intra-block vectors stay identical).
Pair outputs then scale LINEARLY in corpus size at fixed dup depth — the
production shape.

Usage: python tools/make_scaled_data.py [out_dir] [replicas] [max_dup]
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
MAX_DUP = int(sys.argv[3]) if len(sys.argv) > 3 else 10

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in FACT_KEYS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        (k0,) = keys[:1]
        (span,) = con.execute(f"SELECT MAX({k0}) + 1 FROM {src}").fetchone()
        parts = []
        for i in range(REPLICAS):
            cols = [f"{k0} + {i * span} AS {k0}"]
            block = i // MAX_DUP
            if t == "lineitem":
                rest = "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
            elif t == "orders":
                rest = "o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
            elif t == "events":
                rest = "epoch_ns(ts) AS ts, user_id, event_type, value, props"
            elif t == "documents":
                if block == 0:
                    rest = "text, lang, source, n_chars"
                else:
                    newtext = f"replace(text, ' ', ' q{block}z ')"
                    rest = (
                        f"{newtext} AS text, lang, source, "
                        f"length({newtext}) AS n_chars"
                    )
            else:  # embeddings
                if block == 0:
                    rest = "embedding, label"
                else:
                    rest = (
                        f"[CAST(embedding[1] + {1000.0 * block} AS FLOAT)] "
                        "|| embedding[2:] AS embedding, label"
                    )
            parts.append(f"SELECT {', '.join(cols)}, {rest} FROM {src}")
        q = " UNION ALL ".join(parts)
        con.execute(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()
        print(t, n)


if __name__ == "__main__":
    main()
