"""Training-data curation operators: decontamination, repetition filters,
stratified sampling, context-window chunking.

These are the standard corpus-preparation steps between raw text and a
training run (reference scope: the LLM-pipeline extension family next to
functions/dedup.py and functions/text.py — the reference engine itself
stops at video/image pipelines, see SURVEY.md §2.7):

- **decontaminate**: flag training documents sharing any word n-gram with
  an evaluation/benchmark set (the GPT-3/PaLM n-gram collision method).
  One shingle pass over each side, one semi-style join keyed on the
  shingle hash — eval sets are tiny next to the corpus, so the join
  broadcasts; work is linear in corpus shingles at any scale.
- **repetition stats**: Gopher-style repetition signals (duplicate-token
  fraction, most-frequent-token fraction, duplicate-bigram fraction)
  computed with ONE explode + groupBy per signal family — fully
  codegen'd, one shuffle keyed by doc, no per-row Python.
- **stratified_sample**: deterministic exact-k-per-stratum sample ranked
  by the shared 60-bit md5 hash (functions/hashing.h60) so Spark and the
  DuckDB oracle pick identical rows.  Per-stratum window sort — the
  shuffle is keyed by stratum, so a hot stratum is the skew bound
  (acceptable: k rows survive per stratum regardless).
- **chunk_windows**: split each document's token sequence into fixed-size
  context windows (the sequence-packing precursor).  Pure JVM
  sequence/slice arithmetic, linear, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from scanner_spark.functions.hashing import h60
from scanner_spark.functions.text import token_count, tokens

DECONTAM_NGRAM_N = 5


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(doc, shingle) distinct word n-grams — the codegen'd explode+lead
    shape shared with functions/dedup._shingled (sub-n docs drop out via
    the NULL filter)."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("ord", "tok"),
    )
    w = Window.partitionBy("doc").orderBy("ord")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = tok.select(
        "doc",
        F.when(
            parts[-1].isNotNull(), F.concat_ws(" ", *parts)
        ).alias("shingle"),
    )
    return sh.filter(F.col("shingle").isNotNull()).distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECONTAM_NGRAM_N,
) -> DataFrame:
    """Per-training-document benchmark-overlap counts: (doc_id, n_overlap,
    contaminated).  ``n_overlap`` = distinct word n-grams shared with the
    eval set; every train row appears (0 when clean), so the result joins
    back as a filter.

    The eval shingle set is distinct-collapsed before the join; real eval
    sets are orders of magnitude smaller than the corpus, so Spark
    broadcasts that side (AQE converts it automatically below the
    threshold) and the corpus-side shingle stream never shuffles."""
    t_sh = _doc_shingles(train, text_col, id_col, n)
    e_sh = _doc_shingles(eval_df, text_col, id_col, n).select("shingle").distinct()
    overlap = (
        t_sh.join(e_sh, "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        train.select(F.col(id_col))
        .join(overlap.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_token_ratio``  = 1 - distinct_tokens / tokens
    - ``top_token_ratio``  = occurrences of the most frequent token / tokens
    - ``dup_bigram_ratio`` = 1 - distinct_bigrams / bigrams (0 if < 2 tokens)

    One explode feeds a (doc, tok) groupBy for the token family and a
    lead-window bigram pass for the bigram family — two shuffles keyed by
    doc, everything whole-stage codegen.  Ratios round to 6 so the DuckDB
    twin hashes identically."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("ord", "tok"),
    )
    tok_stats = (
        tok.groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    w = Window.partitionBy("doc").orderBy("ord")
    big = tok.select(
        "doc",
        F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w)).alias("big"),
        F.lead("tok", 1).over(w).isNotNull().alias("ok"),
    ).filter("ok")
    big_stats = big.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_big"),
        F.countDistinct("big").alias("n_big_distinct"),
    )
    return (
        tok_stats.join(big_stats, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens"),
            F.round(1.0 - F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "dup_token_ratio"
            ),
            F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias("top_token_ratio"),
            F.round(
                F.coalesce(1.0 - F.col("n_big_distinct") / F.col("n_big"), F.lit(0.0)),
                6,
            ).alias("dup_bigram_ratio"),
        )
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_token_ratio: float = 0.7,
    max_top_token_ratio: float = 0.2,
    max_dup_bigram_ratio: float = 0.4,
) -> DataFrame:
    """repetition_stats + a ``kept`` decision column (Gopher-style
    thresholds; defaults tuned for the synthetic corpus' short docs)."""
    s = repetition_stats(df, text_col, id_col)
    return s.withColumn(
        "kept",
        (
            (F.col("dup_token_ratio") <= max_dup_token_ratio)
            & (F.col("top_token_ratio") <= max_top_token_ratio)
            & (F.col("dup_bigram_ratio") <= max_dup_bigram_ratio)
        ).cast("int"),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exact-k-per-stratum sample: rows ranked inside each
    stratum by the shared 60-bit md5 of the id (uniform, engine-portable,
    retry-stable — no RNG state), ties broken by id.  Returns the sampled
    rows with their rank.

    Scale: one shuffle keyed by the strata; each stratum sorts locally.
    This is the exact-k flavor; for rate-based sampling at extreme skew
    use a hash-threshold filter (h60(id) % M < rate*M), which needs no
    sort at all."""
    w = Window.partitionBy(*strata_cols).orderBy(
        h60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, *strata_cols, "rank")
    )


def domain_resample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    target_per_group: int = 100,
) -> DataFrame:
    """Deterministic domain rebalancing: cap each group at ~``target``
    rows by hash-thresholded Bernoulli sampling with keep probability
    min(1, target / |group|) — the Pile/DoReMi-style domain-mixture
    flattening step, with no RNG state (retry-stable, engine-portable).

    Each row keeps iff u < p where u = h60(id)/2^60 (uniform in [0,1),
    identical in Spark and the DuckDB oracle) and p is the group's keep
    probability.  Plan: one map-side-combined count per group, broadcast
    back, one narrow filter — no shuffle of the data itself, so at 100 TB
    the cost is a single pass over the corpus plus a tiny dimension
    join.  Unlike ``stratified_sample`` (exact-k, per-stratum sort) this
    is the constant-memory rate-based flavor: group sizes land near the
    target with Binomial noise, which is what production mixers use when
    an exact count isn't worth a per-group sort."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n_group"))
    joined = df.join(F.broadcast(counts), group_col)
    u = h60(F.col(id_col).cast("string")) / F.lit(float(1 << 60))
    p = F.least(F.lit(1.0), F.lit(float(target_per_group)) / F.col("_n_group"))
    return (
        joined.filter(u < p)
        .select(
            id_col,
            group_col,
            F.col("_n_group").cast("long").alias("n_group"),
            F.round(p, 6).alias("keep_p"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Greedy contiguous sequence packing: lay documents end-to-end in
    deterministic (shard, id) order and assign each to the training
    sequence its first token lands in — the packing step that turns a
    curated corpus into fixed-length pretraining rows.

    Packing is per-shard, not global: a global cumulative sum would
    serialize into one window partition (a 100 TB straggler), while
    per-shard windows parallelize across shards and stay deterministic.
    Docs longer than the remaining room overflow their sequence — the
    standard greedy-contiguous approximation; downstream consumers split
    or truncate at sequence boundaries.  Pure integer window arithmetic:
    one shuffle keyed by shard, exact in any engine.

    Output: (id, shard, n_tokens, seq_id, seq_offset)."""
    n_tok = token_count(F.col(text_col)).cast("long")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__cum")
    base = df.select(F.col(id_col), F.col(shard_col), n_tok.alias("n_tokens"))
    return base.select(
        id_col,
        shard_col,
        "n_tokens",
        F.floor(cum_before / seq_len).cast("long").alias("seq_id"),
        (cum_before % seq_len).cast("long").alias("seq_offset"),
    )


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
) -> DataFrame:
    """Split each document into fixed-size token windows: (doc_id,
    chunk_idx, n_tokens, chunk_text).  The final partial window is kept —
    training pipelines pad or pack it downstream.  Pure JVM
    sequence/slice arithmetic; no shuffle, no Python."""
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(size)).cast("int")
    chunks = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "__c"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_idx") * size + 1, size)
    return chunks.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
