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
  fraction, most-frequent-token fraction, duplicate-bigram fraction) —
  the distinct-ratio family is pure in-row array arithmetic (no shuffle);
  only the top-token count pays one explode + groupBy.  Fully codegen'd,
  no per-row Python.
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

    Round-13 plan (three shapes measured at sf10 before shipping):
    - The BIGRAM family is computed IN-ROW: the pair array comes from a
      ``zip_with`` concat over two slices (no window), and its distinct
      count from ``array_distinct`` — deleting the previous plan's
      shuffle + SORT of every token row (``Window.partitionBy(doc)
      .orderBy(ord)`` + ``lead``).  Bigram identity is the concatenated
      ``"a b"`` STRING, not an (a, b) struct: ``array_distinct``
      hash-sets atomic element types but falls back to O(n²) pairwise
      comparison for structs (measured 156 s vs 2 s at sf1 — quadratic in
      doc length).  The ``zip_with`` lambda is interpreted (the r11 HOF
      budget: one concat per element), bought back many times over by the
      deleted sort.
    - The TOKEN family keeps the exact (doc, tok) two-level aggregate —
      ``n_tokens``/``n_distinct``/``top_cnt`` are free byproducts of one
      tree (sum/count/max).  Measured alternatives all lost: carrying the
      in-row stats through that aggregate as ``min``s added ~9 s of
      per-key buffer work (33.9 s); an in-row sorted run-length
      ``aggregate`` for top_cnt was 17.7 s alone; md5-hashed group keys
      31.3 s.  Exact string keys at 15.5 s are the floor — ``top_cnt`` is
      the one stat that genuinely needs the shuffle.
    - The two per-doc relations (aggregate ~#docs rows, in-row #docs
      rows) join on doc — a dimension-sized exchange.  13.9 s at sf10 vs
      the r12 window plan's 18.2 s same-box, and the full-corpus sort is
      gone at any scale.
    Ratios round to 6 so the DuckDB twin hashes identically."""
    base = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array(tokens(F.col(text_col)))).alias("__tk"),
    )
    tk = F.col("__tk")
    n1 = F.greatest(F.size(tk) - 1, F.lit(0))
    bg = F.zip_with(
        F.slice(tk, F.lit(1), n1),
        F.slice(tk, F.lit(2), n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    tok_stats = (
        base.select("doc", F.explode(tk).alias("tok"))
        .groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    big_inrow = base.select(
        "doc",
        F.size(bg).alias("n_big"),
        F.size(F.array_distinct(bg)).alias("n_big_distinct"),
    )
    return (
        tok_stats.join(big_inrow, "doc")
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
    sequence/slice arithmetic; no shuffle, no Python.

    Round-13 plan: the chunk TEXTS are built in-row (one ``transform``
    producing the small string array) and only that array crosses the
    Generate — each exploded row carries its own chunk string plus one
    long.  The previous plan exploded a chunk-index sequence NEXT TO the
    full ``__toks`` array, so the Generate emitted the whole token array
    once per chunk — O(tokens x chunks) bytes per document through the
    explode.  The ``transform`` lambda is interpreted (the r11 HOF
    lesson), but its per-element work is one slice + join that the old
    plan did anyway post-explode; the payload win dominates (measured at
    sf10 in the round-13 chain).  Per-chunk ``n_tokens`` is recovered
    arithmetically from the carried total — no second slice."""
    base = df.select(
        F.col(id_col),
        F.explode(F.array(tokens(F.col(text_col)))).alias("__toks"),
    )
    tk = F.col("__toks")
    n_chunks = F.ceil(F.size(tk) / F.lit(size)).cast("int")
    chunk_texts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(tk, i * size + 1, size), " "),
    )
    mid = base.select(
        id_col,
        F.size(tk).alias("__nt"),
        F.posexplode(chunk_texts).alias("chunk_idx", "chunk_text"),
    )
    return mid.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(
            F.lit(size).cast("long"),
            (F.col("__nt") - F.col("chunk_idx") * size).cast("long"),
        ).alias("n_tokens"),
        "chunk_text",
    )
