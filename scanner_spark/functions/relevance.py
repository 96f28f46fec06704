"""Term-statistics relevance operators: TF-IDF, term search, n-gram LM
familiarity.

Training-data curation scores documents by how *retrievable* and how
*statistically typical* they are: TF-IDF surfaces each document's
characteristic terms, term search ranks documents against a query, and the
bigram familiarity score is the integer-exact skeleton of an n-gram
language-model quality filter (a doc whose word bigrams are globally rare
is gibberish or boilerplate; one whose bigrams are all corpus-typical is
fluent).  The reference has no text layer (its engine is media-only); these
extend SURVEY.md §2.7's relational layer.

Scale design:
- Tokenization and n-gram construction are JVM higher-order functions over
  the tokens array — narrow, codegen'd, no Python.
- ``(doc, term)`` term frequencies are one hash-shuffle with map-side
  partial aggregation; document frequencies reduce the SAME pre-shuffled
  relation a second time (vocabulary-sized output, sub-linear in corpus).
- The df/count side of each join is vocabulary-sized, not corpus-sized:
  left to AQE to broadcast when it fits and shuffle when it does not (the
  dedup-family precedent — never force a broadcast of something that
  scales).
- Cross-engine exactness: every emitted number is an integer or the result
  of a SINGLE IEEE double operation on integer operands (``tf/df``), so
  oracle hash equality does not depend on transcendental-function or
  summation-order parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from scanner_spark.functions import text


def _toks(col: Column) -> Column:
    """Non-empty whitespace tokens (the corpus-wide tokenizer contract —
    identical to text.tokens modulo empty-string guards)."""
    return F.filter(text.tokens(col), lambda x: x != F.lit(""))


def term_freqs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, term, tf) — one shuffle, map-side combined."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(_toks(F.col(text_col))).alias("term"),
        )
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf rank.

    The score is ``tf / df`` (term frequency over document frequency) — the
    idf factor ``1/df`` is monotone in the classic ``ln(N/df)``, so the
    RANKING is textbook tf-idf while the score stays a single exact IEEE
    division (integer tf, integer df), bit-equal in any engine.  Ties break
    on term text, so output is fully deterministic."""
    tf = term_freqs(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_count"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df_count")
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc", "term", "tf", "df_count", "score", "rank")
    )


def search_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rank documents against a bag-of-terms query.

    Score = (#distinct query terms matched, total occurrences), doc id as
    the final tiebreak — integer-exact retrieval.  The term filter runs
    BEFORE the first aggregation, so only rows for query terms are ever
    shuffled (at 100 TB the shuffle is |matching postings|, not |corpus
    tokens|); top-k is a TakeOrdered, never a global sort."""
    terms = [t.lower() for t in query_terms]
    hits = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(_toks(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
        .groupBy("doc")
        .agg(
            F.count("*").alias("matched"),
            F.sum("tf").alias("tf_sum"),
        )
    )
    return (
        hits.orderBy(
            F.col("matched").desc(), F.col("tf_sum").desc(), F.col("doc").asc()
        )
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("matched").desc(),
                    F.col("tf_sum").desc(),
                    F.col("doc").asc(),
                )
            ),
        )
    )


def word_bigrams(col: Column) -> Column:
    """Adjacent word pairs ``"a b"`` from a text column — JVM transform
    over the tokens array (empty when fewer than 2 tokens)."""
    toks = _toks(col)
    return F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.concat(x, F.lit(" "), F.element_at(toks, i + F.lit(2))),
    )


def bigram_familiarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Integer-exact n-gram LM familiarity: for each document, the sum of
    corpus-wide frequencies of its word bigrams plus its bigram count.

    ``fam_total / n_bigrams`` is the doc's average bigram frequency — the
    additive-smoothing-free skeleton of an n-gram LM score (log-prob sums
    need transcendental parity; frequency sums are integers and hash-equal
    everywhere).  Low = atypical/gibberish, high = corpus-fluent.

    Two shuffles: per-(doc,bigram) counts, then the global bigram model
    (vocabulary-bigram-sized — AQE broadcasts it when small).  ``bg`` is
    both the join's left side and the source of ``model``, so it is
    ``track()``-persisted (the dedup-family shingle pattern) — without it
    the explode+shuffle, the heaviest relation here, executes twice."""
    from scanner_spark.caching import track

    bg = track(
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(word_bigrams(F.col(text_col))).alias("bg"),
        ).groupBy("doc", "bg").agg(F.count("*").alias("n"))
    )
    model = bg.groupBy("bg").agg(F.sum("n").alias("global_n"))
    return (
        bg.join(model, "bg")
        .groupBy("doc")
        .agg(
            F.sum(F.col("n") * F.col("global_n")).alias("fam_total"),
            F.sum("n").alias("n_bigrams"),
        )
    )
