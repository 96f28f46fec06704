"""Text analysis operators for training-data pipelines.

All JVM-side (``pyspark.sql.functions`` only — no Python UDFs in the hot
path), so they stay inside whole-stage codegen and scale linearly: each is a
narrow per-row projection over the ``documents`` table; no shuffles.

Token model shared with the DuckDB oracles: ``tokens(text) =
split(lower(trim(text)), '\\s+')`` — keep the two renderings in lockstep.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic; deterministic and mirrored verbatim in the SQL oracle
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que"],
    "es": ["el", "la", "los", "y", "es", "una", "de", "que"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count (the reference-free fast path; a BPE-ish
    subword estimate is ``bpe_token_estimate``)."""
    return F.size(tokens(col))


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: split on
    word boundaries/punctuation and count ~4-char subword chunks.  Pure
    arithmetic => identical in SQL."""
    # chunks of <=4 chars per word, plus punctuation marks as single tokens
    word_chars = F.length(F.regexp_replace(col, r"[^A-Za-z0-9]", ""))
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return (F.ceil(word_chars / F.lit(4)) + punct).cast("long")


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    return F.coalesce(
        F.try_divide(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))), F.size(toks)
        ),
        F.lit(0.0),
    )


def punct_ratio(col: Column) -> Column:
    return F.coalesce(
        F.try_divide(F.length(F.regexp_replace(col, r"[^.!?,;:]", "")), F.length(col)),
        F.lit(0.0),
    )


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    return F.coalesce(
        F.try_divide(
            F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)),
            F.size(toks),
        ),
        F.lit(0.0),
    )


def quality_score(col: Column) -> Column:
    """Deterministic heuristic quality score in [0, 1]: rewards moderate
    length, stopword presence, sane word lengths; penalizes punctuation
    soup.  Mirrors common web-scrape quality filters (C4-style)."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    wl = mean_word_len(col)
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    punct_pen = F.when(punct_ratio(col) > 0.1, 0.5).otherwise(1.0)
    return F.round(
        (0.4 * len_score + 0.3 * sw_score + 0.3 * wl_score) * punct_pen, 6
    )


def lang_id(col: Column) -> Column:
    """Stopword-profile language ID: argmax over per-language stopword hit
    counts, 'und' (undetermined) when all zero.  Ties broken by fixed
    language order (en, de, fr, es) — the oracle mirrors this exactly.

    Implemented as array_max over (score, -lang_index, lang) structs so
    each per-language score expression appears exactly ONCE in the plan —
    a when-chain against greatest(...) duplicates every score ~3x and blows
    up Catalyst analysis + codegen time (~7 s at first action)."""
    toks = tokens(col)
    entries = []
    for i, (lang, words) in enumerate(LANG_STOPWORDS.items()):
        sw = F.array(*[F.lit(s) for s in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        # struct comparison is lexicographic: max score wins, then the
        # SMALLEST language index (earlier language) via the negated key
        entries.append(
            F.struct(
                score.alias("s"), F.lit(-i).alias("ni"), F.lit(lang).alias("lang")
            )
        )
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 over the sorted distinct token set —
    whitespace/order-insensitive document identity (the set-based analog
    of a rolling hash; a true rolling hash lives in
    ``rolling_fingerprint_udf`` below)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def rolling_fingerprint_udf():
    """Polynomial rolling hash over the raw text (Rabin-Karp style),
    vectorized via Arrow.  Not SQL-expressible (modular exponentiation) —
    covered by the rows-only driver check + pytest."""
    MOD = (1 << 61) - 1
    BASE = 257

    @F.pandas_udf("long")
    def roll(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = 0
            for ch in (t or ""):
                h = (h * BASE + ord(ch)) % MOD
            out.append(h)
        return pd.Series(out)

    return roll


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass projection adding every text metric (single narrow stage)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_tokens_bpe", bpe_token_estimate(c))
        .withColumn("stopword_ratio", F.round(stopword_ratio(c), 6))
        .withColumn("punct_ratio", F.round(punct_ratio(c), 6))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("fingerprint", fingerprint(c))
    )
