"""Text analysis operators for training-data pipelines.

All JVM-side (``pyspark.sql.functions`` only — no Python UDFs in the hot
path), so they stay inside whole-stage codegen and scale linearly: each is a
narrow per-row projection over the ``documents`` table; no shuffles.

Token model shared with the DuckDB oracles: ``tokens(text) =
split(lower(trim(text)), '\\s+')`` — keep the two renderings in lockstep.
"""

from __future__ import annotations

import numpy as np
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


_ALNUM_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)
_WS_CHARS = " \t\n\x0b\f\r"  # Java regex \s, spelled as a char list


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: split on
    word boundaries/punctuation and count ~4-char subword chunks.  Pure
    arithmetic => identical in SQL.

    Character-class counting via ``translate`` (delete the class, diff the
    lengths), NOT ``regexp_replace``: both are exact for these ASCII
    classes (verified 0 mismatches over the sf10 corpus), but the regex
    spelling rebuilt the full string per row through Java's match loop —
    38.4 s vs 1.5 s at sf10 for the word-chars count alone, the single
    largest expression cost in the text-metrics family."""
    # chunks of <=4 chars per word, plus punctuation marks as single tokens
    word_chars = F.length(col) - F.length(F.translate(col, _ALNUM_CHARS, ""))
    punct = F.length(F.translate(col, _ALNUM_CHARS + _WS_CHARS, ""))
    return (F.ceil(word_chars / F.lit(4)) + punct).cast("long")


def stopword_ratio(
    col: Column,
    stopwords: list[str] | None = None,
    toks: Column | None = None,
) -> Column:
    """``toks`` (a pre-tokenized ATTRIBUTE) skips re-running the tokenizer
    regex inside this expression — see :func:`analyze` for why."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    if toks is None:
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


def mean_word_len(col: Column, toks: Column | None = None) -> Column:
    if toks is None:
        toks = tokens(col)
    return F.coalesce(
        F.try_divide(
            F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)),
            F.size(toks),
        ),
        F.lit(0.0),
    )


def quality_score(col: Column, toks: Column | None = None) -> Column:
    """Deterministic heuristic quality score in [0, 1]: rewards moderate
    length, stopword presence, sane word lengths; penalizes punctuation
    soup.  Mirrors common web-scrape quality filters (C4-style)."""
    n_tok = (F.size(toks) if toks is not None else token_count(col)).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(col, toks=toks) * 4.0, F.lit(1.0))
    wl = mean_word_len(col, toks=toks)
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    punct_pen = F.when(punct_ratio(col) > 0.1, 0.5).otherwise(1.0)
    return F.round(
        (0.4 * len_score + 0.3 * sw_score + 0.3 * wl_score) * punct_pen, 6
    )


def lang_id(col: Column, toks: Column | None = None) -> Column:
    """Stopword-profile language ID: argmax over per-language stopword hit
    counts, 'und' (undetermined) when all zero.  Ties broken by fixed
    language order (en, de, fr, es) — the oracle mirrors this exactly.

    Implemented as array_max over (score, -lang_index, lang) structs so
    each per-language score expression appears exactly ONCE in the plan —
    a when-chain against greatest(...) duplicates every score ~3x and blows
    up Catalyst analysis + codegen time (~7 s at first action)."""
    if toks is None:
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


def fingerprint_toks(toks: Column) -> Column:
    """:func:`fingerprint` over a pre-tokenized attribute."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


_FP_MOD = (1 << 61) - 1
_FP_BASE = 257
_M61 = np.uint64(_FP_MOD)
_MASK32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized (a * b) mod 2^61-1 for uint64 inputs < 2^61-1.

    32-bit limb decomposition keeps every partial product inside uint64;
    the Mersenne modulus reduces by bit-folding (2^61 === 1, 2^64 === 8)."""
    a1, a0 = a >> np.uint64(32), a & _MASK32
    b1, b0 = b >> np.uint64(32), b & _MASK32
    hi = a1 * b1  # * 2^64 === * 8
    mid = a1 * b0 + a0 * b1  # * 2^32; < 2^62
    lo = a0 * b0  # full product < 2^64
    r = (
        (lo & _M61)
        + (lo >> np.uint64(61))
        + (hi << np.uint64(3))
        + (mid >> np.uint64(29))
        + ((mid & _MASK29) << np.uint64(32))
    )
    r = (r & _M61) + (r >> np.uint64(61))
    r = (r & _M61) + (r >> np.uint64(61))
    return np.where(r >= _M61, r - _M61, r)


def rolling_fingerprint_udf():
    """Polynomial rolling hash over the raw text (Rabin-Karp style):
    h = sum ord(c_i) * BASE^(n-1-i) mod 2^61-1 — identical values to the
    classic per-character Horner walk, but fully vectorized: codepoints
    come from a zero-copy utf-32 view, the power table is shared across
    the Arrow batch, and the per-document work is one numpy mulmod + two
    limb sums (no per-character Python).  Not SQL-expressible (modular
    exponentiation) — covered by the rows-only driver check + pytest."""

    @F.pandas_udf("long")
    def roll(texts: pd.Series) -> pd.Series:
        lens = [len(t) if t else 0 for t in texts]
        maxlen = max(lens, default=0)
        # BASE^k mod p, k = 0..maxlen-1 (python-int loop is per-batch, not
        # per-char: ~1 mul per distinct character position)
        pows_list, p = [], 1
        for _ in range(maxlen):
            pows_list.append(p)
            p = (p * _FP_BASE) % _FP_MOD
        pows = np.array(pows_list or [1], dtype=np.uint64)
        out = []
        for t, n in zip(texts, lens):
            if not n:
                out.append(0)
                continue
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            terms = _mulmod61(codes, pows[:n][::-1])
            # split-limb sum: each term < 2^61, so hi < 2^29*n, lo < 2^32*n
            hi = int((terms >> np.uint64(32)).sum())
            lo = int((terms & _MASK32).sum())
            out.append(((hi << 32) + lo) % _FP_MOD)
        return pd.Series(out)

    return roll


_INV_B = pow(_FP_BASE, _FP_MOD - 2, _FP_MOD)


def _power_tables(maxlen: int) -> tuple[np.ndarray, np.ndarray]:
    """BASE^j and inv(BASE)^j mod p for j = 0..maxlen, shared across an
    Arrow batch (the python-int loop is per-batch, not per-char)."""
    pows_list, p = [], 1
    ipows_list, q = [], 1
    for _ in range(maxlen + 1):
        pows_list.append(p)
        p = (p * _FP_BASE) % _FP_MOD
        ipows_list.append(q)
        q = (q * _INV_B) % _FP_MOD
    return (
        np.array(pows_list, dtype=np.uint64),
        np.array(ipows_list, dtype=np.uint64),
    )


def _kgram_hashes(
    t: str, n: int, k: int, pows: np.ndarray, ipows: np.ndarray
) -> np.ndarray:
    """The n-k+1 per-position k-gram Rabin-Karp hashes of ``t`` (n >= k),
    vectorized O(n): whole-text terms t_i = c_i * B^(n-1-i), limb-split
    prefix sums, then each window's scaled sum rebased by one mulmod with
    inv(B)^(n-k-j)."""
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    terms = _mulmod61(codes, pows[:n][::-1])
    # limb-split prefix sums stay exact in uint64 for n << 2^29
    z = np.zeros(1, dtype=np.uint64)
    hi = np.concatenate([z, np.cumsum(terms >> np.uint64(32))])
    lo = np.concatenate([z, np.cumsum(terms & _MASK32)])
    # S_j mod p, recombined as (hi mod p) * 2^32 + lo
    s_mod = (
        _mulmod61(hi % _M61, np.full(n + 1, 1 << 32, dtype=np.uint64))
        + lo % _M61
    )
    s_mod = np.where(s_mod >= _M61, s_mod - _M61, s_mod)
    w = s_mod[k:] - s_mod[: n - k + 1]  # windows j = 0 .. n-k
    w = np.where(s_mod[k:] >= s_mod[: n - k + 1], w, w + _M61)
    # rebase: window j carries B^(n-1-(j+k-1)) — multiply by
    # inv(B)^(n-k-j), j descending from n-k to 0
    return _mulmod61(w, ipows[: n - k + 1][::-1].copy())


def windowed_fingerprint_udf(k: int):
    """Per-position k-gram rolling hashes: for each window [j, j+k) the
    position-independent hash sum ord(c_{j+i}) * BASE^(k-1-i) mod 2^61-1
    — the passage-level fingerprint a cross-document repeated-substring
    (suffix-array-style) dedup keys on.

    Vectorized O(n) per document (``_kgram_hashes``).  Returns
    array<long> (n-k+1 hashes; empty when the text is shorter than k).

    POLICY: oracle-only at scale — one output row per character makes
    this the ground-truth twin for :func:`winnowed_fingerprint_udf`,
    which is the production default (2/(w+1) density, same >= k+w-1
    detection guarantee)."""

    @F.pandas_udf("array<long>")
    def wroll(texts: pd.Series) -> pd.Series:
        lens = [len(t) if t else 0 for t in texts]
        pows, ipows = _power_tables(max(lens, default=0))
        out = []
        for t, n in zip(texts, lens):
            if n < k:
                out.append([])
                continue
            hashes = _kgram_hashes(t, n, k, pows, ipows)
            out.append([int(x) for x in hashes])
        return pd.Series(out)

    return wroll


def winnowed_fingerprint_udf(k: int, w: int):
    """Winnowed k-gram fingerprints (Schleimer/Manber/Aiken, SIGMOD'03):
    the per-position hashes of ``windowed_fingerprint_udf`` reduced to the
    positions that are the LEFTMOST minimum of at least one window of
    ``w`` consecutive k-gram hashes.

    This is the production scale path for repeated-passage detection: the
    exact all-windows variant emits one row per character of the corpus
    (~1e14 generated rows at 100 TB before map-side combine), while
    winnowing emits an expected 2/(w+1) of that — with the guarantee that
    any passage of length >= w + k - 1 chars shared by two documents
    contributes at least one identical selected fingerprint in both.
    Documents with fewer than ``w`` hashes (length < k+w-1) emit their
    single global minimum so short docs remain comparable.

    Leftmost-argmin tie-break (numpy argmin's first-occurrence rule) keeps
    the selection deterministic and SQL-mirrorable: the oracle replays it
    as MIN(pos) among window positions whose hash equals the window MIN.
    In-UDF cost is O(n*w) vectorized compares over a zero-copy sliding
    view — cheap next to the shuffle rows it removes.  Returns
    array<struct<pos:int,fp:long>> sorted by pos (selected positions are
    deduplicated; the same fp value selected at two positions yields two
    entries, preserving occurrence counts)."""

    @F.pandas_udf("array<struct<pos:int,fp:long>>")
    def winnow(texts: pd.Series) -> pd.Series:
        out = []
        lens = [len(t) if t else 0 for t in texts]
        pows, ipows = _power_tables(max(lens, default=0))
        for t, n in zip(texts, lens):
            if n < k:
                out.append([])
                continue
            hashes = _kgram_hashes(t, n, k, pows, ipows)
            n_h = len(hashes)
            if n_h <= w:
                sel = np.array([np.argmin(hashes)])
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hashes, w)
                am = sw.argmin(axis=1) + np.arange(n_h - w + 1)
                sel = np.unique(am)
            out.append(
                [{"pos": int(p), "fp": int(hashes[p])} for p in sel]
            )
        return pd.Series(out)

    return winnow


def fingerprint_doc_counts(df: DataFrame, doc_col: str, text_col: str,
                           k: int) -> DataFrame:
    """Fused k-gram fingerprinting + per-document (fp, occ) pre-aggregate
    (round 15): one ``mapInPandas`` stage emits each document's DISTINCT
    fingerprints with their occurrence counts directly, replacing
    explode + groupBy(fp, doc) — a full corpus-size shuffle.  Each
    document appears in exactly one input row, so its per-fp counts are
    complete locally (``np.unique``); callers aggregate with ONE shuffle,
    on fp.  Returns (doc_col, fp, occ)."""
    doc_t = df.schema[doc_col].dataType.simpleString()
    schema = f"{doc_col} {doc_t}, fp long, occ long"

    def gen(batches):
        for pdf in batches:
            texts = pdf[text_col]
            docs = pdf[doc_col].to_numpy()
            lens = [len(t) if t else 0 for t in texts]
            pows, ipows = _power_tables(max(lens, default=0))
            doc_out, fp_out, occ_out = [], [], []
            for d, t, n in zip(docs, texts, lens):
                if n < k:
                    continue
                fps, cnt = np.unique(
                    _kgram_hashes(t, n, k, pows, ipows), return_counts=True
                )
                doc_out.append(np.full(fps.size, d, dtype=np.int64))
                fp_out.append(fps.astype(np.int64))
                occ_out.append(cnt.astype(np.int64))
            if doc_out:
                yield pd.DataFrame(
                    {
                        doc_col: np.concatenate(doc_out),
                        "fp": np.concatenate(fp_out),
                        "occ": np.concatenate(occ_out),
                    }
                )

    return df.select(doc_col, text_col).mapInPandas(gen, schema=schema)


def winnowed_fingerprint_doc_counts(df: DataFrame, doc_col: str,
                                    text_col: str, k: int,
                                    w: int) -> DataFrame:
    """Winnowed sibling of :func:`fingerprint_doc_counts`: the same fused
    per-document pre-aggregate over the WINNOWED selection (leftmost
    window minima, :func:`winnowed_fingerprint_udf` semantics — occ
    counts selected positions).  Returns (doc_col, fp, occ)."""
    doc_t = df.schema[doc_col].dataType.simpleString()
    schema = f"{doc_col} {doc_t}, fp long, occ long"

    def gen(batches):
        for pdf in batches:
            texts = pdf[text_col]
            docs = pdf[doc_col].to_numpy()
            lens = [len(t) if t else 0 for t in texts]
            pows, ipows = _power_tables(max(lens, default=0))
            doc_out, fp_out, occ_out = [], [], []
            for d, t, n in zip(docs, texts, lens):
                if n < k:
                    continue
                hashes = _kgram_hashes(t, n, k, pows, ipows)
                n_h = len(hashes)
                if n_h <= w:
                    sel = np.array([np.argmin(hashes)])
                else:
                    sw = np.lib.stride_tricks.sliding_window_view(hashes, w)
                    am = sw.argmin(axis=1) + np.arange(n_h - w + 1)
                    sel = np.unique(am)
                fps, cnt = np.unique(hashes[sel], return_counts=True)
                doc_out.append(np.full(fps.size, d, dtype=np.int64))
                fp_out.append(fps.astype(np.int64))
                occ_out.append(cnt.astype(np.int64))
            if doc_out:
                yield pd.DataFrame(
                    {
                        doc_col: np.concatenate(doc_out),
                        "fp": np.concatenate(fp_out),
                        "occ": np.concatenate(occ_out),
                    }
                )

    return df.select(doc_col, text_col).mapInPandas(gen, schema=schema)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass projection adding every text metric (single narrow stage).

    Tokenize-ONCE discipline (round 13; measured 65.9 -> see chain at
    sf10): spelled naively, the metric expressions each embed their own
    ``tokens(text)`` — the regex split ran ~13x per row across
    token_count, stopword_ratio, quality_score (which nests three more),
    lang_id's four language filters, and fingerprint.  Catalyst's
    subexpression elimination does not reach inside higher-order-function
    arguments, so the fix is structural: one Generate barrier turns the
    tokens array into a real ATTRIBUTE (evaluated once per row), and every
    metric takes it via its ``toks=`` parameter.  The raw text rides along
    for the character-class metrics (punct/bpe), which never tokenize."""
    c = F.col(text_col)
    others = [col for col in df.columns]
    barrier = df.select(
        *others, F.explode(F.array(tokens(c))).alias("__toks")
    )
    tk = F.col("__toks")
    return barrier.select(
        *others,
        F.size(tk).alias("n_tokens"),
        bpe_token_estimate(c).alias("n_tokens_bpe"),
        F.round(stopword_ratio(c, toks=tk), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        quality_score(c, toks=tk).alias("quality"),
        lang_id(c, toks=tk).alias("lang_pred"),
        fingerprint_toks(tk).alias("fingerprint"),
    )
