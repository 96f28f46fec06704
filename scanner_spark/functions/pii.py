"""PII detection and redaction over text columns.

A training-data pipeline scrubs personally identifiable information before
anything else touches the corpus (the reference has no analog — its ingest
is media-only, scanner/engine/ingest.cpp — but every large-scale text
pipeline needs this stage).  Four detector classes ship here: email
addresses, US-style SSNs, IPv4 addresses, and phone numbers.

Design for 100 TB:
- Detection and redaction are single-pass JVM regex expressions
  (``regexp_count`` / ``regexp_replace``) — whole-stage codegen, no Python,
  no shuffle; the stage is embarrassingly parallel and pipelines with the
  scan.
- Patterns are written in the common subset of Java regex (Spark) and RE2
  (DuckDB, Go, Hyperscan-ish engines): no lookarounds, no backreferences,
  ASCII word boundaries only — so the exact same pattern string drives the
  engine and the cross-engine oracle, and would drive a sidecar scrubber.
- Redaction order is a fixed, documented sequence (email, SSN, IPv4,
  phone).  Order matters: an SSN is a substring a loose phone pattern can
  shadow, so the more specific classes run first.  Every consumer
  (Spark query, SQL oracle) must apply the same order.

Why the four passes are NOT fused into one alternation (measured
adjudication, round 12): a single ``(email)|(ssn)|(ipv4)|(phone)`` pass
is not byte-identical to the chain — the chained passes re-evaluate
``\\b`` against REPLACEMENT-token neighbours, so on ``"a@b.co123-45-6789"``
the chain scrubs the SSN (the boundary between ``<EMAIL>`` and ``1``
exists after the email pass) while the single pass, matching against
original-text context (``o`` then ``1``, no boundary), leaves it —
and the lookbehind that would fix it is outside the Java∩RE2 subset
(``test_pii.py`` pins the example).  Measured anyway at sf1: the fused
replace is only ~8%% faster than the 4-pass chain (1.73 s vs 1.89 s
replace-only; Java's alternation automaton costs nearly as much as four
simple scans) and the query's other half is the four ``regexp_count``
scans, so the ceiling is ~3%% of the query for a semantics change.  The
chain stays.  For PII-free rows a ``rlike`` guard IS provably identity
(every class replace is a no-op) — ``pii_scrub(guard=True)`` offers it
for real corpora; the driver corpus seeds PII into every row, so the
benchmark query keeps the unguarded chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Patterns in the Java-regex ∩ RE2 common subset.  Kept deliberately
# simple and auditable — production scrubbing tunes recall/precision per
# corpus; the operator contract here is "same pattern, same order,
# same result in any engine".
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# NOTE on the leading "+": "\b\+?" would never match the "+" (space->"+"
# is not a word boundary), silently dropping it from the redaction; the
# alternation anchors the boundary on the digit only when there is no "+".
PHONE_RE = r"(\+\d{1,3}|\b\d{1,3})[-. ]\d{3}[-. ]\d{4}\b"

# (name, pattern, replacement) in REDACTION ORDER — specific before loose.
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def pii_count(col: Column, pattern: str) -> Column:
    """Occurrences of one PII pattern in ``col`` (JVM ``regexp_count``)."""
    return F.regexp_count(col, F.lit(pattern))


def pii_scrub(col: Column, guard: bool = False) -> Column:
    """Redact all PII classes from ``col`` in the documented order.

    Chained ``regexp_replace`` — one codegen'd pass per class, narrow, no
    Python.  The oracle twin is the same chain of RE2 ``regexp_replace``
    with the ``'g'`` flag.

    ``guard=True`` wraps the chain in a single-pass any-class ``rlike``
    pre-filter: rows with no candidate match skip all four replaces.
    Provably byte-identical (when no class matches anywhere, every
    replace is the identity) and the ``rlike`` scan short-circuits at
    the first hit — the right default for real corpora, where most rows
    are PII-free; pointless for the seeded benchmark corpus (every row
    carries PII), which is why the query keeps ``guard=False``."""
    out = col
    for _name, pat, repl in PII_CLASSES:
        out = F.regexp_replace(out, pat, repl)
    if guard:
        any_pii = "|".join(f"(?:{p})" for _n, p, _r in PII_CLASSES)
        return F.when(col.rlike(any_pii), out).otherwise(col)
    return out


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII counts + scrubbed text.

    Adds one ``n_<class>`` column per detector and ``scrubbed``; all
    expressions fuse into a single projection over the scan (verify with
    ``.explain``: one WholeStageCodegen span, PushedFilters untouched)."""
    c = F.col(text_col)
    out = df
    for name, pat, _repl in PII_CLASSES:
        out = out.withColumn(f"n_{name}", pii_count(c, pat))
    return out.withColumn("scrubbed", pii_scrub(c))


def oracle_scrub_sql(col_sql: str) -> str:
    """The DuckDB twin of :func:`pii_scrub` for column expression
    ``col_sql`` — same patterns, same order, RE2 global replace."""
    out = col_sql
    for _name, pat, repl in PII_CLASSES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def oracle_count_sql(col_sql: str, pattern: str) -> str:
    """The DuckDB twin of :func:`pii_count`."""
    return f"len(regexp_extract_all({col_sql}, '{pattern}'))"
