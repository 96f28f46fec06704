"""PII scrub plan adjudications (functions/pii.py) — why the 4-pass
chain is not fused, and that the rlike guard is byte-identical."""


def test_fused_alternation_would_diverge_and_guard_is_identity(spark):
    """Pins the round-12 adjudication that keeps the 4-pass chain:
    (a) on text where a digit-leading class abuts an email, the chain
    scrubs BOTH (the email replacement creates the \\b the SSN needs) —
    a single fused alternation over original-text context would not;
    (b) the rlike-guarded chain is byte-identical on every row."""
    from pyspark.sql import functions as F

    from scanner_spark.functions import pii

    rows = [
        ("a", "contact a@b.co123-45-6789 now"),   # the divergence witness
        ("b", "plain text, no pii at all"),
        ("c", "mail x@y.org and ssn 123-45-6789"),
        ("d", "ip 10.1.2.3 tel +1 555 1234"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    out = df.select(
        "id",
        pii.pii_scrub(F.col("text")).alias("chain"),
        pii.pii_scrub(F.col("text"), guard=True).alias("guarded"),
        F.regexp_replace(
            F.col("text"),
            "|".join(f"(?:{p})" for _n, p, _r in pii.PII_CLASSES),
            "<PII>",
        ).alias("fused_generic"),
    ).orderBy("id").collect()
    by = {r.id: r for r in out}
    # chained: email then SSN both scrubbed
    assert by["a"].chain == "contact <EMAIL><SSN> now"
    # the fused single pass keeps the SSN digits (no \b after 'o')
    assert "123-45-6789" in by["a"].fused_generic
    # the guard is byte-identical everywhere, including PII-free rows
    for r in out:
        assert r.guarded == r.chain
