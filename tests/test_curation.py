"""Training-data curation operators (functions/curation.py): behavioral
edge cases beyond the oracle parity in test_entry_parity.py."""

import pytest

from scanner_spark.functions import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),   # 8 tokens
        (1, "alpha beta gamma delta epsilon iota kappa"),       # shares 5-gram with 0
        (2, "one two three four five six seven eight nine"),    # disjoint
        (3, "spam spam spam spam spam spam"),                   # degenerate repetition
        (4, "tiny doc"),                                        # < n tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_shared_ngrams(spark, docs):
    ev = docs.filter("doc_id = 0")
    train = docs.filter("doc_id != 0")
    out = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in curation.decontaminate(train, ev, n=5).collect()
    }
    # doc 1 shares exactly 'alpha beta gamma delta epsilon' with doc 0
    assert out[1] == (1, 1)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)  # sub-n doc can never collide
    assert set(out) == {1, 2, 3, 4}  # every train row present


def test_repetition_stats_degenerate_doc(spark, docs):
    out = {r.doc_id: r for r in curation.repetition_stats(docs).collect()}
    r3 = out[3]  # 'spam' x6: all duplicate tokens and bigrams
    assert r3.n_tokens == 6
    assert r3.dup_token_ratio == pytest.approx(1 - 1 / 6, abs=1e-6)
    assert r3.top_token_ratio == 1.0
    assert r3.dup_bigram_ratio == pytest.approx(1 - 1 / 5, abs=1e-6)
    r0 = out[0]  # all-distinct doc
    assert r0.dup_token_ratio == 0.0
    assert r0.dup_bigram_ratio == 0.0
    # single-bigram-impossible doc is not NULL, it's 0 for a 2-token doc
    assert out[4].dup_bigram_ratio == 0.0


def test_repetition_filter_kept_flag(spark, docs):
    kept = {r.doc_id: r.kept for r in curation.repetition_filter(docs).collect()}
    assert kept[3] == 0  # spam doc must be dropped
    assert kept[0] == 1


def test_stratified_sample_exact_k_and_deterministic(spark):
    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    s1 = curation.stratified_sample(df, ["source"], 5)
    s2 = curation.stratified_sample(df, ["source"], 5)
    got1 = sorted((r.source, r.rank, r.doc_id) for r in s1.collect())
    got2 = sorted((r.source, r.rank, r.doc_id) for r in s2.collect())
    assert got1 == got2  # deterministic, no RNG state
    per = {}
    for src, rank, _ in got1:
        per.setdefault(src, []).append(rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())


def test_domain_resample_caps_and_determinism(spark):
    # one huge group, one small: big is downsampled to ~target, small kept
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out1 = curation.domain_resample(df, target_per_group=20)
    out2 = curation.domain_resample(df, target_per_group=20)
    got1 = sorted((r.doc_id, r.source) for r in out1.collect())
    assert got1 == sorted((r.doc_id, r.source) for r in out2.collect())
    by_src = {}
    for _, src in got1:
        by_src[src] = by_src.get(src, 0) + 1
    assert by_src["small"] == 5  # p = 1, every row kept
    # Binomial(400, 0.05): mean 20, sd ~4.4 — accept a wide but real band
    assert 5 <= by_src["big"] <= 40
    # keep_p is the exact capped rate
    ps = {r.source: r.keep_p for r in out1.collect()}
    assert ps["small"] == 1.0 and ps["big"] == 0.05


def test_pack_sequences_layout(spark):
    # docs of 5/7/4 tokens in one shard, seq_len 8: cum-before 0,5,12
    rows = [
        (1, "a", "t t t t t"),
        (2, "a", "t t t t t t t"),
        (3, "a", "t t t t"),
        (9, "b", "t t t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in curation.pack_sequences(df, seq_len=8).collect()}
    assert (out[1].seq_id, out[1].seq_offset) == (0, 0)
    assert (out[2].seq_id, out[2].seq_offset) == (0, 5)  # overflows seq 0
    assert (out[3].seq_id, out[3].seq_offset) == (1, 4)  # lands in seq 1
    assert (out[9].seq_id, out[9].seq_offset) == (0, 0)  # shards independent
    assert out[2].n_tokens == 7


def test_chunk_windows_remainder(spark):
    df = spark.createDataFrame(
        [(7, " ".join(f"t{i}" for i in range(70)))], "doc_id long, text string"
    )
    out = sorted(
        (r.chunk_idx, r.n_tokens, r.chunk_text)
        for r in curation.chunk_windows(df, size=32).collect()
    )
    assert [(c, n) for c, n, _ in out] == [(0, 32), (1, 32), (2, 6)]
    assert out[0][2].startswith("t0 t1 ")
    assert out[2][2] == "t64 t65 t66 t67 t68 t69"
    # reassembling the chunks reproduces the document
    assert " ".join(t for _, _, t in out) == " ".join(f"t{i}" for i in range(70))
