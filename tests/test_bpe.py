"""Distributed BPE merge learning vs a pure-Python reference.

The catalog entry is rows-only (iterative driver loop — documented
structural necessity), so exactness is pinned HERE: the distributed
learner must produce the identical merge table as a sequential
reference implementation on randomized corpora, under arbitrary
partitioning, with the same (count desc, left, right) tie-break.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kwwhat_spark.operators.bpe import EOW, apply_bpe, learn_bpe_merges


def _ref_bpe(texts: list[str], n_merges: int):
    """Sequential word-level BPE (Sennrich et al. 2016) reference."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[tuple(list(w[:-1]) + [w[-1] + EOW])] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        new_vocab = Counter()
        for syms, c in vocab.items():
            res, i = [], 0
            syms = list(syms)
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += c
        vocab = new_vocab
    return merges


WORDS = ["low", "lower", "lowest", "newer", "wider", "new", "widest", "er", "zz"]


@pytest.mark.full
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_learned_merges_match_reference(spark, seed):
    rng = random.Random(seed)
    texts = [
        " ".join(rng.choices(WORDS, k=rng.randint(1, 30))) for _ in range(120)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string").repartition(7)
    got = learn_bpe_merges(df, n_merges=12)
    exp = _ref_bpe(texts, 12)
    assert got == exp


def _ref_byte_bpe(texts: list[str], n_merges: int):
    """Sequential byte-level BPE reference: GPT-2 regex pre-tokenizer
    (the `regex` module supports \\p{L}/\\p{N}/(?!\\S) exactly like
    Java's engine on these classes), byte->unicode alphabet, same
    (count desc, left, right) tie-break as the distributed learner."""
    import regex

    from kwwhat_spark.operators.bpe import GPT2_SPLIT_PATTERN, bytes_to_unicode

    b2u = bytes_to_unicode()
    pat = regex.compile(GPT2_SPLIT_PATTERN)
    vocab = Counter()
    for t in texts:
        for tok in pat.findall(t):
            vocab[tuple(b2u[b] for b in tok.encode("utf-8"))] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        new_vocab = Counter()
        for syms, c in vocab.items():
            res, i = [], 0
            syms = list(syms)
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += c
        vocab = new_vocab
    return merges


BYTE_WORDS = [
    "low", "lower", "don't", "it's", "we'll", "I'm", "2024", "x99",
    "hello,", "(end)", "a-b", "...",
]


@pytest.mark.full
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_byte_level_merges_match_reference(spark, seed):
    rng = random.Random(1000 + seed)
    texts = []
    for _ in range(100):
        # Mixed separators exercise every pre-tokenizer branch:
        # contractions, number runs, punctuation runs, double spaces
        # (the \s+(?!\S) lookahead), trailing whitespace.
        words = rng.choices(BYTE_WORDS, k=rng.randint(1, 25))
        sep = rng.choice([" ", "  ", " "])
        texts.append(sep.join(words) + rng.choice(["", " ", "\n"]))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(7)
    got = learn_bpe_merges(df, n_merges=14, level="byte")
    exp = _ref_byte_bpe(texts, 14)
    assert got == exp


def test_byte_level_non_ascii_whitespace_matches_reference(spark):
    # U+00A0 (NBSP) and U+3000 (ideographic space) are whitespace to the
    # Python `regex` module's \s but NOT to plain Java \s — the Spark
    # side prepends (?U) (UNICODE_CHARACTER_CLASS) so both engines
    # classify them as whitespace. This pins that agreement: were the
    # JVM still ASCII-\s, NBSP would be swallowed into punctuation runs
    # and the learned merge table would diverge from the reference.
    texts = [
        "café au lait café au",  # NBSP separators
        "　hello　world　hello",  # ideographic space
        "mix   of kinds  and 　 runs",
        "café au lait plain ascii too",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(5)
    got = learn_bpe_merges(df, n_merges=12, level="byte")
    exp = _ref_byte_bpe(texts, 12)
    assert got == exp


def test_byte_level_whitespace_pretokenizer_matches_reference(spark):
    # The SQL-replayable twin shape (whitespace pre-tokenizer + byte
    # alphabet) must agree with a sequential reference that whitespace-
    # splits then byte-maps — the same machinery the gate entry
    # bpe_byte_merges_replayable binds to the DuckDB oracle. Non-ASCII
    # words exercise the bijection's remapped region.
    from kwwhat_spark.operators.bpe import bytes_to_unicode, learn_bpe_merges

    b2u = bytes_to_unicode()
    texts = [
        "café über low low café",
        "żółw lower żółw café naïve",
        "low lower λόγος über",
    ] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(5)
    got = learn_bpe_merges(df, n_merges=10, level="byte", pretokenizer="whitespace")

    vocab = Counter()
    for t in texts:
        for tok in t.split():
            vocab[tuple(b2u[b] for b in tok.encode("utf-8"))] += 1
    merges = []
    for rank in range(1, 11):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        new_vocab = Counter()
        for syms, c in vocab.items():
            res, i = [], 0
            syms = list(syms)
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += c
        vocab = new_vocab
    assert got == merges


def test_byte_level_alphabet_is_bijective():
    from kwwhat_spark.operators.bpe import bytes_to_unicode

    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert b2u[ord("A")] == "A" and b2u[0x20] != " "  # space remapped


def test_early_stop_when_nothing_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    # Every pair occurs once -> no merge has pair_count >= 2.
    assert learn_bpe_merges(df, n_merges=5) == []


def test_apply_bpe_counts(spark):
    texts = ["low low lower", "lowest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, n_merges=6)
    out = {r.doc_id: r for r in apply_bpe(df, merges).collect()}
    assert out[0].n_words == 3 and out[1].n_words == 2
    # 'low' appears 4x -> (l,o) then (lo, w</w>) merge early, so the word
    # 'low' ends as ONE token; totals must reflect that.
    ref = _ref_bpe(texts, 6)
    assert merges == ref
    assert out[0].n_bpe_tokens < sum(len(w) + 0 for w in "low low lower".split()) + 3
    assert out[0].tokens_per_word == out[0].n_bpe_tokens / out[0].n_words


def test_apply_bpe_byte_level_matches_reference(spark):
    texts = ["don't stop", "it's  2024 x99 (end)", "hello, hello, a-b ..."]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, n_merges=10, level="byte")
    assert merges == _ref_byte_bpe(texts, 10)
    out = {r.doc_id: r for r in apply_bpe(df, merges, level="byte").collect()}

    import regex

    from kwwhat_spark.operators.bpe import GPT2_SPLIT_PATTERN, bytes_to_unicode
    from kwwhat_spark.operators.bpe import _merge_seq

    b2u = bytes_to_unicode()
    pat = regex.compile(GPT2_SPLIT_PATTERN)
    order = [(m[1], m[2]) for m in merges]
    for i, t in enumerate(texts):
        pres = pat.findall(t)
        n_tok = sum(
            len(_merge_seq([b2u[b] for b in w.encode("utf-8")], order)) for w in pres
        )
        assert out[i].n_words == len(pres)
        assert out[i].n_bpe_tokens == n_tok
        assert out[i].tokens_per_word == n_tok / len(pres)
