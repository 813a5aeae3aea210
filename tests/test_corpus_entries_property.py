"""Generated-corpus property harness for the round-6 document entries:
adversarial document frames (tab/multi-space whitespace runs, empty and
single-token docs, shared high-frequency bigrams, degenerate one-source
frames) written to a temp parquet and compared through each entry's OWN
Spark plan vs its OWN DuckDB oracle — tokenizer parity
(java \\s+ vs DuckDB string_split_regex) and threshold arithmetic pinned
on shapes the driver fixture never produces.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest

# Slow tier (r13 suite split): generated-corpora oracle property harness.
# Default runs exclude it (pytest.ini addopts); run with -m full.
pytestmark = pytest.mark.full

from kwwhat_spark.queries import REGISTRY
from tests.oracle_harness import compare

ENTRIES = (
    "heavy_hitters_bigrams",
    "outlier_docs_zscore",
    "split_leakage_safe",
    # round 7: the LM-scoring and retrieval entries share the same \s+
    # tokenizer-parity risk surface
    "quality_unigram_logprob",
    "quality_bigram_logprob",
    "bm25_retrieval_topk",
    "curriculum_order",
)


def _docs_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    return con


def _gen_docs(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    # 'hash'/'merge'/'scan' are bm25_retrieval_topk's fixed query terms —
    # present so its tf/idf/length machinery actually bites here.
    vocab = ["alpha", "beta", "Gamma", "DELTA", "x1", "y2z", "hash", "merge", "scan"]
    rows = []
    for doc_id in range(120):
        kind = rng.randrange(8)
        if kind == 0:
            text = ""  # empty doc: zero bigrams, len 0
        elif kind == 1:
            text = rng.choice(vocab)  # single token: zero bigrams
        elif kind == 2:
            # whitespace-run torture: tabs, multi-space, leading/trailing
            words = [rng.choice(vocab) for _ in range(rng.randrange(2, 8))]
            text = "  " + "\t".join(words) + "   " + rng.choice(vocab) + " "
        elif kind == 3:
            # shared hot bigram so the heavy-hitter threshold bites
            text = " ".join(["alpha beta"] * rng.randrange(3, 9))
        else:
            words = [rng.choice(vocab) for _ in range(rng.randrange(2, 30))]
            text = " ".join(words)
        source = rng.choice(["web", "book", "code"]) if kind != 4 else "web"
        rows.append(
            (
                doc_id,
                text,
                rng.choice(["en", "de"]),
                source,
                len(text),
            )
        )
    # extreme-length outliers for the z-score side
    rows.append((900, "q " * 5000, "en", "web", 10000))
    rows.append((901, "", "en", "book", 0))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


@pytest.mark.parametrize("seed", [5, 17])
def test_doc_entries_match_oracle_on_generated_corpora(spark, seed):
    pdf = _gen_docs(seed)
    tmp = tempfile.mkdtemp(prefix="kwh-corpus-prop-")
    try:
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp}/_stage"
        )
        part = next(
            f
            for f in os.listdir(f"{tmp}/_stage")
            if f.endswith(".parquet") and not f.startswith("_")
        )
        shutil.copy(f"{tmp}/_stage/{part}", f"{tmp}/documents.parquet")
        con = _docs_con(tmp)
        for name in ENTRIES:
            q = REGISTRY[name]
            problems = compare(q.spark(spark, tmp), con, q.oracle)
            assert not problems, f"{name} seed={seed}: " + " | ".join(problems)
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_heavy_hitters_empty_corpus(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["", "solo"], "lang": ["en", "en"],
         "source": ["web", "web"], "n_chars": [0, 4]}
    )
    tmp = tempfile.mkdtemp(prefix="kwh-corpus-empty-")
    try:
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp}/_stage"
        )
        part = next(
            f for f in os.listdir(f"{tmp}/_stage") if f.endswith(".parquet")
        )
        shutil.copy(f"{tmp}/_stage/{part}", f"{tmp}/documents.parquet")
        # zero bigrams in the whole corpus -> empty exact result, no error
        assert REGISTRY["heavy_hitters_bigrams"].spark(spark, tmp).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
