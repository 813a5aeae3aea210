"""Hashing-trick logistic regression: learning signal, determinism,
partition invariance (operators/classifier.py). The gate entries prove
cross-engine exactness; this suite proves the MODEL is a real
classifier, not just reproducible arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F


def _halves(spark, sf_dir="/root/testdata/sf0.01", doc_limit=300, reparts=None):
    from kwwhat_spark.operators.classifier import hashed_token_features, train_logreg
    from kwwhat_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < doc_limit)
    if reparts:
        docs = docs.repartition(reparts)
    feats = hashed_token_features(docs, n_buckets=256)
    labels = docs.select("doc_id", (F.col("n_chars") > 300).cast("int").alias("y"))
    w = train_logreg(feats, labels, rounds=6, lr_shift=11)
    return feats, labels, w


def test_classifier_learns_weak_labels(spark):
    from kwwhat_spark.operators.classifier import score_logreg

    feats, labels, w = _halves(spark)
    scored = score_logreg(feats, w).join(labels, "doc_id")
    rows = scored.collect()
    assert len(rows) > 0
    acc = sum(1 for r in rows if int(r.predicted) == r.y) / len(rows)
    base = max(
        sum(1 for r in rows if r.y == 1), sum(1 for r in rows if r.y == 0)
    ) / len(rows)
    # Must beat the majority-class baseline: the length signal is
    # linearly separable through total hashed-token counts + bias.
    assert acc > base + 0.05, (acc, base)
    assert acc > 0.7, acc


def test_classifier_partition_invariant(spark):
    _, _, w1 = _halves(spark)
    _, _, w2 = _halves(spark, reparts=13)
    assert w1 == w2


def test_classifier_heldout_accuracy(spark):
    # The production shape (r9): normalized integer-frequency features,
    # confident weak labels (stopword-density band), held-out split,
    # halving step schedule. The VERDICT r8 target is >= 0.85 held-out
    # accuracy on the gate corpus — this pins it so a regression in
    # normalization, schedule, or labels is caught locally.
    from kwwhat_spark.queries.curation import _logreg_spark_halves, _LOGREG_CACHE
    from kwwhat_spark.operators.classifier import FREQ_SCALE, SIG_SCALE, score_logreg

    _LOGREG_CACHE.clear()
    feats, labels, splits, w = _logreg_spark_halves(spark, "/root/testdata/sf0.01")
    scored = (
        score_logreg(feats, w, dot_scale=SIG_SCALE * FREQ_SCALE)
        .join(labels, "doc_id")
        .join(splits, "doc_id")
    )
    rows = scored.collect()
    held = [r for r in rows if not r.train]
    assert len(held) >= 50
    acc = sum(1 for r in held if int(r.predicted) == r.y) / len(held)
    base = max(
        sum(1 for r in held if r.y == 1), sum(1 for r in held if r.y == 0)
    ) / len(held)
    assert acc >= 0.85, (acc, base)
    assert acc > base + 0.2, (acc, base)
    _LOGREG_CACHE.clear()


def test_bias_bucket_present_for_empty_docs(spark):
    from kwwhat_spark.operators.classifier import BIAS_BUCKET, hashed_token_features

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    feats = hashed_token_features(df)
    got = {(r.doc_id, r.bucket) for r in feats.collect()}
    assert (2, BIAS_BUCKET) in got  # token-less doc still scoreable
    assert (1, BIAS_BUCKET) in got
