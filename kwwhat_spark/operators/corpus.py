"""Corpus-preparation operators for training-data pipelines: document
chunking and deterministic hash-based sampling.

Both are pure built-in-function compositions (JVM-side, codegen-friendly,
no UDFs) and both are engine-portable by construction so the DuckDB
oracle can replay them exactly:

- chunking tokenizes on single spaces and slices fixed token windows
  with a stride — array ops only;
- sampling keys on a prefix of md5(key) compared to a hex threshold,
  so the sampled row SET is a pure function of the key (stable across
  engines, runs, and partitionings — re-running a pipeline samples the
  same documents, which is what training-data reproducibility needs).

Scale: both are narrow per-row transforms — no shuffle, fully
pipelined into whatever scan/exchange surrounds them. Chunking's
explode multiplies rows by ~n_tokens/stride; downstream consumers
should aggregate or write before any wide operation.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    *,
    chunk_tokens: int = 64,
    stride_tokens: int | None = None,
) -> DataFrame:
    """Split each document into token windows of `chunk_tokens` tokens
    every `stride_tokens` (default = chunk_tokens, i.e. no overlap).

    Adds: chunk_seq (0-based), chunk_start_token (1-based),
    chunk_text, chunk_token_count. Tail windows shorter than
    chunk_tokens are kept (deterministic; callers can filter).
    """
    stride = stride_tokens if stride_tokens is not None else chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride_tokens must be positive")
    toks = F.split(F.col(text_col), " ")
    df = df.withColumn("__toks", toks).withColumn("__n", F.size("__toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.col("__n"), F.lit(1)), F.lit(stride))
    out = (
        df.withColumn("chunk_start_token", F.explode(starts))
        .withColumn("chunk_seq", ((F.col("chunk_start_token") - 1) / stride).cast("long"))
        .withColumn("__chunk_toks", F.slice("__toks", F.col("chunk_start_token"), chunk_tokens))
        .withColumn("chunk_text", F.array_join("__chunk_toks", " "))
        .withColumn("chunk_token_count", F.size("__chunk_toks"))
        .drop("__toks", "__n", "__chunk_toks")
    )
    return out


def hash_sample_predicate(key: Column | str, fraction: float, *, salt: str = "") -> Column:
    """Deterministic Bernoulli-sampling predicate: keep a row iff the
    first 4 hex chars of md5(salt || key) fall under floor(fraction *
    16^4). Row membership depends only on (key, salt, fraction) — the
    16-bit granularity (~1/65536) is the portability tradeoff.
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(fraction * 65536)
    if threshold >= 65536:
        return F.lit(True)
    thr_hex = format(threshold, "04x")
    prefix = F.substring(F.md5(F.concat(F.lit(salt), F.col(key) if isinstance(key, str) else key)), 1, 4)
    return prefix < F.lit(thr_hex)


def hash_sample(
    df: DataFrame,
    key: str,
    fraction: float | Mapping[str, float],
    *,
    stratify_by: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministically sample rows by hashed key.

    `fraction` is either a global rate, or (with `stratify_by`) a
    mapping from stratum value to rate — e.g. downsample dominant
    languages while keeping the long tail at 100%. Strata missing from
    the mapping are dropped (rate 0).
    """
    key_col = F.col(key).cast("string")
    if stratify_by is None:
        if not isinstance(fraction, (int, float)):
            raise ValueError("mapping fraction requires stratify_by")
        return df.filter(hash_sample_predicate(key_col, float(fraction), salt=salt))
    if isinstance(fraction, (int, float)):
        fraction = {None: float(fraction)}
    pred = F.lit(False)
    for stratum, rate in fraction.items():
        match = F.col(stratify_by) == F.lit(stratum)
        pred = F.when(match, hash_sample_predicate(key_col, float(rate), salt=salt)).otherwise(pred)
    return df.filter(pred)
