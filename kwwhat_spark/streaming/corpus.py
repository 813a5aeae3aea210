"""Streaming corpus ingest: the training-data pipeline's front door.

A continuously-arriving document feed (files landing in object storage,
a Kafka topic of crawled pages) runs the same narrow enrichment
expressions as the batch cleaning pipeline — content hash, token count,
quality score, language guess — then exact-dedups on content hash with
watermark-bounded state and appends. Everything before the dedup is a
stateless per-row transform, so the streaming and batch paths share one
expression set and cannot drift.

Scale: per-key dedup state is garbage-collected past the watermark
(bounded memory forever); the enrichment is pipelined into the source
scan with no shuffle; the only stateful exchange is the hash-partition
on content_hash that dropDuplicatesWithinWatermark requires. Historical
(pre-stream) dedup is the batch job's responsibility — the standard
lambda split: stream handles the horizon, nightly batch handles the
archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kwwhat_spark.functions.text import (
    lang_id,
    quality_score,
    repetition_signals,
    whitespace_token_count,
)
from kwwhat_spark.streaming.sinks import stream_dedup


def enrich_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless enrichment shared by batch and streaming ingest:
    content_hash (md5), token_count, quality, lang_guess, plus the
    Gopher repetition signals (a pure per-row struct, so it streams
    without state — repetition gating happens at ingest, before any
    document reaches dedup state or storage)."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("token_count", whitespace_token_count(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_guess", lang_id(text_col))
        .withColumn("repetition", repetition_signals(text_col))
    )


def stream_ingest_corpus(
    stream: DataFrame,
    text_col: str = "text",
    *,
    min_quality: float = 0.0,
    min_tokens: int = 1,
    max_dup_3gram_frac: float = 1.0,
    dedup_delay: str = "1 hour",
    ts_col: str | None = None,
) -> DataFrame:
    """Enrich + quality-gate + watermarked exact-dedup a document stream.

    `ts_col` is the event-time column for the dedup watermark; if the
    feed has none (plain file drops), ingest processing time is used —
    dedup is then exact within `dedup_delay` of arrival, the same
    contract as the reference's late-data buffer (SURVEY.md §2.8).
    """
    enriched = enrich_documents(stream, text_col)
    if ts_col is None:
        ts_col = "ingest_ts"
        enriched = enriched.withColumn(ts_col, F.current_timestamp())
    gated = enriched.filter(
        (F.col("quality") >= F.lit(min_quality))
        & (F.col("token_count") >= F.lit(min_tokens))
        & (F.col("repetition")["dup_3gram_frac"] <= F.lit(max_dup_3gram_frac))
    )
    return stream_dedup(gated, ["content_hash"], ts_col, dedup_delay)


def stream_archive_dedup(
    stream: DataFrame,
    store,
    out_dir: str,
    *,
    name: str = "minhash_index",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
):
    """Continuous archive-scale near-dup dedup: each micro-batch runs
    incremental_minhash_dedup against the persistent band index (state
    grows with KEPT docs only, never raw corpus bytes) and appends the
    fresh survivors to `out_dir`. foreachBatch gives the micro-batch a
    full batch-plan (the LSH self-join is not stream-expressible), and
    the store merge is idempotent per content, so replays after a
    restart re-drop the same duplicates instead of duplicating output —
    the lambda-architecture unification: one index serves the nightly
    batch job AND the live stream.

    Returns the DataStreamWriter; caller adds checkpoint options and
    start()s it.
    """
    from kwwhat_spark.operators.dedup import incremental_minhash_dedup

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        fresh = incremental_minhash_dedup(
            batch_df, store, id_col, text_col, name=name, threshold=threshold
        )
        fresh.write.mode("append").parquet(out_dir)

    return stream.writeStream.foreachBatch(_dedup_batch)


def stream_line_dedup(
    stream: DataFrame,
    store,
    out_dir: str,
    *,
    name: str = "corpus_line_index",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
):
    """Continuous C4-style line dedup: each micro-batch runs
    incremental_line_dedup against the persistent line-hash index (the
    state holds ~32 bytes per distinct line, never document text) and
    appends the per-doc cleaned output to `out_dir`. Same
    lambda-architecture shape as stream_archive_dedup: foreachBatch
    gives the micro-batch a full batch plan (the corpus-wide
    first-occurrence window is not stream-expressible) and the index
    merge is idempotent per line hash, so a replayed batch re-drops the
    same lines instead of re-emitting them as fresh.

    Returns the DataStreamWriter; caller adds checkpoint options and
    start()s it.
    """
    from kwwhat_spark.operators.corpus import incremental_line_dedup

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = incremental_line_dedup(
            batch_df, store, name=name, key=id_col, text_col=text_col,
            min_chars=min_chars,
        )
        cleaned.write.mode("append").parquet(out_dir)

    return stream.writeStream.foreachBatch(_dedup_batch)
