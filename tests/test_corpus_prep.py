"""Unit invariants for the corpus-preparation operators added for the
training-data pipeline surface: mixture resampling, sequence packing,
decontamination, TF-IDF, and PII redaction. (Cross-engine equality is
covered by the oracle gate in test_catalog_oracle.py.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kwwhat_spark.functions.text import redact_pii
from kwwhat_spark.operators.corpus import (
    mix_corpora,
    ngram_contamination,
    pack_sequences,
    tfidf_top_terms,
)
from kwwhat_spark.sources.testdata import load_table


def test_mix_corpora_hits_target_proportions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    weights = {"en": 0.3, "de": 0.2, "zh": 0.2, "fr": 0.15, "es": 0.15}
    mixed = mix_corpora(docs, "doc_id", "lang", weights, budget_frac=0.5)
    total = docs.count()
    got = {r["lang"]: r["cnt"] for r in mixed.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for lang, w in weights.items():
        target = 0.5 * total * w
        avail = docs.filter(F.col("lang") == lang).count()
        expected = min(target, avail)
        # 16-bit Bernoulli thresholding: binomial noise around the target.
        assert abs(got.get(lang, 0) - expected) <= max(6, 0.35 * expected), (lang, got, expected)


def test_mix_corpora_deterministic_and_capped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # fr gets weight 1.0 → target far above its count → rate caps at 1: all fr kept.
    mixed = mix_corpora(docs, "doc_id", "lang", {"fr": 1.0}, budget_frac=1.0)
    assert mixed.count() == docs.filter(F.col("lang") == "fr").count()
    a = sorted(r.doc_id for r in mix_corpora(docs, "doc_id", "lang", {"en": 1.0}, budget_frac=0.3).collect())
    b = sorted(r.doc_id for r in mix_corpora(docs, "doc_id", "lang", {"en": 1.0}, budget_frac=0.3).collect())
    assert a == b and len(a) > 0


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    packed = pack_sequences(docs, "text", budget=256, partition_col="lang", order_col="doc_id")
    rows = packed.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r.bin_offset < 256
        assert r.spans_boundary == (r.bin_offset + r.n_tokens > 256)
    # Replaying the greedy concatenation per shard reproduces bin/offset.
    by_lang: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        cum = 0
        for r in rs:
            assert r.bin_id == cum // 256 and r.bin_offset == cum % 256, (lang, r)
            cum += r.n_tokens


def test_ngram_contamination_matches_naive(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # shares 5-gram with eval 10
            (2, "one two three four five six seven"),  # no overlap
            (3, "alpha beta gamma delta epsilon"),  # exactly one shingle, shared
            (4, "too short"),  # < 5 tokens: cannot match
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon eta"), (11, "nine ten eleven twelve thirteen")],
        ["doc_id", "text"],
    )
    got = {r.train_id: r.matched_eval_docs for r in ngram_contamination(train, eval_df).collect()}
    assert got == {1: 1, 3: 1}


def test_tfidf_surfaces_distinctive_term(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common rare_x rare_x rare_x"),
            (2, "common common filler filler"),
            (3, "common filler other other"),
        ],
        ["doc_id", "text"],
    )
    top = tfidf_top_terms(docs, top_n=1)
    got = {r.doc_id: r.term for r in top.collect()}
    # rare_x: tf 3 × idf (3+1)/(1+1)=2 → 6.0 beats common: tf 2 × idf 4/4=1 → 2.0.
    assert got[1] == "rare_x"


def test_redact_pii_counts_and_placeholders(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user+tag@example.co.uk then +1 555-123-4567 and card 4111 1111 1111 1111 end")],
        ["id", "text"],
    )
    r = df.select(redact_pii("text").alias("r")).select("r.*").collect()[0]
    assert r.n_emails == 1
    assert r.n_long_numbers == 2
    assert "<EMAIL>" in r.redacted and "<NUM>" in r.redacted
    assert "@" not in r.redacted and "4111" not in r.redacted


def test_ngram_contamination_broadcast_eval_same_result(spark, sf_dir):
    from pyspark.sql import functions as F2

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_eval = (
        F2.substring(F2.md5(F2.concat(F2.lit("eval"), F2.col("doc_id").cast("string"))), 1, 2)
        < "15"
    )
    plain = ngram_contamination(docs.filter(~is_eval), docs.filter(is_eval))
    hinted = ngram_contamination(
        docs.filter(~is_eval), docs.filter(is_eval), broadcast_eval=True
    )
    assert "BroadcastHashJoin" in hinted._jdf.queryExecution().executedPlan().toString()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, hinted.collect()))


def test_compact_partitioned_rewrites_only_fragmented_partitions(spark, tmp_path):
    # Two merge batches leave several small files per touched partition;
    # compaction must collapse exactly the fragmented partitions to one
    # file, preserve every row, and leave healthy partitions' files
    # byte-for-byte alone (same names + mtimes).
    from pathlib import Path

    from pyspark.sql import functions as F

    from kwwhat_spark.sinks import compact_partitioned

    path = str(tmp_path / "tbl")
    base = spark.range(0, 400).select(
        F.col("id"),
        F.when(F.col("id") < 200, "2025-10-01").otherwise("2025-10-02").alias("_date"),
    )
    # day 1 written fragmented (8 tiny files), day 2 as one healthy file.
    frag = base.filter("_date = '2025-10-01'").repartition(8)
    one = base.filter("_date = '2025-10-02'").coalesce(1)
    frag.unionByName(one).write.partitionBy("_date").parquet(path)

    day2 = Path(path) / "_date=2025-10-02"
    before_day2 = sorted((p.name, p.stat().st_mtime_ns) for p in day2.glob("*.parquet"))
    rewritten = compact_partitioned(spark, path, target_mb=128, min_files=4, sort_col="id")
    assert list(rewritten) == [str(Path(path) / "_date=2025-10-01")]
    assert rewritten[str(Path(path) / "_date=2025-10-01")] == 8

    day1_files = list((Path(path) / "_date=2025-10-01").glob("*.parquet"))
    assert len(day1_files) == 1, "fragmented partition collapses to one file"
    assert sorted(
        (p.name, p.stat().st_mtime_ns) for p in day2.glob("*.parquet")
    ) == before_day2, "healthy partition untouched"

    got = spark.read.parquet(path)
    assert got.count() == 400
    assert got.agg(F.sum("id")).first()[0] == sum(range(400))
    # within-partition sort restored: ids ascending inside the rewritten file
    ids = [r.id for r in spark.read.parquet(str(day1_files[0])).collect()]
    assert ids == sorted(ids)

    # idempotent: a second pass finds nothing to do
    assert compact_partitioned(spark, path, target_mb=128, min_files=4) == {}


def test_write_training_shards_round_trip(spark, sf_dir, tmp_path):
    from kwwhat_spark.sinks import write_training_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, order_by=["lang", "doc_id"], rows_per_shard=100, n_partitions=4
    )
    import glob

    files = glob.glob(out + "/part-*.parquet")
    n = docs.count()
    assert len(files) >= (n + 99) // 100  # size bound respected
    back = spark.read.parquet(out)
    assert back.count() == n
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    # Range partitioning + per-file cap: each file is internally sorted
    # and files don't interleave key ranges within a partition's output.
    for f in files:
        rows = spark.read.parquet(f).select("lang", "doc_id").collect()
        keys = [(r.lang, r.doc_id) for r in rows]
        assert keys == sorted(keys), f


def test_mix_corpora_upsample_replicates_to_target(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    mixed = mix_corpora(
        docs, "doc_id", "lang", {"fr": 0.6, "en": 0.4},
        budget_frac=1.0, allow_upsample=True,
    )
    total = docs.count()
    got = {r["lang"]: r["cnt"] for r in mixed.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert set(got) == {"fr", "en"}
    for lang, w in {"fr": 0.6, "en": 0.4}.items():
        target = total * w
        assert abs(got[lang] - target) <= max(8, 0.2 * target), (lang, got, target)
    # copy_idx is dense 1..n per replicated doc.
    fr = mixed.filter(F.col("lang") == "fr").groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("copy_idx").alias("mx"), F.min("copy_idx").alias("mn")
    )
    bad = fr.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count()
    assert bad == 0


def test_shard_column_uniform_and_deterministic(spark, sf_dir):
    from kwwhat_spark.operators.scaling import shard_column

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = shard_column(docs, "doc_id", 16)
    counts = [r.cnt for r in a.groupBy("shard").agg(F.count("*").alias("cnt")).collect()]
    assert len(counts) == 16
    n = docs.count()
    assert max(counts) < 3 * n / 16  # no pathological skew
    b = {(r.doc_id, r.shard) for r in shard_column(docs, "doc_id", 16).collect()}
    assert {(r.doc_id, r.shard) for r in a.collect()} == b


def test_materialize_packed_bins_exact_budget(spark, sf_dir):
    from kwwhat_spark.operators.corpus import materialize_packed_bins

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    bins = materialize_packed_bins(docs, "text", budget=256).collect()
    by_lang: dict[str, list] = {}
    for r in bins:
        by_lang.setdefault(r.lang, []).append(r)
    total_tokens = 0
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.bin_id)
        assert [r.bin_id for r in rs] == list(range(len(rs))), "bins must be dense from 0"
        for r in rs[:-1]:
            assert r.bin_tokens == 256, (lang, r.bin_id, r.bin_tokens)
            assert len(r.bin_text.split(" ")) == 256
        assert 1 <= rs[-1].bin_tokens <= 256
        total_tokens += sum(r.bin_tokens for r in rs)
    # token conservation vs the source corpus
    from pyspark.sql import functions as F2

    src = docs.select(
        F2.size(F2.filter(F2.split("text", r"\s+"), lambda t: t != "")).alias("n")
    ).agg(F2.sum("n")).collect()[0][0]
    assert total_tokens == src


@pytest.mark.full
def test_incremental_exact_dedup_across_batches(spark, sf_dir, tmp_path):
    from kwwhat_spark.operators.corpus import incremental_exact_dedup
    from kwwhat_spark.plans.incremental import ParquetStateStore

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    # batch 2 = odd docs + re-sent copies of some even docs (higher ids)
    resent = b1.limit(50).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    b2 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(resent)

    out1 = incremental_exact_dedup(b1, store)
    n1 = out1.count()
    assert n1 == b1.select(F.md5("text")).distinct().count()

    out2 = incremental_exact_dedup(b2, store).collect()
    got_ids = {r.doc_id for r in out2}
    assert not any(i >= 1_000_000 for i in got_ids), "archive dups must be dropped"
    # every surviving batch-2 hash is new to the archive
    all_b1_hashes = {r.h for r in b1.select(F.md5("text").alias("h")).distinct().collect()}
    out2_hashes = {r.h for r in spark.createDataFrame([(r.doc_id,) for r in out2], "doc_id long")
                   .join(docs, "doc_id").select(F.md5("text").alias("h")).collect()}
    assert not (out2_hashes & all_b1_hashes)
    # index now covers both batches
    idx = store.read("corpus_hash_index")
    assert idx.count() == len(all_b1_hashes | out2_hashes)


def test_quantize_int8_error_bound_and_normalize(spark, sf_dir):
    import math

    from kwwhat_spark.operators.similarity import l2_normalize, quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(50)
    rows = emb.select(
        "embedding",
        quantize_int8(F.col("embedding")).alias("qz"),
        l2_normalize(F.col("embedding")).alias("unit"),
    ).collect()
    for r in rows:
        scale, q = r.qz.scale, r.qz.q
        assert all(-127 <= c <= 127 for c in q)
        # dequantized values within half a quantization step
        for orig, code in zip(r.embedding, q):
            assert abs(code * scale / 127 - orig) <= scale / 127 / 2 + 1e-9
        n = math.sqrt(sum(x * x for x in r.unit))
        assert abs(n - 1.0) < 1e-9


@pytest.mark.full
def test_incremental_minhash_dedup_across_batches(spark, tmp_path):
    from kwwhat_spark.operators.dedup import incremental_minhash_dedup
    from kwwhat_spark.plans.incremental import ParquetStateStore

    store = ParquetStateStore(spark, str(tmp_path / "mh_state"))
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    b1 = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # near-dup of 1 → dropped in-batch
            (3, "completely different words about spark shuffles and parquet scans here"),
        ],
        "doc_id long, text string",
    )
    out1 = sorted(r.doc_id for r in incremental_minhash_dedup(b1, store).collect())
    assert out1 == [1, 3]

    b2 = spark.createDataFrame(
        [
            (10, base),                    # exact dup of archived 1 → dropped vs archive
            (11, base + " indeed"),        # near-dup of archived 1 → dropped
            (12, "fresh unrelated content mentioning embeddings quantization and training shards"),
        ],
        "doc_id long, text string",
    )
    out2 = sorted(r.doc_id for r in incremental_minhash_dedup(b2, store).collect())
    assert out2 == [12]

    # Replay of batch 2 is idempotent: 12 is archived now, but an archive
    # hit on a doc's OWN id is excluded from the dup verdict, so the
    # replay reproduces the original survivor set instead of dropping
    # every doc as a duplicate of itself.
    out3 = sorted(r.doc_id for r in incremental_minhash_dedup(b2, store).collect())
    assert out3 == [12]


def test_dedup_lines_keeps_first_occurrence_and_short_lines(spark):
    from kwwhat_spark.operators.corpus import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma\n--\nshared line here\nunique one"),
            (2, "shared line here\n--\nanother unique line\nshared line here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_lines(docs, min_chars=3).collect()}
    # doc 1 owns the first occurrence of the shared line; "--" is under
    # min_chars and survives everywhere despite repeating.
    assert rows[1]["n_lines"] == 4 and rows[1]["n_kept"] == 4
    assert rows[1]["text_clean"] == "alpha beta gamma\n--\nshared line here\nunique one"
    # doc 2 loses BOTH later occurrences (cross-doc and within-doc).
    assert rows[2]["n_lines"] == 4 and rows[2]["n_kept"] == 2
    assert rows[2]["text_clean"] == "--\nanother unique line"


def test_deterministic_shuffle_is_a_dense_stable_permutation(spark):
    from kwwhat_spark.operators.corpus import deterministic_shuffle

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    out = deterministic_shuffle(docs, "doc_id", salt="s1", buckets=16).collect()
    ordinals = sorted(r["shuffle_ordinal"] for r in out)
    assert ordinals == list(range(500))
    # Partitioning-independent and salt-sensitive.
    again = {
        r["doc_id"]: r["shuffle_ordinal"]
        for r in deterministic_shuffle(
            docs.repartition(7), "doc_id", salt="s1", buckets=16
        ).collect()
    }
    assert again == {r["doc_id"]: r["shuffle_ordinal"] for r in out}
    other = {
        r["doc_id"]: r["shuffle_ordinal"]
        for r in deterministic_shuffle(docs, "doc_id", salt="s2", buckets=16).collect()
    }
    assert other != again
    # Ordinals follow the global (md5 key, id) order: bucketing refines it.
    import hashlib
    expect = sorted(range(500), key=lambda i: (hashlib.md5(f"s1|{i}".encode()).hexdigest(), i))
    assert [again[i] for i in expect] == list(range(500))


def test_incremental_line_dedup_across_batches(spark, tmp_path):
    from kwwhat_spark.operators.corpus import incremental_line_dedup
    from kwwhat_spark.plans.incremental import ParquetStateStore

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma\n--\nshared line here"),
         (2, "shared line here\ndelta epsilon zeta")],
        "doc_id long, text string",
    )
    r1 = {r["doc_id"]: r for r in
          incremental_line_dedup(b1, store, min_chars=3).collect()}
    assert r1[1]["n_kept"] == 3  # first occurrence + short "--" kept
    assert r1[2]["text_clean"] == "delta epsilon zeta"  # cross-doc dup dropped

    # Batch 2: a line from the archive, a batch-internal dup, a new line.
    b2 = spark.createDataFrame(
        [(3, "shared line here\nbrand new line\n--"),
         (4, "brand new line\nanother fresh line")],
        "doc_id long, text string",
    )
    r2 = {r["doc_id"]: r for r in
          incremental_line_dedup(b2, store, min_chars=3).collect()}
    # doc 3 loses the archived line, keeps its batch-first new line and "--".
    assert r2[3]["text_clean"] == "brand new line\n--"
    # doc 4 loses the batch-internal dup of doc 3's line.
    assert r2[4]["text_clean"] == "another fresh line"

    # Redelivery of batch 2: everything eligible is already archived.
    r3 = {r["doc_id"]: r for r in
          incremental_line_dedup(b2, store, min_chars=3).collect()}
    assert r3[3]["text_clean"] == "--" and r3[4]["n_kept"] == 0


def test_bigram_logprob_short_docs_drop_and_counts(spark):
    from kwwhat_spark.operators.corpus import bigram_logprob_scores

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),     # bigrams: (a,b) x2, (b,a) x1
            (2, "a"),           # <2 tokens -> no row
            (3, ""),            # empty -> no row
            (4, "  b   a  "),   # whitespace torture -> (b,a)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob_scores(docs).collect()}
    assert set(out) == {1, 4}
    assert out[1].n_bigrams == 3
    assert out[4].n_bigrams == 1
    # (b,a) occurs twice on prev-count c(b)=3 -> p=.8*2/3+.2*4/7~.65;
    # (a,b) twice on c(a)=4 -> p~.49. Doc 4 is pure (b,a), the MORE
    # probable bigram, so its mean surprisal is strictly lower than
    # doc 1's mix.
    assert out[4].mean_bigram_surprisal_bits < out[1].mean_bigram_surprisal_bits


def test_bm25_ranking_properties(spark):
    from kwwhat_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "x y z hash hash hash"),   # heavy tf on one term
            (2, "x hash merge"),           # two distinct terms
            (3, "x y z w q r s t u v"),    # no match -> absent
            (4, "hash merge scan"),        # all three terms
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["hash", "merge", "scan"], limit=10).collect()
    got = {r.doc_id: r for r in rows}
    assert 3 not in got
    assert got[4].n_terms_matched == 3
    assert got[2].n_terms_matched == 2
    assert got[1].n_terms_matched == 1
    # Rows come back in (score desc, doc_id) order and scores are longs.
    scores = [r.bm25_score_q for r in rows]
    assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)
    assert all(isinstance(s, int) for s in scores)
