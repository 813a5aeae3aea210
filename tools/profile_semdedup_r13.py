"""Stage profile of semantic_dedup (r13): where do the seconds go —
the ngram-Jaccard text side, the all-pairs HOF cosine side, or the
graph closure? Each stage timed with the noop sink, min-of-N, fresh
DataFrame per trial (Spark 4 caches executed result stages).

Usage: python tools/profile_semdedup_r13.py [sf_dir] [n_trials]
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kwwhat_spark.session import get_spark  # noqa: E402
from kwwhat_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, build):
    walls = []
    for _ in range(N):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        noop(build())
        walls.append(time.monotonic() - t0)
    print(f"{name:28s} min={min(walls):7.3f}  trials={[round(w,3) for w in walls]}")


spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF_DIR, "documents")
emb_n = load_table(spark, SF_DIR, "embeddings").count()
print(f"sf_dir={SF_DIR} docs={docs.count()} embeddings={emb_n}")

from kwwhat_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402
from kwwhat_spark.operators.graph import dedup_keepers  # noqa: E402
from kwwhat_spark.operators.scaling import widen  # noqa: E402
from kwwhat_spark.operators.similarity import cosine  # noqa: E402


def text_side():
    d = load_table(spark, SF_DIR, "documents")
    return ngram_jaccard_pairs(
        d, "doc_id", "text", block_col="lang", k=3, threshold=0.8
    ).select("doc_a", "doc_b")


def cos_side():
    emb = widen(
        load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    a = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= 0.95)
        .select("doc_a", "doc_b")
    )


def full():
    return dedup_keepers(text_side().union(cos_side()), "doc_a", "doc_b")


spark.sparkContext.setJobDescription("profile: cos_side")
timed("cos_side (all-pairs HOF)", cos_side)
spark.sparkContext.setJobDescription("profile: text_side")
timed("text_side (ngram jaccard)", text_side)
spark.sparkContext.setJobDescription("profile: full entry")
timed("full semantic_dedup", full)
spark.stop()
