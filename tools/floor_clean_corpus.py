"""Cumulative stage floor of pipeline_clean_corpus at sf0.1, local[32]."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
SF = "/root/testdata/sf0.1"

from kwwhat_spark.session import get_spark
from kwwhat_spark.sources.testdata import load_table
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")

from kwwhat_spark.functions.text import whitespace_token_count
from kwwhat_spark.operators.dedup import ngram_jaccard_pairs

def build(stage):
    docs = load_table(spark, SF, "documents").withColumn(
        "token_count", whitespace_token_count("text"))
    qualified = docs.filter(F.col("token_count") >= 10)
    if stage == "1_qualified":
        return qualified
    keepers = (qualified.select(F.md5("text").alias("content_hash"), "doc_id")
               .groupBy("content_hash").agg(F.min("doc_id").alias("doc_id")))
    if stage == "2_keepers":
        return keepers
    unique_docs = qualified.join(keepers, "doc_id", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK)
    if stage == "3_unique":
        return unique_docs
    pairs = ngram_jaccard_pairs(unique_docs, "doc_id", "text",
                                block_col="lang", k=3, threshold=0.8)
    if stage == "4_pairs":
        return pairs
    cleaned = unique_docs.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti")
    return cleaned.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("token_count").alias("total_tokens"),
        (F.sum("token_count") / F.count(F.lit(1))).alias("avg_tokens"))

STAGES = ["1_qualified", "2_keepers", "3_unique", "4_pairs", "5_full"]
res = {s: [] for s in STAGES}
# warmup
build("5_full").write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
for i in range(4):
    for s in STAGES:
        t0 = time.monotonic()
        build(s).write.format("noop").mode("overwrite").save()
        res[s].append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
print(json.dumps({"mins": {s: min(v) for s, v in res.items()}, "trials": res}))
