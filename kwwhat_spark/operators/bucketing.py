"""Bucketed-table materialization: co-located joins and aggregations
without a shuffle.

The 100 TB lever the parquet-directory sinks can't give: writing a fact
table with `bucketBy(N, key)` + `sortBy(key)` hash-places every row of
a key into a fixed bucket file. Two tables bucketed the same way join
bucket-to-bucket with NO Exchange on either side, and a groupBy on the
bucket key aggregates with no shuffle — the single biggest repeated
cost in a fact⋈fact pipeline (e.g. the reference's per-charger joins,
SURVEY.md §2.3) paid once at write time instead of per query.

Spark only tracks bucketing through the catalog (saveAsTable), not
plain parquet paths — so these helpers materialize managed tables in
the session warehouse. At cluster scale the same calls target the
production metastore unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize `df` as a bucketed (and bucket-sorted) managed table.

    num_buckets should divide evenly into the cluster's parallelism and
    keep per-bucket files near the 128 MB–1 GB sweet spot at target
    scale; sorting within buckets additionally removes the Sort from
    sort-merge joins.
    """
    if mode == "overwrite":
        # A crashed/previous session can leave the managed location on
        # disk without catalog metadata; saveAsTable then refuses with
        # LOCATION_ALREADY_EXISTS. Drop both.
        import shutil
        from urllib.parse import urlparse

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str) -> bool:
    """True when both tables exist and declare identical bucket specs
    (then an equi-join on the bucket columns needs no Exchange)."""

    def spec(t: str):
        try:
            rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        except Exception:
            return None
        info = {r.col_name: r.data_type for r in rows}
        return (info.get("Num Buckets"), info.get("Bucket Columns"))

    sa, sb = spec(table_a), spec(table_b)
    return sa is not None and sa == sb and sa[0] is not None
