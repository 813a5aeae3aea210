"""Deterministic k-means over integer-quantized vectors.

MLlib's KMeans (used by similarity.train_centroids) is the production
trainer, but its float arithmetic is not reproducible across engines, so
its results can only be validated structurally. This module provides the
complementary EXACT variant: Lloyd's algorithm on int8-quantized codes
(operators/similarity.quantize_int8) where every quantity — squared-L2
distances, centroid sums, mean updates — is integer arithmetic with
truncating division. The full iterative trajectory is then bit-identical
in Spark, DuckDB (as unrolled CTEs), and the Python driver, which makes
k-means itself oracle-checkable, the same trick as the quantized
PageRank in operators/graph.py.

Scale shape per iteration: one narrow assignment projection against K
broadcast centroid literals (no shuffle, no join) + one combinable
aggregation producing K×dim integer sums; the K×dim centroid matrix
round-trips through the driver exactly as MLlib's Lloyd does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (SQL `div` / DuckDB `//` semantics;
    Python's // floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _sq_dist(codes: Column, centroid: list[int]) -> Column:
    lit_c = F.array(*[F.lit(int(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(codes, lit_c, lambda x, y: ((x - y) * (x - y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame, codes_col: str, centroids: list[tuple[int, list[int]]]
) -> DataFrame:
    """Add (cluster_id, dist_q): nearest centroid by integer squared L2,
    ties to the smaller centroid id. Pure projection."""
    scored = [
        F.struct(
            _sq_dist(F.col(codes_col), cvec).alias("dist_q"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, cvec in centroids
    ]
    best = F.array_min(F.array(*scored))
    return df.withColumn("cluster_id", best["cid"]).withColumn(
        "dist_q", best["dist_q"]
    )


def kmeans_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    *,
    k: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """Deterministic Lloyd k-means on integer codes. Initial centroids
    are the first k rows by id (dense-id seed, expressible in static
    oracle SQL); each iteration assigns by integer distance and updates
    centroids as per-dimension truncated mean of the assigned codes.
    Returns the final assignment (id, cluster_id, dist_q).

    Empty clusters keep their previous centroid (no reseeding), matching
    the oracle's LEFT JOIN + COALESCE.
    """
    seed_rows = (
        df.select(id_col, codes_col).orderBy(id_col).limit(k).collect()
    )
    centroids = [(i, list(r[1])) for i, r in enumerate(seed_rows)]
    dim = len(centroids[0][1])
    for _ in range(iterations):
        assigned = assign_clusters(df, codes_col, centroids)
        sums = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at(F.col(codes_col), i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        by_cid = {r["cluster_id"]: r for r in sums}
        centroids = [
            (
                cid,
                [
                    _trunc_div(int(by_cid[cid][f"s{i}"]), int(by_cid[cid]["n"]))
                    for i in range(dim)
                ]
                if cid in by_cid
                else old,
            )
            for cid, old in centroids
        ]
    return assign_clusters(df, codes_col, centroids).select(
        id_col, "cluster_id", "dist_q"
    )
