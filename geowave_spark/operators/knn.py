"""kNN via cell-ring expansion — entirely Catalyst-native.

Re-expression of GeoWave's NNMapReduce
(analytics/mapreduce/.../nn/NNMapReduce.java:94-226) +
OrthodromicDistancePartitioner (analytics/api/.../partitioner/
AbstractPartitioner.java:80-132): partition space into a grid of cells with
edge ≥ max_distance, assign each candidate to its primary cell, duplicate
each query point into its cell *and the 8 neighbors* (the H3 grid_disk(1)
ring analog — primary/secondary cell semantics), then all true neighbors
within max_distance are guaranteed co-located with the query.

The whole operator is built-in Spark: integer grid keys via floor
arithmetic, one hash equi-join, whole-stage-codegen distance filter, and a
window ``row_number() <= k`` for the per-item top-K cap
(NNMapReduce.java:88-91 maxNeighbors).  No Python UDF anywhere, so the hot
path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    max_distance: float,
    query_id: str,
    candidate_id: str,
    q_lon: str = "lon",
    q_lat: str = "lat",
    c_lon: str = "lon",
    c_lat: str = "lat",
    include_distance: bool = False,
    exclude_self: bool = False,
) -> DataFrame:
    """For each query point: its ≤k nearest candidates within max_distance.

    Deterministic tie-break: (squared distance, candidate_id).  Output
    columns: query_id, candidate_id, rank[, dist2].
    """
    if max_distance <= 0:
        raise ValueError("max_distance must be positive")
    cs = float(max_distance)  # cell size == ring guarantee radius

    cand = candidates.select(
        F.col(candidate_id).alias("_cid"),
        F.col(c_lon).alias("_clon"),
        F.col(c_lat).alias("_clat"),
        F.floor((F.col(c_lon) + F.lit(180.0)) / F.lit(cs)).alias("_cx"),
        F.floor((F.col(c_lat) + F.lit(90.0)) / F.lit(cs)).alias("_cy"),
    )

    spark = queries.sparkSession
    ring = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    qry = (
        queries.select(
            F.col(query_id).alias("_qid"),
            F.col(q_lon).alias("_qlon"),
            F.col(q_lat).alias("_qlat"),
        )
        .crossJoin(F.broadcast(ring))
        .select(
            "_qid",
            "_qlon",
            "_qlat",
            (F.floor((F.col("_qlon") + F.lit(180.0)) / F.lit(cs)) + F.col("dx")).alias("_cx"),
            (F.floor((F.col("_qlat") + F.lit(90.0)) / F.lit(cs)) + F.col("dy")).alias("_cy"),
        )
    )

    dx = F.col("_qlon") - F.col("_clon")
    dy = F.col("_qlat") - F.col("_clat")
    d2 = (dx * dx + dy * dy).alias("_d2")
    joined = qry.join(cand, ["_cx", "_cy"]).select("_qid", "_cid", d2)
    joined = joined.where(F.col("_d2") <= F.lit(cs * cs))
    if exclude_self:
        joined = joined.where(F.col("_qid") != F.col("_cid"))

    w = Window.partitionBy("_qid").orderBy(F.col("_d2").asc(), F.col("_cid").asc())
    out = (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(candidate_id),
            "rank",
            F.col("_d2").alias("dist2"),
        )
    )
    if not include_distance:
        out = out.drop("dist2")
    return out
