"""KMeans clustering + convex-hull generation.

Re-expression of the reference's Spark KMeans runner
(analytics/spark/.../kmeans/KMeansRunner.java:201-211 — MLlib KMeans over
feature centroids) and KMeansHullGenerator (hull polygon per cluster).
The clustering itself is ``pyspark.ml.clustering.KMeans`` (built-in,
JVM-side); hulls are Andrew's monotone-chain convex hull in numpy via one
``applyInPandas`` per cluster — the same groupBy shape the reference's
hull generator uses per centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_clusters(
    df: DataFrame,
    k: int,
    lon: str = "lon",
    lat: str = "lat",
    max_iter: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Assign each row a cluster id (column ``cluster``) via MLlib KMeans."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    feats = VectorAssembler(inputCols=[lon, lat], outputCol="_features").transform(df)
    model = KMeans(
        k=k, maxIter=max_iter, seed=seed, featuresCol="_features", predictionCol="cluster"
    ).fit(feats)
    return model.transform(feats).drop("_features")


def lloyd_kmeans(
    df: DataFrame,
    k: int,
    id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    max_iter: int = 50,
    snap: float = 1000.0,
) -> DataFrame:
    """Deterministic Lloyd's k-means, bit-reproducible across engines.

    MLlib's k-means|| init is seed- and partitioning-dependent, so its
    output can't be gated against an independent implementation.  This
    variant is fully pinned:

    * coordinates snap to a grid (``floor(x*snap + 0.5)`` → int64), so
      per-cluster centroid *sums* are exact integers (Spark ``sum(long)``
      and ``np.bincount`` agree bit-for-bit);
    * initial centroids are the ``k`` rows with the lowest ``id_col``;
    * each iteration broadcasts the k ``(sum_x, sum_y, n)`` triples as
      literals; the assignment expression evaluates
      ``(x - sx/n)² + (y - sy/n)²`` in a fixed IEEE-754 op order, so any
      correctly-rounding engine (JVM, numpy) produces identical bits;
      ties break to the lowest cluster index (``array_min`` over
      ``struct(dist, idx)`` == ``np.argmin`` first-occurrence);
    * an empty cluster keeps its previous centroid;
    * convergence = the integer sum triples reach a fixpoint.

    Scale notes: the per-iteration shuffle is one map-side-combinable
    groupBy of k rows; the centroid state collected per iteration is k
    triples.  Integer sums overflow int64 only past ~5e10 rows per
    cluster at 8 decimal digits of coordinate — far beyond the 100 TB
    target for point data.
    """
    pts = df.withColumn(
        "_xi", F.floor(F.col(lon) * F.lit(snap) + F.lit(0.5)).cast("long")
    ).withColumn("_yi", F.floor(F.col(lat) * F.lit(snap) + F.lit(0.5)).cast("long"))
    pts = pts.persist()
    try:
        init = (
            pts.select(id_col, "_xi", "_yi").orderBy(id_col).limit(k).collect()
        )
        if len(init) < k:
            raise ValueError(f"k={k} exceeds the {len(init)} distinct input rows")
        cents: list[tuple[int, int, int]] = [(r["_xi"], r["_yi"], 1) for r in init]

        def assign_expr(cs):
            xd = F.col("_xi").cast("double")
            yd = F.col("_yi").cast("double")
            arms = []
            for i, (sx, sy, n) in enumerate(cs):
                cx, cy = float(sx) / float(n), float(sy) / float(n)
                dx = xd - F.lit(cx)
                dy = yd - F.lit(cy)
                arms.append(
                    F.struct((dx * dx + dy * dy).alias("d"), F.lit(i).alias("i"))
                )
            return F.array_min(F.array(*arms))["i"]

        for _ in range(max_iter):
            rows = (
                pts.groupBy(assign_expr(cents).alias("_c"))
                .agg(
                    F.sum("_xi").alias("sx"),
                    F.sum("_yi").alias("sy"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            new = list(cents)  # empty clusters keep their centroid
            for r in rows:
                new[r["_c"]] = (r["sx"], r["sy"], r["n"])
            if new == cents:
                break
            cents = new
        return pts.withColumn("cluster", assign_expr(cents)).drop("_xi", "_yi")
    finally:
        pts.unpersist()


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns closed ring (CCW) — degenerate
    inputs (<3 distinct points) return the distinct points themselves."""
    pts = np.unique(points, axis=0)
    if len(pts) < 3:
        return pts
    # lexicographic sort is given by np.unique
    def half(iterable):
        chain: list[np.ndarray] = []
        for p in iterable:
            # scalar 2-D cross product written out (np.cross on 2-D vectors
            # is deprecated in NumPy 2.0)
            while len(chain) >= 2 and (
                (chain[-1][0] - chain[-2][0]) * (p[1] - chain[-2][1])
                - (chain[-1][1] - chain[-2][1]) * (p[0] - chain[-2][0])
            ) <= 0:
                chain.pop()
            chain.append(p)
        return chain

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    return np.vstack([ring, ring[:1]])


def cluster_hulls(
    assigned: DataFrame,
    cluster_col: str = "cluster",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """One convex-hull WKT + count per cluster (KMeansHullGenerator)."""

    def _hull(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[[lon, lat]].to_numpy(np.float64)
        ring = convex_hull(pts)
        if len(ring) == 1:
            wkt = f"POINT ({ring[0][0]:.17g} {ring[0][1]:.17g})"
        elif len(ring) == 2:
            wkt = (
                f"LINESTRING ({ring[0][0]:.17g} {ring[0][1]:.17g}, "
                f"{ring[1][0]:.17g} {ring[1][1]:.17g})"
            )
        else:
            inner = ", ".join(f"{x:.17g} {y:.17g}" for x, y in ring)
            wkt = f"POLYGON (({inner}))"
        return pd.DataFrame(
            {
                cluster_col: [pdf[cluster_col].iloc[0]],
                "hull_wkt": [wkt],
                "n_points": [len(pdf)],
            }
        )

    return assigned.groupBy(cluster_col).applyInPandas(
        _hull, f"{cluster_col} int, hull_wkt string, n_points long"
    )
