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
