"""KMeans + hull parity (KMeansRunner.java / KMeansHullGenerator analogs)."""

import numpy as np
import pandas as pd

from geowave_spark.operators.kmeans import cluster_hulls, convex_hull, kmeans_clusters


def test_convex_hull_numpy():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.3]], float)
    ring = convex_hull(pts)
    assert len(ring) == 5  # 4 corners + closure
    corners = {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)}
    assert {tuple(p) for p in ring[:-1]} == corners


def test_kmeans_recovers_separated_clusters(spark):
    rng = np.random.default_rng(5)
    centers = [(-120.0, 40.0), (10.0, -30.0), (100.0, 60.0)]
    rows = []
    for ci, (cx, cy) in enumerate(centers):
        for i in range(200):
            rows.append((f"p{ci}_{i}", cx + rng.normal(0, 0.5), cy + rng.normal(0, 0.5)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "lon", "lat"]))
    assigned = kmeans_clusters(df, k=3)
    pdf = assigned.toPandas()
    # each true cluster maps to exactly one predicted label
    pdf["truth"] = pdf["id"].str.split("_").str[0]
    grouping = pdf.groupby("truth")["cluster"].nunique()
    assert (grouping == 1).all()
    assert pdf["cluster"].nunique() == 3

    hulls = cluster_hulls(assigned).toPandas()
    assert len(hulls) == 3
    assert hulls["n_points"].sum() == 600
    # every hull is a polygon containing its cluster's points
    from geowave_spark.geom import parse_wkt, points_in_polygons_batch, pad_rings

    for _, h in hulls.iterrows():
        kind, ring = parse_wkt(h["hull_wkt"])
        assert kind == "POLYGON"
        sub = pdf[pdf["cluster"] == h["cluster"]]
        inside = points_in_polygons_batch(
            sub["lon"].to_numpy(), sub["lat"].to_numpy(),
            np.zeros(len(sub), int), pad_rings([ring]),
        )
        assert inside.all()
