"""Phase-level profile of knn_join and kde at a given parallelism.

Usage: python tools/profile_knn_kde.py <cpus>

Times each internal phase (census collects, assignment, cogroup kernel;
KDE cell agg, percentile bounds, bucket counts, final window) so the
8-vs-32 comparison shows WHICH phase fails to scale, not just the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "500000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/geowave_bench")
RADIUS = 0.01
PARTS = 128


def main():
    from geowave_spark.deploy import ensure_py_files
    from geowave_spark.session import get_spark
    import bench

    spark = get_spark("profile", master=f"local[{CPUS}]", shuffle_partitions=PARTS)
    ensure_py_files(spark)
    pts_path = bench.materialize_points(spark, IMAGES_N)
    pts = spark.read.parquet(pts_path).repartition(PARTS).cache()
    pts.count()

    phases: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 3)
        return out

    # ---------------- kNN phases (mirrors knn_join internals) -----------
    import numpy as np
    from geowave_spark.operators.knn import knn_join

    cs = 3.0 * RADIUS
    cand = pts.select(F.col("image_id").alias("_cid"), F.col("lon").alias("_clon"), F.col("lat").alias("_clat"))
    gx = F.floor((F.col("_clon") + F.lit(180.0)) / F.lit(cs))
    gy = F.floor((F.col("_clat") + F.lit(90.0)) / F.lit(cs))
    factors = [1, 4, 16, 64, 256, 1024]
    clock("knn_census1", lambda: cand.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.approx_count_distinct(F.floor(gx / F.lit(s)) * F.lit(1 << 32) + F.floor(gy / F.lit(s))).alias(f"g{s}") for s in factors],
    ).collect())
    # census2 at the S the real code picks (reproduce quickly at S=4 guess)
    clock("knn_census2", lambda: cand.groupBy(
        F.floor((F.col("_clon") + F.lit(180.0)) / F.lit(cs * 4)).alias("sx"),
        F.floor((F.col("_clat") + F.lit(90.0)) / F.lit(cs * 4)).alias("sy"),
    ).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 5000).collect())

    # warm then timed full knn
    right = pts.select(F.col("image_id").alias("cid"), "lon", "lat")
    def full_knn():
        return knn_join(pts, right, k=5, max_distance=cs, query_id="image_id",
                        candidate_id="cid", exclude_self=True).count()
    clock("knn_cold", full_knn)
    clock("knn_warm1", full_knn)
    clock("knn_warm2", full_knn)

    # ---------------- KDE phases ----------------------------------------
    from geowave_spark.operators.kde import kde, distributed_percent_rank, gaussian_stencil

    level = 10
    nx, ny = 1 << (level + 1), 1 << level
    stencil = spark.createDataFrame(gaussian_stencil(), "dx int, dy int, w double")
    base = pts.select(
        F.floor((F.col("lon") + F.lit(180.0)) / F.lit(360.0) * nx).cast("long").alias("_px"),
        F.floor((F.col("lat") + F.lit(90.0)) / F.lit(180.0) * ny).cast("long").alias("_py"),
        F.lit(1.0).alias("_w0"),
    ).groupBy("_px", "_py").agg(F.sum("_w0").alias("_w0"))
    smeared = (
        base.crossJoin(F.broadcast(stencil))
        .select((F.col("_px") + F.col("dx")).alias("cx"), (F.col("_py") + F.col("dy")).alias("cy"),
                (F.col("_w0") * F.col("w")).alias("_w"))
        .where((F.col("cx") >= 0) & (F.col("cx") < nx) & (F.col("cy") >= 0) & (F.col("cy") < ny))
    )
    cells = smeared.groupBy("cx", "cy").agg(F.sum("_w").alias("weight"))
    clock("kde_cells_agg", lambda: cells.count())
    cells_p = cells.persist()
    clock("kde_persist", lambda: cells_p.count())
    clock("kde_pct_bounds", lambda: cells_p.agg(
        F.percentile_approx("weight", [i / 64 for i in range(1, 64)], 10_000).alias("b")).first())
    clock("kde_rank_total", lambda: distributed_percent_rank(cells_p).count())
    cells_p.unpersist()

    def full_kde():
        return kde(pts, level).count()
    clock("kde_warm1", full_kde)
    clock("kde_warm2", full_kde)

    print(json.dumps({"cpus": CPUS, "phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
