"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {q: sec}, "sf": ...}

Workloads (the north rule's spatial-join + tile-assignment throughput):
  - spatial self-join / kNN / PIP / KDE over a deterministic synthetic
    `images` table (BASELINE.json input shape) with Zipf-skewed points —
    materialized once to parquet in /tmp and reused;
  - tile assignment (decode → per-cell resample) over images with pixels;
  - the sf_dir spatial join + TPC-H-style aggregation from the driver
    contract.

Parallelism comes from SPARK_GRAFT_CPUS (local[N]); run at 8 and 32 via
tools/run_scaling.py to produce the N-vs-4N scaling table in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "30000"))
TILE_IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_TILE_IMAGES", "8000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/geowave_bench")


def materialize_images(spark, n: int) -> str:
    """One-time deterministic images parquet (reused across runs/cpu counts)."""
    from geowave_spark.sources.images import images_table, with_geometry

    path = f"{CACHE_DIR}/images_{n}.parquet"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        with_geometry(images_table(spark, n, partitions=max(CPUS * 2, 16))).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main():
    from geowave_spark.deploy import ensure_py_files
    from geowave_spark.operators.join import distance_join, point_in_polygon_join
    from geowave_spark.operators.kde import kde
    from geowave_spark.operators.knn import knn_join
    from geowave_spark.raster.tiling import tile_images
    from geowave_spark.session import get_spark
    from geowave_spark.sources.fixtures import regions_pdf

    import __spark_entry__ as entry

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS * 2, 16))
    ensure_py_files(spark)

    img_path = materialize_images(spark, IMAGES_N)
    tile_path = materialize_images(spark, TILE_IMAGES_N)

    images = spark.read.parquet(img_path)
    pts = images.select("image_id", "lon", "lat")  # column-pruned scan: no bytes read
    regions = spark.createDataFrame(regions_pdf(2000))

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def run(name, fn, rows_in=None):
        t0 = time.time()
        out = fn()
        el = time.time() - t0
        timings[name] = round(el, 3)
        if rows_in:
            extras[f"{name}_rows_per_sec"] = round(rows_in / el, 1)
        extras[f"{name}_out_rows"] = out
        return out

    # flagship: skewed self-join with explicit salting
    right = pts.select(F.col("image_id").alias("rid"), "lon", "lat")
    run(
        "spatial_self_join",
        lambda: distance_join(pts, right, 0.02, "image_id", "rid", salt=8).count(),
        rows_in=2 * IMAGES_N,
    )
    run(
        "knn_images",
        lambda: knn_join(
            pts,
            right.withColumnRenamed("rid", "cid"),
            k=5,
            max_distance=0.05,
            query_id="image_id",
            candidate_id="cid",
            exclude_self=True,
        ).count(),
        rows_in=2 * IMAGES_N,
    )
    run(
        "pip_join_images",
        lambda: point_in_polygon_join(pts, regions, "image_id", "region_id").count(),
        rows_in=IMAGES_N + 2000,
    )
    run("kde_images", lambda: kde(pts, 6).count(), rows_in=IMAGES_N)

    tile_imgs = spark.read.parquet(tile_path)
    n_tiles = run(
        "tile_assignment",
        lambda: tile_images(tile_imgs, tile_size=16).count(),
        rows_in=TILE_IMAGES_N,
    )
    extras["tile_tiles_per_sec"] = round(n_tiles / timings["tile_assignment"], 1)

    # driver-contract queries at the sf tables
    run(
        "sf_spatial_distance_join",
        lambda: entry.q_spatial_distance_join(spark, SF_DIR).count(),
    )
    run("sf_agg_pricing", lambda: entry.q_agg_pricing_summary(spark, SF_DIR).count())
    run("sf_embedding_topk", lambda: entry.q_embedding_topk(spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "spatial_join_tile_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "images_n": IMAGES_N,
        "extras": extras,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
