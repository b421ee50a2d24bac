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
IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "500000"))
TILE_IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_TILE_IMAGES", "40000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/geowave_bench")
# join radius: default keeps expected pair count roughly constant as the
# input grows (pairs ~ N^2 r^2), so bigger scaling runs don't blow up the
# output side; fixed via env for apples-to-apples comparisons
RADIUS = float(
    os.environ.get("SPARK_GRAFT_BENCH_RADIUS", 0.01 * (500_000 / IMAGES_N) ** 0.5)
)
# partitioning is part of the job definition and stays FIXED across the
# N-vs-4N scaling runs (only the core count varies): 4 waves at the high
# parallelism level keeps skewed tasks load-balanced at both levels
PARTS = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "128"))


# fixture layout is part of the job definition and must be IDENTICAL at
# every parallelism level: r3's cache keyed only on n, so a low-CPUS
# scaling run regenerated images_40000.parquet with max(CPUS*2,16)=16
# single-row-group files — at local[32] half the 32m-budget splits were
# row-group-empty and 16 cores sat idle (the "tile_assignment warm 3.8 →
# 8.9 s regression" of VERDICT r3 Next #1).  128 files, one per split.
FIXTURE_PARTS = 128


def materialize_images(spark, n: int) -> str:
    """One-time deterministic images parquet (reused across runs/cpu counts)."""
    from geowave_spark.sources.images import images_table, with_geometry

    path = f"{CACHE_DIR}/images_{n}_p{FIXTURE_PARTS}.parquet"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        with_geometry(images_table(spark, n, partitions=FIXTURE_PARTS)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def materialize_points(spark, n: int) -> str:
    """Points-only table (image_id, lon, lat) — the join/kNN/KDE inputs
    don't need pixels, so their fixture skips image encoding entirely."""
    import pandas as pd

    from geowave_spark.sources.images import lonlat_for

    path = f"{CACHE_DIR}/points_{n}_p{FIXTURE_PARTS}.parquet"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        def _gen(batches):
            for pdf in batches:
                i = pdf["id"].to_numpy()
                lon, lat = lonlat_for(i)
                yield pd.DataFrame(
                    {
                        "image_id": [f"img{v:010d}" for v in i.tolist()],
                        "lon": lon,
                        "lat": lat,
                    }
                )

        spark.range(0, n, 1, FIXTURE_PARTS).mapInPandas(
            _gen, "image_id string, lon double, lat double"
        ).write.mode("overwrite").parquet(path)
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

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=PARTS)
    ensure_py_files(spark)

    pts_path = materialize_points(spark, IMAGES_N)
    tile_path = materialize_images(spark, TILE_IMAGES_N)

    # spread the small parquet across all cores (a cluster reading TBs gets
    # this from file splits; local-mode tiny files collapse to few splits)
    pts = spark.read.parquet(pts_path).repartition(PARTS)
    regions = spark.createDataFrame(regions_pdf(2000))

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def run(name, fn, rows_in=None):
        # cold once (JVM JIT + python-worker-pool costs a long-lived
        # cluster amortizes), then two warm runs reporting the MINIMUM —
        # this VM shows large host-level noise between runs, and the min
        # is the least-contaminated estimate of the steady state
        t0 = time.time()
        out = fn()
        cold = time.time() - t0
        warms = []
        for _ in range(2):
            t0 = time.time()
            out = fn()
            warms.append(time.time() - t0)
        el = min(warms)
        timings[name] = round(el, 3)
        extras[f"{name}_cold_sec"] = round(cold, 3)
        if rows_in:
            extras[f"{name}_rows_per_sec"] = round(rows_in / el, 1)
        extras[f"{name}_out_rows"] = out
        return out

    # warm-up: JIT + input caches, not timed
    pts = pts.cache()
    pts.count()

    # flagship: skewed-cluster self-join (cell-level occupancy is moderate →
    # unsalted; the dedicated hot-cell benches below show explicit salting)
    right = pts.select(F.col("image_id").alias("rid"), "lon", "lat")
    run(
        "spatial_self_join",
        lambda: distance_join(pts, right, RADIUS, "image_id", "rid").count(),
        rows_in=2 * IMAGES_N,
    )

    # explicit skew handling: every probe row lands in ONE coarse index cell
    # (radius 0.01 → join tier 14, cell edge ≈ 0.022°; the probe cluster
    # spans 0.01° so it cannot straddle more than one boundary — the round-1
    # fixture spanned 0.088° ≈ 16 cells and was never actually skewed).
    # Unsalted, the single (cell) key serializes ~640M candidate pairs on
    # one reducer; census-driven salting splits that key 16 ways.
    hot_n = 40000
    hot_probe = (
        spark.range(0, hot_n, 1, PARTS)
        .select(
            F.col("id").alias("hid"),
            (F.lit(10.0) + (F.col("id") % 500) * 2e-5).alias("lon"),
            (F.lit(10.0) + ((F.col("id") * 7919) % 499) * 2e-5).alias("lat"),
        )
        .cache()
    )
    hot_build = (
        spark.range(16000)
        .select(
            F.col("id").alias("bid"),
            (F.lit(10.005) + (F.col("id") % 400) * 1e-7).alias("lon"),
            (F.lit(10.005) + (F.col("id") % 397) * 1e-7).alias("lat"),
        )
        .cache()
    )
    hot_probe.count(), hot_build.count()
    run(
        "skew_hot_cell_unsalted",
        lambda: distance_join(hot_probe, hot_build, 0.01, "hid", "bid").count(),
        rows_in=hot_n,
    )
    run(
        "skew_hot_cell_salted",
        # census-driven auto-salt: only the hot cell splits, by its own
        # ⌈count/cap⌉ factor (deterministic given the data, so the N and
        # 4N scaling runs execute the identical dataflow)
        lambda: distance_join(
            hot_probe, hot_build, 0.01, "hid", "bid", salt="auto", salt_cap=2500
        ).count(),
        rows_in=hot_n,
    )
    run(
        "knn_images",
        lambda: knn_join(
            pts,
            right.withColumnRenamed("rid", "cid"),
            k=5,
            max_distance=3.0 * RADIUS,
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
    # level 11 → 4096×2048 grid: the r3 block-local smear made level 10
    # finish in ~4 s at local[8] (floor-bound — no parallelism left to
    # measure), so the scaling workload steps one pyramid level deeper;
    # still routes the percentile through the bucketed two-pass rank
    run("kde_images", lambda: kde(pts, 11).count(), rows_in=IMAGES_N)

    # one scan split per fixture file (~4.7 MB + 1 MB open cost < 8 MB,
    # two files don't fit) ⇒ exactly FIXTURE_PARTS even tasks at every
    # parallelism level — the decode kernel is python-bound, so split
    # evenness IS the scaling result; 32m budgets would pack ~5 files per
    # split and leave cores idle at local[32]
    # the 8m split budget is tile_assignment-specific — save the session's
    # configured value (get_spark sets 32m) and restore THAT, not Spark's
    # built-in 128m default, so the sf_* queries below scan at the same
    # split size every engine session uses
    saved_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    tile_imgs = spark.read.parquet(tile_path)
    n_tiles = run(
        "tile_assignment",
        lambda: tile_images(tile_imgs, tile_size=16).count(),
        rows_in=TILE_IMAGES_N,
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", saved_mpb)
    extras["tile_tiles_per_sec"] = round(n_tiles / timings["tile_assignment"], 1)

    # image near-dup pairing at corpus scale (pHash signatures; decode is
    # benched by tile_assignment, so this isolates the pairing join).
    # groups of 4 share an xxhash64 base, each member flips a disjoint
    # bit pair → exactly 6 pairs/group at Hamming 4.  blocks_per_key=2 is
    # the multi-index banding mode (C(6,2) bands on 20-bit keys): at
    # n=500k it measured 3.6× faster than the plain d+1-chunk scheme
    # (5.1 s vs 18.1 s warm, identical 750k-pair output) because spurious
    # candidates scale as n²/2^(m·width).  n=2M so the workload is
    # compute-bound at every scaling level (500k was floor-bound: 7.1 s
    # at local[2] → 4.9 s at local[8]; 2M measured 97/29/12 s at 2/8/32
    # cores = 0.84 and 0.59 pair efficiencies)
    from geowave_spark.operators.imagedup import hamming_pairs

    PHASH_N = int(os.environ.get("SPARK_GRAFT_BENCH_PHASH", "2000000"))
    sigs = (
        spark.range(0, PHASH_N, 1, PARTS)
        .selectExpr(
            "id as _id",
            "xxhash64(cast(floor(id/4) as long)) ^ "
            "shiftleft(3L, cast((id % 4) * 2 as int)) as _sig",
        )
        .cache()
    )
    sigs.count()
    run(
        "phash_neardup",
        lambda: hamming_pairs(sigs, 4, blocks_per_key=2).count(),
        rows_in=PHASH_N,
    )
    sigs.unpersist()

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
