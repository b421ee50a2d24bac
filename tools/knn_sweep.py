"""Sweep the kNN chunk-limit divisor at a given core count.

Usage: python tools/knn_sweep.py <cpus> <div1,div2,...>
Prints min-of-3 warm seconds per divisor (noise on this box is ~25%).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
DIVS = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "24,48").split(",")]


def main():
    import bench
    from geowave_spark.deploy import ensure_py_files
    from geowave_spark.operators.knn import knn_join
    from geowave_spark.session import get_spark

    spark = get_spark("knnsweep", master=f"local[{CPUS}]", shuffle_partitions=128)
    ensure_py_files(spark)
    pts = spark.read.parquet(bench.materialize_points(spark, 500000)).repartition(128).cache()
    n = pts.count()
    right = pts.select(F.col("image_id").alias("cid"), "lon", "lat")

    out = {}
    for div in DIVS:
        limit = max(4000, -(-n // div))
        def run():
            return knn_join(
                pts, right, k=5, max_distance=0.03, query_id="image_id",
                candidate_id="cid", exclude_self=True,
                dense_cell_threshold=limit,
            ).count()
        run()  # cold
        times = []
        for _ in range(3):
            t0 = time.time()
            run()
            times.append(round(time.time() - t0, 3))
        out[div] = {"limit": limit, "times": times, "min": min(times)}
        print(json.dumps({"cpus": CPUS, "div": div, **out[div]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
