"""spark-submit entry point: the full image pipeline, resumable.

The north-star dataflow end-to-end on an (image_id, bytes, w, h, fmt,
caption, phash, lon, lat) table:

1. cell-encode every image's location into the tiered SFC index;
2. checkpointed, partition-skipping write of the indexed table with
   per-partition lineage fingerprints + metrics + incremental statistics
   (killing the job mid-write and re-submitting recomputes nothing that
   finished — demonstrated below by calling the writer twice);
3. decode + tile the images into index-cell-aligned raster tiles and
   merge overlaps;
4. read a mosaic window back out in a different CRS (nearest-neighbor
   warp), proving the raster→vector→raster loop closes.

Deployment shape (the north rule's spark-submit --py-files contract):

    python /root/repo/examples/make_zip.py   # /tmp/geowave_spark_pyfiles.zip
    spark-submit --master <cluster> \
        --py-files /tmp/geowave_spark_pyfiles.zip \
        examples/submit_image_pipeline.py <n_images> <out_dir>

Only `geowave_spark` importability is assumed; session config is left to
cluster defaults.
"""

import shutil
import os
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# under spark-submit --py-files the package is on the driver path already;
# under a bare `python examples/...` run, sys.path[0] is examples/ — add
# the repo root so both launch modes work
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="gw_img_")

    spark = SparkSession.builder.appName("geowave-spark-image-pipeline").getOrCreate()

    from geowave_spark.encode import with_point_cells
    from geowave_spark.sources.catalog import checkpointed_write, read_lineage
    from geowave_spark.sources.images import images_table, with_geometry
    from geowave_spark.raster.tiling import merge_tiles, tile_images

    imgs = with_geometry(images_table(spark, n)).cache()

    # 1-2) index + resumable sink (points all land on the finest tier, so
    # partition the sink by format — several partitions makes the
    # skip-finished-partitions behavior visible; stats on write)
    indexed = with_point_cells(imgs)
    r1 = checkpointed_write(
        indexed, f"{out}/indexed", "fmt", stats_fields=["phash"],
    )
    # a re-submit after success (or a crash) skips every finished partition
    r2 = checkpointed_write(indexed, f"{out}/indexed", "fmt")
    print(f"RESUME first={sorted(r1['written'])} second_skipped={sorted(r2['skipped'])}")
    assert not r2["written"], "resume must recompute nothing"
    lineage = read_lineage(spark, f"{out}/indexed")
    print(f"LINEAGE partitions={lineage.count()}")

    # 3) decode → tile → merge (the raster side of the same index)
    tiles = merge_tiles(tile_images(imgs, tile_size=16), tile_size=16).cache()
    n_tiles = tiles.count()
    tier = tiles.groupBy("tier").count().orderBy(F.desc("count")).first()["tier"]
    print(f"TILES merged={n_tiles} modal_tier={tier}")

    # 4) mosaic a window back out in web mercator (warp on read)
    from geowave_spark.crs import transform_np
    from geowave_spark.raster.grid import RasterSpec
    from geowave_spark.raster.warp import warp_mosaic_array
    import numpy as np

    xs, ys = transform_np(
        np.array([-20.0, 20.0]), np.array([-20.0, 20.0]), "EPSG:4326", "EPSG:3857"
    )
    px = warp_mosaic_array(
        tiles.where(F.col("tier") == tier),
        int(tier),
        (float(xs[0]), float(ys[0]), float(xs[1]), float(ys[1])),
        (256, 256),
        "EPSG:3857",
        RasterSpec(bands=3, dtype="uint8", nodata=0.0),
        method="nearest",
    )
    covered = float((px != 0).mean())
    print(f"RESULT tiles={n_tiles} mosaic_px={px.shape} covered={covered:.3f}")
    spark.stop()
    if len(sys.argv) <= 2:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
