"""Spatial joins as cell-key hash joins.

From-scratch Spark-first re-expression of GeoWave's TieredSpatialJoin
(analytics/spark/.../spatial/TieredSpatialJoin.java:76-551) and
SpatialJoinRunner (SpatialJoinRunner.java:90-107).  The reference cogroups
per tier with a nested-loop predicate inside each cell; here each join
picks the cheapest Spark plan that preserves those row-set semantics:

- **point × point distance** (:func:`distance_join`): single-tier grid
  sized driver-side from the radius (the reference's NN partitioner rule,
  AbstractPartitioner.java:230-267) → flat mapInPandas cell explode of the
  buffered build side → shuffled **hash** equi-join on the cell id →
  whole-stage-codegen distance post-filter.  No dedupe stage: a pair can
  meet in at most one cell (build rows hold one tier/disjoint cells, probe
  points truncate to one cell), so the reference's reduceByKey dedupe
  (TieredSpatialJoin.java:349) has nothing to remove.
- **point × polygon** (PIP / within-distance): the polygon side is small
  relative to a planetary point table, so it broadcasts as a
  :class:`~geowave_spark.geom.LocalPolygonGrid` cell-key hash index and
  the probe side streams through ONE map stage (candidate hash lookup +
  exact numpy predicate per Arrow batch) — zero shuffle.

Scale notes: the distance join's only shuffle is the hash join itself;
hot cells (Zipfian data) can additionally be salted (build rows replicate
``salt`` ways, probe rows pick one salt deterministically) on top of AQE's
skew splitting.  The polygon joins shuffle nothing and scale linearly in
the point count; their polygon side is bounded by driver memory
(~10^6 polygons), which matches the reference's broadcast of the indexing
strategy + its per-executor geometry caches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..encode import (
    DEFAULT_STRATEGY,
    explode_envelope_cells,
    point_cell_at_tier_udf,
)
from ..geom import (
    parse_wkt,
    points_in_polygons_batch,
    points_polygons_dist2_batch,
)
from ..sfc import DEFAULT_MAX_DUPLICATES, JOIN_MAX_DUPLICATES, TieredStrategy


def _apply_salt(build: DataFrame, probe: DataFrame, salt: int) -> tuple[DataFrame, DataFrame]:
    """Replicate build rows across `salt` buckets; probe rows hash into one.

    Explicit skew handling (north rule): hot cell keys are spread over
    `salt` reducers.  Deterministic: probe salt = pmod(xxhash64(probe
    row), salt).
    """
    spark = build.sparkSession
    salts = spark.createDataFrame([(i,) for i in range(salt)], "_salt int")
    build_s = build.crossJoin(F.broadcast(salts))
    probe_s = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt)).cast("int")
    )
    return build_s, probe_s


def distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_id: str,
    right_id: str,
    left_lon: str = "lon",
    left_lat: str = "lat",
    right_lon: str = "lon",
    right_lat: str = "lat",
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    max_duplicates: int = DEFAULT_MAX_DUPLICATES,
    negative: bool = False,
    salt: int | None = None,
    broadcast_build: bool = False,
) -> DataFrame:
    """Point×point within-distance join → distinct (left_id, right_id) pairs.

    ``max_duplicates`` defaults to the reference's ingest-path 4 (2/dim,
    TieredSFCIndexStrategy.java:58) rather than its join-path 80
    (GeoWaveIndexedRDD.java:193): fewer duplicates pick a coarser tier, so
    the exploded build side is ~4 rows/point instead of ~40 — an order of
    magnitude less shuffle — while the extra candidate pairs are absorbed
    by the whole-stage-codegen distance predicate.  Row-set output is
    identical either way (the exact post-filter guarantees it).

    ``negative=True`` returns left rows with **no** right point within the
    radius (the reference's negative-predicate subtractByKey,
    TieredSpatialJoin.java:360-378).

    Distance is planar Euclidean on (lon, lat) — identical to the
    reference's GeomWithinDistance degree-radius semantics
    (analytics/spark/.../sparksql/udf/GeomWithinDistance.java:42-46).
    """
    # All buffered point envelopes share the same size (2r × 2r), so the
    # selected tier is known driver-side with NO data scan: the finest tier
    # whose cell covers the envelope (≤2 cells/dim ⇒ ≤4 duplicates) — the
    # reference's NN grid rule (AbstractPartitioner.java:230-267), which its
    # tiered join would converge to anyway for constant-size envelopes.
    # This removes the tier-collect job and the probe-side tier explosion;
    # the join key collapses to the single-tier cell id.
    t_star = strategy.tier_for_width(2.0 * radius, 2.0 * radius)
    # build side = right, buffered by the radius (TieredSpatialJoin.java:146-166:
    # only the buffered side expands its envelope); flat mapInPandas explode
    # keeps the Arrow exchange object-free at millions-of-cells scale
    build = explode_envelope_cells(
        right.select(
            F.col(right_id).alias("_rid"),
            F.col(right_lon).alias("_rlon"),
            F.col(right_lat).alias("_rlat"),
        ),
        F.col("_rlon") - radius,
        F.col("_rlat") - radius,
        F.col("_rlon") + radius,
        F.col("_rlat") + radius,
        keep=["_rid", "_rlon", "_rlat"],
        strategy=strategy,
        max_duplicates=max_duplicates,
        tier=t_star,
    ).drop("tier")

    probe = left.select(
        F.col(left_id).alias("_lid"),
        F.col(left_lon).alias("_llon"),
        F.col(left_lat).alias("_llat"),
    ).withColumn(
        "cell", point_cell_at_tier_udf(strategy, t_star)(F.col("_llon"), F.col("_llat"))
    )

    keys = ["cell"]
    if salt:
        build, probe = _apply_salt(build, probe, salt)
        keys = keys + ["_salt"]
    b = F.broadcast(build) if broadcast_build else build

    r2 = radius * radius
    dx = F.col("_llon") - F.col("_rlon")
    dy = F.col("_llat") - F.col("_rlat")
    # No dedupe stage needed: each build row lands at exactly ONE tier with a
    # disjoint cell set, and a probe point truncates to exactly one cell per
    # tier — so a (left, right) pair can meet in at most one (tier, cell).
    # (Buffered point envelopes clamp at ±180 rather than wrap, so the
    # dateline split can't produce a second tier for the same row.)  This
    # removes the reference's reduceByKey dedupe (TieredSpatialJoin.java:349)
    # and its full extra shuffle — the hottest stage at high parallelism.
    # shuffle_hash: both sides are already exploded/pre-projected, and a hash
    # join avoids sort-merge's two full sorts of the candidate sets.
    pairs = (
        probe.join(b.hint("shuffle_hash"), keys)
        .where(dx * dx + dy * dy <= F.lit(r2))
        .select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id))
    )
    if negative:
        return (
            left.select(F.col(left_id))
            .distinct()
            .join(pairs.select(left_id).distinct(), left_id, "left_anti")
        )
    return pairs


def _local_grid_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str,
    polygon_id: str,
    lon: str,
    lat: str,
    wkt: str,
    radius: float | None,
) -> DataFrame:
    """Shared core of the point⋈polygon joins: one map-side pass.

    The polygon side of a planetary point⋈region join is small relative to
    the point side (10^3–10^6 regions vs 10^12 points), so it is collected
    once, indexed into a :class:`LocalPolygonGrid` (cell-key hash index)
    and broadcast.  The probe side then runs a single ``mapInPandas`` —
    candidate lookup (numpy hash probe on packed cell keys) + exact
    predicate per Arrow batch — with NO shuffle, NO tier explosion and no
    pair materialization beyond true matches.  This is the broadcast-side
    specialization of the reference's TieredSpatialJoin; its cogrouped
    shuffle plan only wins when *both* sides are too big to broadcast.

    ``radius=None`` ⇒ boundary-inclusive point-in-polygon; otherwise
    within-distance (GeomWithinDistance semantics, buffered grid).
    """
    from ..geom import LocalPolygonGrid

    spark = points.sparkSession
    rows = polygons.select(polygon_id, wkt).collect()
    ids = [r[0] for r in rows]
    polys = [parse_wkt(r[1])[1] for r in rows]
    grid_bc = spark.sparkContext.broadcast(
        LocalPolygonGrid(ids, polys, buffer=radius or 0.0)
    )
    r2 = None if radius is None else radius * radius

    src = points.select(
        F.col(point_id).alias("_pid"),
        F.col(lon).alias("_plon"),
        F.col(lat).alias("_plat"),
    )
    out_schema = StructType(
        [
            StructField(point_id, points.schema[point_id].dataType),
            StructField(polygon_id, polygons.schema[polygon_id].dataType),
        ]
    )

    def _gen(batches):
        g = grid_bc.value
        for pdf in batches:
            px = pdf["_plon"].to_numpy(np.float64)
            py = pdf["_plat"].to_numpy(np.float64)
            rowrep, codes = g.candidates(px, py)
            if len(rowrep):
                if r2 is None:
                    m = points_in_polygons_batch(px[rowrep], py[rowrep], codes, g.padded)
                else:
                    d2 = points_polygons_dist2_batch(px[rowrep], py[rowrep], codes, g.padded)
                    m = d2 <= r2
            else:
                m = np.zeros(0, dtype=bool)
            yield pd.DataFrame(
                {
                    point_id: pdf["_pid"].to_numpy()[rowrep[m]],
                    polygon_id: g.ids[codes[m]],
                }
            )

    return src.mapInPandas(_gen, out_schema)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str,
    polygon_id: str,
    lon: str = "lon",
    lat: str = "lat",
    wkt: str = "wkt",
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    max_duplicates: int = JOIN_MAX_DUPLICATES,
    negative: bool = False,
    salt: int | None = None,
) -> DataFrame:
    """Point-in-polygon join → distinct (point_id, polygon_id) pairs.

    Executes as a broadcast cell-grid join (see
    :func:`_local_grid_polygon_join`): the collected polygon set is indexed
    and broadcast, the probe side streams through one Arrow map stage.
    ``salt`` is accepted for API parity but unused — there is no shuffle to
    salt in this plan (hot cells cost candidate lookups, which the
    adaptive grid size bounds).
    """
    pairs = _local_grid_polygon_join(
        points, polygons, point_id, polygon_id, lon, lat, wkt, radius=None
    )
    if negative:
        return (
            points.select(F.col(point_id))
            .distinct()
            .join(pairs.select(point_id).distinct(), point_id, "left_anti")
        )
    return pairs


def polygon_distance_join(
    points: DataFrame,
    polygons: DataFrame,
    radius: float,
    point_id: str,
    polygon_id: str,
    lon: str = "lon",
    lat: str = "lat",
    wkt: str = "wkt",
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    max_duplicates: int = JOIN_MAX_DUPLICATES,
) -> DataFrame:
    """Point within `radius` of polygon → distinct pairs (GeomWithinDistance
    against extended geometries, the hail×tornado_tracks fixture shape).
    Broadcast cell-grid plan — see :func:`_local_grid_polygon_join`."""
    return _local_grid_polygon_join(
        points, polygons, point_id, polygon_id, lon, lat, wkt, radius=radius
    )
