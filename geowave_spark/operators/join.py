"""Tiered spatial joins as cell-key hash equi-joins.

From-scratch Spark-first re-expression of GeoWave's TieredSpatialJoin
(analytics/spark/.../spatial/TieredSpatialJoin.java:76-551) and
SpatialJoinRunner (SpatialJoinRunner.java:90-107).  The reference cogroups
per tier with a nested-loop predicate inside each cell; here the same
semantics become:

  1. index the *build* side (polygons / buffered points) into exploded
     (tier, cell) rows — pandas-UDF numpy encode, ≤80 duplicates
     (GeoWaveIndexedRDD.java:193), trim rule (RDDUtils.java:158-184);
  2. collect the build side's distinct tiers (≤32 ints — the analog of the
     reference's tier-byte collectAsync at TieredSpatialJoin.java:174-191);
  3. explode the *probe* side (points) across those tiers with a broadcast
     tier list; derive each probe row's cell at that tier by **bit shift**
     (Hilbert hierarchy ⇒ reprojectToTier is prefix truncation — no
     re-encode, cf. TieredSpatialJoin.java:471-511);
  4. hash equi-join on (tier, cell) — Catalyst/Tungsten, AQE skew-aware,
     optionally salted for hot cells;
  5. exact predicate post-filter — pure Catalyst arithmetic for
     distance/point-in-rect, numpy pandas UDF for general polygons
     (SpatialQueryFilter fine filtering);
  6. dropDuplicates on the identity pair (DedupeFilter semantics,
     core/store/.../query/filter/DedupeFilter.java:23-66).

Scale notes: the only shuffles are the hash join and the final distinct;
the tier list and salt table are broadcast; probe-side explosion is at most
|tiers present| (≤ a handful in practice) and the join key (tier, cell) is
pruned by AQE.  Hot cells (Zipfian data) are handled by an explicit salt
column: build rows replicate salt_factor ways, probe rows pick one salt
deterministically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..encode import (
    DEFAULT_STRATEGY,
    cell_at_tier,
    envelope_cells_udf,
    polygon_cells_udf,
    with_point_cells,
)
from ..geom import (
    pad_rings,
    parse_wkt,
    points_in_polygons_batch,
    points_polygons_dist2_batch,
)
from ..sfc import JOIN_MAX_DUPLICATES, TieredStrategy

# per-executor WKT parse cache (polygon sets are small vs candidate rows)
_RING_CACHE: dict[str, "object"] = {}


def _rings_for(wkts) -> list:
    out = []
    for w in wkts:
        r = _RING_CACHE.get(w)
        if r is None:
            r = parse_wkt(w)[1]
            if len(_RING_CACHE) < 500_000:
                _RING_CACHE[w] = r
        out.append(r)
    return out


def _batch_codes(w: pd.Series):
    """factorize WKTs in a batch → (codes, padded rings) using the cache."""
    codes, uniques = pd.factorize(w, sort=False)
    padded = pad_rings(_rings_for(list(uniques)))
    return codes, padded


def _broadcast_rings(polygons: DataFrame, polygon_id: str, wkt: str):
    """Broadcast {polygon_id: ring ndarray} to executors (the fine filter
    never ships WKT strings through joins/Arrow)."""
    rows = polygons.select(polygon_id, wkt).collect()
    rings = {r[0]: parse_wkt(r[1])[1] for r in rows}
    return polygons.sparkSession.sparkContext.broadcast(rings)


def _codes_from_ids(gid: pd.Series, rings: dict):
    """factorize polygon ids in a batch → (codes, padded rings)."""
    codes, uniques = pd.factorize(gid, sort=False)
    padded = pad_rings([rings[u] for u in uniques])
    return codes, padded


def _index_points(
    df: DataFrame, lon: str, lat: str, strategy: TieredStrategy
) -> DataFrame:
    return with_point_cells(df, lon, lat, strategy, cell_col="_topcell").drop("tier")


def _probe_across_tiers(
    probe_idx: DataFrame, tiers: list[int], strategy: TieredStrategy
) -> DataFrame:
    """Explode probe rows to one row per build-side tier, deriving the cell
    at that tier by prefix truncation (pure Catalyst)."""
    spark = probe_idx.sparkSession
    tiers_df = spark.createDataFrame([(int(t),) for t in sorted(tiers)], "tier int")
    return (
        probe_idx.crossJoin(F.broadcast(tiers_df))
        .withColumn("cell", cell_at_tier("_topcell", "tier", strategy.max_bits))
        .drop("_topcell")
    )


def _apply_salt(build: DataFrame, probe: DataFrame, salt: int) -> tuple[DataFrame, DataFrame]:
    """Replicate build rows across `salt` buckets; probe rows hash into one.

    Explicit skew handling (north rule): hot (tier, cell) keys are spread
    over `salt` reducers.  Deterministic: probe salt = pmod(xxhash64(id-ish
    row), salt) — we use the probe's cell+monotonic hash of all join keys.
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
    max_duplicates: int = JOIN_MAX_DUPLICATES,
    negative: bool = False,
    salt: int | None = None,
    broadcast_build: bool = False,
) -> DataFrame:
    """Point×point within-distance join → distinct (left_id, right_id) pairs.

    ``negative=True`` returns left rows with **no** right point within the
    radius (the reference's negative-predicate subtractByKey,
    TieredSpatialJoin.java:360-378).

    Distance is planar Euclidean on (lon, lat) — identical to the
    reference's GeomWithinDistance degree-radius semantics
    (analytics/spark/.../sparksql/udf/GeomWithinDistance.java:42-46).
    """
    # build side = right, buffered by the radius (TieredSpatialJoin.java:146-166:
    # only the buffered side expands its envelope)
    ins = envelope_cells_udf(strategy, max_duplicates)(
        F.col(right_lon) - radius,
        F.col(right_lat) - radius,
        F.col(right_lon) + radius,
        F.col(right_lat) + radius,
    )
    build = (
        right.select(
            F.col(right_id).alias("_rid"),
            F.col(right_lon).alias("_rlon"),
            F.col(right_lat).alias("_rlat"),
            F.explode(ins).alias("_ins"),
        )
        .select("_rid", "_rlon", "_rlat", F.col("_ins.tier").alias("tier"), F.col("_ins.cell").alias("cell"))
    )
    # persist: the tier-collect job and the join both consume the build
    # side (the reference persists the same way, TieredSpatialJoin.java:510)
    build = build.persist()
    tiers = [r["tier"] for r in build.select("tier").distinct().collect()]

    probe = _index_points(
        left.select(
            F.col(left_id).alias("_lid"),
            F.col(left_lon).alias("_llon"),
            F.col(left_lat).alias("_llat"),
        ),
        "_llon",
        "_llat",
        strategy,
    )
    probe = _probe_across_tiers(probe, tiers, strategy)

    keys = ["tier", "cell"]
    if salt:
        build, probe = _apply_salt(build, probe, salt)
        keys = keys + ["_salt"]
    b = F.broadcast(build) if broadcast_build else build

    r2 = radius * radius
    dx = F.col("_llon") - F.col("_rlon")
    dy = F.col("_llat") - F.col("_rlat")
    pairs = (
        probe.join(b, keys)
        .where(dx * dx + dy * dy <= F.lit(r2))
        .select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id))
        .dropDuplicates([left_id, right_id])
    )
    if negative:
        return (
            left.select(F.col(left_id))
            .distinct()
            .join(pairs.select(left_id).distinct(), left_id, "left_anti")
        )
    return pairs


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

    Coarse stage identical to :func:`distance_join`; the fine stage is the
    numpy ray-casting predicate in an Arrow pandas UDF (the engine's
    SpatialQueryFilter / GeomIntersects analog for point⋈polygon).  The
    polygon rings ship to executors once as a broadcast dict keyed by id,
    so the join and the Arrow exchange never carry WKT strings.
    """
    ring_bc = _broadcast_rings(polygons, polygon_id, wkt)
    ins = polygon_cells_udf(strategy, max_duplicates)(F.col(wkt))
    build = polygons.select(
        F.col(polygon_id).alias("_gid"),
        F.explode(ins).alias("_ins"),
    ).select("_gid", F.col("_ins.tier").alias("tier"), F.col("_ins.cell").alias("cell"))
    # persist: the tier-collect job and the join both consume the build
    # side (the reference persists the same way, TieredSpatialJoin.java:510)
    build = build.persist()
    tiers = [r["tier"] for r in build.select("tier").distinct().collect()]

    probe = _index_points(
        points.select(
            F.col(point_id).alias("_pid"),
            F.col(lon).alias("_plon"),
            F.col(lat).alias("_plat"),
        ),
        "_plon",
        "_plat",
        strategy,
    )
    probe = _probe_across_tiers(probe, tiers, strategy)

    keys = ["tier", "cell"]
    if salt:
        build, probe = _apply_salt(build, probe, salt)
        keys = keys + ["_salt"]

    @F.pandas_udf(BooleanType())
    def _pip(px: pd.Series, py: pd.Series, gid: pd.Series) -> pd.Series:
        if not len(px):
            return pd.Series(np.zeros(0, dtype=bool))
        codes, padded = _codes_from_ids(gid, ring_bc.value)
        out = points_in_polygons_batch(
            px.to_numpy(np.float64), py.to_numpy(np.float64), codes, padded
        )
        return pd.Series(out)

    pairs = (
        probe.join(build, keys)
        .where(_pip(F.col("_plon"), F.col("_plat"), F.col("_gid")))
        .select(F.col("_pid").alias(point_id), F.col("_gid").alias(polygon_id))
        .dropDuplicates([point_id, polygon_id])
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
    against extended geometries, the hail×tornado_tracks fixture shape)."""
    ring_bc = _broadcast_rings(polygons, polygon_id, wkt)
    ins = polygon_cells_udf(strategy, max_duplicates, buffer=radius)(F.col(wkt))
    build = polygons.select(
        F.col(polygon_id).alias("_gid"),
        F.explode(ins).alias("_ins"),
    ).select("_gid", F.col("_ins.tier").alias("tier"), F.col("_ins.cell").alias("cell"))
    # persist: the tier-collect job and the join both consume the build
    # side (the reference persists the same way, TieredSpatialJoin.java:510)
    build = build.persist()
    tiers = [r["tier"] for r in build.select("tier").distinct().collect()]

    probe = _index_points(
        points.select(
            F.col(point_id).alias("_pid"), F.col(lon).alias("_plon"), F.col(lat).alias("_plat")
        ),
        "_plon",
        "_plat",
        strategy,
    )
    probe = _probe_across_tiers(probe, tiers, strategy)

    r2 = radius * radius

    @F.pandas_udf(BooleanType())
    def _within(px: pd.Series, py: pd.Series, gid: pd.Series) -> pd.Series:
        if not len(px):
            return pd.Series(np.zeros(0, dtype=bool))
        codes, padded = _codes_from_ids(gid, ring_bc.value)
        d2 = points_polygons_dist2_batch(
            px.to_numpy(np.float64), py.to_numpy(np.float64), codes, padded
        )
        return pd.Series(d2 <= r2)

    return (
        probe.join(build, ["tier", "cell"])
        .where(_within(F.col("_plon"), F.col("_plat"), F.col("_gid")))
        .select(F.col("_pid").alias(point_id), F.col("_gid").alias(polygon_id))
        .dropDuplicates([point_id, polygon_id])
    )
