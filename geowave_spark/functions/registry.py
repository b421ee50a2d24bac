"""Spatial SQL function registry.

From-scratch analog of GeoWave's Spark SQL UDF registry
(analytics/spark/.../sparksql/udf/UDFRegistrySPI.java:16-27 +
GeomFunctionRegistry.java:41-60: GeomDistance, GeomFromWKT,
GeomContains/Intersects/Within/WithinDistance …) and the GWQL predicate
surface (core/geotime/.../gwql/SpatialPredicates.java): after
``register_all(spark)`` users can write plain ``spark.sql`` —

    SELECT * FROM a JOIN b
    ON st_within_distance(st_point(a.lon, a.lat), b.wkt, 0.5)

Geometry travels as WKT strings (this environment has no shapely/UDT);
every predicate is an Arrow pandas UDF over the vectorized numpy kernels in
``geowave_spark.geom``, with a per-executor parse cache.  GWQL's grammar is
a strict subset of Spark SQL once these are registered (SURVEY.md §3.2), so
there is no separate parser: Spark SQL *is* the SQL surface.

Scale note: predicates used in a join's ON clause force a cross-product
plan — for large joins use the indexed operators (operators/join.py); these
functions are the parity surface for filters and small joins, exactly like
the reference (SqlQueryRunner swaps in TieredSpatialJoin for the big case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, StringType

from ..geom import (
    pad_rings,
    parse_wkt,
    points_in_polygons_batch,
    points_polygons_dist2_batch,
    polygon_envelope,
    rings_edges_intersect,
)

_PARSE_CACHE: dict[str, tuple[str, np.ndarray]] = {}


def _parse(w: str) -> tuple[str, np.ndarray]:
    g = _PARSE_CACHE.get(w)
    if g is None:
        g = parse_wkt(w)
        if len(_PARSE_CACHE) < 500_000:
            _PARSE_CACHE[w] = g
    return g


def _pairwise_dist2(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Squared distance between geometry pairs (point↔point, point↔polygon)."""
    n = len(a)
    out = np.empty(n, dtype=np.float64)
    ga = [_parse(w) for w in a]
    gb = [_parse(w) for w in b]
    # vectorize the common point↔point case
    pp = np.array([x[0] == "POINT" and y[0] == "POINT" for x, y in zip(ga, gb)])
    if pp.any():
        ii = np.nonzero(pp)[0]
        ax = np.array([ga[i][1][0][0] for i in ii])
        ay = np.array([ga[i][1][0][1] for i in ii])
        bx = np.array([gb[i][1][0][0] for i in ii])
        by = np.array([gb[i][1][0][1] for i in ii])
        out[ii] = (ax - bx) ** 2 + (ay - by) ** 2
    mixed = np.nonzero(~pp)[0]
    if len(mixed):
        # point↔polygon (either order); polygon↔polygon falls back to 0 if
        # they intersect else min vertex-to-edge distance
        pts_x, pts_y, codes, rings = [], [], [], []
        for k, i in enumerate(mixed):
            (ka, ca), (kb, cb) = ga[i], gb[i]
            if ka == "POINT" and kb != "POINT":
                pts_x.append(ca[0][0]); pts_y.append(ca[0][1]); rings.append(cb)
            elif kb == "POINT":
                pts_x.append(cb[0][0]); pts_y.append(cb[0][1]); rings.append(ca)
            else:
                # polygon↔polygon: 0 if boundaries cross, else min distance
                # is attained vertex-of-one → edge-of-other (piecewise linear)
                if rings_edges_intersect(ca, cb):
                    out[i] = 0.0
                    continue
                d1 = points_polygons_dist2_batch(
                    ca[:, 0], ca[:, 1], np.zeros(len(ca), dtype=int), pad_rings([cb])
                ).min()
                d2 = points_polygons_dist2_batch(
                    cb[:, 0], cb[:, 1], np.zeros(len(cb), dtype=int), pad_rings([ca])
                ).min()
                out[i] = min(d1, d2)
                continue
            codes.append(len(rings) - 1)
        if pts_x:
            padded = pad_rings(rings)
            d = points_polygons_dist2_batch(
                np.array(pts_x), np.array(pts_y), np.array(codes), padded
            )
            j = 0
            for i in mixed:
                (ka, _), (kb, _) = ga[i], gb[i]
                if ka == "POINT" or kb == "POINT":
                    if not (ka == "POINT" and kb == "POINT"):
                        out[i] = d[j]
                        j += 1
    return out


def _intersects_pair(a, b) -> bool:
    (ka, ca), (kb, cb) = a, b
    if ka == "POINT" and kb == "POINT":
        return bool(np.all(ca[0] == cb[0]))
    if ka == "POINT":
        return bool(points_in_polygons_batch(ca[:1, 0], ca[:1, 1], np.zeros(1, int), pad_rings([cb]))[0])
    if kb == "POINT":
        return bool(points_in_polygons_batch(cb[:1, 0], cb[:1, 1], np.zeros(1, int), pad_rings([ca]))[0])
    # polygon/polygon: vertex containment either way, else edge crossing
    if points_in_polygons_batch(ca[:, 0], ca[:, 1], np.zeros(len(ca), int), pad_rings([cb])).any():
        return True
    if points_in_polygons_batch(cb[:, 0], cb[:, 1], np.zeros(len(cb), int), pad_rings([ca])).any():
        return True
    return rings_edges_intersect(ca, cb)


def _wkt_of(g) -> str:
    kind, coords = g
    if kind == "POINT":
        return f"POINT ({coords[0][0]:.17g} {coords[0][1]:.17g})"
    from ..geom import polygon_wkt

    return polygon_wkt(coords)


def register_all(spark: SparkSession) -> None:
    """Register every ST function with the session (idempotent)."""

    @F.pandas_udf(DoubleType())
    def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(np.sqrt(_pairwise_dist2(a, b)))

    @F.pandas_udf(BooleanType())
    def st_within_distance(a: pd.Series, b: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(_pairwise_dist2(a, b) <= r.to_numpy(np.float64) ** 2)

    @F.pandas_udf(BooleanType())
    def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_intersects_pair(_parse(x), _parse(y)) for x, y in zip(a, b)])

    @F.pandas_udf(BooleanType())
    def st_disjoint(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([not _intersects_pair(_parse(x), _parse(y)) for x, y in zip(a, b)])

    @F.pandas_udf(BooleanType())
    def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
        """a CONTAINS b — polygon a, point b (the join-relevant case)."""
        out = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            ga, gb = _parse(x), _parse(y)
            if ga[0] != "POINT" and gb[0] == "POINT":
                out[i] = bool(
                    points_in_polygons_batch(
                        gb[1][:1, 0], gb[1][:1, 1], np.zeros(1, int), pad_rings([ga[1]])
                    )[0]
                )
        return pd.Series(out)

    @F.pandas_udf(BooleanType())
    def st_within(a: pd.Series, b: pd.Series) -> pd.Series:
        """a WITHIN b — point a, polygon b."""
        out = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            ga, gb = _parse(x), _parse(y)
            if ga[0] == "POINT" and gb[0] != "POINT":
                out[i] = bool(
                    points_in_polygons_batch(
                        ga[1][:1, 0], ga[1][:1, 1], np.zeros(1, int), pad_rings([gb[1]])
                    )[0]
                )
        return pd.Series(out)

    @F.pandas_udf(StringType())
    def st_envelope(a: pd.Series) -> pd.Series:
        out = []
        for w in a:
            _, c = _parse(w)
            x0, y0, x1, y1 = polygon_envelope(c) if len(c) > 1 else (c[0][0], c[0][1], c[0][0], c[0][1])
            out.append(
                f"POLYGON (({x0:.17g} {y0:.17g}, {x1:.17g} {y0:.17g}, "
                f"{x1:.17g} {y1:.17g}, {x0:.17g} {y1:.17g}, {x0:.17g} {y0:.17g}))"
            )
        return pd.Series(out)

    for name, fn in [
        ("st_distance", st_distance),
        ("st_within_distance", st_within_distance),
        ("st_intersects", st_intersects),
        ("st_disjoint", st_disjoint),
        ("st_contains", st_contains),
        ("st_within", st_within),
        ("st_envelope", st_envelope),
    ]:
        spark.udf.register(name, fn)
    @F.pandas_udf(StringType())
    def st_point(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            [f"POINT ({x:.17g} {y:.17g})" for x, y in zip(lon, lat)]
        )

    spark.udf.register("st_point", st_point)

    # ---- GWQL predicate surface (SpatialPredicates.java, reg
    # GWQLSpatialTemporalExtensions.java:36-47): BBOX(+LOOSE), the LOOSE
    # intersects, envelope accessors (BBOX aggregate support), and the
    # remaining topological predicates.  LOOSE = envelope-only test (the
    # reference's index-constraint-only variants return a superset, which
    # is exactly the envelope semantics here).

    def _env_of(w: str):
        kind, c = _parse(w)
        if kind == "POINT":
            return c[0][0], c[0][1], c[0][0], c[0][1]
        return polygon_envelope(c)

    @F.pandas_udf(BooleanType())
    def st_bbox(g: pd.Series, minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        from ..geom import cell_rect_intersects_polygon

        out = np.zeros(len(g), dtype=bool)
        for i, w in enumerate(g):
            kind, c = _parse(w)
            x0, y0, x1, y1 = float(minx[i]), float(miny[i]), float(maxx[i]), float(maxy[i])
            if kind == "POINT":
                out[i] = x0 <= c[0][0] <= x1 and y0 <= c[0][1] <= y1
            else:
                out[i] = cell_rect_intersects_polygon(
                    np.array([x0]), np.array([y0]), np.array([x1]), np.array([y1]), c
                )[0]
        return pd.Series(out)

    @F.pandas_udf(BooleanType())
    def st_bbox_loose(g: pd.Series, minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        out = np.zeros(len(g), dtype=bool)
        for i, w in enumerate(g):
            ex0, ey0, ex1, ey1 = _env_of(w)
            out[i] = not (
                ex1 < float(minx[i]) or ex0 > float(maxx[i]) or ey1 < float(miny[i]) or ey0 > float(maxy[i])
            )
        return pd.Series(out)

    @F.pandas_udf(BooleanType())
    def st_intersects_loose(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            ax0, ay0, ax1, ay1 = _env_of(x)
            bx0, by0, bx1, by1 = _env_of(y)
            out[i] = not (ax1 < bx0 or ax0 > bx1 or ay1 < by0 or ay0 > by1)
        return pd.Series(out)

    def _env_acc(idx):
        @F.pandas_udf(DoubleType())
        def _acc(g: pd.Series) -> pd.Series:
            return pd.Series([float(_env_of(w)[idx]) for w in g])

        return _acc

    def _interiors_overlap(ga, gb) -> bool:
        """Some interior point of each lies inside the other (vertex-sample
        approximation; exact for the convex fixtures this engine tests)."""
        (ka, ca), (kb, cb) = ga, gb
        if ka == "POINT" or kb == "POINT":
            return False
        ina = points_in_polygons_batch(ca[:, 0], ca[:, 1], np.zeros(len(ca), int), pad_rings([cb]))
        inb = points_in_polygons_batch(cb[:, 0], cb[:, 1], np.zeros(len(cb), int), pad_rings([ca]))
        return bool(ina.any() or inb.any() or rings_edges_intersect(ca, cb))

    @F.pandas_udf(BooleanType())
    def st_overlaps(a: pd.Series, b: pd.Series) -> pd.Series:
        """Polygon/polygon OVERLAPS: interiors intersect, neither covers the
        other (GWQL OVERLAPS; JTS semantics approximated on vertices)."""
        out = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            ga, gb = _parse(x), _parse(y)
            if ga[0] == "POINT" or gb[0] == "POINT":
                continue
            ina = points_in_polygons_batch(
                ga[1][:, 0], ga[1][:, 1], np.zeros(len(ga[1]), int), pad_rings([gb[1]])
            )
            inb = points_in_polygons_batch(
                gb[1][:, 0], gb[1][:, 1], np.zeros(len(gb[1]), int), pad_rings([ga[1]])
            )
            inter = ina.any() or inb.any() or rings_edges_intersect(ga[1], gb[1])
            out[i] = bool(inter and not ina.all() and not inb.all())
        return pd.Series(out)

    @F.pandas_udf(BooleanType())
    def st_touches(a: pd.Series, b: pd.Series) -> pd.Series:
        """Boundaries meet but interiors do not overlap (vertex-sample
        approximation of JTS TOUCHES)."""
        out = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            ga, gb = _parse(x), _parse(y)
            if not _intersects_pair(ga, gb):
                continue
            if ga[0] == "POINT" or gb[0] == "POINT":
                # point touches a polygon iff it sits on the boundary
                p, poly = (ga, gb) if ga[0] == "POINT" else (gb, ga)
                if poly[0] == "POINT":
                    continue
                d2 = points_polygons_dist2_batch(
                    p[1][:1, 0], p[1][:1, 1], np.zeros(1, int), pad_rings([poly[1]])
                )
                ring = poly[1][:-1] if np.array_equal(poly[1][0], poly[1][-1]) else poly[1]
                from ..geom import points_segments_dist2

                bd2 = points_segments_dist2(p[1][:1, 0], p[1][:1, 1], ring)
                out[i] = bool(bd2[0] == 0.0)
                continue
            ina = points_in_polygons_batch(
                ga[1][:, 0], ga[1][:, 1], np.zeros(len(ga[1]), int), pad_rings([gb[1]])
            )
            inb = points_in_polygons_batch(
                gb[1][:, 0], gb[1][:, 1], np.zeros(len(gb[1]), int), pad_rings([ga[1]])
            )
            # all contact on boundaries: no vertex strictly interior and no
            # PROPER edge crossing (collinear shared edges still touch)
            from ..geom import points_segments_dist2, rings_edges_proper_cross

            ringb = gb[1][:-1] if np.array_equal(gb[1][0], gb[1][-1]) else gb[1]
            ringa = ga[1][:-1] if np.array_equal(ga[1][0], ga[1][-1]) else ga[1]
            da = points_segments_dist2(ga[1][:, 0], ga[1][:, 1], ringb)
            db = points_segments_dist2(gb[1][:, 0], gb[1][:, 1], ringa)
            strict_a = ina & (da > 0.0)
            strict_b = inb & (db > 0.0)
            out[i] = bool(
                not strict_a.any()
                and not strict_b.any()
                and not rings_edges_proper_cross(ga[1], gb[1])
            )
        return pd.Series(out)

    @F.pandas_udf(BooleanType())
    def st_crosses(a: pd.Series, b: pd.Series) -> pd.Series:
        """LINESTRING×POLYGON crosses: the line passes through the polygon's
        interior and exterior (other kind pairs are always false, matching
        JTS dimension rules for point/polygon inputs)."""
        out = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            ga, gb = _parse(x), _parse(y)
            line, poly = None, None
            if ga[0] == "LINESTRING" and gb[0] == "POLYGON":
                line, poly = ga[1], gb[1]
            elif gb[0] == "LINESTRING" and ga[0] == "POLYGON":
                line, poly = gb[1], ga[1]
            if line is None:
                continue
            from ..geom import rings_edges_proper_cross

            inside = points_in_polygons_batch(
                line[:, 0], line[:, 1], np.zeros(len(line), int), pad_rings([poly])
            )
            # vertex on each side, or a proper boundary crossing (handles
            # lines whose endpoints are all outside the polygon)
            out[i] = bool(
                (inside.any() and not inside.all())
                or rings_edges_proper_cross(line, poly)
            )
        return pd.Series(out)

    for name, fn in [
        ("st_bbox", st_bbox),
        ("st_bbox_loose", st_bbox_loose),
        ("st_intersects_loose", st_intersects_loose),
        ("st_xmin", _env_acc(0)),
        ("st_ymin", _env_acc(1)),
        ("st_xmax", _env_acc(2)),
        ("st_ymax", _env_acc(3)),
        ("st_overlaps", st_overlaps),
        ("st_touches", st_touches),
        ("st_crosses", st_crosses),
    ]:
        spark.udf.register(name, fn)
