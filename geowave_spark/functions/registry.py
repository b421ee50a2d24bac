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
    GeomBatch,
    geom_is_closed,
    geoms_pair_dist2,
    pad_rings,
    parse_wkt,
    parse_wkt_multi,
    points_geoms_dist2_batch,
    points_in_polygons_batch,
    points_intersect_geoms_batch,
    points_polygons_dist2_batch,
    polygon_envelope,
    rings_edges_intersect,
)

_PARSE_CACHE: dict[str, tuple[str, np.ndarray]] = {}
_PARSE_MULTI_CACHE: dict[str, tuple[str, list[np.ndarray]]] = {}


def _parse(w: str) -> tuple[str, np.ndarray]:
    g = _PARSE_CACHE.get(w)
    if g is None:
        g = parse_wkt(w)
        if len(_PARSE_CACHE) < 500_000:
            _PARSE_CACHE[w] = g
    return g


def _parse_multi(w: str) -> tuple[str, list[np.ndarray]]:
    g = _PARSE_MULTI_CACHE.get(w)
    if g is None:
        g = parse_wkt_multi(w)
        if len(_PARSE_MULTI_CACHE) < 500_000:
            _PARSE_MULTI_CACHE[w] = g
    return g


def _pairwise_dist2(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Squared distance between geometry pairs — kind-aware (POINT,
    LINESTRING, POLYGON, MULTI\\*).  Open polylines use only their real
    segments (no phantom closing edge, no containment — the round-2
    line-distance fix); closed rings keep interior-distance-0."""
    n = len(a)
    out = np.empty(n, dtype=np.float64)
    ga = [_parse_multi(w) for w in a]
    gb = [_parse_multi(w) for w in b]
    # vectorize the common point↔point case
    pp = np.array([x[0] == "POINT" and y[0] == "POINT" for x, y in zip(ga, gb)], dtype=bool)
    if pp.any():
        ii = np.nonzero(pp)[0]
        ax = np.array([ga[i][1][0][0, 0] for i in ii])
        ay = np.array([ga[i][1][0][0, 1] for i in ii])
        bx = np.array([gb[i][1][0][0, 0] for i in ii])
        by = np.array([gb[i][1][0][0, 1] for i in ii])
        out[ii] = (ax - bx) ** 2 + (ay - by) ** 2
    mixed = np.nonzero(~pp)[0]
    if len(mixed):
        # point↔geometry (either order) batches through one GeomBatch;
        # geometry↔geometry is exact pairwise (0 on intersection, else min
        # vertex→edge either way — exact for piecewise-linear shapes)
        pts_x, pts_y, rows, geoms = [], [], [], []
        for i in mixed:
            (ka, pa), (kb, pb) = ga[i], gb[i]
            if ka == "POINT" and kb != "POINT":
                pts_x.append(pa[0][0, 0]); pts_y.append(pa[0][0, 1]); geoms.append(gb[i]); rows.append(i)
            elif kb == "POINT":
                pts_x.append(pb[0][0, 0]); pts_y.append(pb[0][0, 1]); geoms.append(ga[i]); rows.append(i)
            else:
                out[i] = geoms_pair_dist2(
                    pa, geom_is_closed(ka), pb, geom_is_closed(kb)
                )
        if pts_x:
            batch = GeomBatch(geoms)
            d = points_geoms_dist2_batch(
                np.array(pts_x), np.array(pts_y),
                np.arange(len(geoms), dtype=np.int64), batch,
            )
            out[np.array(rows, dtype=np.int64)] = d
    return out


def _intersects_pair(a, b) -> bool:
    """Kind-aware INTERSECTS on parsed-multi geometries."""
    (ka, pa), (kb, pb) = a, b
    if ka == "POINT" and kb == "POINT":
        return bool(np.all(pa[0][0] == pb[0][0]))
    if ka == "POINT" or kb == "POINT":
        (pt_parts, other) = (pa, b) if ka == "POINT" else (pb, a)
        batch = GeomBatch([other])
        return bool(
            points_intersect_geoms_batch(
                pt_parts[0][:1, 0], pt_parts[0][:1, 1], np.zeros(1, np.int64), batch
            )[0]
        )
    # extended × extended: any vertex of one inside/on the other, else edge
    # crossing between any part pair
    ca, cb_ = geom_is_closed(ka), geom_is_closed(kb)
    return geoms_pair_dist2(pa, ca, pb, cb_) == 0.0


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
        return pd.Series([_intersects_pair(_parse_multi(x), _parse_multi(y)) for x, y in zip(a, b)])

    @F.pandas_udf(BooleanType())
    def st_disjoint(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([not _intersects_pair(_parse_multi(x), _parse_multi(y)) for x, y in zip(a, b)])

    def _contains_pair(ga, gb) -> bool:
        """a CONTAINS b: closed a, any-kind b — every vertex of b inside a
        (boundary-inclusive) and no proper boundary crossing (vertex-sample
        approximation of JTS covers(), exact for the convex fixtures)."""
        from ..geom import rings_edges_proper_cross

        (ka, pa), (kb, pb) = ga, gb
        if not geom_is_closed(ka):
            return False
        batch = GeomBatch([ga])
        vb = np.vstack(pb)
        if not points_intersect_geoms_batch(
            vb[:, 0], vb[:, 1], np.zeros(len(vb), np.int64), batch
        ).all():
            return False
        if kb == "POINT" or kb == "MULTIPOINT":
            return True
        cb_ = geom_is_closed(kb)
        return not any(
            rings_edges_proper_cross(b_part, a_part, closed_a=cb_, closed_b=True)
            for b_part in pb
            for a_part in pa
            if len(b_part) > 1
        )

    @F.pandas_udf(BooleanType())
    def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
        """a CONTAINS b — polygon a; point/line/polygon b."""
        return pd.Series(
            [_contains_pair(_parse_multi(x), _parse_multi(y)) for x, y in zip(a, b)]
        )

    @F.pandas_udf(BooleanType())
    def st_within(a: pd.Series, b: pd.Series) -> pd.Series:
        """a WITHIN b — mirror of contains."""
        return pd.Series(
            [_contains_pair(_parse_multi(y), _parse_multi(x)) for x, y in zip(a, b)]
        )

    @F.pandas_udf(StringType())
    def st_envelope(a: pd.Series) -> pd.Series:
        out = []
        for w in a:
            _, parts = _parse_multi(w)
            c = np.vstack(parts)
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
        kind, parts = _parse_multi(w)
        c = np.vstack(parts)
        if len(c) == 1:
            return c[0][0], c[0][1], c[0][0], c[0][1]
        return polygon_envelope(c)

    @F.pandas_udf(BooleanType())
    def st_bbox(g: pd.Series, minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        from ..geom import cell_rect_intersects_geom

        out = np.zeros(len(g), dtype=bool)
        for i, w in enumerate(g):
            kind, parts = _parse_multi(w)
            x0, y0, x1, y1 = float(minx[i]), float(miny[i]), float(maxx[i]), float(maxy[i])
            if kind == "POINT":
                c = parts[0]
                out[i] = x0 <= c[0][0] <= x1 and y0 <= c[0][1] <= y1
            else:
                out[i] = cell_rect_intersects_geom(
                    np.array([x0]), np.array([y0]), np.array([x1]), np.array([y1]),
                    parts, geom_is_closed(kind),
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

    @F.pandas_udf(BooleanType())
    def st_overlaps(a: pd.Series, b: pd.Series) -> pd.Series:
        """Polygon/polygon OVERLAPS: interiors intersect, neither covers the
        other (GWQL OVERLAPS; JTS semantics approximated on vertices).
        Defined for closed×closed only — mixed-dimension pairs (any
        point/line input) are false, matching JTS dimension rules."""
        out = np.zeros(len(a), dtype=bool)
        for i, (x, y) in enumerate(zip(a, b)):
            ka, kb = _parse_multi(x)[0], _parse_multi(y)[0]
            if not (geom_is_closed(ka) and geom_is_closed(kb)):
                continue
            ga, gb = _parse(x), _parse(y)
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
            if not _intersects_pair(_parse_multi(x), _parse_multi(y)):
                continue
            ga, gb = _parse(x), _parse(y)
            if ga[0] not in ("POINT", "POLYGON") or gb[0] not in ("POINT", "POLYGON"):
                # touches is defined here for point/polygon pairs only
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
                or rings_edges_proper_cross(line, poly, closed_a=False, closed_b=True)
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
