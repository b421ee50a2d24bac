"""Vectorized planar geometry (pure numpy — shapely is unavailable here).

Implements the exact-predicate math GeoWave gets from JTS
(core/geotime/.../store/query/filter/SpatialQueryFilter.java predicates,
analytics/spark/.../sparksql/udf/{GeomIntersects,GeomWithinDistance,
GeomDistance}.java): point-in-polygon, point↔segment/polygon distance,
envelope intersection — the fine-filter stage that runs after the coarse
cell-range join.

Polygons are (N, 2) float arrays of exterior-ring vertices (closed or open;
holes are out of scope for v1 — the reference fixtures are simple rings).
A minimal WKT POLYGON/POINT parser round-trips the fixture format.
"""

from __future__ import annotations

import numpy as np


# --- WKT (minimal: POINT, POLYGON without holes) -------------------------

def parse_wkt(wkt: str) -> tuple[str, np.ndarray]:
    """Parse 'POINT (x y)' or 'POLYGON ((x y, ...))' → (kind, coords)."""
    s = wkt.strip()
    kind = s.split("(", 1)[0].strip().upper()
    body = s[s.index("(") :].replace("(", " ").replace(")", " ").strip()
    pts = np.array(
        [[float(t) for t in pair.split()] for pair in body.split(",")],
        dtype=np.float64,
    )
    return kind, pts


def polygon_wkt(coords: np.ndarray) -> str:
    ring = coords
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    inner = ", ".join(f"{x:.9g} {y:.9g}" for x, y in ring)
    return f"POLYGON (({inner}))"


# --- predicates -----------------------------------------------------------

def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Ray-casting point-in-polygon, boundary-inclusive, vectorized over points.

    Boundary inclusion uses an exact cross-product on-segment test (no
    epsilon): for axis-aligned edges this is bit-exact, matching a SQL
    BETWEEN on the same doubles."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = poly
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    # (P, E) edge crossing test
    pyv = py[:, None]
    pxv = px[:, None]
    cond = (y1[None, :] > pyv) != (y2[None, :] > pyv)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (pyv - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
            x2[None, :] - x1[None, :]
        )
    crossings = (cond & (pxv < xint)).sum(axis=1)
    inside = (crossings % 2) == 1
    # exact on-boundary: cross == 0 and point within the edge bbox
    cross = (x2 - x1)[None, :] * (pyv - y1[None, :]) - (y2 - y1)[None, :] * (pxv - x1[None, :])
    on_edge = (
        (cross == 0.0)
        & (pxv >= np.minimum(x1, x2)[None, :])
        & (pxv <= np.maximum(x1, x2)[None, :])
        & (pyv >= np.minimum(y1, y2)[None, :])
        & (pyv <= np.maximum(y1, y2)[None, :])
    ).any(axis=1)
    return inside | on_edge


def points_segments_dist2(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min squared distance from each point to the ring's edges."""
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    dx, dy = x2 - x1, y2 - y1
    seg_len2 = dx * dx + dy * dy
    seg_len2 = np.where(seg_len2 == 0, 1.0, seg_len2)
    t = ((px[:, None] - x1[None, :]) * dx[None, :] + (py[:, None] - y1[None, :]) * dy[None, :]) / seg_len2[None, :]
    t = np.clip(t, 0.0, 1.0)
    cx = x1[None, :] + t * dx[None, :]
    cy = y1[None, :] + t * dy[None, :]
    d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
    return d2.min(axis=1)


def points_polygon_dist2(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Squared distance point→polygon (0 inside)."""
    ring = poly if not np.array_equal(poly[0], poly[-1]) else poly[:-1]
    d2 = points_segments_dist2(np.asarray(px, float), np.asarray(py, float), ring)
    inside = points_in_polygon(px, py, poly)
    return np.where(inside, 0.0, d2)


def pad_rings(polys: list[np.ndarray]) -> np.ndarray:
    """Stack open rings into one (K, E, 2) array, padding each ring by
    repeating its last vertex (padding edges are zero-length and inert in
    both the crossing and the distance tests)."""
    rings = [p[:-1] if np.array_equal(p[0], p[-1]) else p for p in polys]
    E = max(len(r) for r in rings)
    out = np.empty((len(rings), E, 2), dtype=np.float64)
    for k, r in enumerate(rings):
        out[k, : len(r)] = r
        out[k, len(r):] = r[-1]
    return out


def points_in_polygons_batch(
    px: np.ndarray, py: np.ndarray, codes: np.ndarray, padded: np.ndarray
) -> np.ndarray:
    """Boundary-inclusive PIP for N (point, polygon-code) rows in one shot.

    ``padded`` is the (K, E, 2) output of :func:`pad_rings`; ``codes`` maps
    each row to its polygon.  One (N, E) vectorized pass — no per-group
    Python, which is what makes the join's fine filter scale.
    """
    P = padded[codes]  # (N, E, 2)
    x1 = P[:, :, 0]
    y1 = P[:, :, 1]
    x2 = np.roll(x1, -1, axis=1)
    y2 = np.roll(y1, -1, axis=1)
    pxv = px[:, None]
    pyv = py[:, None]
    cond = (y1 > pyv) != (y2 > pyv)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (pyv - y1) / (y2 - y1) * (x2 - x1)
    inside = ((cond & (pxv < xint)).sum(axis=1) % 2) == 1
    cross = (x2 - x1) * (pyv - y1) - (y2 - y1) * (pxv - x1)
    on_edge = (
        (cross == 0.0)
        & (pxv >= np.minimum(x1, x2))
        & (pxv <= np.maximum(x1, x2))
        & (pyv >= np.minimum(y1, y2))
        & (pyv <= np.maximum(y1, y2))
    ).any(axis=1)
    return inside | on_edge


def points_polygons_dist2_batch(
    px: np.ndarray, py: np.ndarray, codes: np.ndarray, padded: np.ndarray
) -> np.ndarray:
    """Squared distance point→its polygon (0 inside), batched like
    :func:`points_in_polygons_batch`."""
    P = padded[codes]
    x1 = P[:, :, 0]
    y1 = P[:, :, 1]
    x2 = np.roll(x1, -1, axis=1)
    y2 = np.roll(y1, -1, axis=1)
    dx = x2 - x1
    dy = y2 - y1
    seg_len2 = dx * dx + dy * dy
    safe = np.where(seg_len2 == 0, 1.0, seg_len2)
    pxv = px[:, None]
    pyv = py[:, None]
    t = np.clip(((pxv - x1) * dx + (pyv - y1) * dy) / safe, 0.0, 1.0)
    cx = x1 + t * dx
    cy = y1 + t * dy
    d2 = ((pxv - cx) ** 2 + (pyv - cy) ** 2).min(axis=1)
    return np.where(points_in_polygons_batch(px, py, codes, padded), 0.0, d2)


def rings_edges_intersect(ra: np.ndarray, rb: np.ndarray) -> bool:
    """Do any boundary edges of the two rings intersect? (orientation test,
    vectorized over the E_a × E_b edge pairs; collinear touches count)."""
    a = ra[:-1] if np.array_equal(ra[0], ra[-1]) else ra
    b = rb[:-1] if np.array_equal(rb[0], rb[-1]) else rb
    p1 = a
    p2 = np.roll(a, -1, axis=0)
    q1 = b
    q2 = np.roll(b, -1, axis=0)

    def cross(ox, oy, ax_, ay, bx, by):
        return (ax_ - ox) * (by - oy) - (ay - oy) * (bx - ox)

    # (Ea, Eb) orientation values
    d1 = cross(q1[None, :, 0], q1[None, :, 1], q2[None, :, 0], q2[None, :, 1], p1[:, None, 0], p1[:, None, 1])
    d2 = cross(q1[None, :, 0], q1[None, :, 1], q2[None, :, 0], q2[None, :, 1], p2[:, None, 0], p2[:, None, 1])
    d3 = cross(p1[:, None, 0], p1[:, None, 1], p2[:, None, 0], p2[:, None, 1], q1[None, :, 0], q1[None, :, 1])
    d4 = cross(p1[:, None, 0], p1[:, None, 1], p2[:, None, 0], p2[:, None, 1], q2[None, :, 0], q2[None, :, 1])
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True
    # collinear / endpoint touches: a zero orientation with bbox overlap
    for d, s1, s2, pt in (
        (d1, q1, q2, p1),
        (d2, q1, q2, p2),
        (d3, p1, p2, q1),
        (d4, p1, p2, q2),
    ):
        z = d == 0
        if z.any():
            if d is d1 or d is d2:
                px_ = pt[:, None, 0]; py_ = pt[:, None, 1]
                sx1 = s1[None, :, 0]; sy1 = s1[None, :, 1]
                sx2 = s2[None, :, 0]; sy2 = s2[None, :, 1]
            else:
                px_ = pt[None, :, 0]; py_ = pt[None, :, 1]
                sx1 = s1[:, None, 0]; sy1 = s1[:, None, 1]
                sx2 = s2[:, None, 0]; sy2 = s2[:, None, 1]
            on = (
                z
                & (px_ >= np.minimum(sx1, sx2))
                & (px_ <= np.maximum(sx1, sx2))
                & (py_ >= np.minimum(sy1, sy2))
                & (py_ <= np.maximum(sy1, sy2))
            )
            if on.any():
                return True
    return False


def polygon_envelope(poly: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(poly[:, 0].min()),
        float(poly[:, 1].min()),
        float(poly[:, 0].max()),
        float(poly[:, 1].max()),
    )


def envelopes_intersect(
    a: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
) -> np.ndarray:
    aminx, aminy, amaxx, amaxy = a
    bminx, bminy, bmaxx, bmaxy = b
    return (aminx <= bmaxx) & (bminx <= amaxx) & (aminy <= bmaxy) & (bminy <= amaxy)


def cell_rect_intersects_polygon(
    cminx: np.ndarray, cminy: np.ndarray, cmaxx: np.ndarray, cmaxy: np.ndarray, poly: np.ndarray
) -> np.ndarray:
    """Does each axis-aligned cell rectangle intersect the polygon?

    Used for insertion-id trimming (reference: RDDUtils.trimIndexIds,
    analytics/spark/.../RDDUtils.java:158-184 — drop cells whose rectangle
    misses the geometry, applied only when an entity got >3 cells).
    Exact for convex and non-convex rings: rect∩poly ≠ ∅ iff a rect corner
    is in the poly, a poly vertex is in the rect, or edges cross.
    """
    n = len(cminx)
    out = np.zeros(n, dtype=bool)
    ring = poly if not np.array_equal(poly[0], poly[-1]) else poly[:-1]
    # poly vertex inside rect
    vx, vy = ring[:, 0], ring[:, 1]
    out |= (
        (vx[None, :] >= cminx[:, None])
        & (vx[None, :] <= cmaxx[:, None])
        & (vy[None, :] >= cminy[:, None])
        & (vy[None, :] <= cmaxy[:, None])
    ).any(axis=1)
    # rect corner inside poly
    for cx, cy in ((cminx, cminy), (cminx, cmaxy), (cmaxx, cminy), (cmaxx, cmaxy)):
        todo = ~out
        if todo.any():
            out[todo] |= points_in_polygon(cx[todo], cy[todo], poly)
    # edge crossings: segment vs rect via separating-axis on each poly edge
    todo = np.nonzero(~out)[0]
    if len(todo):
        x1, y1 = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for i in todo:
            out[i] = _segments_hit_rect(
                x1, y1, x2, y2, cminx[i], cminy[i], cmaxx[i], cmaxy[i]
            )
    return out


def _segments_hit_rect(x1, y1, x2, y2, rminx, rminy, rmaxx, rmaxy) -> bool:
    """Liang-Barsky style clip test: does any segment intersect the rect?"""
    dx = x2 - x1
    dy = y2 - y1
    t0 = np.zeros_like(x1)
    t1 = np.ones_like(x1)
    ok = np.ones(x1.shape, dtype=bool)
    for p, q in (
        (-dx, x1 - rminx),
        (dx, rmaxx - x1),
        (-dy, y1 - rminy),
        (dy, rmaxy - y1),
    ):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = q / p
        par_out = (p == 0) & (q < 0)
        ok &= ~par_out
        ent = np.where(p < 0, r, -np.inf)
        ext = np.where(p > 0, r, np.inf)
        t0 = np.maximum(t0, np.where(np.isfinite(ent), ent, t0))
        t1 = np.minimum(t1, np.where(np.isfinite(ext), ext, t1))
    return bool((ok & (t0 <= t1)).any())


class LocalPolygonGrid:
    """Uniform grid index over a (collected) polygon set, for map-side
    point⋈polygon joins.

    The Spark-side analog is still a cell-key hash join — here the hash
    lookup runs inside the Arrow batch (numpy searchsorted on packed cell
    keys) against a broadcast index, so the probe side needs no shuffle and
    no tier explosion.  Cell size adapts to the median (buffered) envelope
    so a polygon covers ~1-4 cells and a point's candidate list stays short
    even when polygon sizes vary by orders of magnitude.

    Everything is plain numpy arrays, so the object pickles efficiently
    into a Spark broadcast.
    """

    def __init__(self, ids, polys, buffer: float = 0.0):
        self.ids = np.asarray(ids, dtype=object)
        self.padded = pad_rings(polys) if polys else np.zeros((0, 1, 2))
        env = np.array(
            [polygon_envelope(p) for p in polys], dtype=np.float64
        ).reshape(len(polys), 4)
        env[:, 0] -= buffer
        env[:, 1] -= buffer
        env[:, 2] += buffer
        env[:, 3] += buffer
        if len(polys):
            w = np.median(np.maximum(env[:, 2] - env[:, 0], env[:, 3] - env[:, 1]))
            self.cell = max(float(w), 1e-9)
        else:
            self.cell = 1.0
        gx0 = np.floor(env[:, 0] / self.cell).astype(np.int64)
        gx1 = np.floor(env[:, 2] / self.cell).astype(np.int64)
        gy0 = np.floor(env[:, 1] / self.cell).astype(np.int64)
        gy1 = np.floor(env[:, 3] / self.cell).astype(np.int64)
        cnx = gx1 - gx0 + 1
        cnt = cnx * (gy1 - gy0 + 1)
        code = np.repeat(np.arange(len(polys), dtype=np.int64), cnt)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        off = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(starts, cnt)
        gx = gx0[code] + off % cnx[code]
        gy = gy0[code] + off // cnx[code]
        key = self._pack(gx, gy)
        order = np.argsort(key, kind="stable")
        key = key[order]
        self.codes = code[order]
        self.keys, first = np.unique(key, return_index=True)
        self.starts = np.concatenate([first, [len(key)]])

    @staticmethod
    def _pack(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
        return ((gx + (1 << 31)) << 32) | (gy + (1 << 31))

    def candidates(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(probe_row_index, polygon_code) candidate pairs for N points."""
        if not len(self.keys) or not len(px):
            z = np.zeros(0, dtype=np.int64)
            return z, z
        key = self._pack(
            np.floor(px / self.cell).astype(np.int64),
            np.floor(py / self.cell).astype(np.int64),
        )
        idx = np.searchsorted(self.keys, key)
        idx_c = np.minimum(idx, len(self.keys) - 1)
        hit = self.keys[idx_c] == key
        rows = np.nonzero(hit)[0]
        b = self.starts[idx_c[rows]]
        e = self.starts[idx_c[rows] + 1]
        cnt = e - b
        rowrep = np.repeat(rows, cnt)
        starts2 = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        off = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(starts2, cnt)
        codes = self.codes[np.repeat(b, cnt) + off]
        return rowrep, codes


def rings_edges_proper_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """Any PROPER edge crossing between two rings: segments intersect at a
    single interior point of both (excludes endpoint contact and collinear
    overlap).  Distinguishes interiors-overlap from boundary-only touch."""
    ra = a[:-1] if np.array_equal(a[0], a[-1]) else a
    rb = b[:-1] if np.array_equal(b[0], b[-1]) else b
    p = ra
    r = np.roll(ra, -1, axis=0) - ra
    q = rb
    s = np.roll(rb, -1, axis=0) - rb
    # (E1, E2) pairwise
    rxs = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]
    qp = q[None, :, :] - p[:, None, :]
    qpxs = qp[:, :, 0] * s[None, :, 1] - qp[:, :, 1] * s[None, :, 0]
    qpxr = qp[:, :, 0] * r[:, None, 1] - qp[:, :, 1] * r[:, None, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs
        u = qpxr / rxs
    proper = (rxs != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    return bool(proper.any())
