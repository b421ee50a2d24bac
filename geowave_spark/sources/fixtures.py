"""Deterministic synthetic fixtures (FIXTURES.md F1/F2).

Everything is a pure function of a fixed seed + row index — no wall clock,
no external data.  Mirrors the reference's join IT inputs (hail points ×
tornado-track lines, test/.../GeoWaveSparkSpatialJoinIT.java:182-196) at
configurable scale, with a Zipf-skewed cluster mixture so skew/salting
paths get exercised.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42


def points_pdf(n: int, skew: bool = True, seed: int = SEED) -> pd.DataFrame:
    """`images`-style point table: (image_id, lon, lat).

    80% of points fall in 5 hot clusters (~0.5° radius) when skew=True —
    the Zipfian cell-occupancy regime the north rule's salting targets.
    """
    rng = np.random.default_rng(seed)
    ids = np.array([f"img{i:010d}" for i in range(n)], dtype=object)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    if skew and n >= 20:
        hot = rng.uniform(-150, 150, (5, 2))
        k = int(n * 0.8)
        which = rng.integers(0, 5, k)
        lon[:k] = np.clip(hot[which, 0] + rng.normal(0, 0.5, k), -180, 180)
        lat[:k] = np.clip(hot[which, 1] / 2 + rng.normal(0, 0.5, k), -90, 90)
    return pd.DataFrame({"image_id": ids, "lon": lon, "lat": lat})


def regions_pdf(n: int, seed: int = SEED + 1) -> pd.DataFrame:
    """`regions` polygon table: (region_id, wkt, category).

    Boxes, rotated triangles and thin track rectangles with extents spanning
    0.01°–20°, so entities land across many tiers (multi-tier indexing,
    TieredSFCIndexStrategy tier fall-through).
    """
    rng = np.random.default_rng(seed)
    rows = []
    cats = [f"cat{j}" for j in range(8)]
    for i in range(n):
        cx = rng.uniform(-160, 160)
        cy = rng.uniform(-75, 75)
        size = 10 ** rng.uniform(-2, 1.3)
        kind = i % 3
        if kind == 0:  # box
            ring = np.array(
                [[cx - size, cy - size], [cx + size, cy - size], [cx + size, cy + size], [cx - size, cy + size]]
            )
        elif kind == 1:  # rotated triangle
            ang = rng.uniform(0, 2 * np.pi, 3) + np.array([0, 2.1, 4.2])
            ring = np.stack([cx + size * np.cos(ang), cy + size * np.sin(ang)], axis=1)
        else:  # thin track (line-like rectangle)
            theta = rng.uniform(0, np.pi)
            ux, uy = np.cos(theta), np.sin(theta)
            w = size * 0.02
            ring = np.array(
                [
                    [cx - size * ux - w * uy, cy - size * uy + w * ux],
                    [cx + size * ux - w * uy, cy + size * uy + w * ux],
                    [cx + size * ux + w * uy, cy + size * uy - w * ux],
                    [cx - size * ux + w * uy, cy - size * uy - w * ux],
                ]
            )
        ring[:, 0] = np.clip(ring[:, 0], -180, 180)
        ring[:, 1] = np.clip(ring[:, 1], -90, 90)
        closed = np.vstack([ring, ring[:1]])
        wkt = "POLYGON ((" + ", ".join(f"{x:.9g} {y:.9g}" for x, y in closed) + "))"
        rows.append((f"reg{i:06d}", wkt, cats[i % 8]))
    return pd.DataFrame(rows, columns=["region_id", "wkt", "category"])


def tracks_pdf(n: int, seed: int = SEED + 2, max_verts: int = 6) -> pd.DataFrame:
    """`tornado_tracks`-style open polyline table: (track_id, wkt) with
    LINESTRING WKT — the reference's point × line join fixture shape
    (GeoWaveSparkSpatialJoinIT.java:182-196).  Random-walk polylines of
    2..max_verts vertices, step lengths spanning 0.05°–5°, plus every 7th
    row a MULTILINESTRING of two disjoint segments."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        cx = rng.uniform(-160, 160)
        cy = rng.uniform(-75, 75)
        nv = int(rng.integers(2, max_verts + 1))
        step = 10 ** rng.uniform(-1.3, 0.7)
        ang = rng.uniform(0, 2 * np.pi)
        pts = [(cx, cy)]
        for _ in range(nv - 1):
            ang += rng.normal(0, 0.6)
            cx = float(np.clip(cx + step * np.cos(ang), -180, 180))
            cy = float(np.clip(cy + step * np.sin(ang), -90, 90))
            pts.append((cx, cy))
        if i % 7 == 3:
            half = max(2, len(pts) // 2)
            a = ", ".join(f"{x:.9g} {y:.9g}" for x, y in pts[:half])
            ox = float(np.clip(pts[0][0] + 3 * step, -180, 180))
            b = ", ".join(
                f"{np.clip(x - pts[0][0] + ox, -180, 180):.9g} {y:.9g}"
                for x, y in pts[:half]
            )
            wkt = f"MULTILINESTRING (({a}), ({b}))"
        else:
            wkt = "LINESTRING (" + ", ".join(f"{x:.9g} {y:.9g}" for x, y in pts) + ")"
        rows.append((f"trk{i:06d}", wkt))
    return pd.DataFrame(rows, columns=["track_id", "wkt"])
