"""Aperture-7 icosahedral hexagonal binning (the H3 scheme), pure numpy.

GeoWave's SpatialBinningType enum offers H3 next to S2 and GeoHash
(core/geotime/.../binning/SpatialBinningType.java:15-16), delegating to
the official h3 library's ``geoToH3`` for point binning
(H3BinningHelper.java:40-185).  This module implements the same published
scheme — Uber's H3 design (h3geo.org): project onto the nearest face of
an icosahedron with a gnomonic projection, overlay a hexagonal grid whose
resolution steps scale by 1/√7 and rotate by atan(√3/5) ≈ 19.1066°
(aperture 7), and round to the containing hexagon with cube rounding.

**Id interop caveat (deliberate) + hard misuse guard (r4):** the emitted
64-bit ids pack (resolution, face, i, j) of this implementation's grid;
they are NOT official H3 ids (that would require H3's exact Dymaxion
orientation and 122-entry base-cell tables, which cannot be verified
bit-for-bit in this environment — no h3 library available, and an
unverifiable transcription claim would be worse than an honest caveat).
All *binning semantics* match: one deterministic hexagonal cell per
point, ~7× more cells per resolution step, hexagonal neighborhoods.

To make the non-interop impossible to hit SILENTLY, every emitted id
carries the bit-63 scheme tag (``SCHEME_TAG``) — engine hex ids are
always negative int64s, while official H3 cell indexes always have the
reserved high bit 0 and mode 1 (h3geo.org bit-layout documentation:
1 reserved bit, 4 mode bits = 0001, …) and are therefore always
positive.  The two id spaces are disjoint by construction, a join across
them matches nothing instead of mismatching silently, and
:func:`hex_cell_unpack` / :func:`assert_engine_hex_ids` raise loudly
when handed untagged (possibly official-h3lib) ids.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15

# --- icosahedron geometry (unit sphere) ----------------------------------

_PHI = (1.0 + np.sqrt(5.0)) / 2.0


def _icosa_faces() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Face centers and tangent bases of a regular icosahedron.

    Returns (centers (20,3), u (20,3), v (20,3)) where (u, v) is an
    orthonormal basis of each face's tangent plane.  Deterministic
    construction: 12 vertices from the (0, ±1, ±φ) cyclic permutations,
    faces = the 20 vertex triples at minimal circumradius, ordered by
    (center z, atan2) for a stable face numbering.
    """
    v = []
    for a, b in ((1.0, _PHI), (-1.0, _PHI), (1.0, -_PHI), (-1.0, -_PHI)):
        v.append((0.0, a, b))
        v.append((a, b, 0.0))
        v.append((b, 0.0, a))
    verts = np.array(v, dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    # faces: triples of mutually-nearest vertices (edge length is the min
    # pairwise distance among distinct vertices)
    d = np.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=2)
    edge = np.min(d[d > 1e-9])
    adj = (np.abs(d - edge) < 1e-9)
    tris = []
    for i in range(12):
        for j in range(i + 1, 12):
            if not adj[i, j]:
                continue
            for k in range(j + 1, 12):
                if adj[i, k] and adj[j, k]:
                    tris.append((i, j, k))
    tris = np.array(tris)  # (20, 3)
    centers = verts[tris].mean(axis=1)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    order = np.lexsort((np.arctan2(centers[:, 1], centers[:, 0]).round(9),
                        centers[:, 2].round(9)))
    centers = centers[order]
    tris = tris[order]
    # tangent basis: u toward the face's first vertex, v = c × u
    u = verts[tris[:, 0]] - centers * (verts[tris[:, 0]] * centers).sum(axis=1, keepdims=True)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = np.cross(centers, u)
    return centers, u, w


_CENTERS, _U, _V = _icosa_faces()

# hex grid size at resolution 0, in gnomonic plane units: ~1/3 of the face
# circumradius so a face is covered by a handful of res-0 cells
_RES0_SIZE = 0.35
_SQRT7 = np.sqrt(7.0)
_ROT = np.arctan(np.sqrt(3.0) / 5.0)  # aperture-7 inter-resolution rotation
_SQRT3 = np.sqrt(3.0)


def hex_cell_id(lon: np.ndarray, lat: np.ndarray, res: int = 7) -> np.ndarray:
    """Hexagonal cell id at ``res`` for each (lon, lat) point (geoToH3
    analog).  Vectorized; every point maps to exactly one id."""
    if not 0 <= res <= MAX_RES:
        raise ValueError("res must be 0..15")
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    p = np.stack([np.cos(lon) * cl, np.sin(lon) * cl, np.sin(lat)], axis=1)
    # nearest face center
    dots = p @ _CENTERS.T
    face = np.argmax(dots, axis=1)
    c = _CENTERS[face]
    denom = (p * c).sum(axis=1)
    q = p / denom[:, None]  # gnomonic projection onto the face plane
    x = ((q - c) * _U[face]).sum(axis=1)
    y = ((q - c) * _V[face]).sum(axis=1)
    # resolution scaling + rotation (aperture 7)
    size = _RES0_SIZE / _SQRT7**res
    ang = res * _ROT
    ca, sa = np.cos(ang), np.sin(ang)
    xr = x * ca + y * sa
    yr = -x * sa + y * ca
    # pointy-top axial coordinates + cube rounding
    qa = (_SQRT3 / 3.0 * xr - yr / 3.0) / size
    ra = (2.0 / 3.0 * yr) / size
    qi, ri = _cube_round(qa, ra)
    return _pack(face.astype(np.int64), res, qi, ri)


def _cube_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    s = -q - r
    qi = np.rint(q)
    ri = np.rint(r)
    si = np.rint(s)
    dq = np.abs(qi - q)
    dr = np.abs(ri - r)
    ds = np.abs(si - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    qi = np.where(fix_q, -ri - si, qi)
    ri = np.where(fix_r, -qi - si, ri)
    return qi.astype(np.int64), ri.astype(np.int64)


_OFF = np.int64(1 << 26)

# bit-63 namespace marker: engine hex ids are negative, official H3 cell
# indexes (reserved bit 0, mode 0001) are always positive — disjoint spaces
SCHEME_TAG = np.int64(-(2**63))


def _pack(face: np.ndarray, res: int, qi: np.ndarray, ri: np.ndarray) -> np.ndarray:
    """(tag 1b | res 4b | face 5b | q+2^26 27b | r+2^26 27b) → int64."""
    return (
        SCHEME_TAG
        | (np.int64(res) << np.int64(59))
        | (face << np.int64(54))
        | ((qi + _OFF) << np.int64(27))
        | (ri + _OFF)
    )


def assert_engine_hex_ids(cell: np.ndarray) -> np.ndarray:
    """Validate the bit-63 scheme tag; raise on untagged ids so a join or
    unpack against official-h3lib ids (a different, non-interoperable id
    space — module docstring) fails loudly instead of silently matching
    nothing."""
    cell = np.asarray(cell, dtype=np.int64)
    if cell.size and (cell >= 0).any():
        raise ValueError(
            "untagged hex id(s): engine hex ids carry the bit-63 scheme tag "
            "(negative int64).  Non-negative values are a different id space "
            "— likely official h3lib indexes, which this engine's aperture-7 "
            "scheme deliberately does NOT interoperate with (sfc/h3hex.py)."
        )
    return cell


def hex_cell_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    cell = assert_engine_hex_ids(cell) & ~SCHEME_TAG
    res = (cell >> np.int64(59)) & np.int64(0xF)
    face = (cell >> np.int64(54)) & np.int64(0x1F)
    qi = ((cell >> np.int64(27)) & np.int64((1 << 27) - 1)) - _OFF
    ri = (cell & np.int64((1 << 27) - 1)) - _OFF
    return res, face, qi, ri
