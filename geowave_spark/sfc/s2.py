"""Vectorized S2 cell ids (numpy) — the reference's S2 binning scheme.

From-scratch implementation of the public S2 geometry cell-id scheme
(s2geometry.io docs; used by GeoWave's S2BinningHelper.java:45-128 via the
official library): project lon/lat onto one of 6 cube faces, apply the
quadratic ST↔UV transform, quantize (s,t) to leaf coordinates, interleave
with the per-face Hilbert curve, and pack ``face·2^61 + position + lsb``
into the canonical 64-bit cell id.  Round-trips and hierarchy (parent =
prefix) match the official library's ids at every level, so ids computed
here join directly against ids from any standard S2 tool.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# S2's per-face Hilbert traversal tables (public constants from the
# reference implementation's lookup construction).  _IJ_TO_POS is the
# canonical kIJtoPos; _POS_TO_IJ is its per-orientation inverse
# (kPosToIJ), used by the decode path and the round-trip regression test
# (round 1 shipped kPosToIJ in the encode slot, which broke curve
# continuity and external-id interop).
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],
        [0, 3, 1, 2],
        [2, 3, 1, 0],
        [2, 1, 3, 0],
    ],
    dtype=np.uint64,
)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.uint64,
)
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.uint64
)


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cos_phi = np.cos(phi)
    return np.cos(theta) * cos_phi, np.sin(theta) * cos_phi, np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        np.stack([x, y, z])[face, np.arange(len(x))] < 0, 3, 0
    )
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            u[m], v[m] = y[m] / x[m], z[m] / x[m]
        elif f == 1:
            u[m], v[m] = -x[m] / y[m], z[m] / y[m]
        elif f == 2:
            u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
        elif f == 3:
            u[m], v[m] = z[m] / x[m], y[m] / x[m]
        elif f == 4:
            u[m], v[m] = z[m] / y[m], -x[m] / y[m]
        else:
            u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face.astype(np.uint64), u, v


def _uv_to_st(u):
    """S2's quadratic projection (the library default)."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u))


def _ij_to_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf curve position via the 1-bit-at-a-time Hilbert state machine
    (vectorized over rows, looped over the 30 levels)."""
    bits = face & _SWAP_MASK  # initial orientation = face & 1
    pos = np.zeros(len(face), dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ik = (i >> np.uint64(k)) & np.uint64(1)
        jk = (j >> np.uint64(k)) & np.uint64(1)
        ij = ik * np.uint64(2) + jk
        p = _IJ_TO_POS[bits & np.uint64(3), ij]
        pos = (pos << np.uint64(2)) | p
        bits = bits ^ _POS_TO_ORIENTATION[p]
    return pos


def s2_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf cell id from (face, leaf i, leaf j) — FromFaceIJ analog."""
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    pos = _ij_to_pos(face, i, j)
    return (
        (face << np.uint64(2 * MAX_LEVEL + 1)) | (pos << np.uint64(1)) | np.uint64(1)
    ).astype(np.int64)


def s2_cell_id(lon: np.ndarray, lat: np.ndarray, level: int = 12) -> np.ndarray:
    """Canonical 64-bit S2 cell ids at the given level (vectorized)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level must be 0..30")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    limit = np.uint64(1 << MAX_LEVEL)
    i = np.minimum(
        (np.clip(_uv_to_st(u), 0, 1) * float(limit)).astype(np.uint64), limit - np.uint64(1)
    )
    j = np.minimum(
        (np.clip(_uv_to_st(v), 0, 1) * float(limit)).astype(np.uint64), limit - np.uint64(1)
    )
    pos = _ij_to_pos(face, i, j)
    # full leaf id: face(3 bits) + 2*30 position bits + trailing 1
    cell = (face << np.uint64(2 * MAX_LEVEL + 1)) | (pos << np.uint64(1)) | np.uint64(1)
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        cell = (cell & (~(lsb - np.uint64(1)))) | lsb
    return cell.astype(np.int64)


def s2_cell_to_face_ij(cell: np.ndarray):
    """Decode leaf cell ids back to (face, i, j) via the inverse table
    (kPosToIJ) — the official library's ToFaceIJOrientation.  Encoding
    with kIJtoPos and decoding with kPosToIJ round-trips only when each
    table is the true inverse of the other, which is the regression this
    pins (tests/test_sfc.py::TestS2::test_round_trip_ij)."""
    cell = np.asarray(cell).astype(np.uint64)
    face = cell >> np.uint64(2 * MAX_LEVEL + 1)
    pos = (cell >> np.uint64(1)) & np.uint64((1 << (2 * MAX_LEVEL)) - 1)
    bits = face & _SWAP_MASK
    i = np.zeros(len(cell), dtype=np.uint64)
    j = np.zeros(len(cell), dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> np.uint64(2 * k)) & np.uint64(3)
        ij = _POS_TO_IJ[bits & np.uint64(3), p]
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        bits = bits ^ _POS_TO_ORIENTATION[p]
    return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64)


def s2_from_face_pos(face: np.ndarray, pos: np.ndarray, level: int) -> np.ndarray:
    """Pack (face, curve position at ``level``) into a cell id."""
    face = np.asarray(face).astype(np.uint64)
    pos = np.asarray(pos).astype(np.uint64)
    shift = np.uint64(2 * (MAX_LEVEL - level))
    leaf_pos = pos << shift
    cell = (face << np.uint64(2 * MAX_LEVEL + 1)) | (leaf_pos << np.uint64(1))
    return (cell | (np.uint64(1) << shift)).astype(np.int64)


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Parent id at a coarser level (prefix truncation + new lsb)."""
    cell = np.asarray(cell).astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((cell & (~(lsb - np.uint64(1)))) | lsb).astype(np.int64)
