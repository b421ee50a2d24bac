"""Vectorized geohash cell binning (numpy).

Stand-in for GeoWave's spatial binning helpers
(core/geotime/.../binning/SpatialBinningType.java enum H3/S2/GEOHASH,
GeohashBinningHelper.java).  The h3/s2 python packages are not available in
this environment, so the engine ships two from-scratch cell schemes with the
same API surface: this geohash (base-32 Z-order over lon/lat, identical cell
layout to the public geohash standard) and the Hilbert grid in
``tiered.py``.  Ring expansion (H3 grid_disk analog for kNN) uses the raw
integer grid, see operators/knn.py.
"""

from __future__ import annotations

import numpy as np

_BASE32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")


def geohash_encode(lon: np.ndarray, lat: np.ndarray, precision: int = 7) -> np.ndarray:
    """Encode lon/lat to geohash strings of the given precision (vectorized).

    Standard geohash: interleave longitude (even bit positions, starting at
    the most significant) and latitude bits, 5 bits per base-32 character.
    """
    if not 1 <= precision <= 12:
        raise ValueError("precision must be 1..12")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    total_bits = precision * 5
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    ix = np.minimum(
        (np.clip((lon + 180.0) / 360.0, 0, 1) * (1 << lon_bits)).astype(np.uint64),
        np.uint64((1 << lon_bits) - 1),
    )
    iy = np.minimum(
        (np.clip((lat + 90.0) / 180.0, 0, 1) * (1 << lat_bits)).astype(np.uint64),
        np.uint64((1 << lat_bits) - 1),
    )
    # interleave MSB-first: even positions (0,2,4..) ← lon, odd ← lat
    code = np.zeros(lon.shape, dtype=np.uint64)
    for b in range(total_bits):
        if b % 2 == 0:  # lon bit
            bit = (ix >> np.uint64(lon_bits - 1 - b // 2)) & np.uint64(1)
        else:  # lat bit
            bit = (iy >> np.uint64(lat_bits - 1 - b // 2)) & np.uint64(1)
        code = (code << np.uint64(1)) | bit
    # split into 5-bit chars
    chars = np.empty((precision, lon.shape[0]), dtype=np.uint8)
    for c in range(precision):
        shift = np.uint64(5 * (precision - 1 - c))
        chars[c] = ((code >> shift) & np.uint64(31)).astype(np.uint8)
    glyphs = _BASE32[chars]  # (precision, n) bytes
    return np.array([b"".join(col).decode() for col in glyphs.T], dtype=object)
