"""Vectorized 2-D Z-order (Morton) curve.

Semantics of GeoWave's ZOrderSFC (reference:
core/index/.../sfc/zorder/ZOrderSFC.java, ZOrderUtils.java — plain bit
interleaving of per-dimension normalized integers).  Implemented with the
magic-number bit-spreading trick so encoding N rows is a handful of numpy
ops regardless of bit depth.
"""

from __future__ import annotations

import numpy as np

MAX_BITS = 31

_MASKS = [
    (np.uint64(16), np.uint64(0x0000FFFF0000FFFF)),
    (np.uint64(8), np.uint64(0x00FF00FF00FF00FF)),
    (np.uint64(4), np.uint64(0x0F0F0F0F0F0F0F0F)),
    (np.uint64(2), np.uint64(0x3333333333333333)),
    (np.uint64(1), np.uint64(0x5555555555555555)),
]


def _spread(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so bit i lands at position 2i."""
    v = v.astype(np.uint64)
    for shift, mask in _MASKS:
        v = (v | (v << shift)) & mask
    return v


def _compact(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread: gather even-position bits back together."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def xy_to_zorder(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Interleave x (even bits) and y (odd bits) → Morton code."""
    if not 0 < bits <= MAX_BITS:
        raise ValueError(f"bits must be in 1..{MAX_BITS}, got {bits}")
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    return _spread(x) | (_spread(y) << np.uint64(1))


def zorder_to_xy(z: np.ndarray, bits: int) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype=np.uint64)
    return _compact(z), _compact(z >> np.uint64(1))
