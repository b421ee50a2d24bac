"""XZ hierarchical index strategy: points on the Hilbert tier, extents on
the XZ curve, raster tiers on the tiered strategy.

The reference's XZHierarchicalIndexStrategy
(core/index/.../sfc/xz/XZHierarchicalIndexStrategy.java:46-107) composes
three sub-indexes under one strategy: a full-resolution point curve, an
XZ curve for geometries with extent (one code per entity, no
duplication), and the tiered raster levels.  This module is the engine's
composition of the same parts — points get ``(kind='p', tier=max_bits,
code=hilbert)``, extents ``(kind='x', tier=xz_level, code=xz)`` — with a
single ``query_ranges`` that decomposes a bbox into pruning ranges for
BOTH sub-indexes, so one predicate covers a mixed table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .tiered import TieredStrategy
from .xz import MAX_LEVEL, xz_encode, xz_query_ranges

KIND_POINT = 0
KIND_EXTENT = 1


@dataclass(frozen=True)
class XZHierarchicalStrategy:
    """Composite point + extent index (XZHierarchicalIndexStrategy analog)."""

    tiered: TieredStrategy = field(default_factory=TieredStrategy)
    xz_level: int = MAX_LEVEL

    def _norm(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return (
            self.tiered.dim_x.normalize(np.asarray(x, np.float64)),
            self.tiered.dim_y.normalize(np.asarray(y, np.float64)),
        )

    def encode(
        self,
        minx: np.ndarray,
        miny: np.ndarray,
        maxx: np.ndarray,
        maxy: np.ndarray,
        point_eps: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Entities → (kind, code): degenerate envelopes (width and height
        ≤ ``point_eps``) index as points on the Hilbert top tier, the rest
        as XZ extent codes."""
        minx = np.asarray(minx, np.float64)
        miny = np.asarray(miny, np.float64)
        maxx = np.asarray(maxx, np.float64)
        maxy = np.asarray(maxy, np.float64)
        is_pt = ((maxx - minx) <= point_eps) & ((maxy - miny) <= point_eps)
        kind = np.where(is_pt, KIND_POINT, KIND_EXTENT).astype(np.int32)
        code = np.empty(len(minx), dtype=np.int64)
        if is_pt.any():
            code[is_pt] = self.tiered.point_cells(minx[is_pt], miny[is_pt]).astype(
                np.int64
            )
        ext = ~is_pt
        if ext.any():
            nx0, ny0 = self._norm(minx[ext], miny[ext])
            nx1, ny1 = self._norm(maxx[ext], maxy[ext])
            code[ext] = xz_encode(nx0, ny0, nx1, ny1, self.xz_level)
        return kind, code

    def query_ranges(
        self,
        minx: float,
        miny: float,
        maxx: float,
        maxy: float,
        max_ranges: int = 64,
    ) -> dict[int, list[tuple[int, int]]]:
        """bbox → {kind: [(lo, hi)]} pruning ranges covering both
        sub-indexes (a superset; exact filtering follows as usual)."""
        t, raw = self.tiered.decompose_bbox(minx, miny, maxx, maxy, max_ranges=max_ranges)
        # decomposition happens at an adaptive tier; point codes live at
        # the top tier — rescale by the Hilbert prefix property
        d = 2 * (self.tiered.max_bits - t)
        pt_ranges = [((lo << d), (((hi + 1) << d) - 1)) for lo, hi in raw]
        nx0, ny0 = self._norm(np.array([minx]), np.array([miny]))
        nx1, ny1 = self._norm(np.array([maxx]), np.array([maxy]))
        xz_ranges = xz_query_ranges(
            float(nx0[0]), float(ny0[0]), float(nx1[0]), float(ny1[0]), self.xz_level
        )
        return {
            KIND_POINT: [(int(a), int(b)) for a, b in pt_ranges],
            KIND_EXTENT: [(int(a), int(b)) for a, b in xz_ranges],
        }
