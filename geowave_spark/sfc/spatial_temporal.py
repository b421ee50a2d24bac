"""3-D spatial-temporal tiered index: (lon, lat, year-binned time).

GeoWave's second default index
(core/geotime/.../index/SpatialTemporalDimensionalityTypeProvider.java:57)
combines the two spatial dimensions with a time dimension handled by
TemporalBinningStrategy (core/geotime/.../index/dimension/
TemporalBinningStrategy.java:36-132): unbounded time is binned by a
calendar unit (default YEAR, SpatialTemporalOptions.java:18) into a
fixed-size bin id that prefixes the partition key, plus a normalized
position within the bin that participates in the SFC.

Key layout on the DataFrame side:

  year: int   — temporal bin id (the partition-key bin prefix)
  tier: int   — bits of precision per dimension
  cell: long  — 3-D Morton (Z-order) index at that tier

The 3-D curve is Z-order rather than Hilbert: prefix-hierarchical (tier
re-projection = shift right by 3 bits/tier), fully vectorizable with
magic-number bit spreading, and decomposable to contiguous ranges.  The
reference ships ZOrderSFC as a first-class alternative curve
(core/index/.../sfc/zorder/ZOrderSFC.java); row-set results are identical
for any curve because the exact predicate always runs after the coarse
cell prune.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .dimensions import LATITUDE, LONGITUDE, Dimension, temporal_bin_year

# normalized position within the year bin
TIME_IN_BIN = Dimension(0.0, 1.0)

# decomposition caps (the reference bounds decomposition work the same
# way: UNIT_CELL_SIZE backtracking cap + maxRangeDecomposition)
UNIT_CELL_COUNT_CAP = 1 << 19


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each value to every 3rd bit (Morton)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def _compact1by2(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_part1by2`."""
    x = x.astype(np.uint64) & np.uint64(0x1249249249249249)
    x = (x ^ (x >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
    x = (x ^ (x >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
    x = (x ^ (x >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
    x = (x ^ (x >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
    x = (x ^ (x >> np.uint64(32))) & np.uint64(0x1FFFFF)
    return x


def xyz_to_morton(ix: np.ndarray, iy: np.ndarray, iz: np.ndarray) -> np.ndarray:
    """Interleave three ≤21-bit indices into one Morton code (x lowest)."""
    return (
        _part1by2(ix)
        | (_part1by2(iy) << np.uint64(1))
        | (_part1by2(iz) << np.uint64(2))
    )


def morton_to_xyz(code: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    code = np.asarray(code).astype(np.uint64)
    return (
        _compact1by2(code),
        _compact1by2(code >> np.uint64(1)),
        _compact1by2(code >> np.uint64(2)),
    )


def _year_parts(t0_ms: np.ndarray, t1_ms: np.ndarray):
    """Split [t0, t1] time ranges by year bin.

    Returns (row, year, tlo, thi): one entry per (input row, overlapped
    year), with the normalized [tlo, thi] position range inside that year
    (TemporalBinningStrategy.getNormalizedRanges semantics)."""
    y0, p0 = temporal_bin_year(np.asarray(t0_ms, dtype=np.int64))
    y1, p1 = temporal_bin_year(np.asarray(t1_ms, dtype=np.int64))
    nyears = (y1 - y0 + 1).astype(np.int64)
    n = len(y0)
    row = np.repeat(np.arange(n, dtype=np.int64), nyears)
    starts = np.concatenate(([0], np.cumsum(nyears)[:-1]))
    off = np.arange(int(nyears.sum()), dtype=np.int64) - np.repeat(starts, nyears)
    year = y0[row] + off
    tlo = np.where(off == 0, p0[row], 0.0)
    thi = np.where(year == y1[row], p1[row], 1.0)
    return row, year, tlo, thi


@dataclass(frozen=True)
class SpatialTemporalStrategy:
    """Tiered 3-D strategy over (lon, lat, time-within-year-bin).

    ``max_bits`` defaults to 20 bits/dim so the top-tier Morton code fits
    60 bits of a signed long (the reference's spatial-temporal default
    trades per-dim precision for the extra dimension the same way).
    """

    max_bits: int = 20
    dim_x: Dimension = field(default=LONGITUDE)
    dim_y: Dimension = field(default=LATITUDE)
    dim_t: Dimension = field(default=TIME_IN_BIN)

    # ---- encoding -------------------------------------------------------

    def point_keys(
        self, lon: np.ndarray, lat: np.ndarray, epoch_ms: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(year bin, top-tier Morton cell) for point/instant entities."""
        year, pos = temporal_bin_year(np.asarray(epoch_ms, dtype=np.int64))
        T = self.max_bits
        cell = xyz_to_morton(
            self.dim_x.to_bins(np.asarray(lon, np.float64), T),
            self.dim_y.to_bins(np.asarray(lat, np.float64), T),
            self.dim_t.to_bins(pos, T),
        )
        return year.astype(np.int64), cell.astype(np.int64)

    def cell_at_tier(self, top_cell: np.ndarray, tier: int) -> np.ndarray:
        """Prefix truncation: 3 bits per tier step."""
        sh = np.uint64(3 * (self.max_bits - int(tier)))
        return (np.asarray(top_cell).astype(np.uint64) >> sh).astype(np.int64)

    def envelope_insertion_ids(
        self,
        minx: np.ndarray,
        miny: np.ndarray,
        maxx: np.ndarray,
        maxy: np.ndarray,
        t0_ms: np.ndarray,
        t1_ms: np.ndarray,
        max_duplicates: int = 8,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Insertion ids for N (envelope × time range) entities.

        Returns (row, year, tier, cell) arrays.  The time range first
        splits into year bins (each part indexed independently, exactly
        like the reference's per-bin insertion ids); within a part the
        tier is the finest one where the 3-D extent covers
        ≤ max_duplicates cells (default 8 = 2 per dimension, the 2/dim
        duplicate bound of TieredSFCIndexStrategy.java:58 in 3-D).
        """
        row0, year, tlo, thi = _year_parts(t0_ms, t1_ms)
        T = self.max_bits
        ax = self.dim_x.to_bins(np.asarray(minx, np.float64)[row0], T).astype(np.int64)
        bx = self.dim_x.to_bins(np.asarray(maxx, np.float64)[row0], T).astype(np.int64)
        ay = self.dim_y.to_bins(np.asarray(miny, np.float64)[row0], T).astype(np.int64)
        by = self.dim_y.to_bins(np.asarray(maxy, np.float64)[row0], T).astype(np.int64)
        az = self.dim_t.to_bins(tlo, T).astype(np.int64)
        bz = self.dim_t.to_bins(thi, T).astype(np.int64)

        # finest tier with ≤ max_duplicates covered cells (monotone in tier)
        shifts = (T - np.arange(T + 1)).astype(np.int64)
        nx = (bx[:, None] >> shifts[None, :]) - (ax[:, None] >> shifts[None, :]) + 1
        ny = (by[:, None] >> shifts[None, :]) - (ay[:, None] >> shifts[None, :]) + 1
        nz = (bz[:, None] >> shifts[None, :]) - (az[:, None] >> shifts[None, :]) + 1
        ok = nx * ny * nz <= max_duplicates
        tiers = np.arange(T + 1, dtype=np.int64)
        sel = np.where(ok, tiers[None, :], -1).max(axis=1)

        sh = (T - sel).astype(np.int64)
        a_x, b_x = ax >> sh, bx >> sh
        a_y, b_y = ay >> sh, by >> sh
        a_z, b_z = az >> sh, bz >> sh
        cnx = b_x - a_x + 1
        cny = b_y - a_y + 1
        cnt = cnx * cny * (b_z - a_z + 1)
        rep = np.repeat(np.arange(len(row0), dtype=np.int64), cnt)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        off = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(starts, cnt)
        ix = a_x[rep] + off % cnx[rep]
        iy = a_y[rep] + (off // cnx[rep]) % cny[rep]
        iz = a_z[rep] + off // (cnx[rep] * cny[rep])
        cell = xyz_to_morton(
            ix.astype(np.uint64), iy.astype(np.uint64), iz.astype(np.uint64)
        ).astype(np.int64)
        return row0[rep], year[rep].astype(np.int64), sel[rep], cell

    # ---- query decomposition -------------------------------------------

    def decompose(
        self,
        minx: float,
        miny: float,
        maxx: float,
        maxy: float,
        t0_ms: int,
        t1_ms: int,
        tier: int | None = None,
        max_ranges: int = 128,
    ) -> list[tuple[int, int, list[tuple[int, int]]]]:
        """(bbox × time range) → [(year, tier, [(lo, hi)])] pruning ranges.

        Per overlapped year bin: pick the finest tier whose cover of the
        3-D query box stays under the unit-cell cap, enumerate the cover,
        sort Morton ids, merge consecutive ids into inclusive ranges and
        coalesce nearest-gap ranges down to ``max_ranges`` (bounded
        decomposition, PrimitiveHilbertSFCOperations.java:47 analog).
        """
        _, years, tlos, this_ = _year_parts(
            np.array([t0_ms], dtype=np.int64), np.array([t1_ms], dtype=np.int64)
        )
        out: list[tuple[int, int, list[tuple[int, int]]]] = []
        T = self.max_bits
        for year, tlo, thi in zip(years.tolist(), tlos.tolist(), this_.tolist()):
            t = T if tier is None else int(tier)
            while t > 0 and tier is None:
                nx = int(self.dim_x.to_bins(np.array([maxx]), t)[0]) - int(
                    self.dim_x.to_bins(np.array([minx]), t)[0]
                ) + 1
                ny = int(self.dim_y.to_bins(np.array([maxy]), t)[0]) - int(
                    self.dim_y.to_bins(np.array([miny]), t)[0]
                ) + 1
                nz = int(self.dim_t.to_bins(np.array([thi]), t)[0]) - int(
                    self.dim_t.to_bins(np.array([tlo]), t)[0]
                ) + 1
                if nx * ny * nz <= UNIT_CELL_COUNT_CAP:
                    break
                t -= 1
            ax = int(self.dim_x.to_bins(np.array([minx]), t)[0])
            bx = int(self.dim_x.to_bins(np.array([maxx]), t)[0])
            ay = int(self.dim_y.to_bins(np.array([miny]), t)[0])
            by = int(self.dim_y.to_bins(np.array([maxy]), t)[0])
            az = int(self.dim_t.to_bins(np.array([tlo]), t)[0])
            bz = int(self.dim_t.to_bins(np.array([thi]), t)[0])
            gx, gy, gz = np.meshgrid(
                np.arange(ax, bx + 1, dtype=np.uint64),
                np.arange(ay, by + 1, dtype=np.uint64),
                np.arange(az, bz + 1, dtype=np.uint64),
            )
            ids = np.sort(
                xyz_to_morton(gx.ravel(), gy.ravel(), gz.ravel()).astype(np.int64)
            )
            brk = np.nonzero(np.diff(ids) > 1)[0]
            lo = ids[np.concatenate(([0], brk + 1))]
            hi = ids[np.concatenate((brk, [len(ids) - 1]))]
            ranges = list(zip(lo.tolist(), hi.tolist()))
            while len(ranges) > max_ranges:
                gaps = [
                    (ranges[i + 1][0] - ranges[i][1], i) for i in range(len(ranges) - 1)
                ]
                gaps.sort()
                keep = {i for _, i in gaps[: len(ranges) - max_ranges]}
                merged: list[tuple[int, int]] = []
                for i, r in enumerate(ranges):
                    if merged and (i - 1) in keep:
                        merged[-1] = (merged[-1][0], r[1])
                    else:
                        merged.append(r)
                ranges = merged
            out.append((int(year), t, ranges))
        return out


DEFAULT_ST_STRATEGY = SpatialTemporalStrategy()
