"""Property-based index-math tests (hypothesis) — beyond the reference's
example-based strategy: random round-trip/monotonicity laws for every
curve in sfc/."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark.sfc import (
    geohash_encode,
    hex_cell_id,
    hilbert_to_xy,
    morton_to_xyz,
    temporal_bin_year,
    truncate_to_tier,
    xy_to_hilbert,
    xy_to_zorder,
    xyz_to_morton,
    zorder_to_xy,
)

coords = st.integers(min_value=0, max_value=(1 << 31) - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=50))
def test_hilbert_round_trip_any(pairs):
    x = np.array([p[0] for p in pairs], dtype=np.uint64)
    y = np.array([p[1] for p in pairs], dtype=np.uint64)
    d = xy_to_hilbert(x, y, 31)
    x2, y2 = hilbert_to_xy(d, 31)
    assert (x2 == x).all() and (y2 == y).all()


@settings(max_examples=200, deadline=None)
@given(st.tuples(coords, coords), st.integers(min_value=1, max_value=30))
def test_hilbert_prefix_law(pair, coarser):
    x = np.array([pair[0]], dtype=np.uint64)
    y = np.array([pair[1]], dtype=np.uint64)
    d = xy_to_hilbert(x, y, 31)
    sh = np.uint64(31 - coarser)
    want = xy_to_hilbert(x >> sh, y >> sh, coarser)
    assert (truncate_to_tier(d, 31, coarser) == want).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=50))
def test_zorder_round_trip_any(pairs):
    x = np.array([p[0] for p in pairs], dtype=np.uint64)
    y = np.array([p[1] for p in pairs], dtype=np.uint64)
    z = xy_to_zorder(x, y, 31)
    x2, y2 = zorder_to_xy(z, 31)
    assert (x2 == x).all() and (y2 == y).all()


c20 = st.integers(min_value=0, max_value=(1 << 20) - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(c20, c20, c20), min_size=1, max_size=50))
def test_morton3_round_trip_any(trips):
    ix = np.array([t[0] for t in trips], dtype=np.uint64)
    iy = np.array([t[1] for t in trips], dtype=np.uint64)
    iz = np.array([t[2] for t in trips], dtype=np.uint64)
    mx, my, mz = morton_to_xyz(xyz_to_morton(ix, iy, iz))
    assert (mx == ix).all() and (my == iy).all() and (mz == iz).all()


lonlat = st.tuples(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
)


@settings(max_examples=100, deadline=None)
@given(lonlat, st.integers(min_value=1, max_value=12))
def test_geohash_prefix_nesting(pt, precision):
    """A finer geohash always starts with the coarser geohash of the
    same point (the defining base-32 nesting law)."""
    lon = np.array([pt[0]])
    lat = np.array([pt[1]])
    fine = geohash_encode(lon, lat, precision)[0]
    for p in range(1, precision):
        assert fine.startswith(geohash_encode(lon, lat, p)[0])


@settings(max_examples=100, deadline=None)
@given(lonlat)
def test_hex_total_function(pt):
    """Every coordinate (poles and dateline included) maps to exactly one
    hex cell, stable across calls."""
    lon = np.array([pt[0]])
    lat = np.array([pt[1]])
    a = hex_cell_id(lon, lat, 6)[0]
    assert a == hex_cell_id(lon, lat, 6)[0]


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=4_102_444_800_000))
def test_temporal_bin_position_in_range(ms):
    year, pos = temporal_bin_year(np.array([ms], dtype=np.int64))
    assert 1970 <= year[0] <= 2100
    assert 0.0 <= pos[0] < 1.0
