"""Space-filling-curve index kernel (pure numpy, no Spark dependency)."""

from .dimensions import LATITUDE, LATITUDE_SQUARE, LONGITUDE, Dimension, split_dateline, temporal_bin_year
from .geohash import geohash_encode
from .h3hex import hex_cell_id, hex_cell_unpack
from .hierarchical import KIND_EXTENT, KIND_POINT, XZHierarchicalStrategy
from .hilbert import hilbert_to_xy, truncate_to_tier, xy_to_hilbert
from .spatial_temporal import (
    DEFAULT_ST_STRATEGY,
    SpatialTemporalStrategy,
    morton_to_xyz,
    xyz_to_morton,
)
from .tiered import (
    DEFAULT_MAX_DUPLICATES,
    JOIN_MAX_DUPLICATES,
    TieredStrategy,
)
from .xz import xz_encode, xz_query_ranges
from .zorder import xy_to_zorder, zorder_to_xy

__all__ = [
    "Dimension",
    "LATITUDE",
    "LATITUDE_SQUARE",
    "LONGITUDE",
    "split_dateline",
    "temporal_bin_year",
    "geohash_encode",
    "hex_cell_id",
    "XZHierarchicalStrategy",
    "KIND_POINT",
    "KIND_EXTENT",
    "hex_cell_unpack",
    "xy_to_hilbert",
    "hilbert_to_xy",
    "truncate_to_tier",
    "xy_to_zorder",
    "zorder_to_xy",
    "xz_encode",
    "xz_query_ranges",
    "TieredStrategy",
    "SpatialTemporalStrategy",
    "DEFAULT_ST_STRATEGY",
    "xyz_to_morton",
    "morton_to_xyz",
    "DEFAULT_MAX_DUPLICATES",
    "JOIN_MAX_DUPLICATES",
]
