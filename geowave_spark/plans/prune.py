"""BBox → cell-range pruning predicates (coarse/fine query lifecycle).

Re-expression of GeoWave's query decomposition (SURVEY.md §3.1 steps 4-6:
TieredSFCIndexStrategy.getQueryRanges → range scan → exact client filter):
the bbox decomposes to Hilbert ranges at one tier; those become a Catalyst
``(tier = t AND (cell BETWEEN lo AND hi OR ...))`` predicate that parquet/
Iceberg min-max statistics prune on, followed by the exact lon/lat fine
filter.  The decomposition is capped (max_ranges) exactly like the
reference's bounded backtracking (PrimitiveHilbertSFCOperations.java:47).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sfc.tiered import TieredStrategy


def bbox_cell_predicate(
    strategy: TieredStrategy,
    bbox: tuple[float, float, float, float],
    tier: int,
    tier_col: str = "tier",
    cell_col: str = "cell",
    max_ranges: int = 64,
) -> Column:
    """Coarse predicate: cell within any decomposed range at the tier."""
    minx, miny, maxx, maxy = bbox
    t, ranges = strategy.decompose_bbox(minx, miny, maxx, maxy, tier=tier, max_ranges=max_ranges)
    cond = reduce(
        lambda a, b: a | b,
        [F.col(cell_col).between(int(lo), int(hi)) for lo, hi in ranges],
    )
    return (F.col(tier_col) == t) & cond


def pruned_bbox_scan(
    indexed: DataFrame,
    strategy: TieredStrategy,
    bbox: tuple[float, float, float, float],
    tier: int,
    lon: str = "lon",
    lat: str = "lat",
    loose: bool = False,
    max_ranges: int = 64,
) -> DataFrame:
    """Coarse range prune + exact fine filter (IndexOnlySpatialQuery when
    ``loose`` — skip the fine stage, accept everything in matching cells)."""
    minx, miny, maxx, maxy = bbox
    out = indexed.where(bbox_cell_predicate(strategy, bbox, tier, max_ranges=max_ranges))
    if loose:
        return out
    return out.where(
        (F.col(lon) >= minx) & (F.col(lon) <= maxx) & (F.col(lat) >= miny) & (F.col(lat) <= maxy)
    )
