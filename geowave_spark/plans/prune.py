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


def st_cell_predicate(
    strategy,
    bbox: tuple[float, float, float, float],
    t0,
    t1,
    indexed_tier: int | None = None,
    year_col: str = "year",
    tier_col: str = "tier",
    cell_col: str = "cell",
    max_ranges: int = 128,
) -> Column:
    """Coarse spatial-temporal predicate over (year, tier, cell) columns.

    ``strategy`` is a
    :class:`~geowave_spark.sfc.spatial_temporal.SpatialTemporalStrategy`;
    ``t0``/``t1`` are naive timestamps (str/np.datetime64).  Decomposed
    Morton ranges (which live at the decomposition tier) are re-scaled to
    ``indexed_tier`` (default: the strategy's top tier, where point rows
    are indexed) by the Z-order prefix property — a range [lo, hi] at tier
    t covers top-tier ids [lo<<3Δ, ((hi+1)<<3Δ)-1], the exact analog of a
    sort-key prefix range scan in the reference's key/value layout.
    """
    import numpy as np

    minx, miny, maxx, maxy = bbox
    t0_ms = int(np.datetime64(t0).astype("datetime64[ms]").astype(np.int64))
    t1_ms = int(np.datetime64(t1).astype("datetime64[ms]").astype(np.int64))
    idx_t = strategy.max_bits if indexed_tier is None else int(indexed_tier)
    parts = strategy.decompose(minx, miny, maxx, maxy, t0_ms, t1_ms, max_ranges=max_ranges)
    conds = []
    for year, t, ranges in parts:
        d = 3 * (idx_t - t)
        scaled = [((lo << d), (((hi + 1) << d) - 1)) for lo, hi in ranges]
        rc = reduce(
            lambda a, b: a | b,
            [F.col(cell_col).between(int(lo), int(hi)) for lo, hi in scaled],
        )
        conds.append((F.col(year_col) == int(year)) & rc)
    return (F.col(tier_col) == idx_t) & reduce(lambda a, b: a | b, conds)


def pruned_spatiotemporal_scan(
    indexed: DataFrame,
    strategy,
    bbox: tuple[float, float, float, float],
    t0,
    t1,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    loose: bool = False,
    max_ranges: int = 128,
) -> DataFrame:
    """"This bbox, this time window" — the spatial-temporal gated query.

    Coarse (year, cell-range) prune + exact fine filter
    (``lon/lat`` in bbox AND ``t0 <= ts < t1``); ``loose`` skips the fine
    stage (IndexOnlySpatialQuery semantics).  The reference's second
    default index query path (SpatialTemporalDimensionalityTypeProvider +
    TemporalBinningStrategy.getQueryRanges).
    """
    minx, miny, maxx, maxy = bbox
    out = indexed.where(st_cell_predicate(strategy, bbox, t0, t1, max_ranges=max_ranges))
    if loose:
        return out
    return out.where(
        (F.col(lon) >= minx)
        & (F.col(lon) <= maxx)
        & (F.col(lat) >= miny)
        & (F.col(lat) <= maxy)
        & (F.col(ts) >= F.lit(t0))
        & (F.col(ts) < F.lit(t1))
    )


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
