"""DataFrame cell-indexing transforms (the engine's encode stage).

The DataFrame analog of GeoWave's GeoWaveIndexedRDD.getIndexedGeometryRDD
(analytics/spark/.../GeoWaveIndexedRDD.java:148-223): map each entity to its
tiered-SFC insertion ids and explode to one row per (tier, cell).  All
heavy math runs as Arrow-batched pandas UDFs over numpy (no per-row
Python), and the rest of the plan stays in Catalyst so column pruning and
predicate pushdown keep working.

Key layout on the DataFrame side:
  tier: int   — bits of precision (partition-key first byte in the reference)
  cell: long  — Hilbert index at that tier (sort key in the reference)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .geom import cell_rect_intersects_polygon, parse_wkt, polygon_envelope
from .sfc import TieredStrategy
from .sfc.geohash import geohash_encode
from .sfc.hilbert import hilbert_to_xy

DEFAULT_STRATEGY = TieredStrategy()

_INS_SCHEMA = ArrayType(
    StructType(
        [StructField("tier", IntegerType()), StructField("cell", LongType())]
    )
)


def point_cell_udf(strategy: TieredStrategy = DEFAULT_STRATEGY):
    """Pandas UDF: (lon, lat) → top-tier Hilbert cell id (long)."""

    @F.pandas_udf(LongType())
    def _cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
        c = strategy.point_cells(lon.to_numpy(np.float64), lat.to_numpy(np.float64))
        return pd.Series(c.astype(np.int64))

    return _cell


def geohash_udf(precision: int = 7):
    """Pandas UDF: (lon, lat) → geohash string (spatial binning)."""

    @F.pandas_udf(StringType())
    def _gh(lon: pd.Series, lat: pd.Series) -> pd.Series:
        g = geohash_encode(lon.to_numpy(np.float64), lat.to_numpy(np.float64), precision)
        return pd.Series(g)

    return _gh


def with_point_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    cell_col: str = "cell",
    tier_col: str = "tier",
) -> DataFrame:
    """Add (tier, cell) for point rows — single id at the top tier
    (TieredSFCIndexStrategy point fast path)."""
    return df.withColumn(cell_col, point_cell_udf(strategy)(F.col(lon), F.col(lat))).withColumn(
        tier_col, F.lit(strategy.max_bits)
    )


def envelope_cells_udf(
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    max_duplicates: int = 4,
):
    """Pandas UDF: envelope (minx,miny,maxx,maxy) → array<struct<tier,cell>>."""

    @F.pandas_udf(_INS_SCHEMA)
    def _ins(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        row, tier, cell = strategy.envelope_insertion_ids(
            minx.to_numpy(np.float64),
            miny.to_numpy(np.float64),
            maxx.to_numpy(np.float64),
            maxy.to_numpy(np.float64),
            max_duplicates=max_duplicates,
        )
        n = len(minx)
        out: list[list[dict]] = [[] for _ in range(n)]
        for r, t, c in zip(row.tolist(), tier.tolist(), cell.tolist()):
            out[r].append({"tier": int(t), "cell": int(c)})
        return pd.Series(out)

    return _ins


def with_envelope_cells(
    df: DataFrame,
    minx: Column,
    miny: Column,
    maxx: Column,
    maxy: Column,
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    max_duplicates: int = 4,
) -> DataFrame:
    """Explode each row into its insertion cells: one row per (tier, cell)."""
    ins = envelope_cells_udf(strategy, max_duplicates)(minx, miny, maxx, maxy)
    return (
        df.withColumn("_ins", F.explode(ins))
        .withColumn("tier", F.col("_ins.tier"))
        .withColumn("cell", F.col("_ins.cell"))
        .drop("_ins")
    )


def polygon_cells_udf(
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    max_duplicates: int = 4,
    buffer: float = 0.0,
    trim: bool = True,
):
    """Pandas UDF: WKT polygon → array<struct<tier,cell>> with cell trimming.

    Trimming mirrors RDDUtils.trimIndexIds (RDDUtils.java:158-184): when an
    entity received more than 3 cells, drop cells whose rectangle does not
    intersect the (buffered) geometry — fewer join candidates, same result
    after the exact post-filter.
    """

    @F.pandas_udf(_INS_SCHEMA)
    def _ins(wkt: pd.Series) -> pd.Series:
        n = len(wkt)
        polys = [parse_wkt(w)[1] for w in wkt]
        env = np.array([polygon_envelope(p) for p in polys], dtype=np.float64)
        row, tier, cell = strategy.envelope_insertion_ids(
            env[:, 0] - buffer,
            env[:, 1] - buffer,
            env[:, 2] + buffer,
            env[:, 3] + buffer,
            max_duplicates=max_duplicates,
        )
        out: list[list[dict]] = [[] for _ in range(n)]
        if len(row):
            keep = np.ones(len(row), dtype=bool)
            if trim:
                counts = np.bincount(row, minlength=n)
                for i in np.nonzero(counts > 3)[0]:
                    m = row == i
                    t = int(tier[m][0])
                    if t == 0:
                        continue
                    cx, cy = hilbert_to_xy(cell[m].astype(np.uint64), t)
                    span_x = strategy.dim_x.range / (1 << t)
                    span_y = strategy.dim_y.range / (1 << t)
                    rminx = strategy.dim_x.min + cx.astype(np.float64) * span_x - buffer
                    rminy = strategy.dim_y.min + cy.astype(np.float64) * span_y - buffer
                    hit = cell_rect_intersects_polygon(
                        rminx, rminy, rminx + span_x + 2 * buffer, rminy + span_y + 2 * buffer, polys[i]
                    )
                    keep[np.nonzero(m)[0][~hit]] = False
            for r, t, c in zip(row[keep].tolist(), tier[keep].tolist(), cell[keep].tolist()):
                out[r].append({"tier": int(t), "cell": int(c)})
        return pd.Series(out)

    return _ins


def with_polygon_cells(
    df: DataFrame,
    wkt_col: str = "wkt",
    strategy: TieredStrategy = DEFAULT_STRATEGY,
    max_duplicates: int = 4,
    buffer: float = 0.0,
    trim: bool = True,
) -> DataFrame:
    ins = polygon_cells_udf(strategy, max_duplicates, buffer, trim)(F.col(wkt_col))
    return (
        df.withColumn("_ins", F.explode(ins))
        .withColumn("tier", F.col("_ins.tier"))
        .withColumn("cell", F.col("_ins.cell"))
        .drop("_ins")
    )


def cell_at_tier(top_cell: str, tier: str, max_bits: int = 31) -> Column:
    """Re-project a top-tier point cell to a coarser tier — pure Catalyst.

    Hilbert hierarchy makes tier re-projection a bit shift (2 bits/tier in
    2-D), the cheap analog of TieredSpatialJoin.reprojectToTier
    (TieredSpatialJoin.java:471-511) with no geometry re-encode.
    ``top_cell`` / ``tier`` are column names (SQL expression under the hood
    because the shift amount is itself a column).
    """
    return F.expr(
        f"CASE WHEN {tier} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE shiftrightunsigned({top_cell}, CAST(2 * ({max_bits} - {tier}) AS INT)) END"
    )
