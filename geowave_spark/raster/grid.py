"""General raster tiles: arbitrary band count / sample type / nodata,
pluggable merge strategies.

The RGB-uint8 pipeline in ``tiling.py`` mirrors the image+caption brief;
the reference's raster adapter is more general — any band count and
sample type with a per-adapter nodata and a pluggable tile-merge
strategy (RasterDataAdapter.java:245-253 arbitrary SampleModel;
merge/NoDataMergeStrategy.java and the RasterTileMergeStrategy SPI;
float rasters force nearest-neighbor resampling :702-727 so nodata
never interpolates into data).  This module carries that generality:

- :class:`RasterSpec` describes (bands, numpy dtype, nodata value);
  tiles travel as raw bytes of shape (tile_size, tile_size, bands);
- :func:`tile_rasters` assigns arbitrary-dtype rasters to index cells
  (same lattice-gather as the RGB path; resampling is always nearest
  neighbor, which is exactly the reference's forced mode for
  float/double samples);
- :func:`merge_raster_tiles` folds overlapping tiles per (tier, cell)
  with a strategy from :data:`MERGE_STRATEGIES` — ``nodata`` (first
  non-nodata sample wins, deterministic raster_id order — the
  reference's NoDataMergeStrategy), ``last``, ``min``, ``max``, ``mean``
  (running mean over non-nodata samples).  Strategies are an SPI: any
  ``fn(acc, cur, acc_nodata_mask, cur_nodata_mask) -> acc`` registered in the dict.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sfc.tiered import TieredStrategy
from .tiling import _cells_for_envelope, pick_tier

GRID_TILE_SCHEMA = StructType(
    [
        StructField("raster_id", StringType(), False),
        StructField("tier", IntegerType(), False),
        StructField("cell", LongType(), False),
        StructField("tile", BinaryType(), False),
    ]
)

GRID_MERGED_SCHEMA = StructType(
    [
        StructField("tier", IntegerType(), False),
        StructField("cell", LongType(), False),
        StructField("tile", BinaryType(), False),
        StructField("n_sources", IntegerType(), False),
    ]
)


@dataclass(frozen=True)
class RasterSpec:
    """Band layout of a raster table: (bands, numpy dtype name, nodata)."""

    bands: int = 1
    dtype: str = "float32"
    nodata: float = 0.0

    def tile_nbytes(self, tile_size: int) -> int:
        return tile_size * tile_size * self.bands * np.dtype(self.dtype).itemsize

    def to_array(self, raw: bytes, tile_size: int) -> np.ndarray:
        return np.frombuffer(raw, dtype=self.dtype).reshape(
            tile_size, tile_size, self.bands
        )

    def nodata_mask(self, arr: np.ndarray) -> np.ndarray:
        """(H, W) mask of all-band-nodata pixels (NaN-aware)."""
        if np.isnan(self.nodata):
            return np.isnan(arr).all(axis=2)
        return (arr == self.nodata).all(axis=2)


def tile_rasters(
    rasters: DataFrame,
    spec: RasterSpec,
    tile_size: int = 16,
    strategy: TieredStrategy | None = None,
) -> DataFrame:
    """Rows (raster_id, data: binary of (h, w, bands) ``spec.dtype``,
    w, h, lon, lat, res[, res_y]) → GRID_TILE_SCHEMA tile rows.

    Nearest-neighbor lattice gather per raster (one resample per image,
    not per cell), nodata fill outside the footprint — the dtype-generic
    twin of ``tiling.tile_images``.  An optional ``res_y`` column carries
    an anisotropic y resolution (reprojected GeoTIFFs); tier choice uses
    the finer axis so no detail is lost.
    """
    strat = strategy or TieredStrategy()
    ts = tile_size
    nodata = spec.nodata

    def _tiles(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = np.frombuffer(r.data, dtype=spec.dtype).reshape(
                    int(r.h), int(r.w), spec.bands
                )
                res = float(r.res)
                # a null res_y arrives from pandas as NaN (truthy!), so
                # `or res` alone would let NaN through and the floor/int
                # cast below would silently drop the raster's every tile
                res_y = float(getattr(r, "res_y", res) or res)
                if not math.isfinite(res_y) or res_y <= 0.0:
                    res_y = res
                minx, miny = float(r.lon), float(r.lat)
                t = pick_tier(min(res, res_y), ts, strat)
                span_x = strat.dim_x.range / (1 << t)
                span_y = strat.dim_y.range / (1 << t)
                gx, gy, cells = _cells_for_envelope(
                    strat,
                    t,
                    minx,
                    miny,
                    min(minx + px.shape[1] * res, strat.dim_x.max),
                    min(miny + px.shape[0] * res_y, strat.dim_y.max),
                )
                ax, ay = int(gx.min()), int(gy.min())
                ncx = int(gx.max()) - ax + 1
                ncy = int(gy.max()) - ay + 1
                lat_x = strat.dim_x.min + ax * span_x + (np.arange(ncx * ts) + 0.5) * (span_x / ts)
                lat_y = strat.dim_y.min + ay * span_y + (np.arange(ncy * ts) + 0.5) * (span_y / ts)
                sx = np.floor((lat_x - minx) / res).astype(np.int64)
                sy = np.floor((lat_y - miny) / res_y).astype(np.int64)
                h, w = px.shape[:2]
                okx = (sx >= 0) & (sx < w)
                oky = (sy >= 0) & (sy < h)
                lattice = np.full(
                    (ncy * ts, ncx * ts, spec.bands), nodata, dtype=spec.dtype
                )
                if okx.any() and oky.any():
                    sub = px[np.clip(sy, 0, h - 1)[:, None], np.clip(sx, 0, w - 1)[None, :]]
                    mask = oky[:, None] & okx[None, :]
                    lattice[mask] = sub[mask]
                tiles = lattice.reshape(ncy, ts, ncx, ts, spec.bands).transpose(0, 2, 1, 3, 4)
                for ix, iy, c in zip(gx.tolist(), gy.tolist(), cells.tolist()):
                    rows.append(
                        (
                            r.raster_id,
                            t,
                            int(c),
                            np.ascontiguousarray(tiles[iy - ay, ix - ax]).tobytes(),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in GRID_TILE_SCHEMA.fields])

    cols = ["raster_id", "data", "w", "h", "lon", "lat", "res"]
    if "res_y" in rasters.columns:
        cols.append("res_y")
    return rasters.select(*cols).mapInPandas(_tiles, GRID_TILE_SCHEMA)


# ---- merge-strategy SPI ---------------------------------------------------


def _merge_min(acc, cur, acc_nodata, cur_nodata):
    # mask BOTH sides' nodata: a sentinel nodata in the incoming tile
    # (e.g. -9999) must not win fmin over valid accumulated data where
    # tiles partially overlap (round-2 ADVICE) — only NaN nodata was safe
    # before because fmin/fmax skip NaN
    out = np.where(cur_nodata[:, :, None], acc, np.fmin(acc, cur))
    out[acc_nodata] = cur[acc_nodata]
    return out


def _merge_max(acc, cur, acc_nodata, cur_nodata):
    out = np.where(cur_nodata[:, :, None], acc, np.fmax(acc, cur))
    out[acc_nodata] = cur[acc_nodata]
    return out


def _merge_nodata(acc, cur, acc_nodata, cur_nodata):
    # fill acc's nodata only where cur is valid
    fill = acc_nodata & ~cur_nodata
    acc[fill] = cur[fill]
    return acc


def _merge_last(acc, cur, acc_nodata, cur_nodata):
    out = acc.copy()
    out[~cur_nodata] = cur[~cur_nodata]
    return out


MERGE_STRATEGIES = {
    "nodata": _merge_nodata,  # NoDataMergeStrategy.java semantics
    "last": _merge_last,
    "min": _merge_min,
    "max": _merge_max,
}


def merge_raster_tiles(
    tiles: DataFrame,
    spec: RasterSpec,
    tile_size: int = 16,
    strategy: str = "nodata",
) -> DataFrame:
    """Fold overlapping tiles per (tier, cell) with a registered strategy
    (deterministic raster_id order).  ``mean`` averages non-nodata samples
    and is handled natively (needs a count plane, not a binary fold)."""
    ts = tile_size

    if strategy == "mean":

        def _mean(key, pdf):
            acc = np.zeros((ts, ts, spec.bands), dtype=np.float64)
            cnt = np.zeros((ts, ts, 1), dtype=np.int64)
            for raw in pdf["tile"]:
                cur = spec.to_array(raw, ts).astype(np.float64)
                valid = ~spec.nodata_mask(spec.to_array(raw, ts))
                acc[valid] += cur[valid]
                cnt[valid] += 1
            out = np.full((ts, ts, spec.bands), spec.nodata, dtype=np.float64)
            nz = cnt[:, :, 0] > 0
            out[nz] = acc[nz] / cnt[nz]
            return pd.DataFrame(
                {
                    "tier": [key[0]],
                    "cell": [key[1]],
                    "tile": [out.astype(spec.dtype).tobytes()],
                    "n_sources": [len(pdf)],
                }
            )

        return tiles.groupBy("tier", "cell").applyInPandas(_mean, GRID_MERGED_SCHEMA)

    fn = MERGE_STRATEGIES[strategy]

    def _merge(key, pdf):
        pdf = pdf.sort_values("raster_id")
        acc = None
        for raw in pdf["tile"]:
            cur = spec.to_array(raw, ts)
            if acc is None:
                acc = cur.copy()
            else:
                acc = fn(acc, cur, spec.nodata_mask(acc), spec.nodata_mask(cur))
        return pd.DataFrame(
            {
                "tier": [key[0]],
                "cell": [key[1]],
                "tile": [acc.tobytes()],
                "n_sources": [len(pdf)],
            }
        )

    return tiles.groupBy("tier", "cell").applyInPandas(_merge, GRID_MERGED_SCHEMA)


# ---- server merge (persist-time compaction) --------------------------------
#
# The reference applies merge strategies in two places: at read time
# (RasterTileMergeStrategy on the client) and SERVER-side as a k/v-store
# combiner, so that after compaction the store holds ONE pre-merged tile
# per cell and every later read skips the fold entirely
# (SingleAdapterServerMergeStrategy.java; MultiAdapterServerMergeStrategy
# .java dispatches a per-adapter strategy keyed by internal adapter id).
# The Spark-native analog of "server-side" is PERSIST-time: the merged
# table is the compacted store, appends re-fold new tiles into the stored
# accumulator exactly like the combiner's merge(thisTile, nextTile), and
# the strategy is recorded in table properties so a mismatched reader
# raises instead of silently double-merging with different semantics.

_RPROP_STRATEGY = "geowave.raster.strategy"
_RPROP_SPEC = "geowave.raster.spec"
_RPROP_TILE = "geowave.raster.tile_size"


def _spec_fingerprint(spec: RasterSpec) -> str:
    return f"bands={spec.bands}|dtype={spec.dtype}|nodata={spec.nodata!r}"


def server_merge_write(
    tiles: DataFrame,
    table: str,
    spec: RasterSpec,
    *,
    tile_size: int = 16,
    strategy: str = "nodata",
    mode: str = "overwrite",
) -> None:
    """Persist GRID_TILE_SCHEMA rows as a compacted one-tile-per-cell
    table (SingleAdapterServerMergeStrategy semantics).

    ``mode="append"`` folds the new tiles INTO the stored accumulator —
    the stored tile plays ``thisTile`` and each new tile ``nextTile`` in
    raster_id order, matching the reference combiner's write-order merge;
    ``n_sources`` accumulates across compactions.  ``mean`` is rejected
    here by design: the server path is a binary combiner (no count plane
    survives persistence), the same reason the reference's server
    strategies are all SimpleAbstractMergeStrategy folds — use
    :func:`merge_raster_tiles` at read time for running means."""
    if strategy == "mean":
        raise ValueError(
            "mean is not a binary combiner (needs a count plane) — the "
            "server merge path persists pre-folded tiles; use "
            "merge_raster_tiles(strategy='mean') at read time"
        )
    fn = MERGE_STRATEGIES[strategy]
    spark = tiles.sparkSession
    ts = tile_size

    base = tiles.select("raster_id", "tier", "cell", "tile").withColumn(
        "n_sources", F.lit(1).cast("int")
    )
    if mode == "append" and spark.catalog.tableExists(table):
        props = _raster_table_props(spark, table)
        _check_raster_props(props, table, spec, tile_size, strategy)
        # the stored accumulator sorts first (empty raster_id) so the
        # fold order is exactly combiner order: acc, then new by id
        existing = spark.table(table).select(
            F.lit("").alias("raster_id"), "tier", "cell", "tile", "n_sources"
        )
        base = existing.unionByName(base)

    def _fold(key, pdf):
        pdf = pdf.sort_values("raster_id")
        acc = None
        n = 0
        for raw, k in zip(pdf["tile"], pdf["n_sources"]):
            cur = spec.to_array(raw, ts)
            n += int(k)
            if acc is None:
                acc = cur.copy()
            else:
                acc = fn(acc, cur, spec.nodata_mask(acc), spec.nodata_mask(cur))
        return pd.DataFrame(
            {"tier": [key[0]], "cell": [key[1]], "tile": [acc.tobytes()], "n_sources": [n]}
        )

    merged = base.groupBy("tier", "cell").applyInPandas(_fold, GRID_MERGED_SCHEMA)
    from ..sources.bucketing import _clear_stale_location

    if mode == "append" and spark.catalog.tableExists(table):
        # the fold READS the table being replaced — write the compacted
        # result to a staging table first (distributed, never collected),
        # then swap via catalog rename: the same write-ahead + pointer
        # flip a real compactor does, metadata-only at any scale
        staging = f"{table}__compact"
        _clear_stale_location(spark, staging)
        merged.write.format("parquet").saveAsTable(staging)
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    else:
        _clear_stale_location(spark, table)
        merged.write.format("parquet").saveAsTable(table)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'{_RPROP_STRATEGY}'='{strategy}', "
        f"'{_RPROP_SPEC}'='{_spec_fingerprint(spec)}', "
        f"'{_RPROP_TILE}'='{tile_size}')"
    )


def _raster_table_props(spark, table: str) -> dict:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    return {r["key"]: r["value"] for r in rows}


def _check_raster_props(props, table, spec, tile_size, strategy=None):
    if _RPROP_STRATEGY not in props:
        raise ValueError(
            f"{table} was not written by server_merge_write "
            f"(missing {_RPROP_STRATEGY} property)"
        )
    if props[_RPROP_SPEC] != _spec_fingerprint(spec) or int(
        props[_RPROP_TILE]
    ) != tile_size:
        raise ValueError(
            f"{table} holds tiles of [{props[_RPROP_SPEC]} @ "
            f"{props[_RPROP_TILE]}px] but the caller passed "
            f"[{_spec_fingerprint(spec)} @ {tile_size}px]"
        )
    if strategy is not None and props[_RPROP_STRATEGY] != strategy:
        raise ValueError(
            f"{table} was compacted with strategy "
            f"{props[_RPROP_STRATEGY]!r}; appending with {strategy!r} "
            f"would mix merge semantics in one store"
        )


def server_merged_read(
    spark, table: str, spec: RasterSpec, tile_size: int = 16
) -> DataFrame:
    """The compacted table's rows, after verifying the recorded spec —
    no client-side fold needed (that already happened at write time)."""
    _check_raster_props(_raster_table_props(spark, table), table, spec, tile_size)
    return spark.table(table)


def merge_multi_adapter(
    tiles: DataFrame,
    adapters: dict[str, tuple[RasterSpec, str]],
    tile_size: int = 16,
) -> DataFrame:
    """Merge a MIXED tile table carrying an ``adapter_id`` column, each
    adapter with its own (spec, strategy) — MultiAdapterServerMergeStrategy
    semantics (per-adapter strategy dispatch under one store/scan).

    One applyInPandas over (adapter_id, tier, cell); the group key picks
    the adapter's strategy, so co-located adapters never cross-merge."""
    ts = tile_size
    out_schema = StructType(
        [StructField("adapter_id", StringType(), False)]
        + GRID_MERGED_SCHEMA.fields
    )
    for aid, (spec, strategy) in adapters.items():
        if strategy not in MERGE_STRATEGIES and strategy != "mean":
            raise ValueError(f"unknown strategy {strategy!r} for adapter {aid!r}")

    def _fold(key, pdf):
        aid = key[0]
        if aid not in adapters:
            raise ValueError(f"tile rows carry unregistered adapter_id {aid!r}")
        spec, strategy = adapters[aid]
        pdf = pdf.sort_values("raster_id")
        if strategy == "mean":
            acc = np.zeros((ts, ts, spec.bands), dtype=np.float64)
            cnt = np.zeros((ts, ts, 1), dtype=np.int64)
            for raw in pdf["tile"]:
                cur = spec.to_array(raw, ts).astype(np.float64)
                valid = ~spec.nodata_mask(spec.to_array(raw, ts))
                acc[valid] += cur[valid]
                cnt[valid] += 1
            out = np.full((ts, ts, spec.bands), spec.nodata, dtype=np.float64)
            nz = cnt[:, :, 0] > 0
            out[nz] = acc[nz] / cnt[nz]
            tile = out.astype(spec.dtype).tobytes()
        else:
            fn = MERGE_STRATEGIES[strategy]
            acc = None
            for raw in pdf["tile"]:
                cur = spec.to_array(raw, ts)
                if acc is None:
                    acc = cur.copy()
                else:
                    acc = fn(acc, cur, spec.nodata_mask(acc), spec.nodata_mask(cur))
            tile = acc.tobytes()
        return pd.DataFrame(
            {
                "adapter_id": [aid],
                "tier": [key[1]],
                "cell": [key[2]],
                "tile": [tile],
                "n_sources": [len(pdf)],
            }
        )

    return tiles.groupBy("adapter_id", "tier", "cell").applyInPandas(
        _fold, out_schema
    )
