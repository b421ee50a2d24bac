"""Cross-CRS pixel resampling on mosaic read (raster warp).

The reference resamples stored tiles into the CRS/grid a read requests:
GeoWaveRasterReader.java:492-744 builds the requested-envelope mosaic and
RasterDataAdapter.java:444-550 reprojects coverages between the index CRS
and the query CRS.  Here the same read is a Spark job:

* the requested output grid is split into fixed-size output BLOCKS
  (one row per block — the unit of parallelism),
* each block's footprint is inverse-projected (densified 5×5 sample
  lattice, curvature-safe) into the index CRS to find the covering
  (tier, cell) tiles — a broadcast equi-join against the merged tile
  table, i.e. the same cell-prune a plain mosaic read uses, never a
  scan,
* one ``applyInPandas`` per block assembles its local source lattice and
  samples it at the inverse-projected output pixel centers — nearest or
  bilinear (bilinear falls back to nearest where a neighbor is nodata,
  and to nodata where coverage ends).

Rows are south-up (row 0 = southmost) like every tile in the engine.
At 100 TB the work is proportional to the OUTPUT size (blocks × one
small join), not the stored raster size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)

from ..crs import transform_np
from ..sfc.hilbert import hilbert_to_xy
from .grid import RasterSpec
from .tiling import TieredStrategy, _cells_for_envelope

WARP_SCHEMA = StructType(
    [
        StructField("bx", IntegerType(), False),
        StructField("by", IntegerType(), False),
        StructField("bw", IntegerType(), False),
        StructField("bh", IntegerType(), False),
        StructField("block", BinaryType(), False),
    ]
)


def _block_cells(
    strat: TieredStrategy,
    tier: int,
    out_bbox: tuple[float, float, float, float],
    out_size: tuple[int, int],
    out_crs: str,
    index_crs: str,
    block_size: int,
    tile_size: int,
):
    """Driver-side plan: (block_id, bx, by, cell) pairs for every output
    block × covering index cell."""
    x0, y0, x1, y1 = out_bbox
    ow, oh = out_size
    resx = (x1 - x0) / ow
    resy = (y1 - y0) / oh
    span_x = strat.dim_x.range / (1 << tier)
    span_y = strat.dim_y.range / (1 << tier)
    # one source pixel of margin so bilinear neighbors are present
    mx = span_x / tile_size
    my = span_y / tile_size
    rows = []
    nbx = -(-ow // block_size)
    nby = -(-oh // block_size)
    lat = np.linspace(0.0, 1.0, 5)
    # pole points in out_crs (where representable): a block whose bbox
    # contains a projected pole ENCIRCLES it, and the 5×5 boundary
    # lattice then undercovers the lat envelope (measured: a 400 km
    # EPSG:3413 window over the north pole left the pole-adjacent 1.25%
    # of pixels nodata with sources present) — extend such blocks'
    # envelopes to the pole itself
    poles = []
    for plat in (strat.dim_y.max, strat.dim_y.min):
        try:
            ppx, ppy = transform_np(
                np.array([0.0]), np.array([plat]), index_crs, out_crs
            )
            if np.isfinite(ppx[0]) and np.isfinite(ppy[0]):
                poles.append((float(ppx[0]), float(ppy[0]), float(plat)))
        except Exception:
            pass
    for byi in range(nby):
        for bxi in range(nbx):
            px0, px1 = bxi * block_size, min((bxi + 1) * block_size, ow)
            py0, py1 = byi * block_size, min((byi + 1) * block_size, oh)
            # densified 5×5 lattice over the block footprint in out_crs
            gx = x0 + (px0 + (px1 - px0) * lat) * resx
            gy = y0 + (py0 + (py1 - py0) * lat) * resy
            xs, ys = np.meshgrid(gx, gy)
            lon, lat2 = transform_np(xs.ravel(), ys.ravel(), out_crs, index_crs)
            # out-of-domain inverse projections (block corners beyond the
            # CRS's valid region) come back non-finite; one NaN must not
            # poison the envelope (NaN min/max → block silently skipped)
            fin = np.isfinite(lon) & np.isfinite(lat2)
            if not fin.any():
                continue  # block entirely outside the projection domain
            lo_min, lo_max = float(lon[fin].min()), float(lon[fin].max())
            la_min, la_max = float(lat2[fin].min()), float(lat2[fin].max())
            for ppx, ppy, plat in poles:
                if min(gx) <= ppx <= max(gx) and min(gy) <= ppy <= max(gy):
                    la_min, la_max = min(la_min, plat), max(la_max, plat)
                    lo_min, lo_max = strat.dim_x.min, strat.dim_x.max
            if lo_max - lo_min > 180.0:
                # wrap-around footprint (antimeridian seam): the sampled
                # min/max already spans most of the lon range — gather it
                # fully (superset; per-pixel sampling stays exact)
                lo_min, lo_max = strat.dim_x.min, strat.dim_x.max
            env = (
                max(lo_min - mx, strat.dim_x.min),
                max(la_min - my, strat.dim_y.min),
                min(lo_max + mx, strat.dim_x.max),
                min(la_max + my, strat.dim_y.max),
            )
            if env[0] >= env[2] or env[1] >= env[3]:
                continue
            _, _, cells = _cells_for_envelope(strat, tier, *env)
            bid = byi * nbx + bxi
            for c in np.unique(cells).tolist():
                rows.append((bid, bxi, byi, int(c)))
    return rows


def warp_mosaic(
    merged: DataFrame,
    tier: int,
    out_bbox: tuple[float, float, float, float],
    out_size: tuple[int, int],
    out_crs: str,
    spec: RasterSpec | None = None,
    tile_size: int = 16,
    index_crs: str = "EPSG:4326",
    method: str = "bilinear",
    block_size: int = 64,
    strategy: TieredStrategy | None = None,
) -> DataFrame:
    """Merged (tier, cell, tile) table → resampled output blocks in
    ``out_crs``.

    ``out_bbox`` = (x0, y0, x1, y1) in out_crs units, ``out_size`` =
    (width, height) pixels.  Returns WARP_SCHEMA rows; blocks entirely
    outside coverage are absent (assemble with
    :func:`warp_mosaic_array` to get a nodata-filled grid).
    """
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resampling method {method!r}")
    spec = spec or RasterSpec(bands=3, dtype="uint8", nodata=0.0)
    strat = strategy or TieredStrategy()
    plan = _block_cells(
        strat, tier, out_bbox, out_size, out_crs, index_crs, block_size, tile_size
    )
    spark = merged.sparkSession
    pos = spark.createDataFrame(
        pd.DataFrame(plan, columns=["bid", "bx", "by", "cell"])
        if plan
        else pd.DataFrame({"bid": pd.Series(dtype="int64"), "bx": pd.Series(dtype="int64"),
                           "by": pd.Series(dtype="int64"), "cell": pd.Series(dtype="int64")})
    )
    joined = (
        merged.where(F.col("tier") == F.lit(tier))
        .join(F.broadcast(pos), "cell")
        .select("bid", "bx", "by", "cell", "tile")
    )

    x0, y0, x1, y1 = out_bbox
    ow, oh = out_size
    resx = (x1 - x0) / ow
    resy = (y1 - y0) / oh
    span_x = strat.dim_x.range / (1 << tier)
    span_y = strat.dim_y.range / (1 << tier)
    src_rx = span_x / tile_size
    src_ry = span_y / tile_size
    dminx, dminy = strat.dim_x.min, strat.dim_y.min
    ts = tile_size
    bands = spec.bands
    dtype = spec.dtype
    nodata = spec.nodata
    bilinear = method == "bilinear"
    bs = block_size

    def _warp(key, pdf):
        bid = int(key[0])
        bxi, byi = int(pdf["bx"].iloc[0]), int(pdf["by"].iloc[0])
        px0, px1 = bxi * bs, min((bxi + 1) * bs, ow)
        py0, py1 = byi * bs, min((byi + 1) * bs, oh)
        bw_, bh_ = px1 - px0, py1 - py0
        # local source lattice from this block's tiles
        cells = pdf["cell"].to_numpy(dtype=np.uint64)
        if tier > 0:
            ix, iy = hilbert_to_xy(cells, tier)
        else:
            ix = np.zeros(len(cells), dtype=np.int64)
            iy = np.zeros(len(cells), dtype=np.int64)
        ax, ay = int(ix.min()), int(iy.min())
        ncx = int(ix.max()) - ax + 1
        ncy = int(iy.max()) - ay + 1
        lattice = np.full((ncy * ts, ncx * ts, bands), nodata, dtype=dtype)
        for k, raw in enumerate(pdf["tile"]):
            t_ = np.frombuffer(raw, dtype=dtype).reshape(ts, ts, bands)
            ly = (int(iy[k]) - ay) * ts
            lx = (int(ix[k]) - ax) * ts
            lattice[ly : ly + ts, lx : lx + ts] = t_
        lminx = dminx + (ax * ts) * src_rx
        lminy = dminy + (ay * ts) * src_ry
        # output pixel centers (south-up) → index CRS
        cx = x0 + (np.arange(px0, px1) + 0.5) * resx
        cy = y0 + (np.arange(py0, py1) + 0.5) * resy
        gx, gy = np.meshgrid(cx, cy)
        lon, lat2 = transform_np(gx.ravel(), gy.ravel(), out_crs, index_crs)
        fx = (lon - lminx) / src_rx - 0.5
        fy = (lat2 - lminy) / src_ry - 0.5
        H, W = lattice.shape[:2]
        out = np.full((bh_ * bw_, bands), nodata, dtype=np.float64)
        nearest_x = np.round(fx).astype(np.int64)
        nearest_y = np.round(fy).astype(np.int64)
        inside = (nearest_x >= 0) & (nearest_x < W) & (nearest_y >= 0) & (nearest_y < H)
        ncl_x = np.clip(nearest_x, 0, W - 1)
        ncl_y = np.clip(nearest_y, 0, H - 1)
        nval = lattice[ncl_y, ncl_x].astype(np.float64)
        nmask = spec.nodata_mask(lattice)[ncl_y, ncl_x]
        if bilinear:
            ix0 = np.floor(fx).astype(np.int64)
            iy0 = np.floor(fy).astype(np.int64)
            tx = fx - ix0
            ty = fy - iy0
            ok = (ix0 >= 0) & (ix0 + 1 < W) & (iy0 >= 0) & (iy0 + 1 < H)
            ic0 = np.clip(ix0, 0, W - 1)
            ic1 = np.clip(ix0 + 1, 0, W - 1)
            jc0 = np.clip(iy0, 0, H - 1)
            jc1 = np.clip(iy0 + 1, 0, H - 1)
            v00 = lattice[jc0, ic0].astype(np.float64)
            v01 = lattice[jc0, ic1].astype(np.float64)
            v10 = lattice[jc1, ic0].astype(np.float64)
            v11 = lattice[jc1, ic1].astype(np.float64)
            nd = spec.nodata_mask(lattice)
            any_nd = nd[jc0, ic0] | nd[jc0, ic1] | nd[jc1, ic0] | nd[jc1, ic1]
            w00 = (1 - tx) * (1 - ty)
            w01 = tx * (1 - ty)
            w10 = (1 - tx) * ty
            w11 = tx * ty
            bval = (
                v00 * w00[:, None]
                + v01 * w01[:, None]
                + v10 * w10[:, None]
                + v11 * w11[:, None]
            )
            use_bi = ok & ~any_nd
            out[use_bi] = bval[use_bi]
            fallback = inside & ~use_bi & ~nmask
            out[fallback] = nval[fallback]
        else:
            keep = inside & ~nmask
            out[keep] = nval[keep]
        if np.issubdtype(np.dtype(dtype), np.integer):
            out = np.clip(np.round(out), np.iinfo(dtype).min, np.iinfo(dtype).max)
        block = out.astype(dtype).reshape(bh_, bw_, bands)
        return pd.DataFrame(
            {
                "bx": [bxi],
                "by": [byi],
                "bw": [bw_],
                "bh": [bh_],
                "block": [block.tobytes()],
            }
        )

    return joined.groupBy("bid").applyInPandas(_warp, WARP_SCHEMA)


def warp_mosaic_array(
    merged: DataFrame,
    tier: int,
    out_bbox: tuple[float, float, float, float],
    out_size: tuple[int, int],
    out_crs: str,
    spec: RasterSpec | None = None,
    **kw,
) -> np.ndarray:
    """Driver-side assembly of :func:`warp_mosaic` for tests/rendering:
    (H, W, bands) in ``spec`` dtype, nodata-filled outside coverage,
    row 0 = south."""
    spec = spec or RasterSpec(bands=3, dtype="uint8", nodata=0.0)
    ow, oh = out_size
    bs = kw.get("block_size", 64)
    out = np.full((oh, ow, spec.bands), spec.nodata, dtype=spec.dtype)
    for r in warp_mosaic(merged, tier, out_bbox, out_size, out_crs, spec, **kw).collect():
        blk = np.frombuffer(r["block"], dtype=spec.dtype).reshape(
            r["bh"], r["bw"], spec.bands
        )
        y0 = r["by"] * bs
        x0 = r["bx"] * bs
        out[y0 : y0 + r["bh"], x0 : x0 + r["bw"]] = blk
    return out
