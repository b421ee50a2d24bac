"""Baseline GeoTIFF reader (public TIFF 6.0 + GeoTIFF spec subset).

The reference ingests GeoTIFF through GDAL (extensions/formats/geotools-
raster / gdal); no raster codec library exists in this environment, so
this module parses the baseline subset from scratch: classic (non-Big)
TIFF, either endianness, uncompressed strips (Compression=1), uint8 /
uint16 / int16 / float32 / float64 samples, chunky planar config, and
the two GeoTIFF placement tags that cover axis-aligned rasters —
ModelPixelScale (33550) + ModelTiepoint (33922).  Tiled, compressed, or
palette TIFFs raise with a clear message (honest partial, like the
multimodal codec stubs).

``read_geotiffs`` loads a directory/glob of .tif files into rows
matching :func:`geowave_spark.raster.grid.tile_rasters` input
(raster_id, data, w, h, lon, lat, res), decoding on executors via
``binaryFile``.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_SAMPLE_DTYPES = {
    (1, 8): "u1",
    (1, 16): "u2",
    (2, 16): "i2",
    (3, 32): "f4",
    (3, 64): "f8",
}


def parse_geotiff(raw: bytes) -> tuple[np.ndarray, dict]:
    """bytes → ((h, w, bands) array, meta with scale/tiepoint)."""
    bo = {b"II": "<", b"MM": ">"}.get(raw[:2])
    if bo is None or struct.unpack(bo + "H", raw[2:4])[0] != 42:
        raise ValueError("not a classic TIFF")
    (ifd_off,) = struct.unpack(bo + "I", raw[4:8])
    (n_tags,) = struct.unpack(bo + "H", raw[ifd_off : ifd_off + 2])
    tags: dict[int, tuple] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
    type_fmt = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack(bo + "HHI", raw[off : off + 8])
        size = type_size.get(ttype, 1) * count
        if size <= 4:
            val_raw = raw[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", raw[off + 8 : off + 12])
            val_raw = raw[voff : voff + size]
        if ttype in type_fmt:
            vals = struct.unpack(bo + type_fmt[ttype] * count, val_raw)
        elif ttype == 5:  # rational
            nums = struct.unpack(bo + "I" * (2 * count), val_raw)
            vals = tuple(nums[2 * j] / nums[2 * j + 1] for j in range(count))
        else:
            vals = (val_raw,)
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    if one(259, 1) != 1:
        raise ValueError("only uncompressed (Compression=1) GeoTIFF supported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported (strip layout only)")
    w, h = int(one(256)), int(one(257))
    spp = int(one(277, 1))
    bits = tags.get(258, (8,) * spp)[0]
    sfmt = int(one(339, 1))
    key = (sfmt, int(bits))
    if key not in _SAMPLE_DTYPES:
        raise ValueError(f"unsupported sample format/bits {key}")
    dtype = np.dtype(bo + _SAMPLE_DTYPES[key])
    if int(one(284, 1)) != 1:
        raise ValueError("planar configuration 2 not supported")
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = int(one(278, h))
    data = np.empty((h, w, spp), dtype=dtype.newbyteorder("="))
    row = 0
    for soff, scnt in zip(offsets, counts):
        strip = np.frombuffer(raw, dtype=dtype, count=scnt // dtype.itemsize, offset=soff)
        nrows = min(rows_per_strip, h - row)
        data[row : row + nrows] = strip.reshape(nrows, w, spp)
        row += nrows
    meta = {"width": w, "height": h, "bands": spp, "dtype": data.dtype.name}
    if 33550 in tags:
        meta["pixel_scale"] = tags[33550][:3]
    if 33922 in tags:
        tp = tags[33922]
        meta["tiepoint"] = tp[:6]
        # ModelTiepoint maps raster (I, J) = (tp[0], tp[1]) to model
        # (X, Y) = (tp[3], tp[4]); the model position of raster (0, 0) is
        # therefore offset by the tiepoint's raster coords × pixel scale
        # (round-2 ADVICE: a non-(0,0) anchor was silently mis-georeferenced).
        # GeoTIFF model Y decreases with raster row for north-up rasters,
        # but this engine's writer/reader convention is row-0 = miny (Y
        # increases with row), so the J offset subtracts like I.
        if tp[0] != 0.0 or tp[1] != 0.0:
            if 33550 not in tags:
                raise ValueError(
                    "GeoTIFF tiepoint anchored off (0,0) needs ModelPixelScale"
                )
            sx, sy = tags[33550][0], tags[33550][1]
            meta["origin"] = (tp[3] - tp[0] * sx, tp[4] - tp[1] * sy)
        else:
            meta["origin"] = (tp[3], tp[4])
    return data, meta


def write_geotiff(path: str, data: np.ndarray, origin: tuple[float, float], res: float) -> None:
    """Minimal little-endian uncompressed GeoTIFF writer (one strip) —
    for tests and round-trips."""
    h, w, spp = data.shape
    dt = data.dtype
    sfmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    px = np.ascontiguousarray(data.astype(dt.newbyteorder("<"))).tobytes()
    entries = []  # (tag, type, count, value_bytes_or_int)
    # data layout: header(8) + pixel data, IFD after pixels
    pix_off = 8
    ifd_off = pix_off + len(px)

    extra: list[bytes] = []
    extra_off = [0]  # patched later

    def ent(tag, ttype, count, packed=None, value=None):
        entries.append((tag, ttype, count, packed, value))

    ent(256, 4, 1, value=w)
    ent(257, 4, 1, value=h)
    ent(258, 3, spp, packed=struct.pack("<" + "H" * spp, *([bits] * spp)))
    ent(259, 3, 1, value=1)
    ent(262, 3, 1, value=1)
    ent(273, 4, 1, value=pix_off)
    ent(277, 3, 1, value=spp)
    ent(278, 4, 1, value=h)
    ent(279, 4, 1, value=len(px))
    ent(284, 3, 1, value=1)
    ent(339, 3, spp, packed=struct.pack("<" + "H" * spp, *([sfmt] * spp)))
    ent(33550, 12, 3, packed=struct.pack("<3d", res, res, 0.0))
    ent(33922, 12, 6, packed=struct.pack("<6d", 0, 0, 0, origin[0], origin[1], 0))
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    entry_bytes = b""
    ext_base = ifd_off + 2 + 12 * n + 4
    ext_blob = b""
    for tag, ttype, count, packed, value in entries:
        if packed is not None and len(packed) > 4:
            entry_bytes += struct.pack("<HHII", tag, ttype, count, ext_base + len(ext_blob))
            ext_blob += packed
        elif packed is not None:
            entry_bytes += struct.pack("<HHI", tag, ttype, count) + packed.ljust(4, b"\x00")
        else:
            entry_bytes += struct.pack("<HHII", tag, ttype, count, value)
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        f.write(px)
        f.write(struct.pack("<H", n) + entry_bytes + struct.pack("<I", 0))
        f.write(ext_blob)


def read_geotiffs(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .tif → (raster_id, data, w, h, bands, dtype, lon,
    lat, res) rows, decoded on executors; ``lon/lat`` is the SOUTH-WEST
    corner and rows are flipped south-up to match the tiling convention
    (tile row 0 = southmost)."""

    def _decode(row):
        name = row["path"].rsplit("/", 1)[-1]
        arr, meta = parse_geotiff(bytes(row["content"]))
        res = float(meta.get("pixel_scale", (1.0, 1.0, 0.0))[0])
        ox, oy = meta.get("origin", (0.0, 0.0))
        h, w, bands = arr.shape
        # GeoTIFF origin is the top-left corner with north-up rows
        sw_lat = float(oy) - h * res
        flipped = np.ascontiguousarray(arr[::-1])
        return (
            name,
            flipped.tobytes(),
            int(w),
            int(h),
            int(bands),
            str(arr.dtype.name),
            float(ox),
            sw_lat,
            res,
        )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return spark.createDataFrame(
        files.rdd.map(_decode),
        "raster_id string, data binary, w int, h int, bands int, dtype string, "
        "lon double, lat double, res double",
    )
