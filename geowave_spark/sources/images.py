"""Deterministic synthetic image+caption table (FIXTURES.md F1).

Authoritative input shape (BASELINE.json input_hint):
  (image_id string, bytes binary, w int32, h int32, fmt string,
   caption string, phash int64)

Generated distributedly: ``spark.range(n)`` → ``mapInPandas`` batch
generator; every field is a pure function of the row index (seed folded
in), so any partition can be regenerated independently — which is also
what makes per-partition checkpoint/resume safe.

Derived geometry (computed, not stored): a point from a hash of the id,
Zipf-skewed into hot clusters, matching the reference join fixture shape
(GeoWaveSparkSpatialJoinIT hail points), plus a ground-resolution footprint
used by the tiler.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..raster.codec import encode_image

IMAGE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

_SIZES = [16, 32, 64, 256]
_FMTS = ["png", "jpeg", "bmp"]
_ADJ = ["misty", "golden", "quiet", "vivid", "ancient", "stormy", "pale", "lush"]
_NOUN = ["harbor", "ridge", "market", "forest", "plaza", "canyon", "delta", "mesa"]

# hot cluster centers for the Zipf-skew mixture (deterministic)
_HOT = np.array([[12.4, 48.2], [-74.0, 40.7], [139.7, 35.7], [-0.1, 51.5], [151.2, -33.9]])


def gen_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixels: smooth gradient + per-image sinusoid pattern."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (xx / max(w - 1, 1) * 96 + yy / max(h - 1, 1) * 96)
    k1 = 1 + (i % 7)
    k2 = 1 + (i % 5)
    pat = 48 * np.sin(2 * np.pi * k1 * xx / w) * np.cos(2 * np.pi * k2 * yy / h)
    r = np.clip(base + pat + (i * 37) % 64, 0, 255)
    g = np.clip(base + 0.5 * pat + (i * 53) % 64, 0, 255)
    b = np.clip(255 - base + (i * 71) % 64, 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def phash64(px: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 block-mean luminance vs its median."""
    g = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.array(
        [[g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean() for j in range(8)] for i in range(8)]
    )
    bits = (blocks > np.median(blocks)).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def _u01(i: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) from row index (splitmix64-style)."""
    x = (i.astype(np.uint64) + np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def lonlat_for(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derived point geometry: 80% in 5 hot clusters, 20% uniform."""
    i = np.asarray(i, dtype=np.int64)
    u = _u01(i, 1)
    lon = -180.0 + 360.0 * _u01(i, 2)
    lat = -90.0 + 180.0 * _u01(i, 3)
    hot_idx = (_u01(i, 4) * 5).astype(int)
    off1 = (_u01(i, 5) - 0.5) * 1.0
    off2 = (_u01(i, 6) - 0.5) * 1.0
    in_hot = u < 0.8
    lon = np.where(in_hot, np.clip(_HOT[hot_idx, 0] + off1, -180, 180), lon)
    lat = np.where(in_hot, np.clip(_HOT[hot_idx, 1] + off2, -90, 90), lat)
    return lon, lat


def resolution_for(i: np.ndarray) -> np.ndarray:
    """Ground resolution (degrees/pixel), cycles over 4 magnitudes."""
    return 0.002 * (2.0 ** (np.asarray(i, dtype=np.int64) % 4))


def gen_images_pdf(indices: np.ndarray) -> pd.DataFrame:
    rows = []
    for i in indices.tolist():
        w = _SIZES[i % 4]
        h = _SIZES[(i // 4 + i) % 4]
        fmt = _FMTS[i % 3]
        px = gen_pixels(i, w, h)
        rows.append(
            (
                f"img{i:010d}",
                encode_image(px, fmt),
                w,
                h,
                fmt,
                f"caption of img{i} {_ADJ[i % 8]} {_NOUN[(i // 8) % 8]}",
                phash64(px),
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA.fields])


def images_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic images table of n rows."""
    parts = partitions or max(2, n // 2000)

    def _gen(batches):
        for pdf in batches:
            yield gen_images_pdf(pdf["id"].to_numpy())

    return spark.range(0, n, 1, parts).mapInPandas(_gen, IMAGE_SCHEMA)


def _area_mean(px: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Exact area-mean resample of (h, w, b) to (oh, ow, b): integral-image
    block sums over rounded linspace boundaries; inputs smaller than the
    target on a side are integer-upsampled first so every block is
    non-empty (same construction as the pHash 32×32 front end)."""
    h, w, b = px.shape
    g = px.astype(np.float64)
    if h < oh:
        g = np.repeat(g, -(-oh // h), axis=0)
        h = g.shape[0]
    if w < ow:
        g = np.repeat(g, -(-ow // w), axis=1)
        w = g.shape[1]
    s = np.zeros((h + 1, w + 1, b), dtype=np.float64)
    np.cumsum(np.cumsum(g, axis=0), axis=1, out=s[1:, 1:])
    ys = np.round(np.linspace(0, h, oh + 1)).astype(np.int64)
    xs = np.round(np.linspace(0, w, ow + 1)).astype(np.int64)
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    block = (
        s[y1[:, None], x1[None, :]]
        - s[y0[:, None], x1[None, :]]
        - s[y1[:, None], x0[None, :]]
        + s[y0[:, None], x0[None, :]]
    )
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    return np.clip(np.round(block / area[:, :, None]), 0, 255).astype(np.uint8)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
    ]
)


def image_resize(
    images: DataFrame, out_w: int, out_h: int, out_fmt: str = "png"
) -> DataFrame:
    """Per-image resize over the binary column (the brief's multimodal
    decode → resize step as a first-class operator): decode with the
    first-party codecs, exact area-mean resample to (out_w, out_h),
    re-encode as ``out_fmt``.  One Arrow batch per task — mapInPandas,
    no per-row Python UDF; captions carry through (input_hint per-row
    invariant).  At 100 TB the work is one narrow scan of
    (image_id, bytes, fmt, caption) and is embarrassingly parallel."""
    from ..raster.codec import decode_image, encode_image

    src = images.select("image_id", "bytes", "fmt", "caption")

    def _gen(batches):
        for pdf in batches:
            rows = []
            for iid, raw, f, cap in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"]
            ):
                px = _area_mean(decode_image(bytes(raw), f), out_h, out_w)
                rows.append((iid, encode_image(px, out_fmt), out_w, out_h, out_fmt, cap))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return src.mapInPandas(_gen, RESIZE_SCHEMA)


def image_features(images: DataFrame) -> DataFrame:
    """Per-image feature extraction over the binary column: channel means
    and luminance standard deviation (the brief's decode → feature-extract
    step).  Decode is per-image; the statistics run on the whole batch's
    stacked pixels where shapes allow, else per image — either way one
    Arrow exchange, no per-row Python UDF."""
    from ..raster.codec import decode_image

    out_schema = StructType(
        [
            StructField("image_id", StringType(), False),
            StructField("mean_r", DoubleType(), False),
            StructField("mean_g", DoubleType(), False),
            StructField("mean_b", DoubleType(), False),
            StructField("std_lum", DoubleType(), False),
        ]
    )
    src = images.select("image_id", "bytes", "fmt")

    def _gen(batches):
        for pdf in batches:
            rows = []
            for iid, raw, f in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(raw), f).astype(np.float64)
                lum = px @ np.array([0.299, 0.587, 0.114])
                m = px.mean(axis=(0, 1))
                rows.append(
                    (iid, float(m[0]), float(m[1]), float(m[2]), float(lum.std()))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "mean_r", "mean_g", "mean_b", "std_lum"]
            )

    return src.mapInPandas(_gen, out_schema)


def with_geometry(images: DataFrame) -> DataFrame:
    """Add derived (lon, lat, res) columns — pure function of image_id."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf("lon double, lat double, res double")
    def _geo(image_id: pd.Series) -> pd.DataFrame:
        i = image_id.str.slice(3).astype(np.int64).to_numpy()
        lon, lat = lonlat_for(i)
        return pd.DataFrame({"lon": lon, "lat": lat, "res": resolution_for(i)})

    g = _geo(F.col("image_id"))
    return images.withColumn("_g", g).select("*", "_g.lon", "_g.lat", "_g.res").drop("_g")
