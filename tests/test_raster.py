"""Raster codec + tiling invariants (FIXTURES.md F4).

Mirrors the reference's raster ITs: pixel-exactness across tile sizes and
merge paths (CustomCRSKDERasterResizeIT), PSNR≥40dB for the lossy format,
caption equality through the pipeline (BASELINE.json input_hint).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.raster.codec import (
    decode_image,
    encode_image,
    psnr,
)
from geowave_spark.raster.tiling import (
    _cells_for_envelope,
    _resample_into_cell,
    merge_tiles,
    mosaic,
    pick_tier,
    resize_tiles,
    tile_images,
)
from geowave_spark.sfc.tiered import TieredStrategy
from geowave_spark.sources.images import (
    _FMTS,
    _SIZES,
    gen_images_pdf,
    gen_pixels,
    images_table,
    phash64,
    with_geometry,
)

rng = np.random.default_rng(42)


class TestCodecs:
    @pytest.mark.parametrize("fmt", ["bmp", "png"])
    def test_lossless_roundtrip(self, fmt):
        for shape in [(16, 16), (32, 17), (7, 64)]:
            px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
            out = decode_image(encode_image(px, fmt), fmt)
            np.testing.assert_array_equal(px, out)

    def test_lossy_psnr(self):
        px = gen_pixels(3, 64, 64)
        out = decode_image(encode_image(px, "jpeg"), "jpeg")
        assert psnr(px, out) >= 40.0
        assert not np.array_equal(px, out)  # actually lossy

    def test_png_all_filters_decode(self):
        # synthesize a PNG with each filter type per row and check decode
        import struct
        import zlib

        from geowave_spark.raster.codec import _PNG_SIG, _chunk

        h, w = 5, 8
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        raw = bytearray()
        prev = np.zeros(w * 3, dtype=np.int32)
        for y in range(h):
            f = y % 5
            line = px[y].reshape(-1).astype(np.int32)
            enc = np.zeros(w * 3, dtype=np.int32)
            for i in range(w * 3):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if f == 0:
                    enc[i] = line[i]
                elif f == 1:
                    enc[i] = line[i] - a
                elif f == 2:
                    enc[i] = line[i] - b
                elif f == 3:
                    enc[i] = line[i] - ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[i] = line[i] - pred
            raw.append(f)
            raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(decode_image(data, "png"), px)


class TestImagesTable:
    def test_deterministic_and_schema(self, spark):
        a = images_table(spark, 40).collect()
        b = images_table(spark, 40).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        r = {row["image_id"]: row for row in a}
        assert len(r) == 40
        row = r["img0000000003"]
        px = decode_image(bytes(row["bytes"]), row["fmt"])
        assert px.shape == (row["h"], row["w"], 3)
        assert row["phash"] == phash64(gen_pixels(3, row["w"], row["h"]))
        assert row["caption"].startswith("caption of img3 ")

    def test_image_resize_matches_numpy_oracle(self, spark):
        """Per-image area-mean resize (brief's decode → resize operator):
        every output pixel equals the brute mean of its source block;
        captions carry through; enlargement path covered."""
        from geowave_spark.sources.images import image_resize

        out = {
            r["image_id"]: r
            for r in image_resize(images_table(spark, 12), 8, 8).collect()
        }
        assert len(out) == 12
        for i in [0, 4, 5, 11]:  # covers png, jpeg (lossy fixture), bmp
            row = out[f"img{i:010d}"]
            assert (row["w"], row["h"], row["fmt"]) == (8, 8, "png")
            got = decode_image(bytes(row["bytes"]), "png")
            w0 = _SIZES[i % 4]
            h0 = _SIZES[(i // 4 + i) % 4]
            src = decode_image(
                bytes(
                    next(
                        r["bytes"]
                        for r in images_table(spark, 12).collect()
                        if r["image_id"] == f"img{i:010d}"
                    )
                ),
                _FMTS[i % 3],
            ).astype(np.float64)
            ys = np.round(np.linspace(0, h0, 9)).astype(int)
            xs = np.round(np.linspace(0, w0, 9)).astype(int)
            want = np.zeros((8, 8, 3), dtype=np.uint8)
            for a in range(8):
                for b in range(8):
                    want[a, b] = np.clip(
                        np.round(src[ys[a] : ys[a + 1], xs[b] : xs[b + 1]].mean(axis=(0, 1))),
                        0,
                        255,
                    )
            assert np.array_equal(got, want), i
            assert row["caption"].startswith(f"caption of img{i} ")
        # enlargement: a 16×16 source to 32×32 round-trips the repeat path
        big = image_resize(images_table(spark, 1), 32, 32).collect()[0]
        px = decode_image(bytes(big["bytes"]), "png")
        src0 = decode_image(
            bytes(images_table(spark, 1).collect()[0]["bytes"]), _FMTS[0]
        )
        assert px.shape == (32, 32, 3)
        assert np.array_equal(px, np.repeat(np.repeat(src0, 2, 0), 2, 1))

    def test_image_features_match_numpy(self, spark):
        from geowave_spark.sources.images import image_features

        rows = {r["image_id"]: r for r in image_features(images_table(spark, 6)).collect()}
        src = {r["image_id"]: r for r in images_table(spark, 6).collect()}
        for iid, row in rows.items():
            px = decode_image(bytes(src[iid]["bytes"]), src[iid]["fmt"]).astype(np.float64)
            m = px.mean(axis=(0, 1))
            lum = px @ np.array([0.299, 0.587, 0.114])
            assert row["mean_r"] == pytest.approx(m[0])
            assert row["mean_g"] == pytest.approx(m[1])
            assert row["mean_b"] == pytest.approx(m[2])
            assert row["std_lum"] == pytest.approx(lum.std())

    def test_geometry_derivation(self, spark):
        df = with_geometry(images_table(spark, 30))
        rows = df.select("image_id", "lon", "lat", "res").collect()
        assert all(-180 <= r["lon"] <= 180 and -90 <= r["lat"] <= 90 for r in rows)
        # deterministic across invocations
        rows2 = with_geometry(images_table(spark, 30)).select("image_id", "lon", "lat", "res").collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


class TestTiling:
    strat = TieredStrategy()

    def test_pick_tier_monotone(self):
        t_fine = pick_tier(0.001, 16, self.strat)
        t_coarse = pick_tier(0.01, 16, self.strat)
        assert t_fine > t_coarse
        # pixel span at chosen tier ≥ res, next tier would oversample
        for res in [0.001, 0.004, 0.02]:
            t = pick_tier(res, 16, self.strat)
            assert 360.0 / (1 << t) / 16 >= res
            if t < self.strat.max_bits:
                assert 360.0 / (1 << (t + 1)) / 16 < res

    def test_tile_assignment_matches_numpy_oracle(self, spark):
        """Tile (tier, cell) assignment equals an independent per-image
        recomputation (the driver's 'tile assignments match' gate)."""
        imgs = with_geometry(images_table(spark, 24))
        got = {
            (r["image_id"], r["tier"], r["cell"])
            for r in tile_images(imgs, tile_size=16).collect()
        }
        pdf = imgs.select("image_id", "w", "h", "lon", "lat", "res").collect()
        want = set()
        for r in pdf:
            t = pick_tier(r["res"], 16, self.strat)
            maxx = min(r["lon"] + r["w"] * r["res"], 180.0)
            maxy = min(r["lat"] + r["h"] * r["res"], 90.0)
            _, _, cells = _cells_for_envelope(self.strat, t, r["lon"], r["lat"], maxx, maxy)
            for c in cells.tolist():
                want.add((r["image_id"], t, int(c)))
        assert got == want

    def test_tile_pixels_and_caption(self, spark):
        """Each tile's pixels equal a direct numpy resample of the decoded
        source; captions carry through unchanged."""
        imgs = with_geometry(images_table(spark, 12))
        tiles = tile_images(imgs, tile_size=16).collect()
        src = {
            r["image_id"]: r
            for r in imgs.select("image_id", "bytes", "fmt", "w", "h", "lon", "lat", "res", "caption").collect()
        }
        from geowave_spark.sfc.hilbert import hilbert_to_xy

        checked = 0
        for t in tiles[:60]:
            s = src[t["image_id"]]
            px = decode_image(bytes(s["bytes"]), s["fmt"])
            ix, iy = hilbert_to_xy(np.array([t["cell"]], dtype=np.uint64), t["tier"])
            want = _resample_into_cell(
                px, s["lon"], s["lat"], s["res"], self.strat, t["tier"], int(ix[0]), int(iy[0]), 16
            )
            got = np.frombuffer(bytes(t["tile"]), dtype=np.uint8).reshape(16, 16, 3)
            np.testing.assert_array_equal(got, want)
            assert t["caption"] == s["caption"]
            checked += 1
        assert checked > 10

    def test_merge_and_mosaic_pixel_invariant(self, spark):
        """decode → tile → merge → mosaic round trip: the mosaic over one
        image's footprint reproduces the per-cell resample exactly
        (allclose for lossless; PSNR≥40 for the lossy format vs original)."""
        imgs = with_geometry(images_table(spark, 6)).where(F.col("image_id") == "img0000000000")
        row = imgs.collect()[0]
        tiles = tile_images(imgs, tile_size=16)
        merged = merge_tiles(tiles, tile_size=16).cache()
        t = pick_tier(row["res"], 16, self.strat)
        maxx = min(row["lon"] + row["w"] * row["res"], 180.0)
        maxy = min(row["lat"] + row["h"] * row["res"], 90.0)
        out = mosaic(merged, t, (row["lon"], row["lat"], maxx, maxy), tile_size=16)
        # oracle: assemble the same grid directly from numpy resamples
        px = decode_image(bytes(row["bytes"]), row["fmt"])
        gx, gy, cells = _cells_for_envelope(self.strat, t, row["lon"], row["lat"], maxx, maxy)
        ax, ay = int(gx.min()), int(gy.min())
        want = np.zeros_like(out)
        for ix, iy in zip(gx.tolist(), gy.tolist()):
            tile = _resample_into_cell(px, row["lon"], row["lat"], row["res"], self.strat, t, ix, iy, 16)
            want[(iy - ay) * 16 : (iy - ay + 1) * 16, (ix - ax) * 16 : (ix - ax + 1) * 16] = tile
        np.testing.assert_array_equal(out, want)
        # lossy-format invariant: decoded pixels within PSNR bound of ideal
        ideal = gen_pixels(0, row["w"], row["h"])
        assert psnr(ideal, px) >= 40.0 if row["fmt"] == "jpeg" else True

    def test_merge_nodata_semantics(self, spark):
        """Two overlapping sources: first (by image_id) wins, nodata pixels
        filled by the second — NoDataMergeStrategy."""
        import pandas as pd

        t1 = np.zeros((4, 4, 3), dtype=np.uint8)
        t1[:2] = 100  # top half data, bottom half nodata
        t2 = np.full((4, 4, 3), 7, dtype=np.uint8)
        pdf = pd.DataFrame(
            {
                "image_id": ["a", "b"],
                "caption": ["ca", "cb"],
                "tier": [5, 5],
                "cell": [9, 9],
                "tile": [t1.tobytes(), t2.tobytes()],
            }
        )
        df = spark.createDataFrame(pdf)
        out = merge_tiles(df, tile_size=4).collect()
        assert len(out) == 1 and out[0]["n_sources"] == 2
        m = np.frombuffer(bytes(out[0]["tile"]), dtype=np.uint8).reshape(4, 4, 3)
        assert (m[:2] == 100).all() and (m[2:] == 7).all()

    def test_resize_roundtrip_pixel_exact(self, spark):
        """tile_size 4 → 16 → 4 reproduces every original tile exactly
        (the IT's tile-size invariance)."""
        imgs = with_geometry(images_table(spark, 4)).where(F.col("image_id") == "img0000000001")
        t4 = tile_images(imgs, tile_size=4).cache()
        t16 = resize_tiles(t4, 4, 16)
        back = resize_tiles(t16, 16, 4)
        orig = {(r["tier"], r["cell"]): bytes(r["tile"]) for r in t4.collect()}
        rt = {(r["tier"], r["cell"]): bytes(r["tile"]) for r in back.collect()}
        zero = bytes(4 * 4 * 3)
        for key, tile in orig.items():
            assert rt[key] == tile, key
        for key, tile in rt.items():
            if key not in orig:
                assert tile == zero  # padding cells materialized as nodata


class TestGeneralRaster:
    """Arbitrary-band/dtype raster tiles + pluggable merges
    (raster/grid.py — RasterDataAdapter generality, NoDataMergeStrategy
    SPI)."""

    @pytest.fixture(scope="class")
    def spec(self):
        from geowave_spark.raster.grid import RasterSpec

        return RasterSpec(bands=2, dtype="float32", nodata=-9999.0)

    @pytest.fixture(scope="class")
    def float_tiles(self, spark, spec):
        import pandas as pd

        from geowave_spark.raster.grid import tile_rasters

        rng = np.random.default_rng(7)
        rows = []
        for i in range(12):
            h, w = 24, 32
            arr = rng.normal(100.0, 10.0, (h, w, 2)).astype(np.float32)
            rows.append(
                {
                    "raster_id": f"r{i:02d}",
                    "data": arr.tobytes(),
                    "w": w,
                    "h": h,
                    "lon": float(-10 + (i % 4) * 0.002 * 16),  # overlapping grid
                    "lat": float(5 + (i // 4) * 0.002 * 12),
                    "res": 0.002,
                }
            )
        df = spark.createDataFrame(pd.DataFrame(rows))
        return tile_rasters(df, spec, tile_size=16).cache()

    def test_tile_bytes_and_values(self, spark, spec, float_tiles):
        rows = float_tiles.collect()
        assert len(rows) > 12
        for r in rows[:5]:
            arr = spec.to_array(r["tile"], 16)
            assert arr.shape == (16, 16, 2) and arr.dtype == np.float32
            valid = ~spec.nodata_mask(arr)
            # data pixels carry the gaussian field, nodata the fill value
            if valid.any():
                assert 40 < arr[valid].mean() < 160

    def test_merge_strategies(self, spark, spec, float_tiles):
        from geowave_spark.raster.grid import merge_raster_tiles

        by = {}
        for strat in ("nodata", "max", "mean"):
            merged = merge_raster_tiles(float_tiles, spec, 16, strategy=strat)
            rows = {(r["tier"], r["cell"]): r for r in merged.collect()}
            by[strat] = rows
        keys = set(by["nodata"])
        assert keys == set(by["max"]) == set(by["mean"])
        multi = [k for k in keys if by["nodata"][k]["n_sources"] > 1]
        assert multi, "fixture must produce overlapping tiles"
        k = multi[0]
        a = spec.to_array(by["nodata"][k]["tile"], 16)
        b = spec.to_array(by["max"][k]["tile"], 16)
        c = spec.to_array(by["mean"][k]["tile"], 16)
        va = ~spec.nodata_mask(a)
        # max ≥ first-wins ≥ (well, mean is between min and max) on shared pixels
        assert (b[va] >= a[va] - 1e-5).all()
        assert (c[va] <= b[va] + 1e-5).all()

    def test_merge_oracle_single_cell(self, spark, spec):
        """Exact numpy oracle for the nodata fold on a constructed pair of
        overlapping tiles."""
        import pandas as pd

        from geowave_spark.raster.grid import GRID_TILE_SCHEMA, merge_raster_tiles

        ts = 4
        a = np.full((ts, ts, 2), -9999.0, dtype=np.float32)
        a[:2] = 1.0
        b = np.full((ts, ts, 2), 2.0, dtype=np.float32)
        pdf = pd.DataFrame(
            [
                ("a", 5, 99, a.tobytes()),
                ("b", 5, 99, b.tobytes()),
            ],
            columns=[f.name for f in GRID_TILE_SCHEMA.fields],
        )
        tiles = spark.createDataFrame(pdf, GRID_TILE_SCHEMA)
        out = merge_raster_tiles(tiles, spec, ts, strategy="nodata").collect()[0]
        got = spec.to_array(out["tile"], ts)
        want = a.copy()
        want[2:] = 2.0  # b fills only a's nodata rows
        assert np.array_equal(got, want) and out["n_sources"] == 2

    def test_merge_min_max_sentinel_nodata(self, spark, spec):
        """Partially-overlapping tiles with a LOW sentinel nodata: 'min'
        must not let the sentinel overwrite valid data (round-2 ADVICE —
        fmin alone picks -9999 over real samples), and 'max' must not let
        a high sentinel win symmetrically."""
        import pandas as pd

        from geowave_spark.raster.grid import (
            GRID_TILE_SCHEMA,
            RasterSpec,
            merge_raster_tiles,
        )

        ts = 4
        lo = RasterSpec(bands=1, dtype="float32", nodata=-9999.0)
        a = np.full((ts, ts, 1), -9999.0, dtype=np.float32)
        a[:, :2] = 5.0  # valid left half
        b = np.full((ts, ts, 1), -9999.0, dtype=np.float32)
        b[:, 1:3] = 7.0  # valid middle (overlaps column 1)
        pdf = pd.DataFrame(
            [("a", 5, 99, a.tobytes()), ("b", 5, 99, b.tobytes())],
            columns=[f.name for f in GRID_TILE_SCHEMA.fields],
        )
        tiles = spark.createDataFrame(pdf, GRID_TILE_SCHEMA)
        got = lo.to_array(
            merge_raster_tiles(tiles, lo, ts, strategy="min").collect()[0]["tile"], ts
        )
        want = np.full((ts, ts, 1), -9999.0, dtype=np.float32)
        want[:, 0] = 5.0        # a only
        want[:, 1] = 5.0        # overlap: min(5, 7)
        want[:, 2] = 7.0        # b only
        assert np.array_equal(got, want)
        hi = RasterSpec(bands=1, dtype="float32", nodata=99999.0)
        a2 = np.full((ts, ts, 1), 99999.0, dtype=np.float32)
        a2[:, :2] = 5.0
        b2 = np.full((ts, ts, 1), 99999.0, dtype=np.float32)
        b2[:, 1:3] = 7.0
        pdf2 = pd.DataFrame(
            [("a", 5, 99, a2.tobytes()), ("b", 5, 99, b2.tobytes())],
            columns=[f.name for f in GRID_TILE_SCHEMA.fields],
        )
        got2 = hi.to_array(
            merge_raster_tiles(
                spark.createDataFrame(pdf2, GRID_TILE_SCHEMA), hi, ts, strategy="max"
            ).collect()[0]["tile"],
            ts,
        )
        want2 = np.full((ts, ts, 1), 99999.0, dtype=np.float32)
        want2[:, 0] = 5.0
        want2[:, 1] = 7.0       # overlap: max(5, 7)
        want2[:, 2] = 7.0
        assert np.array_equal(got2, want2)


def test_tile_pyramid_levels(spark):
    """build_pyramid emits the full-resolution tier plus coarser levels
    (RasterDataAdapter pyramid semantics); coarser tiers cover the same
    footprint with 4x fewer cells per level (up to grid clipping)."""
    from geowave_spark.raster.tiling import pick_tier, tile_images
    from geowave_spark.sfc.tiered import TieredStrategy
    from geowave_spark.sources.images import images_table

    from pyspark.sql import functions as F

    strat = TieredStrategy()
    imgs = (
        images_table(spark, 6)
        .withColumn("lon", F.lit(10.0))
        .withColumn("lat", F.lit(20.0))
        .withColumn("res", F.lit(0.004))
    )
    tiles = tile_images(imgs, tile_size=16, build_pyramid=True, pyramid_levels=2)
    pdf = tiles.groupBy("image_id", "tier").count().toPandas()
    t0 = pick_tier(0.004, 16, strat)
    for _, grp in pdf.groupby("image_id"):
        tiers = set(grp["tier"])
        assert tiers == {t0, t0 - 1, t0 - 2}
        counts = dict(zip(grp["tier"], grp["count"]))
        assert counts[t0 - 1] <= counts[t0] and counts[t0 - 2] <= counts[t0 - 1]


class TestAnisotropicTiling:
    """res_y-aware lattice gather: reprojected rasters whose degree-space
    pixels are taller than wide must place northern rows at
    lat + j*res_y, not lat + j*res_x (round-3 ADVICE)."""

    def test_row_placement_uses_res_y(self, spark):
        import pandas as pd

        from geowave_spark.raster.grid import RasterSpec, tile_rasters
        from geowave_spark.raster.tiling import TieredStrategy

        spec = RasterSpec(bands=1, dtype="float32", nodata=float("nan"))
        h, w = 40, 64
        res, res_y = 0.002, 0.0035
        lon0, lat0 = -10.0, 5.0
        # row j (south-up) carries the constant value j
        arr = np.repeat(
            np.arange(h, dtype=np.float32)[:, None, None], w, axis=1
        )
        df = spark.createDataFrame(
            pd.DataFrame(
                [
                    {
                        "raster_id": "a0",
                        "data": arr.tobytes(),
                        "w": w,
                        "h": h,
                        "lon": lon0,
                        "lat": lat0,
                        "res": res,
                        "res_y": res_y,
                    }
                ]
            )
        )
        strat = TieredStrategy()
        from geowave_spark.sfc.hilbert import hilbert_to_xy

        tiles = {(r["tier"], r["cell"]): r for r in tile_rasters(df, spec, 16, strat).collect()}
        assert tiles
        t = next(iter(tiles))[0]
        span = strat.dim_y.range / (1 << t)
        spanx = strat.dim_x.range / (1 << t)
        # probe every 16th lattice sample inside the footprint
        hits = 0
        for (tier, cell), r in tiles.items():
            px = spec.to_array(r["tile"], 16)
            xs, ys = hilbert_to_xy(np.array([cell], dtype=np.uint64), tier)
            ix, iy = int(xs[0]), int(ys[0])
            for py in range(0, 16, 5):
                for pxi in range(0, 16, 5):
                    lat = strat.dim_y.min + iy * span + (py + 0.5) * (span / 16)
                    lon = strat.dim_x.min + ix * spanx + (pxi + 0.5) * (spanx / 16)
                    sy = int(np.floor((lat - lat0) / res_y))
                    sx = int(np.floor((lon - lon0) / res))
                    if 0 <= sy < h and 0 <= sx < w:
                        assert px[py, pxi, 0] == float(sy)
                        hits += 1
        assert hits > 20


class TestResYNullFallback:
    """r4 review fix: a null res_y (pandas delivers NaN, which is truthy)
    must fall back to the square-pixel res, not silently emit zero tiles
    through the NaN→INT64_MIN floor cast."""

    def test_null_res_y_matches_square_pixel_tiles(self, spark):
        import pandas as pd

        from geowave_spark.raster.grid import RasterSpec, tile_rasters

        spec = RasterSpec(bands=1, dtype="float32", nodata=float("nan"))
        h, w, res = 24, 32, 0.004
        arr = np.arange(h * w, dtype=np.float32).reshape(h, w, 1)
        base = {
            "raster_id": "r0",
            "data": arr.tobytes(),
            "w": w,
            "h": h,
            "lon": 3.0,
            "lat": 41.0,
            "res": res,
        }
        with_null = spark.createDataFrame(
            pd.DataFrame([{**base, "res_y": None}])
        )
        without_col = spark.createDataFrame(pd.DataFrame([base]))
        got = sorted(
            (r["tier"], r["cell"], bytes(r["tile"]))
            for r in tile_rasters(with_null, spec, 16).collect()
        )
        want = sorted(
            (r["tier"], r["cell"], bytes(r["tile"]))
            for r in tile_rasters(without_col, spec, 16).collect()
        )
        assert got and got == want


class TestServerMerge:
    """Persist-time compaction (SingleAdapterServerMergeStrategy) and
    per-adapter dispatch (MultiAdapterServerMergeStrategy) — the k/v
    combiner semantics re-expressed as a compacted catalog table."""

    @pytest.fixture(scope="class")
    def spec(self):
        from geowave_spark.raster.grid import RasterSpec

        return RasterSpec(bands=1, dtype="float32", nodata=-9999.0)

    def _tiles(self, spark, spec, ids, seed):
        import pandas as pd

        from geowave_spark.raster.grid import tile_rasters

        rng = np.random.default_rng(seed)
        rows = []
        for k, rid in enumerate(ids):
            arr = rng.normal(50.0, 5.0, (24, 32, 1)).astype(np.float32)
            # punch nodata holes so the fold has something to fill
            hole = rng.integers(0, 20, 2)
            arr[hole[0] : hole[0] + 6, hole[1] : hole[1] + 8] = spec.nodata
            rows.append(
                {
                    "raster_id": rid,
                    "data": arr.tobytes(),
                    "w": 32,
                    "h": 24,
                    "lon": float(-10 + (k % 2) * 0.002 * 16),
                    "lat": float(5 + (k // 2) * 0.002 * 12),
                    "res": 0.002,
                }
            )
        return tile_rasters(spark.createDataFrame(pd.DataFrame(rows)), spec, 16)

    def test_compaction_append_equals_one_shot(self, spark, spec):
        """write(batch1) + append(batch2) must equal the one-shot merge of
        all tiles: the stored accumulator plays thisTile, new tiles fold
        in raster_id order — exactly the reference combiner's order when
        ids arrive ordered."""
        from geowave_spark.raster.grid import (
            merge_raster_tiles,
            server_merge_write,
            server_merged_read,
        )

        t1 = self._tiles(spark, spec, ["a0", "a1", "a2"], seed=3)
        t2 = self._tiles(spark, spec, ["b0", "b1"], seed=9)
        name = "test_server_merge"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        server_merge_write(t1, name, spec, strategy="nodata")
        server_merge_write(t2, name, spec, strategy="nodata", mode="append")
        got = {
            (r["tier"], r["cell"]): (bytes(r["tile"]), r["n_sources"])
            for r in server_merged_read(spark, name, spec).collect()
        }
        want = {
            (r["tier"], r["cell"]): (bytes(r["tile"]), r["n_sources"])
            for r in merge_raster_tiles(
                t1.unionByName(t2), spec, 16, strategy="nodata"
            ).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0], k  # byte-exact tiles
            assert got[k][1] == want[k][1], k  # n_sources accumulates
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_guards(self, spark, spec):
        from geowave_spark.raster.grid import (
            RasterSpec,
            server_merge_write,
            server_merged_read,
        )

        t1 = self._tiles(spark, spec, ["a0"], seed=1)
        name = "test_server_merge_guard"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        with pytest.raises(ValueError, match="mean"):
            server_merge_write(t1, name, spec, strategy="mean")
        server_merge_write(t1, name, spec, strategy="max")
        with pytest.raises(ValueError, match="strategy"):
            server_merge_write(t1, name, spec, strategy="min", mode="append")
        with pytest.raises(ValueError, match="tiles of"):
            server_merged_read(
                spark, name, RasterSpec(bands=2, dtype="float32", nodata=-9999.0)
            )
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_multi_adapter_dispatch(self, spark, spec):
        """Two adapters sharing one tile table merge under their OWN
        strategies; per-cell results match independent numpy folds."""
        from pyspark.sql import functions as F

        from geowave_spark.raster.grid import (
            merge_multi_adapter,
            merge_raster_tiles,
        )

        ta = self._tiles(spark, spec, ["a0", "a1", "a2"], seed=5).withColumn(
            "adapter_id", F.lit("dem")
        )
        tb = self._tiles(spark, spec, ["b0", "b1", "b2"], seed=6).withColumn(
            "adapter_id", F.lit("thermal")
        )
        mixed = ta.unionByName(tb)
        out = merge_multi_adapter(
            mixed, {"dem": (spec, "min"), "thermal": (spec, "max")}, 16
        )
        got = {
            (r["adapter_id"], r["tier"], r["cell"]): bytes(r["tile"])
            for r in out.collect()
        }
        for aid, src, strat in (("dem", ta, "min"), ("thermal", tb, "max")):
            want = {
                (aid, r["tier"], r["cell"]): bytes(r["tile"])
                for r in merge_raster_tiles(
                    src.drop("adapter_id"), spec, 16, strategy=strat
                ).collect()
            }
            for k, v in want.items():
                assert got[k] == v, k
        with pytest.raises(Exception, match="unregistered"):
            merge_multi_adapter(mixed, {"dem": (spec, "min")}, 16).collect()
