"""Ingest format plugins (sources/formats.py): shapefile + dbf + gpx.

Round-trips a generated point shapefile (writer emits the public layout
byte-for-byte), parses hand-built polygon/polyline records, and feeds
the parsed output straight into a spatial operator — the reference's
ingest-plugin contract (external format → features → query)."""

import struct

import numpy as np
import pandas as pd
import pytest

from geowave_spark.sources.formats import (
    _parse_shp_records,
    read_gpx,
    read_shapefile,
    write_shapefile_points,
)


@pytest.fixture(scope="module")
def shp_points(tmp_path_factory):
    rng = np.random.default_rng(3)
    n = 500
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(-60, 60, n).round(5),
            "lat": rng.uniform(-40, 40, n).round(5),
            "name": [f"site{i:03d}" for i in range(n)],
            "value": rng.uniform(0, 10, n).round(3),
        }
    )
    base = str(tmp_path_factory.mktemp("shp") / "pts")
    write_shapefile_points(pdf, base)
    return pdf, base


class TestShapefile:
    def test_point_round_trip_with_attributes(self, spark, shp_points):
        pdf, base = shp_points
        df = read_shapefile(spark, base + ".shp")
        got = df.orderBy("fid").toPandas()
        assert len(got) == len(pdf)
        assert (got["shape"] == "POINT").all()
        # geometry round-trips through WKT
        lon = got["wkt"].str.extract(r"POINT \(([-0-9.e]+) ")[0].astype(float)
        assert np.allclose(lon.to_numpy(), pdf["lon"].to_numpy())
        # dbf attributes survive
        assert got["name"].iloc[7] == "site007"
        assert got["value"].iloc[3] == pytest.approx(pdf["value"].iloc[3], abs=1e-6)

    def test_parallel_ranges_cover_all_records(self, spark, shp_points):
        pdf, base = shp_points
        df = read_shapefile(spark, base + ".shp", parallelism=7)
        assert df.count() == len(pdf)
        assert df.select("fid").distinct().count() == len(pdf)

    def test_polygon_and_polyline_records(self):
        def rec(recno, stype, pts, nparts=1):
            body = struct.pack("<i", stype)
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            body += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
            body += struct.pack("<ii", nparts, len(pts))
            body += struct.pack(f"<{nparts}i", *([0] * nparts))
            for x, y in pts:
                body += struct.pack("<dd", x, y)
            return struct.pack(">ii", recno, len(body) // 2) + body

        ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 0.0)]
        line = [(1.0, 1.0), (2.0, 5.0), (7.0, 5.0)]
        buf = rec(1, 5, ring) + rec(2, 3, line)
        rows = _parse_shp_records(buf, [0, len(rec(1, 5, ring))])
        assert rows[0][1] == "POLYGON" and rows[0][2].startswith("POLYGON ((0 0, 4 0, 4 3")
        assert rows[1][1] == "POLYLINE" and rows[1][2] == "LINESTRING (1 1, 2 5, 7 5)"

    def test_feeds_spatial_operator(self, spark, shp_points):
        """Parsed shapefile points join against a polygon table — the
        ingest → query contract."""
        from geowave_spark.operators.join import point_in_polygon_join

        pdf, base = shp_points
        pts = read_shapefile(spark, base + ".shp", attributes=False)
        pts = pts.selectExpr(
            "fid",
            "CAST(regexp_extract(wkt, 'POINT \\\\(([-0-9.e]+) ', 1) AS DOUBLE) AS lon",
            "CAST(regexp_extract(wkt, ' ([-0-9.e]+)\\\\)', 1) AS DOUBLE) AS lat",
        )
        polys = spark.createDataFrame(
            [(1, "POLYGON ((-20 -20, 20 -20, 20 20, -20 20, -20 -20))")],
            "region_id int, wkt string",
        )
        got = {r["fid"] for r in point_in_polygon_join(pts, polys, "fid", "region_id").collect()}
        want = set(
            np.arange(1, len(pdf) + 1)[
                (pdf.lon.to_numpy() >= -20) & (pdf.lon.to_numpy() <= 20)
                & (pdf.lat.to_numpy() >= -20) & (pdf.lat.to_numpy() <= 20)
            ]
        )
        assert got == want and len(want) > 10


class TestGpx:
    def test_track_points(self, spark, tmp_path):
        gpx = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
  <trk><name>t</name><trkseg>
    <trkpt lon="-71.1" lat="42.3"><ele>12.5</ele><time>2024-01-01T00:00:00Z</time></trkpt>
    <trkpt lon="-71.2" lat="42.4"><ele>13.0</ele><time>2024-01-01T00:01:00Z</time></trkpt>
  </trkseg><trkseg>
    <trkpt lon="-71.3" lat="42.5"/>
  </trkseg></trk>
</gpx>"""
        p = tmp_path / "a.gpx"
        p.write_text(gpx)
        df = read_gpx(spark, str(p))
        rows = df.orderBy("seg", "seq").collect()
        assert len(rows) == 3
        assert rows[0]["lon"] == -71.1 and rows[0]["ele"] == 12.5
        assert rows[2]["seg"] == 1 and rows[2]["ele"] is None
        assert rows[1]["wkt"] == "POINT (-71.2 42.4)"


class TestGeoTiff:
    """Baseline GeoTIFF parse (sources/geotiff.py): writer→reader
    round-trip, georeferencing, and the feed into general raster tiling."""

    def test_round_trip_float32(self, tmp_path):
        from geowave_spark.sources.geotiff import parse_geotiff, write_geotiff

        rng = np.random.default_rng(5)
        arr = rng.normal(0, 1, (20, 30, 2)).astype(np.float32)
        p = str(tmp_path / "a.tif")
        write_geotiff(p, arr, origin=(-10.5, 42.25), res=0.01)
        got, meta = parse_geotiff(open(p, "rb").read())
        assert np.array_equal(got, arr)
        assert meta["origin"] == (-10.5, 42.25)
        assert meta["pixel_scale"][0] == 0.01

    def test_nonzero_tiepoint_anchor(self, tmp_path):
        """ModelTiepoint anchored at raster (I, J) ≠ (0, 0): the recovered
        raster-(0,0) origin must subtract (I·scale_x, J·scale_y) — a
        non-origin anchor was silently mis-georeferenced (round-2 ADVICE).
        Built by patching the writer's tiepoint doubles in place (the
        writer always emits a (0,0) anchor, so round-trips can't catch it)."""
        import struct

        from geowave_spark.sources.geotiff import parse_geotiff, write_geotiff

        arr = (np.arange(4 * 5) % 7).astype(np.float32).reshape(4, 5, 1)
        p = str(tmp_path / "tp.tif")
        res = 0.25
        write_geotiff(p, arr, origin=(10.0, 20.0), res=res)
        raw = bytearray(open(p, "rb").read())
        # the writer's tiepoint payload is (0,0,0, 10.0, 20.0, 0.0); move
        # the anchor to raster (2, 3) and shift the model point to match:
        # model(2,3) = (10 + 2*res, 20 + 3*res)
        old = struct.pack("<6d", 0.0, 0.0, 0.0, 10.0, 20.0, 0.0)
        new = struct.pack("<6d", 2.0, 3.0, 0.0, 10.0 + 2 * res, 20.0 + 3 * res, 0.0)
        i = raw.find(old)
        assert i >= 0, "writer tiepoint payload not found"
        raw[i : i + len(old)] = new
        got, meta = parse_geotiff(bytes(raw))
        assert np.array_equal(got, arr)
        assert meta["origin"] == (10.0, 20.0)

    def test_round_trip_uint16_bigendian_reject(self, tmp_path):
        from geowave_spark.sources.geotiff import parse_geotiff, write_geotiff

        arr = (np.arange(6 * 8) % 1000).astype(np.uint16).reshape(6, 8, 1)
        p = str(tmp_path / "b.tif")
        write_geotiff(p, arr, origin=(0.0, 0.0), res=0.5)
        got, meta = parse_geotiff(open(p, "rb").read())
        assert np.array_equal(got, arr) and meta["bands"] == 1
        with pytest.raises(ValueError):
            parse_geotiff(b"XX\x00\x2a")

    def test_spark_read_feeds_tiling(self, spark, tmp_path):
        from geowave_spark.raster.grid import RasterSpec, tile_rasters
        from geowave_spark.sources.geotiff import read_geotiffs, write_geotiff

        rng = np.random.default_rng(9)
        for i in range(3):
            arr = rng.normal(50, 5, (24, 32, 1)).astype(np.float32)
            write_geotiff(
                str(tmp_path / f"r{i}.tif"), arr, origin=(-5 + i, 10.0), res=0.002
            )
        df = read_geotiffs(spark, str(tmp_path))
        rows = df.collect()
        assert len(rows) == 3 and rows[0]["bands"] == 1
        spec = RasterSpec(bands=1, dtype="float32", nodata=0.0)
        tiles = tile_rasters(df, spec, tile_size=16)
        assert tiles.count() >= 3
        t = tiles.first()
        a = spec.to_array(t["tile"], 16)
        valid = a != 0.0
        assert valid.any() and 30 < a[valid].mean() < 70
