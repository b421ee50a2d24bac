"""ST SQL function surface (GeomFunctionRegistry / GWQL predicate analogs)."""

import numpy as np
import pytest

from geowave_spark.functions import register_all
from geowave_spark.sources.fixtures import points_pdf, regions_pdf
from geowave_spark.geom import parse_wkt, points_in_polygon, points_polygon_dist2


@pytest.fixture(scope="module", autouse=True)
def _reg(spark):
    register_all(spark)


def test_st_point_and_distance(spark):
    row = spark.sql(
        "SELECT st_distance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D)) AS d"
    ).first()
    assert row["d"] == 5.0


def test_st_within_distance_join_sql(spark):
    pts = spark.createDataFrame(points_pdf(120))
    pts.createOrReplaceTempView("pts_a")
    spark.createDataFrame(points_pdf(60, seed=9)).createOrReplaceTempView("pts_b")
    got = spark.sql(
        """
        SELECT a.image_id AS ia, b.image_id AS ib
        FROM pts_a a JOIN pts_b b
        ON st_within_distance(st_point(a.lon, a.lat), st_point(b.lon, b.lat), 1.0)
        """
    ).collect()
    pa, pb = points_pdf(120), points_pdf(60, seed=9)
    d2 = (pa["lon"].to_numpy()[:, None] - pb["lon"].to_numpy()[None, :]) ** 2 + (
        pa["lat"].to_numpy()[:, None] - pb["lat"].to_numpy()[None, :]
    ) ** 2
    want = {
        (pa["image_id"].iloc[i], pb["image_id"].iloc[j])
        for i, j in zip(*np.nonzero(d2 <= 1.0))
    }
    assert {(r["ia"], r["ib"]) for r in got} == want


def test_st_within_and_contains(spark):
    regs = regions_pdf(40)
    pts = points_pdf(200)
    spark.createDataFrame(pts).createOrReplaceTempView("p")
    spark.createDataFrame(regs).createOrReplaceTempView("r")
    got = {
        (row["image_id"], row["region_id"])
        for row in spark.sql(
            """
            SELECT p.image_id, r.region_id FROM p JOIN r
            ON st_within(st_point(p.lon, p.lat), r.wkt)
            """
        ).collect()
    }
    got2 = {
        (row["image_id"], row["region_id"])
        for row in spark.sql(
            """
            SELECT p.image_id, r.region_id FROM p JOIN r
            ON st_contains(r.wkt, st_point(p.lon, p.lat))
            """
        ).collect()
    }
    want = set()
    for _, rr in regs.iterrows():
        poly = parse_wkt(rr.wkt)[1]
        hit = points_in_polygon(pts["lon"].to_numpy(), pts["lat"].to_numpy(), poly)
        want |= {(pts["image_id"].iloc[i], rr.region_id) for i in np.nonzero(hit)[0]}
    assert got == want and got2 == want


def test_st_intersects_polygons(spark):
    a = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    b = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"  # overlaps a
    c = "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"  # disjoint
    d = "POLYGON ((-1 1.5, 5 2.5, 5 1.9, -1 0.9, -1 1.5))"  # crosses a, no vertex inside? (has vertices inside)
    rows = spark.sql(
        f"""
        SELECT st_intersects('{a}', '{b}') AS ab,
               st_intersects('{a}', '{c}') AS ac,
               st_intersects('{a}', '{d}') AS ad,
               st_disjoint('{a}', '{c}') AS disj
        """
    ).first()
    assert rows["ab"] and not rows["ac"] and rows["ad"] and rows["disj"]


def test_st_distance_point_polygon(spark):
    regs = regions_pdf(10)
    w = regs.wkt.iloc[0]
    row = spark.sql(f"SELECT st_distance(st_point(0.0D, 0.0D), '{w}') AS d").first()
    want = float(np.sqrt(points_polygon_dist2(np.array([0.0]), np.array([0.0]), parse_wkt(w)[1])[0]))
    assert abs(row["d"] - want) < 1e-12


def test_st_envelope(spark):
    row = spark.sql(
        "SELECT st_envelope('POLYGON ((1 2, 5 3, 3 7, 1 2))') AS e"
    ).first()
    kind, coords = parse_wkt(row["e"])
    assert coords[:, 0].min() == 1 and coords[:, 0].max() == 5
    assert coords[:, 1].min() == 2 and coords[:, 1].max() == 7


def test_st_transform_point_matches_numpy(spark):
    from geowave_spark.crs import transform_np

    row = spark.sql(
        "SELECT st_transform('POINT (2.3522 48.8566)', 'EPSG:4326', 'EPSG:2154') AS w"
    ).first()
    kind, parts = parse_wkt(row["w"])
    assert kind == "POINT"
    x, y = transform_np(np.array([2.3522]), np.array([48.8566]), "EPSG:4326", "EPSG:2154")
    assert abs(parts[0][0] - x[0]) < 1e-6 and abs(parts[0][1] - y[0]) < 1e-6


def test_st_transform_preserves_structure(spark):
    """Polygon-with-hole and mixed collection keep their exact WKT shape
    (ring grouping, nesting, kind words) — only numbers change."""
    from geowave_spark.crs import transform_np

    src = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
        "(1 1, 2 1, 2 2, 1 2, 1 1)), LINESTRING (5 5, 6 7))"
    )
    row = spark.sql(
        f"SELECT st_transform('{src}', 'EPSG:4326', 'EPSG:3857') AS w"
    ).first()
    got = row["w"]
    import re as _re

    # the non-numeric skeleton is untouched
    skel = _re.sub(r"[-+0-9.eE]+", "#", src)
    assert _re.sub(r"[-+0-9.eE]+", "#", got) == skel
    # every coordinate equals the vectorized reference transform
    nums = [float(t) for t in _re.findall(r"[-+]?[0-9.]+(?:[eE][-+]?\d+)?", got)]
    src_nums = [float(t) for t in _re.findall(r"[-+]?[0-9.]+(?:[eE][-+]?\d+)?", src)]
    X, Y = transform_np(
        np.array(src_nums[0::2]), np.array(src_nums[1::2]), "EPSG:4326", "EPSG:3857"
    )
    assert np.allclose(nums[0::2], X, rtol=0, atol=1e-6)
    assert np.allclose(nums[1::2], Y, rtol=0, atol=1e-6)


def test_st_transform_roundtrip_and_nulls(spark):
    pdf = points_pdf(50)
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("tr_pts")
    rows = spark.sql(
        """
        SELECT image_id, st_transform(
            st_transform(st_point(lon, lat), 'EPSG:4326', 'EPSG:32633'),
            'EPSG:32633', 'EPSG:4326') AS w
        FROM tr_pts
        """
    ).collect()
    want = {r: (lo, la) for r, lo, la in zip(pdf["image_id"], pdf["lon"], pdf["lat"])}
    for r in rows:
        _, parts = parse_wkt(r["w"])
        lo, la = want[r["image_id"]]
        # world-spanning fixture points sit far outside UTM 33's zone,
        # where the Krüger series degrades to ~1e-8 deg — allow 1e-6
        assert abs(parts[0][0] - lo) < 1e-6 and abs(parts[0][1] - la) < 1e-6
    # null propagates, EMPTY passes through
    row = spark.sql(
        "SELECT st_transform(CAST(NULL AS STRING), 'EPSG:4326', 'EPSG:3857') AS a, "
        "st_transform('POLYGON EMPTY', 'EPSG:4326', 'EPSG:3857') AS b"
    ).first()
    assert row["a"] is None and row["b"] == "POLYGON EMPTY"


def test_st_transform_out_of_domain_raises(spark):
    """A pole through Mercator is outside the projection domain: fail
    loudly instead of emitting 'POINT (0.0 inf)' (code-review find)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception, match="outside the domain|PythonException|non-finite"):
        spark.sql(
            "SELECT st_transform('POINT (0 90)', 'EPSG:4326', 'EPSG:3395') AS w"
        ).collect()
