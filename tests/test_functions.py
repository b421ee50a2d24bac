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
