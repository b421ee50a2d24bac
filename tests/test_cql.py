"""ECQL front-end tests — mirrors the shape of the reference's
CQLToGeoWaveFilterTest.java cases (comparisons, BBOX, INTERSECTS,
DWITHIN, temporal operators, boolean combinators) against the same
feature fixture the GWQL tests use."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from geowave_spark.cql import cql_filter, cql_query, translate_cql


class TestTranslate:
    def test_comparisons_pass_through(self):
        assert (
            translate_cql("value > 10 AND name = 'abc' OR NOT (value <= 3)")
            == "value > 10 AND name = 'abc' OR NOT ( value <= 3 )"
        )

    def test_bbox(self):
        assert (
            translate_cql("BBOX(geom, -10, -5, 20, 15)").replace(" ", "")
            == "st_bbox(geom,-10,-5,20,15)"
        )

    def test_intersects_bare_wkt(self):
        got = translate_cql("INTERSECTS(geom, POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)))")
        assert got.startswith("st_intersects ( geom ,")
        assert "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'" in got

    def test_dwithin_drops_units(self):
        got = translate_cql("DWITHIN(geom, POINT (5 5), 2.5, meters)")
        assert got.startswith("st_within_distance ( geom ,")
        assert "'POINT (5 5)'" in got and "meters" not in got and "2.5" in got

    def test_temporal_before_after(self):
        got = translate_cql("ts BEFORE 2024-02-01T00:00:00Z")
        assert got == "ts < TIMESTAMP '2024-02-01 00:00:00'"
        got = translate_cql("ts AFTER 2024-02-01")
        assert got == "ts > TIMESTAMP '2024-02-01'"

    def test_during(self):
        got = translate_cql("ts DURING 2024-01-10T00:00:00Z/2024-01-20T00:00:00Z")
        assert (
            got
            == "(ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00')"
        )

    def test_include_exclude(self):
        assert translate_cql("INCLUDE") == "TRUE"
        assert translate_cql("EXCLUDE") == "FALSE"

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            translate_cql("value ~~ @@@")


@pytest.fixture(scope="module")
def features(spark):
    rng = np.random.default_rng(7)
    n = 500
    pdf = pd.DataFrame(
        {
            "fid": np.arange(n),
            "name": [f"feat{i:03d}" for i in range(n)],
            "value": rng.uniform(0, 100, n).round(4),
            "lon": rng.uniform(-60, 60, n).round(3),
            "lat": rng.uniform(-40, 40, n).round(3),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 90, n), unit="D"),
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "geom",
        F.concat(
            F.lit("POINT ("),
            F.col("lon").cast("string"),
            F.lit(" "),
            F.col("lat").cast("string"),
            F.lit(")"),
        ),
    )
    df.createOrReplaceTempView("cql_features")
    return pdf, df


class TestExecute:
    def test_bbox_equals_range_predicate(self, spark, features):
        pdf, df = features
        got = {r["fid"] for r in cql_filter(df, "BBOX(geom, -10, -5, 20, 15)").collect()}
        want = set(
            pdf[
                (pdf.lon >= -10) & (pdf.lon <= 20) & (pdf.lat >= -5) & (pdf.lat <= 15)
            ].fid
        )
        assert got == want and len(want) > 5

    def test_intersects_polygon(self, spark, features):
        from geowave_spark.geom import parse_wkt, points_in_polygon

        pdf, df = features
        wkt = "POLYGON ((0 0, 30 0, 30 25, 0 25, 0 0))"
        got = {
            r["fid"]
            for r in cql_filter(df, f"INTERSECTS(geom, {wkt})").collect()
        }
        poly = parse_wkt(wkt)[1]
        hit = points_in_polygon(pdf.lon.to_numpy(), pdf.lat.to_numpy(), poly)
        assert got == set(pdf.fid[hit])

    def test_dwithin(self, spark, features):
        pdf, df = features
        got = {
            r["fid"]
            for r in cql_filter(df, "DWITHIN(geom, POINT (5 5), 8, meters)").collect()
        }
        d2 = (pdf.lon - 5) ** 2 + (pdf.lat - 5) ** 2
        assert got == set(pdf.fid[d2 <= 64])

    def test_compound_filter(self, spark, features):
        pdf, df = features
        got = {
            r["fid"]
            for r in cql_query(
                spark,
                "cql_features",
                "BBOX(geom, -60, -40, 60, 40) AND value BETWEEN 20 AND 60 "
                "AND ts DURING 2024-01-05T00:00:00Z/2024-02-15T00:00:00Z "
                "AND NOT name LIKE 'feat00%'",
            ).collect()
        }
        m = (
            (pdf.value >= 20)
            & (pdf.value <= 60)
            & (pdf.ts >= pd.Timestamp("2024-01-05"))
            & (pdf.ts < pd.Timestamp("2024-02-15"))
            & ~pdf.name.str.startswith("feat00")
        )
        assert got == set(pdf.fid[m]) and len(got) > 5

    def test_temporal_before(self, spark, features):
        pdf, df = features
        got = {
            r["fid"] for r in cql_filter(df, "ts BEFORE 2024-02-01T00:00:00Z").collect()
        }
        assert got == set(pdf.fid[pdf.ts < pd.Timestamp("2024-02-01")])
