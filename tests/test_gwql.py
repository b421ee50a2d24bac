"""GWQL front-end tests: translation + execution vs hand-built oracles.

Mirrors the reference's GWQLParserTest / SelectStatementTest coverage
(core/store/src/test/.../gwql/): selectors, aggregates, predicate
functions, casts, temporal operators, LIMIT, DELETE.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.gwql import run, translate


class TestTranslate:
    def test_bbox_predicate(self):
        sql = translate("SELECT * FROM t WHERE BBOX(geom, -1, -2, 3, 4)")
        assert "st_bbox ( geom , - 1 , - 2 , 3 , 4 )" in sql

    def test_loose_variants(self):
        assert "st_bbox_loose" in translate("SELECT * FROM t WHERE BBOXLOOSE(g,0,0,1,1)")
        assert "st_intersects_loose" in translate(
            "SELECT * FROM t WHERE INTERSECTSLOOSE(g, 'POINT (0 0)')"
        )
        assert "not st_intersects_loose" in translate(
            "SELECT * FROM t WHERE DISJOINTLOOSE(g, 'POINT (0 0)')"
        )

    def test_include_exclude(self):
        assert translate("SELECT * FROM t WHERE INCLUDE").endswith("TRUE")
        assert translate("SELECT * FROM t WHERE EXCLUDE").endswith("FALSE")

    def test_casts(self):
        sql = translate("SELECT a::text, b::number FROM t WHERE c = 'x'::geometry")
        assert ":: string" in sql and ":: double" in sql and "'x' =" not in sql
        assert "c = 'x'" in sql  # geometry cast is identity

    def test_temporal_infix(self):
        assert "ts <" in translate("SELECT * FROM t WHERE ts BEFORE '2024-01-01'")
        assert "ts >=" in translate("SELECT * FROM t WHERE ts DURING_OR_AFTER '2024-01-01'")
        sql = translate("SELECT * FROM t WHERE ts DURING '2024-01-01T00:00:00/2024-02-01T00:00:00'")
        assert ">= TIMESTAMP '2024-01-01T00:00:00'" in sql and "< TIMESTAMP" in sql

    def test_bbox_aggregate_expansion(self):
        sql = translate("SELECT BBOX(geom) FROM t")
        for c in ("bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"):
            assert c in sql

    def test_delete_is_survivor_select(self):
        sql = translate("DELETE FROM t WHERE a = 1")
        assert sql.startswith("SELECT * FROM t WHERE NOT")

    def test_text_predicates(self):
        sql = translate("SELECT * FROM t WHERE strStartsWith(a,'x') AND strEndsWith(b,'y') AND strContains(c,'z')")
        assert "startswith" in sql and "endswith" in sql and "contains" in sql

    def test_limit(self):
        assert translate("SELECT a FROM t LIMIT 7").endswith("LIMIT 7")

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            translate("UPSERT INTO t VALUES (1)")


@pytest.fixture(scope="module")
def gwql_views(spark):
    rng = np.random.default_rng(7)
    n = 500
    lon = rng.uniform(-60, 60, n).round(3)
    lat = rng.uniform(-40, 40, n).round(3)
    pdf = pd.DataFrame(
        {
            "fid": np.arange(n),
            "name": [f"feat{i:03d}" for i in range(n)],
            "value": rng.uniform(0, 100, n).round(4),
            "lon": lon,
            "lat": lat,
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 90, n), unit="D"),
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "geom",
        F.concat(
            F.lit("POINT ("), F.col("lon").cast("string"), F.lit(" "), F.col("lat").cast("string"), F.lit(")")
        ),
    )
    df.createOrReplaceTempView("features")
    return pdf


class TestRun:
    def test_bbox_filter_matches_range(self, spark, gwql_views):
        pdf = gwql_views
        got = run(spark, "SELECT fid FROM features WHERE BBOX(geom, -10, -5, 20, 15)")
        want = set(
            pdf.fid[(pdf.lon >= -10) & (pdf.lon <= 20) & (pdf.lat >= -5) & (pdf.lat <= 15)]
        )
        assert set(r.fid for r in got.collect()) == want

    def test_bbox_aggregate(self, spark, gwql_views):
        pdf = gwql_views
        row = run(spark, "SELECT BBOX(geom) FROM features WHERE value < 50").collect()[0]
        sub = pdf[pdf.value < 50]
        assert row.bbox_minx == pytest.approx(sub.lon.min())
        assert row.bbox_maxy == pytest.approx(sub.lat.max())

    def test_temporal_and_text(self, spark, gwql_views):
        pdf = gwql_views
        got = run(
            spark,
            "SELECT COUNT(*) AS n FROM features WHERE ts AFTER '2024-02-01'::date AND strEndsWith(name, '7')",
        ).collect()[0]
        want = int(
            ((pdf.ts > pd.Timestamp("2024-02-01")) & pdf.name.str.endswith("7")).sum()
        )
        assert got.n == want

    def test_during(self, spark, gwql_views):
        pdf = gwql_views
        got = run(
            spark,
            "SELECT COUNT(*) AS n FROM features WHERE ts DURING '2024-01-10T00:00:00/2024-01-20T00:00:00'",
        ).collect()[0]
        want = int(
            ((pdf.ts >= pd.Timestamp("2024-01-10")) & (pdf.ts < pd.Timestamp("2024-01-20"))).sum()
        )
        assert got.n == want

    def test_intersects_polygon_literal(self, spark, gwql_views):
        pdf = gwql_views
        got = run(
            spark,
            "SELECT fid FROM features WHERE INTERSECTS("
            "'POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0))'::geometry, geom)",
        )
        want = set(
            pdf.fid[(pdf.lon >= 0) & (pdf.lon <= 30) & (pdf.lat >= 0) & (pdf.lat <= 30)]
        )
        assert set(r.fid for r in got.collect()) == want

    def test_delete_returns_survivors(self, spark, gwql_views):
        pdf = gwql_views
        got = run(spark, "DELETE FROM features WHERE value >= 10")
        assert got.count() == int((pdf.value < 10).sum())

    def test_limit(self, spark, gwql_views):
        assert run(spark, "SELECT fid FROM features LIMIT 5").count() == 5


class TestNewPredicates:
    def test_overlaps_touches_crosses(self, spark):
        rows = [
            # a, b overlap partially; c contains d; e touches a at an edge
            ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", True),
            ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", False),
        ]
        df = spark.createDataFrame(rows, "a string, b string, want boolean")
        from geowave_spark.functions.registry import register_all

        register_all(spark)
        df.createOrReplaceTempView("pairs")
        got = spark.sql("SELECT st_overlaps(a, b) AS o, want FROM pairs").collect()
        for r in got:
            assert r.o == r.want
        touch = spark.sql(
            "SELECT st_touches('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))',"
            " 'POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))') AS t"
        ).collect()[0]
        assert touch.t
        cross = spark.sql(
            "SELECT st_crosses('LINESTRING (-1 0.5, 3 0.5)',"
            " 'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS c,"
            " st_crosses('POINT (0 0)', 'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS c2"
        ).collect()[0]
        assert cross.c and not cross.c2
