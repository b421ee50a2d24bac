"""SQL spatial-join injection (sql_join.py — SqlQueryRunner analog):
injected execution must return exactly the rows of evaluating the
original SQL directly (the reference's IT compares the same way)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from geowave_spark.functions.registry import register_all
from geowave_spark.sql_join import run_spatial_sql


@pytest.fixture(scope="module")
def views(spark):
    rng = np.random.default_rng(3)
    n = 600
    pts = pd.DataFrame(
        {
            "pid": np.arange(n),
            "kind": [f"k{v}" for v in rng.integers(0, 4, n)],
            "lon": rng.uniform(-50, 50, n).round(3),
            "lat": rng.uniform(-30, 30, n).round(3),
        }
    )
    a = spark.createDataFrame(pts).withColumn(
        "geom",
        F.concat(
            F.lit("POINT ("),
            F.col("lon").cast("string"),
            F.lit(" "),
            F.col("lat").cast("string"),
            F.lit(")"),
        ),
    ).drop("lon", "lat")
    a.createOrReplaceTempView("sj_points")
    b = spark.createDataFrame(
        pd.DataFrame(
            {
                "oid": np.arange(200, 200 + n // 2),
                "lon": rng.uniform(-50, 50, n // 2).round(3),
                "lat": rng.uniform(-30, 30, n // 2).round(3),
            }
        )
    ).withColumn(
        "geom",
        F.concat(
            F.lit("POINT ("),
            F.col("lon").cast("string"),
            F.lit(" "),
            F.col("lat").cast("string"),
            F.lit(")"),
        ),
    ).drop("lon", "lat")
    b.createOrReplaceTempView("sj_other")
    rng2 = np.random.default_rng(5)
    rows = []
    for i in range(40):
        cx, cy = rng2.uniform(-40, 40), rng2.uniform(-25, 25)
        w, h = rng2.uniform(1, 6), rng2.uniform(1, 6)
        rows.append(
            (
                int(i),
                f"POLYGON (({cx - w} {cy - h}, {cx + w} {cy - h}, "
                f"{cx + w} {cy + h}, {cx - w} {cy + h}, {cx - w} {cy - h}))",
            )
        )
    spark.createDataFrame(rows, "rid int, geom string").createOrReplaceTempView(
        "sj_regions"
    )
    register_all(spark)
    return spark


class TestInjection:
    def test_distance_join_injection_matches_direct(self, spark, views):
        sql = (
            "SELECT a.pid, b.oid FROM sj_points a, sj_other b "
            "WHERE st_within_distance(a.geom, b.geom, 1.5) AND a.kind = 'k1'"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want and len(want) > 5

    def test_pip_injection_matches_direct(self, spark, views):
        sql = (
            "SELECT a.pid, r.rid FROM sj_points a JOIN sj_regions r "
            "ON st_within(a.geom, r.geom)"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want and len(want) > 10

    def test_contains_orientation(self, spark, views):
        sql = (
            "SELECT r.rid, a.pid FROM sj_regions r, sj_points a "
            "WHERE st_contains(r.geom, a.geom)"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want

    def test_aggregate_over_injected_join(self, spark, views):
        sql = (
            "SELECT a.kind, count(*) AS n FROM sj_points a, sj_other b "
            "WHERE st_within_distance(a.geom, b.geom, 2.0) GROUP BY a.kind"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want

    def test_non_spatial_sql_falls_back(self, spark, views):
        sql = "SELECT kind, count(*) AS n FROM sj_points GROUP BY kind"
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want


class TestInjectionGuards:
    """Round-2 verdict #1 / ADVICE: compound WHERE, non-POINT pairs and
    self-joins must never change the row set."""

    def test_or_predicate_equals_uninjected(self, spark, views):
        """Spatial predicate under OR: rows satisfying only the other
        branch must survive (the round-2 bug pruned them)."""
        sql = (
            "SELECT a.pid, b.oid FROM sj_points a, sj_other b "
            "WHERE st_within_distance(a.geom, b.geom, 1.0) OR a.kind = 'k2'"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want
        # the OR branch really contributes rows beyond the spatial hits
        spatial_only = {
            tuple(r)
            for r in spark.sql(
                "SELECT a.pid, b.oid FROM sj_points a, sj_other b "
                "WHERE st_within_distance(a.geom, b.geom, 1.0)"
            ).collect()
        }
        assert len(want) > len(spatial_only)

    def test_not_predicate_equals_uninjected(self, spark, views):
        sql = (
            "SELECT a.pid, r.rid FROM sj_points a, sj_regions r "
            "WHERE NOT st_within(a.geom, r.geom) AND a.kind = 'k0'"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want and len(want) > 10

    def test_polygon_polygon_injection_matches_direct(self, spark, views):
        """Round-2 ADVICE: neither side POINT used to inject empty views;
        now it routes through the tiered pair join — and must still equal
        direct evaluation."""
        sql = (
            "SELECT x.rid AS xr, y.rid AS yr FROM sj_regions x, sj_regions2 y "
            "WHERE st_within_distance(x.geom, y.geom, 2.0)"
        )
        spark.table("sj_regions").withColumnRenamed("rid", "rid").limit(25).createOrReplaceTempView("sj_regions2")
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want and len(want) > 3

    def test_self_join_asymmetric_contains(self, spark, views):
        """FROM t a, t b with an asymmetric predicate: per-side injected
        views (round-2 ADVICE — one shared view dropped rows)."""
        spark.sql("SELECT * FROM sj_regions").createOrReplaceTempView("sj_mixed")
        sql = (
            "SELECT a.rid AS ar, b.rid AS br FROM sj_mixed a, sj_mixed b "
            "WHERE st_intersects(a.geom, b.geom) AND a.rid < b.rid"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want and len(want) > 0

    def test_unrecognized_geometry_kind_returns_none(self, spark, views):
        """Unit guard: _indexed_pairs refuses to guess on unknown WKT
        kinds (injection would silently return empty views)."""
        from geowave_spark.sql_join import _indexed_pairs

        weird = spark.sql(
            "SELECT pid, 'CIRCULARSTRING (0 0, 1 1, 2 0)' AS geom FROM sj_points LIMIT 5"
        )
        other = spark.table("sj_other")
        assert (
            _indexed_pairs(spark, weird, "geom", other, "geom", "st_within_distance", 1.0)
            is None
        )


class TestPlanLevelDetection:
    """r3: detection walks Spark's parsed logical plan (SqlQueryRunner's
    approach) instead of regexing the SQL text."""

    def test_scalar_subquery_third_relation_falls_back(self, spark, views):
        # a scalar subquery re-reads sj_points: swapping in the pruned
        # view would corrupt the count — the 3-relation rule must refuse
        sql = """
        SELECT a.pid, b.oid, (SELECT count(*) FROM sj_points) AS total
        FROM sj_points a, sj_other b
        WHERE st_within_distance(a.geom, b.geom, 0.5) AND a.kind = 'k1'
        """
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want
        n = spark.table("sj_points").count()
        assert all(t == n for _, _, t in got)

    def test_cte_falls_back(self, spark, views):
        # r4 (ADVICE high): CTE definitions live in UnresolvedWith
        # innerChildren — invisible to a children()-only walk; the CTE
        # alias must NOT be treated as a relation (it crashed at
        # spark.table before the fix)
        sql = """
        WITH c AS (SELECT * FROM sj_points WHERE pid < 100)
        SELECT a.pid, b.oid FROM c a, sj_other b
        WHERE st_within_distance(a.geom, b.geom, 0.8)
        """
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want and len(want) > 0

    def test_cte_shadowing_temp_view_not_misprimed(self, spark, views):
        # worse than the crash: if a temp view shares the CTE's name, the
        # pre-fix walker injected against the WRONG relation and returned
        # silently wrong rows
        spark.table("sj_points").limit(3).createOrReplaceTempView("c")
        try:
            sql = """
            WITH c AS (SELECT * FROM sj_points WHERE pid < 100)
            SELECT a.pid, b.oid FROM c a, sj_other b
            WHERE st_within_distance(a.geom, b.geom, 0.8)
            """
            got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
            want = {tuple(r) for r in spark.sql(sql).collect()}
            assert got == want and len(want) > 0
        finally:
            spark.catalog.dropTempView("c")

    def test_subquery_referencing_swapped_table_falls_back(self, spark, views):
        # a scalar subquery over one of the two FROM relations: swapping
        # in the pruned view would corrupt the subquery's result — the
        # subqueriesAll() bail must refuse injection
        sql = """
        SELECT a.pid, b.oid,
               (SELECT max(pid) FROM sj_points) AS mx
        FROM sj_points a, sj_other b
        WHERE st_within_distance(a.geom, b.geom, 0.5)
        """
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want
        mx = spark.table("sj_points").agg(F.max("pid")).first()[0]
        assert all(m == mx for _, _, m in got)

    def test_mixed_kind_column_falls_back_correctly(self, spark, views):
        # r4 (ADVICE medium): a column whose first row is POINT but later
        # rows are POLYGON must not take the point fast path (its regex
        # nulls the polygons out of the prune pairs — lost rows)
        pts = spark.table("sj_points").selectExpr("pid AS mid", "geom")
        polys = spark.table("sj_regions").selectExpr("rid + 100000 AS mid", "geom")
        pts.union(polys).createOrReplaceTempView("sj_mixed")
        try:
            sql = """
            SELECT m.mid, r.rid FROM sj_mixed m JOIN sj_regions r
            ON st_intersects(r.geom, m.geom)
            """
            got = {tuple(x) for x in run_spatial_sql(spark, sql).collect()}
            want = {tuple(x) for x in spark.sql(sql).collect()}
            assert got == want
            # the mixed relation's polygon rows must appear in the result
            assert any(mid >= 100000 for mid, _ in got)
        finally:
            spark.catalog.dropTempView("sj_mixed")

    def test_qualified_table_name_falls_back(self, spark, views):
        # db-qualified names are out of swap scope; must still run fine
        sql = """
        SELECT a.pid, b.oid FROM sj_points a JOIN sj_other b
        ON st_within_distance(a.geom, b.geom, 0.5)
        """
        base = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        assert base == {tuple(r) for r in spark.sql(sql).collect()}

    def test_expression_argument_falls_back(self, spark, views):
        # predicate over an expression (not a plain column): no injection,
        # still correct
        sql = """
        SELECT a.pid, b.oid FROM sj_points a, sj_other b
        WHERE st_within_distance(concat(a.geom, ''), b.geom, 0.5)
        """
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want

    def test_views_restored_after_injection(self, spark, views):
        sql = """
        SELECT a.pid, b.oid FROM sj_points a, sj_other b
        WHERE st_within_distance(a.geom, b.geom, 0.5)
        """
        n_pts = spark.table("sj_points").count()
        n_oth = spark.table("sj_other").count()
        run_spatial_sql(spark, sql).collect()
        # the session's views must be the ORIGINAL relations afterwards
        assert spark.table("sj_points").count() == n_pts
        assert spark.table("sj_other").count() == n_oth

    def test_on_clause_conjunct_with_filter(self, spark, views):
        sql = """
        SELECT a.pid, b.oid FROM sj_points a JOIN sj_other b
        ON st_within_distance(a.geom, b.geom, 0.8) AND a.kind = 'k2'
        WHERE b.oid % 2 = 0
        """
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want

    def test_case_in_other_conjunct_still_injects_correctly(self, spark, views):
        # the old text check refused any CASE in the WHERE; plan-level
        # only requires the SPATIAL predicate to be a top-level conjunct
        sql = """
        SELECT a.pid, b.oid FROM sj_points a, sj_other b
        WHERE st_within_distance(a.geom, b.geom, 0.5)
          AND CASE WHEN a.kind = 'k1' THEN 1 ELSE 0 END = 1
        """
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want


class TestDe9imInjection:
    """r3: the full DE-9IM family injects via the intersects-superset
    prune; results must equal the un-injected spark.sql in every case."""

    @pytest.mark.parametrize(
        "pred",
        ["st_touches", "st_crosses", "st_overlaps", "st_covers", "st_equals"],
    )
    def test_point_region_predicates_match_direct(self, spark, views, pred):
        sql = (
            f"SELECT a.pid, r.rid FROM sj_points a JOIN sj_regions r "
            f"ON {pred}(r.geom, a.geom)"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want

    def test_region_region_touches_matches_direct(self, spark, views):
        sql = (
            "SELECT r1.rid a, r2.rid b FROM sj_regions r1 JOIN sj_regions r2 "
            "ON st_overlaps(r1.geom, r2.geom) WHERE r1.rid < r2.rid"
        )
        got = {tuple(r) for r in run_spatial_sql(spark, sql).collect()}
        want = {tuple(r) for r in spark.sql(sql).collect()}
        assert got == want and len(want) > 0
