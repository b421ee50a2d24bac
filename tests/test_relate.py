"""Exact DE-9IM relate — fixtures with known JTS truth + invariants.

Every expected value below is the answer JTS RelateOp gives (the
reference's GeomTouches/GeomCrosses/GeomOverlaps/GeomContains/GeomEquals
UDFs delegate to it) — including the cases the r2 vertex-sample
approximations got wrong: collinear shared edges, identical geometries,
polygons equal to another polygon's hole, line/line contact taxonomy.
"""

from __future__ import annotations

import numpy as np
import pytest

from geowave_spark.geom import parse_wkt_multi
from geowave_spark.relate import (
    prepare,
    relate,
    relate_contains,
    relate_covers,
    relate_crosses,
    relate_equals,
    relate_intersects,
    relate_overlaps,
    relate_touches,
)


def g(w: str):
    return prepare(parse_wkt_multi(w))


SQ1 = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
ANN = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"

# (name, predicate, wkt_a, wkt_b, expected)
CASES = [
    # --- polygon × polygon ------------------------------------------------
    ("edge-share touches", relate_touches, SQ1, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", True),
    ("edge-share overlaps", relate_overlaps, SQ1, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", False),
    ("corner touches", relate_touches, SQ1, "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))", True),
    ("overlap overlaps", relate_overlaps, SQ1, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", True),
    ("overlap touches", relate_touches, SQ1, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", False),
    ("identical equals", relate_equals, SQ1, SQ1, True),
    ("identical contains", relate_contains, SQ1, SQ1, True),
    ("identical touches", relate_touches, SQ1, SQ1, False),
    ("identical overlaps", relate_overlaps, SQ1, SQ1, False),
    ("contains inner", relate_contains, SQ1, "POLYGON ((0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))", True),
    ("disjoint", relate_intersects, SQ1, "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))", False),
    # collinear partial overlap: NO proper crossing, NO strict vertex —
    # the case vertex sampling cannot decide
    ("snake overlaps", relate_overlaps, "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))", "POLYGON ((1 0, 3 0, 3 1, 1 1, 1 0))", True),
    ("snake touches", relate_touches, "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))", "POLYGON ((1 0, 3 0, 3 1, 1 1, 1 0))", False),
    ("half-with-shared-edge contains", relate_contains, "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", True),
    ("partial-edge touch", relate_touches, "POLYGON ((0 0, 4 0, 4 1, 0 1, 0 0))", "POLYGON ((1 -1, 2 -1, 2 0, 1 0, 1 -1))", True),
    # --- holes ------------------------------------------------------------
    ("in-hole disjoint", relate_intersects, ANN, "POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))", False),
    ("fills-hole touches", relate_touches, ANN, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", True),
    ("fills-hole contains", relate_contains, ANN, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", False),
    ("annulus contains band poly", relate_contains, ANN, "POLYGON ((0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))", True),
    # --- multipolygon -----------------------------------------------------
    ("mp one-in-one-out overlaps", relate_overlaps, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "MULTIPOLYGON (((0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2)), ((5 5, 6 5, 6 6, 5 6, 5 5)))", True),
    ("mp one-in-one-out contains", relate_contains, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "MULTIPOLYGON (((0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2)), ((5 5, 6 5, 6 6, 5 6, 5 5)))", False),
    # --- line × line --------------------------------------------------------
    ("X crosses", relate_crosses, "LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)", True),
    ("X touches", relate_touches, "LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)", False),
    ("T touches", relate_touches, "LINESTRING (0 0, 2 2)", "LINESTRING (1 1, 1 3)", True),
    ("T crosses", relate_crosses, "LINESTRING (0 0, 2 2)", "LINESTRING (1 1, 1 3)", False),
    ("end-end touches", relate_touches, "LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 3 3)", True),
    ("collinear-overlap overlaps", relate_overlaps, "LINESTRING (0 0, 2 2)", "LINESTRING (1 1, 3 3)", True),
    ("collinear-overlap crosses", relate_crosses, "LINESTRING (0 0, 2 2)", "LINESTRING (1 1, 3 3)", False),
    ("line equals reversed", relate_equals, "LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 0 0)", True),
    ("line equals re-vertexed", relate_equals, "LINESTRING (0 0, 2 2)", "LINESTRING (0 0, 1 1, 2 2)", True),
    ("sub-line contains", relate_contains, "LINESTRING (0 0, 2 2)", "LINESTRING (0.5 0.5, 1 1)", True),
    # --- line × polygon -----------------------------------------------------
    ("through crosses", relate_crosses, "LINESTRING (-1 1, 3 1)", SQ1, True),
    ("poly crossed by line (transpose)", relate_crosses, SQ1, "LINESTRING (-1 1, 3 1)", True),
    ("edge-line touches", relate_touches, "LINESTRING (0 0, 2 0)", SQ1, True),
    ("edge-line crosses", relate_crosses, "LINESTRING (0 0, 2 0)", SQ1, False),
    ("poly contains interior line", relate_contains, SQ1, "LINESTRING (0.5 0.5, 1.5 1.5)", True),
    ("poly contains edge line = False", relate_contains, SQ1, "LINESTRING (0 0, 2 0)", False),
    ("poly covers edge line", relate_covers, SQ1, "LINESTRING (0 0, 2 0)", True),
    ("poly contains chord (bnd endpoints)", relate_contains, SQ1, "LINESTRING (0 0, 2 2)", True),
    ("edge-then-enter not crosses", relate_crosses, "LINESTRING (0 0, 1 0, 1 0.5)", SQ1, False),
    ("edge-then-enter contained", relate_contains, SQ1, "LINESTRING (0 0, 1 0, 1 0.5)", True),
    ("half-outside edge line touches", relate_touches, "LINESTRING (-1 0, 1 0)", SQ1, True),
    ("line through hole crosses", relate_crosses, "LINESTRING (2 -1, 2 5)", ANN, True),
    ("line inside hole disjoint", relate_intersects, "LINESTRING (1.5 2, 2.5 2)", ANN, False),
    # --- point cases --------------------------------------------------------
    ("pt-boundary touches", relate_touches, "POINT (2 1)", SQ1, True),
    ("pt-interior touches = False", relate_touches, "POINT (1 1)", SQ1, False),
    ("poly contains bnd pt = False", relate_contains, SQ1, "POINT (2 1)", False),
    ("poly covers bnd pt", relate_covers, SQ1, "POINT (2 1)", True),
    ("pt at line end touches", relate_touches, "POINT (0 0)", "LINESTRING (0 0, 2 2)", True),
    ("pt on line interior touches = False", relate_touches, "POINT (1 1)", "LINESTRING (0 0, 2 2)", False),
    ("multipoint crosses poly", relate_crosses, "MULTIPOINT ((1 1), (5 5))", SQ1, True),
    ("pt equals pt", relate_equals, "POINT (1 1)", "POINT (1 1)", True),
    ("pt touches pt = False (JTS)", relate_touches, "POINT (1 1)", "POINT (1 1)", False),
    # closed linestring: empty boundary (OGC mod-2) — nothing touches it
    ("pt on closed-line ring touches = False", relate_touches, "POINT (1 0)", "LINESTRING (0 0, 1 0, 1 1, 0 0)", False),
    ("hole boundary pt touches annulus", relate_touches, "POINT (1 2)", ANN, True),
]


@pytest.mark.parametrize("name,pred,wa,wb,want", CASES, ids=[c[0] for c in CASES])
def test_relate_fixtures(name, pred, wa, wb, want):
    assert pred(g(wa), g(wb)) == want


def test_relate_matrix_symmetry_transpose():
    a, b = g(SQ1), g("LINESTRING (-1 1, 3 1)")
    M, _ = relate(a, b)
    Mt, _ = relate(b, a)
    assert np.array_equal(M, Mt.T)


@pytest.mark.parametrize("seed", range(20))
def test_relate_invariants_random(seed):
    """JTS predicate algebra on random geometry pairs: symmetry of
    intersects/touches/overlaps/equals, crosses ⇒ intersects ∧ ¬touches,
    contains ⇒ covers ∧ intersects, equals ⇒ covers both ways, and
    touches ∧ overlaps mutually exclusive."""
    rng = np.random.default_rng(seed)

    def rand_geom():
        k = rng.integers(0, 3)
        if k == 0:
            x, y = rng.integers(-2, 4, size=2)
            return g(f"POINT ({x} {y})")
        if k == 1:
            pts = rng.integers(-2, 4, size=(3, 2))
            body = ", ".join(f"{p[0]} {p[1]}" for p in pts)
            return g(f"LINESTRING ({body})")
        x, y = rng.integers(-2, 3, size=2)
        w, h = rng.integers(1, 3, size=2)
        return g(
            f"POLYGON (({x} {y}, {x+w} {y}, {x+w} {y+h}, {x} {y+h}, {x} {y}))"
        )

    for _ in range(20):
        a, b = rand_geom(), rand_geom()
        assert relate_intersects(a, b) == relate_intersects(b, a)
        assert relate_touches(a, b) == relate_touches(b, a)
        assert relate_overlaps(a, b) == relate_overlaps(b, a)
        assert relate_equals(a, b) == relate_equals(b, a)
        assert relate_crosses(a, b) == relate_crosses(b, a)
        if relate_crosses(a, b):
            assert relate_intersects(a, b) and not relate_touches(a, b)
        if relate_touches(a, b):
            assert relate_intersects(a, b) and not relate_overlaps(a, b)
        if relate_contains(a, b):
            assert relate_covers(a, b) and relate_intersects(a, b)
        if relate_equals(a, b):
            assert relate_covers(a, b) and relate_covers(b, a)
        # degenerate-aware: skip zero-area/length randoms crash-check only
        relate(a, b)


def test_registry_exact_predicates_sql(spark):
    """The SQL surface reflects the exact semantics (the old vertex-sample
    st_overlaps reported collinear edge-sharing squares as overlapping)."""
    from geowave_spark.functions.registry import register_all

    register_all(spark)
    df = spark.createDataFrame(
        [
            (SQ1, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"),
            ("POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))", "POLYGON ((1 0, 3 0, 3 1, 1 1, 1 0))"),
            ("LINESTRING (0 0, 2 2)", "LINESTRING (1 1, 3 3)"),
        ],
        "a string, b string",
    )
    df.createOrReplaceTempView("pairs_relate")
    rows = spark.sql(
        """SELECT st_touches(a, b) t, st_overlaps(a, b) o, st_crosses(a, b) c,
                  st_equals(a, a) e, st_covers(a, a) cv
           FROM pairs_relate ORDER BY a"""
    ).collect()
    # sorted by a: LINESTRING…, POLYGON ((0 0, 2 0, 2 1…, POLYGON ((0 0, 2 0, 2 2…
    assert [(r.t, r.o, r.c) for r in rows] == [
        (False, True, False),   # collinear overlapping lines
        (False, True, False),   # snake rectangles
        (True, False, False),   # edge-sharing squares
    ]
    assert all(r.e and r.cv for r in rows)


def test_point_fast_path_matches_relate(spark):
    """The vectorized point-side locate() fast path in the registry must
    agree with the full per-pair DE-9IM evaluation for every predicate,
    on a mix of interior/boundary/exterior points AND non-point rows
    (which exercise the slow-path fallback in the same batch)."""
    from geowave_spark.functions.registry import register_all

    register_all(spark)
    region = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    line = "LINESTRING (0 0, 4 4)"
    bs = [
        "POINT (0.5 0.5)",   # in the band
        "POINT (2 2)",       # in the hole
        "POINT (1 2)",       # on the hole boundary
        "POINT (0 0)",       # on the exterior corner
        "POINT (9 9)",       # outside
        "POINT (2 2)",
        line,                 # non-point row → slow path in the same batch
        "POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))",
    ]
    df = spark.createDataFrame([(region, b) for b in bs], "a string, b string")
    df.createOrReplaceTempView("fastslow")
    rows = spark.sql(
        """SELECT st_contains(a, b) c, st_within(b, a) w, st_covers(a, b) cv,
                  st_covered_by(b, a) cb, st_touches(a, b) t, st_touches(b, a) t2
           FROM fastslow"""
    ).collect()
    from geowave_spark.geom import parse_wkt_multi
    from geowave_spark.relate import (
        prepare,
        relate_contains,
        relate_covers,
        relate_touches,
    )

    ga = prepare(parse_wkt_multi(region))
    for r, b in zip(rows, bs):
        gb = prepare(parse_wkt_multi(b))
        assert r.c == relate_contains(ga, gb), b
        assert r.w == relate_contains(ga, gb), b
        assert r.cv == relate_covers(ga, gb), b
        assert r.cb == relate_covers(ga, gb), b
        assert r.t == relate_touches(ga, gb), b
        assert r.t2 == relate_touches(gb, ga), b


@pytest.mark.parametrize("seed", range(5))
def test_relate_rect_closed_form_property(seed):
    """500 random lattice-rectangle pairs per seed against the closed-form
    DE-9IM truth for axis-aligned rectangles (interval arithmetic, fully
    independent of the relate machinery)."""
    rng = np.random.default_rng(100 + seed)
    for _ in range(500):
        ax0, ay0 = rng.integers(0, 8, size=2)
        aw, ah = rng.integers(1, 4, size=2)
        bx0, by0 = rng.integers(0, 8, size=2)
        bw, bh = rng.integers(1, 4, size=2)
        ax1, ay1 = ax0 + aw, ay0 + ah
        bx1, by1 = bx0 + bw, by0 + bh
        a = g(f"POLYGON (({ax0} {ay0}, {ax1} {ay0}, {ax1} {ay1}, {ax0} {ay1}, {ax0} {ay0}))")
        b = g(f"POLYGON (({bx0} {by0}, {bx1} {by0}, {bx1} {by1}, {bx0} {by1}, {bx0} {by0}))")
        closures = ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1
        interiors = min(ax1, bx1) > max(ax0, bx0) and min(ay1, by1) > max(ay0, by0)
        a_cov_b = ax0 <= bx0 and ax1 >= bx1 and ay0 <= by0 and ay1 >= by1
        b_cov_a = bx0 <= ax0 and bx1 >= ax1 and by0 <= ay0 and by1 >= ay1
        key = (ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
        assert relate_intersects(a, b) == closures, key
        assert relate_touches(a, b) == (closures and not interiors), key
        assert relate_overlaps(a, b) == (interiors and not a_cov_b and not b_cov_a), key
        assert relate_contains(a, b) == a_cov_b, key
        assert relate_covers(a, b) == a_cov_b, key
        assert relate_equals(a, b) == (a_cov_b and b_cov_a), key
        assert relate_crosses(a, b) is False, key


@pytest.mark.parametrize("seed", range(5))
def test_relate_sheared_lattice_closed_form_property(seed):
    """Rotated/sheared sweep (round-3 ADVICE): the rectangle closed-form
    truth pushed through random unimodular integer affine maps.  Such a
    map (det ±1, integer entries, small translation) is a topological
    homeomorphism, so every DE-9IM predicate is invariant — and since
    lattice points map to lattice points, the transformed coordinates
    stay EXACT doubles, keeping the closed-form truth sound for inputs
    with non-axis-aligned (sheared, 90°-rotated, reflected) edges."""
    from geowave_spark.relate import prepare

    rng = np.random.default_rng(300 + seed)
    maps = [
        np.array([[1, 2], [0, 1]]),    # shear x by 2y
        np.array([[1, 0], [3, 1]]),    # shear y by 3x
        np.array([[0, -1], [1, 0]]),   # rotate 90°
        np.array([[2, 1], [1, 1]]),    # general unimodular (diagonal edges)
        np.array([[-1, 0], [0, 1]]),   # reflect x
        np.array([[1, 1], [1, 2]]),    # another unimodular shear
    ]

    def poly(x0, y0, x1, y1, T, tx, ty):
        pts = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        q = pts @ T.T + np.array([tx, ty])
        ring = ", ".join(f"{int(px)} {int(py)}" for px, py in q)
        return prepare(parse_wkt_multi(f"POLYGON (({ring}))"))

    for _ in range(250):
        ax0, ay0 = rng.integers(0, 8, size=2)
        aw, ah = rng.integers(1, 4, size=2)
        bx0, by0 = rng.integers(0, 8, size=2)
        bw, bh = rng.integers(1, 4, size=2)
        ax1, ay1 = ax0 + aw, ay0 + ah
        bx1, by1 = bx0 + bw, by0 + bh
        closures = ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1
        interiors = min(ax1, bx1) > max(ax0, bx0) and min(ay1, by1) > max(ay0, by0)
        a_cov_b = ax0 <= bx0 and ax1 >= bx1 and ay0 <= by0 and ay1 >= by1
        b_cov_a = bx0 <= ax0 and bx1 >= ax1 and by0 <= ay0 and by1 >= ay1
        T = maps[int(rng.integers(0, len(maps)))]
        tx, ty = rng.integers(-5, 6, size=2)
        a = poly(ax0, ay0, ax1, ay1, T, tx, ty)
        b = poly(bx0, by0, bx1, by1, T, tx, ty)
        key = (ax0, ay0, ax1, ay1, bx0, by0, bx1, by1, T.tolist(), tx, ty)
        assert relate_intersects(a, b) == closures, key
        assert relate_touches(a, b) == (closures and not interiors), key
        assert relate_overlaps(a, b) == (interiors and not a_cov_b and not b_cov_a), key
        assert relate_contains(a, b) == a_cov_b, key
        assert relate_covers(a, b) == a_cov_b, key
        assert relate_equals(a, b) == (a_cov_b and b_cov_a), key
        assert relate_crosses(a, b) is False, key
