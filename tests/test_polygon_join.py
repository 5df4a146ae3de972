"""Convex polygon-polygon overlay join vs an INDEPENDENT brute force.

The engine uses the separating-axis theorem; the test oracle decides
intersection a different way — any vertex of one inside the other
(half-plane conjunction) OR any pair of edges properly/improperly
crossing (integer orientation tests) — so a shared-math bug cannot
cancel out.
"""

import numpy as np
import pytest

from kdtree_spark.fixtures import gen_convex_polygons
from kdtree_spark.grid import Grid
from kdtree_spark.queries.polygon import polygon_join, polygons_df


def _inside(pt, verts):
    k = len(verts)
    for j in range(k):
        x1, y1 = verts[j]
        x2, y2 = verts[(j + 1) % k]
        if (x2 - x1) * (pt[1] - y1) - (y2 - y1) * (pt[0] - x1) < 0:
            return False
    return True


def _orient(a, b, c):
    v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    return (v > 0) - (v < 0)


def _on_seg(a, b, c):
    return (_orient(a, b, c) == 0
            and min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))


def _seg_cross(a, b, c, d):
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True
    return (_on_seg(a, b, c) or _on_seg(a, b, d)
            or _on_seg(c, d, a) or _on_seg(c, d, b))


def _brute_intersects(va, vb):
    if any(_inside(p, vb) for p in va) or any(_inside(p, va) for p in vb):
        return True
    ka, kb = len(va), len(vb)
    for i in range(ka):
        for j in range(kb):
            if _seg_cross(va[i], va[(i + 1) % ka],
                          vb[j], vb[(j + 1) % kb]):
                return True
    return False


@pytest.mark.parametrize("g", [4, 16, 64])
def test_polygon_join_random(spark, g):
    A = gen_convex_polygons(30, seed=61)
    B = gen_convex_polygons(45, seed=62)
    got = sorted(tuple(r) for r in polygon_join(
        polygons_df(spark, A, "pa"), polygons_df(spark, B, "pb"),
        grid=Grid(g)).collect())
    exp = sorted((a, b) for a, va in A for b, vb in B
                 if _brute_intersects(va, vb))
    assert got == exp
    assert len(exp) > 0


def test_polygon_join_containment_and_diagonal_disjoint(spark):
    """Containment (no edge crossings) must match; bbox-overlapping but
    diagonally-separated pairs must not."""
    big = [(0, [(0, 0), (100_000, 0), (100_000, 100_000), (0, 100_000)])]
    inner = [(10, [(40_000, 40_000), (60_000, 40_000), (50_000, 60_000)])]
    # triangles whose bboxes overlap but a diagonal axis separates them
    t1 = [(20, [(0, 0), (50_000, 0), (0, 50_000)])]
    t2 = [(30, [(60_000, 60_000), (100_000, 30_000), (100_000, 100_000)])]
    A = big + t1
    B = inner + t2
    got = sorted(tuple(r) for r in polygon_join(
        polygons_df(spark, A, "pa"), polygons_df(spark, B, "pb"),
        grid=Grid(16)).collect())
    exp = sorted((a, b) for a, va in A for b, vb in B
                 if _brute_intersects(va, vb))
    assert got == exp
    assert (0, 10) in got          # containment
    assert (20, 30) not in got     # diagonal separation


def test_polygon_join_shared_edge_counts(spark):
    """Polygons sharing only a boundary segment intersect (inclusive)."""
    A = [(0, [(0, 0), (50_000, 0), (50_000, 50_000), (0, 50_000)])]
    B = [(1, [(50_000, 10_000), (90_000, 10_000), (90_000, 40_000),
              (50_000, 40_000)])]
    got = [tuple(r) for r in polygon_join(
        polygons_df(spark, A, "pa"), polygons_df(spark, B, "pb"),
        grid=Grid(8)).collect()]
    assert got == [(0, 1)]


def test_polygon_join_domain_sized_polygon(spark):
    """A polygon covering the whole domain straddles every grid cell;
    the clipped reference-point dedup must still emit each pair once."""
    A = [(0, [(0, 0), (999_999, 0), (999_999, 999_999), (0, 999_999)])]
    B = gen_convex_polygons(25, seed=63)
    got = sorted(tuple(r) for r in polygon_join(
        polygons_df(spark, A, "pa"), polygons_df(spark, B, "pb"),
        grid=Grid(32)).collect())
    assert got == [(0, b) for b, _ in B]
