"""Property-based differential tests (hypothesis): random point sets,
batch shapes, duplicates, and update sequences vs the brute-force
oracle — the randomized counterpart of test_localtree's fixed cases."""

import numpy as np
from hypothesis import given, settings, strategies as st

from kdtree_spark import bruteforce as bf
from kdtree_spark.localtree import LocalKDTree


def _pts(draw, n, d, lo=0, hi=1000):
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    pts = rng.integers(lo, hi, size=(n, d), dtype=np.int64)
    ids = rng.permutation(n).astype(np.int64) * 13 + 1
    return rng, pts, ids


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_knn_matches_bruteforce(data):
    n = data.draw(st.integers(1, 400))
    d = data.draw(st.sampled_from([2, 3, 5]))
    k = data.draw(st.sampled_from([1, 3, 17]))
    # small domain => plenty of duplicate coords and distance ties
    rng, pts, ids = _pts(data.draw, n, d, hi=data.draw(
        st.sampled_from([4, 50, 1000])))
    t = LocalKDTree.build(pts, ids)
    m = data.draw(st.integers(1, 30))
    q = rng.integers(0, 1000, size=(m, d), dtype=np.int64)
    q[: min(m, n)] = pts[: min(m, n)]  # on-point queries
    gd, gi = bf.knn(pts, ids, q, k)
    td, ti = t.knn(q, k)
    np.testing.assert_allclose(td, gd)
    np.testing.assert_array_equal(ti, gi)
    # knn_bound validity on the same draw
    b = t.knn_bound(q, k)
    fin = np.isfinite(b)
    np.testing.assert_array_less(gd[fin, k - 1] - 1e-9, b[fin] + 1e-9)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_updates_then_queries_match_bruteforce(data):
    n = data.draw(st.integers(10, 300))
    rng, pts, ids = _pts(data.draw, n, 2, hi=200)
    base_n = data.draw(st.integers(5, n))
    t = LocalKDTree.build(pts[:base_n], ids[:base_n])
    live_p, live_i = pts[:base_n], ids[:base_n]
    for _ in range(data.draw(st.integers(1, 4))):
        if data.draw(st.booleans()) and base_n < n:
            take = data.draw(st.integers(1, n - base_n))
            t = t.with_updates(ins_pts=pts[base_n:base_n + take],
                               ins_ids=ids[base_n:base_n + take])
            live_p = np.concatenate([live_p, pts[base_n:base_n + take]])
            live_i = np.concatenate([live_i, ids[base_n:base_n + take]])
            base_n += take
        elif len(live_i) > 3:
            # delete a random subset, possibly overlapping earlier ones
            kill = rng.permutation(len(live_i))[
                : data.draw(st.integers(1, len(live_i) // 2))]
            t = t.with_updates(del_pts=live_p[kill], del_ids=live_i[kill])
            keep = np.setdiff1d(np.arange(len(live_i)), kill)
            live_p, live_i = live_p[keep], live_i[keep]
    if len(live_i) == 0:
        return
    q = rng.integers(0, 200, size=(10, 2), dtype=np.int64)
    k = min(5, len(live_i))
    gd, gi = bf.knn(live_p, live_i, q, k)
    td, ti = t.knn(q, k)
    np.testing.assert_allclose(td, gd)
    np.testing.assert_array_equal(ti, gi)
    lo = rng.integers(0, 150, size=(8, 2))
    boxes = np.concatenate([lo, lo + rng.integers(1, 100, size=(8, 2))],
                           axis=1).astype(np.int64)
    np.testing.assert_array_equal(t.range_count(boxes),
                                  bf.range_count(live_p, boxes))


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_serialization_roundtrip_preserves_queries(data):
    n = data.draw(st.integers(0, 200))
    d = data.draw(st.sampled_from([2, 3]))
    rng, pts, ids = _pts(data.draw, max(n, 1), d, hi=500)
    pts, ids = pts[:n], ids[:n]
    t = LocalKDTree.build(pts, ids)
    if n:
        t = t.with_updates(ins_pts=pts[:1] + 1, ins_ids=np.array([10**12]))
    t2 = LocalKDTree.from_bytes(t.to_bytes())
    q = rng.integers(0, 500, size=(5, d), dtype=np.int64)
    d1, i1 = t.knn(q, 3)
    d2, i2 = t2.knn(q, 3)
    np.testing.assert_allclose(d1, d2)
    np.testing.assert_array_equal(i1, i2)
