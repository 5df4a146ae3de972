"""Config-matrix robustness for the distance join (the checkCorrect.sh
style: vary d, grid key dims, grid size and duplicate floods jointly),
every cell vs the numpy brute force."""

import numpy as np
import pandas as pd
import pytest

from kdtree_spark.grid import Grid
from kdtree_spark.queries.joins import distance_join

CONFIGS = [
    # (d, grid_dims, g, flood)
    (2, 2, 4, False),
    (2, 2, 64, True),
    (3, 2, 16, False),
    (3, 3, 8, True),
    (5, 3, 4, False),
    (5, 2, 32, True),
]


def _dims(d):
    return tuple(["x", "y"] + [f"c{j}" for j in range(2, d)])


def _mk(spark, arr, idc, cc):
    cols = {idc: arr[:, 0]}
    for j, c in enumerate(cc):
        cols[c] = arr[:, 1 + j]
    return spark.createDataFrame(pd.DataFrame(cols))


@pytest.mark.parametrize("d,gdims,g,flood", CONFIGS)
def test_distance_join_matrix(spark, d, gdims, g, flood):
    rng = np.random.default_rng(1000 + d * 10 + gdims + g)
    # radius holding the expected partner count roughly constant per d
    r = int(1_000_000 * (8 / 500) ** (1 / d) / 2)
    L = np.column_stack([np.arange(50),
                         rng.integers(0, 1_000_000, (50, d))])
    R = np.column_stack([np.arange(500),
                         rng.integers(0, 1_000_000, (500, d))])
    if flood:
        spot = rng.integers(0, 1_000_000, d)
        R[:100, 1:] = spot                   # 100 identical rows
        L[:5, 1:] = spot
        L[:5, 1] = min(int(spot[0]) + r // 2, 999_999)  # within r, 1 dim
    cc = _dims(d)
    got = sorted(tuple(x) for x in distance_join(
        _mk(spark, L, "lid", cc), _mk(spark, R, "rid", cc), r,
        grid=Grid(g, dims=gdims), coord_cols=cc).collect())
    d2 = ((L[:, None, 1:] - R[None, :, 1:]).astype(np.int64) ** 2
          ).sum(axis=2)
    li, ri = np.nonzero(d2 <= r * r)
    exp = sorted(zip(L[li, 0].tolist(), R[ri, 0].tolist(),
                     d2[li, ri].tolist()))
    assert got == exp
    if flood:
        assert len(exp) >= 500  # the flood actually exercised hot cells
