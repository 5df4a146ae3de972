"""Connected components vs a driver-side union-find oracle."""

import numpy as np
import pandas as pd

from kdtree_spark.pipeline.components import connected_components


def _uf_components(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min id: root chosen as min via the merge rule
    return {i: find(i) for i in n_ids}


def _mk_edges(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame({"da": [a for a, _ in edges],
                      "db": [b for _, b in edges]}, dtype="int64"),
        "da long, db long")


def test_components_random_graph(spark):
    rng = np.random.default_rng(31)
    ids = list(range(300))
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 300, (250, 2))
             if a != b]
    got = dict(connected_components(
        _mk_edges(spark, edges),
        spark.createDataFrame(pd.DataFrame({"id": ids}, dtype="int64"))
    ).collect())
    assert got == _uf_components(ids, edges)


def test_components_long_path_exercises_jump(spark):
    """A 400-node path: plain label propagation needs 400 rounds; the
    star contraction must converge inside the round cap."""
    edges = [(i, i + 1) for i in range(399)]
    got = dict(connected_components(_mk_edges(spark, edges)).collect())
    assert got == {i: 0 for i in range(400)}


def test_components_singletons_and_empty_edges(spark):
    ids = [5, 9, 42]
    got = dict(connected_components(
        _mk_edges(spark, []),
        spark.createDataFrame(pd.DataFrame({"id": ids}, dtype="int64"))
    ).collect())
    assert got == {5: 5, 9: 9, 42: 42}


def test_components_two_clusters_plus_isolated(spark):
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)]
    ids = list(range(1, 15))
    got = dict(connected_components(
        _mk_edges(spark, edges),
        spark.createDataFrame(pd.DataFrame({"id": ids}, dtype="int64"))
    ).collect())
    exp = _uf_components(ids, edges)
    assert got == exp
    assert got[3] == 1 and got[12] == 10 and got[14] == 14


def test_dedup_canonical(spark):
    """Endpoint: one survivor per component, the min id, full rows."""
    import pandas as pd
    from kdtree_spark.pipeline.components import dedup_canonical
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(10)),
         "text": [f"t{i}" for i in range(10)]}))
    pairs = _mk_edges(spark, [(0, 1), (1, 2), (5, 6), (8, 3), (3, 0)])
    out = dedup_canonical(docs, pairs).toPandas()
    # components: {0,1,2,3,8}, {5,6}; singletons 4,7,9
    assert sorted(out.doc_id) == [0, 4, 5, 7, 9]
    assert set(out.columns) == {"doc_id", "text"}
    assert out.set_index("doc_id").text.to_dict() == {
        0: "t0", 4: "t4", 5: "t5", 7: "t7", 9: "t9"}
