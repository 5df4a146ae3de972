"""Connected components over near-duplicate pairs — the clustering step
that turns pair output (minhash/simhash/phash joins, dedup.py) into
dedup groups with a canonical representative per group (min id), which
is what a training-data pipeline actually consumes: keep one doc per
component, drop the rest.

Algorithm: distributed min-label propagation with pointer jumping
(the DataFrame rendering of Shiloach-Vishkin / the two-phase star
contraction of Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC'14 — public literature). Each round does

  hop:  l(u) <- min(l(u), min_{v in N(u)} l(v))     (join + groupBy)
  jump: l(u) <- l(l(u))                              (self-join on label)

so labels chase the component minimum through neighbors AND through
label chains; a path graph converges in O(log n) rounds instead of the
O(n) of plain propagation. Every round materializes via an eager
localCheckpoint: lineage stays flat (no exponential plan growth — the
same truncation discipline as SpatialIndex.update) and the convergence
check (changed-label count) rides the same job.

Scale shape: per round one shuffle for the neighbor-min aggregation and
one for the label self-join, both keyed on node/label ids — uniform
keys, AQE-splittable. Dedup graphs are unions of small dense clusters,
so real corpora converge in 2-4 rounds with the jump step rarely
needed; it exists for the adversarial chain case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_canonical(docs: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id",
                    a_col: str = "da", b_col: str = "db") -> DataFrame:
    """The dedup pipeline endpoint: given the corpus and its near-dup
    pair list, keep exactly ONE document per connected component (the
    min id — every dropped doc has a surviving near-duplicate) and
    return the surviving subset of `docs` with all its columns.

    Plan: connected_components over the pairs, then a semi-join of the
    corpus against the canonical ids — one extra shuffle on the id key
    beyond the clustering itself."""
    cc = connected_components(pairs, docs.select(id_col),
                              a_col=a_col, b_col=b_col, id_col=id_col)
    keep = (cc.filter(F.col("id") == F.col("comp"))
            .select(F.col("id").alias(id_col)))
    return docs.join(keep, id_col, "left_semi")


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         a_col: str = "da", b_col: str = "db",
                         id_col: str = "id",
                         max_rounds: int = 64) -> DataFrame:
    """edges: undirected pair list (a_col, b_col); nodes: optional
    (id_col) universe so isolated nodes appear as singletons.
    -> (id, comp): comp = smallest node id in the node's component.
    """
    e = (edges.selectExpr(f"{a_col} AS u", f"{b_col} AS v")
         .unionByName(edges.selectExpr(f"{b_col} AS u", f"{a_col} AS v"))
         .filter("u != v")
         .localCheckpoint(eager=False))
    ids = e.select(F.col("u").alias("id"))
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(id_col).alias("id")))
    labels = (ids.distinct()
              .withColumn("comp", F.col("id"))
              .localCheckpoint())
    for _ in range(max_rounds):
        nbr = (e.join(labels, e["u"] == labels["id"])
               .groupBy("v").agg(F.min("comp").alias("nc")))
        hopped = (labels.join(nbr, labels["id"] == nbr["v"], "left")
                  .select("id", F.least("comp", "nc").alias("comp"),
                          labels["comp"].alias("prev"))
                  .localCheckpoint())
        parent = hopped.selectExpr("id AS pid", "comp AS pcomp")
        jumped = (hopped.join(parent, hopped["comp"] == parent["pid"], "left")
                  .select("id", F.coalesce("pcomp", "comp").alias("comp"),
                          "prev")
                  .localCheckpoint())
        changed = jumped.filter("comp != prev").count()
        labels = jumped.select("id", "comp").localCheckpoint(eager=False)
        if changed == 0:
            break
    return labels
