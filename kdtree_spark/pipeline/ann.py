"""Similarity search over the `embeddings` table (array<float>, 64-d).

Exactness strategy: embeddings are quantized to an int64 grid
(floor(e*10000)); dot products and norms are then exact integer sums,
and cosine is a single double divide+sqrt from those integers — so the
Spark result is bit-identical to the DuckDB oracle and the ordering is
deterministic.

Operators:
- cosine_topk:     exact brute-force top-k — base vectors stream through
                   mapInPandas (Arrow batches, numpy int64 matmul)
                   against a broadcast query matrix; each batch emits
                   only its local top-k per query; a global window
                   finishes the reduction. No all-pairs materialization:
                   shuffle volume is O(#queries · k · #batches).
- neardup_pairs:   all-pairs cosine >= tau over the table, blockwise
                   against a broadcast of the (small) comparison side.
- srp_topk:        sign-random-projection LSH variant — the scale path:
                   candidates share an n-bit hyperplane-sign bucket
                   (multi-probe within Hamming 1), then exact re-rank.
                   Approximate by design -> rows-only driver check +
                   recall test in pytest.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import QUANT

_CAND_SCHEMA = "qid long, nid long, dot long, nb long"


def _quantize(col: pd.Series) -> np.ndarray:
    m = np.stack(col.to_numpy())
    return np.floor(m.astype(np.float64) * QUANT).astype(np.int64)


def _collect_queries(emb: DataFrame, query_filter: str):
    qpd = (emb.filter(query_filter).select("vec_id", "embedding")
           .toPandas().sort_values("vec_id"))
    qids = qpd["vec_id"].to_numpy(np.int64)
    qm = _quantize(qpd["embedding"])
    return qids, qm


def _cosine_order(df: DataFrame, nq_sq: DataFrame) -> DataFrame:
    """Attach exact-int-derived cosine and rank (cos desc, nid asc)."""
    d = df.join(nq_sq, "qid")
    d = d.withColumn(
        "cos",
        F.col("dot").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("nid").asc())
    return d.withColumn("rank", F.row_number().over(w).cast("long"))


def _query_norms(spark, qids: np.ndarray, qm: np.ndarray) -> DataFrame:
    na = (qm * qm).sum(axis=1)
    pdf = pd.DataFrame({"qid": qids, "na": na})
    return F.broadcast(spark.createDataFrame(pdf, "qid long, na long"))


def cosine_topk(emb: DataFrame, query_filter: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k (excluding self): (qid, nid, dot, na, nb,
    cos, rank), rank <= k."""
    spark = emb.sparkSession
    qids, qm = _collect_queries(emb, query_filter)
    bc = spark.sparkContext.broadcast((qids, qm))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bqm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            bm = _quantize(pdf["embedding"])
            nids = pdf["vec_id"].to_numpy(np.int64)
            dots = bm @ bqm.T                      # exact int64
            nb = (bm * bm).sum(axis=1)
            # local top-k per query within this Arrow batch
            kk = min(k + 1, len(nids))             # +1 to survive self-drop
            cos = dots / np.sqrt(np.outer(nb, (bqm * bqm).sum(axis=1)))
            top = np.argpartition(-cos, kk - 1, axis=0)[:kk]
            rows = {"qid": [], "nid": [], "dot": [], "nb": []}
            for j in range(len(bqids)):
                sel = top[:, j]
                rows["qid"].extend([bqids[j]] * len(sel))
                rows["nid"].extend(nids[sel])
                rows["dot"].extend(dots[sel, j])
                rows["nb"].extend(nb[sel])
            yield pd.DataFrame(rows)

    cand = (emb.select("vec_id", "embedding")
            .mapInPandas(scan, _CAND_SCHEMA)
            .filter(F.col("qid") != F.col("nid")))
    ranked = _cosine_order(cand, _query_norms(spark, qids, qm))
    return (ranked.filter(F.col("rank") <= k)
            .select("qid", "nid", "dot", "na", "nb", "cos", "rank"))


def neardup_pairs(emb: DataFrame, tau: float = 0.4) -> DataFrame:
    """All pairs (a < b) with cosine >= tau: (da, db, dot, na, nb, cos).

    The comparison side is broadcast as a numpy matrix; each Arrow batch
    does one int64 matmul against it. For corpora where neither side fits
    an executor, srp_topk's bucketed join is the scale path.
    """
    spark = emb.sparkSession
    qids, qm = _collect_queries(emb, "true")
    bc = spark.sparkContext.broadcast((qids, qm, (qm * qm).sum(axis=1)))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bqm, bqn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            bm = _quantize(pdf["embedding"])
            nids = pdf["vec_id"].to_numpy(np.int64)
            dots = bm @ bqm.T
            nb = (bm * bm).sum(axis=1)
            cos = dots / np.sqrt(np.outer(nb, bqn))
            ii, jj = np.nonzero((cos >= tau) & (nids[:, None] < bqids[None, :]))
            yield pd.DataFrame({"da": nids[ii], "db": bqids[jj],
                                "dot": dots[ii, jj], "na": nb[ii],
                                "nb": bqn[jj]})

    out = emb.select("vec_id", "embedding").mapInPandas(
        scan, "da long, db long, dot long, na long, nb long")
    return out.withColumn(
        "cos",
        F.col("dot").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")))


# -------------------------------------------------- LSH scale path (approx)
# Multi-table sign-random-projection LSH: N_TABLES independent tables of
# TABLE_BITS hyperplanes each. A pair is a candidate when it shares a
# bucket in ANY table (union), with Hamming-1 multi-probe on the query
# side. Recall at cosine c is 1-(1-p_t)^L for per-table probability p_t
# — tuned by TABLE_BITS (selectivity) and N_TABLES (recall).

N_TABLES = 4
TABLE_BITS = 8
_RNG_SEED = 7


def _planes(dim: int = 64) -> np.ndarray:
    return np.random.default_rng(_RNG_SEED).standard_normal(
        (N_TABLES, TABLE_BITS, dim))


def srp_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, bucket): N_TABLES rows per vector; bucket encodes
    (table_id << TABLE_BITS) | sign-bits so tables never collide."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(_planes())

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out_v, out_b = [], []
            for t in range(N_TABLES):
                signs = (m @ planes[t].T) >= 0
                sig = (signs.astype(np.int64)
                       << np.arange(TABLE_BITS, dtype=np.int64)).sum(axis=1)
                out_v.append(pdf["vec_id"].to_numpy())
                out_b.append((t << TABLE_BITS) | sig)
            yield pd.DataFrame({"vec_id": np.concatenate(out_v),
                                "bucket": np.concatenate(out_b)})

    return emb.select("vec_id", "embedding").mapInPandas(
        enc, "vec_id long, bucket long")


def srp_topk(emb: DataFrame, query_filter: str, k: int = 10) -> DataFrame:
    """Approximate cosine top-k: candidates share any table's bucket with
    the query (plus Hamming-1 probes), re-ranked exactly.
    Output schema matches cosine_topk (rank may differ on misses)."""
    buckets = srp_buckets(emb)
    base = (emb.select("vec_id", "embedding")
            .join(buckets, "vec_id")
            .withColumnRenamed("vec_id", "nid")
            .withColumnRenamed("embedding", "n_emb"))
    probes = [F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(TABLE_BITS)]
    q = (emb.filter(query_filter).select("vec_id", "embedding")
         .join(buckets, "vec_id")
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("q_emb"),
                 F.explode(F.array(*probes)).alias("bucket")))
    cand = (base.join(q.hint("broadcast"), "bucket")
            .filter(F.col("qid") != F.col("nid")))

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            a = _quantize(pdf["q_emb"])
            b = _quantize(pdf["n_emb"])
            dot = (a * b).sum(axis=1)
            na = (a * a).sum(axis=1)
            nb = (b * b).sum(axis=1)
            yield pd.DataFrame({"qid": pdf["qid"], "nid": pdf["nid"],
                                "dot": dot, "na": na, "nb": nb})

    scored = cand.mapInPandas(
        rerank, "qid long, nid long, dot long, na long, nb long").distinct()
    scored = scored.withColumn(
        "cos",
        F.col("dot").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "dot", "na", "nb", "cos", "rank"))
