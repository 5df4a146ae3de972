"""Precompute expected SRP-LSH / IVF top-k results into repo fixture
parquets so the DuckDB oracle can hash-check the two approximate ANN
gates exactly (the phash-fixture pattern).

Both pipelines are fully deterministic now that bucketing runs on
int64-quantized embeddings/planes/centroids (pipeline/ann.py): candidate
selection is exact integer arithmetic, rank ties break on nid, and the
only float values (Lloyd training, the final cosine) are single IEEE op
chains over identical inputs — so a plain pandas/numpy reimplementation
of the same spec reproduces the Spark output bit-for-bit. The shared
deterministic cores (_planes_q, lloyd_unit_centroids, QUANT) are
imported from the engine; the candidate-generation plumbing (bucket
joins, probing, ranking) is reimplemented independently here.

Each fixture row carries `table_key` — an integer checksum of the
embeddings table that the oracle SQL recomputes to select the rows for
the scale factor it is running at.

Regenerate with:  python scripts/gen_ann_fixture.py
Outputs:          fixtures_data/ann_srp.parquet
                  fixtures_data/ann_ivf.parquet
                    (table_key, qid, nid, dot, na, nb, cos, rank)

tests/test_pipeline.py asserts fixture rows equal live Spark results at
sf0.001, so drift between these files and ann.py fails CI.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kdtree_spark.pipeline import ann  # noqa: E402
from kdtree_spark.pipeline.common import QUANT  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data")

K = 10
QUERY_MOD, QUERY_REM = 50, 7   # driver_queries.pipeline.ANN_QUERY_FILTER

# must match the oracle SQL in driver_queries/pipeline.py verbatim
TABLE_KEY_SQL = ("CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000) "
                 "AS BIGINT) * ((vec_id % 97) + 1)) AS BIGINT)")


def table_key(vid: np.ndarray, m64: np.ndarray) -> int:
    return int((np.floor(m64[:, 0] * 10000).astype(np.int64)
                * (vid % 97 + 1)).sum())


def _rank_topk(pairs: pd.DataFrame, mq: np.ndarray, ids: np.ndarray,
               k: int) -> pd.DataFrame:
    """Exact int rerank + (cos desc, nid asc) rank<=k over candidate
    (qid, nid) pairs — the shared tail of both pipelines."""
    pos = {int(v): i for i, v in enumerate(ids)}
    qi = pairs["qid"].map(pos).to_numpy()
    ni = pairs["nid"].map(pos).to_numpy()
    a, b = mq[qi], mq[ni]
    out = pd.DataFrame({
        "qid": pairs["qid"].to_numpy(np.int64),
        "nid": pairs["nid"].to_numpy(np.int64),
        "dot": (a * b).sum(axis=1),
        "na": (a * a).sum(axis=1),
        "nb": (b * b).sum(axis=1)})
    out["cos"] = out["dot"].to_numpy(np.float64) / np.sqrt(
        out["na"].to_numpy(np.float64) * out["nb"].to_numpy(np.float64))
    out = out.sort_values(["qid", "cos", "nid"],
                          ascending=[True, False, True])
    out["rank"] = out.groupby("qid").cumcount().astype(np.int64) + 1
    return out[out["rank"] <= k].reset_index(drop=True)


def srp_expected(vid: np.ndarray, mq: np.ndarray) -> pd.DataFrame:
    planes = ann._planes_q()
    bucket_rows = []  # (vec_id, bucket)
    for t in range(ann.N_TABLES):
        sig = ((mq @ planes[t].T >= 0).astype(np.int64)
               << np.arange(ann.TABLE_BITS, dtype=np.int64)).sum(axis=1)
        bucket_rows.append(pd.DataFrame(
            {"vec_id": vid, "bucket": (t << ann.TABLE_BITS) | sig}))
    buckets = pd.concat(bucket_rows, ignore_index=True)

    qmask = vid % QUERY_MOD == QUERY_REM
    qb = buckets[buckets["vec_id"].isin(vid[qmask])]
    probes = [qb]
    for p in range(ann.TABLE_BITS):
        probes.append(qb.assign(bucket=qb["bucket"] ^ (1 << p)))
    qprobe = pd.concat(probes, ignore_index=True).rename(
        columns={"vec_id": "qid"})

    cand = (buckets.rename(columns={"vec_id": "nid"})
            .merge(qprobe, on="bucket"))
    cand = cand[cand["qid"] != cand["nid"]][["qid", "nid"]].drop_duplicates()
    return _rank_topk(cand, mq, vid, K)


def ivf_expected(vid: np.ndarray, m64: np.ndarray,
                 mq: np.ndarray) -> pd.DataFrame:
    h = (vid * 2654435761) % 1_000_003
    order = np.lexsort((vid, h))[:ann.IVF_SAMPLE]
    cent = ann.lloyd_unit_centroids(m64[order], ann.NLIST)
    cq = np.floor(cent * QUANT).astype(np.int64)

    scores = mq @ cq.T
    base_list = np.argmax(scores, axis=1)
    qmask = vid % QUERY_MOD == QUERY_REM
    qlists = np.argsort(-scores[qmask], axis=1, kind="stable")[
        :, :min(ann.NPROBE, cq.shape[0])]

    base = pd.DataFrame({"nid": vid, "list_id": base_list})
    q = pd.DataFrame({
        "qid": np.repeat(vid[qmask], qlists.shape[1]),
        "list_id": qlists.ravel()})
    cand = base.merge(q, on="list_id")
    cand = cand[cand["qid"] != cand["nid"]][["qid", "nid"]].drop_duplicates()
    return _rank_topk(cand, mq, vid, K)


def main() -> None:
    srp_all, ivf_all = [], []
    for d in SF_DIRS:
        pdf = duckdb.sql(
            f"SELECT vec_id, embedding FROM '{d}/embeddings.parquet' "
            "ORDER BY vec_id").df()
        vid = pdf["vec_id"].to_numpy(np.int64)
        m64 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mq = np.floor(m64 * QUANT).astype(np.int64)
        key = table_key(vid, m64)
        s = srp_expected(vid, mq)
        i = ivf_expected(vid, m64, mq)
        s.insert(0, "table_key", np.int64(key))
        i.insert(0, "table_key", np.int64(key))
        srp_all.append(s)
        ivf_all.append(i)
        print(f"{d}: key={key} srp={len(s)} ivf={len(i)} rows")

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, frames in (("ann_srp", srp_all), ("ann_ivf", ivf_all)):
        out = pd.concat(frames, ignore_index=True).drop_duplicates()
        for c in ("table_key", "qid", "nid", "dot", "na", "nb", "rank"):
            out[c] = out[c].astype("int64")
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        out.to_parquet(path, index=False)
        print(f"wrote {len(out)} rows -> {path}")


if __name__ == "__main__":
    main()
