"""Deduplication operators over the `documents` table: exact,
n-gram-Jaccard, MinHash+LSH, SimHash.

Spark-first shapes:
- exact:    one hash groupBy (map-side combine; the only shuffle key is
            the 128-bit content hash, uniformly distributed — no skew).
- jaccard:  distinct-shingle self-equi-join — the standard near-dup
            join; scales because shared shingles are rare outside true
            near-dups (a frequent-shingle cap can be added symmetrically
            to query and oracle if a corpus has degenerate shingles).
- minhash:  64 permutations banded 32x2; band signatures are integer
            encodings so candidate generation is an equi-join on
            (band, sig); candidates are then verified with the exact
            Jaccard join. All arithmetic is JVM-side integer math that a
            DuckDB oracle reproduces bit-for-bit.
- simhash:  56-bit fingerprints; token hashes computed JVM-side (md5),
            bit votes aggregated in a vectorized pandas UDF (Arrow
            batches, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import (MINHASH_P, N_PERMS, ROWS_PER_BAND, SIG_BASE,
                     sorted_group_map, spark_h_sql)
from .textops import shingle_array_sql

# --------------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash: keeper = min doc_id."""
    return (docs.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keeper"),
                 F.count("*").alias("n_copies")))


# ----------------------------------------------------------- shingle helpers

def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, hs): DISTINCT 56-bit-hashed n-token shingles per doc.

    All set arithmetic (jaccard, minhash) runs on the int64 hash — an
    int shuffle key instead of a ~20-char string, identical in the
    DuckDB oracle; a 2^-56 collision would merge two shingles the same
    way in both engines."""
    return (docs.selectExpr(
                "doc_id",
                f"explode(transform({shingle_array_sql(n)}, "
                f"s -> {spark_h_sql('s')})) AS hs")
            .distinct())


DF_CAP = 12  # max shingle document frequency for the jaccard join


def jaccard_pairs(docs: DataFrame, n: int = 3,
                  tau_num: int = 1, tau_den: int = 2,
                  sh: DataFrame | None = None,
                  df_cap: int | None = None) -> DataFrame:
    """Pairs (da < db) with shingle-Jaccard >= tau_num/tau_den, by exact
    integer cross-multiplication: den*inter >= num*(na+nb-inter).

    df_cap: drop shingles whose document frequency exceeds the cap
    BEFORE sizes/intersections — the standard skew guard for the
    distinct-shingle self-join: one degenerate shingle appearing in f
    docs otherwise contributes O(f²) join rows. Applied symmetrically
    in the DuckDB oracle; at web scale the cap is what keeps the join
    near-linear.

    Returns (da, db, inter, na, nb) — all BIGINT, oracle-exact.
    """
    if sh is None:
        sh = doc_shingles(docs, n)
    if df_cap is not None:
        hot = (sh.groupBy("hs").agg(F.count("*").alias("dfreq"))
               .filter(F.col("dfreq") > df_cap).select("hs"))
        sh = sh.join(hot, "hs", "left_anti")
    sh = sh.cache()
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.hs") == F.col("b.hs"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("da"),
                      F.col("b.doc_id").alias("db"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sz.withColumnRenamed("doc_id", "da")
                   .withColumnRenamed("nsh", "na"), "da")
           .join(sz.withColumnRenamed("doc_id", "db")
                   .withColumnRenamed("nsh", "nb"), "db")
           .filter(F.lit(tau_den) * F.col("inter")
                   >= F.lit(tau_num)
                   * (F.col("na") + F.col("nb") - F.col("inter"))))
    return out.select("da", "db", "inter", "na", "nb")


# ------------------------------------------------------------------- minhash

_PERM_I = np.arange(N_PERMS, dtype=np.int64)
_PERM_A = 10007 * _PERM_I + 103      # == perm_a_sql / perm_b_sql
_PERM_B = 31 * _PERM_I + 7
_SLOT_MUL = SIG_BASE ** (_PERM_I % ROWS_PER_BAND)


_N_BANDS_OUT = N_PERMS // ROWS_PER_BAND


def _minhash_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized over MANY docs: pdf sorted by doc_id, whole groups."""
    doc = pdf["doc_id"].to_numpy(np.int64)
    hm = pdf["hm"].to_numpy(np.int64)
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    v = (_PERM_A[None, :] * hm[:, None] + _PERM_B[None, :]) % MINHASH_P
    mins = np.minimum.reduceat(v, starts, axis=0)      # (ndocs, N_PERMS)
    sig = ((mins % SIG_BASE) * _SLOT_MUL[None, :]).reshape(
        len(starts), _N_BANDS_OUT, ROWS_PER_BAND).sum(axis=2)
    return pd.DataFrame({
        "doc_id": np.repeat(doc[starts], _N_BANDS_OUT),
        "band": np.tile(np.arange(_N_BANDS_OUT, dtype=np.int64),
                        len(starts)),
        "sig": sig.ravel()})


def minhash_bands(docs: DataFrame, n: int = 3,
                  sh: DataFrame | None = None) -> DataFrame:
    """(doc_id, band, sig): banded MinHash signatures.

    minhash_i = (A_i * (H(shingle) % P) + B_i) % P, minimized per doc;
    band signature = base-SIG_BASE positional encoding of the band's row
    minima. Shingle hashes are JVM-side md5 arithmetic; the 64-perm
    min-reduction is one vectorized numpy kernel per doc group (shuffles
    |shingles| rows once instead of exploding 64x)."""
    if sh is None:
        sh = doc_shingles(docs, n)
    hm = sh.selectExpr("doc_id", f"hs % {MINHASH_P} AS hm")
    return sorted_group_map(hm, "doc_id", _minhash_kernel,
                            "doc_id long, band long, sig long")


def minhash_dedup(docs: DataFrame, n: int = 3,
                  tau_num: int = 1, tau_den: int = 2) -> DataFrame:
    """MinHash-LSH near-dup pipeline: band-collision candidates, then
    exact-Jaccard verification. Output (da, db, inter, na, nb).

    The LSH join replaces the all-pairs comparison: candidates come from
    an equi-join on (band, sig) — at 10^12 docs this is the only near-dup
    join that avoids quadratic work.
    """
    sh = doc_shingles(docs, n).cache()   # shared by LSH + verify stages
    bands = minhash_bands(docs, n, sh=sh).cache()  # both sides of the join
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct())
    # verify ONLY the candidates (never the all-pairs jaccard): shingle
    # intersections are computed by joining the candidate list against
    # the shingle sets of each side — work is O(|cand| * shingles/doc)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    inter = (cand
             .join(sh.select(F.col("doc_id").alias("da"), "hs"), "da")
             .join(sh.select(F.col("doc_id").alias("db"), "hs"),
                   ["db", "hs"])
             .groupBy("da", "db").agg(F.count("*").alias("inter")))
    out = (inter
           .join(sz.select(F.col("doc_id").alias("da"),
                           F.col("nsh").alias("na")), "da")
           .join(sz.select(F.col("doc_id").alias("db"),
                           F.col("nsh").alias("nb")), "db")
           .filter(F.lit(tau_den) * F.col("inter")
                   >= F.lit(tau_num)
                   * (F.col("na") + F.col("nb") - F.col("inter"))))
    return out.select("da", "db", "inter", "na", "nb")


# ------------------------------------------------------------------- simhash

_SIM_BITS = 56  # width of the portable md5-prefix hash


_BITS_56 = np.arange(_SIM_BITS, dtype=np.int64)


def _simhash_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized over MANY docs: pdf sorted by doc_id, whole groups."""
    doc = pdf["doc_id"].to_numpy(np.int64)
    h = pdf["hv"].to_numpy(np.int64)
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    bits = ((h[:, None] >> _BITS_56[None, :]) & 1).astype(np.int32)
    votes = np.add.reduceat(2 * bits - 1, starts, axis=0)
    fp = ((votes >= 0).astype(np.int64) << _BITS_56[None, :]).sum(axis=1)
    return pd.DataFrame({"doc_id": doc[starts], "simhash": fp})


def simhash(docs: DataFrame) -> DataFrame:
    """56-bit SimHash per doc: per-token hash bits vote +1/-1 weighted by
    occurrence count; fingerprint bit j = sign of the vote sum.

    Token hashes are JVM-side md5 arithmetic; the bit-vote reduction is
    a vectorized numpy kernel in applyInPandas (one shuffle by doc_id).
    """
    toks = docs.selectExpr(
        "doc_id", "explode(split(text, ' ')) AS token")
    hv = toks.selectExpr("doc_id", f"{spark_h_sql('token')} AS hv")
    return sorted_group_map(hv, "doc_id", _simhash_kernel,
                            "doc_id long, simhash long")


def hamming_candidate_keys(fp_col: str, nbits: int, nblocks: int,
                           flips: bool):
    """Multi-index (prefix-extension) Hamming join keys.

    Split an nbits fingerprint into nblocks superblocks of nbits/nblocks
    bits. By pigeonhole, a pair within Hamming 2*nblocks-1 has some
    block differing in <= 1 bit — covered by joining one side's
    {exact + all single-bit flips} keys (flips=True) against the other
    side's exact keys (flips=False). vs the naive one-block-equal split
    with nbits/(2*nblocks-1)-bit blocks, the key space per block grows
    from 2^7 to 2^14 (56-bit case): candidate volume drops ~n²/128 ->
    ~n²/16384 per block — the scale-safe shape for corpus-sized inputs.
    Returns a list of Column keys (block id packed above the bits).
    """
    w = nbits // nblocks
    mask = (1 << w) - 1
    keys = []
    for j in range(nblocks):
        bits = F.shiftright(fp_col, j * w).bitwiseAND(F.lit(mask))
        keys.append(F.lit(j * (mask + 1)) + bits)
        if flips:
            keys.extend(F.lit(j * (mask + 1)) + bits.bitwiseXOR(F.lit(1 << p))
                        for p in range(w))
    return keys


def hamming_pairs(fps: DataFrame, id_col: str, fp_col: str, nbits: int,
                  max_hamming: int, out_a: str, out_b: str) -> DataFrame:
    """Generic multi-index Hamming-distance self-join <= max_hamming.

    Candidates from the asymmetric (exact+flips) x (exact) key join are
    lossless for max_hamming <= 2*nblocks - 1; verified by exact
    popcount. Output (out_a, out_b, hamming), out_a < out_b."""
    nblocks = 4
    assert max_hamming <= 2 * nblocks - 1, max_hamming
    a = fps.select(
        F.col(id_col).alias(out_a), F.col(fp_col).alias("ha"),
        F.explode(F.array(
            *hamming_candidate_keys(fp_col, nbits, nblocks, True))).alias("bk"))
    b = fps.select(
        F.col(id_col).alias(out_b), F.col(fp_col).alias("hb"),
        F.explode(F.array(
            *hamming_candidate_keys(fp_col, nbits, nblocks, False))).alias("bk"))
    cand = (a.join(b, (a["bk"] == b["bk"]) & (a[out_a] < b[out_b]))
            .select(out_a, "ha", out_b, "hb")
            .distinct())
    return (cand.withColumn(
                "hamming",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter(F.col("hamming") <= max_hamming)
            .select(out_a, out_b,
                    F.col("hamming").cast("long").alias("hamming")))


def simhash_pairs(docs: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= 7 via the
    multi-index join (4 x 14-bit superblocks, single-bit-flip probes) —
    lossless for <= 7 by pigeonhole, verified by exact popcount.
    Output (da, db, hamming)."""
    fps = simhash(docs).cache()
    return hamming_pairs(fps, "doc_id", "simhash", _SIM_BITS,
                         max_hamming, "da", "db")
