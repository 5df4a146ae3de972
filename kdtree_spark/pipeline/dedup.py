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
                     perm_a_sql, perm_b_sql, spark_h_sql)
from .textops import shingle_array_sql

# --------------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash: keeper = min doc_id."""
    return (docs.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keeper"),
                 F.count("*").alias("n_copies")))


# ----------------------------------------------------------- shingle helpers

def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, s): DISTINCT n-token shingles per doc."""
    return (docs.selectExpr("doc_id",
                            f"explode({shingle_array_sql(n)}) AS s")
            .distinct())


def jaccard_pairs(docs: DataFrame, n: int = 3,
                  tau_num: int = 1, tau_den: int = 2) -> DataFrame:
    """Pairs (da < db) with shingle-Jaccard >= tau_num/tau_den, by exact
    integer cross-multiplication: den*inter >= num*(na+nb-inter).

    Returns (da, db, inter, na, nb) — all BIGINT, oracle-exact.
    """
    sh = doc_shingles(docs, n).cache()
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.s") == F.col("b.s"))
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

def minhash_bands(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, band, sig): banded MinHash signatures.

    minhash_i = (A_i * (H(shingle) % P) + B_i) % P, minimized per doc;
    band signature = base-SIG_BASE positional encoding of the band's row
    minima (order-independent sum, exact int64).
    """
    sh = doc_shingles(docs, n)
    hm = sh.selectExpr("doc_id", f"{spark_h_sql('s')} % {MINHASH_P} AS hm")
    perms = hm.selectExpr(
        "doc_id",
        f"posexplode(transform(sequence(0, {N_PERMS - 1}), "
        f"i -> (CAST({perm_a_sql()} AS BIGINT) * hm + {perm_b_sql()}) "
        f"% {MINHASH_P}))")
    mins = (perms.groupBy("doc_id", F.col("pos").alias("perm"))
            .agg(F.min("col").alias("mh")))
    return (mins.groupBy(
                "doc_id",
                (F.col("perm") / ROWS_PER_BAND).cast("long").alias("band"))
            .agg(F.sum(
                (F.col("mh") % SIG_BASE)
                * F.pow(F.lit(SIG_BASE),
                        F.col("perm") % ROWS_PER_BAND).cast("long"))
                 .alias("sig")))


def minhash_dedup(docs: DataFrame, n: int = 3,
                  tau_num: int = 1, tau_den: int = 2) -> DataFrame:
    """MinHash-LSH near-dup pipeline: band-collision candidates, then
    exact-Jaccard verification. Output (da, db, inter, na, nb).

    The LSH join replaces the all-pairs comparison: candidates come from
    an equi-join on (band, sig) — at 10^12 docs this is the only near-dup
    join that avoids quadratic work.
    """
    bands = minhash_bands(docs, n)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct())
    exact = jaccard_pairs(docs, n, tau_num, tau_den)
    return cand.join(exact, ["da", "db"]).select(
        "da", "db", "inter", "na", "nb")


# ------------------------------------------------------------------- simhash

_SIM_BITS = 56  # width of the portable md5-prefix hash


def _simhash_group(pdf: pd.DataFrame) -> pd.DataFrame:
    h = pdf["hv"].to_numpy(np.int64)
    bits = (h[:, None] >> np.arange(_SIM_BITS, dtype=np.int64)) & 1
    votes = (2 * bits - 1).sum(axis=0)
    fp = int(((votes >= 0).astype(np.int64)
              << np.arange(_SIM_BITS, dtype=np.int64)).sum())
    return pd.DataFrame({"doc_id": [int(pdf["doc_id"].iloc[0])],
                         "simhash": [fp]})


def simhash(docs: DataFrame) -> DataFrame:
    """56-bit SimHash per doc: per-token hash bits vote +1/-1 weighted by
    occurrence count; fingerprint bit j = sign of the vote sum.

    Token hashes are JVM-side md5 arithmetic; the bit-vote reduction is
    a vectorized numpy kernel in applyInPandas (one shuffle by doc_id).
    """
    toks = docs.selectExpr(
        "doc_id", "explode(split(text, ' ')) AS token")
    hv = toks.selectExpr("doc_id", f"{spark_h_sql('token')} AS hv")
    return hv.groupBy("doc_id").applyInPandas(
        _simhash_group, "doc_id long, simhash long")


def simhash_pairs(docs: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= 7, banded: the
    56-bit fingerprint splits into 8 blocks of 7 bits; by pigeonhole any
    pair within Hamming 7 shares at least one identical block, so the
    block equi-join is a lossless candidate generator (then verified by
    exact popcount). Output (da, db, hamming).
    """
    fps = simhash(docs).cache()
    blocks = fps.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            (F.lit(j * 128)
             + F.shiftright("simhash", j * 7).bitwiseAND(F.lit(0x7F)))
            for j in range(8)])).alias("blk"))
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("a.simhash").alias("ha"),
                    F.col("b.doc_id").alias("db"),
                    F.col("b.simhash").alias("hb"))
            .distinct())
    return (cand.withColumn(
                "hamming",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("da", "db", F.col("hamming").cast("long").alias("hamming")))
