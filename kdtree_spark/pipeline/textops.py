"""Text-analysis operators over the `documents` table — quality scoring,
token counting, language-ID, document fingerprinting.

All hot-path arithmetic is JVM-side (explode + built-in functions inside
whole-stage codegen); no Python UDFs. Each operator has a DuckDB oracle
in driver_queries/pipeline.py built from the same integer arithmetic.

Scale notes (100 TB): every operator here is a narrow map + one shuffle
(the per-doc or per-token groupBy); token explode is the classic
wordcount shape with map-side partial aggregation. Nothing collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import LANG_MARKERS, STOPWORDS, spark_h_sql


def tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) with duplicates — the exploded token stream."""
    return docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("token"))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc quality metrics: token count, distinct tokens, stopword
    count, avg token length, stopword ratio.

    Ratios are a single double division from exact integers, so they are
    bit-identical to the oracle's.
    """
    stop = [F.lit(s) for s in STOPWORDS]
    t = tokens(docs)
    agg = t.groupBy("doc_id").agg(
        F.count("*").alias("ntok"),
        F.countDistinct("token").alias("ndistinct"),
        F.sum(F.length("token")).alias("nchars_tok"),
        F.sum(F.when(F.col("token").isin(*stop), 1).otherwise(0))
        .cast("long").alias("nstop"),
    )
    return agg.select(
        "doc_id", "ntok", "ndistinct", "nstop",
        (F.col("nchars_tok").cast("double") / F.col("ntok").cast("double"))
        .alias("avg_tok_len"),
        (F.col("nstop").cast("double") / F.col("ntok").cast("double"))
        .alias("stop_ratio"),
    )


def token_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k tokens by frequency (wordcount + rank).

    Partial (map-side) aggregation makes the groupBy scale; the top-k
    itself is orderBy().limit(k) — Catalyst plans TakeOrderedAndProject
    (per-partition top-k then a k-row merge on the driver), so no
    single task ever holds the vocabulary (a global rank window would
    move every distinct token to one partition). The rank column is a
    window over ONLY the k surviving rows (the limit sits below the
    window in the plan), so the single-partition WindowExec sees k rows
    — and the whole thing stays a lazy plan a caller can compose.
    """
    freq = tokens(docs).groupBy("token").agg(F.count("*").alias("cnt"))
    topk = freq.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return topk.select("token", "cnt",
                       F.row_number().over(w).cast("long").alias("rank"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: score(lang) = count of that language's
    marker tokens in the doc; prediction = argmax with deterministic
    tie-break (score desc, lang asc); docs with no markers -> 'unk'.

    The marker table is tiny and broadcast; scoring is one exploded
    equi-join + groupBy — the same shape at 10^12 docs.
    """
    spark = docs.sparkSession
    rows = [(lang, m) for lang, ms in sorted(LANG_MARKERS.items())
            for m in ms]
    markers = spark.createDataFrame(rows, "lang string, token string")
    t = tokens(docs)
    scores = (t.join(F.broadcast(markers), "token")
              .groupBy("doc_id", "lang").agg(F.count("*").alias("score")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc())
    best = (scores.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").select("doc_id", "lang", "score"))
    return (docs.select("doc_id").join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("lang", F.lit("unk")).alias("pred_lang"),
                    F.coalesce("score", F.lit(0)).cast("long").alias("score")))


# BPE-ish pre-tokenizer split: letter runs / digit runs / single
# non-alphanumeric marks (the GPT-2 pre-tokenizer's shape without its
# lookaheads, which RE2 — DuckDB's engine — does not support; this
# pattern parses identically under Java regex and RE2, the
# cross-engine contract for the oracle)
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def regex_token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc BPE-ish token stats: regex token count, distinct count
    and summed token chars — a pure narrow map (regexp_extract_all +
    array aggregates inside codegen), NO shuffle at all; the 100 TB
    plan is a single scan."""
    arr = f"regexp_extract_all(text, '{BPE_RE}', 0)"
    return docs.selectExpr(
        "doc_id",
        f"CAST(size({arr}) AS LONG) AS ntok_re",
        f"CAST(size(array_distinct({arr})) AS LONG) AS ndistinct_re",
        f"CAST(aggregate({arr}, 0L, (a, t) -> a + length(t)) AS LONG)"
        " AS nchars_re")


def shingle_array_sql(n: int) -> str:
    """SQL expr: array of n-token shingles of `text` (empty if too short).

    Guarded because Spark's sequence(1, 0) yields a *descending* [1,0]
    rather than an empty array.
    """
    toks = "split(text, ' ')"
    return (f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(1, size({toks}) - {n} + 1), "
            f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
            f"ELSE array() END")


def doc_fingerprint(docs: DataFrame, n: int = 5) -> DataFrame:
    """Rolling-hash fingerprint: min 56-bit hash over n-token shingles
    (a 1-perm minhash — the winnowing/fingerprint primitive). Pure
    narrow map: no shuffle at all.
    """
    return docs.selectExpr(
        "doc_id",
        f"array_min(transform({shingle_array_sql(n)}, "
        f"s -> {spark_h_sql('s')})) AS fp")
