"""Driver-gate training-pipeline queries over documents/embeddings:
dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity
search (exact + LSH), and text analysis — each with a DuckDB oracle
built from the same cross-engine-deterministic arithmetic
(pipeline/common.py explains the determinism rules).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import ann, components, dedup, textops
from ..pipeline.common import (LANG_MARKERS, MINHASH_P, N_PERMS, SIG_BASE,
                               STOPWORDS, duck_h_sql, duck_quant_sql,
                               perm_a_sql, perm_b_sql)

ANN_QUERY_FILTER = "vec_id % 50 = 7"   # ~2% of vectors act as queries
NEARDUP_TAU = 0.4
JACCARD_N = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------ text analysis

def q_text_stats(spark, sf_dir):
    return textops.token_stats(_docs(spark, sf_dir))


SQL_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
a AS (SELECT doc_id, count(*) AS ntok,
             count(DISTINCT token) AS ndistinct,
             CAST(sum(length(token)) AS BIGINT) AS nchars_tok,
             CAST(sum(CASE WHEN token IN {STOPWORDS!r} THEN 1 ELSE 0 END)
                  AS BIGINT) AS nstop
      FROM t GROUP BY doc_id)
SELECT doc_id, ntok, ndistinct, nstop,
       nchars_tok::DOUBLE / ntok::DOUBLE AS avg_tok_len,
       nstop::DOUBLE / ntok::DOUBLE AS stop_ratio
FROM a"""


def q_regex_token_stats(spark, sf_dir):
    return textops.regex_token_stats(_docs(spark, sf_dir))


SQL_REGEX_TOKEN_STATS = f"""
WITH r AS (SELECT doc_id,
                  regexp_extract_all(text, '{textops.BPE_RE}') AS toks
           FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS ntok_re,
       CAST(len(list_distinct(toks)) AS BIGINT) AS ndistinct_re,
       CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
            AS BIGINT) AS nchars_re
FROM r"""


def q_token_topk(spark, sf_dir):
    return textops.token_topk(_docs(spark, sf_dir), 20)


SQL_TOKEN_TOPK = """
WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
f AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
r AS (SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
      FROM f)
SELECT token, cnt, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 20"""


def q_lang_id(spark, sf_dir):
    return textops.lang_id(_docs(spark, sf_dir))


def _sql_lang_id() -> str:
    rows = ", ".join(f"('{lang}', '{m}')"
                     for lang, ms in sorted(LANG_MARKERS.items())
                     for m in ms)
    return f"""
WITH markers(lang, token) AS (VALUES {rows}),
t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
s AS (SELECT t.doc_id, m.lang, count(*) AS score
      FROM t JOIN markers m ON t.token = m.token
      GROUP BY t.doc_id, m.lang),
b AS (SELECT doc_id, lang, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang ASC) AS rn
      FROM s)
SELECT d.doc_id, coalesce(b.lang, 'unk') AS pred_lang,
       CAST(coalesce(b.score, 0) AS BIGINT) AS score
FROM documents d LEFT JOIN b ON b.doc_id = d.doc_id AND b.rn = 1"""


def q_doc_fingerprint(spark, sf_dir):
    return textops.doc_fingerprint(_docs(spark, sf_dir), 5)


SQL_DOC_FINGERPRINT = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
SELECT doc_id,
       list_min(list_transform(
         list_transform(generate_series(1, len(tk) - 4),
                        i -> array_to_string(tk[i:i+4], ' ')),
         s -> {duck_h_sql('s')})) AS fp
FROM toks"""


# ------------------------------------------------------------------- dedup

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
FROM documents GROUP BY md5(text)"""


# shared oracle CTE: distinct 3-token shingles per doc
_SH_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
sh AS (SELECT DISTINCT doc_id, hs FROM (
         SELECT doc_id,
                ('0x' || substr(md5(s), 1, 14))::BIGINT AS hs
         FROM (SELECT doc_id,
                unnest(list_transform(generate_series(1, len(tk) - 2),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
               FROM toks))),
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.hs = b.hs AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jac AS (SELECT da, db, i AS inter, x.nsh AS na, y.nsh AS nb
        FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
        WHERE 2 * i >= (x.nsh + y.nsh - i))"""


def q_dedup_ngram(spark, sf_dir):
    return dedup.jaccard_pairs(_docs(spark, sf_dir), JACCARD_N, 1, 2,
                               df_cap=dedup.DF_CAP)


# capped shingle set (df <= DF_CAP) mirrored from jaccard_pairs' skew guard
_SH_CAP_CTE = f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
sh0 AS (SELECT DISTINCT doc_id, hs FROM (
         SELECT doc_id,
                ('0x' || substr(md5(s), 1, 14))::BIGINT AS hs
         FROM (SELECT doc_id,
                unnest(list_transform(generate_series(1, len(tk) - 2),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
               FROM toks))),
hot AS (SELECT hs FROM sh0 GROUP BY hs HAVING count(*) > {dedup.DF_CAP}),
sh AS (SELECT * FROM sh0 ANTI JOIN hot USING (hs)),
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.hs = b.hs AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jac AS (SELECT da, db, i AS inter, x.nsh AS na, y.nsh AS nb
        FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
        WHERE 2 * i >= (x.nsh + y.nsh - i))"""


SQL_DEDUP_NGRAM = f"""
WITH {_SH_CAP_CTE}
SELECT da, db, inter, na, nb FROM jac"""


_MINHASH_CTE = f"""
hm AS (SELECT doc_id, hs % {MINHASH_P} AS hm FROM sh),
pm AS (SELECT doc_id, i AS perm,
              (CAST({perm_a_sql()} AS BIGINT) * hm + {perm_b_sql()})
              % {MINHASH_P} AS v
       FROM hm CROSS JOIN (SELECT unnest(generate_series(0, {N_PERMS - 1}))
                           AS i)),
mins AS (SELECT doc_id, perm, min(v) AS mh FROM pm GROUP BY 1, 2),
bands AS (SELECT doc_id, perm // 2 AS band,
                 CAST(SUM((mh % {SIG_BASE})
                      * (CASE WHEN perm % 2 = 0 THEN 1 ELSE {SIG_BASE} END))
                      AS BIGINT) AS sig
          FROM mins GROUP BY 1, 2)"""


def q_minhash_bands(spark, sf_dir):
    return dedup.minhash_bands(_docs(spark, sf_dir), JACCARD_N)


SQL_MINHASH_BANDS = f"""
WITH {_SH_CTE},
{_MINHASH_CTE}
SELECT doc_id, band, sig FROM bands"""


def q_dedup_minhash(spark, sf_dir):
    return dedup.minhash_dedup(_docs(spark, sf_dir), JACCARD_N, 1, 2)


SQL_DEDUP_MINHASH = f"""
WITH {_SH_CTE},
{_MINHASH_CTE},
cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
SELECT j.da, j.db, j.inter, j.na, j.nb
FROM cand c JOIN jac j ON j.da = c.da AND j.db = c.db"""


_SIMHASH_CTE = f"""
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
hv AS (SELECT doc_id, {duck_h_sql('token')} AS hv FROM tok),
bits AS (SELECT doc_id, j,
                SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM hv CROSS JOIN (SELECT unnest(generate_series(0, 55)) AS j)
         GROUP BY doc_id, j),
sh56 AS (SELECT doc_id,
                CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << j)
                         ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id)"""


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir))


SQL_SIMHASH = f"""
WITH {_SIMHASH_CTE}
SELECT doc_id, simhash FROM sh56"""


def q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(_docs(spark, sf_dir), 7)


SQL_SIMHASH_PAIRS = f"""
WITH {_SIMHASH_CTE}
SELECT a.doc_id AS da, b.doc_id AS db,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh56 a JOIN sh56 b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 7"""


def q_dedup_components(spark, sf_dir):
    """Near-dup clustering: SimHash pairs (hamming <= 7) -> connected
    components; every doc reports its component's min doc_id (the
    canonical representative a dedup pipeline keeps). Exercises the
    iterative star-contraction DataFrame algorithm end to end against a
    DuckDB recursive-CTE fixpoint oracle."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.simhash_pairs(docs, 7).select("da", "db")
    return (components.connected_components(
                pairs, docs.select("doc_id"), id_col="doc_id")
            .selectExpr("id AS doc_id", "comp"))


# min-label reachability fixpoint: r accumulates every (node, label of a
# node that reaches it); UNION dedupes so the recursion terminates; the
# final GROUP BY takes the component minimum. Symmetric edge list =>
# min reachable label == component min.
SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {_SIMHASH_CTE},
p AS (SELECT a.doc_id AS da, b.doc_id AS db
      FROM sh56 a JOIN sh56 b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 7),
e AS (SELECT da AS u, db AS v FROM p
      UNION ALL SELECT db, da FROM p),
r(id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.v, r.lbl FROM r JOIN e ON r.id = e.u
)
SELECT id AS doc_id, MIN(lbl) AS comp FROM r GROUP BY id"""


# ------------------------------------------------------- similarity search

_VEC_CTE = f"""
v AS (SELECT vec_id, {duck_quant_sql()} AS v FROM embeddings),
nv AS (SELECT vec_id, v,
              CAST(list_sum(list_transform(v, e -> e * e)) AS BIGINT) AS nn
       FROM v)"""


def q_ann_cosine_topk(spark, sf_dir):
    return ann.cosine_topk(_emb(spark, sf_dir), ANN_QUERY_FILTER, 10)


SQL_ANN_COSINE_TOPK = f"""
WITH {_VEC_CTE},
q AS (SELECT * FROM nv WHERE {ANN_QUERY_FILTER}),
d AS (SELECT q.vec_id AS qid, nv.vec_id AS nid,
             CAST(list_sum(list_transform(generate_series(1, 64),
                  i -> q.v[i] * nv.v[i])) AS BIGINT) AS dot,
             q.nn AS na, nv.nn AS nb
      FROM q CROSS JOIN nv WHERE nv.vec_id <> q.vec_id),
r AS (SELECT qid, nid, dot, na, nb,
             dot::DOUBLE / sqrt(na::DOUBLE * nb::DOUBLE) AS cos,
             ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY dot::DOUBLE / sqrt(na::DOUBLE * nb::DOUBLE) DESC,
                         nid ASC) AS rank
      FROM d)
SELECT qid, nid, dot, na, nb, cos, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 10"""


def q_embedding_neardup(spark, sf_dir):
    return ann.neardup_pairs(_emb(spark, sf_dir), NEARDUP_TAU)


SQL_EMBEDDING_NEARDUP = f"""
WITH {_VEC_CTE},
d AS (SELECT a.vec_id AS da, b.vec_id AS db,
             CAST(list_sum(list_transform(generate_series(1, 64),
                  i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
             a.nn AS na, b.nn AS nb
      FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
SELECT da, db, dot, na, nb,
       dot::DOUBLE / sqrt(na::DOUBLE * nb::DOUBLE) AS cos
FROM d WHERE dot::DOUBLE / sqrt(na::DOUBLE * nb::DOUBLE) >= {NEARDUP_TAU}"""


def q_ann_srp_lsh(spark, sf_dir):
    """Approximate (LSH) variant; recall vs the exact top-k is asserted
    in tests/test_pipeline.py.

    Oracled exactly despite being approximate: bucketing runs on int64-
    quantized embeddings/planes (deterministic for any partitioning), so
    the expected result is precomputed by an independent pandas/numpy
    reimplementation (scripts/gen_ann_fixture.py) into a fixture parquet
    the oracle selects by a table checksum."""
    return ann.srp_topk(_emb(spark, sf_dir), ANN_QUERY_FILTER, 10)


def q_ann_ivf(spark, sf_dir):
    """Approximate (inverted-file / coarse-centroid) variant; recall
    asserted in tests/test_pipeline.py. Oracled exactly via the
    precomputed fixture, like q_ann_srp_lsh (quantized centroids make
    list assignment integer-exact)."""
    return ann.ivf_topk(_emb(spark, sf_dir), ANN_QUERY_FILTER, 10)


_FX_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "fixtures_data")

# must match scripts/gen_ann_fixture.py table_key() verbatim
_TABLE_KEY_SQL = (
    "SELECT CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000) "
    "AS BIGINT) * ((vec_id % 97) + 1)) AS BIGINT) FROM embeddings")


def _sql_ann_fixture(name: str) -> str:
    path = os.path.join(_FX_DIR, f"{name}.parquet")
    return f"""
SELECT f.qid, f.nid, f.dot, f.na, f.nb, f.cos, f.rank
FROM read_parquet('{path}') f
WHERE f.table_key = ({_TABLE_KEY_SQL})"""


# ------------------------------------------------------------------ registry

QUERIES = {
    "text_stats": q_text_stats,
    "regex_token_stats": q_regex_token_stats,
    "token_topk": q_token_topk,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram": q_dedup_ngram,
    "minhash_bands": q_minhash_bands,
    "dedup_minhash": q_dedup_minhash,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "dedup_components": q_dedup_components,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_neardup": q_embedding_neardup,
    "ann_srp_lsh": q_ann_srp_lsh,
    "ann_ivf": q_ann_ivf,
}

ORACLES = {
    "text_stats": SQL_TEXT_STATS,
    "regex_token_stats": SQL_REGEX_TOKEN_STATS,
    "token_topk": SQL_TOKEN_TOPK,
    "lang_id": _sql_lang_id(),
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram": SQL_DEDUP_NGRAM,
    "minhash_bands": SQL_MINHASH_BANDS,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "simhash": SQL_SIMHASH,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    # ann_srp_lsh, ann_ivf are approximate in WHICH candidates they
    # consider but fully deterministic (int-quantized bucketing), so an
    # independent numpy reimplementation precomputes the expected top-k
    # into fixture parquets (scripts/gen_ann_fixture.py); recall vs the
    # exact top-k is still asserted in pytest
    "ann_srp_lsh": _sql_ann_fixture("ann_srp"),
    "ann_ivf": _sql_ann_fixture("ann_ivf"),
}
