"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 gets a `queries()` entry
(Spark DataFrame plan) and, where SQL-expressible, a matching
`oracle_sql()` ANSI-SQL string the driver runs in DuckDB at sf=0.01.
Column names/aliases match exactly; floats are rounded to
semantics.SCORE_DECIMALS in BOTH engines; ordering uses unrounded
values with deterministic tie-breaks.

The transcripts table (BASELINE.json input_hint shape) is synthesized
deterministically per scale factor (corpus.py) — the oracle SQL reads
the same parquet via read_parquet('<abs path>').
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import semantics as S
from .corpus import ensure_transcripts, sf_from_dir
from .functions.text import doc_id_col
from .query.bm25 import corpus_stats, search_direct, term_frequencies, tokenized

ORACLE_SF = 0.01  # the driver's correctness tier (TESTDATA.md)


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(ensure_transcripts(sf_from_dir(sf_dir)))


def _stop_sql() -> str:
    return ", ".join(f"'{w}'" for w in S.STOPWORDS)


def _terms_sql(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def _tok_cte(path: str) -> str:
    """Shared CTE prefix: tokenized docs + lengths + corpus stats."""
    return f"""
WITH t AS (
  SELECT conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 4, '0') AS doc_id,
         role, tool, ts,
         list_filter(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+'),
                     x -> x NOT IN ({_stop_sql()})) AS toks
  FROM read_parquet('{path}')
),
dl AS (SELECT doc_id, role, tool, ts, len(toks) AS dl FROM t),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t)
"""


def _bm25_sql(path: str, terms_expr: str, where: str = "") -> str:
    """terms_expr: SQL producing qt(term) rows (the distinct query terms)."""
    return f"""{_tok_cte(path)},
qt AS ({terms_expr}),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tok WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2
),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (st.n - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf * {S.K1 + 1.0} / (tf.tf + {S.K1} * ({1.0 - S.B} + {S.B} * dl.dl / st.avgdl)) ) AS score_raw
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), st
  {where}
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score_raw, {S.SCORE_DECIMALS}) AS score
FROM sc ORDER BY score_raw DESC, doc_id ASC LIMIT {S.TOP_K}
"""


def _bm25_spark(spark, sf_dir, terms, doc_predicate=None) -> DataFrame:
    return search_direct(load_transcripts(spark, sf_dir), terms, doc_predicate=doc_predicate)


# --------------------------------------------------------------------------
# transcripts: BM25 search family (SURVEY §2.4/§2.5 J1-J5, R1-R5)
# --------------------------------------------------------------------------

Q_SINGLE = ["spark"]
Q_MULTI = ["query", "plan", "shuffle"]
Q_HEAVY = ["data", "model", "run"]
Q_FILTERED = ["spark", "query"]
Q_SYNONYM = list(S.SYNONYM_GROUPS[0])  # query 'кепка' expands to group
FUZZY_SOURCE = "serach"  # planted typo; expands via levenshtein<=1


def q_bm25_single(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, Q_SINGLE)


def q_bm25_multi(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, Q_MULTI)


def q_bm25_heavy(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, Q_HEAVY)


def q_bm25_filtered(spark, sf_dir):
    pred = (F.col("role") == "assistant") & (F.col("tool") == "search")
    return _bm25_spark(spark, sf_dir, Q_FILTERED, doc_predicate=pred)


def q_bm25_synonym(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, Q_SYNONYM)


def q_bm25_fuzzy(spark, sf_dir):
    """Fuzziness=1 (reference search.go:122): expand against the corpus
    term dictionary with levenshtein<=1, then score each expansion."""
    t = load_transcripts(spark, sf_dir)
    vocab = (
        tokenized(t)
        .select(F.explode("tokens").alias("term"))
        .where(F.length("term").between(len(FUZZY_SOURCE) - 1, len(FUZZY_SOURCE) + 1))
        .distinct()
        .where(F.levenshtein(F.col("term"), F.lit(FUZZY_SOURCE)) <= 1)
    )
    terms = sorted(r["term"] for r in vocab.collect())
    return search_direct(t, terms)


# --------------------------------------------------------------------------
# transcripts: index statistics (SURVEY §2.6 G1-G4)
# --------------------------------------------------------------------------

def q_term_df_top(spark, sf_dir):
    tok = tokenized(load_transcripts(spark, sf_dir))
    return (
        tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


def q_doclen_by_role(spark, sf_dir):
    tok = tokenized(load_transcripts(spark, sf_dir))
    return tok.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )


def _ts_us():
    # parquet ts loads as TIMESTAMP_NTZ in Spark 4; session TZ is UTC so the
    # LTZ cast preserves the stored micros (== DuckDB epoch_us on naive ts)
    return F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us")


def q_scan_stable_order(spark, sf_dir):
    """Per-row invariant: stable (conv_id, turn_idx) ordering == doc_id order."""
    t = load_transcripts(spark, sf_dir)
    return (
        t.select(doc_id_col().alias("doc_id"), "role", "tool", _ts_us())
        .orderBy("doc_id")
        .limit(1000)
    )


def q_filter_range_multiselect(spark, sf_dir):
    """F2/F3/F5: ts range OR-block AND multi-select (filter.go:62-104)."""
    t = load_transcripts(spark, sf_dir)
    return (
        t.where(
            F.col("ts").between(F.lit("2025-01-01 00:30:00"), F.lit("2025-01-01 02:00:00"))
            & F.col("tool").isin(["bash", "search"])
            & (F.col("role") == "assistant")
        )
        .select(doc_id_col().alias("doc_id"), "tool", _ts_us())
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# documents: training-data-pipeline operators
# --------------------------------------------------------------------------

def q_docs_exact_dedup(spark, sf_dir):
    """Exact dedup: content-hash groups, keep min doc_id (hash-groupBy)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_md5"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") >= 1)
    )


def q_docs_token_stats(spark, sf_dir):
    """Token counting + quality signals per doc (length/stopword ratio)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(S.TOKEN_PATTERN_JAVA), F.lit(0))
    stop = F.lit(list(S.STOPWORDS))
    d2 = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("n_stop"),
    )
    return d2.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("n_stop") / F.col("n_tokens")).otherwise(F.lit(0.0)),
            S.SCORE_DECIMALS,
        ).alias("stop_ratio"),
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 embedding (baseline ANN)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    qv = F.broadcast(e.where(F.col("vec_id") == 0).select(F.col("emb").alias("qemb")))
    dot = F.aggregate(
        F.zip_with("emb", "qemb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))  # noqa: E731
    return (
        e.crossJoin(qv)
        .where(F.col("vec_id") != 0)
        .select("vec_id", (dot / (nrm(F.col("emb")) * nrm(F.col("qemb")))).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_single": q_bm25_single,
        "bm25_multi": q_bm25_multi,
        "bm25_heavy": q_bm25_heavy,
        "bm25_filtered": q_bm25_filtered,
        "bm25_synonym": q_bm25_synonym,
        "bm25_fuzzy": q_bm25_fuzzy,
        "term_df_top": q_term_df_top,
        "doclen_by_role": q_doclen_by_role,
        "scan_stable_order": q_scan_stable_order,
        "filter_range_multiselect": q_filter_range_multiselect,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_token_stats": q_docs_token_stats,
        "ann_cosine_topk": q_ann_cosine_topk,
    }


def oracle_sql() -> dict[str, str]:
    path = ensure_transcripts(ORACLE_SF)
    lit = lambda ts: "SELECT unnest([" + _terms_sql(ts) + "]) AS term"  # noqa: E731
    return {
        "bm25_single": _bm25_sql(path, lit(Q_SINGLE)),
        "bm25_multi": _bm25_sql(path, lit(Q_MULTI)),
        "bm25_heavy": _bm25_sql(path, lit(Q_HEAVY)),
        "bm25_filtered": _bm25_sql(
            path, lit(Q_FILTERED), where="WHERE dl.role = 'assistant' AND dl.tool = 'search'"
        ),
        "bm25_synonym": _bm25_sql(path, lit(Q_SYNONYM)),
        "bm25_fuzzy": _bm25_sql(
            path,
            f"SELECT DISTINCT term FROM tok WHERE levenshtein(term, '{FUZZY_SOURCE}') <= 1",
        ),
        "term_df_top": f"""{_tok_cte(path)}
SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
ORDER BY df DESC, term ASC LIMIT 50
""",
        "doclen_by_role": f"""{_tok_cte(path)}
SELECT role, count(*) AS n_docs, sum(dl) AS sum_dl FROM dl GROUP BY role
""",
        "scan_stable_order": f"""
SELECT conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 4, '0') AS doc_id,
       role, tool, epoch_us(ts) AS ts_us
FROM read_parquet('{path}') ORDER BY doc_id LIMIT 1000
""",
        "filter_range_multiselect": f"""
SELECT conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 4, '0') AS doc_id,
       tool, epoch_us(ts) AS ts_us
FROM read_parquet('{path}')
WHERE ts BETWEEN TIMESTAMP '2025-01-01 00:30:00' AND TIMESTAMP '2025-01-01 02:00:00'
  AND tool IN ('bash', 'search') AND role = 'assistant'
ORDER BY doc_id
""",
        "docs_exact_dedup": """
SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
        "docs_token_stats": f"""
WITH d AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+') AS toks
  FROM documents
)
SELECT doc_id, lang, len(toks) AS n_tokens,
       round(CASE WHEN len(toks) > 0
             THEN CAST(len(list_filter(toks, x -> x IN ({_stop_sql()}))) AS DOUBLE) / len(toks)
             ELSE 0.0 END, {S.SCORE_DECIMALS}) AS stop_ratio
FROM d
""",
        "ann_cosine_topk": f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(emb, qemb)
             / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qemb, qemb))),
             {S.SCORE_DECIMALS}) AS cos_sim
FROM e, q WHERE vec_id <> 0
ORDER BY list_dot_product(emb, qemb)
         / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qemb, qemb))) DESC,
         vec_id ASC
LIMIT 10
""",
    }
