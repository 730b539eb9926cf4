"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting — all JVM-side column expressions (no Python on
the data path), each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import semantics as S
from .dedup import doc_shingles, tokens_col

# tiny per-language function-word sets for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "mit", "ein", "zu"),
    "fr": ("le", "la", "les", "de", "et", "des", "un", "une", "du", "est"),
}
CYRILLIC_RE = r"[Ѐ-ӿ]"
CJK_RE = r"[一-鿿]"
MIN_LANG_RATIO = 0.05  # below this on every signal → 'und'


def langid_scores(text: Column) -> dict[str, Column]:
    """Per-language signal columns (pinned heuristic semantics)."""
    n_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    toks = tokens_col(text)
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    out: dict[str, Column] = {
        "ru": F.length(F.regexp_replace(text, r"[^Ѐ-ӿ]", "")) / n_chars,
        "zh": F.length(F.regexp_replace(text, r"[^一-鿿]", "")) / n_chars,
    }
    for lang, words in LANG_STOPWORDS.items():
        lit = F.lit(list(words))
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(lit, t))) / n_toks
    return out


def langid(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, lang_score): argmax language signal; ties
    break toward the alphabetically smallest language code; 'und' when
    every signal is below MIN_LANG_RATIO. Expressed as greatest() + a
    CASE chain so the DuckDB oracle is a literal transliteration."""
    scores = langid_scores(F.col("text"))
    langs = sorted(scores)  # CASE order == alphabetical tie-break
    mx = F.greatest(*[scores[lg] for lg in langs])
    pred = F.when(mx < MIN_LANG_RATIO, F.lit("und"))
    for lg in langs:
        pred = pred.when(scores[lg] == mx, F.lit(lg))
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.round(mx, S.SCORE_DECIMALS).alias("lang_score"),
    )


def quality(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, uniq_ratio, stop_ratio, mean_tok_len, quality_score).

    quality_score ∈ [0,1]: product of clamped sub-signals — length in a
    sane band, vocabulary diversity, presence (not excess) of function
    words. Pinned formula (the oracle mirrors it exactly):
        len_ok   = least(n_tokens/20, 1)
        diversity= uniq_tokens/n_tokens
        stop_ok  = 1 - |stop_ratio - 0.4|
        score    = round(len_ok * diversity * stop_ok, 4)
    """
    toks = tokens_col(F.col("text"))
    stop = F.lit(list(S.STOPWORDS))
    d = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("n_stop"),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).alias("sum_len"),
    )
    nt = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    len_ok = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    diversity = F.col("n_uniq") / nt
    stop_ratio = F.col("n_stop") / nt
    stop_ok = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4))
    return d.select(
        "doc_id",
        "n_tokens",
        F.round(diversity, S.SCORE_DECIMALS).alias("uniq_ratio"),
        F.round(stop_ratio, S.SCORE_DECIMALS).alias("stop_ratio"),
        F.round(F.col("sum_len") / nt, S.SCORE_DECIMALS).alias("mean_tok_len"),
        F.round(len_ok * diversity * stop_ok, S.SCORE_DECIMALS).alias("quality_score"),
    )


FINGERPRINT_K = 4


def fingerprints(docs: DataFrame, k: int = FINGERPRINT_K) -> DataFrame:
    """(doc_id, fingerprint): bottom-k sketch of md5 shingle hashes,
    '|'-joined (stringified so cross-engine value-hash comparison is
    representation-stable). Equal fingerprints ⇒ near-identical shingle
    sets — a cheap first-pass dedup key."""
    # explode → codegen md5 → re-assemble: the higher-order transform()
    # alternative runs interpreted (one md5 call-tree per element)
    sh = docs.select("doc_id").join(doc_shingles(docs), "doc_id", "left")
    ex = sh.select("doc_id", F.explode_outer("shingles").alias("s"))
    hashed = ex.select("doc_id", F.substring(F.md5("s"), 1, 16).alias("h"))
    agg = hashed.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("h")).alias("hs")
    )
    return agg.select("doc_id", F.concat_ws("|", F.slice("hs", 1, k)).alias("fingerprint"))


def topk_keywords(docs: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, rank, term, tfidf) — top-k TF-IDF keywords per document
    (pipeline curation: topic labels, quality filters, index hints).

    tfidf = tf · ln(N / df) over word tokens; rank by (tfidf desc,
    term asc) so ties are deterministic cross-engine. All JVM codegen:
    explode → two map-side-combined aggregations (per-doc tf, corpus
    df) → broadcast-joinable df table (|vocab| rows) → per-doc window
    top-k. The window partitions by doc_id — maximal parallelism, no
    global sort."""
    from pyspark.sql import Window

    ex = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df derives from tf — its rows are already distinct (doc, term)
    # pairs — so the corpus is tokenized ONCE (the tf aggregate is a
    # shared subplan; ReuseExchange dedups it) instead of a second
    # explode + full distinct shuffle
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N folds into the plan as a one-row cross join (the oracle's shape)
    # instead of an eager count() — one job per call, not two
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = tf.join(df, "term").crossJoin(n_docs).withColumn(
        "tfidf_raw",
        F.col("tf").cast("double") * F.log(F.col("_n") / F.col("df").cast("double")),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id", "rank", "term",
            F.round("tfidf_raw", S.SCORE_DECIMALS).alias("tfidf"),
        )
        .orderBy("doc_id", "rank")
    )


def composition(docs: DataFrame) -> DataFrame:
    """(source, lang, n_docs, total_tokens, mean_tokens, dup_rate,
    mean_quality) — the dataset-card composition report a training
    pipeline publishes with every corpus release.

    Cross-engine float determinism by construction: every ratio is
    derived from INTEGER sums only (token counts, distinct-text counts,
    and quality folded to an integer basis via round(q·10⁴) BEFORE
    summing), so aggregation order — which differs between engines and
    between runs — can never flip the value hash. One shuffle on the
    (source, lang) grouping key; the quality/token metrics ride the
    same pass."""
    q = quality(docs).select("doc_id", "n_tokens", "quality_score")
    base = docs.select("doc_id", "source", "lang", F.md5(F.col("text")).alias("h"))
    agg = (
        base.join(q, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count_distinct("h").alias("n_uniq_texts"),
            F.sum(F.round(F.col("quality_score") * 10000).cast("long")).alias("qsum"),
        )
    )
    nd = F.col("n_docs").cast("double")
    return agg.select(
        "source", "lang", "n_docs",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.round(F.col("total_tokens").cast("double") / nd, S.SCORE_DECIMALS).alias("mean_tokens"),
        F.round(F.lit(1.0) - F.col("n_uniq_texts").cast("double") / nd, S.SCORE_DECIMALS).alias("dup_rate"),
        F.round(F.col("qsum").cast("double") / (F.lit(10000.0) * nd), S.SCORE_DECIMALS).alias("mean_quality"),
    ).orderBy("source", "lang")


def repetition(docs: DataFrame) -> DataFrame:
    """Within-document repetition ratio — the duplicate-3-gram quality
    filter of large-pretraining-corpus pipelines (boilerplate, chant
    text, and template spam score high): per doc, the fraction of word
    3-grams that are repeats of an earlier 3-gram in the same doc.

    All counting is integer (n_3grams, n_distinct); the ratio derives
    from the two counts, so the value hashes identically across engines
    and aggregation orders. Pure JVM column expressions (sequence +
    transform over the token array) — scan-local, no shuffle except the
    output ordering."""
    # materialize tokens FIRST: inlining tokens_col into every
    # element_at would re-run the regex extraction per 3-gram position
    tokd = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    toks = F.col("toks")
    t3 = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = tokd.select("doc_id", t3.alias("t3")).select(
        "doc_id",
        F.size("t3").cast("long").alias("n_3grams"),
        F.size(F.array_distinct("t3")).cast("long").alias("n_distinct"),
    )
    return d.select(
        "doc_id",
        "n_3grams",
        "n_distinct",
        F.round(
            F.when(
                F.col("n_3grams") > 0,
                1.0 - F.col("n_distinct") / F.col("n_3grams"),
            ).otherwise(F.lit(0.0)),
            S.SCORE_DECIMALS,
        ).alias("rep_ratio"),
    ).orderBy("doc_id")
