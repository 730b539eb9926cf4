"""Deduplication operators over the `documents` table.

All hashing is md5-based so every operator has a bit-identical DuckDB
oracle (cross-engine: Spark ``conv(substr(md5(x),1,12),16,10)`` ==
DuckDB ``('0x'||substr(md5(x),1,12))::UBIGINT``). Each operator is pure
DataFrame algebra — the scale path is the candidate-pair generation
(LSH band buckets / shared-shingle joins), never an O(n²) cross join.

Scale notes (100 TB): shingle/minhash computation is embarrassingly
parallel map-side work; the only shuffles are the band-bucket groupBy
(bounded: band keys are near-uniform md5 values) and the candidate-pair
verification join. High-df shingles (boilerplate) are the skew risk in
the shared-shingle join — `ngram_jaccard_pairs` drops shingles above a
df cap, the standard "stop-shingle" mitigation, before pairing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import semantics as S

MINHASH_K = 8          # minhash functions
MINHASH_BAND = 2       # rows per band → 4 bands
SHINGLE_W = 3          # tokens per shingle


def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(S.TOKEN_PATTERN_JAVA), F.lit(0))


def shingles_col(text: Column, w: int = SHINGLE_W) -> Column:
    """Distinct w-token shingles, space-joined; empty array when the doc
    has fewer than w tokens (sequence() would count *down* otherwise).

    Higher-order-function formulation — kept as the reference semantics
    and for tests; the hot path uses :func:`shingles_udf` (Arrow), which
    is ~10× faster because nested transform/concat_ws expressions run
    interpreted, re-entering the expression tree per window."""
    t = tokens_col(text)
    return F.when(F.size(t) < w, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - w),
                lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(w)]),
            )
        )
    )


def _make_shingles_udf(w: int = SHINGLE_W):
    import re

    import pandas  # noqa: F401 — required for pandas_udf type inference
    from pyspark.sql.functions import pandas_udf

    pat = re.compile(S.TOKEN_PATTERN_PY, re.UNICODE)

    def f(t) -> list[str]:
        if not t:  # null/empty text → no shingles (parity with shingles_col)
            return []
        toks = pat.findall(t.lower())
        if len(toks) < w:
            return []
        return list(dict.fromkeys(" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)))

    def shingles(text: "pandas.Series") -> "pandas.Series":
        return text.map(f)

    shingles.__annotations__ = {"text": pandas.Series, "return": pandas.Series}
    return pandas_udf(shingles, "array<string>")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup via content hash: one keeper per distinct text."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_md5"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles) for docs with ≥1 shingle — computed once,
    Arrow-vectorized."""
    udf = _make_shingles_udf()
    return docs.select("doc_id", udf(F.col("text")).alias("shingles")).where(
        F.size("shingles") > 0
    )


def _minhash_from_shingles(sh: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig array<long>) via explode → ONE md5 per shingle →
    k Kirsch-Mitzenmacher derived hashes → map-side-combined groupBy
    min. All whole-stage-codegen; the shuffle carries only k longs per
    doc after partial aggregation.

    Hashing cost model (the round-5 change): one md5 digest per
    shingle instead of k salted ones (md5 is the one hash both engines
    compute identically). The digest yields two independent 48-bit
    halves h1, h2 (hex chars 1-12 / 13-24 — the same
    `conv(substr(md5,..),16,10)` ≡ DuckDB
    `('0x'||substr(md5,..))::UBIGINT` idiom ops/sampling.py pins) and
    hash_i = h1 + i·h2 (Kirsch & Mitzenmacher 2006: two-function
    double hashing preserves MinHash's collision guarantees). Measured
    honestly at sf0.1 the warm signature stage is at parity (~0.2 s
    both ways — the stage is explode/shuffle-bound, not digest-bound);
    the real wins are the shuffle payload (k int64 minima = 64 bytes
    per doc vs k 16-char strings ≈ 2× + object overhead — the gap that
    matters at 10^12-turn scale) and exact BIGINT band keys on both
    engines. Max value h1 + (k-1)·h2 < k·2^48 ≪ 2^63 — no overflow,
    no float."""
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    d = F.md5(F.col("s"))
    h1 = F.conv(F.substring(d, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 13, 12), 16, 10).cast("long")
    hashed = ex.select(
        "doc_id",
        *[(h1 + F.lit(i) * h2).alias(f"h{i}") for i in range(k)],
    )
    agg = hashed.groupBy("doc_id").agg(*[F.min(f"h{i}").alias(f"m{i}") for i in range(k)])
    return agg.select("doc_id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"))


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig array<string>, shingles) — k md5-minhashes per doc."""
    sh = doc_shingles(docs)
    return sh.join(_minhash_from_shingles(sh, k), "doc_id").select("doc_id", "shingles", "sig")


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    k: int = MINHASH_K,
    band: int = MINHASH_BAND,
    threshold: float = 0.8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band signatures → bucket join →
    exact-jaccard verification ≥ threshold.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b. Deterministic:
    the DuckDB oracle implements the identical bands, so even LSH
    recall misses match exactly.
    """
    # shingles are materialized once (persist) and reused for hashing
    # and for the verification join; the band self-join carries only
    # (doc_id, band_key) — dragging the shingle arrays through it (and
    # through the pair dedup) is what blows up the shuffle. A caller may
    # pass an already-persisted ``shingles`` frame (session cache shared
    # across the dedup family) — then its lifecycle is the caller's.
    owns_cache = shingles is None
    sh = doc_shingles(docs).persist() if owns_cache else shingles
    sigs = _minhash_from_shingles(sh, k)
    n_bands = k // band
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws("|", F.lit(str(b)), *[F.col("sig")[b * band + j] for j in range(band)])
                    for b in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    cand = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    out = (
        cand.withColumn("jaccard_raw", inter / union)
        .where(F.col("jaccard_raw") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round("jaccard_raw", S.SCORE_DECIMALS).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
    # materialize the (small) pair set eagerly so the shingle cache can be
    # released immediately — a long-lived session (serving driver, bench
    # loop) must not accumulate cached shingle blocks per call
    out = out.localCheckpoint(eager=True)
    if owns_cache:
        sh.unpersist()
    return out.orderBy("doc_a", "doc_b")


def ngram_jaccard_pairs(
    docs: DataFrame, *, threshold: float = 0.8, max_shingle_df: int = 50,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via the shared-shingle join.

    Candidate pairs = docs sharing ≥1 *rare* shingle (df ≤ max_shingle_df
    — drops boilerplate hot shingles that would blow up the join; at
    threshold ≥ 0.8 a near-dup pair of >max_shingle_df-doc boilerplate
    only would be all-common-shingles, which the df cap can miss — the
    cap is the standard recall/skew trade and is part of the pinned
    semantics, mirrored in the oracle).
    """
    sh = shingles if shingles is not None else doc_shingles(docs)
    ex = sh.select("doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("s"))
    rare = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df_s")).where(F.col("df_s") <= max_shingle_df)
    ex = ex.join(rare.select("s"), "s")
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), "s")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("a.n").alias("na"),
            F.first("b.n").alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
    return (
        pairs.withColumn("jaccard_raw", jac)
        .where(F.col("jaccard_raw") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard_raw", S.SCORE_DECIMALS).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


SIMHASH_BITS = 48  # fits a BIGINT with headroom in both engines


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash over md5 token hashes.

    bit b of simhash = 1 iff Σ_tokens (2·bit_b(h(tok)) − 1) > 0, where
    h = first 48 bits of md5 (token multiplicity = tf weighting).
    """
    tok = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    h = F.conv(F.substring(F.md5("term"), 1, 12), 16, 10).cast("bigint")
    tok = tok.withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = tok.groupBy("doc_id").agg(*aggs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.cast("bigint").alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame, *, max_hamming: int = 3, bits: int = SIMHASH_BITS,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: band the signature into (max_hamming+1)
    12-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical chunk),
    bucket-join, verify with popcount(xor) ≤ max_hamming.

    ``sigs`` lets a serving session pass an already-persisted
    (doc_id, simhash) frame (shared with :func:`simhash_signatures`
    consumers) so the tokenize + 48-bit-sum pass runs once per corpus."""
    if sigs is None:
        sigs = simhash_signatures(docs, bits)
    n_chunks = max_hamming + 1
    w = bits // n_chunks
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(c)),
                        F.shiftright("simhash", c * w).bitwiseAND(F.lit((1 << w) - 1)).cast("string"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_key"),
    )
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), "chunk_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def neardup_clusters(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc_id,
    cluster_id), cluster_id = MIN doc_id in the component (the doc a
    dedup pipeline keeps). The step after pair generation: pairs chain
    (a~b, b~c ⇒ {a,b,c} is one duplicate group even when a~c was never
    emitted).

    Iterative min-label propagation — the standard Spark shape for
    CC at scale (GraphX/GraphFrames do the same under the hood):
    every round each node adopts the minimum label among itself and
    its neighbors; converges in O(graph diameter) rounds, which for
    near-dup graphs (tiny dense clusters) is ≤ a handful. Each round
    ``localCheckpoint``s to truncate lineage (iterative-plan
    discipline) and the convergence test is a cheap count on the
    changed-label frame. Shuffles are bounded by the edge list — never
    all-pairs."""
    edges = pairs.select("doc_a", "doc_b")
    # materialize the symmetric edge list ONCE — every propagation round
    # joins against it, and without this the full upstream pair-generation
    # plan (e.g. the blocked-GEMM all-pairs job) would re-execute per round
    sym = (
        edges.union(
            edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neigh = (
            sym.join(labels, sym["doc_b"] == labels["doc_id"])
            .groupBy("doc_a")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("doc_a", "doc_id")
        )
        new_label = F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label")))
        # the changed flag rides inside the checkpointed frame, so the
        # convergence test is a count over materialized data — one
        # materialization + one cheap count per round, no re-join
        nxt = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                new_label.alias("label"),
                (new_label != F.col("label")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.where(F.col("_chg")).count()
        labels = nxt.drop("_chg")
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id")).orderBy("doc_id")


def dedup_apply(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Materialize the deduplicated corpus: drop every clustered doc
    except its cluster representative (cluster_id == doc_id);
    unclustered docs pass through. Left-anti join on doc_id with NO
    forced broadcast: the drop set is every non-representative
    duplicate — at 100 TB dup rates that is billions of rows, so the
    join strategy is left to AQE/size statistics (broadcast only when
    the measured drop set is actually small)."""
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")


def contamination_pairs(
    docs: DataFrame,
    bench: DataFrame,
    *,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    bench_shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: (doc_id, bench_id, overlap) for every
    corpus doc sharing ≥ ``threshold`` of a benchmark item's word
    3-gram shingles — the standard eval-contamination pass a training
    pipeline runs before the corpus ships.

    ``overlap`` is *containment* (|doc ∩ bench| / |bench shingles|),
    not Jaccard: a long training doc that swallows a whole benchmark
    item verbatim must flag even though its Jaccard is tiny. No
    rare-shingle df cap here (unlike :func:`ngram_jaccard_pairs`):
    dropping hot shingles would miss verbatim inclusions of
    boilerplate-heavy items. The join strategy is left to AQE/size
    statistics: real eval suites are small enough that the bench
    shingles get picked for broadcast (map-side, corpus shingles never
    shuffle), but the hint is not forced — a caller passing a
    corpus-scale "bench" must not OOM the driver (same discipline as
    :func:`dedup_apply`). Self-pairs (bench drawn from the corpus) are
    excluded.
    """
    sh = shingles if shingles is not None else doc_shingles(docs)
    bsh = bench_shingles if bench_shingles is not None else doc_shingles(bench)
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    bex = bsh.select(
        F.col("doc_id").alias("bench_id"),
        F.size("shingles").alias("nb"),
        F.explode("shingles").alias("s"),
    )
    hits = ex.join(bex, "s").where(F.col("doc_id") != F.col("bench_id"))
    agg = hits.groupBy("doc_id", "bench_id").agg(
        F.count(F.lit(1)).alias("inter"), F.first("nb").alias("nb")
    )
    ov = F.col("inter").cast("double") / F.col("nb").cast("double")
    return (
        agg.withColumn("overlap_raw", ov)
        .where(F.col("overlap_raw") >= threshold)
        .select(
            "doc_id", "bench_id",
            F.round("overlap_raw", S.SCORE_DECIMALS).alias("overlap"),
        )
        .orderBy("doc_id", "bench_id")
    )
