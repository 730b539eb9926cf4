"""Similarity search over embedding columns (`array<float>`).

- :func:`cosine_topk` — brute-force exact top-k (the correctness
  baseline; O(n) per query, fine when the query side is broadcast).
- :func:`lsh_topk` — sign-LSH bucketed ANN (the scale path): bucket id
  = sign bits of the first ``LSH_BITS`` dimensions; only the query's
  bucket is scanned (≈ n / 2^bits candidates). Deterministic, so the
  DuckDB oracle implements the identical algorithm and matches exactly.
- :func:`cosine_neardup_pairs` — embedding near-dup pairs ≥ threshold;
  candidate generation via the same LSH buckets (scale), verification
  exact.

At 100 TB the embeddings table is bucketed by `lsh_bucket` on disk so a
query prunes to one bucket's files; brute-force stays as the rerank
step within candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import semantics as S

LSH_BITS = 6  # 64 buckets


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lsh_bucket(emb: Column, bits: int = LSH_BITS) -> Column:
    """Σ 2^d · (emb[d] > 0) over the first `bits` dims."""
    out = None
    for d in range(bits):
        bit = F.when(F.element_at(emb, d + 1) > 0, F.lit(1 << d)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k vs one stored vector."""
    e = emb.select("vec_id", _as_double("embedding").alias("emb"))
    qv = F.broadcast(e.where(F.col("vec_id") == query_vec_id).select(F.col("emb").alias("qemb")))
    return (
        e.crossJoin(qv)
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", cosine(F.col("emb"), F.col("qemb")).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
    )


def lsh_topk(emb: DataFrame, query_vec_id: int, k: int = 10, bits: int = LSH_BITS) -> DataFrame:
    """ANN top-k: scan only the query's sign-LSH bucket, exact rerank
    inside it. (Pinned ANN semantics: recall loss vs brute force is
    part of the algorithm, mirrored exactly by the oracle.)"""
    e = emb.select(
        "vec_id",
        _as_double("embedding").alias("emb"),
    ).withColumn("bucket", lsh_bucket(F.col("emb"), bits))
    qv = F.broadcast(
        e.where(F.col("vec_id") == query_vec_id).select(
            F.col("emb").alias("qemb"), F.col("bucket").alias("qbucket")
        )
    )
    return (
        e.join(qv, F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", cosine(F.col("emb"), F.col("qemb")).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
    )


IVF_LISTS = 16      # inverted lists (centroids)
IVF_PROBES = 4      # lists probed per query
IVF_SEED = 42


def _ivf_centroids(dim: int, n_lists: int = IVF_LISTS, seed: int = IVF_SEED):
    """Deterministic unit-norm centroids (seeded Gaussian). A trained
    k-means would replace this at deployment; the index STRUCTURE —
    assignment, list pruning, probe/rerank — is identical either way,
    and determinism is what makes the operator testable."""
    import numpy as np

    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(emb: DataFrame, n_lists: int = IVF_LISTS) -> DataFrame:
    """(vec_id, emb, list_id): each vector goes to its nearest centroid
    (cosine argmax via one Arrow GEMM per batch). At scale the table is
    written partitioned by list_id so a probe scans only its lists."""
    import numpy as np
    import pandas as pd

    e = emb.select("vec_id", _as_double("embedding").alias("emb"))
    dim = len(e.select("emb").first()["emb"])
    cents = _ivf_centroids(dim, n_lists)
    sc = e.sparkSession.sparkContext
    b_c = sc.broadcast(cents)

    def assign(batches):
        for pdf in batches:
            q = np.array(list(pdf["emb"]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            lists = np.argmax(qn @ b_c.value.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "emb": pdf["emb"], "list_id": lists.astype(np.int32)}
            )

    return e.mapInPandas(assign, "vec_id LONG, emb ARRAY<DOUBLE>, list_id INT")


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    n_lists: int = IVF_LISTS,
    n_probes: int = IVF_PROBES,
) -> DataFrame:
    """IVF ANN top-k: probe the ``n_probes`` centroids nearest the
    query, exact cosine rerank inside the probed lists only (≈
    n_probes/n_lists of the table scanned; recall loss is the
    deterministic ANN trade, bounded by the probe count)."""
    import numpy as np

    assigned = ivf_assign(emb, n_lists)
    qrow = assigned.where(F.col("vec_id") == query_vec_id).first()
    qv = np.array(qrow["emb"], dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    cents = _ivf_centroids(len(qv), n_lists)
    probes = [int(i) for i in np.argsort(-(cents @ qn))[:n_probes]]
    qlit = F.array(*[F.lit(float(x)) for x in qrow["emb"]])
    return (
        assigned.where(F.col("list_id").isin(probes))
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", cosine(F.col("emb"), qlit).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
    )


def cosine_neardup_pairs(
    emb: DataFrame, *, threshold: float = 0.45, bits: int = 0
) -> DataFrame:
    """(vec_a, vec_b, cos_sim) pairs with cosine ≥ threshold — exact.

    Executed as a **blocked matrix product**: one side is L2-normalized
    into a broadcast numpy matrix, the other streams through an Arrow
    ``mapInPandas`` that GEMMs each batch against it — the per-pair
    higher-order-function arithmetic this replaces is interpreted (not
    codegen) in Spark and ~50× slower. At cluster scale the broadcast
    side becomes a loop over column blocks of the same product (both
    sides partitioned); ``bits>0`` instead restricts candidates to
    same-sign-LSH-bucket pairs (the recall-trading scale mode).
    """
    import pandas as pd

    e = emb.select("vec_id", _as_double("embedding").alias("emb"))
    if bits:
        e = e.withColumn("bucket", lsh_bucket(F.col("emb"), bits))
        joined = e.alias("a").join(e.alias("b"), F.col("a.bucket") == F.col("b.bucket"))
        return (
            joined.where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                cosine(F.col("a.emb"), F.col("b.emb")).alias("cos_raw"),
            )
            .where(F.col("cos_raw") >= threshold)
            .select("vec_a", "vec_b", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
            .orderBy("vec_a", "vec_b")
        )

    import numpy as np

    rows = e.collect()  # broadcast side: n×d doubles (tiny vs the pair set)
    ids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    mat = np.array([r["emb"] for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = e.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat_n)

    def gemm(batches):
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            q = np.array(list(pdf["emb"]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ b_mat.value.T
            qi, mj = np.nonzero((sims >= threshold) & (q_ids[:, None] < b_ids.value[None, :]))
            if len(qi):
                yield pd.DataFrame(
                    {
                        "vec_a": q_ids[qi],
                        "vec_b": b_ids.value[mj],
                        "cos_raw": sims[qi, mj],
                    }
                )

    return (
        e.mapInPandas(gemm, "vec_a LONG, vec_b LONG, cos_raw DOUBLE")
        .select("vec_a", "vec_b", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )
