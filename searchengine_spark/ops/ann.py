"""Similarity search over embedding columns (`array<float>`).

- :func:`cosine_topk` — brute-force exact top-k (the correctness
  baseline; O(n) per query, fine when the query side is broadcast).
- :func:`lsh_topk` — sign-LSH bucketed ANN (the scale path): bucket id
  = sign bits of the first ``LSH_BITS`` dimensions; only the query's
  bucket is scanned (≈ n / 2^bits candidates). Deterministic, so the
  DuckDB oracle implements the identical algorithm and matches exactly.
- :func:`ivf_topk` — IVF ANN with centroids TRAINED by deterministic
  spherical k-means over a bounded sample (the same pure-numpy trainer
  the oracle generator runs, so assignments are reproducible end to
  end).
- :func:`ensure_ann_store` — materializes both index structures ONCE
  as partitioned parquet (``lsh/bucket=…``, ``ivf/list_id=…`` +
  ``centroids.json``); :func:`lsh_topk_store` / :func:`ivf_topk_store`
  probe them with partition-pruned scans instead of recomputing the
  assignment per query.
- :func:`cosine_neardup_pairs` — embedding near-dup pairs ≥ threshold,
  exact, via a fully distributed BLOCKED matrix product: vectors are
  packed into ~``block``-row numpy tiles, every tile pair is GEMMed in
  an Arrow ``mapInPandas`` task. No driver collect of the corpus — at
  cluster scale the tile join shuffles O(n_blocks · corpus), the
  inherent cost of exact all-pairs.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import semantics as S

LSH_BITS = 6        # pinned oracle-tier floor (64 buckets)
IVF_LISTS = 16      # pinned oracle-tier floor (inverted lists)
IVF_PROBES = 4      # lists probed per query
IVF_SEED = 42
IVF_SAMPLE = 4096   # training-sample bound (first N by vec_id)
IVF_ITERS = 8       # k-means refinement passes
NEARDUP_BLOCK = 4096  # tile rows for the blocked GEMM

# store sizing: expected rows per LSH bucket / IVF list at build time
ANN_TARGET_BUCKET_ROWS = 4096
_MAX_LSH_BITS = 24     # ≤ 16 M partition dirs
_MAX_IVF_LISTS = 4096  # keeps driver k-means (sample × lists) feasible


def derive_ann_params(
    n: int, *, target_rows: int = ANN_TARGET_BUCKET_ROWS
) -> tuple[int, int]:
    """Corpus-sized ANN store parameters: bits/lists chosen so the
    EXPECTED rows per LSH bucket / IVF list ≈ ``target_rows`` (bounded
    per-probe scan at any corpus size), floored at the pinned
    oracle-tier constants — every corpus ≤ target·2^LSH_BITS rows
    (incl. all driver-oracle scales) gets exactly the pinned layout,
    so the cross-engine oracles stay bit-identical. Caps: 2^24 LSH
    partition dirs; 4096 IVF lists (above that the sample k-means
    would need sharded training — FAISS-style — not a driver loop)."""
    bits = LSH_BITS
    if n > (target_rows << LSH_BITS):
        bits = min(_MAX_LSH_BITS, math.ceil(math.log2(n / target_rows)))
    lists = max(IVF_LISTS, min(_MAX_IVF_LISTS, int(math.ceil(n / target_rows))))
    return bits, lists


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


def _topk_shape(scored: DataFrame, query_vec_id: int, k: int) -> DataFrame:
    return (
        scored.where(F.col("vec_id") != query_vec_id)
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
    )


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k vs one stored vector."""
    e = emb.select("vec_id", _as_double("embedding").alias("emb"))
    qv = F.broadcast(e.where(F.col("vec_id") == query_vec_id).select(F.col("emb").alias("qemb")))
    return _topk_shape(
        e.crossJoin(qv).select("vec_id", cosine(F.col("emb"), F.col("qemb")).alias("cos_raw")),
        query_vec_id, k,
    )


def cosine_topk_batch(
    emb: DataFrame, query_vec_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k for a BATCH of stored query
    vectors in one pass: broadcast the (small) query set, score every
    (corpus row × query) pair, then a per-query window top-k.

    The batch-serving shape for 100 TB: one corpus scan amortized over
    all queries (vs one job per query), the per-query top-k is a
    ``row_number`` window partitioned by qid — each partition's sort is
    bounded by the corpus, and with AQE the skewless qid partitioning
    spreads queries across executors. Output is deterministic:
    (cos desc, vec_id asc) per qid, matching :func:`cosine_topk`."""
    e = emb.select("vec_id", _as_double("embedding").alias("emb"))
    q = F.broadcast(
        e.where(F.col("vec_id").isin(query_vec_ids)).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
    )
    scored = (
        e.crossJoin(q)
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine(F.col("emb"), F.col("qemb")).alias("cos_raw"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid", "vec_id", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"), "rank"
        )
        .orderBy("qid", "rank")
    )


def _hamming_buckets(bucket: int, bits: int, radius: int) -> list[int]:
    """The query bucket plus every bucket within Hamming distance
    ``radius`` (multi-probe LSH): 1 + bits + C(bits,2) buckets at
    radius 2 — a driver-side constant list, never a distributed job."""
    out = {bucket}
    if radius >= 1:
        out |= {bucket ^ (1 << i) for i in range(bits)}
    if radius >= 2:
        out |= {
            bucket ^ (1 << i) ^ (1 << j)
            for i in range(bits)
            for j in range(i + 1, bits)
        }
    return sorted(out)


def lsh_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    bits: int = LSH_BITS,
    *,
    hamming_probe: int = 0,
) -> DataFrame:
    """ANN top-k: scan only the query's sign-LSH bucket, exact rerank
    inside it. (Pinned ANN semantics: recall loss vs brute force is
    part of the algorithm, mirrored exactly by the oracle.) The
    materialized-store variant :func:`lsh_topk_store` prunes the scan
    to one partition directory instead of filtering the full table.

    ``hamming_probe`` > 0 enables multi-probe LSH: buckets within that
    Hamming distance of the query's are scanned too — the standard
    recall/scan-fraction dial (radius 2 at 6 bits ≈ 34 % of the table
    for ~0.6 recall@10 vs ~0.03 single-bucket on the test embeddings;
    see tests/test_ann_recall.py). Default 0 keeps the pinned
    single-bucket oracle semantics."""
    e = emb.select(
        "vec_id",
        _as_double("embedding").alias("emb"),
    ).withColumn("bucket", lsh_bucket(F.col("emb"), bits))
    if hamming_probe > 0:
        # the probe set needs the query bucket driver-side: one point
        # read (same pattern as ivf_topk), then a bucket-pruned scan
        qrow = e.where(F.col("vec_id") == query_vec_id).first()
        probes = _hamming_buckets(int(qrow["bucket"]), bits, hamming_probe)
        qlit = F.array(*[F.lit(float(x)) for x in qrow["emb"]])
        return _topk_shape(
            e.where(F.col("bucket").isin(probes)).select(
                "vec_id", cosine(F.col("emb"), qlit).alias("cos_raw")
            ),
            query_vec_id, k,
        )
    qv = F.broadcast(
        e.where(F.col("vec_id") == query_vec_id).select(
            F.col("emb").alias("qemb"), F.col("bucket").alias("qbucket")
        )
    )
    return _topk_shape(
        e.join(qv, F.col("bucket") == F.col("qbucket")).select(
            "vec_id", cosine(F.col("emb"), F.col("qemb")).alias("cos_raw")
        ),
        query_vec_id, k,
    )


# --------------------------------------------------------------------------
# IVF: deterministic sample-trained centroids (shared with the oracle)
# --------------------------------------------------------------------------

def train_ivf_centroids(sample, n_lists: int = IVF_LISTS, seed: int = IVF_SEED,
                        iters: int = IVF_ITERS):
    """Spherical k-means over a bounded sample — pure single-threaded
    numpy, seeded Gaussian init, argmax assignment, mean-renormalize
    update. Deterministic given the same sample matrix, which is why
    the DuckDB oracle generator calls THIS function on the same rows
    (first ``IVF_SAMPLE`` vectors by vec_id) and gets bit-identical
    centroids. Sample-based training is also the scale path: real IVF
    builds (FAISS et al.) train on ≤ a few hundred k vectors however
    large the corpus."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, x.shape[1]))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    for _ in range(iters):
        a = np.argmax(xn @ c.T, axis=1)
        for j in range(n_lists):
            m = xn[a == j]
            if len(m):
                v = m.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    c[j] = v / nv
    return c


def _sample_matrix(e: DataFrame, n: int = IVF_SAMPLE):
    """First ``n`` vectors by vec_id as a float64 matrix — a bounded
    driver transfer (≤ n·dim doubles) independent of corpus size."""
    import numpy as np

    rows = e.orderBy("vec_id").limit(n).collect()
    return np.array([r["emb"] for r in rows], dtype=np.float64)


def _assign_lists(e: DataFrame, centroids) -> DataFrame:
    """(vec_id, emb, list_id): nearest-centroid assignment via one
    Arrow GEMM per batch (argmax of normalized dot — scale-invariant,
    so raw dots give the same argmax)."""
    import numpy as np
    import pandas as pd

    sc = e.sparkSession.sparkContext
    b_c = sc.broadcast(np.asarray(centroids, dtype=np.float64))

    def assign(batches):
        for pdf in batches:
            q = np.array(list(pdf["emb"]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            lists = np.argmax(qn @ b_c.value.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "emb": pdf["emb"], "list_id": lists.astype(np.int32)}
            )

    return e.mapInPandas(assign, "vec_id LONG, emb ARRAY<DOUBLE>, list_id INT")


def ivf_assign(emb: DataFrame, n_lists: int = IVF_LISTS, centroids=None) -> DataFrame:
    """(vec_id, emb, list_id): each vector goes to its nearest trained
    centroid. At scale the table is written partitioned by list_id so
    a probe scans only its lists (see :func:`ensure_ann_store`)."""
    e = emb.select("vec_id", _as_double("embedding").alias("emb"))
    if centroids is None:
        centroids = train_ivf_centroids(_sample_matrix(e), n_lists)
    return _assign_lists(e, centroids)


def _probe_lists(centroids, qv, n_probes: int):
    """The ``n_probes`` centroid ids nearest the query (dot desc, ties
    by index asc — np.argsort is stable on the negated keys)."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(qv, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    return [int(i) for i in np.argsort(-(c @ qn), kind="stable")[:n_probes]]


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    n_lists: int = IVF_LISTS,
    n_probes: int = IVF_PROBES,
) -> DataFrame:
    """IVF ANN top-k: probe the ``n_probes`` trained centroids nearest
    the query, exact cosine rerank inside the probed lists only (≈
    n_probes/n_lists of the table scanned; recall loss is the
    deterministic ANN trade, bounded by the probe count). The query
    vector is point-read from the base table — NOT fetched through the
    assignment job (which would run the full-table GEMM twice)."""
    e = emb.select("vec_id", _as_double("embedding").alias("emb"))
    cents = train_ivf_centroids(_sample_matrix(e), n_lists)
    qrow = e.where(F.col("vec_id") == query_vec_id).first()
    probes = _probe_lists(cents, qrow["emb"], n_probes)
    qlit = F.array(*[F.lit(float(x)) for x in qrow["emb"]])
    assigned = _assign_lists(e, cents)
    return _topk_shape(
        assigned.where(F.col("list_id").isin(probes)).select(
            "vec_id", cosine(F.col("emb"), qlit).alias("cos_raw")
        ),
        query_vec_id, k,
    )


# --------------------------------------------------------------------------
# materialized ANN store: build once, probe partition-pruned
# --------------------------------------------------------------------------

def ann_store_root(sf_dir: str, base: str = "/root/repo/data/ann") -> str:
    return os.path.join(base, os.path.basename(os.path.normpath(sf_dir)))


def ensure_ann_store(
    spark,
    sf_dir: str,
    *,
    bits: int | None = None,
    n_lists: int | None = None,
    target_rows: int = ANN_TARGET_BUCKET_ROWS,
    root: str | None = None,
) -> str:
    """Materialize the ANN index structures for ``sf_dir``'s embeddings
    table (idempotent; atomic via tmp-dir rename):

    - ``lsh/``  — the table written ``partitionBy(bucket)``: a query
      reads exactly one partition directory;
    - ``ivf/``  — written ``partitionBy(list_id)`` from the trained
      assignment: a probe reads ``n_probes`` directories;
    - ``centroids.json`` + ``meta.json`` — trained centroids and the
      source path for query-vector point-reads.

    This is the 100 TB layout: per-query work becomes a point-read of
    the query vector plus a pruned scan of 1/2^bits (LSH) or
    n_probes/n_lists (IVF) of the data, with zero per-query index
    recompute. ``bits``/``n_lists`` default to corpus-size-derived
    values (:func:`derive_ann_params`: expected rows per bucket/list ≈
    ``target_rows``), which coincide with the pinned oracle constants
    at every oracle scale; pass them explicitly to pin a layout."""
    from ..staging import commit_staged, staged_from

    root = root or ann_store_root(sf_dir)
    src = os.path.join(sf_dir, "embeddings.parquet")
    # manifest-gated freshness: rebuilt whenever the source parquet's
    # size/mtime change OR the requested layout params differ from the
    # ones the store was built with (staging.py)
    if staged_from(
        root, src, extra={"bits": bits, "n_lists": n_lists, "target_rows": target_rows}
    ):
        return root
    tmp = root + ".tmp"
    import shutil

    import pyarrow.parquet as pq

    n = pq.ParquetFile(src).metadata.num_rows  # footer read, no job
    d_bits, d_lists = derive_ann_params(n, target_rows=target_rows)
    bits = d_bits if bits is None else bits
    n_lists = d_lists if n_lists is None else n_lists
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    e = spark.read.parquet(src).select("vec_id", _as_double("embedding").alias("emb"))
    e.withColumn("bucket", lsh_bucket(F.col("emb"), bits)).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(tmp, "lsh"))
    # training-sample floor scales with the list count (FAISS-style
    # ≥tens of points per centroid), bounded for the driver loop
    sample_n = min(max(IVF_SAMPLE, 64 * n_lists), 1 << 18)
    cents = train_ivf_centroids(_sample_matrix(e, sample_n), n_lists)
    _assign_lists(e, cents).write.mode("overwrite").partitionBy("list_id").parquet(
        os.path.join(tmp, "ivf")
    )
    with open(os.path.join(tmp, "centroids.json"), "w") as f:
        json.dump([[float(x) for x in row] for row in cents], f)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {
                "source": src,
                "bits": bits,
                "n_lists": n_lists,
                "n_vectors": int(n),
                "target_rows": target_rows,
                "derived": {"bits": d_bits, "n_lists": d_lists},
            },
            f,
        )
    shutil.rmtree(root, ignore_errors=True)
    os.rename(tmp, root)
    commit_staged(root)
    return root


def _store_meta(root: str) -> dict:
    with open(os.path.join(root, "meta.json")) as f:
        return json.load(f)


def _point_read_vec(spark, source: str, vec_id: int):
    """One pushdown point-read of the query vector from the base table
    (row-group stats prune on vec_id when the table is id-sorted)."""
    row = (
        spark.read.parquet(source)
        .where(F.col("vec_id") == vec_id)
        .select(_as_double("embedding").alias("emb"))
        .first()
    )
    return [float(x) for x in row["emb"]]


def lsh_topk_store(
    spark, root: str, query_vec_id: int, k: int = 10, *, hamming_probe: int = 0
) -> DataFrame:
    """LSH ANN over the materialized store: partition-pruned scan of
    the query's bucket directory only — or, with ``hamming_probe`` > 0,
    of the 1 + bits (+ C(bits,2)) directories within that Hamming
    distance (multi-probe; the probe list is a driver-side constant, so
    partition pruning still applies)."""
    meta = _store_meta(root)
    qv = _point_read_vec(spark, meta["source"], query_vec_id)
    qb = sum((1 << d) for d in range(meta["bits"]) if qv[d] > 0)
    probes = _hamming_buckets(qb, meta["bits"], hamming_probe)
    qlit = F.array(*[F.lit(x) for x in qv])
    bucket = spark.read.parquet(os.path.join(root, "lsh")).where(F.col("bucket").isin(probes))
    return _topk_shape(
        bucket.select("vec_id", cosine(F.col("emb"), qlit).alias("cos_raw")), query_vec_id, k
    )


def ivf_topk_store(
    spark, root: str, query_vec_id: int, k: int = 10, *, n_probes: int = IVF_PROBES
) -> DataFrame:
    """IVF ANN over the materialized store: probes chosen driver-side
    from the stored centroids (n_lists dot products), then a
    partition-pruned scan of the probed list directories."""
    meta = _store_meta(root)
    with open(os.path.join(root, "centroids.json")) as f:
        cents = json.load(f)
    qv = _point_read_vec(spark, meta["source"], query_vec_id)
    probes = _probe_lists(cents, qv, n_probes)
    qlit = F.array(*[F.lit(x) for x in qv])
    lists = spark.read.parquet(os.path.join(root, "ivf")).where(F.col("list_id").isin(probes))
    return _topk_shape(
        lists.select("vec_id", cosine(F.col("emb"), qlit).alias("cos_raw")), query_vec_id, k
    )


# --------------------------------------------------------------------------
# exact near-dup pairs: distributed blocked GEMM
# --------------------------------------------------------------------------

def _pack_block(pdf):
    """One (blk) group → a single row holding the tile: sorted ids +
    the L2-normalized float64 matrix, both as raw bytes."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(list(pdf["emb"]), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "blk": [int(pdf["blk"].iloc[0])],
            "n": [len(ids)],
            "ids": [ids.tobytes()],
            "mat": [mat.tobytes()],
        }
    )


def _make_tile_gemm(threshold: float):
    import numpy as np
    import pandas as pd

    def gemm(batches):
        for pdf in batches:
            outs_a, outs_b, outs_s = [], [], []
            for r in pdf.itertuples(index=False):
                ia = np.frombuffer(r.ids_a, dtype=np.int64)
                ib = np.frombuffer(r.ids_b, dtype=np.int64)
                a = np.frombuffer(r.mat_a, dtype=np.float64).reshape(len(ia), -1)
                b = np.frombuffer(r.mat_b, dtype=np.float64).reshape(len(ib), -1)
                sims = a @ b.T
                mask = sims >= threshold
                if r.bi == r.bj:
                    mask &= ia[:, None] < ib[None, :]
                else:
                    mask &= ia[:, None] != ib[None, :]
                qi, mj = np.nonzero(mask)
                if len(qi):
                    va, vb = ia[qi], ib[mj]
                    outs_a.append(np.minimum(va, vb))
                    outs_b.append(np.maximum(va, vb))
                    outs_s.append(sims[qi, mj])
            if outs_a:
                yield pd.DataFrame(
                    {
                        "vec_a": np.concatenate(outs_a),
                        "vec_b": np.concatenate(outs_b),
                        "cos_raw": np.concatenate(outs_s),
                    }
                )

    return gemm


def cosine_neardup_pairs(
    emb: DataFrame, *, threshold: float = 0.45, bits: int = 0, block: int = NEARDUP_BLOCK
) -> DataFrame:
    """(vec_a, vec_b, cos_sim) pairs with cosine ≥ threshold — exact.

    Default path: fully distributed BLOCKED GEMM. Vectors are hashed
    into ⌈n/block⌉ tiles, each tile packed into one numpy matrix row;
    every tile pair (bi ≤ bj) is joined and GEMMed inside an Arrow
    ``mapInPandas`` task. Nothing is collected to the driver; shuffle
    volume is O(n_blocks · corpus) — the inherent movement of exact
    all-pairs — and each task's work is one ``block × block`` matrix
    product. ``bits > 0`` instead restricts candidates to same-sign-
    LSH-bucket pairs (the recall-trading mode for when exact all-pairs
    is off the table entirely).
    """
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

    n = e.count()
    n_blocks = max(1, math.ceil(n / block))
    spark = e.sparkSession
    packed = (
        e.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
        .groupBy("blk")
        .applyInPandas(_pack_block, "blk INT, n INT, ids BINARY, mat BINARY")
    )
    # tile-pair enumeration stays on the cluster: a range cross-join is
    # O(1) driver memory vs a driver-built O(n_blocks²) Python list
    pairs = (
        spark.range(n_blocks)
        .select(F.col("id").cast("int").alias("bi"))
        .join(
            spark.range(n_blocks).select(F.col("id").cast("int").alias("bj")),
            F.col("bi") <= F.col("bj"),
        )
    )
    a = packed.select(
        F.col("blk").alias("bi"), F.col("ids").alias("ids_a"), F.col("mat").alias("mat_a")
    )
    b = packed.select(
        F.col("blk").alias("bj"), F.col("ids").alias("ids_b"), F.col("mat").alias("mat_b")
    )
    tiles = pairs.join(a, "bi").join(b, "bj")
    return (
        tiles.mapInPandas(_make_tile_gemm(threshold), "vec_a LONG, vec_b LONG, cos_raw DOUBLE")
        .select("vec_a", "vec_b", F.round("cos_raw", S.SCORE_DECIMALS).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )
