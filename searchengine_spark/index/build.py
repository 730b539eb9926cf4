"""Distributed inverted-index build (the flagship job of BASELINE.json
north_rule; reference analogue: full rebuild, ``internal/index/index.go:283-382``).

Pipeline (all stages declarative DataFrame ops; the only Python on the
hot path is the Arrow ``applyInPandas`` segment encoder):

1. **docmap** — tokenize (JVM regexp) + assign a dense, deterministic
   ``doc_int`` aligned with the stable ``(conv_id, turn_idx)`` order:
   range-repartition by ``doc_id``, sort within partitions, stamp
   ``(_pid, _rank)`` with an order-preserving ``mapInPandas`` counter,
   commit, then ``doc_int = offset[_pid] + _rank`` with offsets from
   exact per-partition counts over the *committed* data (the scalable
   zipWithIndex pattern — no global window, and immune to
   ``repartitionByRange``'s sampled-boundary nondeterminism because the
   ranged output is materialized exactly once).
2. **stats** — N, Σdl, avgdl (one small agg → stats.json).
3. **tf** — explode tokens → ``groupBy(doc_int, dl, term).count()``;
   materialized to staging parquet bucketed by ``pmod(xxhash64(term), B)``
   (this is the checkpointed intermediate that makes the build resumable).
4. **terms** — per-term df/cf aggregate (partial+final hash agg).
5. **postings, per bucket** — ``groupBy(term, seg)`` where
   ``seg = doc_int >> 16`` (codec.SEG_SPAN): heavy-hitter terms split
   into many doc-aligned segment rows, which bounds per-reducer skew the
   same way key-salting does but keeps docID order — phase 2 of the
   north rule's two-phase merge is then a *metadata* concat (segments
   are disjoint, ordered runs) instead of a re-sort. Each group is
   delta-gap+varint encoded by a vectorized pandas encoder with
   block-max skip metadata.

Each stage commits a ledger entry (status, rows, seconds, throughput,
skew ratio); re-running `build_index` with the same staging snapshot
skips completed stages — kill/rerun resumes, never duplicates work.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import semantics as S
from ..query.bm25 import tokenized
from .catalog import IndexCatalog, Snapshot
from .codec import BLOCK, SEG_SPAN, block_metadata, encode_postings

DEFAULT_BUCKETS = 16

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("seg", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("postings", T.BinaryType()),
        T.StructField("block_last_doc", T.ArrayType(T.LongType())),
        T.StructField("block_max_tfnorm", T.ArrayType(T.DoubleType())),
        T.StructField("seg_max_tfnorm", T.DoubleType()),
    ]
)


# --------------------------------------------------------------------------
# ledger (per-stage checkpoint + lineage + metrics)
# --------------------------------------------------------------------------

class Ledger:
    """Append-only JSONL of stage commits inside the staging dir."""

    def __init__(self, stage_dir: str):
        self.path = os.path.join(stage_dir, "ledger.jsonl")

    def entries(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        out[e["stage"]] = e
        return out

    def done(self, stage: str) -> bool:
        e = self.entries().get(stage)
        return bool(e and e.get("status") == "done")

    def commit(self, stage: str, **metrics) -> None:
        e = {"stage": stage, "status": "done", "ts": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(e) + "\n")


# --------------------------------------------------------------------------
# stage 1: deterministic dense doc numbering (scalable zipWithIndex)
# --------------------------------------------------------------------------

def _ranked_within_partitions(tok: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Range-partition by doc_id, sort within partitions, and stamp each
    row with ``(_pid, _rank)`` — its partition and 0-based rank inside it.

    The rank counter runs inside ``mapInPandas`` (order-preserving, no
    extra shuffle, no window exchange). ``repartitionByRange`` samples
    its boundaries, so this DataFrame is only *computed once and
    written*; the dense global ``doc_int`` is derived afterwards from
    the **committed** parquet (exact per-partition counts → offsets),
    never from a second, possibly re-planned job.
    """
    p = num_partitions or int(tok.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    part = (
        tok.repartitionByRange(p, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    schema = T.StructType(list(part.schema.fields) + [T.StructField("_rank", T.LongType())])

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_rank"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    return part.mapInPandas(add_rank, schema)


def partition_offsets(raw: DataFrame) -> dict[int, int]:
    """Exact cumulative offsets from the committed (_pid, _rank) data."""
    counts = {
        int(r["_pid"]): int(r["cnt"])
        for r in raw.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return offsets


def with_doc_int(raw: DataFrame, offsets: dict[int, int]) -> DataFrame:
    """doc_int = offset[_pid] + _rank — dense 0-based rank of doc_id in
    global string order (== the stable (conv_id, turn_idx) order)."""
    off_df = F.broadcast(
        raw.sparkSession.createDataFrame(
            [(int(k), int(v)) for k, v in offsets.items()], "_pid INT, _off LONG"
        )
    )
    return (
        raw.join(off_df, "_pid")
        .withColumn("doc_int", F.col("_off") + F.col("_rank"))
        .drop("_pid", "_rank", "_off")
    )


# --------------------------------------------------------------------------
# stage 5: segment encoder (Arrow-grouped, numpy-vectorized)
# --------------------------------------------------------------------------

def _make_segment_encoder(avgdl: float):
    k1, b = S.K1, S.B

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        order = np.argsort(pdf["doc_int"].to_numpy(), kind="stable")
        docs = pdf["doc_int"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order]
        dls = pdf["dl"].to_numpy()[order]
        tfn = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        blast, bmax = block_metadata(docs, tfn, BLOCK)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "term": [pdf["term"].iloc[0]],
                "seg": [int(pdf["seg"].iloc[0])],
                "n": [len(docs)],
                "first_doc": [int(docs[0])],
                "last_doc": [int(docs[-1])],
                "postings": [encode_postings(docs, tfs, dls)],
                "block_last_doc": [blast.tolist()],
                "block_max_tfnorm": [bmax.tolist()],
                "seg_max_tfnorm": [float(tfn.max())],
            }
        )

    return encode_group


def bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


# --------------------------------------------------------------------------
# the build job
# --------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    catalog: IndexCatalog,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    bucket_jobs: int = 1,
    snap_id: int | None = None,
) -> Snapshot:
    """Build a new index snapshot; resumable via the staging ledger.

    ``bucket_jobs`` > 1 splits the postings stage into that many
    independently-committed jobs (coarser-grained resume, e.g. 4 →
    every quarter of the term space checkpoints separately); 1 = single
    job writing all bucket partitions (fastest wall-clock).
    """
    t_start = time.perf_counter()
    snap_id = snap_id if snap_id is not None else catalog.next_id()
    stage_dir = catalog.staging_dir(snap_id)
    ledger = Ledger(stage_dir)

    raw_dir = os.path.join(stage_dir, "docmap_raw")
    docmap_dir = os.path.join(stage_dir, "docmap")
    tf_dir = os.path.join(stage_dir, "tf_stage")
    terms_dir = os.path.join(stage_dir, "terms")
    postings_dir = os.path.join(stage_dir, "postings")
    offsets_path = os.path.join(stage_dir, "offsets.json")

    # ---- stage: docmap_raw (tokenize + partition-rank, computed ONCE) ------
    if not ledger.done("docmap_raw"):
        t0 = time.perf_counter()
        ranked = _ranked_within_partitions(tokenized(transcripts))
        ranked.select(
            "_pid", "_rank", "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl", "tokens"
        ).write.mode("overwrite").parquet(raw_dir)
        dt = time.perf_counter() - t0
        ledger.commit("docmap_raw", seconds=round(dt, 3))

    raw = spark.read.parquet(raw_dir)

    # ---- stage: offsets + stats (exact, from the committed data) -----------
    if not ledger.done("stats"):
        t0 = time.perf_counter()
        offsets = partition_offsets(raw)
        row = raw.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")).collect()[0]
        stats = {
            "n_docs": int(row["n"]),
            "sum_dl": int(row["sdl"]),
            "avgdl": float(row["sdl"]) / float(row["n"]),
        }
        with open(offsets_path, "w") as f:
            json.dump({str(k): v for k, v in offsets.items()}, f)
        with open(os.path.join(stage_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
        ledger.commit("stats", seconds=round(time.perf_counter() - t0, 3), **stats)
    with open(os.path.join(stage_dir, "stats.json")) as f:
        stats = json.load(f)
    with open(offsets_path) as f:
        offsets = {int(k): int(v) for k, v in json.load(f).items()}

    numbered = with_doc_int(raw, offsets)

    # ---- stage: docmap (final, token-free doc metadata table) --------------
    if not ledger.done("docmap"):
        t0 = time.perf_counter()
        numbered.select(
            "doc_int", "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl"
        ).write.mode("overwrite").parquet(docmap_dir)
        dt = time.perf_counter() - t0
        ledger.commit("docmap", rows=stats["n_docs"], seconds=round(dt, 3),
                      turns_per_sec=round(stats["n_docs"] / dt, 1))

    # ---- stage: tf (the resumability checkpoint) ---------------------------
    if not ledger.done("tf"):
        t0 = time.perf_counter()
        tf = (
            numbered.select("doc_int", "dl", F.explode("tokens").alias("term"))
            .groupBy("doc_int", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("bucket", bucket_col(F.col("term"), n_buckets))
            .withColumn("seg", (F.col("doc_int") / F.lit(SEG_SPAN)).cast("long"))
        )
        tf.write.mode("overwrite").partitionBy("bucket").parquet(tf_dir)
        n_rows = spark.read.parquet(tf_dir).count()
        dt = time.perf_counter() - t0
        ledger.commit("tf", rows=n_rows, seconds=round(dt, 3),
                      postings_per_sec=round(n_rows / dt, 1))
    tf_staged = spark.read.parquet(tf_dir)

    # ---- stage: term stats -------------------------------------------------
    if not ledger.done("terms"):
        t0 = time.perf_counter()
        terms = tf_staged.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        terms.write.mode("overwrite").parquet(terms_dir)
        n_terms = spark.read.parquet(terms_dir).count()
        # skew diagnostics for the north rule's heavy-hitter handling
        top = (
            spark.read.parquet(terms_dir)
            .orderBy(F.desc("df")).limit(1).collect()
        )
        max_df = int(top[0]["df"]) if top else 0
        mean_df = stats["sum_dl"] / max(n_terms, 1)
        ledger.commit("terms", rows=n_terms, seconds=round(time.perf_counter() - t0, 3),
                      max_df=max_df, skew_ratio=round(max_df / max(mean_df, 1e-9), 2))

    # ---- stage: postings (per bucket group, doc-aligned segments) ----------
    encoder = _make_segment_encoder(stats["avgdl"])
    groups = [
        list(range(g, n_buckets, bucket_jobs)) for g in range(bucket_jobs)
    ]
    for gi, buckets in enumerate(groups):
        stage_name = f"postings-{gi}"
        if ledger.done(stage_name):
            continue
        t0 = time.perf_counter()
        part = tf_staged if bucket_jobs == 1 else tf_staged.where(F.col("bucket").isin(buckets))
        segs = part.groupBy("bucket", "term", "seg").applyInPandas(encoder, SEGMENT_SCHEMA)
        mode = "overwrite" if bucket_jobs == 1 else "append"
        segs.write.mode(mode).partitionBy("bucket").parquet(postings_dir)
        dt = time.perf_counter() - t0
        written = spark.read.parquet(postings_dir).where(F.col("bucket").isin(buckets))
        seg_rows, post_n = written.agg(F.count(F.lit(1)), F.sum("n")).collect()[0]
        ledger.commit(stage_name, segments=int(seg_rows), postings=int(post_n or 0),
                      seconds=round(dt, 3),
                      postings_per_sec=round((post_n or 0) / dt, 1))

    # ---- publish -----------------------------------------------------------
    elapsed = time.perf_counter() - t_start
    manifest = {
        "stats": stats,
        "n_buckets": n_buckets,
        "seg_span": SEG_SPAN,
        "block": BLOCK,
        "k1": S.K1,
        "b": S.B,
        "build_seconds": round(elapsed, 3),
        "turns_per_sec": round(stats["n_docs"] / elapsed, 1),
        "ledger": Ledger(stage_dir).entries(),
    }
    # drop staging intermediates (tokens + tf — the large artifacts) from
    # the published snapshot; keep ledger + final tables
    import shutil

    shutil.rmtree(tf_dir, ignore_errors=True)
    shutil.rmtree(raw_dir, ignore_errors=True)
    return catalog.publish(snap_id, manifest)
