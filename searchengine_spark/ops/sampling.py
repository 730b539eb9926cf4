"""Reproducible corpus sampling + sequence packing — the last-mile ops
of a training-data pipeline (after dedup/quality filtering, before the
tokenizer sees the data).

- :func:`hash_sample` — deterministic per-stratum sampling by content-
  independent hash bucket. The industry-reproducible alternative to
  rng sampling: ``bucket = md5(seed || doc_id) mod 100`` and a doc is
  kept iff ``bucket < rate(lang)``. Fully engine-portable (the Spark
  ``conv(substr(md5(..),1,12),16,10)`` bucket equals DuckDB's
  ``('0x'||substr(md5(..),1,12))::UBIGINT``), so sampling decisions
  are stable across reruns, engines, and cluster sizes — which is the
  whole point for dataset versioning.
- :func:`pack_sequences` — concat-and-chunk packing: documents are
  concatenated in stable doc_id order and split into fixed
  ``window``-token chunks (the standard LLM pretraining layout). Emits
  each doc's global token offset and the chunk span it lands in.

Scale note: ``pack_sequences`` needs a global running token sum.
The implementation is the two-phase distributed scan: range-partition
by doc_id, per-partition running sums (a window PARTITIONED by
spark_partition_id — never a single global sort), then per-partition
totals (≤ n_partitions rows) prefix-summed on the driver and
broadcast-joined back as partition base offsets. Driver transfer is
O(partitions) — the same discipline as the build's footer-offset
scheme (``index/build.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import semantics as S

DEFAULT_RATES = {"en": 80, "zh": 50, "es": 50, "de": 50, "fr": 50}


def hash_bucket(col: Column, seed: str = "s42", mod: int = 100) -> Column:
    """Deterministic [0, mod) bucket from md5 — cross-engine stable."""
    h = F.md5(F.concat(F.lit(seed), col.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(mod))


def hash_sample(
    docs: DataFrame,
    rates: dict[str, int] | None = None,
    *,
    default_rate: int = 25,
    seed: str = "s42",
) -> DataFrame:
    """Per-language deterministic sampling: keep a doc iff its hash
    bucket < the language's percentage rate. Adding data or changing
    partitioning never flips a kept/dropped decision."""
    rates = DEFAULT_RATES if rates is None else rates
    rate = F.lit(default_rate)
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.withColumn("bucket", hash_bucket(F.col("doc_id"), seed))
        .where(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    )


def mix_sample(docs: DataFrame, *, mod: int = 10_000, seed: str = "mix42") -> DataFrame:
    """Target-composition (mixture-balancing) sampling: downsample every
    ``source`` stratum to the size of the SMALLEST source, so the kept
    set has an (expected-)uniform source mix — the curriculum-mixing
    step of a pretraining pipeline, here with equal target weights.

    Decisions are deterministic and engine-portable: per-source keep
    thresholds are pure INTEGER arithmetic (``mod * min_cnt DIV cnt`` —
    no float rate that two engines could round differently), and the
    per-doc bucket is the same md5 scheme as :func:`hash_sample`.
    Adding a source or re-partitioning never flips a kept/dropped
    decision for existing (source, doc_id) pairs.

    Scale: one count-by-source aggregate (|sources| rows, map-side
    combined), a broadcast join of the tiny threshold table, and a
    scan-local filter — no shuffle of the documents themselves.
    """
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    mn = counts.agg(F.min("cnt").alias("min_cnt"))
    thresholds = counts.crossJoin(F.broadcast(mn)).select(
        "source", F.expr(f"CAST({mod} * min_cnt AS BIGINT) DIV cnt").alias("thr")
    )
    return (
        docs.withColumn("bucket", hash_bucket(F.col("doc_id"), seed, mod))
        .join(F.broadcast(thresholds), "source")
        .where(F.col("bucket") < F.col("thr"))
        .select("doc_id", "source", "bucket")
        .orderBy("doc_id")
    )


def pack_sequences(
    docs: DataFrame, window: int = 512, *, n_partitions: int | None = None
) -> DataFrame:
    """Concat-and-chunk packing plan: per doc, its token count, global
    token offset (docs concatenated in doc_id order), and the chunk
    span [first_chunk, last_chunk] it occupies in fixed ``window``-
    token sequences. A writer task can then emit chunk files from this
    plan without any further coordination.

    Distributed two-phase scan (no global window): range-partition by
    doc_id → per-partition running sum (window partitioned by
    ``spark_partition_id`` — each group is one range partition, so the
    sort is partition-local) → per-partition totals prefix-summed on
    the driver (≤ n_partitions rows) → broadcast base offsets. The
    locally-cumsum'd frame is persisted so the totals job and the
    final join see one consistent partition assignment."""
    spark = docs.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(S.TOKEN_PATTERN_JAVA), F.lit(0))
    d = docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    part = d.repartitionByRange(n_partitions, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = part.withColumn("cum", F.sum("n_tokens").over(w_local)).persist()
    try:
        totals = {
            r["pid"]: r["tot"]
            for r in local.groupBy("pid").agg(F.max("cum").alias("tot")).collect()
        }
        base, rows = 0, []
        for pid in sorted(totals):
            rows.append((pid, base))
            base += totals[pid]
        offsets = spark.createDataFrame(rows or [(0, 0)], "pid INT, base LONG")
        out = (
            local.join(F.broadcast(offsets), "pid")
            .withColumn("tok_offset", F.col("base") + F.col("cum") - F.col("n_tokens"))
            .withColumn("first_chunk", F.floor(F.col("tok_offset") / window))
            .withColumn(
                "last_chunk",
                F.floor(
                    (F.col("tok_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                    / window
                ),
            )
            .select("doc_id", "n_tokens", "tok_offset", "first_chunk", "last_chunk")
            .orderBy("doc_id")
        )
        # materialize before unpersist so callers get a final frame whose
        # lineage no longer references the persisted intermediate
        return out.localCheckpoint(eager=True)
    finally:
        local.unpersist()
