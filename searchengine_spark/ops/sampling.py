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

Scale note: ``pack_sequences`` needs a global running token sum. The
implementation here uses a window over doc_id (fine to ~10^8 rows);
at 10^12 the same numbering uses the build's two-phase scheme
(``index/build.py``: per-partition counts from parquet footers →
broadcast offsets), which is O(partitions) driver work.
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


def pack_sequences(docs: DataFrame, window: int = 512) -> DataFrame:
    """Concat-and-chunk packing plan: per doc, its token count, global
    token offset (docs concatenated in doc_id order), and the chunk
    span [first_chunk, last_chunk] it occupies in fixed ``window``-
    token sequences. A writer task can then emit chunk files from this
    plan without any further coordination."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(S.TOKEN_PATTERN_JAVA), F.lit(0))
    d = docs.select("doc_id", F.size(toks).alias("n_tokens"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        d.withColumn("tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("first_chunk", F.floor(F.col("tok_offset") / window))
        .withColumn(
            "last_chunk",
            F.floor((F.col("tok_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / window),
        )
        .orderBy("doc_id")
    )
