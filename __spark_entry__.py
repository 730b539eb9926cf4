"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`searchengine_spark.entry_queries`;
this file stays a thin, stable shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from searchengine_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-k 'spark query plan' over the sf0.001
    transcripts corpus, hydrated with document payload (SURVEY §3.1)."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.bm25 import search_direct

    t = entry_queries.load_transcripts(spark, "/root/testdata/sf0.001")
    topk = search_direct(t, ["spark", "query", "plan"])
    payload = t.select(
        entry_queries.doc_id_col().alias("doc_id"), "conv_id", "turn_idx", "role", "text"
    )
    # broadcast the tiny top-k side, not the corpus (scale-correct direction)
    return payload.join(F.broadcast(topk), "doc_id").orderBy(F.desc("score"), F.asc("doc_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
