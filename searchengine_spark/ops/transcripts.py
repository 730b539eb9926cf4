"""Conversation-level analytics over the transcripts table — the
rollups an agent-transcript pipeline runs before conversation-level
filtering, sampling, or packing (the north-star input is multi-turn
conversation/agent transcripts, so per-conversation shape statistics
are a first-class operator, not a reporting afterthought).

Scale: one groupBy(conv_id) — a single shuffle with map-side partial
aggregation; token counts come from the same JVM-codegen
``regexp_extract_all`` used by the index build (no Python on the hot
path). ``count_distinct(role)`` has cardinality ≤ 4 per the schema, so
the partial aggregate stays tiny. Output is one row per conversation:
at 10^12 turns / ~10^10 conversations this is a plain shuffled
aggregate — no windows, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def conv_stats(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_roles, n_tool_turns, n_tokens,
    first_ts_us, last_ts_us) — per-conversation shape rollup."""
    toks = tokens_col(F.col("text"))
    t = transcripts.select(
        "conv_id",
        "role",
        "tool",
        F.size(toks).alias("n_toks"),
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
    )
    return (
        t.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            # size(collect_set) not count_distinct: role cardinality is ≤4
            # (schema), so the set stays tiny in the map-side partial agg
            # and the plan avoids the distinct-aggregate expand (one data
            # Exchange instead of two)
            F.size(F.collect_set("role")).cast("long").alias("n_roles"),
            F.sum(F.when(F.col("tool") != "", 1).otherwise(0)).alias("n_tool_turns"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("ts_us").alias("first_ts_us"),
            F.max("ts_us").alias("last_ts_us"),
        )
        .orderBy("conv_id")
    )
