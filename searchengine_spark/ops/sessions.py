"""Gap-based sessionization over event streams — the standard
behavioral-analytics reshaping step (events → sessions) that any
large-scale pipeline needs before per-session features, funnel
analysis, or session-level sampling.

Semantics: per ``user_id``, events ordered by ``(ts, event_id)``; a new
session starts at the first event and whenever the gap to the previous
event exceeds ``gap_minutes``. Timestamps are compared in unix
microseconds (integer arithmetic — engine-portable, no float time
math), and monetary sums are emitted as integer cents
(``floor(value*100)``) so the result hashes identically across engines
and aggregation orders.

Scale: ONE shuffle, partitioned by ``user_id``. The two window
functions (lag for the gap, running sum for the session number) share
the same partitioning + ordering, so Catalyst plans a single sort and
a single Window operator chain; the final per-session aggregate reuses
the hash partitioning with map-side partial aggregation. No global
sort, no driver state — a skewed power-user key is bounded by that
user's own event count, and AQE's skew-join handling covers the
pathological case at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# default inactivity gap; bench.py pre-stages the matching artifact dir
SESSION_GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """(user_id, session_id, n_events, session_start_us, session_end_us,
    value_cents) — sessions split at > ``gap_minutes`` of inactivity."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    e = events.select(
        "user_id",
        "event_id",
        # parquet ts is TIMESTAMP_NTZ in Spark 4; session TZ is UTC so the
        # LTZ cast preserves the stored micros (== DuckDB epoch_us)
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    flagged = e.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > F.lit(gap_us)), 1).otherwise(0),
    )
    numbered = flagged.withColumn("session_id", F.sum("is_new").over(w))
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("user_id", "session_id")
    )
