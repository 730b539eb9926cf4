"""Stateful conversation assembly over a transcript TURN stream —
the custom stateful operator surface (``applyInPandasWithState``) the
built-in aggregates can't express.

A conversation's turns arrive interleaved with other conversations'
turns across micro-batches. The operator buffers each conversation's
turns in keyed state and emits ONE summary row when the conversation
*closes* (no new turn before the event-time watermark passes
``last_turn_ts + gap``): turn count plus the ORDER-SENSITIVE role
sequence (one initial per turn, in ``turn_idx`` order) — an ordered
concatenation, not a commutative aggregate, which is exactly what
needs explicit keyed state + event-time timeout rather than a
groupBy().agg().

Exactly-once shape: state lives in the checkpointed state store; a
conversation is emitted exactly once, on timeout; a crash replays the
micro-batch against the same state version. On a bounded replay the
watermark cannot pass the final conversations' close, so the staged
stream carries one far-future sentinel turn (conv_id="\\x00sentinel",
filtered from output) — same punctuation-row technique as
:func:`..streaming.events.stage_sessionize_dir`.

Scale: state is partitioned by conv_id across executors (state-store
shuffle); per-conversation state is bounded by that conversation's own
turn count; Arrow-batched pandas transfer, no per-row Python.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SENTINEL_CONV = "\x00sentinel"

# default conversation-close gap; bench.py pre-stages the matching dir
ASSEMBLY_GAP_MINUTES = 60

TURN_SCHEMA = (
    "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, "
    "ts TIMESTAMP_NTZ"
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("role_seq", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType())),
        StructField("initials", ArrayType(StringType())),
        StructField("last_ts_us", LongType()),
    ]
)


def _assemble_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            idxs, initials, _ = state.get
            order = sorted(range(len(idxs)), key=lambda i: idxs[i])
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [len(idxs)],
                    "role_seq": ["".join(initials[i] for i in order)],
                }
            )
            return
        idxs: list[Any] = []
        initials: list[str] = []
        last_us = 0
        if state.exists:
            prev_idxs, prev_initials, prev_last = state.get
            idxs, initials, last_us = list(prev_idxs), list(prev_initials), prev_last
        for pdf in pdfs:
            idxs.extend(pdf["turn_idx"].to_numpy().tolist())
            # NULL role → "" so the joined signature omits it, matching
            # the batch twin (array_join skips nulls) and the DuckDB
            # string_agg oracle; a bare astype(str) would emit "N"one
            initials.extend(
                pdf["role"].fillna("").astype("str").str.slice(0, 1).tolist()
            )
            # ts arrives tz-aware datetime64[ns]; int64 view is NANOS
            batch_max = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = max(last_us, batch_max)
        state.update((idxs, initials, last_us))
        # close the conversation when the watermark passes last turn + gap;
        # nothing is emitted on update (yield nothing — cheaper than an
        # empty frame per group per batch). close_ms ≥ watermark is an
        # invariant here, not luck: the stateful operator late-filters
        # input rows older than the watermark before they reach this fn,
        # so every row seen has ts ≥ wm and close = max_ts + gap ≥ wm.
        # (Do NOT clamp to wm+1 "to be safe" — on a bounded replay the
        # watermark may never advance again and a wm+1 timeout would
        # strand the conversation in state forever.)
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return fn


def stage_turn_stream_dir(
    transcripts_path: str, gap_minutes: int, root: str = "/root/repo/data/stream_turns"
) -> str:
    """Transcripts parquet + one sentinel turn staged as a file-stream
    dir (idempotent); the sentinel advances the final watermark past
    every real conversation's close."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    name = os.path.splitext(os.path.basename(transcripts_path))[0]
    parent = os.path.basename(os.path.dirname(transcripts_path))
    d = os.path.join(root, f"{parent}-{name}-gap{gap_minutes}")
    marker = os.path.join(d, "part-00000.parquet")
    sentinel = os.path.join(d, "part-00001.parquet")
    if not os.path.exists(sentinel):
        os.makedirs(d, exist_ok=True)
        if not os.path.exists(marker):
            shutil.copyfile(transcripts_path, marker + ".tmp")
            os.rename(marker + ".tmp", marker)
        tab = pq.read_table(transcripts_path, columns=["ts"])
        max_us = pc.max(tab.column("ts")).cast(pa.int64()).as_py()
        flush_us = max_us + (gap_minutes + 60) * 60 * 1_000_000
        row = pa.table(
            {
                "conv_id": pa.array([SENTINEL_CONV], pa.string()),
                "turn_idx": pa.array([0], pa.int32()),
                "role": pa.array(["system"], pa.string()),
                "text": pa.array([""], pa.string()),
                "tool": pa.array([""], pa.string()),
                "ts": pa.array([flush_us], pa.timestamp("us")),
            }
        )
        pq.write_table(row, sentinel + ".tmp")
        os.rename(sentinel + ".tmp", sentinel)
        # the file source orders micro-batches by mtime; back-to-back
        # writes can tie at ms granularity and let the sentinel batch
        # run before the data under maxFilesPerTrigger, late-dropping
        # every real turn. Pin the sentinel strictly after the marker.
        m = os.stat(marker)
        os.utime(sentinel, (m.st_atime + 2, m.st_mtime + 2))
    return d


def assemble_conversations_stream(
    spark: SparkSession, transcripts_path: str, gap_minutes: int = ASSEMBLY_GAP_MINUTES
) -> DataFrame:
    """Run the stateful assembly over the staged turn stream and return
    the emitted conversation summaries (sentinel filtered), ordered."""
    d = stage_turn_stream_dir(transcripts_path, gap_minutes)
    return run_assembly(spark, d, gap_minutes=gap_minutes)


def run_assembly(
    spark: SparkSession,
    stream_dir: str,
    *,
    gap_minutes: int = 60,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The assembly query over an already-staged turn-stream dir.
    ``max_files_per_trigger`` splits the bounded replay into multiple
    micro-batches (tests use it to exercise cross-batch state merge)."""
    gap_us = gap_minutes * 60 * 1_000_000
    name = "conv_assemble_" + uuid.uuid4().hex[:8]
    reader = spark.readStream.schema(TURN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(stream_dir)
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", "0 seconds")
        # prune BEFORE the stateful operator: Catalyst can't push column
        # pruning through a Python state fn, and `text` (the dominant
        # bytes per turn) would otherwise ride the state-store shuffle +
        # Arrow transfer only to be dropped inside _assemble_fn
        .select("conv_id", "turn_idx", "role", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _assemble_fn(gap_us),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .where(F.col("conv_id") != SENTINEL_CONV)
        .orderBy("conv_id")
    )
