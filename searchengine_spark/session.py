"""SparkSession factory with scale-oriented defaults.

Local testing runs single-JVM (`local[N]`), but every config here is
chosen for the 1000-executor / 100 TB target: AQE on (runtime skew-join
splitting + partition coalescing), Arrow for all pandas-UDF exchange,
shuffle partitions sized by CLI/env rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _prune_old_event_logs(evdir: str, keep: int = 10) -> None:
    """Drop all but the newest ``keep`` application logs — sessions are
    frequent here (tests, bench subprocesses) and each writes its own
    rolling-log dir."""
    import shutil

    try:
        entries = sorted(
            (os.path.join(evdir, n) for n in os.listdir(evdir)),
            key=lambda p: os.path.getmtime(p),
        )
    except OSError:
        return
    for p in entries[:-keep] if len(entries) > keep else []:
        try:
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:  # single-file (non-rolling) logs — rmtree won't remove these
                os.remove(p)
        except OSError:
            pass


def get_spark(
    app_name: str = "searchengine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.filterPushdown", "true")
        # FAIR job scheduling: the build overlaps its docmap stage with
        # tf/postings from a second driver thread; FAIR lets the small
        # job's tasks interleave instead of queueing behind the big one
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # event log ON by default: the build parses it into the snapshot
    # ledger for literal per-TASK lineage/metrics (north_star). A real
    # cluster job runs with this on anyway (history server).
    if os.environ.get("SENG_EVENTLOG", "1") != "0":
        evdir = os.environ.get("SENG_EVENTLOG_DIR", "/root/repo/data/eventlog")
        os.makedirs(evdir, exist_ok=True)
        _prune_old_event_logs(evdir, keep=10)
        b = (
            b.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", evdir)
            # plain JSON (no zstd) so the build's lineage parser can read
            # the log back without native codecs
            .config("spark.eventLog.compress", "false")
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
