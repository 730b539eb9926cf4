#!/usr/bin/env python3
"""Run one index build at a given parallelism; print ONE JSON line.

Usage: python scripts/build_once.py <cpus> <sf> [index_root]

Spawned as a subprocess per parallelism level by bench.py's scaling
section (each level gets its own JVM — the local[N] stand-in for an
N-executor cluster per the driver's two-cluster-size protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2])
    # staging + shuffle live on tmpfs: on a real cluster both scale with
    # the node count (local NVMe shuffle dirs, distributed-FS staging);
    # a single box's one spinning/virtual disk is a serial resource that
    # would otherwise cap every parallelism level at the same bandwidth
    root = sys.argv[3] if len(sys.argv) > 3 else f"/dev/shm/seng_scaling/sf{sf:g}_c{cpus}"
    local_dir = "/dev/shm/seng-spark-local"
    os.makedirs(local_dir, exist_ok=True)
    # the event log (per-task lineage) also goes to tmpfs: on a cluster it
    # writes to a shared FS off the data path; the sandbox's single
    # virtual disk is the serial resource that must stay out of the
    # measured builds (BENCH.md §2.3)
    os.environ.setdefault("SENG_EVENTLOG_DIR", "/dev/shm/seng-eventlog")

    from searchengine_spark.corpus import ensure_transcripts
    from searchengine_spark.index.build import build_index
    from searchengine_spark.index.catalog import IndexCatalog
    from searchengine_spark.session import get_spark

    path = ensure_transcripts(sf)
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark(
        f"seng-build-c{cpus}",
        master=f"local[{cpus}]",
        # ~4 waves per stage: smooths stragglers from skewed buckets
        shuffle_partitions=max(4 * cpus, 8),
        extra_conf={"spark.local.dir": local_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(path)
    # steady-state measurement: warm JVM codegen/reader paths once (the
    # fixed one-time JIT cost would otherwise land on both cluster sizes)
    t.limit(10_000).write.format("noop").mode("overwrite").save()
    snap = build_index(spark, t, IndexCatalog(root))
    # manifest build_seconds covers every build stage but excludes the
    # post-hoc event-log→manifest lineage parse (history-server work)
    dt = float(snap.manifest["build_seconds"])
    n = snap.stats["n_docs"]
    print(json.dumps({
        "cpus": cpus,
        "sf": sf,
        "n_docs": n,
        "build_seconds": round(dt, 3),
        "turns_per_sec": round(n / dt, 1),
        "stages": {k: v.get("seconds") for k, v in snap.manifest["ledger"].items()},
    }))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
