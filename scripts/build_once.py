#!/usr/bin/env python3
"""Run timed index builds at a given parallelism; print ONE JSON line.

Usage: python scripts/build_once.py <cpus> <sf> [reps] [index_root]

Spawned as a subprocess per parallelism level by bench.py's scaling
section (each level gets its own JVM — the local[N] stand-in for an
N-executor cluster per the driver's two-cluster-size protocol).

``reps`` (default 1) measured builds run back-to-back INSIDE one JVM
after a small warm-up build, so JVM start, codegen JIT, and first-touch
page faults land outside every measured sample — on a real cluster the
executors are long-lived and warm, and the one-time JIT cost would
otherwise bias the shorter (high-parallelism) side. All samples are
reported; the caller picks best-of (shared-VM protocol, BENCH.md §3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_SF = 0.25  # 500k turns — enough to exercise every build stage/codegen path


def main() -> None:
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    # staging + shuffle live on tmpfs: on a real cluster both scale with
    # the node count (local NVMe shuffle dirs, distributed-FS staging);
    # a single box's one spinning/virtual disk is a serial resource that
    # would otherwise cap every parallelism level at the same bandwidth
    root = sys.argv[4] if len(sys.argv) > 4 else f"/dev/shm/seng_scaling/sf{sf:g}_c{cpus}"
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
    warm_path = ensure_transcripts(WARMUP_SF) if WARMUP_SF < sf else None
    shutil.rmtree(root, ignore_errors=True)
    # the two-cluster-size comparison holds the JOB fixed and varies only
    # the core budget: shuffle partitions are sized to the DATA (sf2 →
    # 16 ≈ 4 waves on the wide side), not to the level's cpus — a
    # core-derived count would hand each level a different physical plan
    # (different task counts → different per-task overhead) and measure
    # that difference instead of scalability
    parts = int(os.environ.get("SENG_SCALING_PARTS", "0")) or max(16, round(8 * sf))
    spark = get_spark(
        f"seng-build-c{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf={"spark.local.dir": local_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(path)
    # steady-state measurement: warm JVM codegen/reader paths once (the
    # fixed one-time JIT cost would otherwise land on both cluster sizes)
    t.limit(10_000).write.format("noop").mode("overwrite").save()
    # warm the OS page cache over the full input: the sandbox's single
    # virtual disk would otherwise charge the first sample a cold read
    # that a cluster's distributed FS + replica-local reads don't serialize
    t.write.format("noop").mode("overwrite").save()
    if warm_path is not None:
        wt = spark.read.parquet(warm_path)
        build_index(spark, wt, IndexCatalog(f"{root}-warm"))
        shutil.rmtree(f"{root}-warm", ignore_errors=True)

    samples = []
    n = 0
    stages = {}
    for i in range(reps):
        shutil.rmtree(root, ignore_errors=True)
        os.sync()  # keep the previous sample's writeback out of this one
        snap = build_index(spark, t, IndexCatalog(root))
        # manifest build_seconds covers every build stage but excludes the
        # post-hoc event-log→manifest lineage parse (history-server work)
        dt = float(snap.manifest["build_seconds"])
        n = snap.stats["n_docs"]
        samples.append(round(dt, 3))
        # stage audit must describe the rep the headline number reports
        if dt == min(samples):
            stages = {k: v.get("seconds") for k, v in snap.manifest["ledger"].items()}
    best = min(samples)
    print(json.dumps({
        "cpus": cpus,
        "sf": sf,
        "n_docs": n,
        "reps": reps,
        "build_seconds_samples": samples,
        "build_seconds": best,
        "turns_per_sec": round(n / best, 1),
        "stages": stages,
    }))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
