#!/usr/bin/env python3
"""spark-submit entrypoint for the distributed index build (north rule:
"the full build runs via spark-submit --py-files at N and 4N executors").

Package + submit:

    cd /root/repo && python scripts/package.py          # → dist/searchengine_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/searchengine_spark.zip \\
        scripts/build_job.py \\
        --input /root/repo/data/transcripts/sf0.001/transcripts.parquet \\
        --catalog /tmp/seng_submit/index [--buckets 16] [--bucket-jobs 1]

On a cluster, swap ``--master`` for YARN/K8s and point ``--catalog`` at
shared storage; the job is resumable — resubmitting after a failure
skips ledger-committed stages (index/build.py).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--catalog", required=True, help="index catalog root dir")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--bucket-jobs", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.index.build import build_index
    from searchengine_spark.index.catalog import IndexCatalog

    # spark-submit owns master/conf; just get the session it provides
    spark = SparkSession.builder.appName("searchengine-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    snap = build_index(
        spark,
        spark.read.parquet(args.input),
        IndexCatalog(args.catalog),
        n_buckets=args.buckets,
        bucket_jobs=args.bucket_jobs,
    )
    print(json.dumps({
        "snap_id": snap.snap_id,
        "n_docs": snap.stats["n_docs"],
        "turns_per_sec": snap.manifest["turns_per_sec"],
        "build_seconds": snap.manifest["build_seconds"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
