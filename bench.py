#!/usr/bin/env python3
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall-clock of the headline query set. Additional
keys (index build throughput, scaling efficiency) are added as the
corresponding milestones land; BENCH/BASELINE.md records the protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from searchengine_spark.corpus import sf_from_dir
    from searchengine_spark.entry_queries import queries
    from searchengine_spark.session import get_spark

    sf = sf_from_dir(sf_dir)
    spark = get_spark("searchengine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qtimes: dict[str, float] = {}
    qs = queries()
    # warm the JVM + parquet footer caches once with the cheapest query
    qs["scan_stable_order"](spark, sf_dir).collect()

    t_all0 = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        qtimes[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_all0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_query_set_wallclock",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
