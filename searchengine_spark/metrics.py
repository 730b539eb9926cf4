"""Query-path metrics registry — the Spark-side mirror of the
reference's Prometheus surface (``internal/metrics/metrics.go:10-55``):

- ``search_requests_total{handler, status}``   ≈ http_requests_total
- ``search_errors_total{handler}``             ≈ http_errors_total
- ``search_duration_seconds{handler}``         ≈ http_request_duration_seconds
  (histogram, the Prometheus default buckets)
- resource gauges ≈ the reference's CPU/memory gauges
  (``metrics.go:45-55``): process CPU seconds, RSS, plus any
  explicitly ``set_gauge``-registered values. Collected lazily at
  ``snapshot()`` time (a scrape), like a Prometheus GaugeFunc. In a
  cluster deployment the executor-side equivalents come from Spark's
  own metrics system; these gauges cover the serving driver — the
  process shaped like the reference's Go binary.

The registry is process-local (a serving driver is one process, like
the reference's Go binary); a deployment would scrape ``snapshot()``
or persist ``count_rows()`` to a ``_metrics`` table. Durations are
wall-clock and therefore nondeterministic — the driver-facing
``count_rows()`` exposes only run-count-deterministic values (counter
values and histogram observation counts), which is what the oracle
checks; full histograms (buckets/sum) are available via
``snapshot()`` and covered by unit tests.
"""

from __future__ import annotations

import threading
from collections import defaultdict

# prometheus DefBuckets (metrics.go uses prometheus.DefBuckets)
DEF_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


class MetricsRegistry:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.reset()

    def reset(self) -> None:
        with getattr(self, "_lock", threading.Lock()):
            self._counters: dict[tuple[str, tuple], int] = defaultdict(int)
            self._hist: dict[tuple[str, tuple], dict] = {}
            self._gauges: dict[tuple[str, tuple], float] = {}

    def set_gauge(self, name: str, value: float, **labels) -> None:
        """Explicit gauge (last-write-wins) — e.g. index size, live
        delta count. Process CPU/memory gauges need no registration;
        they are sampled at snapshot() time."""
        with self._lock:
            self._gauges[self._key(name, labels)] = float(value)

    @staticmethod
    def _process_gauges() -> dict[str, float]:
        """Driver-process resource gauges, sampled at scrape time —
        the reference exports the same pair from its Go runtime
        (``internal/metrics/metrics.go:45-55``)."""
        import os
        import resource

        ru = resource.getrusage(resource.RUSAGE_SELF)
        out = {
            "process_cpu_seconds_total": ru.ru_utime + ru.ru_stime,
            # ru_maxrss is KiB on Linux
            "process_max_resident_memory_bytes": float(ru.ru_maxrss) * 1024.0,
        }
        try:
            with open("/proc/self/statm") as f:
                rss_pages = int(f.read().split()[1])
            out["process_resident_memory_bytes"] = float(
                rss_pages * os.sysconf("SC_PAGE_SIZE")
            )
        except (OSError, IndexError, ValueError):
            pass
        return out

    @staticmethod
    def _key(name: str, labels: dict) -> tuple[str, tuple]:
        return name, tuple(sorted(labels.items()))

    def inc(self, name: str, **labels) -> None:
        with self._lock:
            self._counters[self._key(name, labels)] += 1

    def observe(self, name: str, value: float, **labels) -> None:
        k = self._key(name, labels)
        with self._lock:
            h = self._hist.setdefault(
                k, {"buckets": [0] * (len(DEF_BUCKETS) + 1), "sum": 0.0, "count": 0}
            )
            h["sum"] += value
            h["count"] += 1
            for i, le in enumerate(DEF_BUCKETS):
                if value <= le:
                    h["buckets"][i] += 1
                    break
            else:
                h["buckets"][-1] += 1  # +Inf

    def snapshot(self) -> dict:
        """Full state: counters + histograms (buckets cumulative like a
        Prometheus exposition would render them) + gauges (explicit
        set_gauge values and the process resource gauges sampled at
        this scrape)."""
        with self._lock:
            out: dict = {"counters": {}, "histograms": {}, "gauges": {}}
            for (name, labels), v in self._gauges.items():
                out["gauges"][(name, labels)] = v
            for name, v in self._process_gauges().items():
                out["gauges"][(name, ())] = v
            for (name, labels), v in self._counters.items():
                out["counters"][(name, labels)] = v
            for (name, labels), h in self._hist.items():
                cum, acc = [], 0
                for b in h["buckets"]:
                    acc += b
                    cum.append(acc)
                out["histograms"][(name, labels)] = {
                    "le": list(DEF_BUCKETS) + [float("inf")],
                    "cumulative": cum,
                    "sum": h["sum"],
                    "count": h["count"],
                }
            return out

    def count_rows(self) -> list[tuple[str, str, int]]:
        """Deterministic view: (metric, handler, n) — counter values and
        histogram ``_count``s, sorted. The driver-facing metrics table."""
        agg: dict[tuple[str, str], int] = defaultdict(int)
        with self._lock:
            for (name, labels), v in self._counters.items():
                agg[(name, dict(labels).get("handler", ""))] += v
            for (name, labels), h in self._hist.items():
                agg[(name + "_count", dict(labels).get("handler", ""))] += h["count"]
        return sorted((n, h, v) for (n, h), v in agg.items())


REGISTRY = MetricsRegistry()


def timed(handler: str):
    """Decorator: count + time one query-surface call (RequestRPS +
    RequestDuration + ErrorRPS on raise, mirroring the reference's
    handler instrumentation)."""
    import functools
    import time

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                out = fn(*args, **kwargs)
            except Exception:
                REGISTRY.inc("search_errors_total", handler=handler)
                REGISTRY.inc("search_requests_total", handler=handler, status="error")
                raise
            REGISTRY.inc("search_requests_total", handler=handler, status="ok")
            REGISTRY.observe(
                "search_duration_seconds", time.perf_counter() - t0, handler=handler
            )
            return out

        return wrapper

    return deco
