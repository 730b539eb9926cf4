"""Property-based rank-identity: random queries drawn from the corpus
vocabulary (plus unseen junk) must rank identically across the direct
Spark path, the indexed path, and the pure-Python oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from searchengine_spark import semantics as S
from searchengine_spark.corpus import VOCAB
from searchengine_spark.query.bm25 import search_direct

# head of the vocabulary (heavy hitters) + tail + junk that matches nothing
_TERMS = VOCAB[:60] + VOCAB[200:210] + ["zzznope", "qqqmiss"]


@pytest.fixture(scope="module")
def fuzz_ix(spark, transcripts, tmp_path_factory):
    from searchengine_spark.index.build import build_index
    from searchengine_spark.index.catalog import IndexCatalog
    from searchengine_spark.index.engine import open_index

    cat = IndexCatalog(str(tmp_path_factory.mktemp("fuzz") / "ix"))
    build_index(spark, transcripts, cat, n_buckets=8)
    return open_index(spark, cat)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(terms=st.lists(st.sampled_from(_TERMS), min_size=1, max_size=4, unique=True))
def test_random_query_rank_identity(spark, transcripts, oracle_index, fuzz_ix, terms):
    from searchengine_spark.index.engine import search_index

    expected = oracle_index.search(" ".join(terms))
    direct = [(r["doc_id"], r["score"]) for r in search_direct(transcripts, terms).collect()]
    viaidx = [(r["doc_id"], r["score"]) for r in search_index(fuzz_ix, terms).collect()]
    assert [d for d, _ in direct] == [d for d, _ in expected]
    assert viaidx == direct
    for (_, gs), (_, es) in zip(direct, expected):
        assert gs == pytest.approx(es, abs=2e-4)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda e: e[0] != e[1]),
        max_size=30,
    )
)
def test_cluster_components_match_union_find(spark, edges):
    """Property: distributed min-label propagation == union-find on any
    random pair graph (component membership AND min-representative)."""
    from searchengine_spark.ops.dedup import neardup_clusters

    pairs = [(min(a, b), max(a, b), 0.9) for a, b in edges]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}

    df = spark.createDataFrame(pairs, "doc_a LONG, doc_b LONG, jaccard DOUBLE") if pairs else \
        spark.createDataFrame([], "doc_a LONG, doc_b LONG, jaccard DOUBLE")
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(df).collect()}
    assert got == expected


def test_round_score_matches_jvm_round(spark):
    """round_score's parity claim (driver HALF_UP over repr == Spark
    F.round on DoubleType) is only *guaranteed* by spec on JDK >= 19,
    where Double.toString emits the shortest round-tripping decimal
    exactly like CPython's repr (JDK-4511638). This fuzz runs on the
    DEPLOYED JVM (JDK 17 in this sandbox): a grid of values straddling
    the HALF_UP boundary at SCORE_DECIMALS+1 (exact .5s, one-ulp
    perturbations either side, BM25-scale magnitudes) plus seeded
    random doubles must quantize identically on both paths, so a JVM
    where the claim breaks fails this test instead of silently letting
    the driver fast path and the distributed plan disagree by one unit
    (semantics.py:round_score docstring)."""
    import math
    import random

    from pyspark.sql import functions as F

    d = S.SCORE_DECIMALS
    vals: list[float] = []
    # exact boundary grid: k.xxxx5 at the (d+1)-th decimal, across the
    # magnitudes BM25 scores live in, plus one-ulp neighbours
    for mag in (0, 1, 2):
        for k in range(0, 200, 7):
            base = (k * 10 + 5) / (10 ** (d + 1)) * (10 ** mag)
            for v in (base, math.nextafter(base, 0.0), math.nextafter(base, math.inf)):
                vals.append(v)
                vals.append(-v)
    rng = random.Random(0xC0FFEE)
    vals.extend(rng.uniform(0.0, 50.0) for _ in range(2000))
    # values whose repr carries more digits than d+1 (the straddle case)
    vals.extend(rng.uniform(0.0, 50.0) + 5e-6 for _ in range(500))

    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    jvm = [r["r"] for r in df.select(F.round("x", d).alias("r")).collect()]
    drv = [S.round_score(v) for v in vals]
    mismatches = [
        (v, j, p) for v, j, p in zip(vals, jvm, drv) if j != p
    ]
    assert not mismatches, f"{len(mismatches)} JVM/driver rounding mismatches, first: {mismatches[:3]}"
