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
