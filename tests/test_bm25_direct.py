"""M1 gate: direct (index-less) Spark BM25 is rank-identical to the
pure-Python oracle on the synthetic transcripts corpus (north_rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark import semantics as S
from searchengine_spark.query.bm25 import search_direct

QUERIES = [
    "spark",  # single term
    "query plan shuffle",  # multi-term OR
    "data",  # heavy hitter
    "кепка",  # cyrillic
    "zzzznothing",  # no-hit
    "partition skew salt broadcast",
]


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identity_direct(spark, transcripts, oracle_index, q):
    expected = oracle_index.search(q)
    got = [
        (r["doc_id"], r["score"])
        for r in search_direct(transcripts, oracle_index.expand_terms(q)).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gs == pytest.approx(es, abs=2e-4), (gd, gs, es)


def test_filtered_query(spark, transcripts, oracle_index):
    pred_spark = (F.col("role") == "assistant") & (F.col("tool") == "search")
    expected = oracle_index.search(
        "spark query", predicate=lambda d: d["role"] == "assistant" and d["tool"] == "search"
    )
    got = [
        (r["doc_id"], r["score"])
        for r in search_direct(
            transcripts, oracle_index.expand_terms("spark query"), doc_predicate=pred_spark
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected]


def test_k_limit(spark, transcripts, oracle_index):
    got = search_direct(transcripts, ["data"]).collect()
    assert len(got) == S.TOP_K


def test_and_mode_matches_oracle(spark, transcripts, oracle_index):
    """AND = docs containing every term, scored like OR, top-k."""
    terms = ["data", "run"]  # heavy hitters that do co-occur
    expected = sorted(
        (
            (-oracle_index.score_doc(d, terms), d)
            for d, c in oracle_index.tf.items()
            if all(t in c for t in terms)
        ),
    )[: S.TOP_K]
    assert expected, "test corpus must contain a conjunctive match"
    got = search_direct(transcripts, terms, mode="and").collect()
    assert [r["doc_id"] for r in got] == [d for _, d in expected]
    for r, (neg_s, _) in zip(got, expected):
        assert r["score"] == pytest.approx(-neg_s, abs=2e-4)


def test_and_mode_no_partial_matches(spark, transcripts):
    """A doc matching only some terms must not appear in AND results."""
    terms = ["spark", "zzzznothing"]  # second term matches nothing
    assert search_direct(transcripts, terms, mode="and").collect() == []
