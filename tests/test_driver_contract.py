"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf=0.01 and compare against ``oracle_sql()`` in
DuckDB — row count, sorted-column schema, and order-insensitive
value comparison (exact, after the registry's own rounding)."""

from __future__ import annotations

import importlib.util
import math
import sys

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


ENTRY = _load_entry()
NAMES = sorted(ENTRY.queries().keys())


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = ENTRY.queries()[name]
    oracles = ENTRY.oracle_sql()
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.execute(oracles[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} spark vs {len(drows)} duckdb"
    sm = _rows_to_multiset(scols, srows)
    dm = _rows_to_multiset(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sm, dm)) if a != b][:5]
    assert sm == dm, f"{name}: first mismatches {[(sm[i], dm[i]) for i in mism]}"


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns


def test_clear_direct_cache_releases_checkpoint_blocks(spark):
    """clear_direct_cache must release localCheckpointed pair-graph
    storage eagerly (not strand it until session stop)."""
    from searchengine_spark import entry_queries as EQ

    sc = spark.sparkContext

    def stored_ids():
        return {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}

    df = spark.range(1000).localCheckpoint(eager=True)
    new_ids = stored_ids()
    ckpt_id = df._jdf.queryExecution().analyzed().rdd().id()
    assert ckpt_id in new_ids
    EQ._EMB_PAIR_CACHE[("test", "test", 0.0)] = df
    EQ.clear_direct_cache()
    # the checkpoint's block is gone (unpersist is blocking); earlier
    # tests' own cached frames may come and go, so assert on THIS id
    assert ckpt_id not in stored_ids()
    assert not EQ._EMB_PAIR_CACHE and not EQ._MINHASH_PAIR_CACHE
