"""Typed stored-field round-trip (reference getDocId decode semantics)."""

from __future__ import annotations

import pytest

from searchengine_spark.configs import FieldConfig, IndexConfig
from searchengine_spark.docstore import DocStore
from searchengine_spark.validate import ValidationError


@pytest.fixture()
def cfg():
    return IndexConfig(
        indexName="t",
        fields=[
            FieldConfig("title", "string", searchable=True),
            FieldConfig("price", "number", sortable=True),
            FieldConfig("in_stock", "bool", filterable=True),
            FieldConfig("added", "timestamp", sortable=True),
        ],
    )


def test_typed_roundtrip_and_lww(spark, cfg, tmp_path):
    store = DocStore(spark, cfg, str(tmp_path / "store"))
    store.put_all(
        {
            "d1": {"title": "cap", "price": 10, "in_stock": True,
                   "added": "2025-03-01T12:00:05Z"},
            "d2": {"title": "hat", "price": 3.5, "in_stock": False,
                   "added": "2025-03-02T00:00:00Z"},
        }
    )
    got = store.get("d1")
    # NumericField decodes to float even for int input (reference
    # field.Number() is float64); bool stays bool; ts is RFC3339
    assert got == {"title": "cap", "price": 10.0, "in_stock": True,
                   "added": "2025-03-01T12:00:05Z"}
    assert isinstance(got["price"], float) and isinstance(got["in_stock"], bool)

    # last-write-wins upsert
    store.put_all({"d1": {"title": "cap v2", "price": 11, "in_stock": False,
                          "added": "2025-03-03T09:30:00Z"}})
    got2 = store.get("d1")
    assert got2["title"] == "cap v2" and got2["price"] == 11.0
    assert store.get("d2")["title"] == "hat"  # untouched
    assert store.get("nope") is None

    df = store.fetch_df()
    assert [r["doc_id"] for r in df.collect()] == ["d1", "d2"]
    assert dict(df.dtypes) == {
        "doc_id": "string", "title": "string", "price": "double",
        "in_stock": "boolean", "added": "string",
    }


def test_put_validates_against_config(spark, cfg, tmp_path):
    store = DocStore(spark, cfg, str(tmp_path / "store"))
    with pytest.raises(ValidationError, match="missing"):
        store.put_all({"d1": {"title": "x", "price": 1, "in_stock": True}})
    with pytest.raises(ValidationError, match="wrong type"):
        store.put_all({"d1": {"title": "x", "price": "1", "in_stock": True,
                              "added": "2025-03-01T00:00:00Z"}})
