"""Snapshot catalog: atomic publish, rollback, expiry (SURVEY §2.1 S7/S8/S12)."""

from __future__ import annotations

import os

import pytest

from searchengine_spark.index.catalog import IndexCatalog


def _publish(cat: IndexCatalog, payload: str) -> int:
    sid = cat.next_id()
    stage = cat.staging_dir(sid)
    with open(os.path.join(stage, "data.txt"), "w") as f:
        f.write(payload)
    cat.publish(sid, {"stats": {"payload": payload}})
    return sid


def test_publish_and_current(tmp_path):
    cat = IndexCatalog(str(tmp_path / "ix"))
    assert cat.current() is None
    s1 = _publish(cat, "one")
    assert cat.current_id() == s1
    assert cat.current().stats["payload"] == "one"
    s2 = _publish(cat, "two")
    assert cat.current_id() == s2 == s1 + 1
    assert cat.history() == [s1, s2]
    # staging dir is gone after publish (atomic rename)
    assert not os.path.exists(os.path.join(cat.root, f"stage-{s2}"))


def test_rollback(tmp_path):
    cat = IndexCatalog(str(tmp_path / "ix"))
    s1 = _publish(cat, "one")
    _publish(cat, "two")
    snap = cat.rollback(s1)
    assert cat.current_id() == s1 and snap.stats["payload"] == "one"
    with pytest.raises(FileNotFoundError):
        cat.rollback(99)


def test_expire_keeps_current(tmp_path):
    cat = IndexCatalog(str(tmp_path / "ix"))
    sids = [_publish(cat, str(i)) for i in range(5)]
    cat.rollback(sids[0])
    gone = cat.expire(keep_last=2)
    assert sids[0] not in gone  # CURRENT survives even though old
    assert cat.history() == sorted(set(sids) - set(gone))
