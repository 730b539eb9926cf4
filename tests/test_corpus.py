from __future__ import annotations

import numpy as np

from searchengine_spark import corpus


def test_deterministic():
    a = corpus.generate(0.0002)
    b = corpus.generate(0.0002)
    assert a.equals(b)


def test_shape_and_invariants():
    t = corpus.generate(0.001)
    assert t.num_rows == corpus.n_turns_for_sf(0.001) == 2000
    assert t.schema.equals(corpus.SCHEMA)
    d = t.to_pydict()
    conv = np.array(d["conv_id"])
    turn = np.array(d["turn_idx"])
    # dense 0-based turn_idx per conv, monotone ts within conv
    ts = np.array(d["ts"])
    for cid in np.unique(conv)[:50]:
        m = conv == cid
        assert (turn[m] == np.arange(m.sum())).all()
        assert (np.diff(ts[m].astype("datetime64[us]").astype(np.int64)) > 0).all()
    roles = set(d["role"])
    assert roles <= {"user", "assistant", "system", "tool"}
    assert set(d["tool"]) <= {"", "bash", "search", "browser"}


def test_planted_vocab_present():
    t = corpus.generate(0.01)
    text = " ".join(t.column("text").to_pylist())
    for w in ["serach", "qurey", "кепка", "шапка", "query", "the"]:
        assert w in text.split(), w
