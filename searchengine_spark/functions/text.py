"""Text analysis column expressions — all JVM-side (whole-stage codegen).

The reference's analyzer chain is Bleve `standard` = unicode word
segmentation + lowercase + English stop filter (it never installs a
custom analyzer: `internal/index/index.go:35,45`).  We reproduce it with
built-in Spark SQL functions — `regexp_extract_all` + `filter` — so the
hot tokenize path never leaves the JVM (BASELINE.json input_hint: "no
per-row Python").  The pinned contract lives in
:mod:`searchengine_spark.semantics`; parity with the Python oracle
tokenizer is property-tested in tests/test_tokenize.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import semantics as S


def tokenize_col(text: Column | str) -> Column:
    """lowercase → maximal unicode letter/digit runs (keeps stopwords)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(col), F.lit(S.TOKEN_PATTERN_JAVA), F.lit(0))


def tokens_no_stop(text: Column | str) -> Column:
    """Full analyzer chain: tokenize + stopword removal (A1-A3).

    `filter` with `array_contains` on a literal array stays inside
    whole-stage codegen; order and duplicates are preserved (tf needs
    multiplicity — `array_except` would dedup and is wrong here).
    """
    stop = F.lit(list(S.STOPWORDS))
    return F.filter(tokenize_col(text), lambda t: ~F.array_contains(stop, t))


def doc_id_col(conv_id: Column | str = "conv_id", turn_idx: Column | str = "turn_idx") -> Column:
    """doc_id = conv_id:%04d(turn_idx) — string order == (conv_id, turn_idx)
    order, the stable-ordering invariant of BASELINE.json input_hint."""
    c = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    t = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    return F.concat(c, F.lit(":"), F.lpad(t.cast("string"), 4, "0"))
