"""Ranking / sort semantics (SURVEY §2.5 R2-R4, quirk Q3).

The reference builds a Bleve sort spec (``internal/rank/rank.go:97-136``):

- explicit ``sortField``+``sortOrder`` overrides ranking entirely
  (rank.go:100-110; field must be sortable);
- otherwise ``-_score`` first, then one formatted key per configured
  boost (rank.go:115-131) of type value/linear, logarithmic, or custom
  (``$F``/``$W`` formula, scaffolded but commented out, rank.go:138-183).

**Quirk Q3** (observed vs intended): the formatted boost strings like
``-brand^5.00`` are not valid Bleve sort syntax, so in the reference the
boost keys silently sort by a non-existent field — the *observed* order
is score-desc only. We default to the observed semantics with a
deterministic ``doc_id`` tie-break, and implement the *intended* boost
semantics (computed sort columns) behind ``apply_boosts=True``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .configs import BoostConfig, IndexConfig, RankConfig
from .validate import ValidationError, validate_sort_field


def boost_column(b: BoostConfig) -> Column:
    """Computed sort key for one boost (intended semantics, rank.go:115-131)."""
    col = F.col(b.field).cast("double")
    if b.boost_type in ("value", "linear", "catboostV2"):
        return col * F.lit(b.weight)
    if b.boost_type == "logarithmic":
        return F.log(col + F.lit(1.0)) * F.lit(b.weight)
    if b.boost_type == "custom":
        # formula with $F (field) / $W (weight) substitution (rank.go:160-183)
        expr = b.formula.replace("$F", f"CAST({b.field} AS DOUBLE)").replace(
            "$W", repr(float(b.weight))
        )
        return F.expr(expr)
    raise ValueError(f"unsupported boost_type: {b.boost_type}")


def apply_ranking(
    df: DataFrame,
    *,
    score_col: str = "score_raw",
    sort_field: str | None = None,
    sort_desc: bool = True,
    rank_cfg: RankConfig | None = None,
    index_cfg: IndexConfig | None = None,
    apply_boosts: bool = False,
) -> DataFrame:
    """Order a scored candidate DataFrame per the reference's rules."""
    if sort_field:
        if index_cfg is not None and not validate_sort_field(index_cfg, sort_field):
            raise ValidationError(f"field '{sort_field}' is not sortable")
        key = F.col(sort_field).desc() if sort_desc else F.col(sort_field).asc()
        return df.orderBy(key, F.asc("doc_id"))
    keys = [F.col(score_col).desc()]
    if apply_boosts and rank_cfg is not None:
        keys += [boost_column(b).desc() for b in rank_cfg.boosts]
    return df.orderBy(*keys, F.asc("doc_id"))
