"""Filter-request → Spark predicate compilation (SURVEY §2.3 F1-FA).

Re-expresses the reference's Bleve query compilation
(``internal/filter/filter.go:43-133``) as a single Catalyst ``Column``
predicate so filters reach the parquet/Iceberg scan as pushed-down
conjuncts wherever possible:

- category equality (lowercased term, MUST)            — filter.go:54-59
- range filters: number / timestamp, OR-ed with each
  other, the OR-block AND-ed in                        — filter.go:62-84
- multi-select: OR within a field, AND across fields   — filter.go:86-104
- one-select: equality per field, AND across           — filter.go:106-117
- bool-select: boolean equality, AND across            — filter.go:119-130
- nil/empty request → no predicate                     — filter.go:43-50

String matching is case-insensitive on the value side exactly like the
reference (it lowercases the query value and matches against analyzed,
i.e. lowercased, indexed terms — filter.go:56,92,110). For columns the
engine knows hold lowercase categorical values (role/tool in the
transcripts fixture) we emit a plain equality so Catalyst can push it
to the scan; otherwise ``lower(col) = value``.
"""

from __future__ import annotations

from datetime import datetime, timezone
from functools import reduce
from operator import and_, or_

from pyspark.sql import Column
from pyspark.sql import functions as F

# Filter request shape (JSON keys as in the reference DTO,
# internal/common/request/model.go:16-22):
# {"category": str,
#  "range": [{"name","type","from_value","to_value"}],
#  "multi-select": [{"name","value": [..]}],
#  "one-select": [{"name","value": str}],
#  "bool-select": [{"name","value": bool}]}

RFC3339 = "%Y-%m-%dT%H:%M:%S%z"


class FilterError(ValueError):
    pass


def _parse_rfc3339(s: str) -> datetime:
    try:
        dt = datetime.strptime(s.replace("Z", "+00:00"), RFC3339)
    except ValueError as e:  # reference errors out the same way (filter.go:137-144)
        raise FilterError(f"invalid date: {s}") from e
    return dt.astimezone(timezone.utc).replace(tzinfo=None)  # session TZ is UTC


def _str_eq(colname: str, value: str, lowercase_cols: set[str]) -> Column:
    v = value.lower()
    if colname in lowercase_cols:
        return F.col(colname) == F.lit(v)  # pushdown-friendly
    return F.lower(F.col(colname)) == F.lit(v)


def compile_filters(
    req: dict | None,
    *,
    category_field: str = "role",
    lowercase_cols: frozenset[str] = frozenset({"role", "tool"}),
) -> Column | None:
    """FilterRequest dict → one AND-combined predicate, or None."""
    if not req:
        return None
    rng = req.get("range") or []
    ms = req.get("multi-select") or []
    os_ = req.get("one-select") or []
    bs = req.get("bool-select") or []
    cat = req.get("category") or ""
    if not (rng or ms or os_ or bs or cat):
        return None

    musts: list[Column] = []

    if cat:
        musts.append(_str_eq(category_field, cat, set(lowercase_cols)))

    if rng:
        shoulds = []
        for r in rng:
            name, typ = r["name"], r.get("type")
            if typ == "timestamp":
                lo = _parse_rfc3339(r["from_value"])
                hi = _parse_rfc3339(r["to_value"])
                shoulds.append(F.col(name).between(F.lit(lo), F.lit(hi)))
            elif typ == "number":
                try:
                    lo_f, hi_f = float(r["from_value"]), float(r["to_value"])
                except ValueError as e:
                    raise FilterError(f"invalid numeric bound in {r}") from e
                shoulds.append(F.col(name).between(F.lit(lo_f), F.lit(hi_f)))
            else:
                raise FilterError(f"unsupported range type: {typ}")
        musts.append(reduce(or_, shoulds))

    if ms:
        per_field = []
        for m in ms:
            vals = [v.lower() for v in m["value"]]
            if m["name"] in lowercase_cols:
                per_field.append(F.col(m["name"]).isin(vals))
            else:
                per_field.append(F.lower(F.col(m["name"])).isin(vals))
        musts.append(reduce(and_, per_field))

    if os_:
        musts.append(
            reduce(and_, [_str_eq(o["name"], o["value"], set(lowercase_cols)) for o in os_])
        )

    if bs:
        musts.append(reduce(and_, [F.col(b["name"]) == F.lit(bool(b["value"])) for b in bs]))

    return reduce(and_, musts)
