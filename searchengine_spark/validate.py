"""Document / sort-field validation (reference ``internal/validate/validate.go``).

Reference semantics pinned (SURVEY §2.12 Q4): every configured field
must be present in every document; JSON numbers are float (int accepted
and normalized — Python has no float64-only JSON), timestamps travel as
strings, bools are bools.
"""

from __future__ import annotations

from .configs import IndexConfig


class ValidationError(ValueError):
    pass


def _type_ok(expected: str, value) -> bool:
    if expected == "string" or expected == "timestamp":
        return isinstance(value, str)
    if expected == "number":
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if expected == "bool":
        return isinstance(value, bool)
    return False


def validate_document(cfg: IndexConfig, document: dict) -> None:
    """Raise unless the doc has every configured field with the right type
    (reference validate.go:9-22 — intentionally strict, no optional fields)."""
    for f in cfg.fields:
        if f.name not in document:
            raise ValidationError(f"field '{f.name}' missing from document")
        if not _type_ok(f.type, document[f.name]):
            raise ValidationError(
                f"field '{f.name}' has wrong type: expected '{f.type}', "
                f"got '{type(document[f.name]).__name__}'"
            )


def validate_sort_field(cfg: IndexConfig, sort_field: str) -> bool:
    """True iff the field exists and is sortable (validate.go:44-51)."""
    for f in cfg.fields:
        if f.name == sort_field:
            return f.sortable
    return False
