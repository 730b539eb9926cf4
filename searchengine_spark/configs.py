"""Config-driven schema / filter / rank configuration with hot swap + revert.

Faithful re-expression of the reference's JSON configs
(``internal/config/config.go:120-218``) and its config-update lifecycle:
updating a config backs up the previous version and marks the index
"needs rebuild"; revert restores the backup
(``internal/server/handler.go:307-396``).

Field types are exactly the reference's four
(``internal/validate/validate.go:25-42``): ``string``, ``number``
(float64), ``bool``, ``timestamp`` (string in a configured layout).
Capability flags map to physical layout (``internal/index/index.go:49-57``):
searchable → posting lists, filterable → stored/filterable column,
sortable → orderable column.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

FIELD_TYPES = ("string", "number", "bool", "timestamp")


@dataclass
class FieldConfig:
    name: str
    type: str = "string"
    searchable: bool = False
    filterable: bool = False
    sortable: bool = False
    synonym: bool = False

    def __post_init__(self):
        if self.type not in FIELD_TYPES:
            raise ValueError(f"unsupported field type: {self.type!r}")


@dataclass
class IndexConfig:
    indexName: str
    category: list[str] = field(default_factory=list)
    fields: list[FieldConfig] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        return cls(
            indexName=d["indexName"],
            category=list(d.get("category") or []),
            fields=[FieldConfig(**f) for f in d.get("fields") or []],
        )

    def field_map(self) -> dict[str, FieldConfig]:
        return {f.name: f for f in self.fields}

    def searchable_fields(self) -> list[str]:
        return [f.name for f in self.fields if f.searchable]


@dataclass
class RangeFilter:
    name: str
    type: str  # "number" | "timestamp" (filter.go:160-168)
    from_value: str = ""
    to_value: str = ""


@dataclass
class MultiSelectFilter:
    name: str
    value: list[str] = field(default_factory=list)


@dataclass
class OneSelectFilter:
    name: str
    value: list[str] = field(default_factory=list)


@dataclass
class BoolSelectFilter:
    name: str


@dataclass
class FilterConfig:
    category: str
    range: list[RangeFilter] = field(default_factory=list)
    multi_select: list[MultiSelectFilter] = field(default_factory=list)
    one_select: list[OneSelectFilter] = field(default_factory=list)
    bool_select: list[BoolSelectFilter] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "FilterConfig":
        return cls(
            category=d.get("category", ""),
            range=[RangeFilter(**r) for r in d.get("range") or []],
            multi_select=[MultiSelectFilter(**m) for m in d.get("multi-select") or []],
            one_select=[OneSelectFilter(**o) for o in d.get("one-select") or []],
            bool_select=[BoolSelectFilter(**b) for b in d.get("bool-select") or []],
        )


BOOST_TYPES = ("value", "linear", "logarithmic", "custom", "catboostV2")


@dataclass
class BoostConfig:
    field: str
    weight: float = 1.0
    boost_type: str = "value"
    formula: str = ""


@dataclass
class RankConfig:
    boosts: list[BoostConfig] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "RankConfig":
        return cls(boosts=[BoostConfig(**b) for b in d.get("boosts") or []])


def default_transcripts_index_config() -> IndexConfig:
    """The fixture config for the transcripts table (FIXTURES.md §2)."""
    return IndexConfig(
        indexName="transcripts",
        category=["user", "assistant", "system", "tool"],
        fields=[
            FieldConfig("conv_id", "string", filterable=True),
            FieldConfig("turn_idx", "number", sortable=True),
            FieldConfig("role", "string", filterable=True),
            FieldConfig("text", "string", searchable=True, synonym=True),
            FieldConfig("tool", "string", filterable=True),
            FieldConfig("ts", "timestamp", filterable=True, sortable=True),
        ],
    )


class ConfigStore:
    """Versioned JSON config storage: update keeps a ``.old`` backup and
    flags a rebuild; revert restores it (reference handler.go:307-396)."""

    KINDS = ("index", "filter", "rank")

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.needs_rebuild = False

    def _path(self, kind: str) -> str:
        return os.path.join(self.root, f"{kind}_config.json")

    def load(self, kind: str):
        with open(self._path(kind)) as f:
            d = json.load(f)
        if kind == "index":
            return IndexConfig.from_dict(d)
        if kind == "filter":
            return [FilterConfig.from_dict(x) for x in d]
        return RankConfig.from_dict(d)

    def save(self, kind: str, cfg) -> None:
        if kind == "filter":
            payload = [_filter_to_json(c) for c in cfg]
        elif kind == "index":
            payload = asdict(cfg)
        else:
            payload = asdict(cfg)
        with open(self._path(kind), "w") as f:
            json.dump(payload, f, indent=2, ensure_ascii=False)

    def update(self, kind: str, cfg) -> None:
        """Hot swap: back up current config, install new, mark rebuild."""
        path = self._path(kind)
        if os.path.exists(path):
            os.replace(path, path + ".old")
        self.save(kind, cfg)
        if kind == "index":
            self.needs_rebuild = True

    def revert(self, kind: str):
        """Restore the previous config version; returns it."""
        old = self._path(kind) + ".old"
        if not os.path.exists(old):
            raise FileNotFoundError(f"no previous {kind} config to revert to")
        os.replace(old, self._path(kind))
        if kind == "index":
            self.needs_rebuild = True
        return self.load(kind)


def _filter_to_json(c: FilterConfig) -> dict:
    return {
        "category": c.category,
        "range": [asdict(r) for r in c.range],
        "multi-select": [asdict(m) for m in c.multi_select],
        "one-select": [asdict(o) for o in c.one_select],
        "bool-select": [asdict(b) for b in c.bool_select],
    }
