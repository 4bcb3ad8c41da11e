"""Bind context: table-alias → Binding registry.

Parity with the reference v2's table-index–based BindContext
(reference src/planner_v2/binder/bind_context.rs:12, binding.rs:12) plus the
v1 binder's ambiguity checks (reference src/binder/expression/mod.rs:177-214).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sqlrs_tpu.errors import BinderError
from sqlrs_tpu.types import LogicalType


@dataclass
class Binding:
    alias: str
    table_index: int
    names: list[str]
    types: list[LogicalType]

    def try_column(self, name: str) -> int | None:
        try:
            return self.names.index(name)
        except ValueError:
            return None


@dataclass
class BindContext:
    bindings: list[Binding] = field(default_factory=list)

    def add(self, binding: Binding) -> None:
        if any(b.alias == binding.alias for b in self.bindings):
            raise BinderError(f"duplicate table alias {binding.alias!r}")
        self.bindings.append(binding)

    def get(self, alias: str) -> Binding:
        for b in self.bindings:
            if b.alias == alias:
                return b
        raise BinderError(f"table {alias!r} not found in FROM clause")

    def resolve_qualified(self, alias: str, column: str) -> tuple[Binding, int]:
        b = self.get(alias)
        ci = b.try_column(column)
        if ci is None:
            raise BinderError(f"column {column!r} not found in table {alias!r}")
        return b, ci

    def resolve_unqualified(self, column: str) -> tuple[Binding, int]:
        hits: list[tuple[Binding, int]] = []
        for b in self.bindings:
            ci = b.try_column(column)
            if ci is not None:
                hits.append((b, ci))
        if not hits:
            raise BinderError(f"column {column!r} not found")
        if len(hits) > 1:
            raise BinderError(f"ambiguous column name {column!r}")
        return hits[0]
