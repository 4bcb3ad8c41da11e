"""Session layer: Database / query pipeline orchestration.

Mirrors the reference's two entry points in one class: v1
`Database::run/explain` (reference src/db.rs:107,152) and the v2
DatabaseInstance + ClientContext::query session objects (reference
src/main_entry/db.rs:9, client_context.rs:34). A statement flows
parse → bind → (HEP optimize) → physical plan → execute; a failed statement
aborts only itself.

v1-style CSV sessions preload every CSV as a table via `create_csv_table`
(reference tests/sqllogictest/src/lib.rs:10-31 auto-loads tests/csv/*.csv).
"""

from __future__ import annotations

import os
from typing import Optional

from sqlrs_tpu.binder.binder import Binder
from sqlrs_tpu.catalog.catalog import Catalog, ColumnDefinition
from sqlrs_tpu.data import DeviceBatch
from sqlrs_tpu.errors import SqlrsError
from sqlrs_tpu.exec.executor import Executor
from sqlrs_tpu.functions.table import BUILTIN_TABLE_FUNCTIONS
from sqlrs_tpu.parser import ast, parse
from sqlrs_tpu.plan.logical import LogicalExplain, explain_tree as explain_logical
from sqlrs_tpu.plan.physical import PhysicalPlanGenerator, explain_tree as explain_physical
from sqlrs_tpu.storage.csv import CsvConfig, load_csv
from sqlrs_tpu.storage.memory import DataTable
from sqlrs_tpu.utils.render import batches_to_slt_lines


class Database:
    def __init__(
        self,
        base_dir: str | None = None,
        profile: bool = False,
        mesh=None,
        n_devices: int | None = None,
    ) -> None:
        """`mesh` (a jax.sharding.Mesh) or `n_devices` turns on distributed
        execution: tables are row-sharded across the mesh and plans run via
        parallel/dist_executor.DistributedExecutor (bit-exact with the
        single-device engine, row order included)."""
        if mesh is None and n_devices is not None:
            from sqlrs_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_devices)
        self.mesh = mesh
        self.catalog = Catalog()
        for fn in BUILTIN_TABLE_FUNCTIONS:
            self.catalog.register_table_function(fn.name, fn)
        self._csv_cache: dict[tuple, DataTable] = {}
        # relative csv paths in SQL resolve against base_dir (the reference
        # resolves against its repo root when running the slt suite)
        self.base_dir = base_dir or os.getcwd()
        from sqlrs_tpu.utils.profiling import profiling_enabled

        self.profile_enabled = profile or profiling_enabled()
        self.last_profile = None  # QueryProfile of the most recent statement

    # ---- storage helpers ------------------------------------------------------

    def _resolve_path(self, path: str) -> str:
        if os.path.isabs(path):
            return path
        return os.path.join(self.base_dir, path)

    def csv_cache_load(self, path: str, delim: str = ",", header: bool = True) -> DataTable:
        path = self._resolve_path(path)
        key = (os.path.abspath(path), delim, header)
        if key not in self._csv_cache:
            self._csv_cache[key] = load_csv(
                path, CsvConfig(has_header=header, delimiter=delim)
            )
        return self._csv_cache[key]

    def create_csv_table(self, name: str, path: str) -> None:
        """v1-style CSV-backed table (reference src/cli.rs `\\load csv` and the
        slt harness preload)."""
        table = load_csv(path)
        self.catalog.create_table(
            name,
            [ColumnDefinition(n, t) for n, t in zip(table.names, table.types)],
            table,
        )

    def create_memory_table_numpy(self, name: str, schema_pairs, arrays) -> None:
        """Columnar bulk ingest: numpy arrays go straight into the host-side
        table store (no device round-trip — the device snapshot materializes
        lazily on first scan). String arrays intern in one pass."""
        import numpy as np

        from sqlrs_tpu.data.strings import GLOBAL_STRINGS
        from sqlrs_tpu.types import LogicalType

        table = DataTable([n for n, _ in schema_pairs], [t for _, t in schema_pairs])
        cols, valids = [], []
        for (_n, t), a in zip(schema_pairs, arrays):
            a = np.asarray(a)
            if t == LogicalType.VARCHAR and a.dtype.kind in ("U", "O"):
                a = GLOBAL_STRINGS.intern_many(list(a))
            valids.append(np.ones(len(a), np.bool_))
            cols.append(a)
        table.append_numpy(cols, valids)
        self.catalog.create_table(
            name,
            [ColumnDefinition(n, t) for n, t in schema_pairs],
            table,
        )

    def create_memory_table(self, name: str, batch: DeviceBatch) -> None:
        table = DataTable.from_batch(batch)
        self.catalog.create_table(
            name,
            [
                ColumnDefinition(f.name, f.type)
                for f in batch.schema.fields
            ],
            table,
        )

    # ---- query pipeline ----------------------------------------------------------

    def connect(self):
        """New ClientContext session object (reference
        src/main_entry/client_context.rs:18) supporting prepared statements,
        pending results, and interruption."""
        from sqlrs_tpu.session.client_context import ClientContext

        return ClientContext(self)

    def run(self, sql: str) -> list[DeviceBatch]:
        """Execute all statements; returns the last statement's batches."""
        stmts = parse(sql)
        if not stmts:
            return []
        out: list[DeviceBatch] = []
        for stmt in stmts:
            out = self._run_statement(stmt)
        return out

    def run_lines(self, sql: str) -> list[str]:
        """Execute and render rows with slt rules (one string per row)."""
        return batches_to_slt_lines(self.run(sql))

    def explain(self, sql: str) -> str:
        rows = self.run("explain " + sql)
        lines = []
        for b in rows:
            for key, val in b.to_pylist():
                lines.append(f"=== {key} ===\n{val}")
        return "\n".join(lines)

    def _run_statement(self, stmt: ast.Statement) -> list[DeviceBatch]:
        binder = Binder(self)
        bound = binder.bind(stmt)
        plan = bound.plan

        if isinstance(plan, LogicalExplain):
            plan.plan_strings["logical_plan"] = explain_logical(plan.children[0])

        plan = self._optimize(plan)

        phys = PhysicalPlanGenerator().create_plan(plan)
        if isinstance(plan, LogicalExplain):
            phys.plan_strings = dict(plan.plan_strings)
            phys.plan_strings["physical_plan"] = explain_physical(phys.children[0])

        profile = None
        if self.profile_enabled:
            from sqlrs_tpu.utils.profiling import QueryProfile

            profile = QueryProfile()
        if self.mesh is not None:
            from sqlrs_tpu.parallel.dist_executor import DistributedExecutor

            self.last_join_strategies = []  # strategy picks, in exec order
            batch = DistributedExecutor(self, self.mesh, profile=profile).run(phys)
        else:
            batch = Executor(self, profile=profile).execute(phys)
        if profile is not None:
            self.last_profile = profile
        return [batch] if len(batch.schema) > 0 else []

    def _optimize(self, plan):
        """HEP optimizer hook; rule engine lands in sqlrs_tpu/optimizer/."""
        from sqlrs_tpu.optimizer import optimize as hep_optimize

        optimized = hep_optimize(plan)
        if isinstance(optimized, LogicalExplain):
            optimized.plan_strings["optimized_logical_plan"] = explain_logical(
                optimized.children[0]
            )
        return optimized
