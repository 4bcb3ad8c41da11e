"""sqlrs_tpu — a TPU-native vectorized OLAP SQL query engine.

A from-scratch reimplementation of the capabilities of Fedomn/sqlrs (a
DuckDB-modeled in-process SQL engine, reference at /root/reference), designed
TPU-first:

- Data plane: fixed-width columnar device batches (jax arrays + validity
  masks) instead of Arrow chunks; strings are dictionary-encoded int32 codes
  against an interning dictionary (host-resident, device ops on codes).
- Operators: vectorized JAX/XLA programs built on the sort primitive —
  measured on TPU v5e, arbitrary per-element scatter/gather runs at
  12-40M elem/s while XLA sort streams at 230-314M elem/s, so grouped
  aggregate / join / order-by are all sort-run formulations (see
  sqlrs_tpu/ops/ and CLAUDE.md for the measurements).
- Distribution: tables hash-partitioned over a jax.sharding.Mesh; exchange =
  all-to-all collectives via shard_map (see sqlrs_tpu/parallel/).
- Frontend (parser/binder/planner/HEP optimizer) is host Python — it is not
  perf-critical and is specified by the reference's plan-tree goldens.

Entry point mirrors the reference's session layer (reference src/db.rs:107,
src/main_entry/client_context.rs:34):

    import sqlrs_tpu
    db = sqlrs_tpu.Database()
    db.create_csv_table("employee", "tests/csv/employee.csv")
    rows = db.run("select first_name from employee where last_name='Hopkins'")
"""

# SQL needs 64-bit ints (BIGINT, SUM results) — enable x64 before any jax use.
import os as _os

import jax

# Honor JAX_PLATFORMS before the first backend touch: the env var alone does
# not stop jax from initializing a remote PJRT plugin (e.g. the axon TPU
# relay) at first dispatch — with the relay unreachable that init HANGS a
# process that only asked for cpu. Mirroring the env var into the config
# makes CPU-pinned runs (tests, virtual-mesh dryruns) immune. No env var ->
# default platform selection (the real chip) is untouched.
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: plan shapes recompile only once per machine,
# not once per process (first compile of a novel plan shape costs seconds).
_cache_dir = _os.environ.get(
    "SQLRS_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/sqlrs_tpu_xla")
)
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from sqlrs_tpu.errors import (  # noqa: E402
    BinderError,
    CatalogError,
    ExecutorError,
    ParserError,
    SqlrsError,
    TypeError_,
)
from sqlrs_tpu.session.database import Database  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Database",
    "SqlrsError",
    "ParserError",
    "BinderError",
    "CatalogError",
    "ExecutorError",
    "TypeError_",
]
