"""Device sort: multi-key, per-key direction, arrow-compatible null placement.

Replaces the reference's materialize-all + `lexsort_to_indices` ORDER BY
(reference src/executor/order.rs:14-38). Keys are encoded to orderable device
arrays (strings via dictionary lex-ranks) and sorted with successive stable
argsorts from least- to most-significant key — all on device. NULLs sort
first in both directions (arrow SortOptions default the reference inherits).

Rows ride the sort as payload operands (sort_rows) instead of being gathered
by a permutation afterwards — TPU gathers run at 12-40M elem/s (CLAUDE.md
measurements) while sort payloads stream at memory-like speed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sqlrs_tpu.data import Column
from sqlrs_tpu.data.strings import GLOBAL_STRINGS
from sqlrs_tpu.errors import ExecutorError
from sqlrs_tpu.types import LogicalType


def orderable_key(col: Column):
    """(key, valid): key is an int64/float64 device array monotone in the
    column's sort order."""
    t = col.type
    if t == LogicalType.VARCHAR:
        ranks = GLOBAL_STRINGS.ranks()
        if len(ranks) == 0:
            return jnp.zeros(len(col), dtype=jnp.int64), col.valid
        r = jnp.asarray(ranks)
        codes = jnp.clip(col.data, 0, len(ranks) - 1)
        return r[codes].astype(jnp.int64), col.valid
    if t in (LogicalType.FLOAT, LogicalType.DOUBLE):
        return col.data.astype(jnp.float64), col.valid
    if t == LogicalType.BOOLEAN:
        return col.data.astype(jnp.int64), col.valid
    if t == LogicalType.UBIGINT:
        # order-preserving shift into signed range
        return (col.data - jnp.uint64(2**63)).astype(jnp.int64), col.valid
    if t.is_numeric() or t in (LogicalType.DATE, LogicalType.INTERVAL):
        return col.data.astype(jnp.int64), col.valid
    raise ExecutorError(f"type {t} is not orderable")


def _directed_key(col: Column, asc: bool):
    """Encode so an ASCENDING sort realizes the requested direction with
    NULLs first: nulls map to the minimum sentinel, descending keys negate."""
    key, valid = orderable_key(col)
    if not asc:
        key = -key
    if jnp.issubdtype(key.dtype, jnp.floating):
        null_val = -jnp.inf
    else:
        null_val = np.iinfo(np.int64).min
    return jnp.where(valid, key, null_val)


def compact_indices(keep: Column, count: int):
    """Device-resident compaction permutation: ONE 2-operand stable sort by
    the drop flag, sliced to `count`. Pairs with per-column gathers for wide
    tables, where a full payload-carrying sort is heavier to compile and run
    (measured: 21-operand mixed stable sort ~5s at 8.4M on v5e vs ~0.25s for
    2 operands + ~0.34s/column gathers)."""
    import jax

    drop = jnp.logical_not(jnp.logical_and(keep.data, keep.valid))
    n = drop.shape[0]
    _, perm = jax.lax.sort(
        (drop.astype(jnp.int32), jnp.arange(n, dtype=jnp.int64)),
        num_keys=1,
        is_stable=True,
    )
    return perm[:count]


def sort_indices(items: list[tuple[Column, bool]]):
    """Permutation sorting rows by the given (column, ascending) keys;
    stable, NULLs first. ONE variadic lax.sort carrying the row index as
    payload — no per-key argsort/gather passes (TPU gathers are slow,
    CLAUDE.md measurements)."""
    import jax

    n = len(items[0][0])
    ops = [_directed_key(col, asc) for col, asc in items]
    ops.append(jnp.arange(n, dtype=jnp.int64))
    out = jax.lax.sort(tuple(ops), num_keys=len(items), is_stable=True)
    return out[-1]


def sort_rows(items: list[tuple[Column, bool]], columns: list[Column]):
    """Sort whole rows: ONE variadic lax.sort carrying every output column
    (data + validity) as payload — no post-sort permutation gathers."""
    import jax

    keys = [_directed_key(col, asc) for col, asc in items]
    num_keys = len(keys)
    payloads: list = []
    for c in columns:
        payloads.append(
            c.data.astype(jnp.int32) if c.data.dtype == jnp.bool_ else c.data
        )
        payloads.append(c.valid.astype(jnp.int32))
    out = jax.lax.sort(tuple(keys + payloads), num_keys=num_keys, is_stable=True)
    res = []
    p = num_keys
    for c in columns:
        data, valid = out[p], out[p + 1]
        p += 2
        if c.data.dtype == jnp.bool_:
            data = data.astype(jnp.bool_)
        res.append(Column(c.type, data, valid > 0))
    return res


def compact_rows(keep: Column, columns: list[Column], count: int):
    """Filter compaction as ONE stable variadic sort by the drop flag
    (kept rows first, original order preserved), sliced to `count` — no
    host-side index materialization and no N-sized gathers (TPU gathers run
    at 12-40M elem/s; sort payloads stream)."""
    import jax

    drop = jnp.logical_not(jnp.logical_and(keep.data, keep.valid))
    payloads: list = []
    for c in columns:
        payloads.append(
            c.data.astype(jnp.int32) if c.data.dtype == jnp.bool_ else c.data
        )
        payloads.append(c.valid.astype(jnp.int32))
    out = jax.lax.sort(
        tuple([drop.astype(jnp.int32)] + payloads), num_keys=1, is_stable=True
    )
    res = []
    p = 1
    for c in columns:
        data, valid = out[p][:count], out[p + 1][:count]
        p += 2
        if c.data.dtype == jnp.bool_:
            data = data.astype(jnp.bool_)
        res.append(Column(c.type, data, valid > 0))
    return res
