"""Fused compiled query pipelines (the benchmark / scale path).

Each pipeline is ONE jit program: scan → probe → aggregate with no host
round-trips, so a query is a handful of XLA executions rather than hundreds
of small dispatches. These back `bench.py` and `__graft_entry__.py`; the
general executor routes to them when types allow (int-keyed fact⋈dim +
group-by — the north-star workload).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sqlrs_tpu.ops.hash_table import build_join_table, next_pow2, probe_counts


@partial(jax.jit, static_argnames=("n_groups", "capacity"))
def join_groupby_local(fact_keys, fact_vals, dim_keys, n_groups: int, capacity: int):
    """SELECT dim_row, sum(v), count(*) FROM fact JOIN dim USING(key)
    GROUP BY dim_row — single chip, one fused XLA program.

    Equivalent single-node semantics to the reference's HashJoin→HashAgg
    chain (reference src/executor/join/hash_join.rs + aggregate/hash_agg.rs)
    for unique dim keys, without materializing the join."""
    table, start, bcounts, order = build_join_table(dim_keys, capacity)
    found, _ = probe_counts(table, fact_keys, bcounts, capacity)
    matched = found >= 0
    slot = jnp.maximum(found, 0)
    dim_row = order[jnp.clip(start[slot], 0, order.shape[0] - 1)]
    gid = jnp.where(matched, dim_row, n_groups)
    sums = jnp.zeros((n_groups + 1,), fact_vals.dtype).at[gid].add(
        jnp.where(matched, fact_vals, 0)
    )
    counts = jnp.zeros((n_groups + 1,), jnp.int64).at[gid].add(
        matched.astype(jnp.int64)
    )
    return sums[:n_groups], counts[:n_groups]


def make_join_groupby(n_groups: int):
    capacity = next_pow2(max(2 * n_groups, 16))

    def fn(fact_keys, fact_vals, dim_keys):
        return join_groupby_local(fact_keys, fact_vals, dim_keys, n_groups, capacity)

    return fn
