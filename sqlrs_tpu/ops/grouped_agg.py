"""Sorted-run grouped aggregation: the TPU-fast general GROUP BY.

The general-executor counterpart of ops/pipelines.join_groupby_sorted,
handling arbitrary key columns (any logical type, NULL keys group together),
multiple aggregates, and the reference's first-appearance group output order
(reference src/executor/aggregate/hash_agg.rs:85-111) — with ZERO N-sized
random accesses:

  one variadic lax.sort carrying (key encodings, validity flags, raw key
  payloads, aggregate inputs, row index) → run boundaries by adjacent diff →
  per-run sum/count as cumsum differences at run ends → per-run min/max via
  segmented associative scans → all remaining work at R = #groups size.

Measured on TPU v5e: per-element scatter/gather (the jax.ops.segment_* path)
runs at 12-40M elem/s; this formulation is sort-bound at ~100M rows/s.

DISTINCT aggregates take the legacy dedup path (rare, and they need a second
value-keyed sort anyway).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sqlrs_tpu.data import Column
from sqlrs_tpu.data.strings import NULL_CODE
from sqlrs_tpu.errors import ExecutorError
from sqlrs_tpu.ops.hash_table import next_pow2
from sqlrs_tpu.ops.sort import orderable_key
from sqlrs_tpu.types import LogicalType, numpy_dtype_for


def _seg_scan_best(values, payload, new_run, want_min: bool):
    """Segmented prefix min/max with payload; returns per-position running
    (best value, best payload) that resets at run starts."""
    flags = new_run

    def combine(a, b):
        fa, va, pa = a
        fb, vb, pb = b
        if want_min:
            b_wins = fb | (vb < va)
        else:
            b_wins = fb | (vb > va)
        return (
            jnp.logical_or(fa, fb),
            jnp.where(b_wins, vb, va),
            jnp.where(b_wins, pb, pa),
        )

    _, bv, bp = lax.associative_scan(combine, (flags, values, payload))
    return bv, bp


def sorted_grouped_aggregate(
    key_cols: list[Column],
    agg_specs: list[tuple[str, Optional[Column], LogicalType]],
):
    """agg_specs: (function_name, input column or None for count(*),
    result logical type). Returns (group_cols, agg_cols, n_groups) with
    groups in first-appearance order. No DISTINCT here (caller gates)."""
    n = len(key_cols[0])
    if n == 0:
        return (
            [Column.from_numpy(c.type, np.zeros(0, numpy_dtype_for(c.type))) for c in key_cols],
            [
                Column.from_numpy(t, np.zeros(0, numpy_dtype_for(t)))
                for _, _, t in agg_specs
            ],
            0,
        )

    # ---- one variadic sort ------------------------------------------------
    sort_keys = []
    for c in key_cols:
        key, valid = orderable_key(c)
        sort_keys.append(valid.astype(jnp.int32))
        sort_keys.append(jnp.where(valid, key, 0))
    num_keys = len(sort_keys)
    payloads: list = [jnp.arange(n, dtype=jnp.int32)]  # row index (rep order)
    for c in key_cols:  # raw key data + validity for output reconstruction
        payloads.append(_sortable(c.data))
        payloads.append(c.valid.astype(jnp.int32))
    agg_payload_ix = []
    for name, col, _ in agg_specs:
        if col is None:
            agg_payload_ix.append(None)
            continue
        agg_payload_ix.append(len(payloads))
        payloads.append(_sortable(col.data))
        payloads.append(col.valid.astype(jnp.int32))
        if col.type == LogicalType.VARCHAR and name in ("min", "max"):
            # ordered string aggs need the rank view co-sorted too
            rank, _ = orderable_key(col)
            payloads.append(rank)

    out = lax.sort(tuple(sort_keys + payloads), num_keys=num_keys)
    s_keys = out[:num_keys]
    s_payloads = list(out[num_keys:])

    # ---- run boundaries -----------------------------------------------------
    new_run = jnp.zeros(n, dtype=jnp.bool_).at[0].set(True)
    for arr in s_keys:
        d = arr[1:] != arr[:-1]
        new_run = new_run.at[1:].set(jnp.logical_or(new_run[1:], d))
    rid = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    n_groups = int(rid[-1]) + 1  # pipeline-breaker sync
    r_cap = next_pow2(max(n_groups, 8))

    r = jnp.arange(r_cap, dtype=jnp.int32)
    ends = jnp.searchsorted(rid, r, side="right")
    prev_end = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    live = r < n_groups
    last = jnp.clip(ends - 1, 0, n - 1)

    def run_sum(arr):
        cs = jnp.cumsum(arr)
        base = jnp.where(prev_end > 0, cs[jnp.clip(prev_end - 1, 0, n - 1)], 0)
        return cs[last] - base

    # ---- first-appearance order ---------------------------------------------
    row_idx = s_payloads[0]
    rep_v, _ = _seg_scan_best(row_idx, row_idx, new_run, want_min=True)
    rep = jnp.where(live, rep_v[last], np.iinfo(np.int32).max)
    order_of_run = jnp.argsort(jnp.argsort(rep))  # rank in first-appearance order

    def place(vals_runs, dtype=None):
        """Permute run-indexed array into first-appearance group order."""
        out = jnp.zeros((r_cap,), vals_runs.dtype if dtype is None else dtype)
        return out.at[order_of_run].set(vals_runs)[:n_groups]

    # ---- group key output columns ---------------------------------------------
    group_cols = []
    p = 1
    for c in key_cols:
        raw = s_payloads[p]
        valid = s_payloads[p + 1]
        p += 2
        data = place(raw[last])
        v = place((valid[last] > 0).astype(jnp.int32)) > 0
        group_cols.append(Column(c.type, _unsortable(data, c.type), v))

    # ---- aggregates ---------------------------------------------------------------
    agg_cols = []
    for spec_i, (name, col, rt) in enumerate(agg_specs):
        if col is None:
            cnt = (ends - prev_end).astype(jnp.int64)
            agg_cols.append(
                Column(LogicalType.BIGINT, place(jnp.where(live, cnt, 0)),
                       jnp.ones(n_groups, jnp.bool_))
            )
            continue
        base_ix = agg_payload_ix[spec_i]
        data = s_payloads[base_ix]
        valid = s_payloads[base_ix + 1] > 0
        counts = run_sum(valid.astype(jnp.int64))
        has_any = counts > 0
        if name == "count":
            agg_cols.append(
                Column(LogicalType.BIGINT, place(jnp.where(live, counts, 0)),
                       jnp.ones(n_groups, jnp.bool_))
            )
            continue
        if name in ("sum", "avg"):
            acc_t = LogicalType.DOUBLE if name == "avg" else rt
            vals = _unsortable(data, col.type).astype(numpy_dtype_for(acc_t))
            s = run_sum(jnp.where(valid, vals, 0))
            if name == "avg":
                s = s / jnp.maximum(counts, 1).astype(jnp.float64)
            agg_cols.append(
                Column(rt, place(s), place(has_any.astype(jnp.int32)) > 0)
            )
            continue
        if name in ("min", "max"):
            if col.type == LogicalType.VARCHAR:
                rank = s_payloads[base_ix + 2]
                big = jnp.iinfo(jnp.int64).max
                v = jnp.where(valid, rank, big if name == "min" else -big)
                _, best_code = _seg_scan_best(v, data, new_run, name == "min")
                out_data = place(best_code[last])
            else:
                info_dt = numpy_dtype_for(col.type)
                if col.type.is_float():
                    sentinel = np.inf if name == "min" else -np.inf
                else:
                    ii = np.iinfo(info_dt)
                    sentinel = ii.max if name == "min" else ii.min
                vals = _unsortable(data, col.type)
                v = jnp.where(valid, vals, jnp.asarray(sentinel, vals.dtype))
                best, _ = _seg_scan_best(v, v, new_run, name == "min")
                out_data = place(best[last])
            agg_cols.append(
                Column(rt, out_data.astype(numpy_dtype_for(rt)),
                       place(has_any.astype(jnp.int32)) > 0)
            )
            continue
        raise ExecutorError(f"unknown aggregate {name}")

    return group_cols, agg_cols, n_groups


def partial_grouped_fixed(alive, row_idx, keys, aggs, g_cap: int):
    """Shard-local FIXED-CAPACITY partial GROUP BY — the shard_map-safe core
    of the distributed aggregation (static shapes only, no host sync; the
    capacity-overflow flag drives the caller's bucketed-recompile retry,
    SURVEY.md §7 "fixed-capacity batches + valid-count scalars").

    Same sorted-run formulation as sorted_grouped_aggregate, but runs land in
    g_cap-sized output buffers instead of a data-dependent allocation.

    alive:   bool[n] live-row mask (dead rows sort last, never form runs)
    row_idx: int64[n] global row ids (min per run = first-appearance key)
    keys:    list of (orderable int array, valid bool, raw data array)
    aggs:    list of ("count_star" | "count" | "sum" | "avg" | "min" | "max"
             | "vmin" | "vmax", data, valid, rank_or_None, out_dtype)
             (data/valid/rank are None for count_star; rank only for v*)

    Returns (key_outs, first_row, live, states, n_runs, overflow) where
    key_outs = [(data[g_cap], valid[g_cap])], states = per agg dict of
    g_cap-sized partial-state arrays.
    """
    n = alive.shape[0]
    dead = jnp.logical_not(alive).astype(jnp.int32)
    sort_keys: list = [dead]
    for orderable, valid, _raw in keys:
        sort_keys.append(valid.astype(jnp.int32))
        sort_keys.append(jnp.where(valid, orderable, 0))
    num_keys = len(sort_keys)

    payloads: list = [row_idx, alive.astype(jnp.int32)]
    key_pay_ix = []
    for _orderable, valid, raw in keys:
        key_pay_ix.append(len(payloads))
        payloads.append(_sortable(raw))
        payloads.append(valid.astype(jnp.int32))
    agg_pay_ix = []
    for kind, data, valid, rank, _dt in aggs:
        if data is None:
            agg_pay_ix.append(None)
            continue
        agg_pay_ix.append(len(payloads))
        payloads.append(_sortable(data))
        payloads.append(valid.astype(jnp.int32))
        if rank is not None:
            payloads.append(rank)

    out = lax.sort(tuple(sort_keys + payloads), num_keys=num_keys)
    s_keys = out[:num_keys]
    s_pay = list(out[num_keys:])
    alive_b = s_pay[1] > 0
    row_s = s_pay[0]

    new_run = jnp.zeros(n, dtype=jnp.bool_).at[0].set(True)
    for arr in s_keys[1:]:  # skip the dead flag: runs only split on key fields
        d = arr[1:] != arr[:-1]
        new_run = new_run.at[1:].set(jnp.logical_or(new_run[1:], d))
    new_run = new_run & alive_b
    rid = jnp.cumsum(new_run.astype(jnp.int64)) - 1
    n_runs = jnp.sum(new_run.astype(jnp.int64))
    overflow = n_runs > g_cap
    trash = jnp.int64(g_cap)
    rid_c = jnp.where(alive_b & (rid >= 0), jnp.minimum(rid, trash), trash)
    route_start = jnp.where(new_run & (rid < g_cap), rid, trash)

    big64 = jnp.int64(jnp.iinfo(jnp.int64).max)
    first_row = jnp.full((g_cap + 1,), big64).at[rid_c].min(
        jnp.where(alive_b, row_s, big64)
    )[:g_cap]

    key_outs = []
    for (o, v, raw), ix in zip(keys, key_pay_ix):
        raw_s, valid_s = s_pay[ix], s_pay[ix + 1]
        kd = jnp.zeros((g_cap + 1,), raw_s.dtype).at[route_start].set(raw_s)[:g_cap]
        kv = jnp.zeros((g_cap + 1,), jnp.int32).at[route_start].set(valid_s)[:g_cap] > 0
        key_outs.append((kd, kv))

    states = []
    ones = jnp.ones(n, dtype=jnp.int64)
    for (kind, data, valid, rank, out_dt), ix in zip(aggs, agg_pay_ix):
        if kind == "count_star":
            cnt = jnp.zeros((g_cap + 1,), jnp.int64).at[rid_c].add(
                alive_b.astype(jnp.int64)
            )[:g_cap]
            states.append({"cnt": cnt})
            continue
        data_s = s_pay[ix]
        valid_s = (s_pay[ix + 1] > 0) & alive_b
        route_v = jnp.where(valid_s, rid_c, trash)
        cnt = jnp.zeros((g_cap + 1,), jnp.int64).at[route_v].add(ones)[:g_cap]
        if kind == "count":
            states.append({"cnt": cnt})
        elif kind in ("sum", "avg"):
            acc = data_s.astype(out_dt)
            s = jnp.zeros((g_cap + 1,), out_dt).at[route_v].add(
                jnp.where(valid_s, acc, 0)
            )[:g_cap]
            states.append({"cnt": cnt, "sum": s})
        elif kind in ("min", "max"):
            if jnp.issubdtype(data_s.dtype, jnp.floating):
                sent = jnp.inf if kind == "min" else -jnp.inf
            else:
                ii = jnp.iinfo(data_s.dtype)
                sent = ii.max if kind == "min" else ii.min
            v = jnp.where(valid_s, data_s, jnp.asarray(sent, data_s.dtype))
            init = jnp.full((g_cap + 1,), sent, data_s.dtype)
            best = (
                init.at[route_v].min(v) if kind == "min" else init.at[route_v].max(v)
            )[:g_cap]
            states.append({"cnt": cnt, "best": best})
        elif kind in ("vmin", "vmax"):
            # dictionary-code min/max by rank: pack (rank << 32 | code) so a
            # single int64 min/max carries the winning code along
            rank_s = s_pay[ix + 2]
            code_u = data_s.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
            packed = (rank_s.astype(jnp.int64) << 32) | code_u
            if kind == "vmin":
                sent = big64
                v = jnp.where(valid_s, packed, sent)
                best = jnp.full((g_cap + 1,), sent).at[route_v].min(v)[:g_cap]
            else:
                sent = -big64
                v = jnp.where(valid_s, packed, sent)
                best = jnp.full((g_cap + 1,), sent).at[route_v].max(v)[:g_cap]
            states.append({"cnt": cnt, "best": (best & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)})
        else:
            raise ExecutorError(f"unknown partial aggregate kind {kind}")

    live = jnp.arange(g_cap, dtype=jnp.int64) < jnp.minimum(n_runs, trash)
    return key_outs, first_row, live, states, n_runs, overflow


def _sortable(data):
    """lax.sort payload-friendly view (bools -> int32)."""
    if data.dtype == jnp.bool_:
        return data.astype(jnp.int32)
    return data


def _unsortable(data, t: LogicalType):
    dt = numpy_dtype_for(t)
    if data.dtype != dt:
        return data.astype(dt)
    return data
