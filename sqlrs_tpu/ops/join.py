"""Equi-join index-pair generation.

Replaces the reference's build/probe HashMap<u64, Vec<row>> hash join
(reference src/executor/join/hash_join.rs:146-292) with key-id assignment +
sorted search: both sides' key columns are mapped to shared integer key ids
(exact equality — unlike the reference, which matches on 64-bit hash only,
TODO at hash_join.rs:221-224), the build side is sorted by key id, and each
probe row finds its match run via binary search. Match emission order equals
the reference's: probe (right) row outer, build (left) rows in insertion
order.

NULL join keys never match (SQL equality semantics).

The index-pair expansion is currently computed host-side with numpy (the
counts prefix-sum and gather are cheap relative to materialization); the
Pallas open-addressing table (ops/hash_table.py) is the on-device scale path
used by the benchmark pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sqlrs_tpu.data import Column
from sqlrs_tpu.ops.grouping import group_ids


def join_key_ids(
    left_keys: list[Column], right_keys: list[Column]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared key ids across both sides + per-row all-keys-valid masks."""
    nl = len(left_keys[0])
    combined = [
        Column(
            l.type,
            jnp.concatenate([l.data, r.data.astype(l.data.dtype)]),
            jnp.concatenate([l.valid, r.valid]),
        )
        for l, r in zip(left_keys, right_keys)
    ]
    gid, _ = group_ids(combined)
    gid = np.asarray(gid)
    lvalid = np.ones(nl, dtype=np.bool_)
    rvalid = np.ones(len(right_keys[0]), dtype=np.bool_)
    for l, r in zip(left_keys, right_keys):
        lvalid &= l.valid_np()
        rvalid &= r.valid_np()
    return gid[:nl], gid[nl:], lvalid, rvalid


def equi_join_pairs(
    left_keys: list[Column], right_keys: list[Column]
) -> tuple[np.ndarray, np.ndarray]:
    """All matching (left_row, right_row) pairs, ordered by (right_row,
    left_row) to reproduce the reference's probe-order emission
    (hash_join.rs:207-250)."""
    lg, rg, lvalid, rvalid = join_key_ids(left_keys, right_keys)
    l_rows = np.nonzero(lvalid)[0]
    lg = lg[l_rows]
    order = np.argsort(lg, kind="stable")  # stable: insertion order within key
    lg_sorted = lg[order]
    l_rows_sorted = l_rows[order]

    probe_g = np.where(rvalid, rg, -1)
    starts = np.searchsorted(lg_sorted, probe_g, side="left")
    ends = np.searchsorted(lg_sorted, probe_g, side="right")
    counts = np.where(rvalid, ends - starts, 0)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    r_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    base = np.repeat(np.cumsum(counts) - counts, counts)
    pos = np.arange(total, dtype=np.int64) - base + np.repeat(starts, counts)
    l_idx = l_rows_sorted[pos]
    return l_idx.astype(np.int64), r_idx
