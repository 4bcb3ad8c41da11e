"""Pallas TPU kernels for the hot non-sort stages of the headline pipeline.

Mosaic on this hardware generation cannot lower arbitrary per-element
gathers (`ref[idx_array]` → "Cannot do int indexing on TPU"; the only
supported gather is lane-local take_along_axis — CLAUDE.md), so kernels
here use the ONE dynamic-access shape Pallas does support well: a
scalar-prefetched BLOCK index per grid step. The block index array is a
`num_scalar_prefetch` argument, so `BlockSpec.index_map` can route each
grid step's DMA to a data-dependent 8×128 tile of the sorted array (the
minimum int32 sublane granule), and the Pallas pipeline double-buffers
those tile fetches automatically; the kernel selects the one row it needs
with a scalar dynamic slice.

Pallas alternatives to the XLA formulation of
ops/pipelines.join_groupby_direct's per-query stages:

  - row_rank_ge:   rank of a query within its candidate block
                   (XLA: rows = sp2d[clip(c-1)]; sum(rows >= q[:,None]))
  - masked_row_sum: in-block masked prefix sum at a query position
                   (XLA: rows = v2d[clip(b)]; sum(where(lane < rem, ...)))

MEASURED RESULT (TPU v5e, 2026-08, 131072 queries over a 33.5M-element
sorted array): XLA's native gather HLO runs the rank stage in 26.3 ms;
this Pallas pipeline takes 58.0 ms (latency-bound: 131K sequential 4 KB
tile DMAs at ~0.44 us each — decent per-DMA latency, but the gather HLO
streams at memory bandwidth). A 4-queries-per-step variant with 4 DMA
pipelines measured 124 ms (4x tile traffic, no latency win). The XLA
formulation therefore remains the production path; these kernels stay as
the measured comparison point and as the proof that data-dependent block
DMA IS expressible on this generation (scalar-prefetched index maps),
which round 1 believed impossible.

int32 only (the pack32 fast path): Mosaic's int64 vector support on v5e is
partial, and the packed pipeline is int32 end-to-end anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

_SUB = 8  # int32 sublane granule: row r lives in tile r // 8, row r % 8
# scalar-prefetch operands live in SMEM (1 MB): two int32 arrays per call
# caps the per-call query count; larger batches chunk into several calls
_MAX_Q = 32768
# arithmetic on grid/scalar indices must use an int32 NUMPY scalar: under
# x64 a Python literal promotes the op to int64 (which Mosaic cannot
# lower), and a jnp constant would be a forbidden index-map capture
_SUB32 = np.int32(_SUB)


def _rank_kernel(b_ref, q_ref, tile_ref, out_ref):
    i = pl.program_id(0)
    q = q_ref[i]
    # pl.ds row slice: a bare integer row index would mix an int64 literal
    # into the slice under x64, which Mosaic cannot lower
    row = tile_ref[pl.ds(b_ref[i] % _SUB32, 1), :]
    # keepdims (1,1) output: a SCALAR reduction goes through Mosaic's
    # proxy lowering, which re-traces jnp.sum under the global x64 config
    # and manufactures an unsupported int64 convert
    out_ref[pl.ds(i % _SUB32, 1), :] = jnp.sum(
        (row >= q).astype(jnp.int32), axis=1, keepdims=True, dtype=jnp.int32
    )


def _rank_grid_spec(nq_p: int, width: int):
    """One grid step per query: the scalar-prefetched block index routes the
    input tile DMA; 8 consecutive steps share one (8,1) output tile (the
    int32 sublane granule), each writing its own row. Index maps use int32
    constants — an int64 literal (the x64 default) fails Mosaic lowering."""
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block indices, per-query scalar operand
        grid=(nq_p,),
        in_specs=[
            pl.BlockSpec(
                (_SUB, width),
                lambda i, b_ref, s_ref: (b_ref[i] // _SUB32, np.int32(0)),
            ),
        ],
        out_specs=pl.BlockSpec(
            (_SUB, 1),
            lambda i, b_ref, s_ref: (i // _SUB32, np.int32(0)),
        ),
    )


def _chunked(fn, sp2d, block_idx, scalar, interpret):
    n = scalar.shape[0]
    if n <= _MAX_Q:
        return fn(sp2d, block_idx, scalar, interpret)
    outs = []
    for s0 in range(0, n, _MAX_Q):
        outs.append(
            fn(sp2d, block_idx[s0 : s0 + _MAX_Q], scalar[s0 : s0 + _MAX_Q],
               interpret)
        )
    return jnp.concatenate(outs)


def row_rank_ge(sp2d, block_idx, queries, interpret: bool = False):
    return _chunked(_row_rank_ge, sp2d, block_idx, queries, interpret)


def masked_row_sum(v2d, block_idx, rem, interpret: bool = False):
    return _chunked(_masked_row_sum, v2d, block_idx, rem, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_rank_ge(sp2d, block_idx, queries, interpret: bool = False):
    """out[i] = count of lanes in sp2d[block_idx[i]] that are >= queries[i].

    sp2d: (nb, 128) int32 sorted blocks (nb a multiple of 8); block_idx:
    (nq,) int32 pre-clipped to [0, nb); queries: (nq,) int32. The block
    index is scalar-prefetched so each grid step's tile DMA is resolved
    before the body runs."""
    nq = queries.shape[0]
    pad = (-nq) % _SUB
    if pad:
        block_idx = jnp.concatenate([block_idx, jnp.zeros((pad,), block_idx.dtype)])
        queries = jnp.concatenate([queries, jnp.zeros((pad,), queries.dtype)])
    nq_p = nq + pad
    grid_spec = _rank_grid_spec(nq_p, sp2d.shape[1])
    # the engine runs in x64 mode, but Mosaic has no 64-bit support —
    # trace the kernel with x64 off so every literal/index stays 32-bit
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _rank_kernel,
            out_shape=jax.ShapeDtypeStruct((nq_p, 1), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(block_idx.astype(jnp.int32), queries.astype(jnp.int32), sp2d)
    return out[:nq, 0]


def _masked_sum_kernel(b_ref, rem_ref, tile_ref, out_ref):
    i = pl.program_id(0)
    rem = rem_ref[i]
    row = tile_ref[pl.ds(b_ref[i] % _SUB32, 1), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, row.shape[1]), 1)
    out_ref[pl.ds(i % _SUB32, 1), :] = jnp.sum(
        jnp.where(lane < rem, row, 0), axis=1, keepdims=True, dtype=jnp.int32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _masked_row_sum(v2d, block_idx, rem, interpret: bool = False):
    """out[i] = sum of the first rem[i] lanes of v2d[block_idx[i]].

    The in-block half of a prefix sum at an arbitrary position; the caller
    adds the block-prefix table entry."""
    nq = rem.shape[0]
    pad = (-nq) % _SUB
    if pad:
        block_idx = jnp.concatenate([block_idx, jnp.zeros((pad,), block_idx.dtype)])
        rem = jnp.concatenate([rem, jnp.zeros((pad,), rem.dtype)])
    nq_p = nq + pad
    grid_spec = _rank_grid_spec(nq_p, v2d.shape[1])
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _masked_sum_kernel,
            out_shape=jax.ShapeDtypeStruct((nq_p, 1), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(block_idx.astype(jnp.int32), rem.astype(jnp.int32), v2d)
    return out[:nq, 0]
