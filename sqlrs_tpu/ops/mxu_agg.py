"""MXU grouped aggregation: one-hot matmul segment-sum for dense keys.

Every hot kernel in the engine is sort/VPU-formulated because arbitrary
scatters are catastrophically slow on this generation (12-40M elem/s,
CLAUDE.md). The MXU offers a third formulation for DENSE group domains:
decompose gid = hi*K + lo and accumulate the outer product

    S[hi, lo] += w(row)        ==       S += A_hi^T  @  W_lo

where A_hi is the (B, GH) one-hot of hi and W_lo the (B, K) one-hot of lo
scaled by the row's weight — a genuine (GH x B) @ (B x K) matmul per row
block, i.e. the classic two-level one-hot segment-sum. Total MXU work is
N*G MACs per channel; at G = 64K and 33.5M rows that is ~4.4 TFLOP/channel
— ~11 ms at v5e bf16 peak, vs the 152 ms sort-based headline. The catch is
operand *materialization*: XLA builds the one-hots in HBM (~KBs per row of
traffic, HBM-bound), so the XLA variant exists only as the comparison
point; the Pallas kernel generates both one-hots in VMEM (HBM traffic =
keys + values only) and is the real candidate.

Exactness: the MXU multiplies bf16 (8-bit mantissa) into f32 partials.
Values are decomposed into 8-bit limbs (exact in bf16); each row block of
B=2048 rows contributes <= 2^19 per output cell (exact in f32); a
carry-split pair of f32 accumulators (acc_hi * 4096 + acc_lo, re-normalized
every chunk) holds totals up to 2^33 exactly; the final combine runs in
float64 on the host side of the program. Counts ride as a weight-1 channel.
All channels share one contraction: W stacks (K * n_channels) columns.

The reference's grouped aggregation is a row-at-a-time hash loop
(/root/reference/src/executor/aggregate/hash_agg.rs:32); this formulation
has no reference analogue — it exists because the MXU is the TPU's
dominant compute unit and dense star-schema group domains (surrogate keys)
make one-hot construction trivial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_LO = 256            # lanes of the lo one-hot (multiple of 128)
BLK = 2048            # rows per matmul (contraction dim)
RB_PER_CHUNK = 16     # row blocks per carry-renormalization (exactness)
CARRY = 4096.0        # acc = acc_hi * CARRY + acc_lo


def _plan(n_groups: int, val_bits: int):
    gh = -(-n_groups // K_LO)
    gh = max(16, ((gh + 15) // 16) * 16)  # bf16 sublane alignment
    nlimbs = max(1, -(-val_bits // 8))
    nch = 1 + nlimbs  # count + value limbs
    return gh, nlimbs, nch


def _wide_cols(nch: int):
    return K_LO * nch


def _mxu_kernel(k_ref, v_ref, out_lo_ref, out_hi_ref, acc_lo, acc_hi,
                *, gh: int, nlimbs: int, n_groups: int, nchunks: int):
    """One grid step = one chunk of RB_PER_CHUNK x BLK rows.

    Scratch accumulators persist across the sequential TPU grid; each chunk
    ends with a carry renormalization keeping acc_lo < 4096 + 2^23 (exact
    f32), acc_hi < 2^21. The final step flushes both to HBM."""
    c = pl.program_id(0)

    @pl.when(c == np.int32(0))
    def _init():
        acc_lo[:] = jnp.zeros_like(acc_lo)
        acc_hi[:] = jnp.zeros_like(acc_hi)

    # np.int32/np.float32 consts: global x64 turns bare literals into
    # int64/f64 inside Mosaic kernels (CLAUDE.md round-2 trap)
    zero = np.int32(0)
    klo = np.int32(K_LO)
    ng = np.int32(n_groups)
    for rb in range(RB_PER_CHUNK):
        kb = k_ref[pl.ds(rb, 1), :]                      # (1, B) int32
        vb = v_ref[pl.ds(rb, 1), :]                      # (1, B) int32
        inr = (kb >= zero) & (kb < ng)                   # misses masked
        gid = jnp.where(inr, kb, zero)
        hi = gid // klo                                  # (1, B)
        lo = gid % klo
        # one-hots generated IN VMEM — no HBM materialization
        a_t = (
            lax.broadcasted_iota(jnp.int32, (gh, BLK), 0) == hi
        ).astype(jnp.bfloat16)                           # (GH, B)
        l_t = (
            lax.broadcasted_iota(jnp.int32, (K_LO, BLK), 0) == lo
        )                                                # (K, B) bool
        w0 = inr.astype(jnp.bfloat16)                    # count weights
        dn = (((1,), (1,)), ((), ()))                    # contract over B
        parts = [
            lax.dot_general(
                a_t, l_t.astype(jnp.bfloat16) * w0,
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        ]
        for j in range(nlimbs):
            limb = (
                (vb >> np.int32(8 * j)) & np.int32(255)
            ).astype(jnp.bfloat16) * w0
            parts.append(
                lax.dot_general(
                    a_t, l_t.astype(jnp.bfloat16) * limb,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
            )
        acc_lo[:] = acc_lo[:] + jnp.concatenate(parts, axis=1)

    # carry renormalization: keep acc_lo exactly representable
    q = jnp.floor(acc_lo[:] * np.float32(1.0 / CARRY))
    acc_hi[:] = acc_hi[:] + q
    acc_lo[:] = acc_lo[:] - q * np.float32(CARRY)

    @pl.when(c == np.int32(nchunks - 1))
    def _flush():
        out_lo_ref[:] = acc_lo[:]
        out_hi_ref[:] = acc_hi[:]


MXU_MAX_GROUPS = 1 << 16   # measured: 1.94x vs sort at 2^16, 3.2x at 2^12
MXU_MAX_VAL_BITS = 24      # 3 exact bf16 limbs


def mxu_interpret_flag() -> bool:
    """SQLRS_TPU_MXU=interpret runs the kernel through the Pallas
    interpreter — how the CPU test tier exercises the selection path."""
    import os

    return os.environ.get("SQLRS_TPU_MXU", "auto") == "interpret"


def mxu_eligible(n_groups: int, val_max, val_min, dense: bool) -> bool:
    """Auto-selection guard shared by make_join_groupby and the fused
    route: dense dim domain, non-negative int values that fit 3 limbs,
    a group count where the measured MXU win holds (BASELINE.md), and a
    real TPU backend (SQLRS_TPU_MXU=0 disables; =interpret allows CPU via
    the Pallas interpreter for differential tests)."""
    import os

    mode = os.environ.get("SQLRS_TPU_MXU", "auto")
    if mode == "0":
        return False
    if mode != "interpret":
        import jax

        if "tpu" not in jax.devices()[0].device_kind.lower():
            return False
    return (
        dense
        and val_max is not None
        and 0 <= int(val_max) < (1 << MXU_MAX_VAL_BITS)
        and (val_min is None or int(val_min) >= 0)
        and 0 < n_groups <= MXU_MAX_GROUPS
    )


@partial(
    jax.jit, static_argnames=("n_groups", "val_bits", "interpret", "with_perm")
)
def mxu_groupby_dense(keys, vals, n_groups: int, val_bits: int,
                      interpret: bool = False, key_min=None, dim_keys=None,
                      with_perm: bool = False):
    """sum(v), count(*) grouped by key for keys in [key_min,
    key_min + n_groups) (misses = any key outside that range). ONE Pallas
    program; exact int64 results. Requires 0 <= v < 2^val_bits,
    val_bits <= 24. dim_keys (with_perm=True) scatters the gid-ordered
    outputs to dim-row order, mirroring join_groupby_direct's contract —
    the argsort runs INSIDE this program (an eager argsort would cost one
    extra ~28 ms relay dispatch per call)."""
    n = keys.shape[0]
    gh, nlimbs, nch = _plan(n_groups, val_bits)
    chunk = RB_PER_CHUNK * BLK
    pad = (-n) % chunk
    if key_min is not None:
        # rebase in int64 FIRST (an int32 cast of far-away keys could wrap
        # into [0, G) as a false hit), then mask to the kernel's miss value
        k64 = keys.astype(jnp.int64) - key_min
        inr = (k64 >= 0) & (k64 < n_groups)
        k32 = jnp.where(inr, k64, jnp.int64(-1)).astype(jnp.int32)
    else:
        k32 = keys.astype(jnp.int32)
    v32 = vals.astype(jnp.int32)
    if pad:
        k32 = jnp.concatenate([k32, jnp.full((pad,), -1, jnp.int32)])
        v32 = jnp.concatenate([v32, jnp.zeros((pad,), jnp.int32)])
    nchunks = (n + pad) // chunk
    k2 = k32.reshape(nchunks * RB_PER_CHUNK, BLK)
    v2 = v32.reshape(nchunks * RB_PER_CHUNK, BLK)
    wide = _wide_cols(nch)
    out_lo, out_hi = pl.pallas_call(
        partial(
            _mxu_kernel, gh=gh, nlimbs=nlimbs, n_groups=n_groups,
            nchunks=nchunks,
        ),
        grid=(nchunks,),
        in_specs=[
            # np.int32 consts in index maps: bare literals become int64
            # under global x64 and Mosaic rejects the mixed-width tuple
            pl.BlockSpec(
                (RB_PER_CHUNK, BLK), lambda c: (c, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RB_PER_CHUNK, BLK), lambda c: (c, np.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((gh, wide),
                         lambda c: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, wide),
                         lambda c: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((gh, wide), jnp.float32),
            jax.ShapeDtypeStruct((gh, wide), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((gh, wide), jnp.float32),
            pltpu.VMEM((gh, wide), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * gh * K_LO * nch,
            bytes_accessed=(n + pad) * 8 + 2 * gh * wide * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(k2, v2)
    total = out_hi.astype(jnp.float64) * CARRY + out_lo.astype(jnp.float64)
    chans = total.reshape(gh, nch, K_LO).transpose(1, 0, 2).reshape(
        nch, gh * K_LO
    )[:, :n_groups]
    counts = chans[0].astype(jnp.int64)
    sums = jnp.zeros((n_groups,), jnp.int64)
    for j in range(nlimbs):
        sums = sums + (chans[1 + j].astype(jnp.int64) << (8 * j))
    if with_perm:
        dim_perm = jnp.argsort(dim_keys)
        sums = jnp.zeros((n_groups,), jnp.int64).at[dim_perm].set(sums)
        counts = jnp.zeros((n_groups,), jnp.int64).at[dim_perm].set(counts)
    return sums, counts


@partial(jax.jit, static_argnames=("n_groups", "val_bits", "block"))
def mxu_groupby_dense_xla(keys, vals, n_groups: int, val_bits: int,
                          block: int = 8192):
    """The pure-XLA formulation of the same algorithm (lax.scan of one-hot
    dot_generals, float64 carry). XLA materializes the one-hot operands in
    HBM, so this is expected to be HBM-bound at ~KB/row — kept as the
    measured comparison point for the Pallas kernel (BASELINE.md)."""
    n = keys.shape[0]
    gh = -(-n_groups // K_LO)
    nlimbs = max(1, -(-val_bits // 8))
    pad = (-n) % block
    k32 = keys.astype(jnp.int32)
    v32 = vals.astype(jnp.int32)
    if pad:
        k32 = jnp.concatenate([k32, jnp.full((pad,), -1, jnp.int32)])
        v32 = jnp.concatenate([v32, jnp.zeros((pad,), jnp.int32)])
    nb = (n + pad) // block
    k2 = k32.reshape(nb, block)
    v2 = v32.reshape(nb, block)
    nch = 1 + nlimbs
    dn = (((1,), (1,)), ((), ()))

    def step(carry, xs):
        kb, vb = xs
        inr = (kb >= 0) & (kb < n_groups)
        gid = jnp.where(inr, kb, 0)
        hi = gid // K_LO
        lo = gid % K_LO
        a_t = (
            lax.broadcasted_iota(jnp.int32, (gh, block), 0) == hi[None, :]
        ).astype(jnp.bfloat16)
        l_t = lax.broadcasted_iota(jnp.int32, (K_LO, block), 0) == lo[None, :]
        w0 = inr.astype(jnp.bfloat16)
        parts = [
            lax.dot_general(
                a_t, l_t.astype(jnp.bfloat16) * w0[None, :],
                dimension_numbers=dn, preferred_element_type=jnp.float32,
            )
        ]
        for j in range(nlimbs):
            limb = ((vb >> (8 * j)) & 255).astype(jnp.bfloat16) * w0
            parts.append(
                lax.dot_general(
                    a_t, l_t.astype(jnp.bfloat16) * limb[None, :],
                    dimension_numbers=dn, preferred_element_type=jnp.float32,
                )
            )
        return carry + jnp.stack(parts).astype(jnp.float64), None

    carry0 = jnp.zeros((nch, gh, K_LO), jnp.float64)
    carry, _ = lax.scan(step, carry0, (k2, v2))
    chans = carry.reshape(nch, gh * K_LO)[:, :n_groups]
    counts = chans[0].astype(jnp.int64)
    sums = jnp.zeros((n_groups,), jnp.int64)
    for j in range(nlimbs):
        sums = sums + (chans[1 + j].astype(jnp.int64) << (8 * j))
    return sums, counts
