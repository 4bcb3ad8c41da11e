"""MXU path for the GENERAL grouped aggregation executor.

ops/mxu_agg.py proved the one-hot matmul segment-sum wins 1.9-3.2x over the
packed-sort formulation on v5e (BASELINE.md round 4) — but only the synthetic
bench and the fused route's int-only variant could reach it. This module puts
the MXU under real SQL GROUP BYs (the reference's hottest operator, a
row-at-a-time hash loop at /root/reference/src/executor/aggregate/
hash_agg.rs:32-150), handling what real queries actually have:

  - MULTIPLE aggregates over multiple value columns: every aggregate rides
    the SAME contraction — W stacks K_LO columns per channel (count, one
    channel per 8-bit value limb, one validity channel per NULL-able column).
  - DOUBLE measures via fixed-point detection: a stats pass proves every
    value is a k-dp decimal (k in {0,2,4,6} — TPC-H decimals are 2dp, their
    2-column products 4dp, 3-column 6dp) and the scaled range fits; sums are
    then computed in EXACT integer arithmetic and divided back by 10^k.
    (More exact than the float-ordered general path, whose sums are
    XLA-reduction-ordered; differential tests compare at 1e-12 relative.)
  - SIGNED values via bias: w = scaled - bias (bias = min(scaled, 0)), so
    limbs stay non-negative; sums add back count*bias.
  - MULTI-COLUMN group keys (ints, DATE day-ints, BOOLEAN, VARCHAR dict
    codes) over a small composite domain: gid = sum((code_j - min_j) *
    stride_j), with a reserved NULL slot per NULL-able key. The stats pass
    measures the spans; the path applies when the composite domain G fits
    MXU_AGG_MAX_GROUPS (Q1 is G=4).
  - FIRST-APPEARANCE group order (hash_agg.rs:85-111) without any N-sized
    sort or scatter: the kernel tracks, per group, the first 2048-row block
    where it appears (a (gh, K_LO) running min in VMEM — the count matmul
    for each block is already on hand); the exact first row is then found
    by ONE (G, 2048) gather of each group's first block — G-sized random
    access, the design budget.

Exactness ladder (same as mxu_agg.py, extended): 8-bit limbs are exact in
bf16; a 2048-row block contributes < 2^19 per cell (exact f32); carry-split
f32 accumulators renormalized every 32K rows hold per-limb totals exactly
while acc_hi < 2^24, i.e. n < 2^28 rows; limb totals (< 2^33) assemble in
int64, exact while the true scaled group total < 2^62 (host-guarded via
(smax - bias) * n).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sqlrs_tpu.data import Column
from sqlrs_tpu.types import LogicalType, numpy_dtype_for

K_LO = 256
BLK = 2048
RB_PER_CHUNK = 16
CARRY = 4096.0
BIGF = np.float32(1e9)          # "never seen" marker for first-block scratch

MXU_AGG_MAX_GROUPS = 1024       # composite-domain cap: the first-row
                                # tie-break gathers (G, 2048) key rows
MXU_AGG_MAX_VAL_BITS = 48       # 6 limbs / 2 input words per column
MXU_AGG_MAX_CHANNELS = 32       # bounds MACs: 2*N*gh*K_LO*nch
MXU_AGG_MAX_ROWS = 1 << 28      # carry-split f32 exactness bound
_SCALES = (0, 2, 4, 6)          # decimal scales probed by the stats pass


def _min_rows() -> int:
    """Below this the sorted path wins (the stats pass costs a dispatch +
    fetch, ~2 relay RTTs); tests set it to 0 to exercise the path on CPU."""
    return int(os.environ.get("SQLRS_TPU_MXU_AGG_MIN_ROWS", str(1 << 17)))


def _mode() -> str:
    return os.environ.get("SQLRS_TPU_MXU", "auto")


def _backend_ok() -> bool:
    mode = _mode()
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    return "tpu" in jax.devices()[0].device_kind.lower()


# --------------------------------------------------------------------------
# stats pass: ONE program, one host fetch
# --------------------------------------------------------------------------

@jax.jit
def _agg_stats(kdatas, kvalids, alive, vdatas, vvalids):
    """Per key column [min, max, any_null] over (valid & alive) rows, int64;
    per value column [any_null, vmin, vmax, integral@10^0, @10^2, @10^4,
    @10^6] over (valid & alive) rows, float64. Two small vectors, fetched
    together. Key stats stay int64 (codes can exceed 2^53); value stats are
    f64 (the path guards |scaled| < 2^48 anyway)."""
    n = (kdatas[0] if kdatas else vdatas[0]).shape[0]
    if alive is None:
        live = jnp.ones((n,), jnp.bool_)
    elif isinstance(alive, tuple):
        live = jnp.logical_and(alive[0], alive[1])
    else:
        live = alive
    big = jnp.int64(jnp.iinfo(jnp.int64).max)
    kparts = [jnp.sum(live.astype(jnp.int64))[None]]  # live-row count
    for d, v in zip(kdatas, kvalids):
        ok = v & live
        d64 = d.astype(jnp.int64)
        kparts.append(jnp.min(jnp.where(ok, d64, big))[None])
        kparts.append(jnp.max(jnp.where(ok, d64, -big))[None])
        kparts.append(jnp.any(live & jnp.logical_not(v)).astype(jnp.int64)[None])
    vparts = []
    for d, v in zip(vdatas, vvalids):
        ok = v & live
        f = d.astype(jnp.float64)
        vparts.append(jnp.any(live & jnp.logical_not(v)).astype(jnp.float64)[None])
        vparts.append(jnp.min(jnp.where(ok, f, jnp.inf))[None])
        vparts.append(jnp.max(jnp.where(ok, f, -jnp.inf))[None])
        for k in _SCALES:
            s = f * (10.0 ** k)
            fr = jnp.abs(s - jnp.round(s))
            # a k-dp decimal COMPUTED in doubles (e.g. the product of three
            # 2dp columns) carries representation error ~|s|*c*2^-52, so the
            # integrality test is relative; round() still recovers the exact
            # decimal numerator because the error is far below 0.5 at the
            # 2^46 magnitude cap (max error ~0.08). The cap also keeps the
            # tolerance selective: a non-decimal row passes with
            # probability <= ~0.14, so all-rows-pass is impossible at the
            # row counts this path applies to.
            row_ok = fr <= (1e-5 + jnp.abs(s) * 1e-12)
            allok = jnp.all(jnp.where(ok, row_ok, True))
            mag = jnp.max(jnp.where(ok, jnp.abs(s), 0.0))
            vparts.append(
                (allok & (mag < float(1 << 46))).astype(jnp.float64)[None]
            )
    kvec = (
        jnp.concatenate(kparts)
        if kparts
        else jnp.zeros((0,), jnp.int64)
    )
    vvec = (
        jnp.concatenate(vparts) if vparts else jnp.zeros((0,), jnp.float64)
    )
    return kvec, vvec


# --------------------------------------------------------------------------
# the multi-channel kernel
# --------------------------------------------------------------------------

def _kernel(refs_and_outs, *, gh: int, n_groups: int, nchunks: int,
            limb_plan, n_words: int):
    """refs_and_outs = (k_ref, w_ref_0..w_ref_{W-1}, out_lo, out_hi,
    out_first, acc_lo, acc_hi, first). Channel 0 = count; channel 1+i =
    limb_plan[i] = (word_index, shift). One grid step = RB_PER_CHUNK x BLK
    rows, carry-renormalized per chunk (ops/mxu_agg.py exactness ladder)."""
    k_ref = refs_and_outs[0]
    w_refs = refs_and_outs[1 : 1 + n_words]
    out_lo_ref, out_hi_ref, out_first_ref = refs_and_outs[
        1 + n_words : 4 + n_words
    ]
    acc_lo, acc_hi, first = refs_and_outs[4 + n_words :]
    c = pl.program_id(0)

    @pl.when(c == np.int32(0))
    def _init():
        acc_lo[:] = jnp.zeros_like(acc_lo)
        acc_hi[:] = jnp.zeros_like(acc_hi)
        first[:] = jnp.full_like(first, BIGF)

    zero = np.int32(0)
    klo = np.int32(K_LO)
    ng = np.int32(n_groups)
    for rb in range(RB_PER_CHUNK):
        kb = k_ref[pl.ds(rb, 1), :]                      # (1, B) int32 gid
        inr = (kb >= zero) & (kb < ng)
        gid = jnp.where(inr, kb, zero)
        hi = gid // klo
        lo = gid % klo
        a_t = (
            lax.broadcasted_iota(jnp.int32, (gh, BLK), 0) == hi
        ).astype(jnp.bfloat16)
        l_t = lax.broadcasted_iota(jnp.int32, (K_LO, BLK), 0) == lo
        w0 = inr.astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        cnt = lax.dot_general(
            a_t, l_t.astype(jnp.bfloat16) * w0,
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )                                                # (gh, K_LO)
        # first-appearance block: running min of the global row-block index
        # over blocks where the group has any live row
        rbg = (c * np.int32(RB_PER_CHUNK) + np.int32(rb)).astype(jnp.float32)
        first[:] = jnp.where((cnt > 0) & (first[:] >= BIGF), rbg, first[:])
        parts = [cnt]
        for wi, sh in limb_plan:
            wb = w_refs[wi][pl.ds(rb, 1), :]             # (1, B) int32
            limb = (
                (wb >> np.int32(sh)) & np.int32(255)
            ).astype(jnp.bfloat16) * w0
            parts.append(
                lax.dot_general(
                    a_t, l_t.astype(jnp.bfloat16) * limb,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
            )
        acc_lo[:] = acc_lo[:] + jnp.concatenate(parts, axis=1)

    q = jnp.floor(acc_lo[:] * np.float32(1.0 / CARRY))
    acc_hi[:] = acc_hi[:] + q
    acc_lo[:] = acc_lo[:] - q * np.float32(CARRY)

    @pl.when(c == np.int32(nchunks - 1))
    def _flush():
        out_lo_ref[:] = acc_lo[:]
        out_hi_ref[:] = acc_hi[:]
        out_first_ref[:] = first[:]


# --------------------------------------------------------------------------
# phase A: gid + words + kernel + first-row + ordered decode, ONE program
# --------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "key_plan", "val_plan", "spec", "n_groups", "interpret",
    ),
)
def _mxu_agg_phase_a(
    kdatas, kvalids, alive, vdatas, vvalids, kmins, biases,
    key_plan, val_plan, spec, n_groups: int, interpret: bool,
):
    """key_plan: per key (span_eff, has_null, kind) — spans static (they fix
    G and the channel layout); kmins ride as traced scalars so data shifts
    don't recompile. val_plan: per value column (n_limbs, has_null, scale_k).
    spec: per aggregate (op, col_ix) with op in {count_star, count, sum,
    avg}. Returns ordered (first-appearance) G-sized outputs + n_nonempty;
    the caller slices after ONE host fetch."""
    n = (kdatas[0] if kdatas else vdatas[0]).shape[0]
    if alive is None:
        live = jnp.ones((n,), jnp.bool_)
    elif isinstance(alive, tuple):
        live = jnp.logical_and(alive[0], alive[1])
    else:
        live = alive

    # ---- composite gid (row-major over key columns) ----------------------
    gid = jnp.zeros((n,), jnp.int64)
    for j, (span_eff, has_null, _kind) in enumerate(key_plan):
        d64 = kdatas[j].astype(jnp.int64) - kmins[j]
        slot = jnp.where(kvalids[j], d64, jnp.int64(span_eff - 1))
        gid = gid * span_eff + slot
    gid = jnp.where(live, gid, jnp.int64(-1))
    k32 = gid.astype(jnp.int32)

    # ---- value words: scaled, biased, NULL-masked ------------------------
    words: list = []
    word_of_col: list[tuple[int, int]] = []  # (first word ix, n_words)
    for i, (n_limbs, has_null, k) in enumerate(val_plan):
        d = vdatas[i]
        if jnp.issubdtype(d.dtype, jnp.floating):
            s = jnp.round(d.astype(jnp.float64) * (10.0 ** k)).astype(
                jnp.int64
            )
        else:
            s = d.astype(jnp.int64)
        w = s - biases[i]
        w = jnp.where(vvalids[i] & live, w, jnp.int64(0))
        nw = -(-n_limbs * 8 // 24)
        word_of_col.append((len(words), nw))
        for wi in range(nw):
            words.append(
                ((w >> (24 * wi)) & jnp.int64(0xFFFFFF)).astype(jnp.int32)
            )
    # validity channels (0/1 words) for NULL-able value columns
    vword_of_col: dict[int, int] = {}
    for i, (_nl, has_null, _k) in enumerate(val_plan):
        if has_null:
            vword_of_col[i] = len(words)
            words.append((vvalids[i] & live).astype(jnp.int32))

    # ---- channel layout --------------------------------------------------
    limb_plan: list[tuple[int, int]] = []
    chan_of_col: list[int] = []
    for i, (n_limbs, _hn, _k) in enumerate(val_plan):
        chan_of_col.append(1 + len(limb_plan))
        w0, _nw = word_of_col[i]
        for j in range(n_limbs):
            limb_plan.append((w0 + j // 3, (j % 3) * 8))
    vchan_of_col: dict[int, int] = {}
    for i, wix in vword_of_col.items():
        vchan_of_col[i] = 1 + len(limb_plan)
        limb_plan.append((wix, 0))
    nch = 1 + len(limb_plan)
    n_words = len(words)

    # ---- pad + launch ----------------------------------------------------
    gh = -(-n_groups // K_LO)
    gh = max(16, ((gh + 15) // 16) * 16)
    chunk = RB_PER_CHUNK * BLK
    pad = (-n) % chunk
    if pad:
        k32 = jnp.concatenate([k32, jnp.full((pad,), -1, jnp.int32)])
        words = [
            jnp.concatenate([w, jnp.zeros((pad,), jnp.int32)]) for w in words
        ]
    nchunks = (n + pad) // chunk
    k2 = k32.reshape(nchunks * RB_PER_CHUNK, BLK)
    w2 = [w.reshape(nchunks * RB_PER_CHUNK, BLK) for w in words]
    wide = K_LO * nch
    blockspec = pl.BlockSpec(
        (RB_PER_CHUNK, BLK), lambda c: (c, np.int32(0)),
        memory_space=pltpu.VMEM,
    )
    outspec = pl.BlockSpec(
        (gh, wide), lambda c: (np.int32(0), np.int32(0)),
        memory_space=pltpu.VMEM,
    )
    firstspec = pl.BlockSpec(
        (gh, K_LO), lambda c: (np.int32(0), np.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_lo, out_hi, out_first = pl.pallas_call(
        lambda *refs: _kernel(
            refs, gh=gh, n_groups=n_groups, nchunks=nchunks,
            limb_plan=tuple(limb_plan), n_words=n_words,
        ),
        grid=(nchunks,),
        in_specs=[blockspec] * (1 + n_words),
        out_specs=(outspec, outspec, firstspec),
        out_shape=(
            jax.ShapeDtypeStruct((gh, wide), jnp.float32),
            jax.ShapeDtypeStruct((gh, wide), jnp.float32),
            jax.ShapeDtypeStruct((gh, K_LO), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((gh, wide), jnp.float32),
            pltpu.VMEM((gh, wide), jnp.float32),
            pltpu.VMEM((gh, K_LO), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + pad) * gh * K_LO * nch,
            bytes_accessed=(n + pad) * 4 * (1 + n_words)
            + 3 * gh * wide * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(k2, *w2)

    total = out_hi.astype(jnp.float64) * CARRY + out_lo.astype(jnp.float64)
    chans = total.reshape(gh, nch, K_LO).transpose(1, 0, 2).reshape(
        nch, gh * K_LO
    )[:, :n_groups]
    counts = chans[0].astype(jnp.int64)

    # ---- exact first row: the kernel gives each group's first 2048-row
    # block; ONE (G, BLK) gather of that block's gids finds the row ---------
    first_blk = out_first.reshape(gh * K_LO)[:n_groups]
    nb_rb = nchunks * RB_PER_CHUNK
    blk_i = jnp.clip(first_blk.astype(jnp.int64), 0, nb_rb - 1)
    rows = k2[blk_i]                                    # (G, BLK)
    lane = jnp.arange(BLK, dtype=jnp.int64)
    g_ids = jnp.arange(n_groups, dtype=jnp.int32)
    pos = jnp.min(
        jnp.where(rows == g_ids[:, None], lane[None, :], jnp.int64(n)),
        axis=1,
    )
    first_row = blk_i * BLK + pos
    big64 = jnp.int64(jnp.iinfo(jnp.int64).max)
    nonempty = counts > 0
    first_row = jnp.where(nonempty, first_row, big64)
    n_out = jnp.sum(nonempty.astype(jnp.int64))

    # ---- first-appearance order + decode, all at G size ------------------
    order = jnp.argsort(first_row)                       # nonempty first
    ogid = order.astype(jnp.int64)

    gdata, gvalid = [], []
    rem = ogid
    strides: list[int] = []
    s = 1
    for span_eff, _hn, _kind in reversed(key_plan):
        strides.append(s)
        s *= span_eff
    strides.reverse()
    for j, (span_eff, has_null, kind) in enumerate(key_plan):
        slot = (rem // strides[j]) % span_eff
        code = slot + kmins[j]
        if has_null:
            gvalid.append(slot != (span_eff - 1))
        else:
            gvalid.append(jnp.ones((n_groups,), jnp.bool_))
        gdata.append(code.astype(kind))

    ocounts = counts[order]
    adata, avalid = [], []
    ones = jnp.ones((n_groups,), jnp.bool_)
    for op, ci, out_dt, is_float_sum in spec:
        if op == "count_star":
            adata.append(ocounts)
            avalid.append(ones)
            continue
        nl, has_null, k = val_plan[ci]
        vcnt = (
            chans[vchan_of_col[ci]].astype(jnp.int64)[order]
            if has_null
            else ocounts
        )
        if op == "count":
            adata.append(vcnt)
            avalid.append(ones)
            continue
        base = chan_of_col[ci]
        ssum = jnp.zeros((n_groups,), jnp.int64)
        for j in range(nl):
            ssum = ssum + (chans[base + j].astype(jnp.int64) << (8 * j))
        ssum = ssum[order] + vcnt * biases[ci]           # un-bias
        if op == "sum":
            if is_float_sum:
                out = ssum.astype(jnp.float64) / (10.0 ** k)
            else:
                out = ssum.astype(out_dt)
            adata.append(out)
            avalid.append(vcnt > 0)
            continue
        # avg
        den = jnp.maximum(vcnt, 1).astype(jnp.float64)
        out = ssum.astype(jnp.float64) / (10.0 ** k) / den
        adata.append(out)
        avalid.append(vcnt > 0)
    return tuple(gdata), tuple(gvalid), tuple(adata), tuple(avalid), n_out


# --------------------------------------------------------------------------
# the executor-facing entry
# --------------------------------------------------------------------------

_KEY_KINDS = {
    LogicalType.TINYINT, LogicalType.SMALLINT, LogicalType.INTEGER,
    LogicalType.BIGINT, LogicalType.DATE, LogicalType.BOOLEAN,
    LogicalType.VARCHAR,
}


def mxu_grouped_aggregate(key_cols, agg_specs, alive=None):
    """Try the MXU path for a general GROUP BY; returns (group_cols,
    agg_cols, n_groups) or None when ineligible (callers fall back to the
    sorted-run path). agg_specs entries: (name, Column|None, result_type
    [, distinct]) — the sorted_grouped_aggregate contract.

    Host prechecks are free; the span/fixed-point checks cost ONE stats
    program + one fetch, paid only above SQLRS_TPU_MXU_AGG_MIN_ROWS."""
    if not key_cols or not _backend_ok():
        return None
    n = len(key_cols[0])
    if n < max(_min_rows(), 1) or n >= MXU_AGG_MAX_ROWS:
        return None
    if any(c.type not in _KEY_KINDS for c in key_cols):
        return None
    # aggregates: sum/count/avg only (min/max need ordering the matmul
    # cannot produce; DISTINCT needs dedup) over int/double arguments
    specs4 = [
        (s[0], s[1], s[2], bool(s[3]) if len(s) > 3 else False)
        for s in agg_specs
    ]
    val_cols: list = []
    col_ix: dict[int, int] = {}
    entries: list[tuple[str, int | None]] = []
    for name, col, rt, distinct in specs4:
        if distinct:
            return None
        if col is None:
            if name != "count":
                return None
            entries.append(("count_star", None))
            continue
        if name not in ("sum", "avg", "count"):
            return None
        t = col.type
        if name in ("sum", "avg"):
            if not (
                t.is_float()
                or (t.is_integral() and t not in (
                    LogicalType.DATE, LogicalType.INTERVAL,
                    LogicalType.BOOLEAN,
                ))
            ):
                return None
        if id(col) not in col_ix:
            col_ix[id(col)] = len(val_cols)
            val_cols.append(col)
        entries.append((name if name != "count" else "count", col_ix[id(col)]))

    # columns only referenced by count() need no limbs — mark them
    needs_limbs = [False] * len(val_cols)
    for name, ci in entries:
        if name in ("sum", "avg"):
            needs_limbs[ci] = True

    # ---- stats program + ONE fetch ---------------------------------------
    kvec_d, vvec_d = _agg_stats(
        tuple(c.data for c in key_cols),
        tuple(c.valid for c in key_cols),
        alive,
        tuple(c.data for c in val_cols),
        tuple(c.valid for c in val_cols),
    )
    kvec, vvec = np.asarray(kvec_d), np.asarray(vvec_d)
    n_live = int(kvec[0])
    if n_live == 0:
        return None  # empty after the mask: let the general path handle it

    key_plan: list = []
    kmins: list[int] = []
    g_total = 1
    for j, c in enumerate(key_cols):
        kmin, kmax, anyn = (
            int(kvec[1 + 3 * j]), int(kvec[2 + 3 * j]), int(kvec[3 + 3 * j])
        )
        if kmin > kmax:  # all-NULL key column
            span = 0
            kmin = 0
        else:
            span = kmax - kmin + 1
        span_eff = span + (1 if anyn else 0)
        if span_eff <= 0 or span_eff > MXU_AGG_MAX_GROUPS:
            return None
        key_plan.append((span_eff, bool(anyn), numpy_dtype_for(c.type)))
        kmins.append(kmin)
        g_total *= span_eff
        if g_total > MXU_AGG_MAX_GROUPS:
            return None

    val_plan: list = []
    biases: list[int] = []
    for i, c in enumerate(val_cols):
        base = 7 * i
        anyn = bool(vvec[base])
        vmin, vmax = float(vvec[base + 1]), float(vvec[base + 2])
        if not needs_limbs[i]:
            val_plan.append((0, anyn, 0))
            biases.append(0)
            continue
        if not np.isfinite(vmin) or not np.isfinite(vmax):
            if vmin > vmax:  # all-NULL value column: zero limbs suffice
                val_plan.append((0, True, 0))
                biases.append(0)
                continue
            return None
        k_ok = None
        for kk, k in enumerate(_SCALES):
            if vvec[base + 3 + kk] > 0:
                k_ok = k
                break
        if k_ok is None:
            return None  # not a k-dp decimal: float sums stay on the
            # reduction-ordered general path
        smin = int(round(vmin * (10.0 ** k_ok)))
        smax = int(round(vmax * (10.0 ** k_ok)))
        bias = min(smin, 0)
        vb = max((smax - bias).bit_length(), 1)
        if vb > MXU_AGG_MAX_VAL_BITS:
            return None
        if (smax - bias) * n >= (1 << 62):
            return None  # int64 assembly guard
        val_plan.append((-(-vb // 8), anyn, k_ok))
        biases.append(bias)

    nch = 1 + sum(p[0] for p in val_plan) + sum(
        1 for p in val_plan if p[1]
    )
    if nch > MXU_AGG_MAX_CHANNELS:
        return None

    spec = []
    for (name, ci), (sname, _c, rt, _d) in zip(entries, specs4):
        if name == "count_star":
            spec.append(("count_star", -1, np.dtype(np.int64), False))
            continue
        is_float = val_cols[ci].type.is_float() or val_plan[ci][2] > 0
        spec.append((name, ci, numpy_dtype_for(rt), is_float))

    gdata, gvalid, adata, avalid, n_out_d = _mxu_agg_phase_a(
        tuple(c.data for c in key_cols),
        tuple(c.valid for c in key_cols),
        alive,
        tuple(c.data for c in val_cols),
        tuple(c.valid for c in val_cols),
        tuple(jnp.int64(m) for m in kmins),
        tuple(jnp.int64(b) for b in biases),
        tuple(key_plan),
        tuple(val_plan),
        tuple(spec),
        g_total,
        _mode() == "interpret",
    )
    n_groups = int(n_out_d)

    from sqlrs_tpu.ops.fused import slice_arrays

    flat = slice_arrays(tuple(gdata + gvalid + adata + avalid), 0, n_groups)
    nk, na = len(gdata), len(adata)
    gdatas, gvalids = flat[:nk], flat[nk : 2 * nk]
    adatas, avalids = flat[2 * nk : 2 * nk + na], flat[2 * nk + na :]
    group_cols = [
        Column(c.type, d, v) for c, d, v in zip(key_cols, gdatas, gvalids)
    ]
    agg_cols = []
    for (sname, _c, rt, _d), d, v in zip(specs4, adatas, avalids):
        dt = numpy_dtype_for(rt)
        agg_cols.append(Column(rt, d.astype(dt) if d.dtype != dt else d, v))
    return group_cols, agg_cols, n_groups
