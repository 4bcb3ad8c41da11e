"""MXU probe: one-hot matmul grouped aggregation vs the sort-based kernel.

VERDICT round-3 item 5: "the MXU is idle engine-wide" — measure whether a
blocked one-hot matmul segment-sum (ops/mxu_agg.py) can beat the
sort-formulated headline (ops/pipelines.join_groupby_direct) for dense
group domains, keep-or-kill with numbers. Three contestants on the SAME
dense-key zipf workload the headline bench uses:

  sort    join_groupby_direct (dense boundary sharing, pack32 auto)
  mxu     Pallas kernel: one-hots generated in VMEM, bf16 MXU dots,
          carry-split f32 accumulators (exact int64 results)
  mxu_xla lax.scan of the same dots with XLA-materialized one-hots
          (expected HBM-bound — the comparison point)

Usage: python -m benchmarks.mxu_probe [--rows 25] [--groups 16,12,10]
[--repeat 3] [--skip-xla]. Timing forces materialization by fetching a
scalar (block_until_ready under-reports through the axon relay, CLAUDE.md).
Prints one JSON line per group count.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=25)
    ap.add_argument("--groups", type=str, default="16,12,10")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args(argv)

    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax
    import jax.numpy as jnp

    import sqlrs_tpu  # noqa: F401  (x64 + platform pinning)
    from sqlrs_tpu.ops.mxu_agg import mxu_groupby_dense, mxu_groupby_dense_xla
    from sqlrs_tpu.ops.pipelines import join_groupby_direct

    n = 1 << args.rows
    rng = np.random.default_rng(0)

    def fetch(x):
        return float(np.asarray(x[0][0] if isinstance(x, tuple) else x[0]))

    def timeit(fn):
        fetch(fn())  # warm/compile
        ts = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            fetch(fn())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for glog in [int(s) for s in args.groups.split(",")]:
        g = 1 << glog
        gid = np.minimum(rng.zipf(1.2, n), g).astype(np.int64) - 1
        vals = rng.integers(0, 100, n).astype(np.int64)
        keys_d = jnp.asarray(gid)
        vals_d = jnp.asarray(vals)
        dim_sorted = jnp.arange(g, dtype=jnp.int64)
        perm = jnp.arange(g, dtype=jnp.int64)
        val_bits = 7
        pack32 = g < (1 << (31 - val_bits)) - 1

        # numpy oracle (exactness gate before timing)
        exp_s = np.zeros(g, np.int64)
        exp_c = np.zeros(g, np.int64)
        np.add.at(exp_s, gid, vals)
        np.add.at(exp_c, gid, 1)

        def run_sort():
            return join_groupby_direct(
                keys_d, vals_d, dim_sorted, perm, g, val_bits, pack32,
                dense=True,
            )

        def run_mxu():
            return mxu_groupby_dense(keys_d, vals_d, g, val_bits)

        out = {}
        s, c = run_mxu()
        ok = np.array_equal(np.asarray(s), exp_s) and np.array_equal(
            np.asarray(c), exp_c
        )
        out["mxu_exact"] = bool(ok)
        out["mxu_s"] = timeit(run_mxu)
        ss = run_sort()
        out["sort_exact"] = bool(
            np.array_equal(np.asarray(ss[0]), exp_s)
            and np.array_equal(np.asarray(ss[1]), exp_c)
        )
        out["sort_s"] = timeit(run_sort)
        if not args.skip_xla:
            def run_xla():
                return mxu_groupby_dense_xla(keys_d, vals_d, g, val_bits)

            sx, cx = run_xla()
            out["mxu_xla_exact"] = bool(
                np.array_equal(np.asarray(sx), exp_s)
                and np.array_equal(np.asarray(cx), exp_c)
            )
            out["mxu_xla_s"] = timeit(run_xla)
        print(json.dumps({
            "metric": "mxu_groupby_dense",
            "value": round(n / out["mxu_s"]),
            "unit": "rows/s",
            "vs_baseline": round(out["sort_s"] / out["mxu_s"], 2),
            "detail": {
                "rows": n, "groups": g,
                **{k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in out.items()},
                "baseline": "join_groupby_direct dense (the sort path)",
            },
        }), flush=True)


if __name__ == "__main__":
    main()
