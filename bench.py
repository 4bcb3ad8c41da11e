"""Headline benchmark: zipf-skewed hash join + group-by, rows/s per chip.

BASELINE.md configs: the scaled synthetic workload is a zipf-keyed fact table
joined to a dimension table with a group-by aggregate. The reference publishes
no numbers and cannot be built here (no Rust toolchain), so `vs_baseline`
compares against a vectorized single-node CPU implementation of the same
workload (numpy bincount/sort — a stand-in for a good columnar CPU engine's
per-core kernel). The idealized 16-bytes-per-row HBM roofline fraction is
reported in `detail` per the north-star accounting.

Prints ONE JSON line:
  {"metric": ..., "value": rows/s, "unit": "rows/s", "vs_baseline": ...}
"""

import json
import time

import numpy as np

_HBM_BW = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
}
_BYTES_PER_ROW = 16  # minimum traffic: read key (8B) + value (8B) per fact row


def _chip_bw():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _HBM_BW.items():
        if k.lower() in kind.lower():
            return v
    return 50e9


def _numpy_baseline(fact_keys, fact_vals, dim_keys, groups):
    """Same join+group-by with numpy's fastest formulation (sorted dim +
    searchsorted join + bincount aggregation)."""
    order = np.argsort(dim_keys)
    dsorted = dim_keys[order]
    best = None
    for _ in range(3):  # first run pays allocation/page-fault cost
        t0 = time.perf_counter()
        pos = np.searchsorted(dsorted, fact_keys)
        pos_c = np.minimum(pos, groups - 1)
        hit = dsorted[pos_c] == fact_keys
        gid = order[pos_c]
        sums = np.bincount(gid[hit], weights=fact_vals[hit], minlength=groups)
        counts = np.bincount(gid[hit], minlength=groups)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return sums.astype(np.int64), counts.astype(np.int64), best


def main() -> None:
    import jax
    import jax.numpy as jnp

    import sqlrs_tpu  # noqa: F401  (x64)
    from sqlrs_tpu.ops.pipelines import make_join_groupby

    n = 1 << 25  # 33.5M fact rows
    groups = 1 << 16
    rng = np.random.default_rng(0)
    gid = np.minimum(rng.zipf(1.2, n), groups).astype(np.int64) - 1
    # realistic star-schema foreign keys: DENSE dim ids (TPC-H-style
    # surrogate keys). Catalog min/max metadata then auto-selects the
    # int32-packed sort (pack32) — 314M vs 232M elem/s sort bandwidth on
    # v5e. A spread-key variant (keys *= 1013904223, defeats packing) is
    # measured as well and reported in detail.
    dim_keys_np = np.arange(groups, dtype=np.int64)
    fact_keys_np = dim_keys_np[gid]
    fact_vals_np = rng.integers(0, 100, n).astype(np.int64)
    fact_keys = jnp.asarray(fact_keys_np)
    fact_vals = jnp.asarray(fact_vals_np)
    dim_keys = jnp.asarray(dim_keys_np)

    # direct strategy: key+value packed into ONE sort operand, then
    # per-group sums via block prefix sums + a merge-ranked range query per
    # dim key — no run detection, no N-sized cumsum, no per-query binary
    # search (ops/pipelines.py join_groupby_direct)
    key_max, val_max = int(fact_keys_np.max()), int(fact_vals_np.max())
    fn = make_join_groupby(groups, strategy="direct")

    def run_once(fk, fv, dk, km, dmin, dmax):
        # catalog-style metadata: key/value ranges auto-select the int32
        # pack; dim min/max auto-selects the dense boundary-sharing rank
        # stage (consecutive surrogate keys — half the rank-row gathers)
        s, c = fn(fk, fv, dk, key_max=km, val_max=val_max,
                  dim_min=dmin, dim_max=dmax)
        # timing must force materialization by FETCHING a scalar: over the
        # axon relay block_until_ready returns before the transfer-visible
        # completion and under-reports (CLAUDE.md)
        float(s[0])
        return s, c

    dim_min, dim_max = int(dim_keys_np.min()), int(dim_keys_np.max())
    sums, counts = run_once(fact_keys, fact_vals, dim_keys, key_max,
                            dim_min, dim_max)

    # correctness check vs the CPU baseline (which is itself the comparator)
    exp_sums, exp_counts, cpu_dt = _numpy_baseline(
        fact_keys_np, fact_vals_np, dim_keys_np, groups
    )
    assert np.array_equal(np.asarray(sums), exp_sums), "bench kernel mismatch"
    assert np.array_equal(np.asarray(counts), exp_counts), "bench count mismatch"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_once(fact_keys, fact_vals, dim_keys, key_max, dim_min, dim_max)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    rows_per_sec = n / dt
    cpu_rows_per_sec = n / cpu_dt

    # secondary: spread int64 keys (packing defeated) — the conservative path
    spread_np = dim_keys_np * 1013904223 + 12345
    sk_np = spread_np[gid]
    sk = jnp.asarray(sk_np)
    sdk = jnp.asarray(spread_np)
    skm = int(sk_np.max())
    smin, smax = int(spread_np.min()), int(spread_np.max())
    run_once(sk, fact_vals, sdk, skm, smin, smax)  # compile + warm
    times2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once(sk, fact_vals, sdk, skm, smin, smax)
        times2.append(time.perf_counter() - t0)
    spread_rows_per_sec = n / float(np.median(times2))

    # spread keys under caller-asserted FK-completeness (true here by
    # construction: fact keys are drawn from the dim set — the referential
    # -integrity norm for star joins): shared G+1 range boundaries halve
    # the rank stage (BASELINE.md round-5 spread-key case)
    def run_fk(fk_, fv_, dk_):
        s, c = fn(fk_, fv_, dk_, key_max=skm, val_max=val_max,
                  dim_min=smin, dim_max=smax, fk_complete=True)
        float(s[0])
        return s, c

    s_fk, c_fk = run_fk(sk, fact_vals, sdk)
    assert np.array_equal(np.asarray(s_fk), exp_sums), "fk spread mismatch"
    assert np.array_equal(np.asarray(c_fk), exp_counts)
    times3 = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_fk(sk, fact_vals, sdk)
        times3.append(time.perf_counter() - t0)
    spread_fk_rows_per_sec = n / float(np.median(times3))

    roofline_rows = _chip_bw() / _BYTES_PER_ROW
    print(
        json.dumps(
            {
                "metric": "zipf_join_groupby_rows_per_sec_per_chip",
                "value": round(rows_per_sec),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_sec / cpu_rows_per_sec, 3),
                "detail": {
                    "rows": n,
                    "groups": groups,
                    "median_s": round(dt, 4),
                    "baseline": "numpy searchsorted+bincount on host CPU",
                    "baseline_rows_per_sec": round(cpu_rows_per_sec),
                    "roofline_fraction_16B_per_row": round(
                        rows_per_sec / roofline_rows, 5
                    ),
                    "spread_int64_key_rows_per_sec": round(spread_rows_per_sec),
                    "spread_fk_complete_rows_per_sec": round(
                        spread_fk_rows_per_sec
                    ),
                    "device": jax.devices()[0].device_kind,
                    # auto-selected per metadata: dense dim + <2^24 values ->
                    # MXU one-hot matmul segment-sum (ops/mxu_agg.py);
                    # otherwise packed-sort + merge-ranked range queries
                    # (ops/pipelines.py join_groupby_direct) — the spread-key
                    # number above IS the sort path (packing defeated)
                    "algorithm": (
                        "mxu one-hot matmul segment-sum (dense dims; "
                        "ops/mxu_agg.py) / packed-sort merge-rank fallback"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
