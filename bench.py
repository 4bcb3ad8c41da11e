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
    dim_keys_np = np.arange(groups, dtype=np.int64) * 1013904223 + 12345
    fact_keys_np = dim_keys_np[gid]
    fact_vals_np = rng.integers(0, 100, n).astype(np.int64)
    fact_keys = jnp.asarray(fact_keys_np)
    fact_vals = jnp.asarray(fact_vals_np)
    dim_keys = jnp.asarray(dim_keys_np)

    # direct strategy: key+value packed into ONE int64 sort operand, then
    # per-group sums via block prefix sums + a merge-ranked range query per
    # dim key — no run detection, no N-sized cumsum, no per-query binary
    # search (ops/pipelines.py join_groupby_direct)
    assert int(fact_vals_np.max()) < (1 << 7) and int(fact_keys_np.max()) < (1 << 56)
    fn = make_join_groupby(groups, strategy="direct")
    sums, counts = fn(fact_keys, fact_vals, dim_keys)  # compile + warm
    sums.block_until_ready()

    # correctness check vs the CPU baseline (which is itself the comparator)
    exp_sums, exp_counts, cpu_dt = _numpy_baseline(
        fact_keys_np, fact_vals_np, dim_keys_np, groups
    )
    assert np.array_equal(np.asarray(sums), exp_sums), "bench kernel mismatch"
    assert np.array_equal(np.asarray(counts), exp_counts), "bench count mismatch"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, c = fn(fact_keys, fact_vals, dim_keys)
        s.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    rows_per_sec = n / dt
    cpu_rows_per_sec = n / cpu_dt

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
                    "device": jax.devices()[0].device_kind,
                    "algorithm": "direct packed-sort + block-prefix + merge-ranked range queries (ops/pipelines.py join_groupby_direct)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
