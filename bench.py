"""Headline benchmark: zipf-skewed hash join + group-by, rows/s per chip.

BASELINE.md metric: rows/s on the join+group-by pipeline vs the per-chip
memory-bandwidth roofline (the reference publishes no numbers; the target is
>=70% of roofline — vs_baseline reports achieved_fraction / 0.70, so 1.0
means the north-star target is met).

Prints ONE JSON line:
  {"metric": ..., "value": rows/s, "unit": "rows/s", "vs_baseline": ...}
"""

import json
import time

import numpy as np

# chip peak HBM bandwidth (bytes/s) by platform; v5e ~819 GB/s
_HBM_BW = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
    "cpu": 50e9,
}

# minimum HBM traffic per fact row for join+group-by: read key (8B) +
# value (8B); table/aggregate traffic is O(G) and amortizes out
_BYTES_PER_ROW = 16


def _chip_bw():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _HBM_BW.items():
        if k.lower() in kind.lower():
            return v
    return _HBM_BW.get("cpu")


def main() -> None:
    import jax
    import jax.numpy as jnp

    import sqlrs_tpu  # noqa: F401  (x64)
    from sqlrs_tpu.ops.pipelines import make_join_groupby

    n = 1 << 25  # 33.5M fact rows (~512MB of key+value traffic)
    groups = 1 << 16
    rng = np.random.default_rng(0)
    gid = np.minimum(rng.zipf(1.2, n), groups).astype(np.int64) - 1
    dim_keys_np = np.arange(groups, dtype=np.int64) * 1013904223 + 12345
    fact_keys = jnp.asarray(dim_keys_np[gid])
    fact_vals = jnp.asarray(rng.integers(0, 100, n).astype(np.int64))
    dim_keys = jnp.asarray(dim_keys_np)

    fn = make_join_groupby(groups, strategy="sorted")
    sums, counts = fn(fact_keys, fact_vals, dim_keys)  # compile + warm
    sums.block_until_ready()

    # correctness spot-check vs numpy
    exp = np.zeros(groups, dtype=np.int64)
    np.add.at(exp, gid, np.asarray(fact_vals))
    assert np.array_equal(np.asarray(sums), exp), "bench kernel mismatch"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, c = fn(fact_keys, fact_vals, dim_keys)
        s.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    rows_per_sec = n / dt

    roofline_rows = _chip_bw() / _BYTES_PER_ROW
    frac = rows_per_sec / roofline_rows
    print(
        json.dumps(
            {
                "metric": "zipf_join_groupby_rows_per_sec_per_chip",
                "value": round(rows_per_sec),
                "unit": "rows/s",
                "vs_baseline": round(frac / 0.70, 4),
                "detail": {
                    "rows": n,
                    "groups": groups,
                    "median_s": round(dt, 4),
                    "roofline_fraction": round(frac, 4),
                    "device": jax.devices()[0].device_kind,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
