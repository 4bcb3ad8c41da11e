"""SQL-level fused-route benchmark: the headline star rollup through the
FULL engine (parse → bind → optimize → execute), routed vs general path.

Round-2 VERDICT's top finding was the 50-200x gap between the engine's
kernels (205M rows/s) and SQL-path throughput; the dispatch diet closed the
round-trip part and exec/fused_route.py closes the kernel part for the
star-rollup shape. This runner measures that closure end to end on the
SAME workload bench.py uses (33.5M zipf rows x 64K dense dim keys):

  select d.k, sum(f.v), count(*) from f join d on f.k = d.k
  group by d.k order by d.k

Usage: python -m benchmarks.route_bench [--rows 25] [--groups 16] [--repeat 3]
(--rows/--groups are log2). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=25)
    ap.add_argument("--groups", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args(argv)

    # honor JAX_PLATFORMS before first jax use — the env var alone does not
    # move a process off the axon relay backend (CLAUDE.md)
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import sqlrs_tpu
    from sqlrs_tpu.data import DeviceBatch, Schema
    from sqlrs_tpu.data.batch import Column
    from sqlrs_tpu.types import LogicalType as LT

    n, groups = 1 << args.rows, 1 << args.groups
    rng = np.random.default_rng(0)
    gid = np.minimum(rng.zipf(1.2, n), groups).astype(np.int64) - 1
    dim_keys = np.arange(groups, dtype=np.int64)
    fk = dim_keys[gid]
    fv = rng.integers(0, 100, n).astype(np.int64)
    fw = rng.integers(-50, 50, n).astype(np.int64)  # payload-only (negative)

    db = sqlrs_tpu.Database()
    fschema = Schema.of([("k", LT.BIGINT), ("v", LT.BIGINT), ("w", LT.BIGINT)])
    db.create_memory_table(
        "f",
        DeviceBatch(
            fschema,
            [Column.from_numpy(LT.BIGINT, fk), Column.from_numpy(LT.BIGINT, fv),
             Column.from_numpy(LT.BIGINT, fw)],
            n,
        ),
    )
    db.create_memory_table(
        "d",
        DeviceBatch(
            Schema.of([("k", LT.BIGINT)]),
            [Column.from_numpy(LT.BIGINT, dim_keys)],
            groups,
        ),
    )
    sql = ("select d.k, sum(f.v), count(*) from f join d on f.k = d.k "
           "group by d.k order by d.k")

    def run(enabled: bool):
        db.enable_fused_route = enabled
        db.last_fused_routes = []
        db.run_lines(sql)  # warm (compile)
        times = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            out = db.run_lines(sql)
            times.append(time.perf_counter() - t0)
        return min(times), out, list(db.last_fused_routes)

    t_routed, out_r, routes = run(True)
    assert routes, "fused route did not fire"
    t_plain, out_p, _ = run(False)
    db.enable_fused_route = True
    assert out_r == out_p, "routed result differs from general path"

    # 6-aggregate rollup: packed value (min/max) + payload sums incl. a
    # negative-valued column and a DISTINCT — the round-3 widened surface,
    # still ONE device program through the route
    multi_sql = (
        "select d.k, sum(f.v), min(f.v), max(f.v), sum(f.w), "
        "count(distinct f.v), count(*) from f join d on f.k = d.k "
        "group by d.k order by d.k"
    )

    def run_multi(enabled: bool):
        db.enable_fused_route = enabled
        db.last_fused_routes = []
        db.run_lines(multi_sql)
        times = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            out = db.run_lines(multi_sql)
            times.append(time.perf_counter() - t0)
        return min(times), out, list(db.last_fused_routes)

    tm_r, om_r, m_routes = run_multi(True)
    assert m_routes, "multi-agg route did not fire"
    tm_p, om_p, _ = run_multi(False)
    db.enable_fused_route = True
    assert om_r == om_p, "multi-agg routed result differs"

    print(json.dumps({
        "metric": "sql_star_rollup_rows_per_sec",
        "value": round(n / t_routed),
        "unit": "rows/s",
        "vs_baseline": round(t_plain / t_routed, 2),
        "detail": {
            "rows": n, "groups": groups,
            "routed_s": round(t_routed, 4),
            "general_path_s": round(t_plain, 4),
            "route": routes[0],
            "baseline": "same engine, fused route disabled",
            "multi6_routed_s": round(tm_r, 4),
            "multi6_general_s": round(tm_p, 4),
            "multi6_speedup": round(tm_p / tm_r, 2),
            "multi6_rows_per_sec": round(n / tm_r),
            "multi6_aggs": "sum/min/max(v), sum(w<0 ok), "
                           "count(distinct v), count(*)",
        },
    }))


if __name__ == "__main__":
    main()
