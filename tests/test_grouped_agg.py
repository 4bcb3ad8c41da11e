"""Sorted-run grouped aggregation vs the legacy segment path: randomized
differential testing across types, NULL keys, NULL values, and group counts."""

import numpy as np
import pytest

import sqlrs_tpu  # noqa: F401
import jax.numpy as jnp

from sqlrs_tpu.data import Column
from sqlrs_tpu.ops.grouped_agg import sorted_grouped_aggregate
from sqlrs_tpu.types import LogicalType as LT, ScalarValue


def make_col(t, values):
    return Column.from_scalars(t, [ScalarValue(t, v) for v in values])


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nkeys", [1, 2])
def test_differential_vs_legacy(seed, nkeys):
    import jax

    from sqlrs_tpu.ops.grouping import (
        group_ids,
        seg_count_valid,
        seg_max,
        seg_min,
        seg_sum,
    )

    rng = np.random.default_rng(seed)
    n = 3000
    keys = []
    for _ in range(nkeys):
        vals = [
            None if rng.random() < 0.07 else int(rng.integers(0, 40))
            for _ in range(n)
        ]
        keys.append(make_col(LT.BIGINT, vals))
    vcol = make_col(
        LT.BIGINT,
        [None if rng.random() < 0.1 else int(rng.integers(-50, 50)) for _ in range(n)],
    )
    specs = [
        ("count", None, LT.BIGINT),
        ("count", vcol, LT.BIGINT),
        ("sum", vcol, LT.BIGINT),
        ("min", vcol, LT.BIGINT),
        ("max", vcol, LT.BIGINT),
        ("avg", vcol, LT.DOUBLE),
    ]
    gcols, acols, n_groups = sorted_grouped_aggregate(keys, specs)

    # legacy oracle
    gid, n_groups2 = group_ids(keys)
    assert n_groups == n_groups2
    rep = jax.ops.segment_min(
        jnp.arange(n, dtype=jnp.int64), gid, num_segments=n_groups
    )
    legacy_keys = [c.take(rep) for c in keys]
    for got, exp in zip(gcols, legacy_keys):
        assert got.to_pylist() == exp.to_pylist()

    counts_star = jax.ops.segment_sum(
        jnp.ones(n, jnp.int64), gid, num_segments=n_groups
    )
    assert acols[0].to_pylist() == [int(x) for x in np.asarray(counts_star)]
    cv = seg_count_valid(vcol.valid, gid, n_groups)
    assert acols[1].to_pylist() == [int(x) for x in np.asarray(cv)]
    s = seg_sum(vcol.data, vcol.valid, gid, n_groups)
    exp_sum = [
        int(x) if c > 0 else None for x, c in zip(np.asarray(s), np.asarray(cv))
    ]
    assert acols[2].to_pylist() == exp_sum
    mn = seg_min(vcol.data, vcol.valid, gid, n_groups, np.iinfo(np.int64).max)
    exp_min = [
        int(x) if c > 0 else None for x, c in zip(np.asarray(mn), np.asarray(cv))
    ]
    assert acols[3].to_pylist() == exp_min
    mx = seg_max(vcol.data, vcol.valid, gid, n_groups, np.iinfo(np.int64).min)
    exp_max = [
        int(x) if c > 0 else None for x, c in zip(np.asarray(mx), np.asarray(cv))
    ]
    assert acols[4].to_pylist() == exp_max


def test_varchar_keys_and_minmax():
    rng = np.random.default_rng(7)
    n = 2000
    words = ["alpha", "beta", "gamma", "", "delta", None]
    kvals = [words[rng.integers(0, len(words))] for _ in range(n)]
    svals = [
        None if rng.random() < 0.2 else words[rng.integers(0, 5)] for _ in range(n)
    ]
    kcol = make_col(LT.VARCHAR, kvals)
    scol = make_col(LT.VARCHAR, svals)
    gcols, acols, n_groups = sorted_grouped_aggregate(
        [kcol], [("min", scol, LT.VARCHAR), ("max", scol, LT.VARCHAR), ("count", None, LT.BIGINT)]
    )
    got_keys = gcols[0].to_pylist()
    # first-appearance order oracle
    seen, order = set(), []
    for v in kvals:
        if v not in seen:
            seen.add(v)
            order.append(v)
    assert got_keys == order
    import collections

    per = collections.defaultdict(list)
    cnt = collections.Counter()
    for k, s in zip(kvals, svals):
        cnt[k] += 1
        if s is not None:
            per[k].append(s)
    for k, mn, mx, c in zip(got_keys, acols[0].to_pylist(), acols[1].to_pylist(), acols[2].to_pylist()):
        exp_mn = min(per[k]) if per[k] else None
        exp_mx = max(per[k]) if per[k] else None
        assert (mn, mx, c) == (exp_mn, exp_mx, cnt[k]), k


def test_empty_input():
    k = make_col(LT.BIGINT, [])
    g, a, n = sorted_grouped_aggregate([k], [("count", None, LT.BIGINT)])
    assert n == 0 and len(g[0]) == 0 and len(a[0]) == 0


def test_single_group():
    k = make_col(LT.BIGINT, [5] * 100)
    v = make_col(LT.BIGINT, list(range(100)))
    g, a, n = sorted_grouped_aggregate(
        [k], [("sum", v, LT.BIGINT), ("min", v, LT.BIGINT), ("max", v, LT.BIGINT)]
    )
    assert n == 1
    assert a[0].to_pylist() == [4950]
    assert a[1].to_pylist() == [0] and a[2].to_pylist() == [99]


def test_filter_fused_into_aggregate_matches_compacted():
    """Filter directly under GROUP BY / SimpleAgg fuses as an alive-mask;
    results must match running the filter standalone (compaction path)."""
    import numpy as np

    import sqlrs_tpu
    from sqlrs_tpu.types import LogicalType as LT

    rng = np.random.default_rng(21)
    n = 40_000
    k = rng.integers(0, 50, n)
    v = rng.integers(-100, 100, n)
    db = sqlrs_tpu.Database()
    db.create_memory_table_numpy("t", [("k", LT.BIGINT), ("v", LT.BIGINT)], [k, v])
    got = db.run_lines(
        "select k, sum(v), count(*), min(v), max(v) from t where v > 10 group by k"
    )
    # oracle via numpy
    m = v > 10
    order = []
    seen = {}
    for kk in k[m]:
        if kk not in seen:
            seen[kk] = len(order)
            order.append(kk)
    exp = []
    for kk in order:
        sel = m & (k == kk)
        exp.append(
            f"{kk} {v[sel].sum()} {sel.sum()} {v[sel].min()} {v[sel].max()}"
        )
    assert got == exp
    got1 = db.run_lines("select sum(v), count(*) from t where v > 9000")
    assert got1 == ["NULL 0"]


def test_fused_filter_last_group_key_not_from_dead_row():
    """Regression: dead (filtered-out) rows sort to the tail but used to
    inherit the last live run's rid, so that group's key was read from a
    dead row. Needs a filtered-out key sorting after all surviving keys."""
    import sqlrs_tpu
    from sqlrs_tpu.types import LogicalType as LT

    db = sqlrs_tpu.Database()
    db.create_memory_table_numpy(
        "t", [("k", LT.BIGINT), ("v", LT.BIGINT)],
        [np.array([1, 2, 3]), np.array([1, 1, 0])],
    )
    got = db.run_lines("select k, sum(v) from t where v=1 group by k")
    assert got == ["1 1", "2 1"]


def test_fused_filter_dead_null_key_row():
    """Regression: a filtered-out NULL-key row (sorts last) must not make
    the last live group's key render NULL."""
    import sqlrs_tpu

    db = sqlrs_tpu.Database()
    db.run("create table t(k int, v int)")
    db.run("insert into t values (1,1),(null,0)")
    got = db.run_lines("select k, count(v) from t where v=1 group by k")
    assert got == ["1 1"]


def test_distinct_aggregates_sorted_path():
    """count/sum/avg(DISTINCT) ride the sorted-run path (one shared arg):
    oracle-checked with NULLs in values and keys, plus first-appearance
    group order."""
    import sqlrs_tpu

    rng = np.random.default_rng(5)
    n = 500
    k = rng.integers(0, 12, n)
    v = rng.integers(0, 9, n)
    knull = rng.random(n) < 0.08
    vnull = rng.random(n) < 0.15
    db = sqlrs_tpu.Database()
    db.run("create table t(k int, v int)")
    db.run("insert into t values " + ",".join(
        f"({'null' if knull[i] else int(k[i])},{'null' if vnull[i] else int(v[i])})"
        for i in range(n)))
    got = db.run_lines(
        "select k, count(distinct v), sum(distinct v), count(v), sum(v) "
        "from t group by k")
    # oracle with first-appearance order
    order, seen = [], {}
    for i in range(n):
        kk = None if knull[i] else int(k[i])
        if kk not in seen:
            seen[kk] = {"d": set(), "c": 0, "s": 0}
            order.append(kk)
        if not vnull[i]:
            seen[kk]["d"].add(int(v[i]))
            seen[kk]["c"] += 1
            seen[kk]["s"] += int(v[i])
    exp = []
    for kk in order:
        st = seen[kk]
        exp.append(
            f"{'NULL' if kk is None else kk} {len(st['d'])} "
            f"{sum(st['d']) if st['d'] else 'NULL'} {st['c']} "
            f"{st['s'] if st['c'] else 'NULL'}")
    assert got == exp


def test_distinct_aggregate_with_filter_fusion():
    import sqlrs_tpu

    db = sqlrs_tpu.Database()
    db.run("create table t(k int, v int)")
    db.run("insert into t values (1,5),(1,5),(1,6),(2,7),(2,7),(1,5),(3,1)")
    got = db.run_lines(
        "select k, count(distinct v) from t where v > 1 group by k")
    assert got == ["1 2", "2 1"]
    # avg(distinct)
    got = db.run_lines("select k, avg(distinct v) from t group by k")
    assert got == ["1 5.5", "2 7", "3 1"]


def test_distinct_varchar_count():
    import sqlrs_tpu

    db = sqlrs_tpu.Database()
    db.run("create table t(k int, s varchar)")
    db.run("insert into t values (1,'a'),(1,'b'),(1,'a'),(2,'c'),(2,null),(2,'c')")
    assert db.run_lines(
        "select k, count(distinct s) from t group by k") == ["1 2", "2 1"]
