"""Distributed operator tests on the 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import sqlrs_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from sqlrs_tpu.parallel.dist_ops import (
    dist_join_groupby_broadcast,
    dist_join_groupby_shuffle,
    dist_sort,
    partition_shuffle,
)
from sqlrs_tpu.parallel.mesh import make_mesh, replicated, row_sharding


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def data(mesh):
    rng = np.random.default_rng(0)
    n, groups = 16_000, 64
    gid = np.minimum(rng.zipf(1.3, n), groups).astype(np.int64) - 1
    dim_keys = np.arange(groups, dtype=np.int64) * 7 + 3
    fact_keys = dim_keys[gid]
    fact_vals = rng.integers(0, 10, n).astype(np.int64)
    exp_s = np.zeros(groups, np.int64)
    exp_c = np.zeros(groups, np.int64)
    np.add.at(exp_s, gid, fact_vals)
    np.add.at(exp_c, gid, 1)
    fk = jax.device_put(jnp.asarray(fact_keys), row_sharding(mesh))
    fv = jax.device_put(jnp.asarray(fact_vals), row_sharding(mesh))
    dk = jax.device_put(jnp.asarray(dim_keys), replicated(mesh))
    return dict(
        n=n, groups=groups, fk=fk, fv=fv, dk=dk, exp_s=exp_s, exp_c=exp_c,
        fact_keys=fact_keys,
    )


def test_broadcast_join_groupby(mesh, data):
    sums, counts = dist_join_groupby_broadcast(
        mesh, data["fk"], data["fv"], data["dk"], data["groups"]
    )
    assert np.array_equal(np.asarray(sums), data["exp_s"])
    assert np.array_equal(np.asarray(counts), data["exp_c"])


def test_shuffle_join_groupby(mesh, data):
    sums, counts, overflow = dist_join_groupby_shuffle(
        mesh, data["fk"], data["fv"], data["dk"], data["groups"],
        bucket_capacity=data["n"] // 2,
    )
    assert int(np.asarray(overflow)) == 0
    assert np.array_equal(np.asarray(sums), data["exp_s"])
    assert np.array_equal(np.asarray(counts), data["exp_c"])


def test_partition_shuffle_places_rows_by_hash(mesh, data):
    from sqlrs_tpu.ops.hash_table import hash_keys

    valid = jnp.ones((data["n"],), jnp.bool_)
    k, v, m, overflow = partition_shuffle(
        mesh, data["fk"], data["fv"], valid, bucket_capacity=data["n"] // 2
    )
    assert int(jnp.sum(overflow)) == 0
    k_np, m_np = np.asarray(k), np.asarray(m)
    n_dev = 8
    per_dev = k_np.reshape(n_dev, -1)
    per_dev_m = m_np.reshape(n_dev, -1)
    dest = np.asarray(hash_keys(jnp.asarray(data["fact_keys"]), 1 << 32)) % n_dev
    import collections

    expected_per_dev = collections.Counter(dest.tolist())
    for d in range(n_dev):
        live_keys = per_dev[d][per_dev_m[d]]
        assert len(live_keys) == expected_per_dev[d]
        # every row landed on its hash-designated shard
        got_dest = np.asarray(hash_keys(jnp.asarray(live_keys), 1 << 32)) % n_dev
        assert np.all(got_dest == d)


def test_dist_sort_globally_sorted(mesh, data):
    ks, valid = dist_sort(mesh, data["fk"], bucket_capacity=data["n"])
    ks = np.asarray(ks).reshape(-1)
    valid = np.asarray(valid).reshape(-1)
    got = ks[valid]
    assert len(got) == data["n"]
    assert np.array_equal(np.sort(got), np.sort(data["fact_keys"]))
    assert np.all(np.diff(got) >= 0)


def test_scaling_efficiency_shapes(mesh, data):
    # the same program compiles at 2 and 8 devices (shape flexibility)
    m2 = make_mesh(2)
    fk = jax.device_put(jnp.asarray(data["fact_keys"]), row_sharding(m2))
    fv2 = jax.device_put(
        jnp.asarray(np.ones(data["n"], np.int64)), row_sharding(m2)
    )
    dk2 = jax.device_put(
        jnp.asarray(np.arange(data["groups"], dtype=np.int64) * 7 + 3),
        replicated(m2),
    )
    sums, counts = dist_join_groupby_broadcast(m2, fk, fv2, dk2, data["groups"])
    assert int(jnp.sum(counts)) == data["n"]


def test_salted_join_groupby_extreme_skew(mesh):
    from sqlrs_tpu.parallel.dist_ops import dist_join_groupby_salted

    rng = np.random.default_rng(1)
    n, groups = 32_000, 64
    # 80% of rows share one key: without salting a per-destination bucket
    # would need ~0.8*n capacity; salting spreads it so n/4 suffices
    gid = np.where(rng.random(n) < 0.8, 0, rng.integers(1, groups, n)).astype(
        np.int64
    )
    dim_keys = np.arange(groups, dtype=np.int64) * 7 + 3
    fk = jax.device_put(jnp.asarray(dim_keys[gid]), row_sharding(mesh))
    fv = jax.device_put(
        jnp.asarray(rng.integers(0, 10, n).astype(np.int64)), row_sharding(mesh)
    )
    dk = jax.device_put(jnp.asarray(dim_keys), replicated(mesh))
    exp_s = np.zeros(groups, np.int64)
    exp_c = np.zeros(groups, np.int64)
    np.add.at(exp_s, gid, np.asarray(fv))
    np.add.at(exp_c, gid, 1)
    sums, cnts, overflow = dist_join_groupby_salted(
        mesh, fk, fv, dk, groups, bucket_capacity=n // 4, hot_capacity=64
    )
    assert int(np.asarray(overflow)) == 0
    assert np.array_equal(np.asarray(sums), exp_s)
    assert np.array_equal(np.asarray(cnts), exp_c)


def test_ring_join_groupby(mesh, data):
    from sqlrs_tpu.parallel.dist_ops import dist_join_groupby_ring

    dk_sharded = jax.device_put(
        jnp.asarray(np.arange(data["groups"], dtype=np.int64) * 7 + 3),
        row_sharding(mesh),
    )
    sums, counts = dist_join_groupby_ring(
        mesh, data["fk"], data["fv"], dk_sharded, data["groups"]
    )
    assert np.array_equal(np.asarray(sums), data["exp_s"])
    assert np.array_equal(np.asarray(counts), data["exp_c"])


def test_ring_join_groupby_unpadded_sizes(mesh):
    """Fact and dim sizes not multiples of n_dev exercise the padding path."""
    from sqlrs_tpu.parallel.dist_ops import dist_join_groupby_ring

    rng = np.random.default_rng(7)
    n, groups = 1003, 37
    dim_keys = np.arange(groups, dtype=np.int64) * 11 + 5
    gid = rng.integers(0, groups, n)
    fk = jnp.asarray(dim_keys[gid])
    fv = jnp.asarray(rng.integers(0, 10, n).astype(np.int64))
    exp_s = np.zeros(groups, np.int64)
    exp_c = np.zeros(groups, np.int64)
    np.add.at(exp_s, gid, np.asarray(fv))
    np.add.at(exp_c, gid, 1)
    sums, counts = dist_join_groupby_ring(mesh, fk, fv, jnp.asarray(dim_keys), groups)
    assert np.array_equal(np.asarray(sums), exp_s)
    assert np.array_equal(np.asarray(counts), exp_c)


def test_shuffle_overflow_is_reported_then_retried(mesh, data):
    """Forcing exchange overflow must be VISIBLE (overflow > 0), and the
    checked wrapper must converge to exact results by growing capacity —
    silent row drops are a correctness bug (VERDICT round-2 item 2)."""
    from sqlrs_tpu.parallel.dist_ops import dist_join_groupby_shuffle_checked

    tiny = 16  # far below the ~x/8 rows each (sender, receiver) pair needs
    _, _, overflow = dist_join_groupby_shuffle(
        mesh, data["fk"], data["fv"], data["dk"], data["groups"],
        bucket_capacity=tiny,
    )
    assert int(np.asarray(overflow)) > 0
    sums, counts = dist_join_groupby_shuffle_checked(
        mesh, data["fk"], data["fv"], data["dk"], data["groups"],
        bucket_capacity=tiny,
    )
    assert np.array_equal(np.asarray(sums), data["exp_s"])
    assert np.array_equal(np.asarray(counts), data["exp_c"])


def test_salted_hot_truncation_is_reported_then_retried(mesh):
    """Hot dim rows beyond hot_capacity and overflowing fact buckets must
    surface as overflow; the checked wrapper grows BOTH capacities until the
    skewed join is exact."""
    from sqlrs_tpu.parallel.dist_ops import (
        dist_join_groupby_salted,
        dist_join_groupby_salted_checked,
    )

    rng = np.random.default_rng(3)
    n, groups = 8_000, 512
    # every key lands in a hot bucket's neighborhood: with hot_capacity=1
    # some hot dim rows MUST be truncated unless the wrapper grows it
    gid = np.where(rng.random(n) < 0.9, 0, rng.integers(1, groups, n)).astype(
        np.int64
    )
    dim_keys = np.arange(groups, dtype=np.int64) * 7 + 3
    fk = jax.device_put(jnp.asarray(dim_keys[gid]), row_sharding(mesh))
    fv = jax.device_put(
        jnp.asarray(rng.integers(0, 10, n).astype(np.int64)), row_sharding(mesh)
    )
    dk = jax.device_put(jnp.asarray(dim_keys), replicated(mesh))
    exp_s = np.zeros(groups, np.int64)
    exp_c = np.zeros(groups, np.int64)
    np.add.at(exp_s, gid, np.asarray(fv))
    np.add.at(exp_c, gid, 1)
    _, _, overflow = dist_join_groupby_salted(
        mesh, fk, fv, dk, groups, bucket_capacity=32, hot_capacity=1,
        hot_factor=0.5,
    )
    assert int(np.asarray(overflow)) > 0
    sums, cnts = dist_join_groupby_salted_checked(
        mesh, fk, fv, dk, groups, bucket_capacity=32, hot_capacity=1,
        hot_factor=0.5,
    )
    assert np.array_equal(np.asarray(sums), exp_s)
    assert np.array_equal(np.asarray(cnts), exp_c)


def test_shuffle_partitions_by_key(mesh):
    """The exchange hash must consume the KEY encodings (enc, valid) — not
    the validity bits. Under the round-3 unpack bug every valid row hashed
    identically, so one destination received everything: the skew detector
    flagged hot buckets on uniform DISTINCT keys and buckets overflowed at
    2x-average capacity. Pins: no hot buckets, no overflow, m == 1."""
    from sqlrs_tpu.parallel.dist_join import shuffle_join_phase_a

    n = 4096
    rng = np.random.default_rng(5)
    keys = np.arange(n, dtype=np.int64)
    perm = rng.permutation(n)
    ones = jnp.ones((n,), jnp.bool_)

    def put(x, sh=None):
        return jax.device_put(jnp.asarray(x), sh or row_sharding(mesh))

    b_enc, b_rowid = put(keys), put(np.arange(n, dtype=np.int64))
    p_enc, p_rowid = put(keys[perm]), put(np.arange(n, dtype=np.int64))
    valid = put(np.ones(n, np.bool_))
    a = shuffle_join_phase_a(
        mesh,
        [(b_enc, valid)], [], b_rowid, valid,
        [(p_enc, valid)], [], p_rowid, valid,
        bucket_b=2 * n // 8, bucket_p=2 * n // 8, hot_capacity=64,
    )
    assert a.overflow == 0
    assert a.n_hot_buckets == 0
    assert a.m == 1
    del ones


def test_ring_probe_exchange_bit_identical(mesh):
    """ring=True stages the probe exchange in ppermute hops with per-chunk
    rank sorts overlapping the next receive (dist_join._ring_probe_ranks).
    Every phase-A output array must be BIT-IDENTICAL to the monolithic
    all_to_all + single-rank-pass path — same sender-major layout, same
    starts/counts/order, same skew/overflow accounting."""
    from sqlrs_tpu.parallel.dist_join import shuffle_join_phase_a

    n = 4096
    rng = np.random.default_rng(11)
    bkeys = rng.integers(0, 500, n).astype(np.int64)  # duplicate build keys
    pkeys = rng.integers(0, 700, n).astype(np.int64)  # misses included
    pkeys[::5] = 3  # a hot probe key
    bpay = rng.integers(-50, 50, n).astype(np.int64)
    bval = np.ones(n, np.bool_)
    bval[::17] = False  # NULL build keys never match

    def put(x):
        return jax.device_put(jnp.asarray(x), row_sharding(mesh))

    args = dict(
        bucket_b=2 * n // 8, bucket_p=2 * n // 8, hot_capacity=256,
    )
    outs = {}
    for ring in (False, True):
        a = shuffle_join_phase_a(
            mesh,
            [(put(bkeys), put(bval))], [put(bpay)],
            put(np.arange(n, dtype=np.int64)), put(np.ones(n, np.bool_)),
            [(put(pkeys), put(np.ones(n, np.bool_)))], [],
            put(np.arange(n, dtype=np.int64)), put(np.ones(n, np.bool_)),
            ring=ring, **args,
        )
        outs[ring] = a
    a0, a1 = outs[False], outs[True]
    assert a0.overflow == a1.overflow == 0
    assert a0.m == a1.m
    assert a0.n_hot_buckets == a1.n_hot_buckets
    for x, y in zip(a0.build_arrays, a1.build_arrays):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    assert np.array_equal(np.asarray(a0.build_mask), np.asarray(a1.build_mask))
    for x, y in zip(a0.probe_arrays, a1.probe_arrays):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    assert np.array_equal(np.asarray(a0.probe_mask), np.asarray(a1.probe_mask))
    assert np.array_equal(np.asarray(a0.starts), np.asarray(a1.starts))
    assert np.array_equal(np.asarray(a0.counts), np.asarray(a1.counts))
    assert np.array_equal(np.asarray(a0.order), np.asarray(a1.order))
