"""Pallas kernel correctness (interpreter mode on CPU; the same kernels
compile and run on real TPU — see the module docstring for the measured
chip numbers vs the XLA formulation)."""

import numpy as np
import jax.numpy as jnp
import pytest

import sqlrs_tpu  # noqa: F401
from sqlrs_tpu.ops.pallas_kernels import masked_row_sum, row_rank_ge


@pytest.mark.parametrize("nq", [8, 200, 1024])
def test_row_rank_ge(nq):
    rng = np.random.default_rng(0)
    nb = 64
    sp2d = np.sort(
        rng.integers(0, 10_000, (nb, 128)).astype(np.int32).ravel()
    ).reshape(nb, 128)
    b = rng.integers(0, nb, nq).astype(np.int32)
    q = rng.integers(0, 10_000, nq).astype(np.int32)
    got = np.asarray(
        row_rank_ge(jnp.asarray(sp2d), jnp.asarray(b), jnp.asarray(q), interpret=True)
    )
    exp = (sp2d[b] >= q[:, None]).sum(1)
    assert np.array_equal(got, exp)


def test_masked_row_sum():
    rng = np.random.default_rng(1)
    nb, nq = 32, 500
    v2d = rng.integers(0, 100, (nb, 128)).astype(np.int32)
    b = rng.integers(0, nb, nq).astype(np.int32)
    rem = rng.integers(0, 129, nq).astype(np.int32)
    got = np.asarray(
        masked_row_sum(jnp.asarray(v2d), jnp.asarray(b), jnp.asarray(rem), interpret=True)
    )
    exp = np.array([v2d[b[i], : rem[i]].sum() for i in range(nq)])
    assert np.array_equal(got, exp)
