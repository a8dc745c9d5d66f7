"""Pallas kernel vs jnp reference op equivalence (interpret mode on CPU).

On real TPU the same kernels are exercised by the benchmark harness; here
interpret mode validates the blocking/accumulation logic on the CPU mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from spec_viterbi_tpu.ops import tropical


def _interpret(fn):
    def wrapped(*args, **kwargs):
        with jax.disable_jit():
            import unittest.mock as mock

            orig = pl.pallas_call

            def patched(*a, **k):
                k["interpret"] = True
                return orig(*a, **k)

            with mock.patch.object(pl, "pallas_call", patched):
                return fn(*args, **kwargs)

    return wrapped


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def _rand_modprob(rng, shape, inf_frac=0.3):
    """Random −log2-space matrix with a realistic fraction of +inf zeros."""
    x = rng.uniform(0.0, 30.0, size=shape).astype(np.float32)
    mask = rng.uniform(size=shape) < inf_frac
    x[mask] = np.inf
    return x


def test_tropical_mv_kernel(rng):
    from spec_viterbi_tpu.ops import pallas_kernels

    m = _rand_modprob(rng, (256, 256))
    v = _rand_modprob(rng, (256,))
    expected = tropical.tropical_mv(jnp.asarray(m), jnp.asarray(v))
    got = _interpret(pallas_kernels.tropical_mv)(m, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_tropical_mv_argmin_kernel(rng):
    from spec_viterbi_tpu.ops import pallas_kernels

    m = _rand_modprob(rng, (128, 128))
    v = _rand_modprob(rng, (128,))
    e_val, e_idx = tropical.tropical_mv_argmin(jnp.asarray(m), jnp.asarray(v))
    g_val, g_idx = _interpret(pallas_kernels.tropical_mv_argmin)(m, v)
    np.testing.assert_allclose(np.asarray(g_val), np.asarray(e_val), rtol=1e-6)
    # argmin ties must resolve identically (lowest index)
    np.testing.assert_array_equal(np.asarray(g_idx), np.asarray(e_idx))


@pytest.mark.parametrize("shape", [(128, 128, 128), (128, 256, 128), (256, 128, 256)])
def test_tropical_matmul_kernel(rng, shape):
    from spec_viterbi_tpu.ops import pallas_kernels

    i, k, j = shape
    a = _rand_modprob(rng, (i, k))
    b = _rand_modprob(rng, (k, j))
    expected = tropical.tropical_mm_blocked(jnp.asarray(a), jnp.asarray(b))
    got = _interpret(pallas_kernels.tropical_matmul)(a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_tropical_matmul_tn_matches_jnp_tn(rng):
    from spec_viterbi_tpu.ops import pallas_kernels

    at = _rand_modprob(rng, (256, 128))
    b = _rand_modprob(rng, (256, 128))
    expected = tropical.tropical_mm_tn_blocked(jnp.asarray(at), jnp.asarray(b))
    got = _interpret(pallas_kernels.tropical_matmul_tn)(at, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_tropical_matmul_all_inf_row(rng):
    """A fully-+inf row/col must stay at the semiring zero (no NaNs)."""
    from spec_viterbi_tpu.ops import pallas_kernels

    a = _rand_modprob(rng, (128, 128), inf_frac=0.0)
    a[3, :] = np.inf
    b = _rand_modprob(rng, (128, 128), inf_frac=0.0)
    b[:, 7] = np.inf
    got = np.asarray(_interpret(pallas_kernels.tropical_matmul)(a, b))
    assert np.all(np.isposinf(got[3, :]))
    assert np.all(np.isposinf(got[:, 7]))
    assert not np.any(np.isnan(got))
