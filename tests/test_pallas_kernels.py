"""Pallas kernels vs the XLA reference implementations (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import inverseproblemwithdiffusionmodel_tpu.ops.pallas_kernels as pk
from inverseproblemwithdiffusionmodel_tpu.ops.upfirdn2d import (
    upsample_2d, downsample_2d)
from inverseproblemwithdiffusionmodel_tpu.ops.fused_act import fused_leaky_relu


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def test_fused_leaky_relu_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16))
    b = jax.random.normal(jax.random.PRNGKey(1), (16,))
    out = pk.fused_leaky_relu_pallas(x, b)
    ref = fused_leaky_relu(x, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_grad():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    b = jax.random.normal(jax.random.PRNGKey(1), (8,))

    def f_pallas(x, b):
        return jnp.sum(pk.fused_leaky_relu_pallas(x, b) ** 2)

    def f_ref(x, b):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    gx_p, gb_p = jax.grad(f_pallas, argnums=(0, 1))(x, b)
    gx_r, gb_r = jax.grad(f_ref, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [None, (1, 3, 3, 1), (1, 2, 1), (1, 1)])
@pytest.mark.parametrize("gain", [1.0, 2.0])
def test_upsample2x_matches_xla(k, gain):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
    out = pk.upsample2x_pallas(x, k, gain=gain)
    ref = upsample_2d(x, k, factor=2, gain=gain)
    assert out.shape == ref.shape == (2, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [None, (1, 3, 3, 1), (1, 2, 1), (1, 1)])
@pytest.mark.parametrize("gain", [1.0, 2.0])
def test_downsample2x_matches_xla(k, gain):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
    out = pk.downsample2x_pallas(x, k, gain=gain)
    ref = downsample_2d(x, k, factor=2, gain=gain)
    assert out.shape == ref.shape == (2, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fir_dispatchers_fwd_and_grad_match_xla():
    """Auto-dispatch wrappers: forward equals XLA impl; VJP (via
    linear_transpose) equals XLA autodiff."""
    import jax
    from inverseproblemwithdiffusionmodel_tpu.ops.pallas_kernels import (
        fir_upsample_2x, fir_downsample_2x)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    k = (1, 3, 3, 1)
    np.testing.assert_allclose(np.asarray(fir_upsample_2x(x, k)),
                               np.asarray(upsample_2d(x, k, factor=2)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fir_downsample_2x(x, k)),
                               np.asarray(downsample_2d(x, k, factor=2)),
                               atol=1e-5)
    f1 = lambda v: jnp.sum(jnp.sin(fir_upsample_2x(v, k)))
    f2 = lambda v: jnp.sum(jnp.sin(upsample_2d(v, k, factor=2)))
    np.testing.assert_allclose(np.asarray(jax.grad(f1)(x)),
                               np.asarray(jax.grad(f2)(x)), atol=1e-5)
    g1 = lambda v: jnp.sum(jnp.sin(fir_downsample_2x(v, k)))
    g2 = lambda v: jnp.sum(jnp.sin(downsample_2d(v, k, factor=2)))
    np.testing.assert_allclose(np.asarray(jax.grad(g1)(x)),
                               np.asarray(jax.grad(g2)(x)), atol=1e-5)
