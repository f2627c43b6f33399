"""Linear transform adjoint/roundtrip properties and proximal verification.

The adjoint tests <Ax, y> == <x, A^H y> are the framework equivalents of the
reference's in-situ checks (SURVEY.md section 4); the prox tests port
`check_solution` (ncsn/models/proximal_op.py:53-59,96-104) into real tests.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.ops.fft import i2k_complex, k2i_complex
from inverseproblemwithdiffusionmodel_tpu.operators import (
    SkipLines, UndersamplingFourier, RandomUndersamplingFourier, SENSE,
    make_sense, FiniteDiff, L2Penalty, SingleCoil, Constrained, get_proximal,
    generate_mask)


def _cdot(a, b):
    return complex(jnp.sum(jnp.conj(a) * b))


def _rand_complex(key, shape):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, shape) +
            1j * jax.random.normal(k2, shape)).astype(jnp.complex64)


# ---------------------------------------------------------------------------
# FFT
# ---------------------------------------------------------------------------

def test_fft_roundtrip_and_unitarity():
    key = jax.random.PRNGKey(0)
    x = _rand_complex(key, (2, 16, 16, 1))
    k = i2k_complex(x)
    x_back = k2i_complex(k)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
    # orthonormal: energy preserved
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(k) ** 2)),
                               float(jnp.sum(jnp.abs(x) ** 2)), rtol=1e-5)


def test_fft_centering():
    # a constant image has all k-space energy at the center pixel
    x = jnp.ones((1, 8, 8, 1), jnp.complex64)
    k = np.asarray(i2k_complex(x))
    center = np.abs(k[0, 4, 4, 0])
    assert center > 0.99 * np.abs(k).sum()


# ---------------------------------------------------------------------------
# Adjoint tests: <Ax, y> == <x, A^H y>
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("make_op,img_shape", [
    (lambda: SkipLines(num_skip_lines=2, height=16), (2, 16, 12, 1)),
    (lambda: UndersamplingFourier.create(2, 16), (2, 16, 12, 1)),
    (lambda: RandomUndersamplingFourier.create(
        8, 0.1, (16, 16, 1), seed=0, num_frames=1), (2, 16, 16, 1)),
    (lambda: make_sense("exp", 4, 8, 0.1, (16, 16, 1), seed=0, num_frames=1),
     (2, 16, 16, 1)),
    (lambda: FiniteDiff(dims=1), (2, 16, 16, 1)),
])
def test_adjoint_property(make_op, img_shape):
    """<Ax, y> == <x, A^H y> for y in range(A).

    y is drawn from the range of A because the Fourier operators implement
    A^H only on the measurement subspace (the reference's conj_op skips the
    mask re-application, undersampling_fourier.py:84-87) - measurements
    always live there.
    """
    op = make_op()
    key = jax.random.PRNGKey(1)
    x = _rand_complex(key, img_shape)
    Ax = op(x)
    y = op(_rand_complex(jax.random.PRNGKey(2), img_shape))
    lhs = _cdot(Ax, y)
    rhs = _cdot(x, op.conj_op(y))
    assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs))


def test_skip_lines_shapes():
    op = SkipLines(num_skip_lines=4, height=16)
    x = jnp.ones((1, 16, 8, 1), jnp.complex64)
    s = op(x)
    assert s.shape == (1, 4, 8, 1)
    back = op.conj_op(s)
    assert back.shape == (1, 16, 8, 1)
    np.testing.assert_array_equal(np.asarray(back[:, 1]), 0)


def test_generate_mask_properties():
    m = generate_mask(4, 64, seed=0)
    assert m.shape == (4, 1, 64)
    # center two lines always kept
    np.testing.assert_array_equal(m[:, 0, 31:33], 1.0)
    m1 = generate_mask(1, 64, seed=0)
    assert m1.shape == (1, 64)
    # deterministic under the same seed
    np.testing.assert_array_equal(generate_mask(4, 64, seed=5),
                                  generate_mask(4, 64, seed=5))


def test_sense_energy_and_forward_shape():
    op = make_sense("exp", 4, 8, 0.1, (16, 16, 1), seed=0, num_frames=1)
    energy = np.asarray((jnp.abs(op.sens_maps) ** 2).sum(axis=0))
    np.testing.assert_allclose(energy, 1.0, atol=1e-5)
    x = _rand_complex(jax.random.PRNGKey(0), (3, 16, 16, 1))
    s = op(x)
    assert s.shape == (4, 3, 16, 16, 1)
    assert op.conj_op(s).shape == (3, 16, 16, 1)
    # ssos of a noiseless fully-sampled measurement should be close to |x|
    assert op.ssos(s).shape == (3, 16, 16, 1)


def test_projection_keeps_measurement():
    """With lamda=1 the sampled k-space lines are replaced by the
    measurement (reference: undersampling_fourier.py:89-97)."""
    op = RandomUndersamplingFourier.create(8, 0.1, (16, 16, 1), seed=0,
                                           num_frames=1)
    key = jax.random.PRNGKey(0)
    x_true = _rand_complex(key, (1, 16, 16, 1))
    y = op(x_true)
    x_guess = _rand_complex(jax.random.PRNGKey(9), (1, 16, 16, 1))
    x_proj = op.projection(x_guess, y, 1.0)
    np.testing.assert_allclose(np.asarray(op(x_proj)), np.asarray(y), atol=1e-4)


def test_finite_diff_tv_grad_descent_direction():
    op = FiniteDiff(dims=1)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 1),
                    dtype=jnp.float32)
    tv0 = float(op.tv_norm(x).sum())
    x2 = x + 1e-3 * op.log_lh_grad(x)
    tv1 = float(op.tv_norm(x2).sum())
    assert tv1 < tv0  # the subgradient step reduces TV


# ---------------------------------------------------------------------------
# Proximal operators: normal-equation residual (ported check_solution)
# ---------------------------------------------------------------------------

def test_single_coil_prox_normal_equation():
    op = RandomUndersamplingFourier.create(8, 0.1, (16, 16, 1), seed=0,
                                           num_frames=1)
    prox = SingleCoil(lin_tfm=op)
    key = jax.random.PRNGKey(0)
    z = _rand_complex(key, (2, 16, 16, 1))
    y = op(_rand_complex(jax.random.PRNGKey(1), (2, 16, 16, 1)))
    x = prox(z, y, alpha=0.5, lamda=1.0)
    resid = float(prox.check_solution(x, z, y, 0.5, 1.0))
    assert resid < 1e-6


def test_l2penalty_cg_matches_closed_form():
    """CG L2Penalty must agree with the SingleCoil closed form on the
    single-coil problem."""
    op = RandomUndersamplingFourier.create(8, 0.1, (16, 16, 1), seed=0,
                                           num_frames=1)
    key = jax.random.PRNGKey(0)
    z = _rand_complex(key, (2, 16, 16, 1))
    y = op(_rand_complex(jax.random.PRNGKey(1), (2, 16, 16, 1)))
    x_cf = SingleCoil(lin_tfm=op)(z, y, 0.7, 1.0)
    x_cg = L2Penalty(lin_tfm=op, num_iters=8)(z, y, 0.7, 1.0)
    np.testing.assert_allclose(np.asarray(x_cg), np.asarray(x_cf), atol=1e-4)


def test_l2penalty_cg_sense_normal_equation():
    op = make_sense("exp", 4, 8, 0.1, (16, 16, 1), seed=0, num_frames=1)
    prox = L2Penalty(lin_tfm=op, num_iters=10)
    key = jax.random.PRNGKey(0)
    z = _rand_complex(key, (1, 16, 16, 1))
    y = op(_rand_complex(jax.random.PRNGKey(1), (1, 16, 16, 1)))
    x = prox(z, y, alpha=0.5, lamda=1.0)
    resid = float(prox.check_solution(x, z, y, 0.5, 1.0))
    base = float(jnp.sum(jnp.abs(z) ** 2))
    assert resid < 1e-6 * base


def test_constrained_prox_is_projection():
    op = RandomUndersamplingFourier.create(8, 0.1, (16, 16, 1), seed=0,
                                           num_frames=1)
    prox = Constrained(lin_tfm=op)
    key = jax.random.PRNGKey(0)
    z = _rand_complex(key, (1, 16, 16, 1))
    y = op(_rand_complex(jax.random.PRNGKey(1), (1, 16, 16, 1)))
    out = prox(z, y, 1.0)
    np.testing.assert_allclose(np.asarray(op(out)), np.asarray(y), atol=1e-4)


def test_get_proximal_dispatch():
    assert get_proximal("L2Penalty") is L2Penalty
    assert get_proximal("SingleCoil") is SingleCoil
    assert get_proximal("Constrained") is Constrained
    with pytest.raises(NotImplementedError):
        get_proximal("nope")


def test_prox_inside_jit():
    """Operators are pytrees: they can cross jit boundaries as arguments."""
    op = RandomUndersamplingFourier.create(8, 0.1, (16, 16, 1), seed=0,
                                           num_frames=1)
    prox = SingleCoil(lin_tfm=op)

    @jax.jit
    def run(prox, z, y):
        return prox(z, y, 0.5, 1.0)

    z = _rand_complex(jax.random.PRNGKey(0), (1, 16, 16, 1))
    y = op(z)
    out = run(prox, z, y)
    assert out.shape == z.shape
