"""ALD variant loops: inpainting, interpolation, cls-conditioned, inverse
problem (normalized + projection), re-grown clf-guided samplers."""
import numpy as np
import jax
import jax.numpy as jnp

from inverseproblemwithdiffusionmodel_tpu.samplers import (
    ALDConfig, ald_inpainting, half_mask, ald_interpolation,
    ald_cls_conditioned, ald_inverse_problem, ald_inverse_problem_proj,
    ald_inverse_clf, ald_inverse_clf_proximal)
from inverseproblemwithdiffusionmodel_tpu.operators import (
    RandomUndersamplingFourier, SingleCoil)
from inverseproblemwithdiffusionmodel_tpu.utils import add_phase, nrmse
from inverseproblemwithdiffusionmodel_tpu.utils.misc import stack_parts

H = W = 16


def target():
    yy, xx = jnp.mgrid[0:H, 0:W]
    return jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]


def score_of(x_t, sigmas):
    def fn(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = jnp.broadcast_to(x_t, x.shape) if x.shape[0] != 2 * x_t.shape[0] \
            else stack_parts(x_t, jnp.zeros_like(x_t))
        return (tgt - x) / sig ** 2
    return fn


def sigmas_default(L=40):
    return jnp.exp(jnp.linspace(jnp.log(1.0), jnp.log(0.01), L))


def test_inpainting_respects_known_pixels():
    x_t = target()
    sigmas = sigmas_default()
    score = score_of(x_t, sigmas)
    mask = half_mask(x_t.shape)
    cfg = ALDConfig(n_steps_each=3, step_lr=3e-5)
    out = ald_inpainting(score, sigmas, x_t, mask, jax.random.PRNGKey(0), cfg)
    assert float(nrmse(out[0], x_t[0])) < 0.1


def test_interpolation_shapes_and_endpoint_spread():
    x_t = target()
    sigmas = sigmas_default(20)
    score = score_of(x_t, sigmas)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    out = ald_interpolation(score, sigmas, jnp.tile(x_t, (2, 1, 1, 1)), 4,
                            jax.random.PRNGKey(0), cfg)
    assert out.shape == (8, H, W, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cls_conditioned_pulls_toward_class():
    """With a linear 'classifier' whose class-1 logit grows with the mean
    pixel, guidance must raise the sample mean vs unguided."""
    x_t = target()
    sigmas = sigmas_default()
    score = score_of(x_t, sigmas)

    def clf_fn(x):
        m = jnp.mean(x, axis=(1, 2, 3))
        return jnp.stack([-5.0 * m, 5.0 * m], axis=-1)

    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5, denoise=False)
    cls1 = jnp.ones((1,), jnp.int32)
    guided = ald_cls_conditioned(score, clf_fn, cls1, sigmas, (1, H, W, 1),
                                 jax.random.PRNGKey(0), cfg)
    cls0 = jnp.zeros((1,), jnp.int32)
    anti = ald_cls_conditioned(score, clf_fn, cls0, sigmas, (1, H, W, 1),
                               jax.random.PRNGKey(0), cfg)
    assert float(guided.mean()) > float(anti.mean())


def test_inverse_problem_normalized_mixing_reconstructs():
    x_t = target()
    z = add_phase(x_t, jax.random.PRNGKey(3))
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(z)
    sigmas = sigmas_default()
    score = score_of(x_t, sigmas)
    cfg = ALDConfig(n_steps_each=3, step_lr=3e-5)
    out = ald_inverse_problem(score, sigmas, y, op, 1.0,
                              jax.random.PRNGKey(0), cfg)
    zf = float(nrmse(jnp.abs(op.conj_op(y))[0], x_t[0]))
    rec = float(nrmse(jnp.abs(out)[0], x_t[0]))
    assert rec < zf


def test_inverse_problem_proj_reconstructs():
    x_t = target()
    z = add_phase(x_t, jax.random.PRNGKey(3))
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(z)
    sigmas = sigmas_default()
    # complex target score (Re pulled to x_t, Im to 0 via interleave)
    score = score_of(x_t, sigmas)
    cfg = ALDConfig(n_steps_each=3, step_lr=3e-5)
    out = ald_inverse_problem_proj(score, sigmas, y, op, 0.5,
                                   jax.random.PRNGKey(0), cfg)
    rec = float(nrmse(jnp.abs(out)[0], jnp.abs(z)[0]))
    zf = float(nrmse(jnp.abs(op.conj_op(y))[0], jnp.abs(z)[0]))
    assert rec < zf


def test_inverse_clf_and_proximal_run():
    x_t = target()
    z = x_t.astype(jnp.complex64)
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(z)
    sigmas = sigmas_default(20)
    score = score_of(x_t, sigmas)

    def clf_fn(x):
        m = jnp.mean(x, axis=(1, 2, 3))
        return jnp.stack([-m, m], axis=-1)

    cls = jnp.ones((1,), jnp.int32)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    out1 = ald_inverse_clf(score, clf_fn, cls, sigmas, y, op, 1.0,
                           jax.random.PRNGKey(0), cfg)
    assert np.isfinite(np.asarray(out1)).all()
    prox = SingleCoil(lin_tfm=op)
    out2 = ald_inverse_clf_proximal(score, clf_fn, cls, sigmas, y, op, prox,
                                    jax.random.PRNGKey(0), cfg,
                                    lr_scaled=100.0)
    assert np.iscomplexobj(np.asarray(out2))
    rec = float(nrmse(jnp.abs(out2)[0], x_t[0]))
    zf = float(nrmse(jnp.abs(op.conj_op(y))[0], x_t[0]))
    assert rec < zf
