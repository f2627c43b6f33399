"""ALD / MAP / TV samplers: convergence with analytic scores, semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.samplers import (
    ALDConfig, MAPConfig, ald_unconditional_sampler,
    ald_inverse_seg_proximal_real_imag, ald_2d_time, map_optimizer,
    map_optimizer_2d_time, tv_reconstruction)
from inverseproblemwithdiffusionmodel_tpu.samplers.ald import (
    compute_clf_grad, compute_seg_grad, interp_sigmas_T)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder
from inverseproblemwithdiffusionmodel_tpu.operators import (
    RandomUndersamplingFourier, SingleCoil, L2Penalty, make_sense)
from inverseproblemwithdiffusionmodel_tpu.utils import add_phase, nrmse


H = W = 16


def make_target():
    yy, xx = jnp.mgrid[0:H, 0:W]
    mag = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    return add_phase(mag, jax.random.PRNGKey(7))


def make_score_fn(x_target_complex, sigmas):
    """Analytic score of a prior concentrated at x_target: handles the
    interleaved [Re, Im] batches the inverse samplers produce
    (utils.misc.stack_parts row order: 2i = Re_i, 2i+1 = Im_i)."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import stack_parts
    re = jnp.real(x_target_complex)
    im = jnp.imag(x_target_complex)

    def score_fn(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        B = x.shape[0]
        if B == 2 * re.shape[0]:
            target = stack_parts(re, im)
        else:
            target = jnp.broadcast_to(re, x.shape)
        return (target - x) / sig**2

    return score_fn


def test_unconditional_ald_converges():
    sigmas = sigma_ladder(1.0, 0.01, 50)
    x_t = jnp.real(make_target())
    score = make_score_fn(make_target(), sigmas)
    cfg = ALDConfig(n_steps_each=3, step_lr=3e-5)
    out = ald_unconditional_sampler(score, sigmas, (1, H, W, 1),
                                    jax.random.PRNGKey(0), cfg)
    assert float(nrmse(out[0], x_t[0])) < 0.05


def test_unconditional_ald_deterministic_given_key():
    sigmas = sigma_ladder(1.0, 0.01, 10)
    score = make_score_fn(make_target(), sigmas)
    # denoise=False: with the analytic concentrated prior the final denoise
    # step maps x exactly onto the target, erasing key-dependence
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5, denoise=False)
    a = ald_unconditional_sampler(score, sigmas, (1, H, W, 1),
                                  jax.random.PRNGKey(5), cfg)
    b = ald_unconditional_sampler(score, sigmas, (1, H, W, 1),
                                  jax.random.PRNGKey(5), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    c = ald_unconditional_sampler(score, sigmas, (1, H, W, 1),
                                  jax.random.PRNGKey(6), cfg)
    assert not np.allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_inverse_recon_beats_zero_filled():
    x_true = make_target()
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(x_true)
    zf = float(nrmse(jnp.abs(op.conj_op(y)), jnp.abs(x_true)))
    sigmas = sigma_ladder(1.0, 0.01, 40)
    score = make_score_fn(x_true, sigmas)
    cfg = ALDConfig(n_steps_each=3, step_lr=3e-5)
    recon = ald_inverse_seg_proximal_real_imag(
        score, sigmas, y, op, SingleCoil(lin_tfm=op),
        jax.random.PRNGKey(0), cfg, lr_scaled=10.0)
    err = float(nrmse(jnp.abs(recon), jnp.abs(x_true)))
    assert err < 0.2 * zf
    assert recon.dtype == jnp.complex64


def test_inverse_recon_sense_cg():
    x_true = make_target()
    op = make_sense("exp", 4, 8, 0.1, (H, W, 1), seed=0, num_frames=1)
    y = op(x_true)
    sigmas = sigma_ladder(1.0, 0.01, 40)
    score = make_score_fn(x_true, sigmas)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    recon = ald_inverse_seg_proximal_real_imag(
        score, sigmas, y, op, L2Penalty(lin_tfm=op, num_iters=5),
        jax.random.PRNGKey(0), cfg, lr_scaled=10.0)
    zf = float(nrmse(jnp.abs(op.conj_op(y)), jnp.abs(x_true)))
    assert float(nrmse(jnp.abs(recon), jnp.abs(x_true))) < zf


def test_seg_guidance_gradient():
    """compute_seg_grad == autograd of sum log softmax at the label."""
    def seg_fn(x):  # toy seg net: logits from channel features
        return jnp.concatenate([x, -x], axis=-1)  # (B, H, W, 2)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 1),
                    dtype=jnp.float32)
    label = jnp.zeros((2, 4, 4), dtype=jnp.int32)
    g = compute_seg_grad(seg_fn, x, label)
    assert g.shape == x.shape
    # logp = log sigmoid(2x) for label 0 -> d/dx = 2 * (1 - sigmoid(2x))
    want = 2 * (1 - jax.nn.sigmoid(2 * x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)
    # FG mode zeroes background grads
    g_fg = compute_seg_grad(seg_fn, x, label, mode="FG")
    np.testing.assert_array_equal(np.asarray(g_fg), 0)


def test_clf_guidance_gradient():
    W_clf = jnp.asarray(np.random.RandomState(0).randn(16, 3),
                        dtype=jnp.float32)

    def clf_fn(x):
        return x.reshape(x.shape[0], -1) @ W_clf

    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 1),
                    dtype=jnp.float32)
    cls = jnp.asarray([0, 2], dtype=jnp.int32)
    g = compute_clf_grad(clf_fn, x, cls)
    assert g.shape == x.shape

    def manual(x_in):
        logits = clf_fn(x_in)
        lp = jax.nn.log_softmax(logits)
        return lp[0, 0] + lp[1, 2]

    want = jax.grad(manual)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)


def test_interp_sigmas_T():
    sig_S = np.exp(np.linspace(np.log(10), np.log(0.01), 20)).astype(np.float32)
    sig_T = np.exp(np.linspace(np.log(1.0), np.log(0.01), 8)).astype(np.float32)
    out = interp_sigmas_T(sig_S, sig_T)
    n = int((sig_S <= sig_T[0]).sum())
    assert (out[:-n] == -1).all()
    assert out[-n:].min() > 0
    assert np.isclose(out[-1], sig_T[-1])
    assert np.isclose(out[-n], sig_T[0])


def _cine_setup(T_frames=4):
    keyt = jax.random.PRNGKey(2)
    yy, xx = jnp.mgrid[0:H, 0:W]
    base = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))
    frames = jnp.stack([base * (0.8 + 0.2 * jnp.cos(2 * jnp.pi * t / T_frames))
                        for t in range(T_frames)], axis=0)[..., None]
    vol = add_phase(frames, keyt, init_shape=(2, 4, 4), mode="2D+time")
    op = make_sense("exp", 2, 8, 0.1, (H, W, 1), seed=0, num_frames=T_frames)
    y = op(vol)  # (S, T, H, W, 1)
    return vol, op, y


@pytest.mark.parametrize("mode_T", ["tv", "diffusion1d", "none"])
def test_ald_2d_time_modes(mode_T):
    vol, op, y = _cine_setup()
    T_frames = vol.shape[0]
    sigmas = sigma_ladder(1.0, 0.01, 15)
    sigmas_T = sigma_ladder(0.5, 0.01, 8)
    x_stack = vol[None]  # (B=1, T, H, W, C)

    score_S = make_score_fn(
        vol, sigmas)  # operates per-frame: target (T,H,W,C) broadcast

    def score_T(x, labels):  # pull tubes toward zero (weak prior)
        sig = sigmas[labels].reshape(-1, 1, 1)
        return -x / (sig**2 + 1.0)

    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    out = ald_2d_time(score_S, score_T, sigmas, sigmas_T, y[:, :, None].reshape(
        2, T_frames, H, W, 1), op, L2Penalty(lin_tfm=op, num_iters=4),
        jax.random.PRNGKey(0), cfg, lr_scaled=10.0, mode_T=mode_T,
        win_size=4, num_frames=T_frames)
    assert out.shape == (1, T_frames, H, W, 1)
    assert bool(jnp.all(jnp.isfinite(jnp.abs(out))))


def test_map_optimizer_reduces_data_error():
    x_true = make_target()
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(x_true)
    sigmas = sigma_ladder(1.0, 0.01, 10)
    score = make_score_fn(x_true, sigmas)
    out = map_optimizer(score, y, op, lamda=1.0,
                        config=MAPConfig(n_iters=200, lr=5e-2))
    # stays near data consistency (ZF init is exactly consistent for a
    # masked-Fourier A) while the prior pulls toward the target image
    err1 = float(jnp.sum(jnp.abs(op(out) - y) ** 2))
    assert err1 < 0.05 * float(jnp.sum(jnp.abs(y) ** 2))
    zf_nrmse = float(nrmse(jnp.abs(op.conj_op(y)), jnp.abs(x_true)))
    assert float(nrmse(jnp.abs(out), jnp.abs(x_true))) < 0.5 * zf_nrmse


def test_tv_reconstruction_runs():
    x_true = make_target()
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(x_true)
    out = tv_reconstruction(y, op, reg_weight=1e-3,
                            config=MAPConfig(n_iters=100, lr=5e-2))
    assert out.shape == x_true.shape
    err_zf = float(nrmse(jnp.abs(op.conj_op(y)), jnp.abs(x_true)))
    err_tv = float(nrmse(jnp.abs(out), jnp.abs(x_true)))
    assert err_tv <= err_zf * 1.05  # at least no worse than zero-filled


def test_whole_recon_is_jittable():
    """The product requirement: one XLA computation end to end."""
    x_true = make_target()
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(x_true)
    sigmas = sigma_ladder(1.0, 0.01, 10)
    score = make_score_fn(x_true, sigmas)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)

    @jax.jit
    def recon(y, key):
        return ald_inverse_seg_proximal_real_imag(
            score, sigmas, y, op, SingleCoil(lin_tfm=op), key, cfg,
            lr_scaled=10.0)

    out = recon(y, jax.random.PRNGKey(0))
    assert out.shape == x_true.shape


def test_snapshot_hook_fires(tmp_path):
    """snapshot_every gates a jax.debug.callback inside the scan; the chain
    stays a single jitted program (reference diagnostics:
    ALD_optimizers.py:203-213)."""
    from inverseproblemwithdiffusionmodel_tpu.training import make_snapshot_hook
    x_true = make_target()
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    y = op(x_true)
    sigmas = sigma_ladder(1.0, 0.01, 10)
    score = make_score_fn(x_true, sigmas)
    cfg = ALDConfig(n_steps_each=1, step_lr=3e-5, snapshot_every=4)
    calls = []

    def probe(level, sigma, x_re, x_im):
        calls.append((int(level), float(sigma)))

    out = jax.jit(lambda y, k: ald_inverse_seg_proximal_real_imag(
        score, sigmas, y, op, SingleCoil(lin_tfm=op), k, cfg,
        lr_scaled=10.0, snapshot_fn=probe))(y, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    jax.effects_barrier()
    assert [c for c, _ in sorted(calls)] == [0, 4, 8]

    # the file-writing hook factory
    hook = make_snapshot_hook(str(tmp_path), temporal=False)
    out2 = ald_inverse_seg_proximal_real_imag(
        score, sigmas, y, op, SingleCoil(lin_tfm=op), jax.random.PRNGKey(1),
        cfg, lr_scaled=10.0, snapshot_fn=hook)
    jax.block_until_ready(out2)
    jax.effects_barrier()
    import os
    files = sorted(os.listdir(tmp_path))
    assert "snap_level00000.npy" in files and "snap_level00008.png" in files
    assert "snap_log.txt" in files


def test_tv_norm_complex_modulus_torch_parity():
    """TV on a complex image == kornia TotalVariation semantics on the
    reference's complex parameter (diff -> complex .abs() -> sum,
    scripts/acdc_SENSE_TV.py:77, MAP_optimizers.py:45)."""
    import torch
    from inverseproblemwithdiffusionmodel_tpu.samplers.map_opt import (
        tv_norm_noncircular, tv_norm_noncircular_pair)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (2, 8, 9, 1))
    im = jax.random.normal(k2, (2, 8, 9, 1))
    x = re + 1j * im
    ours = float(tv_norm_noncircular(x, (1, 2)))
    ours_pair = float(tv_norm_noncircular_pair(re, im, (1, 2)))
    z = torch.tensor(np.asarray(x))
    ref = (z[:, 1:] - z[:, :-1]).abs().sum() \
        + (z[:, :, 1:] - z[:, :, :-1]).abs().sum()
    assert abs(ours - float(ref)) < 1e-3
    assert abs(ours_pair - float(ref)) < 1e-3
    # zero-difference regions get torch's sgn(0)=0 subgradient, not NaN
    g = jax.grad(lambda r: tv_norm_noncircular_pair(r, jnp.zeros_like(r),
                                                    (1, 2)))(
        jnp.ones((1, 4, 4, 1)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_interp_sigmas_T_disjoint_ladders_raise():
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald import (
        interp_sigmas_T)
    s_spatial = np.asarray(sigma_ladder(10.0, 1.0, 8))
    s_temporal = np.asarray(sigma_ladder(0.5, 0.01, 6))  # max < spatial min
    with pytest.raises(ValueError, match="temporal ladder"):
        interp_sigmas_T(s_spatial, s_temporal)


def test_ald_2d_time_tv_mode_ignores_disjoint_temporal_ladder():
    """mode_T='tv'/'none' never read sigmas_T: a placeholder temporal ladder
    entirely below the spatial one must NOT trip the interp overlap guard
    (the guard is for 'diffusion1d', where the temporal step would never
    activate)."""
    vol, op, y = _cine_setup()
    T_frames = vol.shape[0]
    sigmas = sigma_ladder(10.0, 1.0, 8)
    sigmas_T = sigma_ladder(0.5, 0.01, 6)  # max < spatial min: disjoint
    score_S = make_score_fn(vol, sigmas)
    cfg = ALDConfig(n_steps_each=1, step_lr=3e-5)
    out = ald_2d_time(score_S, None, sigmas, sigmas_T,
                      y[:, :, None].reshape(2, T_frames, H, W, 1), op,
                      L2Penalty(lin_tfm=op, num_iters=2),
                      jax.random.PRNGKey(0), cfg, lr_scaled=10.0,
                      mode_T="tv", win_size=4, num_frames=T_frames)
    assert bool(jnp.all(jnp.isfinite(jnp.abs(out))))
    # 'diffusion1d' still enforces the overlap guard
    with pytest.raises(ValueError, match="temporal ladder"):
        ald_2d_time(score_S, score_S, sigmas, sigmas_T,
                    y[:, :, None].reshape(2, T_frames, H, W, 1), op,
                    L2Penalty(lin_tfm=op, num_iters=2),
                    jax.random.PRNGKey(0), cfg, mode_T="diffusion1d",
                    win_size=4, num_frames=T_frames)


def test_apply_in_tube_space_round_trip():
    """The shared tube-space helper: identity fn == identity map (shift on
    and off), for complex and pair inputs."""
    from inverseproblemwithdiffusionmodel_tpu.utils.reshape import (
        apply_in_tube_space)
    key = jax.random.PRNGKey(3)
    B, T, Hh, Ww, C = 2, 3, 8, 8, 1
    xr = jax.random.normal(key, (B, T, Hh, Ww, C))
    xi = jax.random.normal(jax.random.fold_in(key, 1), (B, T, Hh, Ww, C))
    for shift in (False, True):
        outs = apply_in_tube_space(lambda a, b: (a, b), (xr, xi), 4,
                                   key=key, if_random_shift=shift)
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(xr),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(xi),
                                   atol=1e-6)
    (z,) = apply_in_tube_space(lambda t: (t,), (xr + 1j * xi,), 4,
                               key=key, if_random_shift=True)
    np.testing.assert_allclose(np.asarray(jnp.real(z)), np.asarray(xr),
                               atol=1e-6)
    # tube layout is what the temporal nets expect: (B', T, k^2)
    seen = {}
    apply_in_tube_space(lambda t: (seen.setdefault("shape", t.shape), t)[1:],
                        (xr,), 4)
    assert seen["shape"] == (B * C * (Hh // 4) * (Ww // 4), T, 16)
