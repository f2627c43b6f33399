"""Output-level parity oracles, wave 4: the flagship 2D+time factorized
sampler `ALD2DTime` (ncsn/models/ALD_optimizers.py:330-554) as zero-noise
trajectories against the running reference, across its temporal modes:

  - 'diffusion1d': spatial 2-D score + 1-D pixel-tube temporal score with
    the sigma_T ladder nearest-interpolated onto the spatial ladder's tail
    (sentinel -1 skip levels included) + per-step proximal
  - 'tv':          spatial score + anisotropic temporal-TV subgradient
  - 'diffusion1d-only': spatial step skipped, raw temporal ladder

This exercises, in one compiled trajectory per mode: the ladder
interpolation (:342-345), pixel-tube reshapes (helpers/utils.py:330-359),
the Re/Im spatial and temporal Langevin updates, FiniteDiff TV
(linear_transforms/finite_diff.py:29-35), and the SingleCoil proximal with
per-frame masks.

No reference code is copied - the reference runs as an opaque oracle.
"""
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.oracle_common import ref_modules

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return ref_modules(
        pytest,
        "ncsn.models.ALD_optimizers",
        "ncsn.models.proximal_op",
        "ncsn.linear_transforms.undersampling_fourier",
    )


def _zero_noise_both(monkeypatch):
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))


class _RefSpatialScore(torch.nn.Module):
    """score(x, y) = (P - x) / sigmas[y]^2 on frames (BT, C, H, W)."""

    def __init__(self, sigmas, target):
        super().__init__()
        self.s = torch.from_numpy(sigmas)
        self.p = torch.from_numpy(target)

    def forward(self, x, y):
        return (self.p - x) / self.s[y].view(-1, 1, 1, 1) ** 2


class _RefTemporalScore(torch.nn.Module):
    """Tube score (B', k^2, T): (Q - x) / sigmas[y]^2. `sigmas` is
    OVERWRITTEN by the ALD2DTime constructor with the interpolated full
    ladder (ALD_optimizers.py:346); `config.data.channels` feeds win_size
    (:347)."""

    def __init__(self, sigmas_T, q, channels):
        super().__init__()
        self.sigmas = torch.from_numpy(sigmas_T)
        self.q = torch.from_numpy(q)
        self.config = types.SimpleNamespace(
            data=types.SimpleNamespace(channels=channels))

    def forward(self, x, y):
        return (self.q - x) / self.sigmas[y].view(-1, 1, 1) ** 2


@pytest.mark.parametrize("mode_T", ["diffusion1d", "tv", "diffusion1d-only"])
def test_ald_2d_time_trajectory_matches_reference(ref, monkeypatch, capsys,
                                                  tmp_path, mode_T):
    from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
        RandomUndersamplingFourier)
    from inverseproblemwithdiffusionmodel_tpu.operators.proximal import (
        SingleCoil)
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald import (
        ALDConfig, ald_2d_time, interp_sigmas_T)

    B, T, H, W, win = 1, 4, 8, 8, 4
    k2 = win * win
    sigmas_S = np.geomspace(5.0, 0.1, 12).astype(np.float32)
    # L_T >= 10: in the *-only modes the reference swaps sigmas_T in
    # as the level ladder and computes print_interval = L // 10
    sigmas_T = np.geomspace(2.0, 0.12, 10).astype(np.float32)
    rng = np.random.RandomState(30)

    # per-frame variable-density line mask, (T, 1, W) ref / (T, 1, W, 1) ours
    mask = (rng.rand(T, W) < 0.5).astype(np.float32)
    mask[:, W // 2 - 1:W // 2 + 1] = 1.0
    x_true = (rng.rand(B * T, 1, H, W)
              + 0.3j * rng.rand(B * T, 1, H, W)).astype(np.complex64)
    target_S = rng.rand(B * T, 1, H, W).astype(np.float32)
    target_T = rng.rand(1, k2, T).astype(np.float32)  # same for every tube

    rcls = ref.ncsn_linear_transforms_undersampling_fourier.\
        RandomUndersamplingFourier
    r_op = rcls.__new__(rcls)
    r_op.mask = torch.from_numpy(mask.reshape(T, 1, 1, W))
    o_op = RandomUndersamplingFourier(
        mask=jnp.asarray(mask.reshape(T, 1, W, 1)))

    y = r_op(torch.from_numpy(x_true)).numpy().astype(np.complex64)
    y_ref = torch.from_numpy(y.reshape(1, B, T, 1, H, W))  # (S, B, T, C, H, W)

    n_steps, step_lr, lr_scaled, lamda_T = 2, 1e-3, 20.0, 0.8

    sampler = ref.ncsn_models_ALD_optimizers.ALD2DTime(
        proximal=ref.ncsn_models_proximal_op.SingleCoil(r_op),
        scorenet_T=_RefTemporalScore(sigmas_T, target_T, k2),
        sigmas_T=torch.from_numpy(sigmas_T),
        x_mod_shape=(B, T, 1, H, W),
        scorenet=_RefSpatialScore(sigmas_S, target_S),
        sigmas=torch.from_numpy(sigmas_S),
        params=dict(n_steps_each=n_steps, step_lr=step_lr, denoise=False,
                    final_only=True),
        config=None,
        measurement=y_ref,
        linear_tfm=r_op,
        device=torch.device("cpu"),
    )
    _zero_noise_both(monkeypatch)
    grad_state = torch.is_grad_enabled()
    try:
        want = sampler(save_dir=str(tmp_path), lr_scaled=lr_scaled,
                       mode_T=mode_T, lamda_T=lamda_T,
                       if_random_shift=False)[-1].numpy()  # (B, T, C, H, W)
    finally:
        torch.set_grad_enabled(grad_state)

    # ours: channel-last, measurement (num_sens, B*T, H, W, C)
    sj = jnp.asarray(sigmas_S)
    p_s = jnp.asarray(np.repeat(np.moveaxis(target_S, 1, -1), 2, axis=0))

    def score_fn_S(x, labels):
        return (p_s - x) / sj[labels].reshape(-1, 1, 1, 1) ** 2

    # our sampler maps spatial levels onto the RAW temporal ladder
    # internally (interp_sigma_T_indices), so the analytic score indexes
    # sigmas_T directly — exactly how make_score_fn(module_T, ., sigmas_T)
    # builds the production score
    lt = jnp.asarray(sigmas_T)
    q_t = jnp.asarray(np.swapaxes(target_T, 1, 2))  # (1, T, k^2)

    def score_fn_T(x, labels):
        return (q_t - x) / lt[labels].reshape(-1, 1, 1) ** 2

    got = ald_2d_time(
        score_fn_S, score_fn_T, jnp.asarray(sigmas_S), jnp.asarray(sigmas_T),
        jnp.asarray(np.moveaxis(y, 1, -1)[None]), o_op,
        SingleCoil(lin_tfm=o_op), jax.random.PRNGKey(0),
        ALDConfig(n_steps_each=n_steps, step_lr=step_lr),
        lr_scaled=lr_scaled, mode_T=mode_T, lamda_T=lamda_T,
        if_random_shift=False, win_size=win, num_frames=T)

    got_nchw = np.moveaxis(np.asarray(got), -1, 2)  # (B, T, C, H, W)
    assert np.abs(want).max() > 1e-2
    np.testing.assert_allclose(got_nchw, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# MAPOptimizer2DTime (Adam ascent with factorized spatial/temporal priors)
# ---------------------------------------------------------------------------

class _StubLogger:
    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass


@pytest.mark.parametrize("mode_T", ["diffusion1d", "tv"])
def test_map_2d_time_trajectory_matches_reference(ref, monkeypatch, capsys,
                                                  tmp_path, mode_T):
    """MAP_optimizers.py:154-337: per-iteration grad = grad_data +
    prior_weight * (w_S * grad_S + w_T * grad_T), evaluated once at the
    pre-iteration x (the reference's two closures both see the stale
    self.x) and applied by Adam to Re and Im. 20 iters - the dynamics
    amplify round-off beyond that (cf. wave 3)."""
    from tests.oracle_common import stub_module
    stub_module("torch.utils.tensorboard", SummaryWriter=object)
    from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
        RandomUndersamplingFourier)
    from inverseproblemwithdiffusionmodel_tpu.samplers.map_opt import (
        MAPConfig, map_optimizer_2d_time)
    from tests.oracle_common import load_reference
    ref_map = load_reference("ncsn.models.MAP_optimizers")

    B, T, H, W, win = 1, 4, 8, 8, 4
    k2 = win * win
    sigmas_S = np.geomspace(5.0, 0.1, 12).astype(np.float32)
    sigmas_T = np.geomspace(2.0, 0.12, 10).astype(np.float32)
    rng = np.random.RandomState(31)

    mask = (rng.rand(T, W) < 0.5).astype(np.float32)
    mask[:, W // 2 - 1:W // 2 + 1] = 1.0
    x_true = (rng.rand(B * T, 1, H, W)
              + 0.3j * rng.rand(B * T, 1, H, W)).astype(np.complex64)
    target_S = rng.rand(B * T, 1, H, W).astype(np.float32)
    target_T = rng.rand(1, k2, T).astype(np.float32)

    # the reference's data_step rearranges A^H s as (BT, C, H, W): it
    # requires a coil-FOLDING operator (SENSE conj_op sums the coil axis),
    # matching its cine_SENSE_real_img_2d_time_MAP.py usage - a broadcast
    # single-coil axis would leave 5 dims and crash its einops.rearrange
    from inverseproblemwithdiffusionmodel_tpu.operators.fourier import SENSE

    rcls = ref.ncsn_linear_transforms_undersampling_fourier.\
        RandomUndersamplingFourier
    r_ruf = rcls.__new__(rcls)
    r_ruf.mask = torch.from_numpy(mask.reshape(T, 1, 1, W))
    o_ruf = RandomUndersamplingFourier(
        mask=jnp.asarray(mask.reshape(T, 1, W, 1)))

    scls = ref.ncsn_linear_transforms_undersampling_fourier.SENSE
    r_op = scls.__new__(scls)
    r_op.random_under_fourier = r_ruf
    r_ruf.in_shape = (1, H, W)  # read by the coil-map generator
    raw = torch.stack([r_op._generate_sens_map("exp", 40 + i)
                       for i in range(2)], dim=0)
    r_op.sens_maps = raw / torch.sqrt((torch.abs(raw) ** 2).sum(dim=0))
    maps = r_op.sens_maps.numpy().astype(np.complex64)
    o_op = SENSE(base=o_ruf, sens_maps=jnp.asarray(maps[..., None]))

    y = r_op(torch.from_numpy(x_true)).numpy().astype(np.complex64)
    y_ref = torch.from_numpy(y.reshape(2, B, T, 1, H, W))

    lr = 1e-3
    prior_w, w_s, w_t = 0.9, 0.7, 0.5

    def run_ref(n_iters):
        x_init_ref = r_op.conj_op(
            torch.from_numpy(y)).reshape(B, T, 1, H, W).to(torch.complex64)
        opt = ref_map.ncsn_models_MAP_optimizers.MAPOptimizer2DTime(
            x_init=x_init_ref,
            measurement=y_ref,
            scorenet_S=_RefSpatialScore(sigmas_S, target_S),
            scorenet_T=_RefTemporalScore(sigmas_T, target_T, k2),
            linear_tfm=r_op,
            logger=_StubLogger(),
            params=dict(lr=lr, opt_class=torch.optim.Adam,
                        opt_params={"betas": (0.5, 0.5)},
                        num_iters=n_iters, num_plot_times=1, win_size=win,
                        prior_weight=prior_w, spatial_step_weight=w_s,
                        temporal_step_weight=w_t, save_dir=str(tmp_path),
                        mode_T=mode_T, if_random_shift=False,
                        device=torch.device("cpu")),
        )
        opt.plot_interval = 10**9  # n_iters // num_plot_times may be 0
        grad_state = torch.is_grad_enabled()
        try:
            return opt().numpy()  # (B, T, C, H, W)
        finally:
            torch.set_grad_enabled(grad_state)

    sj = jnp.asarray(sigmas_S)
    p_s = jnp.asarray(np.repeat(np.moveaxis(target_S, 1, -1), 2, axis=0))

    def score_fn_S(x, labels):
        return (p_s - x) / sj[labels].reshape(-1, 1, 1, 1) ** 2

    lt = jnp.asarray(sigmas_T)
    q_t = jnp.asarray(np.swapaxes(target_T, 1, 2))

    def score_fn_T(x, labels):
        return (q_t - x) / lt[labels].reshape(-1, 1, 1) ** 2

    def run_ours(n_iters):
        got = map_optimizer_2d_time(
            score_fn_S, score_fn_T, jnp.asarray(np.moveaxis(y, 2, -1)),
            o_op, MAPConfig(n_iters=n_iters, lr=lr),
            prior_weight=prior_w, spatial_step_weight=w_s,
            temporal_step_weight=w_t, mode_T=mode_T, if_random_shift=False,
            win_size=win, num_frames=T)
        return np.moveaxis(np.asarray(got), -1, 2)

    # one iteration: tight - pins the composite gradient (data + weighted
    # spatial/temporal priors) and the Adam arithmetic exactly. Components
    # whose total gradient is ~0 are excluded: Adam's first step there is
    # exactly +-lr on the round-off SIGN of g, so a legitimate mismatch has
    # the unmistakable signature |diff| == 2*lr; anything else fails.
    want1 = run_ref(1)
    assert np.abs(want1).max() > 1e-2
    diff1 = np.abs(run_ours(1) - want1)
    flips = diff1 > 1e-4
    assert flips.mean() < 0.01, f"{flips.sum()} non-sign-flip mismatches"
    if flips.any():
        np.testing.assert_allclose(diff1[flips], 2 * lr, rtol=0.05)
    assert diff1[~flips].max() < 1e-5

    # ten iterations: looser - Adam's sign-sensitive steps on
    # near-cancelling momentum components (and, in iteration 1 only, the
    # reference's torch.real() VIEW aliasing, which lets its imag closure
    # see the already-updated real part) amplify round-off to ~1e-4
    want10 = run_ref(10)
    np.testing.assert_allclose(run_ours(10), want10, rtol=5e-3, atol=1e-3)
