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

    ladder_T = (sigmas_T if mode_T == "diffusion1d-only"
                else interp_sigmas_T(sigmas_S, sigmas_T))
    lt = jnp.asarray(ladder_T)
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
