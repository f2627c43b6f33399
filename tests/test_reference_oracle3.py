"""Output-level parity oracles, wave 3: the remaining ALD loop variants and
the MAP optimizer, as zero-noise *trajectories* against the running
reference.

Covered (reference paths into /root/reference):
  - `ncsn/models/__init__.py:86-115` anneal_Langevin_dynamics_inpainting
  - `ncsn/models/__init__.py:118-165` anneal_Langevin_dynamics_interpolation
  - `ncsn/models/__init__.py:219-266` ..._cls_conditioned (analytic
    classifier on both sides, live guidance gradients)
  - `ncsn/models/__init__.py:269-328` ..._inverse_problem (normalized
    likelihood mixing, real SkipLines operator)
  - `ncsn/models/MAP_optimizers.py:55-116` MAPOptimizer Adam ascent on the
    complex image (torch.optim.Adam vs our optax scan, 20 steps)

No reference code is copied - the reference runs as an opaque oracle.
"""
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.oracle_common import ref_modules, stub_module

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    # MAP_optimizers imports SummaryWriter at module scope; tensorboard may
    # be absent from this image
    stub_module("torch.utils.tensorboard", SummaryWriter=object)
    return ref_modules(
        pytest,
        "ncsn.models",
        "ncsn.models.MAP_optimizers",
        "ncsn.linear_transforms.masking",
        "ncsn.linear_transforms.undersampling_fourier",
    )


def _nchw(a):
    return np.moveaxis(np.asarray(a), -1, 1)


def _nhwc(a):
    return np.moveaxis(np.asarray(a), 1, -1)


def _zero_noise_both(monkeypatch):
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))
    monkeypatch.setattr(
        torch, "randn",
        lambda *size, **kw: torch.zeros(
            *size, **{k: v for k, v in kw.items() if k != "generator"}))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))


class _TargetScore(torch.nn.Module):
    """score(x, y) = (P - x) / sigmas[y]^2, analytic, rank-generic."""

    def __init__(self, sigmas, target):
        super().__init__()
        self.s = torch.from_numpy(sigmas)
        self.p = torch.from_numpy(target)

    def forward(self, x, y):
        s = self.s[y].view(-1, *([1] * (x.ndim - 1)))
        return (self.p - x) / s**2


def _our_target_score(sigmas, target_nhwc):
    sj, pj = jnp.asarray(sigmas), jnp.asarray(target_nhwc)

    def score_fn(x, labels):
        s = sj[labels].reshape(-1, *([1] * (x.ndim - 1)))
        return (pj - x) / s**2

    return score_fn


# ---------------------------------------------------------------------------
# Inpainting
# ---------------------------------------------------------------------------

def test_ald_inpainting_trajectory_matches_reference(ref, monkeypatch,
                                                     capsys):
    """ncsn/models/__init__.py:86-115. The reference appends the state at
    the START of each inner step and never returns the final state, so the
    last reference step (known-half injection + Langevin update) is applied
    manually with the reference's own scorenet to obtain the final state."""
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald import ALDConfig
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_variants import (
        ald_inpainting, half_mask)

    S = 8
    sigmas = np.geomspace(3.0, 0.1, 8).astype(np.float32)
    rng = np.random.RandomState(20)
    # reference shape convention: x_mod (B, n_samples, 3, H, W),
    # refer_image (B, 3, H, W) -> both flattened to (B*n, 3, H, W)
    x0 = rng.rand(1, 2, 3, S, S).astype(np.float32)
    refer = rng.rand(1, 3, S, S).astype(np.float32)
    target = rng.rand(2, 3, S, S).astype(np.float32)

    step_lr, n_steps = 1e-3, 2
    scorenet = _TargetScore(sigmas, target)
    _zero_noise_both(monkeypatch)
    grad_state = torch.is_grad_enabled()
    try:
        images = ref.ncsn_models.anneal_Langevin_dynamics_inpainting(
            torch.from_numpy(x0.copy()), torch.from_numpy(refer), scorenet,
            torch.from_numpy(sigmas), S, n_steps_each=n_steps,
            step_lr=step_lr)
        # manual final step (zero noise): re-inject known half, one update
        x_last = images[-1].clone()
        cols = S // 2
        x_last[..., :cols] = torch.from_numpy(
            np.broadcast_to(refer[:, None], x0.shape).reshape(-1, 3, S, S)
        )[..., :cols]
        labels = torch.full((x_last.shape[0],), len(sigmas) - 1).long()
        want = (x_last + step_lr * scorenet(x_last, labels)).numpy()
    finally:
        torch.set_grad_enabled(grad_state)

    refer_flat = np.broadcast_to(refer[:, None], x0.shape).reshape(-1, 3, S, S)
    got = ald_inpainting(
        _our_target_score(sigmas, _nhwc(target)), jnp.asarray(sigmas),
        jnp.asarray(_nhwc(refer_flat)),
        half_mask((2, S, S, 3), axis=-2),
        jax.random.PRNGKey(0),
        ALDConfig(n_steps_each=n_steps, step_lr=step_lr, denoise=False),
        x_init=jnp.asarray(_nhwc(x0.reshape(-1, 3, S, S))))
    assert np.abs(want).max() > 1e-2
    np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------

def test_ald_interpolation_trajectory_matches_reference(ref, monkeypatch,
                                                        capsys):
    """ncsn/models/__init__.py:118-165 (noise slerp zeroed out; loop and
    chain-replication arithmetic still exercised)."""
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald import ALDConfig
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_variants import (
        ald_interpolation)

    S, B, n_interp = 8, 2, 3
    sigmas = np.geomspace(3.0, 0.1, 8).astype(np.float32)
    rng = np.random.RandomState(21)
    x0 = rng.rand(B, 1, S, S).astype(np.float32)
    target = rng.rand(B * n_interp, 1, S, S).astype(np.float32)

    scorenet = _TargetScore(sigmas, target)
    _zero_noise_both(monkeypatch)
    grad_state = torch.is_grad_enabled()
    try:
        want = ref.ncsn_models.anneal_Langevin_dynamics_interpolation(
            torch.from_numpy(x0.copy()), scorenet, torch.from_numpy(sigmas),
            n_interp, n_steps_each=2, step_lr=1e-3,
            final_only=True)[-1].numpy()
    finally:
        torch.set_grad_enabled(grad_state)

    got = ald_interpolation(
        _our_target_score(sigmas, _nhwc(target)), jnp.asarray(sigmas),
        jnp.asarray(_nhwc(x0)), n_interp, jax.random.PRNGKey(0),
        ALDConfig(n_steps_each=2, step_lr=1e-3))
    assert np.abs(want).max() > 1e-2
    np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Class-conditioned (live classifier-guidance gradients)
# ---------------------------------------------------------------------------

class _RefLinearClf(torch.nn.Module):
    """Analytic 2-class classifier: logits = [sum(x), -sum(x)]."""

    def forward(self, x):
        s = x.sum(dim=tuple(range(1, x.ndim)))
        return torch.stack([s, -s], dim=1)


def test_ald_cls_conditioned_trajectory_matches_reference(ref, monkeypatch,
                                                          capsys):
    """ncsn/models/__init__.py:219-266 with compute_clf_grad (:172) live on
    both sides (autograd through the analytic classifier)."""
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald import ALDConfig
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_variants import (
        ald_cls_conditioned)

    S, B = 8, 2
    sigmas = np.geomspace(3.0, 0.1, 12).astype(np.float32)  # reference needs
    # len(sigmas) >= 10 (print_interval = L // 10, __init__.py:227)
    rng = np.random.RandomState(22)
    x0 = rng.rand(B, 1, S, S).astype(np.float32)
    target = rng.rand(B, 1, S, S).astype(np.float32)
    cls = np.array([0, 1], np.int64)

    scorenet = _TargetScore(sigmas, target)
    _zero_noise_both(monkeypatch)
    grad_state = torch.is_grad_enabled()
    try:
        want = ref.ncsn_models.anneal_Langevin_dynamics_cls_conditioned(
            torch.from_numpy(x0.copy()), torch.from_numpy(cls), scorenet,
            _RefLinearClf(), torch.from_numpy(sigmas), n_steps_each=2,
            step_lr=1e-3, final_only=True, denoise=True)[-1].numpy()
    finally:
        torch.set_grad_enabled(grad_state)

    def clf_fn(x):
        s = jnp.sum(x, axis=tuple(range(1, x.ndim)))
        return jnp.stack([s, -s], axis=1)

    got = ald_cls_conditioned(
        _our_target_score(sigmas, _nhwc(target)), clf_fn, jnp.asarray(cls),
        jnp.asarray(sigmas), _nhwc(x0).shape, jax.random.PRNGKey(0),
        ALDConfig(n_steps_each=2, step_lr=1e-3, denoise=True),
        x_init=jnp.asarray(_nhwc(x0)))
    assert np.abs(want).max() > 1e-2
    np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Inverse problem with normalized likelihood mixing (real operator)
# ---------------------------------------------------------------------------

def test_ald_inverse_problem_trajectory_matches_reference(ref, monkeypatch,
                                                          capsys):
    """ncsn/models/__init__.py:269-328, driven through the real-valued
    SkipLines operator (masking.py:6-44) so both sides stay real."""
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald import ALDConfig
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_variants import (
        ald_inverse_problem)
    from inverseproblemwithdiffusionmodel_tpu.operators.masking import (
        SkipLines)

    H, W, B = 12, 6, 2
    sigmas = np.geomspace(3.0, 0.1, 12).astype(np.float32)  # L >= 10, see above
    rng = np.random.RandomState(23)
    x_true = rng.rand(B, 1, H, W).astype(np.float32)
    x0 = rng.rand(B, 1, H, W).astype(np.float32)
    target = rng.rand(B, 1, H, W).astype(np.float32)

    r_op = ref.ncsn_linear_transforms_masking.SkipLines(3, (1, H, W))
    o_op = SkipLines(num_skip_lines=3, height=H)
    y = r_op(torch.from_numpy(x_true)).numpy()

    scorenet = _TargetScore(sigmas, target)
    _zero_noise_both(monkeypatch)
    grad_state = torch.is_grad_enabled()
    try:
        want = ref.ncsn_models.anneal_Langevin_dynamics_inverse_problem(
            torch.from_numpy(x0.copy()), torch.from_numpy(y), scorenet,
            r_op, torch.from_numpy(sigmas), 0.5, n_steps_each=2,
            step_lr=1e-3, denoise=True, final_only=True)[-1].numpy()
    finally:
        torch.set_grad_enabled(grad_state)

    got = ald_inverse_problem(
        _our_target_score(sigmas, _nhwc(target)), jnp.asarray(sigmas),
        jnp.asarray(_nhwc(y)), o_op, 0.5, jax.random.PRNGKey(0),
        ALDConfig(n_steps_each=2, step_lr=1e-3, denoise=True),
        x_init=jnp.asarray(_nhwc(x0)))
    assert np.abs(want).max() > 1e-2
    np.testing.assert_allclose(_nchw(np.real(got)), want, rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# MAP optimizer (Adam ascent on the complex image)
# ---------------------------------------------------------------------------

class _StubLogger:
    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass


def _make_mask(W, rng):
    m = (rng.rand(W) < 0.4).astype(np.float32)
    c = W // 2
    m[c - 2:c + 2] = 1.0
    return m


def test_map_optimizer_trajectory_matches_reference(ref, monkeypatch,
                                                    capsys):
    """MAP_optimizers.py:55-116: manual-gradient Adam (betas 0.5/0.5) ascent
    on the complex image vs our optax scan (samplers/map_opt.py), 50 steps
    on a masked-Fourier single-coil problem."""
    from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
        RandomUndersamplingFourier)
    from inverseproblemwithdiffusionmodel_tpu.samplers.map_opt import (
        MAPConfig, map_optimizer)

    H = W = 16
    rng = np.random.RandomState(24)
    mask = _make_mask(W, rng)
    x_true = (rng.rand(1, 1, H, W) + 0.3j * rng.rand(1, 1, H, W)).astype(
        np.complex64)
    target = rng.rand(1, 1, H, W).astype(np.float32)
    sigmas = np.geomspace(3.0, 0.1, 8).astype(np.float32)

    rcls = ref.ncsn_linear_transforms_undersampling_fourier.\
        RandomUndersamplingFourier
    r_op = rcls.__new__(rcls)
    r_op.mask = torch.from_numpy(mask.reshape(1, 1, W))
    o_op = RandomUndersamplingFourier(
        mask=jnp.asarray(mask.reshape(1, 1, W, 1)))

    y = r_op(torch.from_numpy(x_true)).numpy().astype(np.complex64)
    # 20 iters: the per-step arithmetic matches to float32 precision
    # (measured 1.8e-7 at 5 iters), but the Adam dynamics are locally
    # chaotic, amplifying round-off ~exponentially (8e-5 at 20, 4e-3 at 50)
    n_iters, lr = 20, 5e-3

    cfg = types.SimpleNamespace(MAP=types.SimpleNamespace(
        n_iters=n_iters, lr=lr))
    x_init_t = r_op.conj_op(torch.from_numpy(y))
    opt = ref.ncsn_models_MAP_optimizers.MAPOptimizer(
        x_init_t, torch.from_numpy(y), _TargetScore(sigmas, target), r_op,
        lamda=0.7, config=cfg, logger=_StubLogger(),
        device=torch.device("cpu"))
    # the reference computes plot_interval = n_iters // 50 and takes
    # iter % plot_interval - zero for short runs; disable plotting
    opt.plot_interval = 10**9
    grad_state = torch.is_grad_enabled()
    try:
        want = opt().detach().numpy()
    finally:
        torch.set_grad_enabled(grad_state)

    got = map_optimizer(
        _our_target_score(sigmas, _nhwc(target)), jnp.asarray(_nhwc(y)),
        o_op, lamda=0.7, config=MAPConfig(n_iters=n_iters, lr=lr))
    assert np.abs(want).max() > 1e-2
    np.testing.assert_allclose(_nchw(got), want, rtol=2e-3, atol=2e-4)
