"""Output-level parity oracles, wave 8: guidance losses, EMA semantics,
optimizer trajectories, and temporal-tube reshapes, against the running
reference.

Covered (reference paths into /root/reference):
  - `ncsn/losses/clf_loss.py:5-20` clf_loss_with_perturbation (torch noise
    replayed into our zero-sigma path; CE reduction + logits)
  - `ncsn/models/ema.py:4-47` EMAHelper shadow trajectory
  - `models/ema.py:10-54` ExponentialMovingAverage with num_updates warm-up
  - `ncsn/losses/__init__.py:3-13` get_optimizer: Adam(+L2 weight_decay) and
    RMSProp multi-step parameter trajectories vs our optax chains
  - `helpers/utils.py:330-359` reshape_temporal_dim forward/backward
  - `helpers/utils.py:276-285` compute_angle

`seg_loss_with_perturbation` (ncsn/losses/seg_loss.py) cannot be oracled in
this image: its DiceCELoss comes from monai, which is absent (our
dice_ce_loss is pinned against the documented MONAI formula in
tests/test_training.py).

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
    # helpers.utils imports matplotlib/SimpleITK/torchvision at module load;
    # the functions under test never call into them
    stub_module("SimpleITK")
    return ref_modules(pytest, "ncsn.losses.clf_loss", "ncsn.losses",
                       "ncsn.models.ema", "models.ema", "helpers.utils")


# ---------------------------------------------------------------------------
# clf_loss_with_perturbation
# ---------------------------------------------------------------------------

class _GapClf(torch.nn.Module):
    """Global-average-pool + linear head: channel-order-safe across layouts."""

    def __init__(self, channels, num_cls):
        super().__init__()
        self.fc = torch.nn.Linear(channels, num_cls)

    def forward(self, X):  # X: (B, C, H, W)
        return self.fc(X.mean(dim=(2, 3)))


def test_clf_loss_matches_reference(ref):
    from inverseproblemwithdiffusionmodel_tpu.losses.guidance import (
        clf_loss_with_perturbation)

    B, C, S, K, L = 4, 2, 8, 5, 7
    rng = np.random.RandomState(80)
    X = rng.rand(B, C, S, S).astype(np.float32)
    y = rng.randint(0, K, size=(B,))
    sigmas = np.exp(np.linspace(np.log(3.0), np.log(0.05),
                                L)).astype(np.float32)
    labels = np.array([0, 3, 6, 2], np.int64)

    torch.manual_seed(81)
    model = _GapClf(C, K)
    model.eval()

    torch.manual_seed(82)
    want_loss, want_pred = ref.ncsn_losses_clf_loss.clf_loss_with_perturbation(
        model, torch.from_numpy(X), torch.from_numpy(y),
        torch.from_numpy(sigmas), labels=torch.from_numpy(labels))

    # replay the torch noise draw (same seed, same shape -> same randn)
    torch.manual_seed(82)
    noise = torch.randn(X.shape).numpy()
    X_pert = X + noise * sigmas[labels][:, None, None, None]

    W = model.fc.weight.detach().numpy()
    b = model.fc.bias.detach().numpy()

    def clf_fn(x):  # x: (B, H, W, C) channel-last
        return x.mean(axis=(1, 2)) @ W.T + b

    # zero sigmas make our in-loss perturbation a no-op on the pre-perturbed X
    got_loss, got_logits = clf_loss_with_perturbation(
        clf_fn, jnp.asarray(np.moveaxis(X_pert, 1, -1)), jnp.asarray(y),
        jnp.zeros(L, jnp.float32), jax.random.PRNGKey(0),
        labels=jnp.asarray(labels))

    np.testing.assert_allclose(np.asarray(got_logits),
                               want_pred.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# EMA semantics
# ---------------------------------------------------------------------------

def _param_sequence(shapes, n_steps, seed):
    rng = np.random.RandomState(seed)
    return [[rng.randn(*s).astype(np.float32) for s in shapes]
            for _ in range(n_steps + 1)]


def test_ema_helper_matches_reference(ref):
    """Discrete-stack EMAHelper (ncsn/models/ema.py:16-21):
    shadow <- (1 - mu) * param + mu * shadow == EmaState(decay=mu)."""
    from inverseproblemwithdiffusionmodel_tpu.models.ema import EmaState

    mu = 0.9
    torch.manual_seed(83)
    module = torch.nn.Linear(3, 2)
    shapes = [tuple(p.shape) for p in module.parameters()]
    seq = _param_sequence(shapes, n_steps=5, seed=84)

    helper = ref.ncsn_models_ema.EMAHelper(mu=mu)
    with torch.no_grad():
        for p, v in zip(module.parameters(), seq[0]):
            p.copy_(torch.from_numpy(v))
    helper.register(module)
    for step_vals in seq[1:]:
        with torch.no_grad():
            for p, v in zip(module.parameters(), step_vals):
                p.copy_(torch.from_numpy(v))
        helper.update(module)
    want = {k: v.detach().numpy() for k, v in helper.state_dict().items()}

    state = EmaState.create({"w": jnp.asarray(seq[0][0]),
                             "b": jnp.asarray(seq[0][1])}, decay=mu)
    for step_vals in seq[1:]:
        state = state.update({"w": jnp.asarray(step_vals[0]),
                              "b": jnp.asarray(step_vals[1])})

    np.testing.assert_allclose(np.asarray(state.params["w"]), want["weight"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(state.params["b"]), want["bias"],
                               rtol=1e-6, atol=1e-7)


def test_continuous_ema_matches_reference(ref):
    """Continuous-stack ExponentialMovingAverage (models/ema.py:33-53) with
    the num_updates warm-up decay min(d, (1+n)/(10+n)) == EmaState
    use_warmup=True."""
    from inverseproblemwithdiffusionmodel_tpu.models.ema import EmaState

    decay = 0.999
    torch.manual_seed(85)
    module = torch.nn.Linear(4, 3)
    shapes = [tuple(p.shape) for p in module.parameters()]
    seq = _param_sequence(shapes, n_steps=6, seed=86)

    with torch.no_grad():
        for p, v in zip(module.parameters(), seq[0]):
            p.copy_(torch.from_numpy(v))
    ema = ref.models_ema.ExponentialMovingAverage(module.parameters(), decay,
                                                  use_num_updates=True)
    for step_vals in seq[1:]:
        with torch.no_grad():
            for p, v in zip(module.parameters(), step_vals):
                p.copy_(torch.from_numpy(v))
        ema.update(module.parameters())
    want = [s.detach().numpy() for s in ema.shadow_params]

    state = EmaState.create({"w": jnp.asarray(seq[0][0]),
                             "b": jnp.asarray(seq[0][1])}, decay=decay,
                            use_warmup=True)
    for step_vals in seq[1:]:
        state = state.update({"w": jnp.asarray(step_vals[0]),
                              "b": jnp.asarray(step_vals[1])})

    np.testing.assert_allclose(np.asarray(state.params["w"]), want[0],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(state.params["b"]), want[1],
                               rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# Optimizer trajectories (ncsn/losses/__init__.py get_optimizer)
# ---------------------------------------------------------------------------

def _optimizer_trajectory(ref, torch_cfg, our_cfg_dict, n_steps=10, seed=87):
    """Run both optimizers over the same deterministic grad sequence on a
    2-tensor parameter set; return (torch params, our params)."""
    from inverseproblemwithdiffusionmodel_tpu.config import Config
    from inverseproblemwithdiffusionmodel_tpu.training import get_optimizer

    rng = np.random.RandomState(seed)
    p0 = [rng.randn(3, 2).astype(np.float32),
          rng.randn(2).astype(np.float32)]
    grads = [[rng.randn(*p.shape).astype(np.float32) for p in p0]
             for _ in range(n_steps)]

    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in p0]
    topt = ref.ncsn_losses.get_optimizer(torch_cfg, tparams)
    for g in grads:
        for p, gv in zip(tparams, g):
            p.grad = torch.from_numpy(gv)
        topt.step()
    want = [p.detach().numpy() for p in tparams]

    tx = get_optimizer(Config(our_cfg_dict))
    params = {"w": jnp.asarray(p0[0]), "b": jnp.asarray(p0[1])}
    opt_state = tx.init(params)
    for g in grads:
        import optax
        updates, opt_state = tx.update(
            {"w": jnp.asarray(g[0]), "b": jnp.asarray(g[1])}, opt_state,
            params)
        params = optax.apply_updates(params, updates)
    return want, params


def test_adam_l2_trajectory_matches_reference(ref):
    """torch Adam folds weight_decay into the gradient BEFORE the moment
    updates (L2, not decoupled AdamW); pins our add_decayed_weights chain."""
    NS = types.SimpleNamespace
    torch_cfg = NS(optim=NS(optimizer="Adam", lr=1e-2, weight_decay=0.01,
                            beta1=0.9, amsgrad=False, eps=1e-8))
    our_cfg = {"optim": {"optimizer": "Adam", "lr": 1e-2,
                         "weight_decay": 0.01, "beta1": 0.9, "eps": 1e-8}}
    want, params = _optimizer_trajectory(ref, torch_cfg, our_cfg)
    np.testing.assert_allclose(np.asarray(params["w"]), want[0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), want[1],
                               rtol=1e-5, atol=1e-6)


def test_rmsprop_trajectory_matches_reference(ref):
    """torch RMSprop defaults alpha=0.99 with eps OUTSIDE the sqrt
    (ncsn/losses/__init__.py:9-10 passes only lr + weight_decay)."""
    NS = types.SimpleNamespace
    torch_cfg = NS(optim=NS(optimizer="RMSProp", lr=5e-3, weight_decay=0.005))
    our_cfg = {"optim": {"optimizer": "RMSProp", "lr": 5e-3,
                         "weight_decay": 0.005}}
    want, params = _optimizer_trajectory(ref, torch_cfg, our_cfg, seed=88)
    np.testing.assert_allclose(np.asarray(params["w"]), want[0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), want[1],
                               rtol=1e-5, atol=1e-6)


def test_sgd_trajectory_matches_reference(ref):
    """torch SGD(momentum=0.9): buf <- mu*buf + grad, update -lr*buf."""
    NS = types.SimpleNamespace
    torch_cfg = NS(optim=NS(optimizer="SGD", lr=1e-2, weight_decay=0.0))
    our_cfg = {"optim": {"optimizer": "SGD", "lr": 1e-2}}
    want, params = _optimizer_trajectory(ref, torch_cfg, our_cfg, seed=89)
    np.testing.assert_allclose(np.asarray(params["w"]), want[0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), want[1],
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# reshape_temporal_dim + compute_angle
# ---------------------------------------------------------------------------

def test_reshape_temporal_dim_matches_reference(ref):
    """helpers/utils.py:330-359: forward (N,T,H,W)->(N',kx*ky,T) vs our
    channel-last (N',T,kx*ky); backward round trip with the original
    img_size."""
    from inverseproblemwithdiffusionmodel_tpu.utils.reshape import (
        reshape_temporal_dim)

    rng = np.random.RandomState(90)
    x = rng.rand(2, 5, 8, 12).astype(np.float32)
    for kx, ky in [(2, 3), (4, 4), (1, 2)]:
        if 8 % kx or 12 % ky:
            continue
        want_fwd = ref.helpers_utils.reshape_temporal_dim(
            torch.from_numpy(x), kx, ky, "forward").numpy()
        got_fwd = np.asarray(reshape_temporal_dim(jnp.asarray(x), kx, ky,
                                                  "forward"))
        # ours is (N', T, kx*ky); reference is (N', kx*ky, T)
        np.testing.assert_allclose(np.moveaxis(got_fwd, 1, 2), want_fwd,
                                   rtol=0, atol=0)

        want_bwd = ref.helpers_utils.reshape_temporal_dim(
            torch.from_numpy(want_fwd), kx, ky, "backward",
            img_size=(8, 12)).numpy()
        got_bwd = np.asarray(reshape_temporal_dim(jnp.asarray(got_fwd), kx,
                                                  ky, "backward",
                                                  img_size=(8, 12)))
        np.testing.assert_allclose(got_bwd, want_bwd, rtol=0, atol=0)
        np.testing.assert_allclose(got_bwd, x, rtol=0, atol=0)


def test_compute_angle_matches_reference(ref):
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import compute_angle

    rng = np.random.RandomState(91)
    img = (rng.randn(2, 8, 8) + 1j * rng.randn(2, 8, 8)).astype(np.complex64)
    for if_normalize in (False, True):
        want = ref.helpers_utils.compute_angle(torch.from_numpy(img),
                                               if_normalize=if_normalize)
        got = compute_angle(img, if_normalize=if_normalize)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# dataset_stats (helpers/dataset_stats.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_stats():
    return ref_modules(pytest, "helpers.dataset_stats")


class _TubeDataset(torch.utils.data.Dataset):
    """Tiny (C, L) 1-D signal dataset as the reference stats helpers expect
    (select_at_idx returns ds[idx][0] for 'CINE*' names)."""

    def __init__(self, arr):
        self.arr = arr

    def __len__(self):
        return len(self.arr)

    def __getitem__(self, i):
        return torch.from_numpy(self.arr[i]), 0


def test_compute_max_dist_matches_reference(ref_stats):
    """compute_max_dist (dataset_stats.py:19-31) samples 1000 random pairs;
    over a 12-sample dataset that visits every pair w.p. ~1-2e-7, so it
    equals our exact Gram-matrix max."""
    from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
        max_pairwise_distance)

    rng = np.random.RandomState(92)
    arr = rng.rand(12, 2, 16).astype(np.float32)
    ds = _TubeDataset(arr)
    np.random.seed(93)
    want = ref_stats.helpers_dataset_stats.compute_max_dist(
        ds, "CINE_tubes", max_num_pairs=1000)
    got = max_pairwise_distance(arr)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_norm_hist_matches_reference(ref_stats):
    """compute_norm_hist (dataset_stats.py:34-75) for both registered signal
    transforms, normalized and not; histogram counts and bin edges."""
    from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
        norm_histogram)

    rng = np.random.RandomState(94)
    arr = rng.rand(20, 3, 16).astype(np.float32)
    ds = _TubeDataset(arr)
    for tfm in ("TV", "norm"):
        for normalized in (True, False):
            want_h, want_e, _ = ref_stats.helpers_dataset_stats.\
                compute_norm_hist(ds, "CINE_tubes", tfm, bins=10,
                                  normalized=normalized, if_plot=False)
            # reference rolls dims=1 on (C, L) samples -> time_axis=2 on
            # the stacked (N, C, L) array
            _, (got_h, got_e) = norm_histogram(arr, tfm=tfm, bins=10,
                                               normalized=normalized,
                                               time_axis=2)
            np.testing.assert_array_equal(got_h, want_h)
            np.testing.assert_allclose(got_e, want_e, rtol=1e-5, atol=1e-7)


def test_count_samples_matches_reference(ref_stats):
    from inverseproblemwithdiffusionmodel_tpu.utils.dataset_stats import (
        count_samples)

    counts = np.array([3, 0, 5, 2, 7])
    edges = np.linspace(0.0, 1.0, 6)
    for thresh in (0.15, 0.4, 0.95, 2.0, -1.0):
        want = ref_stats.helpers_dataset_stats.count_samples(counts, edges,
                                                             thresh)
        got = count_samples(counts, edges, thresh)
        assert got == tuple(int(v) for v in want)
