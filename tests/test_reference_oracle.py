"""Output-level parity oracles against the ACTUAL reference implementation.

These tests import the reference package itself (`/root/reference`, made
importable as the namespace package `InverseProblemWithDiffusionModel` via a
symlink, with its missing heavy deps stubbed), randomly initialize the
reference torch nets, port their `state_dict`s through
`utils/torch_import.py`, and assert OUR Flax nets produce the same outputs
on the same inputs. This is the strongest checkpoint-parity guarantee we
can state: any reference-trained checkpoint behaves identically here.

No reference code is copied — the reference runs as an opaque oracle.

Covered:
  - `ncsn/models/__init__.py:10-38` get_sigmas (both modes, both dists)
  - `ncsn/models/ncsnv2.py:11,104,198` NCSNv2 / Deeper / Deepest forward
  - `ncsn/models/ncsn1d.py:40` NCSN1D forward
  - `ncsn/models/ncsn3d.py:123` NCSN3DShallow forward
  - `ncsn/linear_transforms/__init__.py:36-57` i2k/k2i centered FFT pair
  - `ncsn/linear_transforms/masking.py:6-44` SkipLines fwd/adjoint/projection
  - `ncsn/losses/dsm.py:3-19` anneal_dsm_score_estimation golden values
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
    """Import the reference modules (torch CPU) as parity oracles."""
    ns = ref_modules(
        pytest,
        "ncsn.models",
        "ncsn.models.ncsnv2",
        "ncsn.models.ncsn1d",
        "ncsn.models.ncsn3d",
        "ncsn.linear_transforms",
        "ncsn.linear_transforms.masking",
        "ncsn.losses.dsm",
    )
    # keep this file's historical short names
    ns.models_init = ns.ncsn_models
    ns.ncsnv2 = ns.ncsn_models_ncsnv2
    ns.ncsn1d = ns.ncsn_models_ncsn1d
    ns.ncsn3d = ns.ncsn_models_ncsn3d
    ns.lin_tfm = ns.ncsn_linear_transforms
    ns.masking = ns.ncsn_linear_transforms_masking
    ns.dsm = ns.ncsn_losses_dsm
    return ns


def _ref_config(channels=1, image_size=32, ngf=8, num_classes=16,
                sigma_begin=10.0, sigma_end=0.01, sigma_dist="geometric",
                channels_3d=1):
    NS = types.SimpleNamespace
    return NS(
        data=NS(channels=channels, image_size=image_size,
                logit_transform=False, rescaled=False,
                channels_3d=channels_3d),
        model=NS(ngf=ngf, num_classes=num_classes, nonlinearity="elu",
                 normalization="InstanceNorm++", sigma_begin=sigma_begin,
                 sigma_end=sigma_end, sigma_dist=sigma_dist),
        recons=NS(num_classes=num_classes // 2, sigma_begin=sigma_begin / 2,
                  sigma_end=sigma_end, sigma_dist=sigma_dist),
        device="cpu",
    )


def _our_config(ref_cfg):
    from inverseproblemwithdiffusionmodel_tpu.config import Config
    m, d, r = ref_cfg.model, ref_cfg.data, ref_cfg.recons
    return Config({
        "data": {"channels": d.channels, "image_size": d.image_size,
                 "logit_transform": False, "rescaled": False,
                 "channels_3d": d.channels_3d},
        "model": {"ngf": m.ngf, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++",
                  "sigma_begin": m.sigma_begin, "sigma_end": m.sigma_end,
                  "num_classes": m.num_classes, "sigma_dist": m.sigma_dist},
        "recons": {"num_classes": r.num_classes,
                   "sigma_begin": r.sigma_begin, "sigma_end": r.sigma_end,
                   "sigma_dist": r.sigma_dist},
    })


# ---------------------------------------------------------------------------
# sigma ladders
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dist", ["geometric", "uniform"])
@pytest.mark.parametrize("mode", ["unconditioned", "recons"])
def test_get_sigmas_matches_reference(ref, dist, mode):
    from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import (
        get_sigmas)
    cfg = _ref_config(sigma_dist=dist)
    want = ref.models_init.get_sigmas(cfg, mode=mode).numpy()
    got = np.asarray(get_sigmas(_our_config(cfg), mode=mode))
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# score networks: same weights -> same outputs
# ---------------------------------------------------------------------------

def _port_and_compare(ref_model, our_module, x_nchw, labels, atol,
                      to_flax_layout, from_flax_layout):
    """state_dict -> Flax params; compare forward outputs."""
    from inverseproblemwithdiffusionmodel_tpu.utils.torch_import import (
        convert_ncsn_state_dict)
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x_nchw),
                         torch.from_numpy(labels)).numpy()

    sigmas = ref_model.sigmas.numpy()
    x_ours = to_flax_layout(x_nchw)
    template = our_module.init(jax.random.PRNGKey(0), jnp.asarray(x_ours),
                               jnp.ones((x_nchw.shape[0],)))["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_ncsn_state_dict(sd, template)
    got = our_module.apply({"params": params}, jnp.asarray(x_ours),
                           jnp.asarray(sigmas[labels]))
    got = from_flax_layout(np.asarray(got))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


@pytest.mark.parametrize("name,size", [("NCSNv2", 32),
                                       ("NCSNv2Deeper", 64),
                                       ("NCSNv2Deepest", 64)])
def test_ncsnv2_family_output_parity(ref, name, size):
    """Reference ncsn/models/ncsnv2.py:11,104,198 vs models/ncsnv2.py."""
    import inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 as ours
    torch.manual_seed(0)
    cfg = _ref_config(image_size=size, ngf=8)
    ref_model = getattr(ref.ncsnv2, name)(cfg)
    our_module = getattr(ours, name)(config=_our_config(cfg))

    rng = np.random.RandomState(1)
    x = rng.rand(2, 1, size, size).astype(np.float32)
    labels = np.array([0, 5], np.int64)
    _port_and_compare(
        ref_model, our_module, x, labels, atol=5e-4,
        to_flax_layout=lambda a: np.moveaxis(a, 1, -1),
        from_flax_layout=lambda a: np.moveaxis(a, -1, 1))


def test_ncsn1d_output_parity(ref):
    """Reference ncsn/models/ncsn1d.py:40 vs models/ncsn1d.py (signals as
    (B, C, T) there, (B, T, C) here)."""
    from inverseproblemwithdiffusionmodel_tpu.models.ncsn1d import NCSN1D
    torch.manual_seed(0)
    cfg = _ref_config(channels=16, image_size=16, ngf=8)
    ref_model = ref.ncsn1d.NCSN1D(cfg)
    our_module = NCSN1D(_our_config(cfg))

    rng = np.random.RandomState(2)
    x = rng.rand(2, 16, 16).astype(np.float32)  # (B, C, T)
    labels = np.array([1, 7], np.int64)
    _port_and_compare(
        ref_model, our_module, x, labels, atol=5e-4,
        to_flax_layout=lambda a: np.moveaxis(a, 1, -1),
        from_flax_layout=lambda a: np.moveaxis(a, -1, 1))


def test_ncsn3d_shallow_output_parity(ref):
    """Reference ncsn/models/ncsn3d.py:123 vs models/ncsn3d.py; reference
    layout (B, 1, kx, ky, T), ours (B, kx, ky, T, 1)."""
    from inverseproblemwithdiffusionmodel_tpu.models.ncsn3d import (
        NCSN3DShallow)
    torch.manual_seed(0)
    cfg = _ref_config(channels=16, image_size=8, ngf=8)
    ref_model = ref.ncsn3d.NCSN3DShallow(cfg)
    our_module = NCSN3DShallow(_our_config(cfg))

    rng = np.random.RandomState(3)
    x = rng.rand(2, 1, 4, 4, 8).astype(np.float32)
    labels = np.array([0, 3], np.int64)
    _port_and_compare(
        ref_model, our_module, x, labels, atol=5e-4,
        to_flax_layout=lambda a: np.moveaxis(a, 1, -1),
        from_flax_layout=lambda a: np.moveaxis(a, -1, 1))


# ---------------------------------------------------------------------------
# linear transforms
# ---------------------------------------------------------------------------

def test_i2k_k2i_match_reference(ref):
    """Centered orthonormal FFT pair (linear_transforms/__init__.py:36-57)."""
    from inverseproblemwithdiffusionmodel_tpu.ops.fft import (
        i2k_complex, k2i_complex)
    rng = np.random.RandomState(4)
    x = (rng.randn(2, 1, 8, 8) + 1j * rng.randn(2, 1, 8, 8)).astype(
        np.complex64)
    want_k = ref.lin_tfm.i2k_complex(torch.from_numpy(x)).numpy()
    # ours is channel-last: (B, H, W, C), FFT over (H, W) = axes (1, 2)
    x_ours = np.moveaxis(x, 1, -1)
    got_k = np.moveaxis(
        np.asarray(i2k_complex(jnp.asarray(x_ours), axes=(1, 2))), -1, 1)
    np.testing.assert_allclose(got_k, want_k, atol=1e-5)

    want_x = ref.lin_tfm.k2i_complex(torch.from_numpy(want_k)).numpy()
    got_x = np.moveaxis(
        np.asarray(k2i_complex(jnp.asarray(np.moveaxis(want_k, 1, -1)),
                               axes=(1, 2))), -1, 1)
    np.testing.assert_allclose(got_x, want_x, atol=1e-5)


def test_skiplines_matches_reference(ref):
    """SkipLines forward / adjoint / projection (masking.py:6-44)."""
    from inverseproblemwithdiffusionmodel_tpu.operators.masking import (
        SkipLines)
    rng = np.random.RandomState(5)
    x = rng.randn(2, 1, 12, 6).astype(np.float32)
    ref_op = ref.masking.SkipLines(3, (1, 12, 6))
    ours = SkipLines(num_skip_lines=3, height=12)

    x_t = torch.from_numpy(x)
    want_fwd = ref_op(x_t).numpy()
    got_fwd = np.moveaxis(np.asarray(ours(jnp.asarray(np.moveaxis(x, 1, -1)))),
                          -1, 1)
    np.testing.assert_allclose(got_fwd, want_fwd, atol=0)

    want_adj = ref_op.conj_op(torch.from_numpy(want_fwd)).numpy()
    got_adj = np.moveaxis(
        np.asarray(ours.conj_op(jnp.asarray(np.moveaxis(want_fwd, 1, -1)))),
        -1, 1)
    np.testing.assert_allclose(got_adj, want_adj, atol=0)

    s = rng.randn(*want_fwd.shape).astype(np.float32)
    lam = 0.7
    want_proj = ref_op.projection(x_t, torch.from_numpy(s), lam).numpy()
    got_proj = np.moveaxis(np.asarray(ours.projection(
        jnp.asarray(np.moveaxis(x, 1, -1)),
        jnp.asarray(np.moveaxis(s, 1, -1)), lam)), -1, 1)
    np.testing.assert_allclose(got_proj, want_proj, atol=1e-6)


# ---------------------------------------------------------------------------
# DSM loss golden values
# ---------------------------------------------------------------------------

def test_dsm_loss_matches_reference(ref):
    """anneal_dsm_score_estimation (ncsn/losses/dsm.py:3-19) with the torch
    randomness replayed: same perturbation noise + labels -> same loss."""
    from inverseproblemwithdiffusionmodel_tpu.losses.dsm import (
        anneal_dsm_score_estimation)

    class _LinearScore(torch.nn.Module):
        """score(x, y) = -x / sigmas[y] — analytic, no parameters."""
        def __init__(self, sigmas):
            super().__init__()
            self.s = torch.from_numpy(sigmas)

        def forward(self, x, y):
            return -x / self.s[y].view(-1, 1, 1, 1)

    sigmas_np = np.geomspace(10.0, 0.01, 8).astype(np.float32)
    rng = np.random.RandomState(6)
    x = rng.rand(4, 1, 8, 8).astype(np.float32)
    labels = np.array([0, 2, 4, 7])
    noise = rng.randn(4, 1, 8, 8).astype(np.float32)

    # reference draws labels and noise internally; replay them
    torch_x = torch.from_numpy(x)
    real_randint = torch.randint
    real_randn_like = torch.randn_like
    torch.randint = lambda *a, **k: torch.from_numpy(labels)
    torch.randn_like = lambda t: torch.from_numpy(noise)
    try:
        want = float(ref.dsm.anneal_dsm_score_estimation(
            _LinearScore(sigmas_np), torch_x,
            torch.from_numpy(sigmas_np), None, anneal_power=2.0))
    finally:
        torch.randint = real_randint
        torch.randn_like = real_randn_like

    def score_fn(xx, yy):
        return -xx / jnp.asarray(sigmas_np)[yy].reshape(-1, 1, 1, 1)

    got = float(anneal_dsm_score_estimation(
        score_fn, jnp.asarray(x), jnp.asarray(sigmas_np),
        jax.random.PRNGKey(0), labels=jnp.asarray(labels),
        noise=jnp.asarray(noise), anneal_power=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)
