"""Output-level parity oracles, wave 5: the data pipeline and scaling
helpers, against the running reference.

Covered (reference paths into /root/reference):
  - `helpers/utils.py:207-226` logit_transform + data_transform (all four
    branches; dequantization randomness replayed on both sides)
  - `helpers/utils.py:287-305` quantile normalize (+ return_q) / denormalize
  - `helpers/utils.py:402-410` normalize_phase; `:20-27` expand_like
  - `helpers/utils.py:314-327` undersample_seg_mask (fraction=1 identity)
  - `helpers/load_data.py:324-369` collate_batch: real-valued / complex /
    real-imag (global phase replayed), image and 1-D signal layouts
  - `helpers/load_data.py:417-440` filter_batch: the reference's row-drop
    mask vs our jit-safe keep-weights

`add_phase` (load_data.py:372-397) cannot be oracled in this image: it
resizes through monai's bicubic Resize and monai is absent (our linear
align-corners resize is pinned against torch directly in test_ops.py).

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
    # load_data needs the monai/torchvision import surface present; the
    # functions under test never call into it
    cls = type("StubTransform", (), {"__init__": lambda self, *a, **k: None})
    stub_module("monai.transforms", Compose=cls, Transform=cls,
                MapTransform=cls, ScaleIntensityd=cls, CropForegroundd=cls,
                Resize=cls, Resized=cls, RandRotated=cls,
                RandAdjustContrastd=cls, RandGaussianNoised=cls)
    stub_module("monai.data", CacheDataset=cls, Dataset=cls)
    stub_module("monai.utils", CommonKeys=types.SimpleNamespace(
        IMAGE="image", LABEL="label"))
    stub_module("torchvision.datasets", MNIST=cls, CIFAR10=cls)
    stub_module("torchvision.transforms", Compose=cls, ToTensor=cls,
                Normalize=cls, Resize=cls)
    return ref_modules(pytest, "helpers.utils", "helpers.load_data")


def _cfg(uniform=False, gaussian=False, rescaled=False, logit=False):
    NS = types.SimpleNamespace
    return NS(data=NS(uniform_dequantization=uniform,
                      gaussian_dequantization=gaussian,
                      rescaled=rescaled, logit_transform=logit))


@pytest.mark.parametrize("branch", ["rescaled", "logit", "uniform",
                                    "gaussian"])
def test_data_transform_matches_reference(ref, monkeypatch, branch):
    """helpers/utils.py:207-226 (dequantization draws replayed)."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import data_transform
    rng = np.random.RandomState(40)
    x = rng.rand(2, 1, 8, 8).astype(np.float32) * 0.8 + 0.1
    u = rng.rand(2, 1, 8, 8).astype(np.float32)
    g = rng.randn(2, 1, 8, 8).astype(np.float32)

    cfg = _cfg(**{
        "rescaled": dict(rescaled=True),
        "logit": dict(logit=True),
        "uniform": dict(uniform=True),
        "gaussian": dict(gaussian=True),
    }[branch])

    monkeypatch.setattr(torch, "rand_like", lambda t: torch.from_numpy(u))
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.from_numpy(g))
    want = ref.helpers_utils.data_transform(cfg, torch.from_numpy(x)).numpy()

    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), dtype=jnp.float32, **kw: jnp.asarray(u))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(g))
    got = np.asarray(data_transform(cfg, jnp.asarray(x),
                                    key=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_quantile_normalize_matches_reference(ref):
    """helpers/utils.py:287-297."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import normalize
    rng = np.random.RandomState(41)
    x = (rng.randn(1, 1, 16, 16) * 3 + 1).astype(np.float32)
    want, lo_w, hi_w = ref.helpers_utils.normalize(
        torch.from_numpy(x), 0.05, 0.9, return_q=True)
    got, lo_g, hi_g = normalize(jnp.asarray(x), 0.05, 0.9, return_q=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)
    np.testing.assert_allclose(float(lo_g), float(lo_w), rtol=1e-5)
    np.testing.assert_allclose(float(hi_g), float(hi_w), rtol=1e-5)


def test_denormalize_matches_reference(ref):
    """helpers/utils.py:300-305."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import denormalize
    rng = np.random.RandomState(42)
    x = rng.rand(2, 1, 8, 8).astype(np.float32)
    want = ref.helpers_utils.denormalize(torch.from_numpy(x), 0.3, 1.7)
    got = denormalize(jnp.asarray(x), 0.3, 1.7)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_normalize_phase_and_expand_like_match_reference(ref):
    """helpers/utils.py:402-410 and :20-27."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import (
        expand_like, normalize_phase)
    rng = np.random.RandomState(43)
    ph = (rng.rand(2, 1, 4, 4).astype(np.float32) * 2 - 1) * np.pi
    want = ref.helpers_utils.normalize_phase(torch.from_numpy(ph)).numpy()
    np.testing.assert_allclose(np.asarray(normalize_phase(jnp.asarray(ph))),
                               want, atol=1e-6)

    v = rng.rand(3).astype(np.float32)
    mim = rng.rand(3, 1, 2, 2).astype(np.float32)
    want = ref.helpers_utils.expand_like(torch.from_numpy(v),
                                         torch.from_numpy(mim)).numpy()
    got = np.asarray(expand_like(jnp.asarray(v), jnp.asarray(mim)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want)


def test_undersample_seg_mask_full_fraction_matches_reference(ref):
    """helpers/utils.py:314-327 at fraction=1 (keep everything): both sides
    must return the label unchanged. (Partial fractions draw from different
    RNG schemes - reference randperm prefix vs our per-pixel Bernoulli -
    and are pinned statistically in our own unit tests.)"""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import (
        undersample_seg_mask)
    rng = np.random.RandomState(44)
    label = (rng.rand(2, 1, 8, 8) < 0.3).astype(np.float32)
    want = ref.helpers_utils.undersample_seg_mask(
        torch.from_numpy(label), 1.0, seed=0).numpy()
    got = np.asarray(undersample_seg_mask(jnp.asarray(label), 1.0,
                                          jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got, want)
    np.testing.assert_allclose(want, label)


# ---------------------------------------------------------------------------
# collate_batch / filter_batch
# ---------------------------------------------------------------------------

def test_collate_batch_passthrough_and_complex_match_reference(ref):
    """load_data.py:324-369, deterministic modes."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import collate_batch
    rng = np.random.RandomState(45)
    x = rng.rand(2, 1, 8, 8).astype(np.float32)

    for mode in ("real-valued", "mag"):
        want = ref.helpers_load_data.collate_batch(
            torch.from_numpy(x), mode).numpy()
        got = np.asarray(collate_batch(jnp.asarray(np.moveaxis(x, 1, -1)),
                                       mode))
        np.testing.assert_allclose(np.moveaxis(got, -1, 1), want)

    want = ref.helpers_load_data.collate_batch(
        torch.from_numpy(x), "complex").numpy()
    got = np.asarray(collate_batch(jnp.asarray(np.moveaxis(x, 1, -1)),
                                   "complex"))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want)


@pytest.mark.parametrize("layout", ["image", "signal"])
def test_collate_batch_real_imag_matches_reference(ref, monkeypatch, layout):
    """load_data.py:346-356: random global phase per sample, replayed. The
    signal layout is (B, C, T) there, (B, T, C) here."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import collate_batch
    rng = np.random.RandomState(46)
    if layout == "image":
        x = rng.rand(3, 1, 8, 8).astype(np.float32)
        x_ours = np.moveaxis(x, 1, -1)
        back = lambda a: np.moveaxis(a, -1, 1)
    else:
        x = rng.rand(3, 16, 24).astype(np.float32)  # (B, C, T)
        x_ours = np.swapaxes(x, 1, 2)               # (B, T, C)
        back = lambda a: np.swapaxes(a, 1, 2)
    u = rng.rand(3).astype(np.float32)

    monkeypatch.setattr(torch, "rand",
                        lambda *size, **kw: torch.from_numpy(u))
    want_re, want_im = ref.helpers_load_data.collate_batch(
        torch.from_numpy(x), "real-imag")

    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), dtype=jnp.float32, **kw: jnp.asarray(u))
    got_re, got_im = collate_batch(jnp.asarray(x_ours), "real-imag",
                                   key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(back(np.asarray(got_re)), want_re.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(back(np.asarray(got_im)), want_im.numpy(),
                               atol=1e-6)


def test_filter_batch_mask_matches_reference(ref):
    """load_data.py:417-440: the reference DROPS low-TV rows (dynamic
    shape); ours returns keep-weights. The weight vector must be exactly
    the reference's row-membership indicator."""
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import filter_batch
    rng = np.random.RandomState(47)
    B, C, T = 12, 16, 24
    # even rows: dynamic foreground; odd rows: constant-in-time background
    # (zero temporal TV) - each row unique so kept-row membership is
    # reconstructable by equality
    x = np.broadcast_to(rng.rand(B, C, 1), (B, C, T)).astype(np.float32).copy()
    x[::2] = rng.rand(B // 2, C, T)
    th = 0.05

    cfg = types.SimpleNamespace(data=types.SimpleNamespace(th=th, leq=5))
    kept = ref.helpers_load_data.filter_batch(torch.from_numpy(x), cfg)
    # reconstruct the membership indicator from the kept rows
    kept_np = kept.numpy()
    want_mask = np.array([any(np.array_equal(x[i], k) for k in kept_np)
                          for i in range(B)], np.float32)

    got = np.asarray(filter_batch(jnp.asarray(np.swapaxes(x, 1, 2)), th))
    np.testing.assert_allclose(got, want_mask)
    assert got.sum() < B  # the filter actually dropped background rows
