"""Model zoo: shapes, sigma division, norm numerics, torch-parity checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.config import load_config
from inverseproblemwithdiffusionmodel_tpu.models import (
    NCSNv2, NCSNv2Deeper, NCSNv2Deepest, NCSN1D, NCSN3DShallow, UNet,
    ResNetClf, load_model, make_score_fn, build_seg_unet)
from inverseproblemwithdiffusionmodel_tpu.models.normalization import (
    InstanceNormPlus, ConditionalInstanceNormPlus)
from inverseproblemwithdiffusionmodel_tpu.models.layers import (
    Conv, ConvTranspose, max_pool, avg_pool, mean_pool_2x, nearest_up_2x)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import get_sigmas


def small_cfg(image_size=16, channels=1, ngf=8, num_classes=10):
    cfg = load_config("MNIST")
    return cfg.replace(**{
        "data.image_size": image_size, "data.channels": channels,
        "model.ngf": ngf, "model.num_classes": num_classes})


# ---------------------------------------------------------------------------
# Layer-level parity with torch
# ---------------------------------------------------------------------------

def test_conv_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)  # HWIO
    b = rng.randn(5).astype(np.float32)

    conv = Conv(features=5, kernel_size=3, dilation=2)
    out = conv.apply({"params": {"kernel": jnp.asarray(w),
                                 "bias": jnp.asarray(b)}}, jnp.asarray(x))
    want = F.conv2d(torch.tensor(np.moveaxis(x, -1, 1)),
                    torch.tensor(np.transpose(w, (3, 2, 0, 1))),
                    torch.tensor(b), padding=2, dilation=2)
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want.numpy(), 1, -1), atol=1e-4)


def test_conv_transpose_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 12, 3).astype(np.float32)  # (B, kx, ky, T, C)
    w = rng.randn(1, 1, 4, 3, 6).astype(np.float32)   # DHWIO
    b = rng.randn(6).astype(np.float32)

    ct = ConvTranspose(features=6, kernel_size=(1, 1, 4), stride=(1, 1, 2),
                       padding=(0, 0, 1), ndim=3)
    out = ct.apply({"params": {"kernel": jnp.asarray(w),
                               "bias": jnp.asarray(b)}}, jnp.asarray(x))
    # torch: NCDHW, weight (in, out, kd, kh, kw)
    x_t = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    w_t = torch.tensor(np.transpose(w, (3, 4, 0, 1, 2)))
    want = F.conv_transpose3d(x_t, w_t, torch.tensor(b), stride=(1, 1, 2),
                              padding=(0, 0, 1))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(want.numpy(), (0, 2, 3, 4, 1)),
                               atol=1e-4)


def test_instance_norm_plus_matches_torch_reference_numerics():
    """Replicate the InstanceNorm++ formula with torch ops as an independent
    oracle (formula from ncsn/models/normalization.py:163-176)."""
    import torch
    rng = np.random.RandomState(2)
    x = rng.randn(3, 8, 8, 6).astype(np.float32)
    alpha = rng.randn(6).astype(np.float32)
    gamma = rng.randn(6).astype(np.float32)
    beta = rng.randn(6).astype(np.float32)

    mod = InstanceNormPlus(num_features=6)
    out = mod.apply({"params": {"alpha": jnp.asarray(alpha),
                                "gamma": jnp.asarray(gamma),
                                "beta": jnp.asarray(beta)}}, jnp.asarray(x))

    xt = torch.tensor(np.moveaxis(x, -1, 1))  # NCHW
    means = torch.mean(xt, dim=(2, 3))
    m = torch.mean(means, dim=-1, keepdim=True)
    v = torch.var(means, dim=-1, keepdim=True)
    means_n = (means - m) / torch.sqrt(v + 1e-5)
    h = torch.nn.functional.instance_norm(xt, eps=1e-5)
    h = h + means_n[..., None, None] * torch.tensor(alpha)[None, :, None, None]
    want = (torch.tensor(gamma)[None, :, None, None] * h
            + torch.tensor(beta)[None, :, None, None])
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(want.numpy(), 1, -1), atol=1e-4)


def test_pools_match_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    xt = torch.tensor(np.moveaxis(x, -1, 1))

    got = np.asarray(max_pool(jnp.asarray(x), 2))
    want = F.max_pool2d(xt, 5, 1, 2).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)

    got = np.asarray(avg_pool(jnp.asarray(x), 2))
    want = F.avg_pool2d(xt, 5, 1, 2).numpy()  # count_include_pad=True default
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)

    x8 = rng.randn(2, 8, 8, 4).astype(np.float32)
    got = np.asarray(mean_pool_2x(jnp.asarray(x8), 2))
    want = F.avg_pool2d(torch.tensor(np.moveaxis(x8, -1, 1)), 2, 2).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_nearest_up_2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = np.asarray(nearest_up_2x(x, 2))
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(up[0, 0, :, 0], [0, 0, 1, 1])
    np.testing.assert_array_equal(up[0, :, 0, 0], [0, 0, 2, 2])


# ---------------------------------------------------------------------------
# Score nets: shapes + sigma scaling
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cls,size", [(NCSNv2, 16), (NCSNv2Deeper, 16),
                                      (NCSNv2Deepest, 32)])
def test_ncsnv2_family_shapes(cls, size):
    cfg = small_cfg(image_size=size)
    model = cls(config=cfg)
    x = jnp.ones((2, size, size, 1)) * 0.5
    sig = jnp.asarray([1.0, 2.0])
    params = model.init(jax.random.PRNGKey(0), x, sig)["params"]
    out = model.apply({"params": params}, x, sig)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sigma_division():
    """Output scales as 1/sigma: out(sigma=2) == out(sigma=1) / 2."""
    cfg = small_cfg()
    model = NCSNv2(config=cfg)
    x = jnp.ones((2, 16, 16, 1)) * 0.3
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((2,)))["params"]
    out1 = model.apply({"params": params}, x, jnp.asarray([1.0, 1.0]))
    out2 = model.apply({"params": params}, x, jnp.asarray([2.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1) / 2,
                               rtol=1e-5)


def test_ncsn1d_shapes():
    cfg = small_cfg(image_size=24, channels=16)
    model = NCSN1D(cfg)
    x = jnp.ones((3, 24, 16)) * 0.5  # (B, T, C)
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((3,)))["params"]
    out = model.apply({"params": params}, x, jnp.ones((3,)))
    assert out.shape == x.shape


def test_ncsn3d_shallow_tube_roundtrip():
    cfg = small_cfg(image_size=24, channels=16)  # win=4, T=24
    cfg = cfg.replace(**{"data.channels_3d": 1})
    model = NCSN3DShallow(config=cfg)
    tubes = jnp.ones((2, 24, 16)) * 0.5  # (B, T, kx*ky)
    params = model.init(jax.random.PRNGKey(0), tubes, jnp.ones((2,)))["params"]
    out = model.apply({"params": params}, tubes, jnp.ones((2,)))
    assert out.shape == tubes.shape
    # volume input path
    vol = jnp.ones((2, 4, 4, 24, 1)) * 0.5
    out_v = model.apply({"params": params}, vol, jnp.ones((2,)))
    assert out_v.shape == vol.shape


def test_unet_shapes():
    net = UNet(out_channels=2, features=(8, 16, 32), strides=(2, 2), ndim=2)
    x = jnp.ones((2, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 2)


def test_resnet_clf_shapes():
    from inverseproblemwithdiffusionmodel_tpu.config import load_general_config
    clf = ResNetClf(config=load_general_config())
    x = jnp.ones((2, 32, 32, 1))
    params = clf.init(jax.random.PRNGKey(0), x)["params"]
    out = clf.apply({"params": params}, x)
    assert out.shape == (2, 10)


def test_registry_load_model_and_score_fn():
    cfg = small_cfg()
    module, params = load_model(cfg, "Diffusion")  # NCSNv2Deepest
    sigmas = get_sigmas(cfg)
    score_fn = make_score_fn(module, params, sigmas)
    x = jnp.ones((1, 16, 16, 1)) * 0.5
    out = score_fn(x, jnp.asarray([3], dtype=jnp.int32))
    assert out.shape == x.shape


def test_conditional_instance_norm_plus():
    mod = ConditionalInstanceNormPlus(num_features=4, num_classes=5)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4),
                    dtype=jnp.float32)
    y = jnp.asarray([0, 3], dtype=jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), x, y)["params"]
    out = mod.apply({"params": params}, x, y)
    assert out.shape == x.shape
