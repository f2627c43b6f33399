"""Reference-oracle parity wave 9: remaining model variants, mask
generation, and the CINE .mat loader.

Covered (reference paths into /root/reference):
  - `ncsn/models/ncsn1d.py:133,227` NCSN1DDeeper / NCSN1DDeepest forwards
    under imported weights (the 1-D Deeper/Deepest variants; plain NCSN1D
    is pinned in wave 1)
  - `ncsn/models/ncsn3d.py:14-120` full-depth NCSN3D forward under imported
    weights, in both the volume (B,1,kx,ky,T) and pixel-tube (B,C,T)
    input layouts (the rank-3 rearrange at :84,118)
  - `ncsn/linear_transforms/__init__.py:60-76` generate_mask: exact
    draw-for-draw parity (np.random.seed + rand/choice stream) across the
    R=8/16/20 presets of undersampling_fourier.py:63-75, T=1 and T>1
  - `helpers/load_data.py:125-164` load_cine: .mat ingestion, per-sample
    min-max normalization, spatial flattening (no-resize path; the resize
    paths go through monai which is absent from this image and are pinned
    against torch interpolation directly in test_ops.py)

No reference code is copied - the reference runs as an opaque oracle.
"""
import os
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.oracle_common import ref_modules, stub_module

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return ref_modules(pytest, "ncsn.models.ncsn1d", "ncsn.models.ncsn3d",
                       "ncsn.linear_transforms")


@pytest.fixture(scope="module")
def ref_data():
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
    return ref_modules(pytest, "helpers.load_data")


def _ref_config(channels=1, image_size=32, ngf=8, num_classes=16,
                channels_3d=1):
    NS = types.SimpleNamespace
    return NS(
        data=NS(channels=channels, image_size=image_size,
                logit_transform=False, rescaled=False,
                channels_3d=channels_3d),
        model=NS(ngf=ngf, num_classes=num_classes, nonlinearity="elu",
                 normalization="InstanceNorm++", sigma_begin=10.0,
                 sigma_end=0.01, sigma_dist="geometric"),
        device="cpu",
    )


def _our_config(ref_cfg):
    from inverseproblemwithdiffusionmodel_tpu.config import Config
    m, d = ref_cfg.model, ref_cfg.data
    return Config({
        "data": {"channels": d.channels, "image_size": d.image_size,
                 "logit_transform": False, "rescaled": False,
                 "channels_3d": d.channels_3d},
        "model": {"ngf": m.ngf, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++",
                  "sigma_begin": m.sigma_begin, "sigma_end": m.sigma_end,
                  "num_classes": m.num_classes, "sigma_dist": m.sigma_dist},
    })


def _port_and_compare(ref_model, our_module, x_torch_layout, labels, atol):
    """torch state_dict -> Flax params; same inputs -> same outputs.
    Torch layout is channel-after-batch; ours is channel-last."""
    from inverseproblemwithdiffusionmodel_tpu.utils.torch_import import (
        convert_ncsn_state_dict)
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x_torch_layout),
                         torch.from_numpy(labels)).numpy()

    sigmas = ref_model.sigmas.numpy()
    x_ours = np.moveaxis(x_torch_layout, 1, -1)
    template = our_module.init(jax.random.PRNGKey(0), jnp.asarray(x_ours),
                               jnp.ones((x_torch_layout.shape[0],)))["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_ncsn_state_dict(sd, template)
    got = our_module.apply({"params": params}, jnp.asarray(x_ours),
                           jnp.asarray(sigmas[labels]))
    got = np.moveaxis(np.asarray(got), -1, 1)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


# ---------------------------------------------------------------------------
# NCSN1DDeeper / NCSN1DDeepest (ncsn1d.py:133,227)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["NCSN1DDeeper", "NCSN1DDeepest"])
def test_ncsn1d_deeper_family_output_parity(ref, name):
    import inverseproblemwithdiffusionmodel_tpu.models.ncsn1d as ours
    torch.manual_seed(0)
    cfg = _ref_config(channels=16, image_size=64, ngf=8)
    ref_model = getattr(ref.ncsn_models_ncsn1d, name)(cfg)
    our_module = getattr(ours, name)(_our_config(cfg))

    rng = np.random.RandomState(11)
    x = rng.rand(2, 16, 64).astype(np.float32)  # (B, C, T)
    labels = np.array([2, 9], np.int64)
    _port_and_compare(ref_model, our_module, x, labels, atol=5e-4)


# ---------------------------------------------------------------------------
# NCSN3D full depth (ncsn3d.py:14-120)
# ---------------------------------------------------------------------------

def test_ncsn3d_full_output_parity(ref):
    from inverseproblemwithdiffusionmodel_tpu.models.ncsn3d import NCSN3D
    torch.manual_seed(0)
    cfg = _ref_config(channels=16, image_size=8, ngf=8)
    ref_model = ref.ncsn_models_ncsn3d.NCSN3D(cfg)
    our_module = NCSN3D(_our_config(cfg))

    rng = np.random.RandomState(12)
    x = rng.rand(2, 1, 4, 4, 8).astype(np.float32)  # (B, 1, kx, ky, T)
    labels = np.array([1, 6], np.int64)
    _port_and_compare(ref_model, our_module, x, labels, atol=5e-4)


def test_ncsn3d_full_tube_layout_parity(ref):
    """Rank-3 pixel-tube inputs go through the rearrange at ncsn3d.py:84,118
    ((B, C kx ky, T) <-> volumes with kx = sqrt(data.channels))."""
    from inverseproblemwithdiffusionmodel_tpu.models.ncsn3d import NCSN3D
    torch.manual_seed(1)
    cfg = _ref_config(channels=16, image_size=8, ngf=8)
    ref_model = ref.ncsn_models_ncsn3d.NCSN3D(cfg)
    our_module = NCSN3D(_our_config(cfg))

    rng = np.random.RandomState(13)
    x = rng.rand(2, 16, 8).astype(np.float32)  # (B, kx*ky, T) tubes
    labels = np.array([0, 4], np.int64)
    _port_and_compare(ref_model, our_module, x, labels, atol=5e-4)


# ---------------------------------------------------------------------------
# generate_mask (linear_transforms/__init__.py:60-76)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("preset", [
    dict(sw=0.3, sm=0.7, sa=0.045),       # default (R~4)
    dict(sw=0.196, sm=0.5, sa=0.02),      # R=8  (undersampling_fourier.py:65)
    dict(sw=0.07926, sm=0.42, sa=0.02),   # R=16 (:68)
    dict(sw=0.07, sm=0.3, sa=0.01782),    # R=20 (:71)
])
@pytest.mark.parametrize("T", [1, 5])
def test_generate_mask_matches_reference(ref, preset, T):
    """Same seed -> identical masks: our RandomState(seed) replays the
    reference's np.random.seed global rand/choice stream draw for draw."""
    from inverseproblemwithdiffusionmodel_tpu.operators.masks import (
        generate_mask)
    want = ref.ncsn_linear_transforms.generate_mask(
        T, 64, seed=7, **preset).numpy()
    got = generate_mask(T, 64, seed=7, **preset)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got.astype(bool), want.astype(bool))


# ---------------------------------------------------------------------------
# load_cine (helpers/load_data.py:125-164)
# ---------------------------------------------------------------------------

def _write_cine_mat(tmp_path, H=10, W=10, T=6, N=3, seed=21):
    import scipy.io as sio
    rng = np.random.RandomState(seed)
    imgs = rng.rand(H, W, T, N).astype(np.float64) * 3.0 + 0.5
    sio.savemat(os.path.join(str(tmp_path), "cine_test_small.mat"),
                {"imgs": imgs})
    return imgs


def test_load_cine_spatial_matches_reference(ref_data, tmp_path):
    """Spatial flatten, no resize: .mat -> (N,T,H,W) -> per-sample min-max
    -> (N*T, 1, H, W) frames (load_data.py:131-148). Ours is channel-last
    (N*T, H, W, 1)."""
    from inverseproblemwithdiffusionmodel_tpu.data.datasets import load_cine
    _write_cine_mat(tmp_path)
    ref_ds = ref_data.helpers_load_data.load_cine(
        str(tmp_path), mode="val", flatten=True, flatten_type="spatial")
    want = ref_ds.tensors[0].numpy()                       # (N*T, 1, H, W)
    got = load_cine(root_dir=str(tmp_path), mode="val", flatten=True,
                    flatten_type="spatial")
    got = np.stack([np.asarray(got[i]) for i in range(len(got))])
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want,
                               rtol=1e-6, atol=1e-7)


def test_load_cine_unflattened_matches_reference(ref_data, tmp_path):
    """flatten=False returns the normalized (N, T, H, W) volumes."""
    from inverseproblemwithdiffusionmodel_tpu.data.datasets import load_cine
    _write_cine_mat(tmp_path, H=8, W=8, T=4, N=2, seed=22)
    ref_ds = ref_data.helpers_load_data.load_cine(
        str(tmp_path), mode="test", flatten=False)
    want = ref_ds.tensors[0].numpy()
    got = load_cine(root_dir=str(tmp_path), mode="test", flatten=False)
    got = np.stack([np.asarray(got[i]) for i in range(len(got))])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# vol2slice (helpers/load_data.py:185-203)
# ---------------------------------------------------------------------------

def test_vol2slice_matches_reference(ref_data, tmp_path):
    """Volume .npz -> per-slice .npz: same filenames, same arrays."""
    from inverseproblemwithdiffusionmodel_tpu.data.datasets import vol2slice
    rng = np.random.RandomState(31)
    vol_dir = tmp_path / "vols"
    vol_dir.mkdir()
    for name in ("caseA", "caseB"):
        np.savez(str(vol_dir / f"{name}.npz"),
                 image=rng.rand(1, 3, 6, 6).astype(np.float32),
                 multiClassMasks=rng.randint(0, 4, (1, 3, 6, 6)),
                 PD=rng.rand(1, 3, 6, 6), T1=rng.rand(1, 3, 6, 6),
                 T2=rng.rand(1, 3, 6, 6))
    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    ref_data.helpers_load_data.vol2slice(str(vol_dir), ref_dir)
    vol2slice(str(vol_dir), our_dir)
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(our_dir)) and len(ref_files) == 6
    for f in ref_files:
        want = np.load(os.path.join(ref_dir, f))
        got = np.load(os.path.join(our_dir, f))
        for key in ("image", "multiClassMasks", "PD", "T1", "T2"):
            np.testing.assert_array_equal(got[key], want[key])


# ---------------------------------------------------------------------------
# get_ddpm_params (models/utils.py:63-85)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_scales", [1000, 500])
def test_get_ddpm_params_matches_reference(num_scales):
    from inverseproblemwithdiffusionmodel_tpu.sde import get_ddpm_params
    ref_utils = ref_modules(pytest, "models.utils")
    cfg = types.SimpleNamespace(model=types.SimpleNamespace(
        beta_min=0.1, beta_max=20.0, num_scales=num_scales))
    want = ref_utils.models_utils.get_ddpm_params(cfg)
    got = get_ddpm_params(0.1, 20.0, num_scales)
    for key in ("betas", "alphas", "alphas_cumprod", "sqrt_alphas_cumprod",
                "sqrt_1m_alphas_cumprod"):
        np.testing.assert_allclose(np.asarray(got[key], np.float64),
                                   want[key], rtol=1e-6)
    assert got["num_diffusion_timesteps"] == want["num_diffusion_timesteps"]
    np.testing.assert_allclose(got["beta_min"], want["beta_min"], rtol=1e-12)
    np.testing.assert_allclose(got["beta_max"], want["beta_max"], rtol=1e-12)


# ---------------------------------------------------------------------------
# undersample_seg_mask count semantics (helpers/utils.py:314-327) and
# data_transform's image_mean branch (helpers/utils.py:223-224)
# ---------------------------------------------------------------------------

def test_undersample_seg_mask_count_matches_reference():
    """The reference keeps EXACTLY max(1, int(n_fg * fraction)) foreground
    pixels; draws differ (torch randperm vs jax ranks) but the kept count
    and foreground-subset property must match."""
    ref_utils = ref_modules(pytest, "helpers.utils")
    import jax
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import (
        undersample_seg_mask)
    rng = np.random.RandomState(41)
    label = (rng.rand(1, 1, 12, 12) > 0.8).astype(np.float32)  # ~29 fg px
    for fraction in (0.02, 0.1, 0.5, 1.0):
        want = ref_utils.helpers_utils.undersample_seg_mask(
            torch.from_numpy(label), fraction=fraction, seed=5).numpy()
        got = np.asarray(undersample_seg_mask(
            jnp.asarray(label), fraction, jax.random.PRNGKey(5)))
        assert got.sum() == want.sum() >= 1, fraction
        assert np.all(label[got > 0] > 0)  # kept pixels are foreground


def test_data_transform_image_mean_matches_reference():
    ref_utils = ref_modules(pytest, "helpers.utils")
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import (
        data_transform)
    from inverseproblemwithdiffusionmodel_tpu.config import Config
    rng = np.random.RandomState(42)
    X = rng.rand(3, 4, 4, 1).astype(np.float32)
    mean = rng.rand(4, 4, 1).astype(np.float32)
    ref_cfg = types.SimpleNamespace(
        data=types.SimpleNamespace(uniform_dequantization=False,
                                   gaussian_dequantization=False,
                                   rescaled=True, logit_transform=False),
        image_mean=torch.from_numpy(mean))
    want = ref_utils.helpers_utils.data_transform(
        ref_cfg, torch.from_numpy(X)).numpy()
    cfg = Config({"data": {"uniform_dequantization": False,
                           "gaussian_dequantization": False,
                           "rescaled": True, "logit_transform": False},
                  "image_mean": mean})
    got = np.asarray(data_transform(cfg, jnp.asarray(X)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
