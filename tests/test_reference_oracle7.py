"""Output-level parity oracles, wave 7: the continuous model zoo's flagship
NCSN++ UNet under imported reference weights.

The reference NCSNpp (models/ncsnpp.py:35-381) is randomly initialized,
its state dict ported through `utils/torch_import.convert_ncsnpp_state_dict`
(which replays the reference's flat all_modules construction order), and
our Flax NCSNpp must produce the same outputs on the same inputs, across
the architecture grid the configs actually use:

  - ve-deep style:  fourier embedding, BigGAN blocks, FIR resampling,
    progressive_input=input_skip + progressive=output_skip, scale_by_sigma
  - ddpm++ style:   positional embedding, DDPM blocks, no FIR,
    no progressive pyramids, centered data
  - residual style: fourier, BigGAN, FIR, progressive residual/residual

This is the checkpoint-migration guarantee for the continuous stack: any
reference-trained NCSN++ prior behaves identically here.

Two REFERENCE DEFECTS are worked around (not replicated):
  - the non-FIR Upsample passes the mode string as F.interpolate's
    positional `scale_factor` (models/layerspp.py:117) and crashes on any
    input; the test shims F.interpolate to the intended
    nearest-to-(2H,2W) semantics when driving the reference
  - the fused FIR upsample-conv crashes under torch (negative-step slice,
    up_or_down_sampling.py:126, cf. wave 2), so the residual-progressive
    variant is exercised with fir=False (its fir=True form cannot run
    upstream at all)

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
    return ref_modules(pytest, "models.ncsnpp")


def _mk_config(embedding="fourier", resblock="biggan", fir=True,
               progressive="output_skip", progressive_input="input_skip",
               centered=False, scale_by_sigma=True, combine="sum"):
    NS = types.SimpleNamespace
    return NS(
        training=NS(continuous=True),
        data=NS(image_size=16, num_channels=1, centered=centered),
        model=NS(
            nf=8, ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(8,),
            dropout=0.0, resamp_with_conv=True, conditional=True,
            fir=fir, fir_kernel=[1, 3, 3, 1], skip_rescale=True,
            resblock_type=resblock, progressive=progressive,
            progressive_input=progressive_input, embedding_type=embedding,
            init_scale=0.0, progressive_combine=combine, fourier_scale=16,
            scale_by_sigma=scale_by_sigma, nonlinearity="swish",
            sigma_max=50.0, sigma_min=0.01, num_scales=100,
            beta_min=0.1, beta_max=20.0,
        ),
        device="cpu",
    )


VARIANTS = {
    "ve_deep": dict(),
    "ddpmpp": dict(embedding="positional", resblock="ddpm", fir=False,
                   progressive="none", progressive_input="none",
                   centered=True, scale_by_sigma=False),
    "residual": dict(progressive="residual", progressive_input="residual",
                     fir=False),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_ncsnpp_output_parity(ref, variant, monkeypatch):
    import torch.nn.functional as F
    from inverseproblemwithdiffusionmodel_tpu.models.ncsnpp import NCSNpp
    from inverseproblemwithdiffusionmodel_tpu.utils.torch_import import (
        convert_ncsnpp_state_dict)

    # shim the reference's F.interpolate misuse (see module docstring)
    real_interpolate = F.interpolate

    def fixed_interpolate(x, size=None, scale_factor=None, **kw):
        if isinstance(scale_factor, str):
            kw.setdefault("mode", scale_factor)
            scale_factor = None
        return real_interpolate(x, size=size, scale_factor=scale_factor,
                                **kw)

    monkeypatch.setattr(F, "interpolate", fixed_interpolate)

    cfg = _mk_config(**VARIANTS[variant])
    torch.manual_seed(0)
    ref_model = ref.models_ncsnpp.NCSNpp(cfg)
    # re-randomize every weight: the configs' init_scale=0.0 zeroes the
    # output convs, which would make the parity check vacuously ~0
    gen = torch.Generator().manual_seed(1)
    sd0 = ref_model.state_dict()
    ref_model.load_state_dict(
        {k: torch.randn(v.shape, generator=gen) * 0.1
         for k, v in sd0.items()})
    ref_model.eval()

    rng = np.random.RandomState(60)
    x = rng.rand(2, 1, 16, 16).astype(np.float32)
    if cfg.model.embedding_type == "fourier":
        time_cond = np.array([3.0, 0.5], np.float32)  # sigma values
    else:
        time_cond = np.array([7.0, 42.0], np.float32)  # ladder indices

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x),
                         torch.from_numpy(time_cond)).numpy()

    our_model = NCSNpp(config=cfg)
    x_ours = jnp.asarray(np.moveaxis(x, 1, -1))
    template = our_model.init(jax.random.PRNGKey(0), x_ours,
                              jnp.asarray(time_cond))["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_ncsnpp_state_dict(sd, template, cfg)
    got = our_model.apply({"params": params}, x_ours,
                          jnp.asarray(time_cond))
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert np.abs(want).max() > 1e-4
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_import_cli_continuous_roundtrip(ref, tmp_path):
    """End-to-end migration path for a continuous checkpoint: reference
    NCSNpp state dict saved to disk -> scripts/import_torch_checkpoint
    --continuous -> orbax checkpoint -> restored params produce the
    reference outputs (scripts/import_torch_checkpoint.py)."""
    from inverseproblemwithdiffusionmodel_tpu.configs_continuous import (
        get_continuous_config)
    from inverseproblemwithdiffusionmodel_tpu.models.registry import (
        create_model)
    from inverseproblemwithdiffusionmodel_tpu.scripts import (
        import_torch_checkpoint)
    from inverseproblemwithdiffusionmodel_tpu.scripts._common import (
        apply_overrides)
    from inverseproblemwithdiffusionmodel_tpu.training import (
        Checkpointer, TrainState, get_optimizer)
    import optax

    overrides = ["model.nf=8", "model.ch_mult=[1, 2]",
                 "model.num_res_blocks=2", "model.attn_resolutions=[8]",
                 "data.image_size=16"]
    config = apply_overrides(
        get_continuous_config("ve/cifar10_ncsnpp_continuous"), overrides)

    torch.manual_seed(2)
    ref_model = ref.models_ncsnpp.NCSNpp(config)
    gen = torch.Generator().manual_seed(3)
    ref_model.load_state_dict(
        {k: torch.randn(v.shape, generator=gen) * 0.1
         for k, v in ref_model.state_dict().items()})
    ref_model.eval()

    ckpt_path = tmp_path / "ncsnpp.pth"
    torch.save(ref_model.state_dict(), str(ckpt_path))

    out_dir = tmp_path / "orbax"
    import_torch_checkpoint.main([
        "--ckpt_path", str(ckpt_path),
        "--continuous", "ve/cifar10_ncsnpp_continuous",
        "--out_dir", str(out_dir),
        *[f"--override={o}" for o in overrides],
    ])

    module = create_model(config)
    S = config.data.image_size
    x = np.random.RandomState(61).rand(
        2, config.data.num_channels, S, S).astype(np.float32)
    sig = np.array([2.0, 0.3], np.float32)

    x_ours = jnp.asarray(np.moveaxis(x, 1, -1))
    template = jax.jit(module.init)(jax.random.PRNGKey(0), x_ours,
                                    jnp.asarray(sig))["params"]
    state = TrainState.create(template, get_optimizer(config),
                              ema_decay=0.999)
    ckpt = Checkpointer(str(out_dir), track_best=False)
    state = ckpt.restore(state)
    ckpt.close()

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x),
                         torch.from_numpy(sig)).numpy()
    got = np.moveaxis(np.asarray(module.apply(
        {"params": state.params}, x_ours, jnp.asarray(sig))), -1, 1)
    assert np.abs(want).max() > 1e-4
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_ddpm_output_parity(ref):
    """The original DDPM UNet (models/ddpm.py:40-181) under imported
    reference weights (utils/torch_import.convert_ddpm_state_dict)."""
    from tests.oracle_common import load_reference
    ref_ddpm = load_reference("models.ddpm")
    from inverseproblemwithdiffusionmodel_tpu.models.ddpm import DDPM
    from inverseproblemwithdiffusionmodel_tpu.utils.torch_import import (
        convert_ddpm_state_dict)

    cfg = _mk_config(embedding="positional", resblock="ddpm", fir=False,
                     progressive="none", progressive_input="none",
                     centered=True, scale_by_sigma=False)
    cfg.model.nf = 32  # the DDPM UNet pins 32 GroupNorm groups: channel
    # counts must be multiples of 32 (models/layers.py:563)
    torch.manual_seed(4)
    ref_model = ref_ddpm.models_ddpm.DDPM(cfg)
    gen = torch.Generator().manual_seed(5)
    ref_model.load_state_dict(
        {k: torch.randn(v.shape, generator=gen) * 0.1
         for k, v in ref_model.state_dict().items()})
    ref_model.eval()

    rng = np.random.RandomState(62)
    x = rng.rand(2, 1, 16, 16).astype(np.float32)
    labels = np.array([7.0, 42.0], np.float32)

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x),
                         torch.from_numpy(labels)).numpy()

    our_model = DDPM(config=cfg)
    x_ours = jnp.asarray(np.moveaxis(x, 1, -1))
    template = our_model.init(jax.random.PRNGKey(0), x_ours,
                              jnp.asarray(labels))["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_ddpm_state_dict(sd, template, cfg)
    got = our_model.apply({"params": params}, x_ours, jnp.asarray(labels))
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert np.abs(want).max() > 1e-4
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_ncsn_v1_output_parity(ref):
    """NCSN v1 - conditional RefineNet (ncsn/models/ncsn.py:9-100) - under
    imported reference weights (utils/torch_import.convert_cond_ncsn_state_
    dict): class-conditional InstanceNorm++ embeddings split from the
    torch Embedding triplets, conditional RCU/CRP/MSF grammar."""
    from tests.oracle_common import load_reference
    ref_v1 = load_reference("ncsn.models.ncsn")
    from inverseproblemwithdiffusionmodel_tpu.models.ncsn import NCSN
    from inverseproblemwithdiffusionmodel_tpu.utils.torch_import import (
        convert_cond_ncsn_state_dict)

    NS = types.SimpleNamespace
    cfg = NS(
        data=NS(channels=1, image_size=32, logit_transform=False,
                rescaled=False),
        model=NS(ngf=8, num_classes=16, nonlinearity="elu",
                 normalization="InstanceNorm++", spec_norm=False,
                 sigma_begin=10.0, sigma_end=0.01, sigma_dist="geometric"),
        device="cpu",
    )
    torch.manual_seed(6)
    ref_model = ref_v1.ncsn_models_ncsn.NCSN(cfg)
    ref_model.eval()

    rng = np.random.RandomState(63)
    x = rng.rand(2, 1, 32, 32).astype(np.float32)
    y = np.array([3, 11], np.int64)

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    our_model = NCSN(config=cfg)
    x_ours = jnp.asarray(np.moveaxis(x, 1, -1))
    template = our_model.init(jax.random.PRNGKey(0), x_ours,
                              jnp.asarray(y))["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_cond_ncsn_state_dict(sd, template)
    got = our_model.apply({"params": params}, x_ours, jnp.asarray(y))
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert np.abs(want).max() > 1e-3
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_ncsn_v1_deeper_output_parity(ref):
    """NCSNdeeper - the 5-stage v1 CondRefineNet (ncsn/models/ncsn.py:
    102-188) - under imported reference weights; pins the dilated res4/5
    stages and the 5-refine chain through the conditional grammar."""
    from tests.oracle_common import load_reference
    ref_v1 = load_reference("ncsn.models.ncsn")
    from inverseproblemwithdiffusionmodel_tpu.models.ncsn import NCSNdeeper
    from inverseproblemwithdiffusionmodel_tpu.utils.torch_import import (
        convert_cond_ncsn_state_dict)

    NS = types.SimpleNamespace
    cfg = NS(
        data=NS(channels=1, image_size=32, logit_transform=False,
                rescaled=False),
        model=NS(ngf=8, num_classes=16, nonlinearity="elu",
                 normalization="InstanceNorm++", spec_norm=False,
                 sigma_begin=10.0, sigma_end=0.01, sigma_dist="geometric"),
        device="cpu",
    )
    torch.manual_seed(8)
    ref_model = ref_v1.ncsn_models_ncsn.NCSNdeeper(cfg)
    ref_model.eval()

    rng = np.random.RandomState(64)
    x = rng.rand(2, 1, 32, 32).astype(np.float32)
    y = np.array([5, 14], np.int64)

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    our_model = NCSNdeeper(config=cfg)
    x_ours = jnp.asarray(np.moveaxis(x, 1, -1))
    template = our_model.init(jax.random.PRNGKey(0), x_ours,
                              jnp.asarray(y))["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_cond_ncsn_state_dict(sd, template)
    got = our_model.apply({"params": params}, x_ours, jnp.asarray(y))
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert np.abs(want).max() > 1e-3
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_continuous_ncsnv2_output_parity(ref, monkeypatch):
    """The continuous zoo's NCSNv2 (models/ncsnv2.py:44-133, registered
    ncsnv2_64): same attribute layout as the discrete net, plus a sigmas
    buffer indexed by integer labels and `data.centered` input semantics.
    Imported via the shared convert_ncsn_state_dict grammar; our module
    receives sigma VALUES (sigmas[y]).

    REFERENCE DEFECT (documented, not replicated): the continuous
    ResidualBlock builds its dilated convs via ncsn_conv3x3 with the
    default padding=1 instead of padding=dilation (models/layers.py:
    464-478 vs the discrete dilated_conv3x3, ncsn/models/layers.py:55-56),
    so the dilated res3/res4 stages shrink spatially and the residual add
    crashes for EVERY input. The forward is driven here under a shim that
    restores the intended padding=dilation (weight shapes are unchanged);
    our re-grown net uses the discrete stack's correct semantics."""
    import sys
    from tests.oracle_common import load_reference
    ref_cv2 = load_reference("models.ncsnv2")
    from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
    from inverseproblemwithdiffusionmodel_tpu.utils.torch_import import (
        convert_ncsn_state_dict)

    NS = types.SimpleNamespace
    cfg = NS(
        data=NS(channels=1, image_size=32, centered=False),
        model=NS(nf=8, ngf=8, nonlinearity="elu",
                 normalization="InstanceNorm++",
                 sigma_max=5.0, sigma_min=0.1, num_scales=12),
        device="cpu",
    )
    rng = np.random.RandomState(65)
    x = rng.rand(2, 1, 32, 32).astype(np.float32)
    y = np.array([2, 9], np.int64)

    # pin the defect: un-shimmed, the dilated stages crash on any input
    torch.manual_seed(9)
    broken = ref_cv2.models_ncsnv2.NCSNv2(cfg)
    broken.eval()
    with pytest.raises(RuntimeError), torch.no_grad():
        broken(torch.from_numpy(x), torch.from_numpy(y))

    ref_layers = sys.modules[ref_cv2.models_ncsnv2.ResidualBlock.__module__]
    real_conv = ref_layers.ncsn_conv3x3

    def fixed_conv(in_planes, out_planes, stride=1, bias=True, dilation=1,
                   init_scale=1., padding=1):
        return real_conv(in_planes, out_planes, stride=stride, bias=bias,
                         dilation=dilation, init_scale=init_scale,
                         padding=dilation if dilation > 1 else padding)

    monkeypatch.setattr(ref_layers, "ncsn_conv3x3", fixed_conv)
    torch.manual_seed(9)
    ref_model = ref_cv2.models_ncsnv2.NCSNv2(cfg)
    ref_model.eval()

    sigmas = np.exp(np.linspace(np.log(cfg.model.sigma_max),
                                np.log(cfg.model.sigma_min),
                                cfg.model.num_scales)).astype(np.float32)

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    our_model = NCSNv2(config=cfg)
    x_ours = jnp.asarray(np.moveaxis(x, 1, -1))
    used = jnp.asarray(sigmas[y])
    template = our_model.init(jax.random.PRNGKey(0), x_ours,
                              used)["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_ncsn_state_dict(sd, template)
    got = our_model.apply({"params": params}, x_ours, used)
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert np.abs(want).max() > 1e-3
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_continuous_ncsn_v1_reference_defect():
    """REFERENCE DEFECT (documented, not replicated): the continuous
    zoo's NCSN v1 (models/ncsnv2.py:135-220) cannot be constructed at all -
    models/layers.py ConditionalResidualBlock defaults dilation=None and
    its resample=None branch evaluates `dilation > 1` (models/layers.py:
    464), a None/int comparison; it is also handed the UNconditional
    InstanceNorm2dPlus (get_normalization default) whose forward takes one
    argument. Our registered `ncsn` (ve/ncsn configs) is re-grown from the
    discrete v1 and works."""
    from tests.oracle_common import load_reference
    ref_cv2 = load_reference("models.ncsnv2")

    NS = types.SimpleNamespace
    cfg = NS(
        data=NS(channels=1, image_size=32, centered=False),
        model=NS(nf=8, ngf=8, nonlinearity="elu",
                 normalization="InstanceNorm++", num_classes=6,
                 num_scales=6, sigma_max=5.0, sigma_min=0.1),
        device="cpu",
    )
    with pytest.raises(TypeError):
        ref_cv2.models_ncsnv2.NCSN(cfg)

    from inverseproblemwithdiffusionmodel_tpu.configs_continuous import (
        get_continuous_config)
    from inverseproblemwithdiffusionmodel_tpu.models.registry import (
        create_model)
    config = get_continuous_config("ve/ncsn/cifar10").replace(**{
        "model.nf": 8, "model.ngf": 8, "model.num_classes": 6,
        "model.num_scales": 6, "data.image_size": 16})
    module = create_model(config)
    x = jnp.zeros((2, 16, 16, 3))
    y = jnp.array([0, 5], jnp.int32)
    params = module.init(jax.random.PRNGKey(0), x, y)["params"]
    out = module.apply({"params": params}, x, y)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_import_cli_continuous_ddpm_roundtrip(ref, tmp_path):
    """The --continuous CLI path for a DDPM checkpoint: the converter
    dispatch (convert_continuous_state_dict) must route vp/ddpm configs to
    the DDPM all_modules map, not the NCSN++ one."""
    from tests.oracle_common import load_reference
    ref_ddpm = load_reference("models.ddpm")
    from inverseproblemwithdiffusionmodel_tpu.configs_continuous import (
        get_continuous_config)
    from inverseproblemwithdiffusionmodel_tpu.models.registry import (
        create_model)
    from inverseproblemwithdiffusionmodel_tpu.scripts import (
        import_torch_checkpoint)
    from inverseproblemwithdiffusionmodel_tpu.scripts._common import (
        apply_overrides)
    from inverseproblemwithdiffusionmodel_tpu.training import (
        Checkpointer, TrainState, get_optimizer)

    overrides = ["model.nf=32", "model.ch_mult=[1, 2]",
                 "model.num_res_blocks=2", "model.attn_resolutions=[8]",
                 "data.image_size=16"]
    config = apply_overrides(get_continuous_config("vp/ddpm/cifar10"),
                             overrides)

    torch.manual_seed(10)
    ref_model = ref_ddpm.models_ddpm.DDPM(config)
    gen = torch.Generator().manual_seed(11)
    ref_model.load_state_dict(
        {k: torch.randn(v.shape, generator=gen) * 0.1
         for k, v in ref_model.state_dict().items()})
    ref_model.eval()

    ckpt_path = tmp_path / "ddpm.pth"
    torch.save(ref_model.state_dict(), str(ckpt_path))

    out_dir = tmp_path / "orbax"
    import_torch_checkpoint.main([
        "--ckpt_path", str(ckpt_path),
        "--continuous", "vp/ddpm/cifar10",
        "--out_dir", str(out_dir),
        *[f"--override={o}" for o in overrides],
    ])

    module = create_model(config)
    S = config.data.image_size
    x = np.random.RandomState(66).rand(
        2, config.data.num_channels, S, S).astype(np.float32)
    labels = np.array([7.0, 42.0], np.float32)

    x_ours = jnp.asarray(np.moveaxis(x, 1, -1))
    template = jax.jit(module.init)(jax.random.PRNGKey(0), x_ours,
                                    jnp.asarray(labels))["params"]
    state = TrainState.create(template, get_optimizer(config),
                              ema_decay=0.999)
    ckpt = Checkpointer(str(out_dir), track_best=False)
    state = ckpt.restore(state)
    ckpt.close()

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x),
                         torch.from_numpy(labels)).numpy()
    got = np.moveaxis(np.asarray(module.apply(
        {"params": state.params}, x_ours, jnp.asarray(labels))), -1, 1)
    assert np.abs(want).max() > 1e-4
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)
