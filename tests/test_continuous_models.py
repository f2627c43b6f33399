"""NCSN++ / DDPM continuous model zoo + config tree."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.configs_continuous import (
    get_continuous_config, get_default_configs, make_sde)
from inverseproblemwithdiffusionmodel_tpu.models import NCSNpp, DDPM, ScoreNet
from inverseproblemwithdiffusionmodel_tpu.models.layerspp import (
    AttnBlockpp, Upsample, Downsample, ResnetBlockBigGANpp,
    get_timestep_embedding)
from inverseproblemwithdiffusionmodel_tpu.sde import VESDE, VPSDE, subVPSDE

SMALL = {"data.image_size": 16, "model.nf": 16, "model.num_res_blocks": 1,
         "model.ch_mult": (1, 2), "model.attn_resolutions": (8,)}


def build(name, **extra):
    cfg = get_continuous_config(name).replace(**SMALL, **extra)
    if cfg.model.name == "ddpm" and cfg.model.nf % 32:
        # the DDPM UNet pins GroupNorm to 32 groups at every width
        # (reference models/layers.py:563,626): widths must divide
        cfg = cfg.replace(**{"model.nf": 32})
    module = DDPM(config=cfg) if cfg.model.name == "ddpm" else NCSNpp(config=cfg)
    x = jnp.zeros((2, 16, 16, 3))
    cond = (jnp.array([10, 500]) if cfg.model.embedding_type == "positional"
            else jnp.array([5.0, 1.0]))
    params = module.init(jax.random.PRNGKey(0), x, cond)
    return cfg, module, params, x, cond


@pytest.mark.parametrize("name", [
    "ve/cifar10_ncsnpp_continuous",
    "vp/cifar10_ddpmpp_continuous",
    "subvp/cifar10_ncsnpp_continuous",
    "vp/ddpm/cifar10",
])
def test_forward_shapes(name):
    cfg, module, params, x, cond = build(name)
    out = module.apply(params, x, cond)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_scale_by_sigma_divides_output():
    """VE NCSN++ divides by sigma: halving time_cond sigma doubles output
    only through the division (check ratio with identical params/input)."""
    cfg, module, params, x, _ = build("ve/cifar10_ncsnpp_continuous")
    x = jax.random.uniform(jax.random.PRNGKey(1), x.shape)
    s1 = jnp.array([2.0, 2.0])
    s2 = jnp.array([4.0, 4.0])
    o1 = module.apply(params, x, s1)
    o2 = module.apply(params, x, s2)
    # raw net sees log-sigma only through the embedding; outputs differ, but
    # both must be finite and scaled - check the division is applied by
    # comparing against a no-scale config with the same params
    cfg_ns = cfg.replace(**{"model.scale_by_sigma": False})
    module_ns = NCSNpp(config=cfg_ns)
    raw1 = module_ns.apply(params, x, s1)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(raw1) / 2.0,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("progressive,progressive_input,combine", [
    ("output_skip", "input_skip", "cat"),
    ("residual", "residual", "sum"),
])
def test_progressive_variants(progressive, progressive_input, combine):
    cfg, module, params, x, cond = build(
        "ve/cifar10_ncsnpp_continuous",
        **{"model.progressive": progressive,
           "model.progressive_input": progressive_input,
           "model.progressive_combine": combine})
    out = module.apply(params, x, cond)
    assert out.shape == x.shape


def test_ddpm_resblock_type():
    cfg, module, params, x, cond = build(
        "ve/cifar10_ncsnpp_continuous", **{"model.resblock_type": "ddpm"})
    assert module.apply(params, x, cond).shape == x.shape


def test_gradients_flow():
    cfg, module, params, x, cond = build("ve/cifar10_ncsnpp_continuous")

    def loss(p):
        return jnp.sum(module.apply(p, x, cond) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # fourier projection W is frozen (stop_gradient)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in flat:
        if any(getattr(k, "key", "") == "fourier_proj" for k in path):
            assert float(jnp.abs(leaf).max()) == 0.0


def test_attn_block_permutation_equivariance():
    """Spatial softmax attention must commute with spatial transposition for
    a symmetric input layout."""
    attn = AttnBlockpp(skip_rescale=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    params = attn.init(jax.random.PRNGKey(1), x)
    out = attn.apply(params, x)
    out_t = attn.apply(params, x.transpose(0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 1, 3)),
                               np.asarray(out_t), rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("fir", [False, True])
@pytest.mark.parametrize("with_conv", [False, True])
def test_up_down_sample_shapes(fir, with_conv):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    up = Upsample(with_conv=with_conv, fir=fir)
    pu = up.init(jax.random.PRNGKey(1), x)
    assert up.apply(pu, x).shape == (2, 16, 16, 4)
    down = Downsample(with_conv=with_conv, fir=fir)
    pd = down.init(jax.random.PRNGKey(2), x)
    assert down.apply(pd, x).shape == (2, 4, 4, 4)


def test_biggan_block_up_down():
    act = jax.nn.swish
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    for kw, hw in [({"up": True}, 16), ({"down": True}, 4)]:
        blk = ResnetBlockBigGANpp(act=act, out_ch=6, fir=True, **kw)
        p = blk.init(jax.random.PRNGKey(1), x)
        assert blk.apply(p, x).shape == (2, hw, hw, 6)


def test_timestep_embedding_matches_transformer_formula():
    emb = get_timestep_embedding(jnp.array([0.0, 1.0, 10.0]), 8)
    assert emb.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-7)


def test_make_sde_dispatch():
    assert isinstance(
        make_sde(get_continuous_config("ve/cifar10_ncsnpp_continuous")), VESDE)
    assert isinstance(
        make_sde(get_continuous_config("vp/cifar10_ddpmpp_continuous")), VPSDE)
    assert isinstance(
        make_sde(get_continuous_config("subvp/cifar10_ncsnpp_continuous")),
        subVPSDE)


def test_deep_config():
    cfg = get_continuous_config("vp/cifar10_ddpmpp_deep_continuous")
    assert cfg.model.num_res_blocks == 8
    assert cfg.training.sde == "vpsde"


def test_score_net_simple():
    sde = VESDE(N=10, sigma_min=0.01, sigma_max=5.0)
    std_fn = lambda t: sde.marginal_prob(jnp.zeros((t.shape[0], 1)), t)[1]
    m = ScoreNet(marginal_prob_std=std_fn, channels=(4, 8, 16, 32),
                 embed_dim=16)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([0.3, 0.7])
    p = m.init(jax.random.PRNGKey(0), x, t)
    assert m.apply(p, x, t).shape == x.shape


def test_nested_discrete_config_trees():
    for name, model_name in [("ve/ncsnv2/cifar10", "ncsnv2_64"),
                             ("ve/ncsn/cifar10", "ncsn"),
                             ("vp/ddpm/cifar10", "ddpm")]:
        cfg = get_continuous_config(name)
        assert cfg.model.name == model_name
        assert cfg.training.continuous is False
    cfg = get_continuous_config("ve/ncsnv2/cifar10")
    assert cfg.sampling.corrector == "ald" and cfg.model.num_scales == 232
