"""int8 conv serving path (ops/quant.py + models.layers.Conv dispatch).

The reference has no quantized path; this is the TPU-native serving
addition (s8 x s8 -> s32 MXU convs run at 2x the bf16 rate on v5e). These
tests pin (a) quantizer correctness, (b) the Conv dispatch being a no-op
when the context is off, (c) end-to-end score-net accuracy of the int8
forward vs f32 on real NCSNv2 weights, (d) the make_score_fn("int8")
contract used by the samplers/bench.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverseproblemwithdiffusionmodel_tpu.ops import quant
from inverseproblemwithdiffusionmodel_tpu.models.layers import Conv
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.models.registry import make_score_fn
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import get_sigmas
from inverseproblemwithdiffusionmodel_tpu.config import Config


def _tiny_config(size=16, ngf=16):
    return Config({
        "data": {"channels": 1, "image_size": size, "logit_transform": False,
                 "rescaled": False},
        "model": {"ngf": ngf, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++", "sigma_begin": 10.0,
                  "sigma_end": 0.01, "num_classes": 8,
                  "sigma_dist": "geometric"},
    })


def test_quantize_per_tensor_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3)) * 5.0
    q, s = quant.quantize_per_tensor(x)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # symmetric int8: max abs error is half a quantization step
    step = float(jnp.max(jnp.abs(x))) / 127.0
    assert float(jnp.max(jnp.abs(deq - x))) <= 0.5 * step + 1e-6


def test_quantize_per_channel_scales_per_output():
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8))
    # blow up one output channel; its scale must absorb it alone
    k = k.at[..., 3].mul(100.0)
    q, s = quant.quantize_per_channel(k)
    assert q.shape == k.shape and s.shape == (8,)
    deq = q.astype(jnp.float32) * s
    rel = np.abs(np.asarray(deq - k)).max(axis=(0, 1, 2)) / \
        np.abs(np.asarray(k)).max(axis=(0, 1, 2))
    # every channel quantized to its own range: uniform small relative error
    assert rel.max() < 1.0 / 127


def test_conv_dispatch_off_is_exact():
    """Without the context, Conv must lower to the plain float conv."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    conv = Conv(features=8, kernel_size=3, ndim=2, dilation=2)
    params = conv.init(jax.random.PRNGKey(3), x)
    ref = conv.apply(params, x)
    again = conv.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(again))
    assert quant.conv_quant_mode() is None


def test_conv_int8_matches_float_closely():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 16))
    conv = Conv(features=16, kernel_size=3, ndim=2)
    params = conv.init(jax.random.PRNGKey(5), x)
    ref = np.asarray(conv.apply(params, x))
    with quant.quantized_convs("int8"):
        q = np.asarray(conv.apply(params, x))
    rel = np.linalg.norm(q - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_score_fn_accuracy_and_dtype():
    """Full NCSNv2 forward: int8 path stays close to the f32 forward and
    returns f32 (the sampler contract)."""
    config = _tiny_config()
    module = NCSNv2(config=config)
    sigmas = get_sigmas(config)
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 16, 1))
    labels = jnp.array([0, 4], jnp.int32)
    params = module.init(jax.random.PRNGKey(7), x, sigmas[labels])["params"]

    f32 = np.asarray(make_score_fn(module, params, sigmas)(x, labels))
    int8_fn = make_score_fn(module, params, sigmas, compute_dtype="int8")
    q = jax.jit(int8_fn)(x, labels)
    assert q.dtype == jnp.float32
    q = np.asarray(q)
    rel = np.linalg.norm(q - f32) / np.linalg.norm(f32)
    # int8 convs + bf16 glue across a deep net: few-percent relative error
    assert rel < 0.15, rel
    # and it must be a genuinely different lowering than plain bf16
    bf16 = np.asarray(
        make_score_fn(module, params, sigmas,
                      compute_dtype=jnp.bfloat16)(x, labels))
    assert not np.array_equal(q, bf16)


def test_int8_context_restores_on_error():
    with pytest.raises(ValueError):
        with quant.quantized_convs("int4"):
            pass
    try:
        with quant.quantized_convs("int8"):
            assert quant.conv_quant_mode() == "int8"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert quant.conv_quant_mode() is None
