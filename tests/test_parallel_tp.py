"""Tensor-parallel (model-axis) sharding: a DP x TP mesh train step must
reproduce the single-device step bit-for-bit (up to collective reduction
order). The reference has no tensor parallelism at all (SURVEY.md §2.7);
here it is one sharding rule (`parallel.tp_sharding`) + GSPMD.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.parallel import (
    make_mesh, shard_batch, shard_tp, replicate, tp_sharding, MODEL_AXIS)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import get_sigmas
from inverseproblemwithdiffusionmodel_tpu.training import (
    TrainState, get_optimizer, make_score_train_step)


def _config(ngf=16):
    return Config({
        "data": {"channels": 1, "image_size": 16,
                 "logit_transform": False, "rescaled": False},
        "model": {"ngf": ngf, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++", "sigma_begin": 10.0,
                  "sigma_end": 0.01, "num_classes": 8,
                  "sigma_dist": "geometric"},
        "training": {"anneal_power": 2.0},
        "optim": {"optimizer": "Adam", "lr": 1e-3, "beta1": 0.9,
                  "eps": 1e-8, "weight_decay": 0.0, "grad_clip": 1.0},
    })


def test_tp_sharding_rule():
    mesh = make_mesh(n_data=4, n_model=2)
    kernel = jnp.zeros((3, 3, 16, 16))
    bias = jnp.zeros((16,))
    small = jnp.zeros((2, 2))
    assert tp_sharding(mesh, kernel, min_size=256).spec[-1] == MODEL_AXIS
    assert tp_sharding(mesh, bias, min_size=256).spec == ()
    assert tp_sharding(mesh, small, min_size=256).spec == ()
    # odd channel count: not divisible by the model axis -> replicated
    odd = jnp.zeros((3, 3, 16, 15))
    assert tp_sharding(mesh, odd, min_size=1).spec == ()


def test_tp_train_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    config = _config()
    module = NCSNv2(config=config)
    sigmas = get_sigmas(config)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1))
    key = jax.random.PRNGKey(2)
    params = module.init(jax.random.PRNGKey(0), batch,
                         jnp.ones((8,)))["params"]

    state_a = TrainState.create(params, get_optimizer(config))
    step_plain = make_score_train_step(module, sigmas)
    state_a, loss_a = step_plain(state_a, batch, key)

    mesh = make_mesh(n_data=4, n_model=2)
    params_copy = jax.tree_util.tree_map(jnp.copy, params)
    state_b = TrainState.create(params_copy, get_optimizer(config))
    state_b = shard_tp(state_b, mesh, min_size=256)
    step_tp = make_score_train_step(module, sigmas, mesh=mesh, tp=True)
    state_b, loss_b = step_tp(state_b, shard_batch(batch, mesh),
                              replicate(key, mesh))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        # channel-split contractions change fp32 reduction order; Adam's
        # m/sqrt(v) amplifies that at near-zero params, so the bound is
        # absolute (update scale is lr=1e-3; observed max |diff| ~6e-6)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-3, atol=1e-5)
