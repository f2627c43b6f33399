"""Conditional normalization family + NCSN v1 smoke."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.models.normalization import (
    get_normalization, ConditionalInstanceNorm, ConditionalVarianceNorm,
    ConditionalNoneNorm, ConditionalInstanceNormPlus)


def cfg_for(name):
    return Config({"model": {"normalization": name}})


@pytest.mark.parametrize("name,cls", [
    ("InstanceNorm++", ConditionalInstanceNormPlus),
    ("InstanceNorm", ConditionalInstanceNorm),
    ("VarianceNorm", ConditionalVarianceNorm),
    ("NoneNorm", ConditionalNoneNorm),
])
def test_conditional_dispatch_and_forward(name, cls):
    assert get_normalization(cfg_for(name), conditional=True) is cls
    norm = cls(num_features=4, num_classes=6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    y = jnp.array([1, 5])
    params = norm.init(jax.random.PRNGKey(1), x, y)
    out = norm.apply(params, x, y)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # different class embeddings -> different outputs (init is random)
    out2 = norm.apply(params, x, jnp.array([2, 3]))
    if name != "NoneNorm" or True:
        assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_conditional_instance_norm_statistics():
    """Affine-free instance stats per class-embedding scaling."""
    norm = ConditionalInstanceNorm(num_features=3, num_classes=2, bias=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3)) * 5 + 2
    y = jnp.array([0])
    params = norm.init(jax.random.PRNGKey(1), x, y)
    gamma = params["params"]["gamma_embed"][0]
    out = norm.apply(params, x, y)
    # out = gamma * standardized(x): per-channel std == |gamma|
    stds = np.asarray(out).std(axis=(0, 1, 2))
    np.testing.assert_allclose(stds, np.abs(np.asarray(gamma)), rtol=1e-2)
