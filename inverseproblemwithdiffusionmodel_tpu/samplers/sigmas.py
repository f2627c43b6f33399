"""Noise-level (sigma) ladders and guidance-weight ramps.

Reference semantics: ncsn/models/__init__.py:10-38 (`get_sigmas`) and
ncsn/models/ALD_optimizers.py:23-38 (`get_lh_weights`). Ladders are
descending: sigma_begin = sigma_max down to sigma_end = sigma_min.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sigma_ladder(sigma_begin: float, sigma_end: float, num_classes: int,
                 dist: str = "geometric") -> jnp.ndarray:
    """Build a descending sigma ladder. float32, shape (num_classes,)."""
    if dist == "geometric":
        sig = np.exp(np.linspace(np.log(sigma_begin), np.log(sigma_end), num_classes))
    elif dist == "uniform":
        sig = np.linspace(sigma_begin, sigma_end, num_classes)
    else:
        raise NotImplementedError(f"sigma distribution {dist!r} not supported")
    return jnp.asarray(sig, dtype=jnp.float32)


def get_sigmas(config, mode: str = "unconditioned") -> jnp.ndarray:
    """Ladder from a config: `model` section for training, `recons` override
    for reconstruction (reference: ncsn/models/__init__.py:10-38)."""
    assert mode in ("unconditioned", "recons")
    section = config.recons if mode == "recons" else config.model
    return sigma_ladder(section.sigma_begin, section.sigma_end,
                        section.num_classes, section.sigma_dist)


def get_lh_weights(sigmas: jnp.ndarray, start_time: float,
                   curve_type: str = "linear") -> jnp.ndarray:
    """Likelihood-guidance weight ramp: zero until `start_time` (as a fraction
    of the ladder), then linear 0 -> 1 (reference: ALD_optimizers.py:23-38)."""
    assert 0.0 <= start_time <= 1.0
    num = int(sigmas.shape[0])
    weights = np.zeros((num,), dtype=np.float32)
    if start_time == 1.0:
        return jnp.asarray(weights)
    start_idx = int(num * start_time)
    if curve_type == "linear":
        weights[start_idx:] = np.linspace(0.0, 1.0, num - start_idx)
    else:
        raise NotImplementedError(f"curve type {curve_type!r}")
    return jnp.asarray(weights)
