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


def check_ladder_stability(sigmas, n_steps_each: int, step_lr: float,
                           margin: float = 1.0, warn: bool = True) -> float:
    """Annealed-Langevin tracking condition.

    At equilibrium the chain's variance tracks sigma_c^2; per level it must
    decay by 2*ln(sigma_0/sigma_L)/L while the Langevin relaxation rate is
    n_steps_each * 2 * step_lr / sigma_L^2. If relaxation < decay the state
    stays hot, drifts off-manifold, and the reconstruction diverges (every
    reference ladder satisfies this with >= 3x margin, e.g. acdc.yml
    2311 levels, mnist.yml step_lr 6.2e-6 x 5 steps).

    Returns the stability ratio (relaxation / decay); warns when it is
    below `margin`.
    """
    s = np.asarray(sigmas)
    L = s.shape[0]
    decay = 2.0 * np.log(s[0] / s[-1]) / max(L, 1)
    relax = n_steps_each * 2.0 * step_lr / float(s[-1]) ** 2
    ratio = float(relax / max(decay, 1e-30))
    if warn and ratio < margin:
        import warnings
        warnings.warn(
            f"ALD ladder under-relaxed: relaxation {relax:.4f}/level < "
            f"decay {decay:.4f}/level (ratio {ratio:.2f}). Increase levels, "
            f"n_steps_each, or step_lr, or the chain will not anneal down.")
    return ratio


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
