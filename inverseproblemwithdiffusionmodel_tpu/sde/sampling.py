"""Predictor–corrector and ODE samplers for the continuous SDE stack.

Reference semantics: sde/sampling.py — predictor/corrector string registries
(:38-81), `get_sampling_fn` dispatch (:84-127), predictors (:181-256),
correctors (:258-357), `get_pc_sampler` (:360-416), scipy ODE sampler
(:419-490) — and the model→score conversion `get_score_fn`
(models/utils.py:129-178).

TPU-first: the (predictor, corrector) step over `linspace(T, eps, N)` is a
`lax.scan` — the whole sampling chain is one compiled program; the ODE
sampler uses `jax.experimental.ode.odeint` (adaptive Dormand–Prince on
device) instead of host scipy `solve_ivp`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .sde_lib import SDE, VESDE, VPSDE, subVPSDE, ReverseSDE, _expand

Array = jnp.ndarray
ScoreFn = Callable[[Array, Array], Array]

_PREDICTORS = {}
_CORRECTORS = {}


def register_predictor(cls=None, *, name=None):
    """String registry (reference: sde/sampling.py:38-54)."""
    def _register(cls):
        _PREDICTORS[name or cls.__name__] = cls
        return cls
    return _register(cls) if cls is not None else _register


def register_corrector(cls=None, *, name=None):
    def _register(cls):
        _CORRECTORS[name or cls.__name__] = cls
        return cls
    return _register(cls) if cls is not None else _register


def get_predictor(name: str):
    return _PREDICTORS[name]


def get_corrector(name: str):
    return _CORRECTORS[name]


# ---------------------------------------------------------------------------
# model output -> score conversion
# ---------------------------------------------------------------------------

def get_score_fn(sde: SDE, model_fn: Callable[[Array, Array], Array],
                 continuous: bool = True) -> ScoreFn:
    """Convert a raw network into a true score function
    (reference: models/utils.py:129-178).

    model_fn(x, cond) -> raw output, where cond is the time/label embedding
    input the network expects. VP/subVP: score = -output / std with the
    continuous (t*999) or discrete label convention; VE: the network output
    IS the score (trained on noise-scaled targets), with t mapped to the
    sigma value (continuous) or ladder index (discrete).
    """
    if isinstance(sde, (VPSDE, subVPSDE)):
        def score_fn(x, t):
            if continuous or isinstance(sde, subVPSDE):
                labels = t * 999
                _, std = sde.marginal_prob(jnp.zeros_like(x), t)
            else:
                labels = t * (sde.N - 1)
                std = jnp.sqrt(
                    1.0 - sde.alphas_cumprod[labels.astype(jnp.int32)])
            out = model_fn(x, labels)
            return -out / _expand(std, x)
        return score_fn
    if isinstance(sde, VESDE):
        def score_fn(x, t):
            if continuous:
                _, cond = sde.marginal_prob(jnp.zeros_like(x), t)
            else:
                # discrete: map t to the descending-ladder index
                cond = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.int32)
            return model_fn(x, cond)
        return score_fn
    raise NotImplementedError(f"SDE {type(sde).__name__} not supported")


# ---------------------------------------------------------------------------
# predictors (reference: sde/sampling.py:181-256)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Predictor:
    sde: SDE
    score_fn: ScoreFn
    probability_flow: bool = False

    @property
    def rsde(self) -> ReverseSDE:
        return self.sde.reverse(self.score_fn, self.probability_flow)

    def update_fn(self, key: jax.Array, x: Array, t: Array
                  ) -> Tuple[Array, Array]:
        """Returns (x, x_mean)."""
        raise NotImplementedError


@register_predictor(name="euler_maruyama")
@dataclasses.dataclass(frozen=True)
class EulerMaruyamaPredictor(Predictor):
    def update_fn(self, key, x, t):
        dt = -self.sde.T / self.sde.N
        z = jax.random.normal(key, x.shape)
        drift, diffusion = self.rsde.sde(x, t)
        x_mean = x + drift * dt
        x = x_mean + _expand(diffusion, x) * np.sqrt(-dt) * z
        return x, x_mean


@register_predictor(name="reverse_diffusion")
@dataclasses.dataclass(frozen=True)
class ReverseDiffusionPredictor(Predictor):
    def update_fn(self, key, x, t):
        f, G = self.rsde.discretize(x, t)
        z = jax.random.normal(key, x.shape)
        x_mean = x - f
        x = x_mean + _expand(G, x) * z
        return x, x_mean


@register_predictor(name="ancestral_sampling")
@dataclasses.dataclass(frozen=True)
class AncestralSamplingPredictor(Predictor):
    """SMLD/DDPM ancestral sampling (reference: sampling.py:208-246);
    only defined for VESDE / VPSDE without probability flow."""

    def update_fn(self, key, x, t):
        sde = self.sde
        z = jax.random.normal(key, x.shape)
        if isinstance(sde, VESDE):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            sigmas = sde.discrete_sigmas
            sigma = sigmas[timestep]
            adjacent = jnp.where(timestep == 0, jnp.zeros_like(sigma),
                                 sigmas[jnp.maximum(timestep - 1, 0)])
            score = self.score_fn(x, t)
            x_mean = x + _expand(sigma ** 2 - adjacent ** 2, x) * score
            std = jnp.sqrt(adjacent ** 2 * (sigma ** 2 - adjacent ** 2)
                           / jnp.maximum(sigma ** 2, 1e-20))
            return x_mean + _expand(std, x) * z, x_mean
        if isinstance(sde, VPSDE):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            beta = sde.discrete_betas[timestep]
            score = self.score_fn(x, t)
            x_mean = (x + _expand(beta, x) * score) \
                / _expand(jnp.sqrt(1.0 - beta), x)
            return x_mean + _expand(jnp.sqrt(beta), x) * z, x_mean
        raise NotImplementedError


@register_predictor(name="none")
@dataclasses.dataclass(frozen=True)
class NonePredictor(Predictor):
    def update_fn(self, key, x, t):
        return x, x


# ---------------------------------------------------------------------------
# correctors (reference: sde/sampling.py:258-357)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Corrector:
    sde: SDE
    score_fn: ScoreFn
    snr: float = 0.16
    n_steps: int = 1

    def _alpha(self, t: Array) -> Array:
        # VP AND sub-VP use the discrete alphas (score_sde semantics; the
        # reference's subVPSDE lacks .alphas so its correctors crash on
        # sub-VP — defect documented in PARITY.md, not replicated)
        if isinstance(self.sde, (VPSDE, subVPSDE)):
            timestep = (t * (self.sde.N - 1) / self.sde.T).astype(jnp.int32)
            return self.sde.alphas[timestep]
        return jnp.ones_like(t)

    def update_fn(self, key, x, t):
        raise NotImplementedError


@register_corrector(name="langevin")
@dataclasses.dataclass(frozen=True)
class LangevinCorrector(Corrector):
    """SNR-scaled Langevin MCMC (reference: sampling.py:258-287)."""

    def update_fn(self, key, x, t):
        alpha = self._alpha(t)

        def body(i, state):
            x, x_mean, key = state
            key, kn = jax.random.split(key)
            grad = self.score_fn(x, t)
            noise = jax.random.normal(kn, x.shape)
            grad_norm = jnp.linalg.norm(
                grad.reshape(grad.shape[0], -1), axis=-1).mean()
            noise_norm = jnp.linalg.norm(
                noise.reshape(noise.shape[0], -1), axis=-1).mean()
            step_size = (self.snr * noise_norm / jnp.maximum(grad_norm, 1e-20)
                         ) ** 2 * 2.0 * alpha
            x_mean = x + _expand(step_size, x) * grad
            x = x_mean + _expand(jnp.sqrt(step_size * 2.0), x) * noise
            return x, x_mean, key

        x, x_mean, key = lax.fori_loop(0, self.n_steps, body, (x, x, key))
        return x, x_mean


@register_corrector(name="ald")
@dataclasses.dataclass(frozen=True)
class AnnealedLangevinDynamics(Corrector):
    """NCSNv2-style annealed Langevin corrector (reference:
    sampling.py:290-324)."""

    def update_fn(self, key, x, t):
        alpha = self._alpha(t)
        _, std = self.sde.marginal_prob(x, t)

        def body(i, state):
            x, x_mean, key = state
            key, kn = jax.random.split(key)
            grad = self.score_fn(x, t)
            noise = jax.random.normal(kn, x.shape)
            step_size = (self.snr * std) ** 2 * 2.0 * alpha
            x_mean = x + _expand(step_size, x) * grad
            x = x_mean + _expand(jnp.sqrt(step_size * 2.0), x) * noise
            return x, x_mean, key

        x, x_mean, key = lax.fori_loop(0, self.n_steps, body, (x, x, key))
        return x, x_mean


@register_corrector(name="none")
@dataclasses.dataclass(frozen=True)
class NoneCorrector(Corrector):
    def update_fn(self, key, x, t):
        return x, x


# ---------------------------------------------------------------------------
# PC sampler (reference: sde/sampling.py:360-416)
# ---------------------------------------------------------------------------

def get_pc_sampler(
    sde: SDE,
    shape: Tuple[int, ...],
    predictor: str = "reverse_diffusion",
    corrector: str = "langevin",
    snr: float = 0.16,
    n_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-3,
    inverse_scaler: Callable[[Array], Array] = lambda x: x,
):
    """Build `sampler(score_fn, key, x_init=None) -> (x, nfe)`; the timestep
    loop is a lax.scan so the whole chain jit-compiles to one program."""

    def sampler(score_fn: ScoreFn, key: jax.Array,
                x_init: Optional[Array] = None):
        pred = get_predictor(predictor)(sde=sde, score_fn=score_fn,
                                        probability_flow=probability_flow)
        corr = get_corrector(corrector)(sde=sde, score_fn=score_fn,
                                        snr=snr, n_steps=n_steps)
        key, k_init = jax.random.split(key)
        x = sde.prior_sampling(k_init, shape) if x_init is None else x_init
        timesteps = jnp.linspace(sde.T, eps, sde.N)

        def step(carry, t):
            x, key = carry
            key, k_c, k_p = jax.random.split(key, 3)
            vec_t = jnp.full((shape[0],), t)
            x, x_mean = corr.update_fn(k_c, x, vec_t)
            x, x_mean = pred.update_fn(k_p, x, vec_t)
            return (x, key), x_mean

        (x, key), x_means = lax.scan(step, (x, key), timesteps)
        out = x_means[-1] if denoise else x
        nfe = sde.N * (n_steps + 1)
        return inverse_scaler(out), nfe

    return sampler


def vanilla_pc_sampler(score_fn: ScoreFn, sde: SDE, shape, key,
                       **kwargs):
    """Convenience one-call PC sampling (reference: sampling.py:493-530)."""
    sampler = get_pc_sampler(sde, shape, **kwargs)
    return sampler(score_fn, key)


# ---------------------------------------------------------------------------
# ODE sampler (reference: sde/sampling.py:419-490)
# ---------------------------------------------------------------------------

def get_ode_sampler(
    sde: SDE,
    shape: Tuple[int, ...],
    denoise: bool = False,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    eps: float = 1e-3,
    inverse_scaler: Callable[[Array], Array] = lambda x: x,
):
    """Probability-flow ODE sampler on-device via odeint (replaces the
    reference's host scipy solve_ivp RK45)."""
    from jax.experimental.ode import odeint

    def denoise_update(score_fn, key, x):
        pred = ReverseDiffusionPredictor(sde=sde, score_fn=score_fn,
                                         probability_flow=False)
        vec_eps = jnp.full((x.shape[0],), eps)
        _, x_mean = pred.update_fn(key, x, vec_eps)
        return x_mean

    def sampler(score_fn: ScoreFn, key: jax.Array,
                x_init: Optional[Array] = None):
        key, k_init = jax.random.split(key)
        x = sde.prior_sampling(k_init, shape) if x_init is None else x_init
        rsde = sde.reverse(score_fn, probability_flow=True)

        def ode_func(x, s):
            # integrate in s from 0 -> T - eps along decreasing t = T - s
            t = sde.T - s
            vec_t = jnp.full((shape[0],), t)
            drift, _ = rsde.sde(x, vec_t)
            return -drift

        ts = jnp.asarray([0.0, sde.T - eps])
        xs = odeint(ode_func, x, ts, rtol=rtol, atol=atol)
        x = xs[-1]
        if denoise:
            x = denoise_update(score_fn, key, x)
        return inverse_scaler(x), sde.N
    return sampler


# ---------------------------------------------------------------------------
# config dispatch (reference: sde/sampling.py:84-127)
# ---------------------------------------------------------------------------

def get_sampling_fn(config, sde: SDE, shape, eps: float = 1e-3,
                    inverse_scaler=lambda x: x):
    method = config.sampling.method.lower()
    if method == "ode":
        return get_ode_sampler(sde, shape, denoise=config.sampling.noise_removal,
                               eps=eps, inverse_scaler=inverse_scaler)
    if method == "pc":
        return get_pc_sampler(
            sde, shape,
            predictor=config.sampling.predictor.lower(),
            corrector=config.sampling.corrector.lower(),
            snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each,
            probability_flow=config.sampling.probability_flow,
            denoise=config.sampling.noise_removal,
            eps=eps, inverse_scaler=inverse_scaler)
    raise ValueError(f"unknown sampling method {config.sampling.method!r}")
