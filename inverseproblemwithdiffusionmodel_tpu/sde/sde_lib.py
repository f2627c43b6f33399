"""Continuous-time SDE library: VP / subVP / VE forward SDEs and their
reverse-time counterparts.

Reference semantics: sde/sde_lib.py (SDE :7-109, VPSDE :112-166,
subVPSDE :167-206, VESDE :207-254). TPU-first: SDEs are immutable
dataclasses of scalars with pure jnp methods — everything traces under jit
and vmaps over batches; the reverse SDE is a small wrapper object rather
than a dynamically-constructed subclass.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jnp.ndarray
ScoreFn = Callable[[Array, Array], Array]


def _expand(v: Array, like: Array) -> Array:
    return v.reshape(v.shape[0], *([1] * (like.ndim - 1)))


@dataclasses.dataclass(frozen=True)
class SDE:
    """Abstract forward SDE dx = f(x,t) dt + g(t) dw on t in [0, T]
    (reference: sde/sde_lib.py:7-69)."""
    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
        raise NotImplementedError

    def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Mean and std of p_t(x_t | x_0)."""
        raise NotImplementedError

    def prior_sampling(self, key: jax.Array, shape) -> Array:
        raise NotImplementedError

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError

    def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Euler–Maruyama one-step discretization x_{i+1} = x_i + f + G z
        (reference: sde_lib.py:52-69). Returns (f, G)."""
        dt = self.T / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * np.sqrt(dt)

    def reverse(self, score_fn: ScoreFn,
                probability_flow: bool = False) -> "ReverseSDE":
        return ReverseSDE(self, score_fn, probability_flow)


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Reverse-time SDE / probability-flow ODE of a forward SDE
    (reference: sde_lib.py:71-109)."""
    fwd: SDE
    score_fn: ScoreFn
    probability_flow: bool = False

    @property
    def N(self) -> int:
        return self.fwd.N

    @property
    def T(self) -> float:
        return self.fwd.T

    def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
        drift, diffusion = self.fwd.sde(x, t)
        score = self.score_fn(x, t)
        factor = 0.5 if self.probability_flow else 1.0
        drift = drift - _expand(diffusion ** 2, x) * score * factor
        diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
        return drift, diffusion

    def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
        f, G = self.fwd.discretize(x, t)
        score = self.score_fn(x, t)
        factor = 0.5 if self.probability_flow else 1.0
        rev_f = f - _expand(G ** 2, x) * score * factor
        rev_G = jnp.zeros_like(G) if self.probability_flow else G
        return rev_f, rev_G


def get_ddpm_params(beta_min: float = 0.1, beta_max: float = 20.0,
                    num_scales: int = 1000) -> dict:
    """Discrete DDPM schedule tensors (reference: models/utils.py:63-85):
    betas, alphas, cumulative products and the sqrt factors samplers use.
    The ladder length is pinned at 1000 regardless of num_scales, and the
    returned beta_min/beta_max are the start/end rates rescaled by the last
    timestep index, exactly as the reference computes them (:63-85)."""
    n = 1000
    beta_start = beta_min / num_scales
    beta_end = beta_max / num_scales
    betas = np.linspace(beta_start, beta_end, n, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return {
        "betas": jnp.asarray(betas, jnp.float32),
        "alphas": jnp.asarray(alphas, jnp.float32),
        "alphas_cumprod": jnp.asarray(alphas_cumprod, jnp.float32),
        "sqrt_alphas_cumprod": jnp.asarray(np.sqrt(alphas_cumprod),
                                           jnp.float32),
        "sqrt_1m_alphas_cumprod": jnp.asarray(
            np.sqrt(1.0 - alphas_cumprod), jnp.float32),
        "beta_min": beta_start * (n - 1), "beta_max": beta_end * (n - 1),
        "num_diffusion_timesteps": n,
    }


class _DiscreteBetaSchedule:
    """DDPM beta ladder shared by VP and sub-VP (reference:
    sde_lib.py:124-129 builds these in VPSDE.__init__; the reference's
    subVPSDE omits them, which crashes its Langevin correctors — a
    documented defect not replicated here). This is the single
    authoritative spelling consumed by `discretize`, the ancestral
    predictor, the Langevin correctors, and the discrete score
    conversion (constant-folded under jit)."""

    @property
    def discrete_betas(self) -> Array:
        return jnp.linspace(self.beta_min / self.N, self.beta_max / self.N,
                            self.N)

    @property
    def alphas(self) -> Array:
        return 1.0 - self.discrete_betas

    @property
    def alphas_cumprod(self) -> Array:
        return jnp.cumprod(self.alphas)


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE, _DiscreteBetaSchedule):
    """Variance-preserving (DDPM) SDE with linear beta schedule
    (reference: sde_lib.py:112-166)."""
    beta_min: float = 0.1
    beta_max: float = 20.0

    def _beta(self, t: Array) -> Array:
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self._beta(t)
        drift = -0.5 * _expand(beta_t, x) * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def _log_mean_coeff(self, t: Array) -> Array:
        return -0.25 * t ** 2 * (self.beta_max - self.beta_min) \
            - 0.5 * t * self.beta_min

    def marginal_prob(self, x, t):
        lmc = self._log_mean_coeff(t)
        mean = _expand(jnp.exp(lmc), x) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        shape = z.shape
        D = np.prod(shape[1:])
        return -D / 2.0 * np.log(2 * np.pi) \
            - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0

    # DDPM ancestral discretization (reference: sde_lib.py:156-165)
    def discretize(self, x, t):
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = self.discrete_betas[timestep]
        alpha = 1.0 - beta
        f = _expand(jnp.sqrt(alpha), x) * x - x
        G = jnp.sqrt(beta)
        return f, G


@dataclasses.dataclass(frozen=True)
class subVPSDE(SDE, _DiscreteBetaSchedule):
    """Sub-VP SDE for likelihood work (reference: sde_lib.py:167-206)."""
    beta_min: float = 0.1
    beta_max: float = 20.0

    def _beta(self, t: Array) -> Array:
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self._beta(t)
        drift = -0.5 * _expand(beta_t, x) * x
        integral = self.beta_min * t + 0.5 * t ** 2 * (self.beta_max - self.beta_min)
        discount = 1.0 - jnp.exp(-2.0 * integral)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        lmc = -0.25 * t ** 2 * (self.beta_max - self.beta_min) \
            - 0.5 * t * self.beta_min
        mean = _expand(jnp.exp(lmc), x) * x
        std = 1.0 - jnp.exp(2.0 * lmc)
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        shape = z.shape
        D = np.prod(shape[1:])
        return -D / 2.0 * np.log(2 * np.pi) \
            - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding (SMLD) SDE with geometric sigma(t)
    (reference: sde_lib.py:207-254)."""
    sigma_min: float = 0.01
    sigma_max: float = 50.0

    def _sigma(self, t: Array) -> Array:
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    @property
    def discrete_sigmas(self) -> Array:
        """Ascending ladder sigma_min -> sigma_max (reference: sde_lib.py:214)."""
        return jnp.exp(jnp.linspace(np.log(self.sigma_min),
                                    np.log(self.sigma_max), self.N))

    def sde(self, x, t):
        sigma = self._sigma(t)
        drift = jnp.zeros_like(x)
        diffusion = sigma * np.sqrt(
            2.0 * (np.log(self.sigma_max) - np.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        return x, self._sigma(t)

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape) * self.sigma_max

    def prior_logp(self, z):
        shape = z.shape
        D = np.prod(shape[1:])
        return -D / 2.0 * np.log(2 * np.pi * self.sigma_max ** 2) \
            - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) \
            / (2.0 * self.sigma_max ** 2)

    # SMLD ancestral discretization (reference: sde_lib.py:247-254)
    def discretize(self, x, t):
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigmas = self.discrete_sigmas
        sigma = sigmas[timestep]
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(sigma),
                             sigmas[jnp.maximum(timestep - 1, 0)])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma ** 2 - adjacent ** 2)
        return f, G
