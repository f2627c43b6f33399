"""Continuous SDE stack: marginals, discretizations, PC/ODE samplers against
analytic Gaussian scores."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from inverseproblemwithdiffusionmodel_tpu.sde import (
    VESDE, VPSDE, subVPSDE, get_pc_sampler, get_ode_sampler, get_score_fn,
    get_predictor, get_corrector)


MU, S = 1.5, 0.5  # analytic Gaussian data distribution N(MU, S^2)


def gaussian_score(sde):
    """Score of p_t when p_0 = N(MU, S^2) under the SDE's marginal."""
    def score(x, t):
        mean_coeff_ref = sde.marginal_prob(jnp.ones_like(x), t)
        mean, std = mean_coeff_ref
        # mean = a(t) * 1; marginal of x_t: N(a MU, a^2 S^2 + std^2)
        a = mean
        std_b = std.reshape(-1, *([1] * (x.ndim - 1)))
        var = (a * S) ** 2 + std_b ** 2
        return (a * MU - x) / var
    return score


@pytest.mark.parametrize("sde", [
    VESDE(N=200, sigma_min=0.01, sigma_max=10.0),
    VPSDE(N=200),
    subVPSDE(N=200),
])
def test_marginal_prob_prior_consistency(sde):
    """At t=T the marginal must match the prior sampling distribution."""
    x0 = jnp.zeros((4, 8))
    t = jnp.full((4,), sde.T)
    mean, std = sde.marginal_prob(x0, t)
    samples = sde.prior_sampling(jax.random.PRNGKey(0), (4000, 8))
    # prior std vs marginal std at T (x0=0 so mean is 0)
    np.testing.assert_allclose(float(samples.std()), float(std[0]), rtol=0.1)


@pytest.mark.parametrize("sde", [VESDE(N=100), VPSDE(N=100), subVPSDE(N=100)])
def test_prior_logp_matches_gaussian(sde):
    z = jax.random.normal(jax.random.PRNGKey(0), (3, 5)) * 2.0
    logp = sde.prior_logp(z)
    if isinstance(sde, VESDE):
        ref = stats.norm(0, sde.sigma_max).logpdf(np.asarray(z)).sum(-1)
    else:
        ref = stats.norm(0, 1).logpdf(np.asarray(z)).sum(-1)
    np.testing.assert_allclose(np.asarray(logp), ref, rtol=1e-4)


@pytest.mark.parametrize("predictor,corrector,n_steps", [
    ("reverse_diffusion", "langevin", 1),
    ("euler_maruyama", "none", 1),
    ("ancestral_sampling", "none", 1),
    ("none", "langevin", 10),  # corrector-only mixes slowly
])
def test_pc_sampler_recovers_gaussian_vesde(predictor, corrector, n_steps):
    sde = VESDE(N=300, sigma_min=0.01, sigma_max=8.0)
    shape = (2000, 2)
    sampler = get_pc_sampler(sde, shape, predictor=predictor,
                             corrector=corrector, snr=0.16, n_steps=n_steps,
                             denoise=True)
    x, nfe = jax.jit(lambda k: sampler(gaussian_score(sde), k))(
        jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x)).all()
    assert abs(float(x.mean()) - MU) < 0.1
    assert abs(float(x.std()) - S) < 0.12


def test_pc_sampler_recovers_gaussian_vpsde():
    sde = VPSDE(N=300)
    shape = (2000, 2)
    sampler = get_pc_sampler(sde, shape, predictor="reverse_diffusion",
                             corrector="langevin", denoise=True)
    x, _ = jax.jit(lambda k: sampler(gaussian_score(sde), k))(
        jax.random.PRNGKey(1))
    assert abs(float(x.mean()) - MU) < 0.1
    assert abs(float(x.std()) - S) < 0.12


def test_ode_sampler_recovers_gaussian():
    sde = VPSDE(N=100)
    shape = (1000, 2)
    sampler = get_ode_sampler(sde, shape, denoise=False)
    x, _ = sampler(gaussian_score(sde), jax.random.PRNGKey(2))
    # probability flow is deterministic given the prior draw
    assert abs(float(x.mean()) - MU) < 0.15
    assert abs(float(x.std()) - S) < 0.15


def test_get_score_fn_vp_conversion():
    """VP: score = -model_out / std(t) with labels t*999."""
    sde = VPSDE(N=1000)
    seen = {}

    def model_fn(x, labels):
        seen["labels"] = labels
        return jnp.ones_like(x)

    score_fn = get_score_fn(sde, model_fn, continuous=True)
    x = jnp.zeros((3, 4))
    t = jnp.full((3,), 0.5)
    out = score_fn(x, t)
    _, std = sde.marginal_prob(x, t)
    np.testing.assert_allclose(np.asarray(out), -1.0 / std[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(seen["labels"]), 999 * 0.5)


def test_get_score_fn_ve_passthrough_and_sigma_cond():
    sde = VESDE(N=100, sigma_min=0.01, sigma_max=50.0)
    seen = {}

    def model_fn(x, cond):
        seen["cond"] = cond
        return 2.0 * x

    score_fn = get_score_fn(sde, model_fn, continuous=True)
    x = jnp.ones((2, 3))
    t = jnp.full((2,), 0.25)
    out = score_fn(x, t)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    np.testing.assert_allclose(np.asarray(seen["cond"]),
                               0.01 * (50.0 / 0.01) ** 0.25, rtol=1e-5)


def test_registries():
    assert get_predictor("reverse_diffusion").__name__ == \
        "ReverseDiffusionPredictor"
    assert get_corrector("ald").__name__ == "AnnealedLangevinDynamics"
    with pytest.raises(KeyError):
        get_predictor("nope")


def test_vp_discrete_beta_schedule_single_source():
    """VPSDE/subVPSDE expose the DDPM ladder as properties (the single
    authoritative spelling), and the Langevin corrector uses the discrete
    alphas for BOTH VP and sub-VP (score_sde semantics; the reference's
    subVPSDE lacks .alphas and its correctors crash — defect not
    replicated)."""
    from inverseproblemwithdiffusionmodel_tpu.sde.sampling import (
        LangevinCorrector)
    vp = VPSDE(N=10)
    sub = subVPSDE(N=10)
    want = np.linspace(vp.beta_min / vp.N, vp.beta_max / vp.N, vp.N)
    np.testing.assert_allclose(np.asarray(vp.discrete_betas), want,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sub.discrete_betas), want,
                               rtol=1e-6)
    t = jnp.array([0.05, 0.5, 1.0])
    score = lambda x, tt: jnp.zeros_like(x)
    for sde in (vp, sub):
        corr = LangevinCorrector(sde=sde, score_fn=score)
        got = np.asarray(corr._alpha(t))
        timestep = (np.asarray(t) * (sde.N - 1) / sde.T).astype(int)
        np.testing.assert_allclose(got, 1.0 - want[timestep], rtol=1e-6)
