"""Continuous-time SDE stack: VE/VP/subVP SDEs, predictor–corrector and
probability-flow ODE samplers (reference: sde/sde_lib.py, sde/sampling.py)."""
from .sde_lib import (SDE, ReverseSDE, VPSDE, subVPSDE, VESDE,
                      get_ddpm_params)
from .sampling import (register_predictor, register_corrector, get_predictor,
                       get_corrector, get_score_fn, get_pc_sampler,
                       get_ode_sampler, get_sampling_fn, vanilla_pc_sampler,
                       EulerMaruyamaPredictor, ReverseDiffusionPredictor,
                       AncestralSamplingPredictor, NonePredictor,
                       LangevinCorrector, AnnealedLangevinDynamics,
                       NoneCorrector)

__all__ = [
    "SDE", "ReverseSDE", "VPSDE", "subVPSDE", "VESDE",
    "get_ddpm_params",
    "register_predictor", "register_corrector", "get_predictor",
    "get_corrector", "get_score_fn", "get_pc_sampler", "get_ode_sampler",
    "get_sampling_fn", "vanilla_pc_sampler",
    "EulerMaruyamaPredictor", "ReverseDiffusionPredictor",
    "AncestralSamplingPredictor", "NonePredictor", "LangevinCorrector",
    "AnnealedLangevinDynamics", "NoneCorrector",
]
