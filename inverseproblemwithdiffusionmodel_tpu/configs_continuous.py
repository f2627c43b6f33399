"""Continuous-stack config tree (VE/VP/subVP x NCSN++/DDPM++/DDPM).

Replaces the reference's ~38 ml_collections leaf files under
configs/{ve,vp,subvp}/ (e.g. configs/ve/cifar10_ncsnpp_continuous.py:21) and
the per-dataset defaults (configs/default_cifar10_configs.py:6,
default_celeba_configs.py, default_lsun_configs.py) with one programmatic
builder: `get_continuous_config("ve/cifar10_ncsnpp_continuous")` etc. Names
mirror the reference's paths so its users find the same configs.
"""
from __future__ import annotations

from typing import Optional

from .config import Config

_DATASET_DEFAULTS = {
    "cifar10": dict(dataset="CIFAR10", image_size=32, num_channels=3,
                    batch_size=128, random_flip=True),
    "celeba": dict(dataset="CELEBA", image_size=64, num_channels=3,
                   batch_size=128, random_flip=True),
    "celebahq": dict(dataset="CelebAHQ", image_size=256, num_channels=3,
                     batch_size=64, random_flip=True),
    "lsun": dict(dataset="LSUN", image_size=256, num_channels=3,
                 batch_size=64, random_flip=True),
}


def get_default_configs(dataset: str = "cifar10") -> Config:
    """Per-dataset base tree (reference: configs/default_cifar10_configs.py:6-72)."""
    ds = _DATASET_DEFAULTS[dataset]
    return Config({
        "training": {
            "batch_size": ds["batch_size"], "n_iters": 1300001,
            "snapshot_freq": 50000, "log_freq": 50, "eval_freq": 100,
            "snapshot_freq_for_preemption": 10000, "snapshot_sampling": True,
            "likelihood_weighting": False, "continuous": True,
            "reduce_mean": False, "sde": "vesde",
        },
        "sampling": {
            "n_steps_each": 1, "noise_removal": True,
            "probability_flow": False, "snr": 0.16, "method": "pc",
            "predictor": "reverse_diffusion", "corrector": "langevin",
        },
        "eval": {
            "begin_ckpt": 9, "end_ckpt": 26, "batch_size": 1024,
            "enable_sampling": False, "num_samples": 50000,
            "enable_loss": True, "enable_bpd": False, "bpd_dataset": "test",
        },
        "data": {
            "dataset": ds["dataset"], "image_size": ds["image_size"],
            "random_flip": ds["random_flip"], "centered": False,
            "uniform_dequantization": False,
            "num_channels": ds["num_channels"],
            "channels": ds["num_channels"],
        },
        "model": {
            "sigma_min": 0.01, "sigma_max": 50, "num_scales": 1000,
            "beta_min": 0.1, "beta_max": 20.0, "dropout": 0.1,
            "embedding_type": "fourier",
        },
        "optim": {
            "weight_decay": 0, "optimizer": "Adam", "lr": 2e-4,
            "beta1": 0.9, "eps": 1e-8, "warmup": 5000, "grad_clip": 1.0,
        },
        "seed": 42,
    })


_MODEL_PRESETS = {
    # reference: configs/ve/cifar10_ncsnpp_continuous.py:36-58
    "ncsnpp": dict(
        name="ncsnpp", scale_by_sigma=True, ema_rate=0.999,
        normalization="GroupNorm", nonlinearity="swish", nf=128,
        ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,),
        resamp_with_conv=True, conditional=True, fir=True,
        fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
        progressive="none", progressive_input="residual",
        progressive_combine="sum", attention_type="ddpm", init_scale=0.0,
        fourier_scale=16, conv_size=3),
    # reference: configs/vp/cifar10_ddpmpp_continuous.py
    "ddpmpp": dict(
        name="ncsnpp", scale_by_sigma=False, ema_rate=0.9999,
        normalization="GroupNorm", nonlinearity="swish", nf=128,
        ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,),
        resamp_with_conv=True, conditional=True, fir=False,
        fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
        progressive="none", progressive_input="none",
        progressive_combine="sum", attention_type="ddpm", init_scale=0.0,
        embedding_type="positional", fourier_scale=16, conv_size=3),
    # reference: configs/vp/ddpm/, models/ddpm.py
    "ddpm": dict(
        name="ddpm", scale_by_sigma=False, ema_rate=0.9999,
        normalization="GroupNorm", nonlinearity="swish", nf=128,
        ch_mult=(1, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,),
        resamp_with_conv=True, conditional=True,
        embedding_type="positional", init_scale=0.0),
}

_SDE_SETTINGS = {
    "ve": dict(sde="vesde", predictor="reverse_diffusion",
               corrector="langevin", centered=False, reduce_mean=False),
    "vp": dict(sde="vpsde", predictor="euler_maruyama", corrector="none",
               centered=True, reduce_mean=True),
    "subvp": dict(sde="subvpsde", predictor="euler_maruyama",
                  corrector="none", centered=True, reduce_mean=True),
}


def get_continuous_config(name: str) -> Config:
    """Build a leaf config from a reference-style path, e.g.
    've/cifar10_ncsnpp_continuous', 'vp/cifar10_ddpmpp_continuous',
    'subvp/cifar10_ddpmpp_deep_continuous', and the nested discrete trees
    've/ncsnv2/cifar10', 've/ncsn/cifar10', 'vp/ddpm/cifar10'
    (reference: configs/ve/ncsnv2/cifar10.py etc.).
    """
    parts_path = name.split("/")
    if len(parts_path) == 3:
        sde_name, model_key, dataset = parts_path
        cfg = get_default_configs(dataset)
        if model_key == "ncsnv2":
            # reference: configs/ve/ncsnv2/cifar10.py (discrete NCSNv2)
            return cfg.replace(**{
                "training.sde": "vesde", "training.continuous": False,
                "sampling.predictor": "none", "sampling.corrector": "ald",
                "sampling.n_steps_each": 5, "sampling.snr": 0.176,
                "model.name": "ncsnv2_64", "model.scale_by_sigma": True,
                "model.num_scales": 232, "model.ema_rate": 0.999,
                "model.normalization": "InstanceNorm++",
                "model.nonlinearity": "elu", "model.nf": 128,
                "model.ngf": 128, "model.interpolation": "bilinear",
                "optim.lr": 1e-4, "optim.grad_clip": 0.0})
        if model_key == "ncsn":
            # reference: configs/ve/ncsn/cifar10.py (NCSN v1)
            return cfg.replace(**{
                "training.sde": "vesde", "training.continuous": False,
                "sampling.predictor": "none", "sampling.corrector": "ald",
                "sampling.n_steps_each": 100, "sampling.snr": 0.316,
                "model.name": "ncsn", "model.scale_by_sigma": False,
                "model.sigma_max": 1.0, "model.num_scales": 10,
                "model.num_classes": 10, "model.ema_rate": 0.0,
                "model.normalization": "InstanceNorm++",
                "model.nonlinearity": "elu", "model.nf": 128,
                "model.ngf": 128,
                # reference: configs/ve/ncsn/cifar10.py:50,55 — lr 1e-3,
                # grad clipping disabled (-1)
                "optim.lr": 1e-3, "optim.grad_clip": -1.0})
        if model_key == "ddpm":
            # reference: configs/vp/ddpm/cifar10.py
            return cfg.replace(**{
                "training.sde": "vpsde", "training.continuous": False,
                "training.reduce_mean": True, "data.centered": True,
                "sampling.predictor": "ancestral_sampling",
                "sampling.corrector": "none",
                **{f"model.{k}": v for k, v in _MODEL_PRESETS["ddpm"].items()}})
        raise KeyError(f"unknown nested config tree {name!r}")

    sde_name, leaf = parts_path
    parts = leaf.split("_")
    dataset = parts[0]
    model_key = parts[1]
    deep = "deep" in parts
    continuous = "continuous" in parts

    cfg = get_default_configs(dataset)
    sde = _SDE_SETTINGS[sde_name]
    preset = dict(_MODEL_PRESETS[model_key])
    if deep:
        preset["num_res_blocks"] = 8

    updates = {"training.sde": sde["sde"],
               "training.continuous": continuous,
               "training.reduce_mean": sde["reduce_mean"],
               "sampling.predictor": sde["predictor"],
               "sampling.corrector": sde["corrector"],
               "data.centered": sde["centered"]}
    for k, v in preset.items():
        updates[f"model.{k}"] = v
    if sde_name == "ve" and model_key == "ncsnpp":
        updates["model.embedding_type"] = \
            "fourier" if continuous else "positional"
    return cfg.replace(**updates)


def make_sde(config):
    """SDE instance from a continuous config
    (reference: score_sde run-library dispatch on config.training.sde)."""
    from .sde import VESDE, VPSDE, subVPSDE
    name = config.training.sde.lower()
    m = config.model
    if name == "vesde":
        return VESDE(N=m.num_scales, sigma_min=m.sigma_min,
                     sigma_max=m.sigma_max)
    if name == "vpsde":
        return VPSDE(N=m.num_scales, beta_min=m.beta_min, beta_max=m.beta_max)
    if name == "subvpsde":
        return subVPSDE(N=m.num_scales, beta_min=m.beta_min,
                        beta_max=m.beta_max)
    raise ValueError(f"unknown SDE {config.training.sde!r}")
