"""Epoch-end hooks for the fit loop.

Reference semantics: helpers/pl_callbacks.py — `ValVisualizationDiscrete`
(:153-178: end-of-epoch ALD sample grid to TensorBoard) and
`ValVisualization` (:124-150: continuous PC sample). Hooks run on the host
OUTSIDE the jitted training path and render to PNG files.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .state import TrainState
from ..samplers import ALDConfig, ald_unconditional_sampler


def make_ald_visualization_hook(module, sigmas: jnp.ndarray,
                                shape: Tuple[int, ...], out_dir: str,
                                every_n_epochs: int = 1,
                                n_steps_each: int = 3,
                                step_lr: float = 9e-7,
                                seed: int = 0):
    """End-of-epoch unconditional ALD sampling with the EMA weights
    (reference: pl_callbacks.py:153-178). Returns a fit() epoch_end_hook."""
    os.makedirs(out_dir, exist_ok=True)
    sigmas = jnp.asarray(sigmas)
    cfg = ALDConfig(n_steps_each=n_steps_each, step_lr=step_lr)

    @jax.jit
    def sample(params, key):
        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])
        return ald_unconditional_sampler(score_fn, sigmas, shape, key, cfg)

    def hook(state: TrainState, epoch: int) -> None:
        if (epoch + 1) % every_n_epochs:
            return
        key = jax.random.fold_in(jax.random.PRNGKey(seed), epoch)
        samples = np.asarray(jax.device_get(sample(state.eval_params, key)))
        from ..utils.visualizations import vis_images
        path = os.path.join(out_dir, f"samples_epoch{epoch:04d}.png")
        vis_images(*[samples[i] for i in range(min(len(samples), 8))],
                   save_path=path)

    return hook


def make_snapshot_hook(out_dir: str, prefix: str = "snap",
                       save_png: bool = True, temporal: bool = False):
    """Mid-chain sampler diagnostics (reference: ALD_optimizers.py:203-213
    snapshot saves, :556-581 `_screenshot` temporal profiles).

    Returns snapshot_fn(level, sigma, *parts) for the samplers'
    `snapshot_fn=` parameter (fires via jax.debug.callback every
    ALDConfig.snapshot_every levels): saves the magnitude as
    `{prefix}_level{c}.npy`, a PNG of the first sample, and — when
    `temporal` and the state is (B, T, H, W, C) — the temporal pixel
    profile figure.
    """
    os.makedirs(out_dir, exist_ok=True)

    def snapshot_fn(level, sigma, *parts):
        level = int(level)
        parts = [np.asarray(p) for p in parts]
        mag = (np.abs(parts[0]) if len(parts) == 1
               else np.sqrt(parts[0] ** 2 + parts[1] ** 2))
        np.save(os.path.join(out_dir, f"{prefix}_level{level:05d}.npy"), mag)
        with open(os.path.join(out_dir, f"{prefix}_log.txt"), "a") as f:
            f.write(f"level {level} sigma {float(sigma):.6g} "
                    f"|x| mean {mag.mean():.6g} max {mag.max():.6g}\n")
        if not save_png:
            return
        from ..utils.visualizations import vis_images
        img = mag[0]
        if img.ndim == 4:                       # (T, H, W, C) 2D+time state
            if temporal:
                from ..utils.visualizations import grid_of_temporal_samples
                grid_of_temporal_samples(
                    img, save_path=os.path.join(
                        out_dir, f"{prefix}_level{level:05d}_temporal.png"))
            img = img[0]                        # PNG shows frame 0
        vis_images(img, save_path=os.path.join(
            out_dir, f"{prefix}_level{level:05d}.png"))

    return snapshot_fn


def make_pc_visualization_hook(module, sde, shape, out_dir: str,
                               sampling_config=None, every_n_epochs: int = 1,
                               seed: int = 0):
    """Continuous-stack analog: end-of-epoch PC sampling
    (reference: pl_callbacks.py:124-150)."""
    import functools
    from ..sde import get_pc_sampler, get_score_fn
    os.makedirs(out_dir, exist_ok=True)
    kw = {}
    if sampling_config is not None:
        kw = dict(predictor=sampling_config.predictor,
                  corrector=sampling_config.corrector,
                  snr=sampling_config.snr,
                  n_steps=sampling_config.n_steps_each,
                  probability_flow=sampling_config.probability_flow,
                  denoise=sampling_config.noise_removal)
    sampler = get_pc_sampler(sde, shape, **kw)

    @jax.jit
    def sample(params, key):
        model_fn = lambda x, cond: module.apply({"params": params}, x, cond)
        score_fn = get_score_fn(sde, model_fn, continuous=True)
        x, _ = sampler(score_fn, key)
        return x

    def hook(state: TrainState, epoch: int) -> None:
        if (epoch + 1) % every_n_epochs:
            return
        key = jax.random.fold_in(jax.random.PRNGKey(seed), epoch)
        samples = np.asarray(jax.device_get(sample(state.eval_params, key)))
        from ..utils.visualizations import vis_images
        path = os.path.join(out_dir, f"pc_samples_epoch{epoch:04d}.png")
        vis_images(*[samples[i] for i in range(min(len(samples), 8))],
                   save_path=path)

    return hook
