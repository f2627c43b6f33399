"""Precompiled 2D+time (cine) reconstruction engine.

Serving form of the flagship factorized sampler (`samplers/ald_pair.py`
`ald_2d_time_pair`; reference: ALD2DTime, ncsn/models/ALD_optimizers.py:
330-554): a spatial 2-D score prior over all frames + a temporal prior
(1-D diffusion on pixel tubes, or TV) + per-frame-mask SENSE data
consistency. Same serving rules as `engine.ReconstructionEngine`:
params / operators / measurement / weights are traced ARGUMENTS of one
compiled program; requests with new per-frame masks, coil maps, or
`lr_scaled`/`lamda_T` retunes never retrace. The chain ensemble is the
compiled batch; `PairL2Penalty.with_normal_kernel` dedups the per-frame
normal kernel to (T, W, W) regardless of the chain count.
"""
from __future__ import annotations

import dataclasses
import threading
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from .engine import (ReconResult, _make_arg_score_fn, _shard_axis,
                     _validate_mesh)
from ..parallel.mesh import replicate
from ..operators.pair import (PairL2Penalty, PairRandomUndersamplingFourier,
                              PairSENSE)
from ..samplers.ald import ALDConfig, setup_2d_time_ladders
from ..samplers.ald_pair import (_bake_ahy, _pair_2d_time_inner,
                                 ald_2d_time_pair)
from ..operators.finite_diff import FiniteDiff


@dataclasses.dataclass(frozen=True)
class CineEngineSpec:
    """Fixed compiled geometry of one 2D+time engine."""
    height: int
    width: int
    frames: int
    channels: int = 1
    num_sens: int = 4          # 0 => single-coil masked Fourier
    chains: int = 4            # ensemble rows per request
    n_steps_each: int = 3
    step_lr: float = 9e-7
    lr_scaled: float = 1.0
    mode_T: str = "diffusion1d"   # tv | diffusion1d | none | *-only
    lamda_T: float = 1.0
    win_size: int = 8
    if_random_shift: bool = False
    prox_iters: int = 4
    dtype: str = "bf16"
    mode: str = "scan"         # scan | steps


class CineReconstructionEngine:
    """Compile-once 2D+time reconstructor; same request interface as
    ReconstructionEngine (duck-typed for serving.server).

    module_T/params_T/sigmas_T are required only when mode_T uses the
    temporal diffusion prior. Aggregates in the result are over chains;
    per-request arrays are (T, H, W, C) volumes.
    """

    def __init__(self, module_S, params_S, sigmas_S, *, spec: CineEngineSpec,
                 module_T=None, params_T=None, sigmas_T=None,
                 mask: Optional[np.ndarray] = None,
                 sens_re: Optional[np.ndarray] = None,
                 sens_im: Optional[np.ndarray] = None,
                 mesh: Optional[Mesh] = None):
        _validate_mesh(mesh, spec.chains)
        self.mesh = mesh
        self.spec = spec
        if "diffusion1d" in spec.mode_T:
            if module_T is None or sigmas_T is None:
                raise ValueError(f"mode_T={spec.mode_T!r} needs a temporal "
                                 "score model (module_T/params_T/sigmas_T)")
        if sigmas_T is None:
            sigmas_T = np.array([1.0], np.float32)   # sentinel, unused
        self.module_S, self.params_S = module_S, params_S
        self.module_T, self.params_T = module_T, params_T
        self.sigmas_S = jnp.asarray(sigmas_S, jnp.float32)
        self.sigmas_T_raw = jnp.asarray(sigmas_T, jnp.float32)
        if mesh is not None:
            # weights/ladders replicated once; chains shard over `data`
            # (the B*T chain-by-frame axis splits on chain boundaries
            # because chains % n_data == 0 — _validate_mesh)
            (self.params_S, self.params_T, self.sigmas_S,
             self.sigmas_T_raw) = replicate(
                (self.params_S, self.params_T, self.sigmas_S,
                 self.sigmas_T_raw), mesh)
        # resolved (scan ladder, per-level sigma_T, per-level RAW label)
        self.scan_sigmas, self.sigmas_T_full, self.labels_T = \
            setup_2d_time_ladders(self.sigmas_S, self.sigmas_T_raw,
                                  spec.mode_T)
        self.L = int(self.scan_sigmas.shape[0])
        self.ald_config = ALDConfig(n_steps_each=spec.n_steps_each,
                                    step_lr=spec.step_lr)
        # score_S consumes the (possibly swapped) scan ladder; score_T the
        # RAW temporal ladder (samplers/ald_pair.py contract)
        self._score_S = _make_arg_score_fn(module_S, self.scan_sigmas,
                                           spec.dtype)
        self._score_T = (_make_arg_score_fn(module_T, self.sigmas_T_raw,
                                            spec.dtype)
                         if module_T is not None else None)
        self._finite_diff = FiniteDiff(dims=1)
        self._lock = threading.Lock()
        self._compile_s: Optional[float] = None
        self._requests = 0
        self._total_latency = 0.0

        self.default_lin_tfm = self._build_lin_tfm(mask, sens_re, sens_im)
        if mesh is not None:
            self.default_lin_tfm = replicate(self.default_lin_tfm, mesh)
        self._recon_scan = jax.jit(self._traced_chain)
        self._level_step = jax.jit(self._traced_level_step)
        self._prepare = jax.jit(self._traced_prepare)

    # ---------------------------------------------------------- operators

    def _build_lin_tfm(self, mask, sens_re, sens_im):
        """mask: per-frame (T, 1, W, 1) (or (1,1,W,1) shared) — tiled to the
        B*T chain-by-frame axis, the layout every 2D+time sampler uses."""
        s = self.spec
        if mask is None:
            mask = np.ones((s.frames, 1, s.width, 1), np.float32)
        mask = np.asarray(mask, np.float32).reshape(-1, 1, s.width, 1)
        if mask.shape[0] == 1:
            mask = np.tile(mask, (s.frames, 1, 1, 1))
        if mask.shape[0] != s.frames:
            raise ValueError(f"mask has {mask.shape[0]} frames, spec has "
                             f"{s.frames}")
        mask_bt = np.tile(mask, (s.chains, 1, 1, 1))     # (B*T, 1, W, 1)
        if s.num_sens == 0:
            if sens_re is not None or sens_im is not None:
                raise ValueError("coil maps given to a single-coil engine")
            return PairRandomUndersamplingFourier(mask=jnp.asarray(mask_bt))
        if sens_re is None:
            sens_re = np.ones((s.num_sens, s.height, s.width, s.channels),
                              np.float32) / np.sqrt(s.num_sens)
        sens_re = np.asarray(sens_re, np.float32).reshape(
            s.num_sens, s.height, s.width, s.channels)
        sens_im = (np.zeros_like(sens_re) if sens_im is None
                   else np.asarray(sens_im, np.float32).reshape(
                       sens_re.shape))
        return PairSENSE(mask=jnp.asarray(mask_bt),
                         sens_re=jnp.asarray(sens_re),
                         sens_im=jnp.asarray(sens_im))

    def _build_proximal(self, lin_tfm) -> PairL2Penalty:
        # with_normal_kernel dedups the tiled mask back to (T, W, W)
        return PairL2Penalty.with_normal_kernel(
            lin_tfm, num_iters=self.spec.prox_iters)

    # ---------------------------------------------------- traced programs

    def _broadcast_chains(self, yr, yi):
        """(coils?, T, H, W, C) single copy -> (coils?, B*T, H, W, C)."""
        s = self.spec
        ax = 1 if s.num_sens else 0
        T = s.frames

        def bc(y):
            y = jnp.expand_dims(y, ax)                    # (.., 1, T, ...)
            shape = y.shape[:ax] + (s.chains,) + y.shape[ax + 1:]
            y = jnp.broadcast_to(y, shape)
            y = y.reshape(y.shape[:ax] + (s.chains * T,) +
                          y.shape[ax + 2:])
            return _shard_axis(self.mesh, y, ax)
        return bc(yr), bc(yi)

    def _traced_chain(self, params_S, params_T, lin_tfm, proximal, yr, yi,
                      lr_scaled, lamda_T, key):
        s = self.spec
        yr, yi = self._broadcast_chains(yr, yi)
        score_S = self._score_S(params_S)
        score_T = (self._score_T(params_T) if self._score_T is not None
                   else None)
        return ald_2d_time_pair(
            score_S, score_T, self.sigmas_S, self.sigmas_T_raw, (yr, yi),
            lin_tfm, proximal, key, self.ald_config, lr_scaled=lr_scaled,
            mode_T=s.mode_T, lamda_T=lamda_T,
            if_random_shift=s.if_random_shift, win_size=s.win_size,
            num_frames=s.frames)

    def _traced_prepare(self, lin_tfm, yr, yi):
        s = self.spec
        yr, yi = self._broadcast_chains(yr, yi)
        xr, xi = lin_tfm.conj_op(yr, yi)                  # (B*T, H, W, C)
        xr = xr.reshape(s.chains, s.frames, s.height, s.width, s.channels)
        xi = xi.reshape(xr.shape)
        xr = _shard_axis(self.mesh, xr, 0)
        xi = _shard_axis(self.mesh, xi, 0)
        return yr, yi, xr, xi

    def _traced_level_step(self, params_S, params_T, prox, xr, xi, yr, yi,
                           c, label_T, sigma, sigma_T, lr_scaled, lamda_T,
                           key):
        s = self.spec
        score_S = self._score_S(params_S)
        score_T = (self._score_T(params_T) if self._score_T is not None
                   else None)
        inner_fn = _pair_2d_time_inner(
            score_S, score_T, prox, self._finite_diff, self.ald_config,
            s.mode_T, s.if_random_shift, s.win_size,
            self.scan_sigmas[-1], self.sigmas_T_full[-1])

        def inner(_, state):
            xr, xi, key = state
            return inner_fn(xr, xi, yr, yi, c, label_T, sigma, sigma_T,
                            lr_scaled, lamda_T, key)

        return jax.lax.fori_loop(0, s.n_steps_each, inner, (xr, xi, key))

    def _run(self, lin_tfm, proximal, yr, yi, lr_scaled, lamda_T, key):
        if self.mesh is not None:
            (lin_tfm, proximal, yr, yi, lr_scaled, lamda_T,
             key) = replicate(
                (lin_tfm, proximal, yr, yi, lr_scaled, lamda_T, key),
                self.mesh)
        if self.spec.mode == "scan":
            return self._recon_scan(self.params_S, self.params_T, lin_tfm,
                                    proximal, yr, yi, lr_scaled, lamda_T,
                                    key)
        yr, yi, xr, xi = self._prepare(lin_tfm, yr, yi)
        # prox runs on the flat (B*T) layout: bake A^H y in that shape
        prox = _bake_ahy(proximal,
                         xr.reshape((-1,) + xr.shape[2:]),
                         xi.reshape((-1,) + xi.shape[2:]))
        for c in range(self.L):
            xr, xi, key = self._level_step(
                self.params_S, self.params_T, prox, xr, xi, yr, yi,
                jnp.int32(c), self.labels_T[c], self.scan_sigmas[c],
                self.sigmas_T_full[c], lr_scaled, lamda_T, key)
        return xr, xi

    # ------------------------------------------------------------- public

    def _example_measurement(self):
        s = self.spec
        shape = (s.frames, s.height, s.width, s.channels)
        if s.num_sens:
            shape = (s.num_sens,) + shape
        return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)

    def warmup(self) -> float:
        t0 = time.perf_counter()
        yr, yi = self._example_measurement()
        prox = self._build_proximal(self.default_lin_tfm)
        with self._lock:
            xr, xi = self._run(self.default_lin_tfm, prox, yr, yi,
                               jnp.float32(self.spec.lr_scaled),
                               jnp.float32(self.spec.lamda_T),
                               jax.random.PRNGKey(0))
            float(jnp.sum(xr) + jnp.sum(xi))
        if self._compile_s is None:
            self._compile_s = time.perf_counter() - t0
        return self._compile_s

    def reconstruct(self, y_re, y_im, *, mask=None, sens_re=None,
                    sens_im=None, seed: int = 0,
                    lr_scaled: Optional[float] = None,
                    lamda_T: Optional[float] = None) -> ReconResult:
        """y_re/y_im: (num_sens, T, H, W[, C]) — or (T, H, W[, C]) for a
        single-coil engine. mask: per-frame (T, 1, W, 1) override."""
        s = self.spec
        yr = self._canon_measurement(y_re)
        yi = self._canon_measurement(y_im)
        if mask is None and sens_re is None and sens_im is None:
            lin_tfm = self.default_lin_tfm
        else:
            if mask is None:
                # default mask, un-tiled back to per-frame for the builder
                mask = np.asarray(self.default_lin_tfm.mask)[:s.frames]
            lin_tfm = self._build_lin_tfm(mask, sens_re, sens_im)
        proximal = self._build_proximal(lin_tfm)
        lr = jnp.float32(s.lr_scaled if lr_scaled is None else lr_scaled)
        lt = jnp.float32(s.lamda_T if lamda_T is None else lamda_T)
        key = jax.random.PRNGKey(seed)

        t0 = time.perf_counter()
        with self._lock:
            xr, xi = self._run(lin_tfm, proximal, yr, yi, lr, lt, key)
            xr = np.asarray(jax.device_get(xr))   # (B, T, H, W, C)
            xi = np.asarray(jax.device_get(xi))
        dt = time.perf_counter() - t0
        self._requests += 1
        self._total_latency += dt

        mag = np.sqrt(xr ** 2 + xi ** 2)
        steps = self.L * s.n_steps_each * s.chains
        return ReconResult(
            x_re=xr, x_im=xi,
            mean_re=xr.mean(axis=0), mean_im=xi.mean(axis=0),
            mean_mag=mag.mean(axis=0), std_mag=mag.std(axis=0),
            latency_s=dt,
            chain_steps_per_s=steps / max(dt, 1e-9))

    def _canon_measurement(self, y) -> jnp.ndarray:
        s = self.spec
        y = np.asarray(y, np.float32)
        if y.ndim == 3:                                   # (T, H, W)
            y = y[..., None]
        elif y.ndim == 4 and y.shape[-1] != s.channels:
            y = y[..., None]                              # (coils, T, H, W)
        want = (s.frames, s.height, s.width, s.channels)
        if s.num_sens:
            want = (s.num_sens,) + want
        if y.shape != want:
            raise ValueError(f"measurement shape {y.shape} != {want} "
                             f"(engine spec {s})")
        return jnp.asarray(y)

    def stats(self) -> Dict[str, Any]:
        caches = [f._cache_size() for f in (self._recon_scan,
                                            self._level_step, self._prepare)]
        return {
            "spec": dataclasses.asdict(self.spec),
            "requests": self._requests,
            "compile_s": self._compile_s,
            "mean_latency_s": (self._total_latency / self._requests
                               if self._requests else None),
            "jit_cache_size": caches,
            "mesh": (None if self.mesh is None
                     else dict(zip(self.mesh.axis_names,
                                   map(int, self.mesh.devices.shape)))),
        }
