"""Precompiled ALD reconstruction engine for production serving.

Design rules (all load-bearing on TPU — see ARCHITECTURE.md):

- ONE compiled program per engine. Params, the forward operator, the
  proximal, the data-consistency weight, and the measurement are all traced
  ARGUMENTS of the jitted chain, so per-request variation (a new scan's
  k-space, a new undersampling mask, fresh coil-map calibration, an
  `lr_scaled` retune) never retraces — the executable is reused for the
  lifetime of the engine. `stats()["jit_cache_size"]` makes that auditable.
- The chain ensemble IS the batch: production reconstructions are the mean
  over independent chains (reference README's "mean of 105", SURVEY.md
  §2.7), so the engine compiles a fixed `chains`-row batch and every
  request's measurement is tiled across it.
- bf16 (default on TPU) / int8 forwards via the same dtype strategy as
  `models.registry.make_score_fn`; the Langevin state and proximal solve
  stay f32.
- Two formulations, numerically identical: `mode="scan"` (whole chain as
  one XLA program — deployment) and `mode="steps"` (host loop over one
  jitted sigma-level step — for backends whose compile service rejects
  very large programs; see CLAUDE.md).

The reference counterpart of the math is the headline recon loop
`ALDInvSegProximalRealImag` (ncsn/models/ALD_optimizers.py:161-327) through
the pair/matmul-DFT fast path (`samplers/ald_pair.py`) — including its
segmentation guidance when the engine is built with a seg model (the seg
weights join the program; per-request LABEL maps and `seg_lamda` retunes
are traced arguments, so they never retrace either).
"""
from __future__ import annotations

import dataclasses
import threading
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, replicate
from ..samplers.ald import (ALDConfig, _labels, _langevin_update,
                            compute_seg_grad)
from ..samplers.ald_pair import _bake_ahy, ald_inverse_proximal_pair
from ..samplers.sigmas import get_lh_weights
from ..operators.pair import (PairL2Penalty, PairRandomUndersamplingFourier,
                              PairSENSE)
from ..utils.misc import stack_parts, unstack_parts


@dataclasses.dataclass(frozen=True)
class EngineSpec:
    """Fixed compiled geometry of one engine (one XLA executable)."""
    height: int
    width: int
    channels: int = 1
    num_sens: int = 4          # 0 => single-coil masked Fourier
    chains: int = 16           # ensemble rows per request (compiled batch)
    levels: int = 2311         # sigma-ladder length
    n_steps_each: int = 3
    step_lr: float = 9e-7
    lr_scaled: float = 5.0     # default data-consistency weight
    denoise: bool = True
    prox_iters: int = 4
    dtype: str = "bf16"        # f32 | bf16 | int8
    mode: str = "scan"         # scan | steps
    # segmentation guidance (active iff the engine was built with a seg
    # model; reference ramp semantics — ncsn/models/ALD_optimizers.py:23,
    # ncsn/models/__init__.py:197-215)
    seg_lamda: float = 1.0     # default guidance weight (0 disables)
    seg_start_time: float = 0.0   # ramp start (1.0 = ramp never activates)
    seg_step_type: str = "linear"
    seg_mode: str = "full"     # full | FG

    def chain_steps(self) -> int:
        return self.levels * self.n_steps_each


@dataclasses.dataclass
class ReconResult:
    """One request's output. Aggregates are over the chain ensemble;
    magnitudes follow utils.visualizations (|x| per chain, then mean/std)."""
    x_re: np.ndarray           # (chains, H, W, C) per-chain reconstructions
    x_im: np.ndarray
    mean_re: np.ndarray        # (H, W, C)
    mean_im: np.ndarray
    mean_mag: np.ndarray
    std_mag: np.ndarray
    latency_s: float
    chain_steps_per_s: float

    def to_npz_dict(self) -> Dict[str, np.ndarray]:
        return {"mean_re": self.mean_re, "mean_im": self.mean_im,
                "mean_mag": self.mean_mag, "std_mag": self.std_mag,
                "x_re": self.x_re, "x_im": self.x_im}


def _make_arg_score_fn(module, sigmas: jnp.ndarray, dtype: str):
    """score_fn factory taking params as a (traced) argument — unlike
    models.registry.make_score_fn, which closes over them. Same dtype
    semantics: bf16/int8 cast at the net boundary, f32 out."""
    if dtype == "f32":
        def make(params):
            def score_fn(x, labels):
                return module.apply({"params": params}, x, sigmas[labels])
            return score_fn
        return make

    if dtype not in ("bf16", "int8"):
        raise ValueError(f"unknown dtype {dtype!r} (f32|bf16|int8)")

    def make(params):
        def fwd(x, labels):
            pbf = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), params)
            out = module.apply({"params": pbf}, x.astype(jnp.bfloat16),
                               sigmas[labels].astype(jnp.bfloat16))
            return out.astype(jnp.float32)

        if dtype == "int8":
            from ..ops.quant import quantized_convs

            def score_fn(x, labels):
                # flips conv lowering at trace time (ops/quant.py)
                with quantized_convs("int8"):
                    return fwd(x, labels)
            return score_fn
        return fwd
    return make


def _validate_mesh(mesh: Optional[Mesh], chains: int) -> None:
    """A serving mesh shards the chain ensemble over its `data` axis, so
    the compiled batch must divide evenly (every device runs chains/n_data
    full chains; no padding rows in a long-lived compiled program)."""
    if mesh is None:
        return
    if DATA_AXIS not in mesh.axis_names:
        raise ValueError(f"serving mesh needs a {DATA_AXIS!r} axis, got "
                         f"{mesh.axis_names}")
    n_data = mesh.shape[DATA_AXIS]
    if chains % n_data:
        raise ValueError(f"spec.chains={chains} must be a multiple of the "
                         f"mesh data axis ({n_data} devices)")


def _shard_axis(mesh: Optional[Mesh], x: jnp.ndarray, axis: int
                ) -> jnp.ndarray:
    """Constrain `axis` of a traced array to shard over the mesh `data`
    axis (identity without a mesh). GSPMD propagates the sharding through
    the whole chain from these few anchors."""
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[axis] = DATA_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


class ReconstructionEngine:
    """Compile-once, serve-many ALD inverse-problem reconstructor.

    >>> eng = ReconstructionEngine(module, params, sigmas, spec=EngineSpec(...))
    >>> eng.warmup()                       # compile (or: lazy on first call)
    >>> res = eng.reconstruct(y_re, y_im)  # same executable every request
    >>> res = eng.reconstruct(y2_re, y2_im, mask=new_mask, sens_re=..., ...)

    The engine owns a default operator (mask + coil maps); requests may
    override any of them per call as long as shapes match the spec. All
    device work is serialized behind a lock (one engine == one chip's
    compiled program).
    """

    def __init__(self, module, params, sigmas, *, spec: EngineSpec,
                 mask: Optional[np.ndarray] = None,
                 sens_re: Optional[np.ndarray] = None,
                 sens_im: Optional[np.ndarray] = None,
                 seg_module=None, seg_params=None,
                 seg_label: Optional[np.ndarray] = None,
                 mesh: Optional[Mesh] = None):
        if spec.levels != int(np.shape(sigmas)[0]):
            raise ValueError(f"spec.levels={spec.levels} != "
                             f"len(sigmas)={np.shape(sigmas)[0]}")
        _validate_mesh(mesh, spec.chains)
        self.mesh = mesh
        self.spec = spec
        self.module = module
        self.params = params
        self.sigmas = jnp.asarray(sigmas, jnp.float32)
        if mesh is not None:
            # one weight replica per device up front; per-request arrays
            # are placed in _run. Chains shard over the mesh `data` axis —
            # they are independent Langevin rows (SURVEY.md §2.7), so the
            # compiled program partitions with no collectives except the
            # CG proximal's scalar dot products.
            self.params = replicate(self.params, mesh)
            self.sigmas = replicate(self.sigmas, mesh)
        self.ald_config = ALDConfig(n_steps_each=spec.n_steps_each,
                                    step_lr=spec.step_lr,
                                    denoise=spec.denoise)
        self._score_factory = _make_arg_score_fn(module, self.sigmas,
                                                 spec.dtype)
        # segmentation guidance: the seg net + its weights are fixed at
        # construction (part of the compiled program's structure); the
        # LABEL map and lamda vary per request as traced arguments
        self.seg_module, self.seg_params = seg_module, seg_params
        if mesh is not None and seg_params is not None:
            self.seg_params = replicate(self.seg_params, mesh)
        self._has_seg = seg_module is not None
        if self._has_seg:
            self._lh_weights = get_lh_weights(
                self.sigmas, spec.seg_start_time, spec.seg_step_type)
        self.default_seg_label = (None if seg_label is None
                                  else self._canon_seg_label(seg_label))
        self._lock = threading.Lock()
        self._compile_s: Optional[float] = None
        self._requests = 0
        self._total_latency = 0.0

        self.default_lin_tfm = self._build_lin_tfm(mask, sens_re, sens_im)
        if mesh is not None:
            self.default_lin_tfm = replicate(self.default_lin_tfm, mesh)
        self._recon_scan = jax.jit(self._traced_chain)
        self._level_step = jax.jit(self._traced_level_step)
        self._denoise = jax.jit(self._traced_denoise)
        self._prepare = jax.jit(self._traced_prepare)

    # ---------------------------------------------------------- operators

    def _build_lin_tfm(self, mask, sens_re, sens_im):
        s = self.spec
        if mask is None:
            mask = np.ones((1, 1, s.width, 1), np.float32)
        mask = np.asarray(mask, np.float32).reshape(-1, 1, s.width, 1)
        if s.num_sens == 0:
            if sens_re is not None or sens_im is not None:
                raise ValueError("coil maps given to a single-coil engine")
            return PairRandomUndersamplingFourier(mask=jnp.asarray(mask))
        if sens_re is None:
            sens_re = np.ones((s.num_sens, s.height, s.width, s.channels),
                              np.float32) / np.sqrt(s.num_sens)
        sens_re = np.asarray(sens_re, np.float32).reshape(
            s.num_sens, s.height, s.width, s.channels)
        if sens_im is None:
            sens_im = np.zeros_like(sens_re)
        sens_im = np.asarray(sens_im, np.float32).reshape(sens_re.shape)
        return PairSENSE(mask=jnp.asarray(mask),
                         sens_re=jnp.asarray(sens_re),
                         sens_im=jnp.asarray(sens_im))

    def _build_proximal(self, lin_tfm) -> PairL2Penalty:
        # per-request host cost is one W x W einsum (line_mask_normal_kernel);
        # the kernel enters the compiled program as an argument
        return PairL2Penalty.with_normal_kernel(
            lin_tfm, num_iters=self.spec.prox_iters)

    # ---------------------------------------------------- traced programs

    def _broadcast_chains(self, yr, yi):
        """Tile the single-copy measurement over the chain axis ON DEVICE —
        the wire/host copy stays 1x (a 16-chain 256^2 4-coil request ships
        2 MB instead of 33 MB)."""
        s = self.spec
        ax = 1 if s.num_sens else 0
        shape = yr.shape[:ax] + (s.chains,) + yr.shape[ax + 1:]
        return (_shard_axis(self.mesh, jnp.broadcast_to(yr, shape), ax),
                _shard_axis(self.mesh, jnp.broadcast_to(yi, shape), ax))

    def _seg_fn(self, seg_params):
        return lambda x: self.seg_module.apply({"params": seg_params}, x)

    def _broadcast_seg_label(self, seg_label):
        """(H, W) request label -> (chains, H, W) on device."""
        return _shard_axis(
            self.mesh,
            jnp.broadcast_to(seg_label[None],
                             (self.spec.chains,) + seg_label.shape), 0)

    def _traced_chain(self, params, seg_params, seg_label, lin_tfm,
                      proximal, yr, yi, lr_scaled, seg_lamda, key):
        score_fn = self._score_factory(params)
        yr, yi = self._broadcast_chains(yr, yi)
        seg_kwargs = {}
        if self._has_seg:
            s = self.spec
            seg_kwargs = dict(seg_fn=self._seg_fn(seg_params),
                              seg_label=self._broadcast_seg_label(seg_label),
                              seg_lamda=seg_lamda,
                              seg_start_time=s.seg_start_time,
                              seg_step_type=s.seg_step_type,
                              seg_mode=s.seg_mode)
        return ald_inverse_proximal_pair(
            score_fn, self.sigmas, (yr, yi), lin_tfm, proximal, key,
            self.ald_config, lr_scaled=lr_scaled, **seg_kwargs)

    def _traced_prepare(self, lin_tfm, yr, yi):
        """Chain init for mode="steps": on-device chain broadcast + zero-
        filled adjoint — jitted, so it is one dispatch (an eager conj_op
        costs hundreds of ms over remote-dispatch backends)."""
        yr, yi = self._broadcast_chains(yr, yi)
        xr, xi = lin_tfm.conj_op(yr, yi)
        return yr, yi, xr, xi

    def _traced_level_step(self, params, seg_params, seg_label2, prox,
                           xr, xi, yr, yi, c, sigma, lh_w, lr_scaled,
                           seg_lamda, key):
        """One sigma level (mode="steps"): numerically identical to the
        scan body in samplers.ald_pair.ald_inverse_proximal_pair."""
        score_fn = self._score_factory(params)
        cfg = self.ald_config
        step_size = cfg.step_lr * (sigma / self.sigmas[-1]) ** 2

        def inner(_, state):
            xr, xi, key = state
            key, k_re, k_im = jax.random.split(key, 3)
            stacked = stack_parts(xr, xi)
            grads = score_fn(stacked, _labels(stacked, c))
            if self._has_seg:
                g_seg = compute_seg_grad(self._seg_fn(seg_params), stacked,
                                         seg_label2, self.spec.seg_mode)
                grads = grads + g_seg / sigma * (lh_w * seg_lamda)
            g_re, g_im = unstack_parts(grads)
            xr = _langevin_update(xr, g_re, step_size, k_re)
            xi = _langevin_update(xi, g_im, step_size, k_im)
            xr, xi = prox(xr, xi, yr, yi, cfg.step_lr * lr_scaled, 1.0)
            return xr, xi, key

        return jax.lax.fori_loop(0, cfg.n_steps_each, inner, (xr, xi, key))

    def _traced_denoise(self, params, xr, xi):
        score_fn = self._score_factory(params)
        stacked = stack_parts(xr, xi)
        grads = score_fn(stacked,
                         _labels(stacked, self.spec.levels - 1))
        g_re, g_im = unstack_parts(grads)
        s_last = self.sigmas[-1]
        return xr + s_last ** 2 * g_re, xi + s_last ** 2 * g_im

    def _run(self, lin_tfm, proximal, yr, yi, lr_scaled, key,
             seg_label=None, seg_lamda=None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.mesh is not None:
            # per-request arrays (operator overrides, the single-copy
            # measurement, scalars) join the mesh replicated; the chain
            # axis shards inside the traced program (_shard_axis anchors)
            (lin_tfm, proximal, yr, yi, lr_scaled, key, seg_label,
             seg_lamda) = replicate(
                (lin_tfm, proximal, yr, yi, lr_scaled, key, seg_label,
                 seg_lamda), self.mesh)
        if self.spec.mode == "scan":
            return self._recon_scan(self.params, self.seg_params, seg_label,
                                    lin_tfm, proximal, yr, yi, lr_scaled,
                                    seg_lamda, key)
        yr, yi, xr, xi = self._prepare(lin_tfm, yr, yi)
        prox = _bake_ahy(proximal, xr, xi)
        seg_label2 = None
        if self._has_seg:
            # the seg net sees the interleaved [Re, Im] 2B batch; same
            # per-pixel label for both parts (samplers/ald.py contract)
            lb = self._broadcast_seg_label(seg_label)
            seg_label2 = stack_parts(lb, lb)
        for c in range(self.spec.levels):
            lh_w = self._lh_weights[c] if self._has_seg else jnp.float32(0)
            xr, xi, key = self._level_step(
                self.params, self.seg_params, seg_label2, prox, xr, xi,
                yr, yi, jnp.int32(c), self.sigmas[c], lh_w, lr_scaled,
                seg_lamda, key)
        if self.ald_config.denoise:
            xr, xi = self._denoise(self.params, xr, xi)
        return xr, xi

    # ------------------------------------------------------------- public

    def _example_measurement(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        s = self.spec
        shape = (1, s.height, s.width, s.channels)
        if s.num_sens:
            shape = (s.num_sens,) + shape
        return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)

    def warmup(self) -> float:
        """Compile (and run once) at the spec geometry; returns seconds.
        Idempotent — later calls hit the jit cache."""
        t0 = time.perf_counter()
        yr, yi = self._example_measurement()
        prox = self._build_proximal(self.default_lin_tfm)
        seg_label, seg_lamda = None, None
        if self._has_seg:
            s = self.spec
            seg_label = jnp.zeros((s.height, s.width), jnp.int32)
            seg_lamda = jnp.float32(s.seg_lamda)
        with self._lock:
            xr, xi = self._run(self.default_lin_tfm, prox, yr, yi,
                               jnp.float32(self.spec.lr_scaled),
                               jax.random.PRNGKey(0),
                               seg_label=seg_label, seg_lamda=seg_lamda)
            float(jnp.sum(xr) + jnp.sum(xi))  # device->host sync
        if self._compile_s is None:
            self._compile_s = time.perf_counter() - t0
        return self._compile_s

    def reconstruct(self, y_re, y_im, *, mask=None, sens_re=None,
                    sens_im=None, seed: int = 0,
                    lr_scaled: Optional[float] = None,
                    seg_label: Optional[np.ndarray] = None,
                    seg_lamda: Optional[float] = None) -> ReconResult:
        """Reconstruct one measurement with the compiled chain ensemble.

        y_re/y_im: k-space pair, shape (num_sens, H, W[, C]) — or (H, W[, C])
        single-coil — tiled across the engine's `chains` rows (independent
        Langevin chains; the mean is the product). mask/sens_* override the
        engine's default operator for this request (same shapes as the spec).
        seg_label: per-pixel (H, W) int target map for a seg-guided engine
        (falls back to the construction-time default label); seg_lamda
        retunes the guidance weight per request without retracing.
        """
        s = self.spec
        yr = self._canon_measurement(y_re)
        yi = self._canon_measurement(y_im)
        if not self._has_seg:
            if seg_label is not None or seg_lamda is not None:
                raise ValueError("seg_label/seg_lamda given, but the engine "
                                 "was built without a seg model")
            seg_label_t = seg_lamda_t = None
        else:
            if seg_label is None:
                seg_label_t = self.default_seg_label
                if seg_label_t is None:
                    raise ValueError("seg-guided engine needs seg_label "
                                     "(no construction-time default)")
            else:
                seg_label_t = self._canon_seg_label(seg_label)
            seg_lamda_t = jnp.float32(s.seg_lamda if seg_lamda is None
                                      else seg_lamda)
        if mask is None and sens_re is None and sens_im is None:
            lin_tfm = self.default_lin_tfm
        else:
            if mask is None:
                mask = np.asarray(self.default_lin_tfm.mask)
            lin_tfm = self._build_lin_tfm(mask, sens_re, sens_im)
        proximal = self._build_proximal(lin_tfm)
        lr = jnp.float32(s.lr_scaled if lr_scaled is None else lr_scaled)
        key = jax.random.PRNGKey(seed)

        t0 = time.perf_counter()
        with self._lock:
            xr, xi = self._run(lin_tfm, proximal, yr, yi, lr, key,
                               seg_label=seg_label_t, seg_lamda=seg_lamda_t)
            xr = np.asarray(jax.device_get(xr))
            xi = np.asarray(jax.device_get(xi))
        dt = time.perf_counter() - t0
        self._requests += 1
        self._total_latency += dt

        mag = np.sqrt(xr ** 2 + xi ** 2)
        return ReconResult(
            x_re=xr, x_im=xi,
            mean_re=xr.mean(axis=0), mean_im=xi.mean(axis=0),
            mean_mag=mag.mean(axis=0), std_mag=mag.std(axis=0),
            latency_s=dt,
            chain_steps_per_s=s.chain_steps() * s.chains / max(dt, 1e-9))

    def _canon_measurement(self, y) -> jnp.ndarray:
        """(num_sens, H, W[, C]) or (H, W[, C]) -> (coils, chains, H, W, C)."""
        s = self.spec
        y = np.asarray(y, np.float32)
        if y.ndim == 2:                      # (H, W)
            y = y[None, ..., None]
        elif y.ndim == 3:
            if y.shape[0] == s.height and y.shape[-1] == s.channels:
                y = y[None]                  # (H, W, C) single-coil
            else:
                y = y[..., None]             # (coils, H, W)
        ncoil = s.num_sens if s.num_sens else 1
        want = (ncoil, s.height, s.width, s.channels)
        if y.shape != want:
            raise ValueError(f"measurement shape {y.shape} != {want} "
                             f"(engine spec {s})")
        # single copy on the wire/host; _broadcast_chains tiles on device
        if s.num_sens == 0:
            # single-coil operators carry no coil axis: (1, H, W, C)
            return jnp.asarray(y[0][None])
        return jnp.asarray(y[:, None])    # (coils, 1, H, W, C)

    def _canon_seg_label(self, label) -> jnp.ndarray:
        """(H, W) [or (1/ H, W, 1)-squeezable] int per-pixel target map."""
        s = self.spec
        label = np.asarray(label)
        label = label.reshape(s.height, s.width)  # raises if incompatible
        return jnp.asarray(label, jnp.int32)

    def stats(self) -> Dict[str, Any]:
        caches = [f._cache_size() for f in (self._recon_scan,
                                            self._level_step, self._denoise,
                                            self._prepare)]
        return {
            "spec": dataclasses.asdict(self.spec),
            "requests": self._requests,
            "compile_s": self._compile_s,
            "mean_latency_s": (self._total_latency / self._requests
                               if self._requests else None),
            # 1 entry per program when no request ever retraced
            "jit_cache_size": caches,
            "mesh": (None if self.mesh is None
                     else dict(zip(self.mesh.axis_names,
                                   map(int, self.mesh.devices.shape)))),
        }
