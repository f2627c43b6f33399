"""Model registry, construction, and score-function adapters.

Reference semantics: helpers/load_model.py:23-31 TASK_NAME_TO_MODEL_CTOR
{Diffusion -> NCSNv2Deepest, Diffusion1D -> NCSN1D, Diffusion3D ->
NCSN3DShallow, Clf -> ResNetClf, Seg -> MONAI UNet} and the registry in
models/utils.py:27-46 for the continuous stack. Checkpoint reload (the
reference's hard-coded timestamp dirs, load_model.py:42-122) is replaced by
orbax paths handled in training/checkpoint.py.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ncsnv2 import NCSNv2, NCSNv2Deeper, NCSNv2Deepest
from .ncsn1d import NCSN1D, NCSN1DDeeper, NCSN1DDeepest, UNET1D
from .ncsn3d import NCSN3D, NCSN3DShallow
from .classifier import ResNetClf
from .unet import UNet
from ..config import load_general_config

_MODELS = {}


def register_model(cls=None, *, name: str = None):
    """String registry (reference: models/utils.py:27-44)."""
    def _register(cls):
        local_name = name if name is not None else cls.__name__
        if local_name in _MODELS:
            raise ValueError(f"Already registered model with name: {local_name}")
        _MODELS[local_name] = cls
        return cls
    return _register(cls) if cls is not None else _register


def get_model(name: str):
    return _MODELS[name]


from .ncsnpp import NCSNpp
from .ddpm import DDPM
from .ncsn import NCSN, NCSNdeeper

for _name, _ctor in [
    ("ncsnv2", NCSNv2), ("ncsnv2_deeper", NCSNv2Deeper),
    ("ncsnv2_deepest", NCSNv2Deepest), ("ncsn1d", NCSN1D),
    ("ncsn3d", NCSN3D), ("ncsn3d_shallow", NCSN3DShallow),
    ("unet1d", UNET1D),
    # continuous stack (reference: models/utils.py registry names)
    ("ncsnpp", NCSNpp), ("ddpm", DDPM),
    ("ncsn", NCSN), ("ncsn_deeper", NCSNdeeper),
    # size-suffixed aliases (reference: models/ncsnv2.py registers
    # ncsnv2_64/128/256 for the <96 / <=128 / <=256 variants)
    ("ncsnv2_64", NCSNv2), ("ncsnv2_128", NCSNv2Deeper),
    ("ncsnv2_256", NCSNv2Deepest),
]:
    _MODELS[_name] = _ctor


def create_model(config):
    """Instantiate the registered model named by `config.model.name`
    (reference: models/utils.py:88-94 — the `.to(device)` +
    `torch.nn.DataParallel` wrapping has no analog here: placement and
    replication are sharding decisions made at `module.init`/apply time
    via the mesh, parallel/mesh.py)."""
    return get_model(config.model.name)(config=config)


def build_seg_unet(general_config=None) -> UNet:
    gc = general_config or load_general_config()
    return UNet(out_channels=gc.Seg.out_channels,
                features=tuple(gc.Seg.channels),
                strides=tuple(gc.Seg.strides),
                ndim=gc.Seg.spatial_dims)


def build_clf(general_config=None) -> ResNetClf:
    gc = general_config or load_general_config()
    return ResNetClf(config=gc)


TASK_NAME_TO_MODEL_CTOR = {
    "Diffusion": lambda config: NCSNv2Deepest(config=config),
    "Diffusion1D": lambda config: NCSN1D(config),
    "Diffusion3D": lambda config: NCSN3DShallow(config=config),
    "Clf": lambda config: build_clf(),
    "Seg": lambda config: build_seg_unet(),
}


def _example_input(config, task_name: str) -> jnp.ndarray:
    """A zero batch with the right shape for init."""
    if task_name in ("Diffusion", "Seg", "Clf"):
        s = config.data.image_size
        return jnp.zeros((1, s, s, config.data.channels))
    if task_name == "Diffusion1D":
        return jnp.zeros((1, config.data.image_size, config.data.channels))
    if task_name == "Diffusion3D":
        win = int(np.sqrt(config.data.channels))
        return jnp.zeros((1, win, win, config.data.image_size,
                          config.data.get("channels_3d", 1)))
    raise ValueError(task_name)


def load_model(config, task_name: str, key: Optional[jax.Array] = None
               ) -> Tuple[Any, Any]:
    """Construct a model and init its params
    (reference: helpers/load_model.py:125-143). Returns (module, params)."""
    assert task_name in TASK_NAME_TO_MODEL_CTOR, task_name
    if key is None:
        key = jax.random.PRNGKey(0)
    module = TASK_NAME_TO_MODEL_CTOR[task_name](config)
    x = _example_input(config, task_name)
    # jit the init: un-jitted flax init dispatches every op eagerly, which
    # is pathologically slow over remote-dispatch backends (axon tunnel)
    if task_name.startswith("Diffusion"):
        variables = jax.jit(module.init)(key, x, jnp.ones((x.shape[0],)))
    else:
        variables = jax.jit(module.init)(key, x)
    return module, variables["params"]


def make_score_fn(module, params, sigmas: jnp.ndarray,
                  compute_dtype: Optional[Any] = None
                  ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Adapter: (x, labels:int32) -> score, the interface all samplers use.
    Labels index the given sigma ladder; the module consumes sigma VALUES.

    compute_dtype=jnp.bfloat16 runs the network forward in bf16 (params and
    activations cast in, output cast back to f32) — ~2x MXU throughput on
    TPU; the Langevin state itself stays f32.

    compute_dtype="int8" is an opt-in serving mode: bf16 params/activations
    plus int8 MXU convs (ops.quant). Inference-only (round has zero
    gradient); norms/activations/resampling stay bf16, dequantized per
    conv. Quality-validated end-to-end against f32 reconstruction in
    examples/train_and_reconstruct_demo.py; end-to-end throughput is only
    ~+2.6% over bf16 (dynamic-quant HBM passes offset the 2x MXU rate —
    see ops/quant.py), so bf16 stays the default.
    """
    sigmas = jnp.asarray(sigmas)

    if compute_dtype is None:
        def score_fn(x, labels):
            return module.apply({"params": params}, x, sigmas[labels])
        return score_fn

    quant_int8 = compute_dtype == "int8"
    if quant_int8:
        compute_dtype = jnp.bfloat16

    cast_params = jax.tree_util.tree_map(
        lambda p: p.astype(compute_dtype), params)

    def score_fn(x, labels):
        out = module.apply({"params": cast_params},
                           x.astype(compute_dtype),
                           sigmas[labels].astype(compute_dtype))
        return out.astype(jnp.float32)

    if quant_int8:
        from ..ops.quant import quantized_convs
        plain_score_fn = score_fn

        def score_fn(x, labels):
            # the context flips Conv's lowering at TRACE time; score_fn is a
            # fresh closure per make_score_fn call, so each jit of it owns
            # its compilation (no cross-mode cache aliasing)
            with quantized_convs("int8"):
                return plain_score_fn(x, labels)

    return score_fn


def make_apply_fn(module, params) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Plain forward (clf / seg)."""
    def apply_fn(x):
        return module.apply({"params": params}, x)
    return apply_fn


def module_takes_train(module) -> bool:
    """Whether the module's __call__ has a `train` flag (the continuous
    zoo nets gate nn.Dropout on it; the discrete ncsn family has no
    stochastic layers and no flag)."""
    import inspect
    try:
        return "train" in inspect.signature(type(module).__call__).parameters
    except (TypeError, ValueError):
        return False


def get_model_fn(module, params, train: bool = False,
                 dropout_key: Optional[jax.Array] = None
                 ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Raw model forward `(x, cond) -> out` (reference: models/utils.py:97's
    train/eval switch). Flax modules are pure functions of params — the
    train/eval mode is per-call: for modules whose __call__ takes a `train`
    flag (the continuous zoo gates nn.Dropout on it) `train=True` enables
    stochastic layers, drawing from `dropout_key` (default PRNGKey(0)).
    Modules without the flag (the discrete ncsn family — no stochastic
    layers) ignore `train`, as in the reference.

    NOTE: the returned closure draws ONE dropout mask (from `dropout_key`)
    and reuses it on every call — fine for a single training/eval pass,
    but NOT a source of per-call stochasticity (for MC-dropout, call
    module.apply yourself with a fresh rng per call)."""
    if train and module_takes_train(module):
        key = dropout_key if dropout_key is not None else jax.random.PRNGKey(0)

        def model_fn(x, cond):
            return module.apply({"params": params}, x, cond, train=True,
                                rngs={"dropout": key})
        return model_fn

    def model_fn(x, cond):
        return module.apply({"params": params}, x, cond)

    return model_fn


def make_tube_score_fn_3d(module, params, sigmas: jnp.ndarray, win: int
                          ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Score adapter for a 3-D (2D+time) net consuming pixel-tube batches.

    The 2D+time sampler feeds temporal nets (B', T, k^2) tubes; NCSN3D /
    NCSN3DShallow already round-trip rank-3 inputs through the (B, k, k,
    T, 1) volume layout internally (models/ncsn3d.py _tube_to_volume /
    _volume_to_tube — reference: ncsn/models/ncsn3d.py:84,118 rearranges
    inside the torch model), so this is make_score_fn plus a window check:
    the module derives its window from config.data.channels, and a sampler
    win_size that disagrees would silently mis-tile the tubes.
    """
    cfg_channels = int(module.config.data.channels)
    if win * win != cfg_channels:
        raise ValueError(
            f"win_size {win} (k^2 = {win * win}) does not match the 3-D "
            f"net's config.data.channels = {cfg_channels}")
    return make_score_fn(module, params, sigmas)


def get_network(config):
    """Continuous-stack NCSNv2 size dispatch (reference:
    models/ncsnv2.py:31-40): <96 px -> NCSNv2, <=128 -> NCSNv2Deeper,
    <=256 -> NCSNv2Deepest."""
    size = config.data.image_size
    if size < 96:
        return NCSNv2(config=config)
    if size <= 128:
        return NCSNv2Deeper(config=config)
    if size <= 256:
        return NCSNv2Deepest(config=config)
    raise NotImplementedError(f"no NCSNv2 variant for image size {size}")
