"""General utilities: data scaling, synthetic phase, batch collation.

Reference semantics: helpers/utils.py (data_transform :212-226, normalize
:287-305, get_timestamp :308) and helpers/load_data.py (collate_batch
:324-369, add_phase :372-397, filter_batch :417-440).
Channel-last conventions: images (B, H, W, C); 1-D signals (B, T, C).
"""
from __future__ import annotations

from datetime import datetime
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .reshape import reshape_temporal_dim  # noqa: F401  (re-export convenience)
from ..ops.resize import resize_align_corners


def expand_like(v: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """(B,) -> (B, 1, ..., 1) matching `like`'s rank
    (reference: helpers/utils.py:20-27)."""
    return v.reshape(v.shape[0], *([1] * (like.ndim - 1)))


def logit_transform(image: jnp.ndarray, lam: float = 1e-6) -> jnp.ndarray:
    image = lam + (1 - 2 * lam) * image
    return jnp.log(image) - jnp.log1p(-image)


def stack_parts(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Interleave two (B, ...) batches into (2B, ...) with rows 2i, 2i+1.

    Unlike `concatenate(axis=0)`, the interleave keeps every output row on
    the device that owns input row i when the batch axis is sharded over a
    mesh - GSPMD lowers it without an all-to-all (concat along a sharded
    axis forces one, which both wastes ICI and deadlocks XLA:CPU's
    in-process rendezvous). Used to batch Re/Im score evaluations into one
    forward pass.
    """
    return jnp.stack([a, b], axis=1).reshape(-1, *a.shape[1:])


def unstack_parts(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of `stack_parts`: (2B, ...) -> two (B, ...) arrays."""
    pair = x.reshape(-1, 2, *x.shape[1:])
    return pair[:, 0], pair[:, 1]


def data_transform(config, X: jnp.ndarray,
                   key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Input scaling pipeline (reference: helpers/utils.py:212-226)."""
    if config.data.uniform_dequantization:
        assert key is not None, "uniform dequantization needs a PRNG key"
        key, sub = jax.random.split(key)
        X = X / 256.0 * 255.0 + jax.random.uniform(sub, X.shape, X.dtype) / 256.0
    if config.data.gaussian_dequantization:
        assert key is not None, "gaussian dequantization needs a PRNG key"
        key, sub = jax.random.split(key)
        X = X + jax.random.normal(sub, X.shape, X.dtype) * 0.01
    if config.data.rescaled:
        X = 2 * X - 1.0
    elif config.data.logit_transform:
        X = logit_transform(X)
    # trailing mean subtraction when the config carries an image_mean
    # (reference: helpers/utils.py:223-224)
    image_mean = (config.get("image_mean")
                  if hasattr(config, "get") else None)
    if image_mean is not None:
        X = X - jnp.asarray(image_mean)[None, ...]
    return X


def inverse_data_scaler(is_centered: bool):
    """(reference: helpers/utils.py:30-36)."""
    if is_centered:
        return lambda x: (x + 1.0) / 2.0
    return lambda x: x


def normalize(img: jnp.ndarray, low_q: float = 0.02, high_q: float = 0.98,
              return_q: bool = False):
    """Quantile normalization to [0, 1] (reference: helpers/utils.py:287-297)."""
    assert 0 <= low_q < high_q <= 1
    low_val = jnp.quantile(img, low_q)
    high_val = jnp.quantile(img, high_q)
    out = jnp.clip((img - low_val) / (high_val - low_val), 0.0, 1.0)
    if return_q:
        return out, low_val, high_val
    return out


def denormalize(img: jnp.ndarray, a_min: float, a_max: float) -> jnp.ndarray:
    """(reference: helpers/utils.py:300-305)."""
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo) + a_min


def normalize_phase(x_phase: jnp.ndarray) -> jnp.ndarray:
    """(reference: helpers/utils.py:402-410)."""
    return (x_phase - jnp.pi) / (2 * jnp.pi)


def compute_angle(img, if_normalize: bool = False) -> np.ndarray:
    """Phase map of a complex image, optionally min-max normalized
    (reference: helpers/utils.py:276-285; host-side np, used by the
    phase-figure helpers in utils/visualizations.py)."""
    angle = np.angle(np.asarray(img))
    if if_normalize:
        angle = angle - angle.min()
        angle = angle / angle.max()
    return angle


def get_timestamp() -> str:
    return datetime.now().strftime("%Y_%m_%d_%H_%M_%S_%f")


def add_phase(imgs: jnp.ndarray, key: jax.Array,
              init_shape: Union[Tuple[int, ...], int] = (5, 5),
              mode: str = "spatial") -> jnp.ndarray:
    """Attach a smooth synthetic phase map (reference:
    helpers/load_data.py:372-397).

    mode='spatial':  imgs (B, H, W, C); a random low-res (C-independent per
      sample) patch is bicubic-resized per reference - we use the same smooth
      align-corners interpolation, linear instead of bicubic (both produce a
      smooth phase; bicubic offers no benefit for a random prior).
    mode='2D+time': imgs (T, H, W, C) with init_shape (it, ih, iw): one 3-D
      phase volume resized trilinearly.
    """
    assert mode in ("spatial", "2D+time")
    if mode == "spatial":
        B, H, W, C = imgs.shape
        patch = jax.random.normal(key, (B, init_shape[0], init_shape[1], C))
        phase = resize_align_corners(patch, (H, W), axes=(1, 2))
        return imgs.astype(jnp.complex64) * jnp.exp(1j * phase)
    assert len(init_shape) == 3
    T, H, W, C = imgs.shape
    patch = jax.random.normal(key, (*init_shape, C))
    phase = resize_align_corners(patch, (T, H, W), axes=(0, 1, 2))
    return imgs.astype(jnp.complex64) * jnp.exp(1j * phase)


def collate_batch(batch: jnp.ndarray, mode: str = "real-valued",
                  key: Optional[jax.Array] = None):
    """Prepare a real-valued batch for a given data mode
    (reference: helpers/load_data.py:324-369).

    batch: (B, H, W, 1) images or (B, T, C) 1-D signals.
    - 'real-valued'/'mag': unchanged
    - 'complex': zero imaginary channel appended -> (B, H, W, 2)
    - 'real-imag': random global phase per sample -> [real, imag] list
    - 'real-imag-random': smooth random phase map -> [real, imag] list
    """
    assert mode in ("real-valued", "mag", "complex", "real-imag",
                    "real-imag-random")
    if mode in ("real-valued", "mag"):
        return batch
    if mode == "complex":
        assert batch.ndim == 4
        return jnp.concatenate([batch, jnp.zeros_like(batch)], axis=-1)
    assert key is not None, f"mode {mode!r} needs a PRNG key"
    if mode == "real-imag":
        phi = (jax.random.uniform(key, (batch.shape[0],)) * 2 - 1) * jnp.pi
        phi = expand_like(phi, batch)
        z = batch * jnp.exp(1j * phi)
        return [jnp.real(z), jnp.imag(z)]
    # real-imag-random: smooth spatial phase
    assert batch.ndim == 4, "real-imag-random expects image batches"
    z = add_phase(batch, key)
    return [jnp.real(z), jnp.imag(z)]


def filter_batch(batch: jnp.ndarray, th: float, key: Optional[jax.Array] = None,
                 keep_prob: float = 0.0) -> jnp.ndarray:
    """TV-norm foreground weighting for 1-D tube batches
    (reference: helpers/load_data.py:417-440).

    batch: (B, T, C). The reference drops low-TV (background) tubes; dynamic
    shapes don't jit, so we return a (B,) keep-mask float weight instead -
    multiply per-sample losses by it (identical expected gradient).
    """
    if batch.ndim != 3:
        return jnp.ones((batch.shape[0],), jnp.float32)
    B, T, C = batch.shape
    shifted = jnp.roll(batch, -1, axis=1)
    norm = jnp.sum(jnp.abs(shifted - batch), axis=(1, 2)) / (C * T)
    mask = norm > th
    if key is not None and keep_prob > 0:
        mask = jnp.logical_or(mask, jax.random.uniform(key, (B,)) <= keep_prob)
    mask = mask.at[0:2].set(True)  # always keep >= 2 samples
    return mask.astype(jnp.float32)


def undersample_seg_mask(label: jnp.ndarray, fraction: float,
                         key: jax.Array) -> jnp.ndarray:
    """Randomly keep EXACTLY max(1, int(num_foreground * fraction)) of the
    foreground seg pixels, chosen uniformly (reference:
    helpers/utils.py:314-327 randperm-selects that count — a per-pixel
    Bernoulli would return an all-zero mask with high probability for
    small masks x small fractions, silently disabling guidance).
    label: any shape of {0,1}; jit-safe (rank-threshold formulation)."""
    assert 0.0 <= fraction <= 1.0
    flat = label.reshape(-1)
    fg = flat > 0
    n_fg = fg.sum()
    k = jnp.maximum(1, jnp.floor(n_fg * fraction).astype(jnp.int32))
    # foreground pixels ranked by i.i.d. uniforms; keep the k best ranks
    scores = jnp.where(fg, jax.random.uniform(key, flat.shape), jnp.inf)
    order = jnp.argsort(scores)
    ranks = jnp.zeros(flat.shape[0], jnp.int32).at[order].set(
        jnp.arange(flat.shape[0], dtype=jnp.int32))
    kept = ((ranks < k) & fg).astype(flat.dtype)
    return kept.reshape(label.shape)
