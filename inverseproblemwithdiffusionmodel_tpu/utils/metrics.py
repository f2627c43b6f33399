"""Reconstruction quality metrics (NRMSE / SSIM / L1 / L2 / SNR) in pure JAX.

Reference uses skimage (helpers/metrics.py:119-137); here the metrics are
jittable jnp functions so they can run on-device at the end of a sampler scan.
SSIM matches skimage.metrics.structural_similarity defaults for float inputs:
7x7 uniform windows, C1 = (0.01 L)^2, C2 = (0.03 L)^2, L = data_range
(defaults to img_orig.max() - img_orig.min()), sample covariance (N/(N-1)).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
from jax import lax


def mse(img: jnp.ndarray, img_orig: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((img - img_orig) ** 2)


def mae(img: jnp.ndarray, img_orig: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(img - img_orig))


def nrmse(img: jnp.ndarray, img_orig: jnp.ndarray) -> jnp.ndarray:
    """Euclidean-normalized RMSE: ||img - orig|| / ||orig||
    (skimage normalized_root_mse(normalization='euclidean'))."""
    num = jnp.sqrt(jnp.sum((img - img_orig) ** 2))
    den = jnp.sqrt(jnp.sum(img_orig ** 2))
    return num / den


def _uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter with 'valid' windows over the trailing 2 spatial axes of a
    (H, W) array."""
    kernel = jnp.ones((size, size), x.dtype) / (size * size)
    return lax.conv_general_dilated(
        x[None, :, :, None], kernel[:, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def ssim(img: jnp.ndarray, img_orig: jnp.ndarray, win_size: int = 7,
         data_range: Optional[float] = None, K1: float = 0.01,
         K2: float = 0.03) -> jnp.ndarray:
    """Structural similarity on 2-D single-channel images (H, W)."""
    img = img.astype(jnp.float32)
    img_orig = img_orig.astype(jnp.float32)
    if data_range is None:
        data_range = img_orig.max() - img_orig.min()
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)  # skimage sample covariance

    ux = _uniform_filter(img, win_size)
    uy = _uniform_filter(img_orig, win_size)
    uxx = _uniform_filter(img * img, win_size)
    uyy = _uniform_filter(img_orig * img_orig, win_size)
    uxy = _uniform_filter(img * img_orig, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    return jnp.mean(S)


REGISTERED_METRICS = {"L2": mse, "L1": mae, "SSIM": ssim, "NRMSE": nrmse}


def compute_metrics(metric_names: Sequence[str], img: jnp.ndarray,
                    img_orig: jnp.ndarray,
                    reduce: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Batched metric computation (reference: helpers/metrics.py:21-45).

    img: (B, H, W) or (B, H, W, C); img_orig: same, or a single reference
    broadcast over the batch. SSIM on C > 1 images is the per-channel mean
    (the reference's SSIM_wrapper channel_axis, helpers/metrics.py:56-68).
    """
    if img.ndim == 4 and img.shape[-1] == 1:
        img = img[..., 0]
    if img_orig.ndim == 4 and img_orig.shape[-1] == 1:
        img_orig = img_orig[..., 0]
    if img_orig.ndim == img.ndim - 1:
        img_orig = jnp.broadcast_to(img_orig[None], img.shape)
    elif img_orig.shape[0] == 1:
        img_orig = jnp.broadcast_to(img_orig, img.shape)

    def one(name, a, b):
        if name == "SSIM" and a.ndim == 3:  # (H, W, C>1): channel mean
            return jnp.mean(jnp.stack([ssim(a[..., c], b[..., c])
                                       for c in range(a.shape[-1])]))
        return REGISTERED_METRICS[name](a, b)

    out: Dict[str, jnp.ndarray] = {}
    for name in metric_names:
        vals = jnp.stack([one(name, img[i], img_orig[i])
                          for i in range(img.shape[0])])
        if reduce == "mean":
            vals = vals.mean()
        elif reduce == "sum":
            vals = vals.sum()
        elif reduce == "max":
            vals = vals.max()
        out[name] = vals
    return out


def compute_snr(imgs: jnp.ndarray) -> jnp.ndarray:
    """Peak SNR in dB over each batch element
    (reference: helpers/metrics.py:95-102)."""
    mags = jnp.abs(imgs)
    axes = tuple(range(1, mags.ndim))
    snr = mags.max(axis=axes) / mags.std(axis=axes)
    return 20 * jnp.log10(snr)


def nrmse_np(img, img_orig) -> float:
    """Host-side NRMSE for result aggregation (skimage convention)."""
    import numpy as np
    img, img_orig = np.asarray(img), np.asarray(img_orig)
    return float(np.sqrt(np.mean((img - img_orig) ** 2))
                 / max(np.sqrt(np.mean(img_orig ** 2)), 1e-20))


def ssim_np(img, img_orig) -> float:
    """Host-side SSIM (wraps the jnp implementation)."""
    return float(ssim(jnp.asarray(img), jnp.asarray(img_orig)))


def compute_snr_np(img) -> float:
    """Host-side peak SNR in dB of a single image."""
    import numpy as np
    mag = np.abs(np.asarray(img))
    return float(20 * np.log10(mag.max() / max(mag.std(), 1e-20)))


def compute_mean_and_std(imgs: jnp.ndarray):
    """Ensemble mean/std; complex inputs return magnitude & phase stats
    (reference: helpers/metrics.py:77-92)."""
    if jnp.iscomplexobj(imgs):
        mag, phase = jnp.abs(imgs), jnp.angle(imgs)
        return mag.mean(0), phase.mean(0), mag.std(0), phase.std(0)
    return imgs.mean(0), jnp.abs(imgs).std(0)
