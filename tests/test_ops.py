"""upfirdn2d vs a numpy oracle, resize vs torch semantics, fused activation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.ops.upfirdn2d import (
    upfirdn2d, upsample_2d, downsample_2d, upsample_conv_2d,
    conv_downsample_2d, _setup_kernel)
from inverseproblemwithdiffusionmodel_tpu.ops.resize import (
    resize_align_corners, resize_half_pixel)
from inverseproblemwithdiffusionmodel_tpu.ops.fused_act import fused_leaky_relu


def upfirdn2d_oracle(x_nhwc, kernel, up, down, pad):
    """Literal numpy transcription of the op contract (upsample by zero
    insertion, pad, correlate with flipped kernel, decimate) - the same
    algorithm as the reference CPU oracle op/upfirdn2d.py:168-209."""
    up_y = up_x = up
    down_y = down_x = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    N, H, W, C = x_nhwc.shape
    kh, kw = kernel.shape
    out = np.zeros((N, H * up_y, W * up_x, C), x_nhwc.dtype)
    out[:, ::up_y, ::up_x, :] = x_nhwc
    # pad (negative = crop)
    out = np.pad(out, ((0, 0), (max(pad_y0, 0), max(pad_y1, 0)),
                       (max(pad_x0, 0), max(pad_x1, 0)), (0, 0)))
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]
    w = np.flip(kernel, (0, 1))
    H2, W2 = out.shape[1], out.shape[2]
    oh, ow = H2 - kh + 1, W2 - kw + 1
    res = np.zeros((N, oh, ow, C), x_nhwc.dtype)
    for i in range(oh):
        for j in range(ow):
            patch = out[:, i:i + kh, j:j + kw, :]
            res[:, i, j, :] = np.einsum("nhwc,hw->nc", patch, w)
    return res[:, ::down_y, ::down_x, :]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2)),
    (1, 1, (0, 0)), (3, 1, (2, 2)),
])
def test_upfirdn2d_matches_oracle(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = rng.randn(4, 4).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    want = upfirdn2d_oracle(x, k, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upfirdn2d_negative_pad():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 1).astype(np.float32)
    k = rng.randn(3, 3).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), 2, 1, (-1, 2)))
    want = upfirdn2d_oracle(x, k, 2, 1, (-1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upsample_downsample_shapes_and_mean():
    x = jnp.ones((1, 8, 8, 2))
    up = upsample_2d(x, k=[1, 3, 3, 1])
    assert up.shape == (1, 16, 16, 2)
    # FIR normalized: constant input stays (approximately) constant inside
    np.testing.assert_allclose(np.asarray(up)[0, 4:12, 4:12, 0], 1.0, atol=1e-4)
    down = downsample_2d(x, k=[1, 3, 3, 1])
    assert down.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(down)[0, 1:3, 1:3, 0], 1.0, atol=1e-4)


def test_upsample_then_downsample_identity_on_constant():
    x = jnp.full((1, 8, 8, 1), 3.0)
    y = downsample_2d(upsample_2d(x, k=[1, 3, 3, 1]), k=[1, 3, 3, 1])
    np.testing.assert_allclose(np.asarray(y)[0, 2:6, 2:6, 0], 3.0, atol=1e-3)


def test_upsample_conv_2d_shape():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    out = upsample_conv_2d(x, w, k=[1, 3, 3, 1])
    assert out.shape == (1, 16, 16, 6)


def test_conv_downsample_2d_shape():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    out = conv_downsample_2d(x, w, k=[1, 3, 3, 1])
    assert out.shape == (1, 4, 4, 6)


def test_upsample_conv_matches_torch_oracle():
    """Validate the lhs_dilation formulation against torch's conv_transpose2d
    with the reference's weight pre-processing (up_or_down_sampling.py:110-141)
    followed by the numpy upfirdn oracle."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    factor = 2
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)  # HWIO
    k = [1, 3, 3, 1]
    fused = np.asarray(upsample_conv_2d(jnp.asarray(x), jnp.asarray(w), k=k))

    kern = _setup_kernel(k) * (factor**2)
    kh = w.shape[0]
    p = (kern.shape[0] - factor) - (kh - 1)
    x_t = torch.tensor(np.moveaxis(x, -1, 1))            # NCHW
    w_t = torch.tensor(np.transpose(w, (3, 2, 0, 1)))    # OIHW
    wt = torch.flip(w_t, [2, 3]).permute(1, 0, 2, 3)     # IOHW, flipped
    up = F.conv_transpose2d(x_t, wt, stride=factor)
    up_nhwc = np.moveaxis(up.numpy(), 1, -1)
    # asymmetric pads: replicate via explicit per-side padding in the oracle
    pad0, pad1 = (p + 1) // 2 + factor - 1, p // 2 + 1
    want = upfirdn2d_oracle_asym(up_nhwc, kern, 1, 1,
                                 (pad0, pad1, pad0, pad1))
    np.testing.assert_allclose(fused, want, atol=1e-3)


def upfirdn2d_oracle_asym(x_nhwc, kernel, up, down, pads):
    pad_x0, pad_x1, pad_y0, pad_y1 = pads
    N, H, W, C = x_nhwc.shape
    kh, kw = kernel.shape
    out = np.zeros((N, H * up, W * up, C), x_nhwc.dtype)
    out[:, ::up, ::up, :] = x_nhwc
    out = np.pad(out, ((0, 0), (max(pad_y0, 0), max(pad_y1, 0)),
                       (max(pad_x0, 0), max(pad_x1, 0)), (0, 0)))
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]
    w = np.flip(kernel, (0, 1))
    H2, W2 = out.shape[1], out.shape[2]
    oh, ow = H2 - kh + 1, W2 - kw + 1
    res = np.zeros((N, oh, ow, C), x_nhwc.dtype)
    for i in range(oh):
        for j in range(ow):
            res[:, i, j, :] = np.einsum(
                "nhwc,hw->nc", out[:, i:i + kh, j:j + kw, :], w)
    return res[:, ::down, ::down, :]


def test_conv_downsample_matches_torch_oracle():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(4)
    factor = 2
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)
    k = [1, 3, 3, 1]
    fused = np.asarray(conv_downsample_2d(jnp.asarray(x), jnp.asarray(w), k=k))

    kern = _setup_kernel(k)
    p = (kern.shape[0] - factor) + (w.shape[0] - 1)
    fir = upfirdn2d_oracle_asym(x, kern, 1, 1,
                                ((p + 1) // 2, p // 2, (p + 1) // 2, p // 2))
    x_t = torch.tensor(np.moveaxis(fir, -1, 1))
    w_t = torch.tensor(np.transpose(w, (3, 2, 0, 1)))
    out = F.conv2d(x_t, w_t, stride=factor)
    want = np.moveaxis(out.numpy(), 1, -1)
    np.testing.assert_allclose(fused, want, atol=1e-3)


def test_setup_kernel():
    k = _setup_kernel([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)


def test_resize_align_corners_identity_and_endpoints():
    x = jnp.arange(5.0).reshape(1, 5, 1)
    out = resize_align_corners(x, (9,), axes=(1,))
    # endpoints preserved with align_corners=True
    assert float(out[0, 0, 0]) == 0.0
    assert float(out[0, -1, 0]) == 4.0
    # midpoint of a linear ramp stays linear
    np.testing.assert_allclose(np.asarray(out[0, :, 0]),
                               np.linspace(0, 4, 9), atol=1e-6)


def test_resize_same_size_is_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 7, 3),
                    dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(resize_align_corners(x, (7, 7), axes=(1, 2))),
        np.asarray(x))


def test_resize_half_pixel_average():
    # downscale 4 -> 2 with half-pixel sampling: out[0] samples at pos 0.5
    x = jnp.asarray([[0.0, 1.0, 2.0, 3.0]]).reshape(1, 4, 1)
    out = resize_half_pixel(x, (2,), axes=(1,))
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), [0.5, 2.5], atol=1e-6)


def test_fused_leaky_relu():
    x = jnp.asarray([[-1.0, 2.0]])
    b = jnp.asarray([1.0, -1.0])
    out = np.asarray(fused_leaky_relu(x, b))
    scale = np.sqrt(2.0)
    np.testing.assert_allclose(out, [[0.0 * scale, 1.0 * scale]], atol=1e-6)
    out2 = np.asarray(fused_leaky_relu(jnp.asarray([[-2.0]])))
    np.testing.assert_allclose(out2, [[-2.0 * 0.2 * scale]], rtol=1e-6)


def test_fused_leaky_relu_grad():
    f = lambda x: jnp.sum(fused_leaky_relu(x, jnp.zeros(x.shape[-1])))
    g = jax.grad(f)(jnp.asarray([[-1.0, 1.0]]))
    scale = np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(g), [[0.2 * scale, scale]], rtol=1e-6)
