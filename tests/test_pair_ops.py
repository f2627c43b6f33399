"""Real-pair (no-complex) fast path vs the complex reference implementations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.ops.fft import i2k_complex, k2i_complex
from inverseproblemwithdiffusionmodel_tpu.ops.fft_pair import (
    i2k_pair, k2i_pair, cmul, cconj_mul, dft_matrix)
from inverseproblemwithdiffusionmodel_tpu.operators import make_sense, L2Penalty
from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
    PairSENSE, PairRandomUndersamplingFourier, PairL2Penalty)
from inverseproblemwithdiffusionmodel_tpu.samplers import (
    ALDConfig, ald_inverse_seg_proximal_real_imag)
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
    ald_inverse_proximal_pair)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder
from inverseproblemwithdiffusionmodel_tpu.utils.misc import stack_parts

H = W = 16


def rand_complex(key, shape):
    kr, ki = jax.random.split(key)
    return (jax.random.normal(kr, shape) +
            1j * jax.random.normal(ki, shape)).astype(jnp.complex64)


def test_matmul_dft_matches_fft():
    z = rand_complex(jax.random.PRNGKey(0), (2, H, W, 1))
    ref = i2k_complex(z)
    kr, ki = i2k_pair(jnp.real(z), jnp.imag(z))
    np.testing.assert_allclose(np.asarray(kr), np.real(np.asarray(ref)),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ki), np.imag(np.asarray(ref)),
                               atol=2e-5)
    # roundtrip
    xr, xi = k2i_pair(kr, ki)
    np.testing.assert_allclose(np.asarray(xr), np.real(np.asarray(z)),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(xi), np.imag(np.asarray(z)),
                               atol=2e-5)


def test_dft_matrix_unitary():
    fr, fi = dft_matrix(8)
    F = np.asarray(fr) + 1j * np.asarray(fi)
    np.testing.assert_allclose(F @ F.conj().T, np.eye(8), atol=1e-6)


def test_cmul_helpers():
    a = rand_complex(jax.random.PRNGKey(1), (4,))
    b = rand_complex(jax.random.PRNGKey(2), (4,))
    mr, mi = cmul(jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b))
    np.testing.assert_allclose(np.asarray(mr + 1j * mi), np.asarray(a * b),
                               rtol=1e-5)
    cr, ci = cconj_mul(jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b))
    np.testing.assert_allclose(np.asarray(cr + 1j * ci),
                               np.asarray(jnp.conj(a) * b), rtol=1e-5)


@pytest.fixture(scope="module")
def sense_pair():
    sense = make_sense("exp", 4, 8, 0.1, (H, W, 1), seed=0, num_frames=1)
    return sense, PairSENSE.from_complex(sense)


def test_pair_sense_matches_complex(sense_pair):
    sense, pair = sense_pair
    z = rand_complex(jax.random.PRNGKey(3), (2, H, W, 1))
    ref = sense(z)
    fr, fi = pair(jnp.real(z), jnp.imag(z))
    np.testing.assert_allclose(np.asarray(fr + 1j * fi), np.asarray(ref),
                               atol=2e-5)
    ref_adj = sense.conj_op(ref)
    ar, ai = pair.conj_op(fr, fi)
    np.testing.assert_allclose(np.asarray(ar + 1j * ai), np.asarray(ref_adj),
                               atol=2e-5)


def test_pair_adjointness(sense_pair):
    """<A x, y> == <x, A^H y> in pair form, with y in the measurement range
    (conj_op omits the idempotent mask, as the complex operator does)."""
    _, pair = sense_pair
    kx = jax.random.PRNGKey(4)
    x = rand_complex(kx, (1, H, W, 1))
    y_raw = rand_complex(jax.random.fold_in(kx, 1), (4, 1, H, W, 1))
    y = pair.mask * y_raw
    Ax_r, Ax_i = pair(jnp.real(x), jnp.imag(x))
    Ahy_r, Ahy_i = pair.conj_op(jnp.real(y), jnp.imag(y))
    lhs = jnp.sum(Ax_r * jnp.real(y) + Ax_i * jnp.imag(y))
    rhs = jnp.sum(jnp.real(x) * Ahy_r + jnp.imag(x) * Ahy_i)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_pair_prox_matches_complex(sense_pair):
    sense, pair = sense_pair
    z = rand_complex(jax.random.PRNGKey(5), (1, H, W, 1))
    y = sense(rand_complex(jax.random.PRNGKey(6), (1, H, W, 1)))
    ref = L2Penalty(lin_tfm=sense, num_iters=6)(z, y, 0.3, 1.0)
    pr = PairL2Penalty(lin_tfm=pair, num_iters=6)
    xr, xi = pr(jnp.real(z), jnp.imag(z), jnp.real(y), jnp.imag(y), 0.3, 1.0)
    np.testing.assert_allclose(np.asarray(xr + 1j * xi), np.asarray(ref),
                               atol=1e-4)


def test_line_mask_normal_kernel_matches_operator(sense_pair):
    """The precomputed W x W normal kernel (H-axis DFTs cancel for line
    masks) equals the direct A^H A composition — SENSE, single-coil, and
    per-frame (tiled) mask variants."""
    from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
        line_mask_normal_kernel)
    _, pair = sense_pair
    key = jax.random.PRNGKey(7)
    xr = jax.random.normal(key, (3, H, W, 1))
    xi = jax.random.normal(jax.random.fold_in(key, 1), (3, H, W, 1))

    # kernel is Hermitian: K^H == K
    kr, ki = line_mask_normal_kernel(pair.mask)
    np.testing.assert_allclose(np.asarray(kr),
                               np.swapaxes(np.asarray(kr), -1, -2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ki),
                               -np.swapaxes(np.asarray(ki), -1, -2), atol=1e-6)

    # SENSE
    gr, gi = pair.conj_op(*pair(xr, xi))
    pk = PairL2Penalty.with_normal_kernel(pair)
    nr, ni = pk._normal(xr, xi)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(gr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), np.asarray(gi), atol=1e-4)

    # single-coil
    single = PairRandomUndersamplingFourier(mask=pair.mask)
    gr, gi = single.conj_op(*single(xr, xi))
    nr, ni = PairL2Penalty.with_normal_kernel(single)._normal(xr, xi)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(gr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), np.asarray(gi), atol=1e-4)

    # per-frame masks tiled to the chain axis (M0 == B, cine 2D+time layout)
    maskB = (jax.random.uniform(jax.random.fold_in(key, 2),
                                (3, 1, W, 1)) > 0.4).astype(jnp.float32)
    linB = PairSENSE(mask=maskB, sens_re=pair.sens_re, sens_im=pair.sens_im)
    gr, gi = linB.conj_op(*linB(xr, xi))
    nr, ni = PairL2Penalty.with_normal_kernel(linB)._normal(xr, xi)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(gr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), np.asarray(gi), atol=1e-4)

    # weighted (non-binary) line mask: both paths use the conj_op
    # convention (no re-masking in the adjoint), so the kernel must be
    # diag(m) — this pins the two paths against being "fixed" to diag(m^2)
    # independently of each other
    maskw = maskB * jax.random.uniform(jax.random.fold_in(key, 3),
                                       (3, 1, W, 1), minval=0.3, maxval=2.0)
    linw = PairSENSE(mask=maskw, sens_re=pair.sens_re, sens_im=pair.sens_im)
    gr, gi = linw.conj_op(*linw(xr, xi))
    nr, ni = PairL2Penalty.with_normal_kernel(linw)._normal(xr, xi)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(gr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), np.asarray(gi), atol=1e-4)


def test_normal_kernel_dedups_tiled_masks(sense_pair):
    """A T-frame mask tiled to B*T chain rows (the cine ensemble layout)
    keeps only a (T, W, W) kernel, applied cyclically — same output as the
    direct A^H A composition on the full tiled operator."""
    _, pair = sense_pair
    key = jax.random.PRNGKey(11)
    T, B = 3, 4
    maskT = (jax.random.uniform(key, (T, 1, W, 1)) > 0.4).astype(jnp.float32)
    maskBT = jnp.tile(maskT, (B, 1, 1, 1))
    lin = PairSENSE(mask=maskBT, sens_re=pair.sens_re, sens_im=pair.sens_im)

    pk = PairL2Penalty.with_normal_kernel(lin)
    assert pk.kernel_re.shape == (T, W, W)   # deduped, not (B*T, W, W)

    xr = jax.random.normal(jax.random.fold_in(key, 1), (B * T, H, W, 1))
    xi = jax.random.normal(jax.random.fold_in(key, 2), (B * T, H, W, 1))
    gr, gi = lin.conj_op(*lin(xr, xi))
    nr, ni = pk._normal(xr, xi)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(gr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ni), np.asarray(gi), atol=1e-4)


def test_prox_normal_kernel_matches_default(sense_pair):
    """with_normal_kernel (+ precomputed A^H y) solves the same system as
    the default operator-composition CG, inside a full ALD chain too."""
    sense, pair = sense_pair
    z = rand_complex(jax.random.PRNGKey(8), (2, H, W, 1))
    y = sense(rand_complex(jax.random.PRNGKey(9), (2, H, W, 1)))
    yr, yi = jnp.real(y), jnp.imag(y)
    p0 = PairL2Penalty(lin_tfm=pair, num_iters=5)
    pk = PairL2Penalty.with_normal_kernel(pair, num_iters=5,
                                          measurement=(yr, yi))
    a0 = p0(jnp.real(z), jnp.imag(z), yr, yi, 0.3, 1.0)
    ak = pk(jnp.real(z), jnp.imag(z), yr, yi, 0.3, 1.0)
    np.testing.assert_allclose(np.asarray(ak[0]), np.asarray(a0[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ak[1]), np.asarray(a0[1]),
                               atol=1e-4)

    # whole-chain equivalence under the scanned sampler
    yy, xx = jnp.mgrid[0:H, 0:W]
    mag = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    target = mag.astype(jnp.complex64)
    ym = sense(target)
    sigmas = sigma_ladder(1.0, 0.01, 12)

    def score_fn(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = stack_parts(jnp.real(target), jnp.imag(target))
        return (tgt - x) / sig ** 2

    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    ymr, ymi = jnp.real(ym), jnp.imag(ym)
    ref = ald_inverse_proximal_pair(
        score_fn, sigmas, (ymr, ymi), pair,
        PairL2Penalty(lin_tfm=pair, num_iters=4),
        jax.random.PRNGKey(0), cfg, lr_scaled=50.0)
    out = ald_inverse_proximal_pair(
        score_fn, sigmas, (ymr, ymi), pair,
        PairL2Penalty.with_normal_kernel(pair, num_iters=4,
                                         measurement=(ymr, ymi)),
        jax.random.PRNGKey(0), cfg, lr_scaled=50.0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=1e-3)


def test_pair_ald_matches_complex_sampler(sense_pair):
    """Full pair reconstruction == complex reconstruction (same keys)."""
    sense, pair = sense_pair
    yy, xx = jnp.mgrid[0:H, 0:W]
    mag = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    target = mag.astype(jnp.complex64)
    y = sense(target)
    sigmas = sigma_ladder(1.0, 0.01, 20)

    def score_fn(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = stack_parts(jnp.real(target), jnp.imag(target)) \
            if x.shape[0] == 2 else jnp.broadcast_to(jnp.real(target), x.shape)
        return (tgt - x) / sig ** 2

    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    ref = ald_inverse_seg_proximal_real_imag(
        score_fn, sigmas, y, sense, L2Penalty(lin_tfm=sense, num_iters=4),
        jax.random.PRNGKey(0), cfg, lr_scaled=50.0)
    xr, xi = ald_inverse_proximal_pair(
        score_fn, sigmas, (jnp.real(y), jnp.imag(y)), pair,
        PairL2Penalty(lin_tfm=pair, num_iters=4),
        jax.random.PRNGKey(0), cfg, lr_scaled=50.0)
    np.testing.assert_allclose(np.asarray(xr), np.real(np.asarray(ref)),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(xi), np.imag(np.asarray(ref)),
                               atol=1e-3)


def test_pair_single_coil():
    from inverseproblemwithdiffusionmodel_tpu.operators import (
        RandomUndersamplingFourier)
    op = RandomUndersamplingFourier.create(8, 0.1, (H, W, 1), seed=0,
                                           num_frames=1)
    pair = PairRandomUndersamplingFourier.from_complex(op)
    z = rand_complex(jax.random.PRNGKey(7), (2, H, W, 1))
    ref = op(z)
    fr, fi = pair(jnp.real(z), jnp.imag(z))
    np.testing.assert_allclose(np.asarray(fr + 1j * fi), np.asarray(ref),
                               atol=2e-5)


def test_pair_2d_time_matches_complex(sense_pair):
    """Pair-form 2D+time sampler == complex sampler (same keys), tv and
    diffusion1d temporal modes."""
    from inverseproblemwithdiffusionmodel_tpu.samplers import (
        ald_2d_time, ald_2d_time_pair)
    T = 4
    sense, pair = sense_pair
    # per-frame broadcastable pipeline: reuse the module-level SENSE (static
    # mask) with B*T frames
    yy, xx = jnp.mgrid[0:H, 0:W]
    base = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))
    vol = jnp.stack([base * (0.8 + 0.05 * t) for t in range(T)])[None]
    frames = vol.reshape(T, H, W)[..., None].astype(jnp.complex64)
    y = sense(frames)                       # (S, T, H, W, 1)
    sigmas = sigma_ladder(1.0, 0.01, 12)
    sigmas_T = sigma_ladder(0.5, 0.01, 6)

    def score_S(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = stack_parts(jnp.real(frames), jnp.imag(frames))
        return (tgt - x) / sig ** 2

    def score_T(x, labels):   # weak pull to zero on tubes (B', T, k^2)
        sig = sigmas_T[labels].reshape(-1, *([1] * (x.ndim - 1)))
        return -x / (sig ** 2 + 10.0)

    from inverseproblemwithdiffusionmodel_tpu.operators import L2Penalty
    from inverseproblemwithdiffusionmodel_tpu.operators.pair import PairL2Penalty
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    for mode_T in ("tv", "diffusion1d"):
        ref = ald_2d_time(score_S, score_T, sigmas, sigmas_T, y, sense,
                          L2Penalty(lin_tfm=sense, num_iters=3),
                          jax.random.PRNGKey(0), cfg, lr_scaled=50.0,
                          mode_T=mode_T, win_size=4, num_frames=T)
        xr, xi = ald_2d_time_pair(
            score_S, score_T, sigmas, sigmas_T,
            (jnp.real(y), jnp.imag(y)), pair,
            PairL2Penalty(lin_tfm=pair, num_iters=3),
            jax.random.PRNGKey(0), cfg, lr_scaled=50.0, mode_T=mode_T,
            win_size=4, num_frames=T)
        np.testing.assert_allclose(np.asarray(xr), np.real(np.asarray(ref)),
                                   atol=2e-3, err_msg=mode_T)
        np.testing.assert_allclose(np.asarray(xi), np.imag(np.asarray(ref)),
                                   atol=2e-3, err_msg=mode_T)


def test_pair_map_matches_complex(sense_pair):
    """map_optimizer_pair trajectory == complex map_optimizer (same Adam)."""
    from inverseproblemwithdiffusionmodel_tpu.samplers import (
        MAPConfig, map_optimizer, map_optimizer_pair)
    sense, pair = sense_pair
    yy, xx = jnp.mgrid[0:H, 0:W]
    mag = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    target = mag.astype(jnp.complex64)
    y = sense(target)
    sigmas = sigma_ladder(1.0, 0.01, 20)

    def score_fn(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = stack_parts(jnp.real(target), jnp.imag(target))
        return (tgt - x) / sig ** 2

    # short horizon: trajectories match step for step (longer horizons
    # drift chaotically through Adam's rsqrt normalization of the ~1e-6
    # matmul-DFT vs FFT difference — both converge to the same optimum)
    cfg = MAPConfig(n_iters=20, lr=5e-2)
    ref = map_optimizer(score_fn, y, sense, lamda=0.1, config=cfg)
    xr, xi = map_optimizer_pair(score_fn, (jnp.real(y), jnp.imag(y)), pair,
                                lamda=0.1, config=cfg)
    np.testing.assert_allclose(np.asarray(xr), np.real(np.asarray(ref)),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(xi), np.imag(np.asarray(ref)),
                               atol=2e-3)
    # long horizon: both reach the target equally well
    cfg = MAPConfig(n_iters=200, lr=5e-2)
    ref = map_optimizer(score_fn, y, sense, lamda=0.1, config=cfg)
    xr, xi = map_optimizer_pair(score_fn, (jnp.real(y), jnp.imag(y)), pair,
                                lamda=0.1, config=cfg)
    err_ref = float(jnp.max(jnp.abs(ref - target)))
    err_pair = float(jnp.max(jnp.abs((xr + 1j * xi) - target)))
    assert err_pair < 1.3 * err_ref + 5e-3


def test_pair_tv_matches_complex(sense_pair):
    # few iterations: the modulus-TV subgradient has unbounded curvature
    # near zero differences, so the ~1e-7 FFT-vs-matmul-DFT float noise
    # amplifies chaotically over long Adam trajectories (measured: 4e-5
    # deviation at 10 iters, 7e-2 at 40) — per-step gradients agree to
    # float precision
    from inverseproblemwithdiffusionmodel_tpu.samplers import (
        MAPConfig, tv_reconstruction, tv_reconstruction_pair)
    sense, pair = sense_pair
    y = sense(rand_complex(jax.random.PRNGKey(11), (1, H, W, 1)))
    cfg = MAPConfig(n_iters=10, lr=5e-2)
    ref = tv_reconstruction(y, sense, reg_weight=0.05, config=cfg)
    xr, xi = tv_reconstruction_pair((jnp.real(y), jnp.imag(y)), pair,
                                    reg_weight=0.05, config=cfg)
    np.testing.assert_allclose(np.asarray(xr), np.real(np.asarray(ref)),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(xi), np.imag(np.asarray(ref)),
                               atol=1e-3)


def test_pair_map_2d_time_matches_complex(sense_pair):
    from inverseproblemwithdiffusionmodel_tpu.samplers import (
        MAPConfig, map_optimizer_2d_time, map_optimizer_2d_time_pair)
    T = 4
    sense, pair = sense_pair
    yy, xx = jnp.mgrid[0:H, 0:W]
    base = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))
    vol = jnp.stack([base * (0.8 + 0.05 * t) for t in range(T)])[None]
    frames = vol.reshape(T, H, W)[..., None].astype(jnp.complex64)
    y = sense(frames)
    sigmas = sigma_ladder(1.0, 0.01, 12)

    def score_S(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = stack_parts(jnp.real(frames), jnp.imag(frames))
        return (tgt - x) / sig ** 2

    def score_T(x, labels):
        # MAP conditions priors at a FIXED label (reference label 1), so
        # the spatial ladder is the right index set here
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        return -x / (sig ** 2 + 10.0)

    # short horizon (see test_pair_map_matches_complex: longer Adam runs
    # drift chaotically from ~1e-6 DFT-vs-FFT differences)
    cfg = MAPConfig(n_iters=12, lr=5e-2)
    for mode_T in ("tv", "diffusion1d", "none"):
        ref = map_optimizer_2d_time(
            score_S, score_T, y, sense, config=cfg, mode_T=mode_T,
            win_size=4, num_frames=T, key=jax.random.PRNGKey(0))
        xr, xi = map_optimizer_2d_time_pair(
            score_S, score_T, (jnp.real(y), jnp.imag(y)), pair, config=cfg,
            mode_T=mode_T, win_size=4, num_frames=T,
            key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(xr), np.real(np.asarray(ref)),
                                   atol=2e-3, err_msg=mode_T)
        np.testing.assert_allclose(np.asarray(xi), np.imag(np.asarray(ref)),
                                   atol=2e-3, err_msg=mode_T)


def test_stepped_2d_time_matches_scanned(sense_pair):
    """Host-stepped 2D+time reconstructor == scanned ald_2d_time_pair."""
    from flax import linen as nn
    from inverseproblemwithdiffusionmodel_tpu.samplers import (
        ald_2d_time_pair, make_stepped_2d_time_pair_reconstructor)
    from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
        PairSENSE, PairL2Penalty)
    T = 4
    sense, pair = sense_pair
    yy, xx = jnp.mgrid[0:H, 0:W]
    base = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))
    vol = jnp.stack([base * (0.8 + 0.05 * t) for t in range(T)])
    fr = vol[..., None]
    fi = jnp.zeros_like(fr)
    yr, yi = pair(fr, fi)
    sigmas = sigma_ladder(1.0, 0.01, 10)
    sigmas_T = sigma_ladder(0.5, 0.01, 5)

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, cond):
            sig = cond.reshape((-1,) + (1,) * (x.ndim - 1))
            w = self.param("w", nn.initializers.ones, ())
            return -w * x / (sig ** 2 + 10.0)

    mod_S, mod_T_net = TinyNet(), TinyNet()
    ps = mod_S.init(jax.random.PRNGKey(0),
                    jnp.zeros((2, H, W, 1)), jnp.ones((2,)))["params"]
    pt = mod_T_net.init(jax.random.PRNGKey(1),
                        jnp.zeros((2, T, 16)), jnp.ones((2,)))["params"]

    def score_S(x, labels):
        return mod_S.apply({"params": ps}, x, sigmas[labels])

    # scanned-sampler contract: labels index the RAW temporal ladder
    def score_T(x, labels):
        return mod_T_net.apply({"params": pt}, x, sigmas_T[labels])

    prox = PairL2Penalty(lin_tfm=pair, num_iters=3)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    for mode_T in ("diffusion1d", "tv", "none"):
        ref_r, ref_i = ald_2d_time_pair(
            score_S, score_T, sigmas, sigmas_T, (yr, yi), pair, prox,
            jax.random.PRNGKey(0), cfg, lr_scaled=50.0, mode_T=mode_T,
            win_size=4, num_frames=T)
        recon = make_stepped_2d_time_pair_reconstructor(
            mod_S, mod_T_net, sigmas, sigmas_T, pair, prox, cfg,
            lr_scaled=50.0, mode_T=mode_T, win_size=4, num_frames=T)
        xr, xi = recon(ps, pt, yr, yi, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(xr), np.asarray(ref_r),
                                   atol=1e-5, err_msg=mode_T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(ref_i),
                                   atol=1e-5, err_msg=mode_T)


def test_stepped_pair_with_seg_matches_scanned(sense_pair):
    """Host-stepped reconstructor with seg guidance == scanned pair form
    (same keys, same linear lh ramp)."""
    from flax import linen as nn
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        make_stepped_pair_reconstructor)
    sense, pair = sense_pair
    yy, xx = jnp.mgrid[0:H, 0:W]
    mag = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    yr, yi = pair(mag, jnp.zeros_like(mag))
    sigmas = sigma_ladder(1.0, 0.01, 12)

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, cond):
            sig = cond.reshape((-1,) + (1,) * (x.ndim - 1))
            w = self.param("w", nn.initializers.ones, ())
            return -w * x / (sig ** 2 + 10.0)

    mod = TinyNet()
    ps = mod.init(jax.random.PRNGKey(0),
                  jnp.zeros((2, H, W, 1)), jnp.ones((2,)))["params"]

    def score_fn(x, labels):
        return mod.apply({"params": ps}, x, sigmas[labels])

    # 2-class "segmentation": logits favoring class 1 where x > 0.3
    def seg_fn(x):
        l1 = 8.0 * (x[..., 0] - 0.3)
        return jnp.stack([-l1, l1], axis=-1)

    seg_label = (mag[..., 0] > 0.3).astype(jnp.int32)
    prox = PairL2Penalty(lin_tfm=pair, num_iters=3)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    for seg_mode in ("full", "FG"):
        ref_r, ref_i = ald_inverse_proximal_pair(
            score_fn, sigmas, (yr, yi), pair, prox, jax.random.PRNGKey(0),
            cfg, lr_scaled=50.0, seg_fn=seg_fn, seg_label=seg_label,
            seg_lamda=0.5, seg_start_time=0.5, seg_mode=seg_mode)
        recon = make_stepped_pair_reconstructor(
            mod, sigmas, pair, prox, cfg, lr_scaled=50.0, seg_fn=seg_fn,
            seg_label=seg_label, seg_lamda=0.5, seg_start_time=0.5,
            seg_mode=seg_mode)
        xr, xi = recon(ps, yr, yi, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(xr), np.asarray(ref_r),
                                   atol=1e-5, err_msg=seg_mode)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(ref_i),
                                   atol=1e-5, err_msg=seg_mode)


def test_stepped_pair_per_level_lr_schedule(sense_pair):
    """lr_scaled as a per-level (L,) schedule: a CONSTANT schedule must
    bit-match the scalar path, and an annealed (low-early) schedule must
    differ from it while matching the scalar path run at the final weight
    only in its tail behavior (sanity: finite, different trajectory)."""
    from flax import linen as nn
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        make_stepped_pair_reconstructor)
    sense, pair = sense_pair
    yy, xx = jnp.mgrid[0:H, 0:W]
    mag = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    yr, yi = pair(mag, jnp.zeros_like(mag))
    sigmas = sigma_ladder(1.0, 0.01, 10)

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, cond):
            sig = cond.reshape((-1,) + (1,) * (x.ndim - 1))
            w = self.param("w", nn.initializers.ones, ())
            return -w * x / (sig ** 2 + 10.0)

    mod = TinyNet()
    ps = mod.init(jax.random.PRNGKey(0),
                  jnp.zeros((2, H, W, 1)), jnp.ones((2,)))["params"]
    prox = PairL2Penalty(lin_tfm=pair, num_iters=3)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)

    scalar = make_stepped_pair_reconstructor(mod, sigmas, pair, prox, cfg,
                                             lr_scaled=50.0)
    const = make_stepped_pair_reconstructor(
        mod, sigmas, pair, prox, cfg, lr_scaled=np.full(10, 50.0))
    ramp = make_stepped_pair_reconstructor(
        mod, sigmas, pair, prox, cfg,
        lr_scaled=np.geomspace(5.0, 50.0, 10))
    k = jax.random.PRNGKey(1)
    xr_s, xi_s = scalar(ps, yr, yi, k)
    xr_c, xi_c = const(ps, yr, yi, k)
    xr_r, xi_r = ramp(ps, yr, yi, k)
    np.testing.assert_array_equal(np.asarray(xr_s), np.asarray(xr_c))
    np.testing.assert_array_equal(np.asarray(xi_s), np.asarray(xi_c))
    assert np.isfinite(np.asarray(xr_r)).all()
    assert np.abs(np.asarray(xr_r) - np.asarray(xr_s)).max() > 0

    # the scanned deployment form accepts the same (L,) schedule and
    # matches the host-stepped trajectory (a tuned --ald_anneal_start
    # schedule carries over to scan mode unchanged)
    def score_fn(x, labels):
        return mod.apply({"params": ps}, x, sigmas[labels])

    xr_sc, xi_sc = ald_inverse_proximal_pair(
        score_fn, sigmas, (yr, yi), pair, prox, k, cfg,
        lr_scaled=jnp.asarray(np.geomspace(5.0, 50.0, 10)))
    np.testing.assert_allclose(np.asarray(xr_sc), np.asarray(xr_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xi_sc), np.asarray(xi_r),
                               atol=1e-5)


def test_stepped_pair_seg_params_argument_path(sense_pair):
    """seg weights passed via seg_params (jit-argument path, axon-safe)
    == the legacy closure path."""
    from flax import linen as nn
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        make_stepped_pair_reconstructor)
    sense, pair = sense_pair
    yy, xx = jnp.mgrid[0:H, 0:W]
    mag = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    yr, yi = pair(mag, jnp.zeros_like(mag))
    sigmas = sigma_ladder(1.0, 0.01, 8)

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, cond):
            sig = cond.reshape((-1,) + (1,) * (x.ndim - 1))
            w = self.param("w", nn.initializers.ones, ())
            return -w * x / (sig ** 2 + 10.0)

    mod = TinyNet()
    ps = mod.init(jax.random.PRNGKey(0),
                  jnp.zeros((2, H, W, 1)), jnp.ones((2,)))["params"]

    seg_w = {"scale": jnp.asarray(8.0)}

    def seg_fn_params(p, x):
        l1 = p["scale"] * (x[..., 0] - 0.3)
        return jnp.stack([-l1, l1], axis=-1)

    def seg_fn_closure(x):
        return seg_fn_params(seg_w, x)

    seg_label = (mag[..., 0] > 0.3).astype(jnp.int32)
    prox = PairL2Penalty(lin_tfm=pair, num_iters=3)
    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    common = dict(lr_scaled=50.0, seg_label=seg_label, seg_lamda=0.5,
                  seg_start_time=0.5)
    ref = make_stepped_pair_reconstructor(
        mod, sigmas, pair, prox, cfg, seg_fn=seg_fn_closure, **common)
    new = make_stepped_pair_reconstructor(
        mod, sigmas, pair, prox, cfg, seg_fn=seg_fn_params,
        seg_params=seg_w, **common)
    xr0, xi0 = ref(ps, yr, yi, jax.random.PRNGKey(0))
    xr1, xi1 = new(ps, yr, yi, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(xr1), np.asarray(xr0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi1), np.asarray(xi0), atol=1e-6)


def test_stepped_pair_seg_missing_label_asserts(sense_pair):
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        make_stepped_pair_reconstructor)
    _, pair = sense_pair
    sigmas = sigma_ladder(1.0, 0.01, 4)
    prox = PairL2Penalty(lin_tfm=pair, num_iters=2)
    with pytest.raises(AssertionError, match="seg_label"):
        make_stepped_pair_reconstructor(
            None, sigmas, pair, prox, ALDConfig(), seg_fn=lambda x: x)
