"""Serving engine + HTTP server tests (tiny CPU geometry).

The engine must (a) reproduce the library sampler exactly, (b) never
retrace across requests that vary the measurement/operator/weights, and
(c) round-trip the wire protocol."""
import io
import json
import urllib.error
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.models.registry import make_score_fn
from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
    PairL2Penalty, PairSENSE)
from inverseproblemwithdiffusionmodel_tpu.samplers.ald import ALDConfig
from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
    ald_inverse_proximal_pair)
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import sigma_ladder
from inverseproblemwithdiffusionmodel_tpu.serving import (
    EngineSpec, ReconstructionEngine)
from inverseproblemwithdiffusionmodel_tpu.serving.server import serve

H = W = 16
LEVELS, NSTEPS, CHAINS, NSENS = 3, 2, 4, 2


def _tiny_config():
    return Config({
        "data": {"channels": 1, "image_size": H, "logit_transform": False,
                 "rescaled": False},
        "model": {"ngf": 8, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++", "sigma_begin": 10.0,
                  "sigma_end": 0.1, "num_classes": LEVELS,
                  "sigma_dist": "geometric"},
    })


@pytest.fixture(scope="module")
def setup():
    config = _tiny_config()
    module = NCSNv2(config=config)
    sigmas = sigma_ladder(10.0, 0.1, LEVELS, "geometric")
    x0 = jnp.zeros((2, H, W, 1))
    params = module.init(jax.random.PRNGKey(0), x0, jnp.ones((2,)))["params"]

    rng = np.random.RandomState(0)
    mask = (rng.rand(1, 1, W, 1) < 0.4).astype(np.float32)
    mask[..., W // 2 - 1:W // 2 + 1, :] = 1.0
    maps = rng.rand(NSENS, H, W, 1).astype(np.float32) + 0.2
    maps = maps / np.sqrt((maps ** 2).sum(axis=0, keepdims=True))

    x = rng.rand(H, W).astype(np.float32)
    lin = PairSENSE(mask=jnp.asarray(mask), sens_re=jnp.asarray(maps),
                    sens_im=jnp.zeros_like(jnp.asarray(maps)))
    yr, yi = lin(jnp.asarray(x)[None, ..., None],
                 jnp.zeros((1, H, W, 1)))           # (NSENS, 1, H, W, 1)
    return dict(module=module, params=params, sigmas=sigmas, mask=mask,
                maps=maps, yr=np.asarray(yr), yi=np.asarray(yi))


def _spec(**kw):
    base = dict(height=H, width=W, channels=1, num_sens=NSENS,
                chains=CHAINS, levels=LEVELS, n_steps_each=NSTEPS,
                step_lr=1e-5, lr_scaled=2.0, prox_iters=3, dtype="f32",
                mode="scan")
    base.update(kw)
    return EngineSpec(**base)


def _engine(setup, mesh=None, **kw):
    return ReconstructionEngine(setup["module"], setup["params"],
                                setup["sigmas"], spec=_spec(**kw),
                                mask=setup["mask"],
                                sens_re=setup["maps"], mesh=mesh)


def test_engine_matches_direct_sampler(setup):
    eng = _engine(setup)
    res = eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=7)

    # the library path, by hand: tile the measurement over the chains axis
    lin = eng.default_lin_tfm
    prox = PairL2Penalty.with_normal_kernel(lin, num_iters=3)
    yr = jnp.asarray(np.broadcast_to(setup["yr"],
                                     (NSENS, CHAINS, H, W, 1)))
    yi = jnp.asarray(np.broadcast_to(setup["yi"],
                                     (NSENS, CHAINS, H, W, 1)))
    score_fn = make_score_fn(setup["module"], setup["params"],
                             setup["sigmas"])
    xr, xi = ald_inverse_proximal_pair(
        score_fn, setup["sigmas"], (yr, yi), lin, prox,
        jax.random.PRNGKey(7),
        ALDConfig(n_steps_each=NSTEPS, step_lr=1e-5), lr_scaled=2.0)

    np.testing.assert_allclose(res.x_re, np.asarray(xr), rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(res.x_im, np.asarray(xi), rtol=2e-5,
                               atol=2e-6)
    assert res.x_re.shape == (CHAINS, H, W, 1)
    # chains see different noise -> a real ensemble, not CHAINS copies
    assert np.std(res.x_re, axis=0).max() > 0


def test_modes_agree_and_aggregates(setup):
    r_scan = _engine(setup, mode="scan").reconstruct(
        setup["yr"][:, 0], setup["yi"][:, 0], seed=3)
    r_steps = _engine(setup, mode="steps").reconstruct(
        setup["yr"][:, 0], setup["yi"][:, 0], seed=3)
    np.testing.assert_allclose(r_scan.x_re, r_steps.x_re, rtol=2e-5,
                               atol=2e-6)

    mag = np.sqrt(r_scan.x_re ** 2 + r_scan.x_im ** 2)
    np.testing.assert_allclose(r_scan.mean_mag, mag.mean(axis=0))
    np.testing.assert_allclose(r_scan.std_mag, mag.std(axis=0))
    np.testing.assert_allclose(r_scan.mean_re, r_scan.x_re.mean(axis=0))


@pytest.mark.parametrize("mode", ["scan", "steps"])
def test_no_retrace_across_requests(setup, mode):
    eng = _engine(setup, mode=mode)
    eng.warmup()
    rng = np.random.RandomState(1)
    mask2 = (rng.rand(1, 1, W, 1) < 0.6).astype(np.float32)
    maps2 = rng.rand(NSENS, H, W, 1).astype(np.float32) + 0.1
    maps2 = maps2 / np.sqrt((maps2 ** 2).sum(axis=0, keepdims=True))

    r1 = eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=0)
    # new scan: different measurement, mask, coil maps, and weight
    r2 = eng.reconstruct(setup["yr"][:, 0] * 2, setup["yi"][:, 0],
                         mask=mask2, sens_re=maps2, sens_im=None,
                         lr_scaled=9.0, seed=1)
    assert not np.allclose(r1.x_re, r2.x_re)
    # the whole point: one executable per program across all requests
    assert all(n <= 1 for n in eng.stats()["jit_cache_size"]), \
        eng.stats()["jit_cache_size"]
    assert eng.stats()["requests"] == 2


def test_measurement_shape_handling(setup):
    eng = _engine(setup)
    # (coils, H, W) and (coils, H, W, C) both canonicalize
    r1 = eng.reconstruct(setup["yr"][:, 0, ..., 0], setup["yi"][:, 0, ..., 0],
                         seed=0)
    r2 = eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=0)
    np.testing.assert_allclose(r1.x_re, r2.x_re)
    with pytest.raises(ValueError):
        eng.reconstruct(setup["yr"][:, 0, :8], setup["yi"][:, 0, :8])


def test_single_coil_engine(setup):
    eng = ReconstructionEngine(
        setup["module"], setup["params"], setup["sigmas"],
        spec=_spec(num_sens=0), mask=setup["mask"])
    y = setup["mask"][0] * np.random.RandomState(2).rand(H, W, 1)
    res = eng.reconstruct(y.astype(np.float32), np.zeros_like(y, np.float32))
    assert res.x_re.shape == (CHAINS, H, W, 1)
    assert np.isfinite(res.mean_mag).all()
    with pytest.raises(ValueError):
        ReconstructionEngine(setup["module"], setup["params"],
                             setup["sigmas"], spec=_spec(num_sens=0),
                             mask=setup["mask"], sens_re=setup["maps"])


def test_bf16_smoke(setup):
    res = _engine(setup, dtype="bf16").reconstruct(
        setup["yr"][:, 0], setup["yi"][:, 0], seed=0)
    assert np.isfinite(res.x_re).all()
    assert res.x_re.dtype == np.float32   # state stays f32


def test_spec_validates_levels(setup):
    with pytest.raises(ValueError):
        ReconstructionEngine(setup["module"], setup["params"],
                             setup["sigmas"],
                             spec=_spec(levels=LEVELS + 1))


def test_server_roundtrip(setup):
    eng = _engine(setup, mode="steps")
    httpd = serve(eng, port=0, background=True)
    try:
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"

        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["spec"]["chains"] == CHAINS

        buf = io.BytesIO()
        np.savez(buf, y_re=setup["yr"][:, 0], y_im=setup["yi"][:, 0])
        req = urllib.request.Request(
            f"{base}/reconstruct?seed=5&lr_scaled=2.0", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req) as r:
            assert float(r.headers["X-Latency-S"]) > 0
            out = np.load(io.BytesIO(r.read()))
        assert out["mean_mag"].shape == (H, W, 1)
        assert out["x_re"].shape == (CHAINS, H, W, 1)
        # server result == direct engine call with the same seed/weights
        direct = eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0],
                                 seed=5, lr_scaled=2.0)
        np.testing.assert_allclose(out["x_re"], direct.x_re)

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(f"{base}/reconstruct",
                                     data=b"not-an-npz")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_cli_builds_engine():
    """serve_recon's builder wires config -> engine (no server start)."""
    from inverseproblemwithdiffusionmodel_tpu.scripts import serve_recon
    p_args = ["--ds_name", "MNIST", "--chains", "2", "--levels", "2",
              "--num_sens", "2", "--dtype", "f32", "--mode", "steps",
              "--R", "0",
              "--override", "data.image_size=16",
              "--override", "model.ngf=8"]
    eng = serve_recon.build_engine(_parse_serve_args(p_args))
    assert eng.spec.height == 16 and eng.spec.levels == 2
    res = eng.reconstruct(np.zeros((2, 16, 16), np.float32),
                          np.zeros((2, 16, 16), np.float32))
    assert np.isfinite(res.mean_mag).all()


# ---------------------------------------------------------------- cine

TF = 3   # frames


@pytest.fixture(scope="module")
def cine_setup(setup):
    from inverseproblemwithdiffusionmodel_tpu.models.ncsn1d import NCSN1D
    cfg_t = Config({
        "data": {"channels": 4, "image_size": TF, "logit_transform": False,
                 "rescaled": False},
        "model": {"ngf": 8, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++", "sigma_begin": 5.0,
                  "sigma_end": 0.1, "num_classes": LEVELS,
                  "sigma_dist": "geometric"},
    })
    module_T = NCSN1D(config=cfg_t)
    x0 = jnp.zeros((2, TF, 4))   # (B', T, win^2) tubes, win=2
    params_T = module_T.init(jax.random.PRNGKey(1), x0,
                             jnp.ones((2,)))["params"]
    rng = np.random.RandomState(3)
    maskT = (rng.rand(TF, 1, W, 1) < 0.5).astype(np.float32)
    maskT[..., W // 2 - 1:W // 2 + 1, :] = 1.0
    y = rng.rand(NSENS, TF, H, W).astype(np.float32)
    return dict(module_T=module_T, params_T=params_T,
                sigmas_T=setup["sigmas"], maskT=maskT, y=y)


def _cine_spec(**kw):
    from inverseproblemwithdiffusionmodel_tpu.serving import CineEngineSpec
    base = dict(height=H, width=W, frames=TF, channels=1, num_sens=NSENS,
                chains=2, n_steps_each=NSTEPS, step_lr=1e-5, lr_scaled=2.0,
                mode_T="diffusion1d", lamda_T=1.0, win_size=2,
                prox_iters=3, dtype="f32", mode="scan")
    base.update(kw)
    return CineEngineSpec(**base)


def _cine_engine(setup, cine_setup, mesh=None, **kw):
    from inverseproblemwithdiffusionmodel_tpu.serving import (
        CineReconstructionEngine)
    return CineReconstructionEngine(
        setup["module"], setup["params"], setup["sigmas"],
        spec=_cine_spec(**kw), module_T=cine_setup["module_T"],
        params_T=cine_setup["params_T"], sigmas_T=cine_setup["sigmas_T"],
        mask=cine_setup["maskT"], sens_re=setup["maps"], mesh=mesh)


def test_cine_engine_matches_direct_sampler(setup, cine_setup):
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        ald_2d_time_pair)
    eng = _cine_engine(setup, cine_setup)
    y = cine_setup["y"]
    res = eng.reconstruct(y, np.zeros_like(y), seed=11)
    assert res.x_re.shape == (2, TF, H, W, 1)

    # library path by hand: tile measurement + per-frame mask over chains
    B = 2
    lin = eng.default_lin_tfm
    prox = PairL2Penalty.with_normal_kernel(lin, num_iters=3)
    yb = np.tile(y[:, None, ..., None], (1, B, 1, 1, 1, 1)).reshape(
        NSENS, B * TF, H, W, 1)
    score_S = make_score_fn(setup["module"], setup["params"],
                            setup["sigmas"])
    score_T = make_score_fn(cine_setup["module_T"], cine_setup["params_T"],
                            cine_setup["sigmas_T"])
    xr, xi = ald_2d_time_pair(
        score_S, score_T, setup["sigmas"], cine_setup["sigmas_T"],
        (jnp.asarray(yb), jnp.zeros_like(jnp.asarray(yb))), lin, prox,
        jax.random.PRNGKey(11),
        ALDConfig(n_steps_each=NSTEPS, step_lr=1e-5), lr_scaled=2.0,
        mode_T="diffusion1d", lamda_T=1.0, win_size=2, num_frames=TF)
    np.testing.assert_allclose(res.x_re, np.asarray(xr), rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(res.x_im, np.asarray(xi), rtol=2e-5,
                               atol=2e-6)


def test_cine_modes_agree_no_retrace(setup, cine_setup):
    y = cine_setup["y"]
    e_scan = _cine_engine(setup, cine_setup, mode="scan")
    e_steps = _cine_engine(setup, cine_setup, mode="steps")
    r1 = e_scan.reconstruct(y, np.zeros_like(y), seed=2)
    r2 = e_steps.reconstruct(y, np.zeros_like(y), seed=2)
    np.testing.assert_allclose(r1.x_re, r2.x_re, rtol=2e-5, atol=2e-6)

    # new per-frame mask + retuned weights: same executables
    rng = np.random.RandomState(9)
    mask2 = (rng.rand(TF, 1, W, 1) < 0.7).astype(np.float32)
    r3 = e_steps.reconstruct(y * 2, np.zeros_like(y), mask=mask2,
                             lr_scaled=7.0, lamda_T=0.5, seed=4)
    assert not np.allclose(r2.x_re, r3.x_re)
    assert all(n <= 1 for n in e_steps.stats()["jit_cache_size"])
    # per-frame normal kernel stays (T, W, W) despite the chain tiling
    prox = e_steps._build_proximal(e_steps.default_lin_tfm)
    assert prox.kernel_re.shape == (TF, W, W)


def test_cine_tv_mode_needs_no_temporal_net(setup, cine_setup):
    from inverseproblemwithdiffusionmodel_tpu.serving import (
        CineReconstructionEngine)
    eng = CineReconstructionEngine(
        setup["module"], setup["params"], setup["sigmas"],
        spec=_cine_spec(mode_T="tv", mode="steps"),
        mask=cine_setup["maskT"], sens_re=setup["maps"])
    y = cine_setup["y"]
    res = eng.reconstruct(y, np.zeros_like(y))
    assert np.isfinite(res.mean_mag).all()
    with pytest.raises(ValueError):
        CineReconstructionEngine(
            setup["module"], setup["params"], setup["sigmas"],
            spec=_cine_spec(mode_T="diffusion1d"),
            mask=cine_setup["maskT"])   # missing temporal model


def test_cine_cli_builds_engine():
    from inverseproblemwithdiffusionmodel_tpu.scripts import serve_recon
    args = _parse_serve_args([
        "--workload", "cine", "--ds_name", "CINE64", "--mode_T", "tv",
        "--chains", "2", "--levels", "2", "--frames", str(TF),
        "--num_sens", "2", "--dtype", "f32", "--mode", "steps", "--R", "0",
        "--override", "data.image_size=16", "--override", "model.ngf=8"])
    eng = serve_recon.build_engine(args)
    assert eng.spec.frames == TF and eng.spec.height == 16
    y = np.zeros((2, TF, 16, 16), np.float32)
    res = eng.reconstruct(y, np.zeros_like(y))
    assert np.isfinite(res.mean_mag).all()


# ------------------------------------------------------- seg guidance

@pytest.fixture(scope="module")
def seg_setup():
    from inverseproblemwithdiffusionmodel_tpu.models.unet import UNet
    seg = UNet(out_channels=2, features=(4, 8), strides=(2,), ndim=2)
    seg_params = seg.init(jax.random.PRNGKey(5),
                          jnp.zeros((1, H, W, 1)))["params"]
    label = (np.random.RandomState(6).rand(H, W) > 0.5).astype(np.int32)
    return dict(module=seg, params=seg_params, label=label)


def _seg_engine(setup, seg_setup, **kw):
    return ReconstructionEngine(
        setup["module"], setup["params"], setup["sigmas"], spec=_spec(**kw),
        mask=setup["mask"], sens_re=setup["maps"],
        seg_module=seg_setup["module"], seg_params=seg_setup["params"])


def test_seg_engine_matches_direct_sampler(setup, seg_setup):
    eng = _seg_engine(setup, seg_setup)
    res = eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=7,
                          seg_label=seg_setup["label"], seg_lamda=3.0)

    lin = eng.default_lin_tfm
    prox = PairL2Penalty.with_normal_kernel(lin, num_iters=3)
    yr = jnp.asarray(np.broadcast_to(setup["yr"], (NSENS, CHAINS, H, W, 1)))
    yi = jnp.asarray(np.broadcast_to(setup["yi"], (NSENS, CHAINS, H, W, 1)))
    score_fn = make_score_fn(setup["module"], setup["params"],
                             setup["sigmas"])
    seg_fn = lambda x: seg_setup["module"].apply(
        {"params": seg_setup["params"]}, x)
    label_b = jnp.broadcast_to(jnp.asarray(seg_setup["label"])[None],
                               (CHAINS, H, W))
    xr, xi = ald_inverse_proximal_pair(
        score_fn, setup["sigmas"], (yr, yi), lin, prox,
        jax.random.PRNGKey(7),
        ALDConfig(n_steps_each=NSTEPS, step_lr=1e-5), lr_scaled=2.0,
        seg_fn=seg_fn, seg_label=label_b, seg_lamda=3.0,
        seg_start_time=0.0)
    np.testing.assert_allclose(res.x_re, np.asarray(xr), rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(res.x_im, np.asarray(xi), rtol=2e-5,
                               atol=2e-6)

    # guidance actually biases the chain (vs the unguided engine)
    plain = _engine(setup).reconstruct(setup["yr"][:, 0], setup["yi"][:, 0],
                                       seed=7)
    assert not np.allclose(plain.x_re, res.x_re)


def test_seg_modes_agree_no_retrace(setup, seg_setup):
    e_scan = _seg_engine(setup, seg_setup, mode="scan")
    e_steps = _seg_engine(setup, seg_setup, mode="steps")
    lb = seg_setup["label"]
    r1 = e_scan.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=3,
                            seg_label=lb)
    r2 = e_steps.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=3,
                             seg_label=lb)
    np.testing.assert_allclose(r1.x_re, r2.x_re, rtol=2e-5, atol=2e-6)

    # new label + lamda retune: same executables
    for eng in (e_scan, e_steps):
        eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=4,
                        seg_label=1 - lb, seg_lamda=0.25)
        assert all(n <= 1 for n in eng.stats()["jit_cache_size"])


def test_seg_engine_error_paths(setup, seg_setup):
    plain = _engine(setup)
    with pytest.raises(ValueError, match="without a seg model"):
        plain.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0],
                          seg_label=seg_setup["label"])
    guided = _seg_engine(setup, seg_setup)
    with pytest.raises(ValueError, match="needs seg_label"):
        guided.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0])
    # construction-time default label serves label-less requests
    eng = ReconstructionEngine(
        setup["module"], setup["params"], setup["sigmas"], spec=_spec(),
        mask=setup["mask"], sens_re=setup["maps"],
        seg_module=seg_setup["module"], seg_params=seg_setup["params"],
        seg_label=seg_setup["label"])
    res = eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0])
    assert np.isfinite(res.mean_mag).all()


def test_seg_label_over_the_wire(setup, seg_setup):
    eng = _seg_engine(setup, seg_setup)
    httpd = serve(eng, port=0, background=True)
    try:
        port = httpd.server_address[1]
        buf = io.BytesIO()
        np.savez(buf, y_re=setup["yr"][:, 0], y_im=setup["yi"][:, 0],
                 seg_label=seg_setup["label"])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct?seed=7&seg_lamda=3.0",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            out = np.load(io.BytesIO(r.read()))
        direct = eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0],
                                 seed=7, seg_label=seg_setup["label"],
                                 seg_lamda=3.0)
        np.testing.assert_allclose(out["mean_mag"], direct.mean_mag,
                                   rtol=2e-5, atol=2e-6)
    finally:
        httpd.shutdown()


def _parse_serve_args(argv):
    """Parse with serve_recon's parser without starting the server."""
    import unittest.mock as mock
    from inverseproblemwithdiffusionmodel_tpu.scripts import serve_recon
    captured = {}

    def fake_build(args):
        captured["args"] = args
        raise SystemExit(0)

    with mock.patch.object(serve_recon, "build_engine", fake_build):
        try:
            serve_recon.main(argv)
        except SystemExit:
            pass
    return captured["args"]


# ------------------------------------------------- mesh-sharded serving

def _data_mesh(n):
    from inverseproblemwithdiffusionmodel_tpu.parallel.mesh import make_mesh
    return make_mesh(n_data=n, n_model=1)


@pytest.mark.parametrize("mode", ["scan", "steps"])
def test_mesh_engine_matches_single_device(setup, mode):
    """Chain ensemble sharded over a 4-device data mesh == single-device
    engine. Chains couple only through the CG proximal's scalar dot
    products (operators/pair._pair_dot sums over the batch), whose
    reduction order changes under sharding -> tight allclose, not exact."""
    eng_1 = _engine(setup, mode=mode)
    eng_m = _engine(setup, mode=mode, mesh=_data_mesh(4))   # CHAINS=4
    r1 = eng_1.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=5)
    rm = eng_m.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=5)
    np.testing.assert_allclose(rm.x_re, r1.x_re, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rm.x_im, r1.x_im, rtol=1e-4, atol=1e-5)
    st = eng_m.stats()
    assert st["mesh"] == {"data": 4, "model": 1}
    # sharding must not cost extra executables
    assert all(n <= 1 for n in st["jit_cache_size"])


def test_mesh_engine_no_retrace_on_overrides(setup):
    """Per-request operator overrides on a mesh engine reuse the same
    sharded executable (replication placement happens outside the jit)."""
    eng = _engine(setup, mesh=_data_mesh(2))
    eng.warmup()
    rng = np.random.RandomState(4)
    mask2 = (rng.rand(1, 1, W, 1) < 0.6).astype(np.float32)
    maps2 = rng.rand(NSENS, H, W, 1).astype(np.float32) + 0.1
    maps2 /= np.sqrt((maps2 ** 2).sum(axis=0, keepdims=True))
    eng.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], mask=mask2,
                    sens_re=maps2, lr_scaled=9.0, seed=8)
    assert all(n <= 1 for n in eng.stats()["jit_cache_size"])


def test_mesh_engine_validates(setup):
    with pytest.raises(ValueError, match="multiple of the"):
        _engine(setup, mesh=_data_mesh(3))      # 4 chains % 3 != 0
    from jax.sharding import Mesh
    import numpy as _np
    bad = Mesh(_np.asarray(jax.devices()[:2]).reshape(2), ("rows",))
    with pytest.raises(ValueError, match="data"):
        _engine(setup, mesh=bad)


def test_mesh_seg_engine_matches_single_device(setup, seg_setup):
    """Guidance VJPs partition with the chains (seg label rows shard too)."""
    lb = seg_setup["label"]
    e1 = _seg_engine(setup, seg_setup)
    em = ReconstructionEngine(
        setup["module"], setup["params"], setup["sigmas"], spec=_spec(),
        mask=setup["mask"], sens_re=setup["maps"],
        seg_module=seg_setup["module"], seg_params=seg_setup["params"],
        mesh=_data_mesh(4))
    r1 = e1.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=3,
                        seg_label=lb, seg_lamda=2.0)
    rm = em.reconstruct(setup["yr"][:, 0], setup["yi"][:, 0], seed=3,
                        seg_label=lb, seg_lamda=2.0)
    np.testing.assert_allclose(rm.x_re, r1.x_re, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["scan", "steps"])
def test_cine_mesh_matches_single_device(setup, cine_setup, mode):
    """2D+time: the B*T chain-by-frame axis shards on chain boundaries."""
    y = cine_setup["y"]
    e1 = _cine_engine(setup, cine_setup, mode=mode)
    em = _cine_engine(setup, cine_setup, mode=mode, mesh=_data_mesh(2))
    r1 = e1.reconstruct(y, np.zeros_like(y), seed=6)
    rm = em.reconstruct(y, np.zeros_like(y), seed=6)
    np.testing.assert_allclose(rm.x_re, r1.x_re, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rm.x_im, r1.x_im, rtol=1e-4, atol=1e-5)
    assert all(n <= 1 for n in em.stats()["jit_cache_size"])


def test_serve_cli_data_shards_flag():
    args = _parse_serve_args(["--data_shards", "2", "--chains", "4"])
    assert args.data_shards == 2
    from inverseproblemwithdiffusionmodel_tpu.scripts.serve_recon import (
        _serving_mesh)
    mesh = _serving_mesh(args)
    assert mesh.shape["data"] == 2
    args.chains = 3
    with pytest.raises(SystemExit):
        _serving_mesh(args)
    args.data_shards = 1
    assert _serving_mesh(args) is None
