"""Round-2 additions: regularizers surface, TB export, data provenance,
serving-CLI mesh validation."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------------------
# regularizers (reference: ncsn/regularizers/__init__.py:4-15)
# ---------------------------------------------------------------------------

def test_zero_reg_and_abstract():
    from inverseproblemwithdiffusionmodel_tpu.regularizers import (
        AbstractRegularizer, ZeroReg)
    with pytest.raises(TypeError):
        AbstractRegularizer()
    zr = ZeroReg()
    assert zr() == 0.0
    assert float(zr.pair(jnp.ones((2, 3)), jnp.ones((2, 3)))) == 0.0


def test_tv_regularizer_matches_free_function(rng):
    from inverseproblemwithdiffusionmodel_tpu.regularizers import TVRegularizer
    from inverseproblemwithdiffusionmodel_tpu.samplers.map_opt import (
        tv_norm_noncircular_pair)
    re = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))
    im = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))
    reg = TVRegularizer(weight=2.5)
    want = 2.5 * tv_norm_noncircular_pair(re, im, (1, 2))
    np.testing.assert_allclose(float(reg.pair(re, im)), float(want),
                               rtol=1e-6)
    # complex entry point routes through the same math
    np.testing.assert_allclose(float(reg(re + 1j * im)), float(want),
                               rtol=1e-6)


def test_tv_reconstruction_accepts_custom_regularizer(rng):
    from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
        RandomUndersamplingFourier)
    from inverseproblemwithdiffusionmodel_tpu.regularizers import ZeroReg
    from inverseproblemwithdiffusionmodel_tpu.samplers.map_opt import (
        MAPConfig, tv_reconstruction)
    mask = jnp.asarray((rng.rand(1, 1, 8, 1) < 0.6).astype(np.float32))
    lin = RandomUndersamplingFourier(mask=mask)
    x = jnp.asarray(rng.rand(1, 8, 8, 1).astype(np.complex64))
    y = lin(x)
    cfg = MAPConfig(n_iters=5, lr=1e-2)
    x_tv = tv_reconstruction(y, lin, reg_weight=1.0, config=cfg)
    x_zero = tv_reconstruction(y, lin, reg_weight=1.0, config=cfg,
                               regularizer=ZeroReg())
    assert x_tv.shape == x.shape
    # different penalties must produce different iterates
    assert not np.allclose(np.asarray(x_tv), np.asarray(x_zero))


# ---------------------------------------------------------------------------
# TensorBoard export (reference logging: helpers/pl_helpers.py:361)
# ---------------------------------------------------------------------------

def _tb_available():
    try:
        import torch.utils.tensorboard  # noqa: F401
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _tb_available(), reason="tensorboard unavailable")
def test_jsonl_to_events_roundtrip(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.utils.tb_export import (
        jsonl_to_events)
    jl = tmp_path / "metrics.jsonl"
    with open(jl, "w") as f:
        for i in range(3):
            f.write(json.dumps({"ts": 100.0 + i, "step": i * 50,
                                "train_loss": 1.0 / (i + 1)}) + "\n")
    out = jsonl_to_events(str(jl))
    events = [p for p in os.listdir(out) if "tfevents" in p]
    assert events, f"no event files written in {out}"
    # read the scalars back through the TB event reader
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(out)
    acc.Reload()
    scalars = acc.Scalars("train_loss")
    assert [s.step for s in scalars] == [0, 50, 100]
    np.testing.assert_allclose([s.value for s in scalars],
                               [1.0, 0.5, 1.0 / 3], rtol=1e-6)


@pytest.mark.skipif(not _tb_available(), reason="tensorboard unavailable")
def test_metrics_logger_tb_mirror(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.training.loop import (
        MetricsLogger)
    lg = MetricsLogger(str(tmp_path), tensorboard=True)
    lg.log(10, train_loss=0.25)
    lg.close()
    tb_dir = tmp_path / "tb"
    assert any("tfevents" in p for p in os.listdir(tb_dir))
    # jsonl is still the primary stream
    rec = json.loads(open(lg.path).read().strip().splitlines()[-1])
    assert rec["step"] == 10 and rec["train_loss"] == 0.25


# ---------------------------------------------------------------------------
# data provenance in run artifacts (VERDICT weak #6)
# ---------------------------------------------------------------------------

def test_provenance_recorded_in_args_json(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.data.datasets import (
        data_provenance, load_data)
    from inverseproblemwithdiffusionmodel_tpu.scripts._common import (
        save_artifacts)
    load_data("SanityCheck1D", mode="val")
    prov = data_provenance()
    assert prov["SanityCheck1D/val"]["source"] == "synthetic"
    assert prov["SanityCheck1D/val"]["num_items"] == 300

    run_dir = save_artifacts(str(tmp_path), args={"seed": 0},
                             original=np.zeros((1, 4, 4)))
    saved = json.load(open(os.path.join(run_dir, "args.json")))
    assert saved["data_provenance"]["SanityCheck1D/val"]["source"] \
        == "synthetic"


def test_real_data_marks_real(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.data.datasets import (
        data_provenance, load_data)
    # a real on-disk image folder => provenance flips to "real"
    from PIL import Image
    for i in range(12):
        Image.fromarray(
            (np.random.RandomState(i).rand(8, 8, 3) * 255).astype("uint8")
        ).save(tmp_path / f"img_{i}.png")
    load_data("CELEBA", mode="train", root_dir=str(tmp_path), size=8)
    assert data_provenance()["CELEBA/train"]["source"] == "real"


# ---------------------------------------------------------------------------
# enriched cine phantom: temporal dynamics TV cannot model
# ---------------------------------------------------------------------------

def test_synthetic_cine_has_fast_temporal_dynamics():
    """The learned-temporal-prior-vs-TV ordering (reference README.md:85
    table: ALD full best) hinges on the phantom having temporal content a
    piecewise-constant prior cannot represent: through-plane flicker at
    4-8 cycles/loop and a non-periodic contrast bolus. Guard the spectral
    signature so a phantom simplification doesn't silently collapse the
    cine benchmark back into TV's prior class."""
    from inverseproblemwithdiffusionmodel_tpu.data.datasets import (
        synthetic_cine)
    v = synthetic_cine(4, 24, 64, 64, seed=0)
    assert v.shape == (4, 24, 64, 64)
    assert 0.0 <= v.min() and v.max() <= 1.0
    F = np.fft.rfft(v, axis=1)
    ac = (np.abs(F[:, 1:]) ** 2).sum()
    hi = (np.abs(F[:, 4:]) ** 2).sum()   # >3 cycles/loop
    assert hi / ac > 0.06, (
        f"fast temporal energy fraction {hi / ac:.3f} too low — flicker "
        f"component missing?")
    # non-periodicity: first and last frames of the bolus-affected pool
    # differ (a pure loop-periodic phantom would close the loop exactly)
    assert np.abs(v[:, 0] - v[:, -1]).mean() > 1e-3


# ---------------------------------------------------------------------------
# host-stepped MAP pair (axon-large-program fallback, samplers/map_pair.py)
# ---------------------------------------------------------------------------

def test_stepped_map_pair_matches_scanned(rng):
    """One jitted Adam iteration looped on the host == the whole-run scan
    (map_optimizer_pair), step for step. Few iterations and a
    significant-gradient comparison: at pixels where |g| ~ eps, Adam's
    g/(|g|+eps) normalization amplifies machine-epsilon fusion differences
    to the full step size (not a semantic difference). An f64 run pins the
    two implementations to 7e-11 after one iteration; in f32 the drift
    grows ~x3.8/iteration through Adam, hence few iters + loose atol."""
    import jax
    from inverseproblemwithdiffusionmodel_tpu.operators.fourier import (
        make_sense)
    from inverseproblemwithdiffusionmodel_tpu.operators.pair import PairSENSE
    from inverseproblemwithdiffusionmodel_tpu.samplers.map_opt import (
        MAPConfig)
    from inverseproblemwithdiffusionmodel_tpu.samplers.map_pair import (
        _data_grad_pair, make_stepped_map_pair_optimizer,
        map_optimizer_pair)
    from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import (
        sigma_ladder)
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import stack_parts

    H = W = 16
    sigmas = sigma_ladder(5.0, 0.05, 10, "geometric")
    tgt_re = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32))
    tgt_im = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32))
    op = make_sense("exp", 2, 8, 0.1, (H, W, 1), seed=3, num_frames=1)
    pair_op = PairSENSE.from_complex(op)
    yr, yi = pair_op(tgt_re, tgt_im)

    def analytic_score(x, labels):
        s = sigmas[labels].reshape(-1, 1, 1, 1)
        return (stack_parts(tgt_re, tgt_im) - x) / s ** 2

    class AnalyticModule:
        @staticmethod
        def apply(variables, x, cond):
            return (stack_parts(tgt_re, tgt_im) - x) \
                / cond.reshape(-1, 1, 1, 1) ** 2

    cfg = MAPConfig(n_iters=3, lr=5e-2)
    stepped = make_stepped_map_pair_optimizer(AnalyticModule(), sigmas,
                                              pair_op, config=cfg)
    xr1, xi1 = stepped({}, yr, yi, 1.0)
    xr2, xi2 = map_optimizer_pair(analytic_score, (yr, yi), pair_op, 1.0,
                                  config=cfg)
    x0r, x0i = pair_op.conj_op(yr, yi)
    gr, _ = _data_grad_pair(pair_op, x0r, x0i, yr, yi)
    g = np.abs(np.asarray(gr + (tgt_re - x0r) / sigmas[1] ** 2))
    sig_px = g > 1e-4
    assert sig_px.sum() > 50
    np.testing.assert_allclose(np.asarray(xr1)[sig_px],
                               np.asarray(xr2)[sig_px],
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# serve_recon --data_shards validation (ADVICE #3)
# ---------------------------------------------------------------------------

def test_serving_mesh_rejects_oversubscription():
    import argparse
    import jax
    from inverseproblemwithdiffusionmodel_tpu.scripts.serve_recon import (
        _serving_mesh)
    n = len(jax.devices())
    args = argparse.Namespace(data_shards=n * 2, chains=n * 4)
    with pytest.raises(SystemExit):
        _serving_mesh(args)
