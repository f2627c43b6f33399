"""Training infra: sharded train steps, EMA state, checkpointing, fit loop."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.config import Config
from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
from inverseproblemwithdiffusionmodel_tpu.models.unet import UNet
from inverseproblemwithdiffusionmodel_tpu.models.classifier import ResNetClf
from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import get_sigmas
from inverseproblemwithdiffusionmodel_tpu.parallel import (
    make_mesh, shard_batch, replicate)
from inverseproblemwithdiffusionmodel_tpu.training import (
    TrainState, get_optimizer, make_score_train_step, make_clf_train_step,
    make_seg_train_step, make_score_eval_step, Checkpointer, FitConfig, fit,
    batch_iterator)


def tiny_config(image_size=16, ngf=8, channels=1):
    return Config({
        "data": {"channels": channels, "image_size": image_size,
                 "logit_transform": False, "rescaled": False},
        "model": {"ngf": ngf, "nonlinearity": "elu",
                  "normalization": "InstanceNorm++", "sigma_begin": 10.0,
                  "sigma_end": 0.01, "num_classes": 8,
                  "sigma_dist": "geometric"},
        "training": {"anneal_power": 2.0},
        "optim": {"optimizer": "Adam", "lr": 1e-3, "beta1": 0.9,
                  "eps": 1e-8, "weight_decay": 0.0, "grad_clip": 1.0},
    })


@pytest.fixture(scope="module")
def score_setup():
    config = tiny_config()
    module = NCSNv2(config=config)
    sigmas = get_sigmas(config)
    x = jnp.zeros((4, 16, 16, 1))
    params = module.init(jax.random.PRNGKey(0), x, jnp.ones((4,)))["params"]
    return config, module, sigmas, params


def test_score_train_step_decreases_loss(score_setup):
    config, module, sigmas, params = score_setup
    state = TrainState.create(params, get_optimizer(config), ema_decay=0.99)
    step = make_score_train_step(module, sigmas, data_mode="real-valued")
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(5):
        state, loss = step(state, batch, jax.random.fold_in(key, 0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch+key: loss must drop
    assert int(state.step) == 5


def test_ema_tracks_params(score_setup):
    config, module, sigmas, params = score_setup
    state = TrainState.create(params, get_optimizer(config), ema_decay=0.5)
    step = make_score_train_step(module, sigmas)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    state2, _ = step(state, batch, jax.random.PRNGKey(3))
    # ema must move strictly between old ema and new params
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    leaf_new = jax.tree_util.tree_leaves(state2.params)[0]
    leaf_ema = jax.tree_util.tree_leaves(state2.ema.params)[0]
    expected = 0.5 * leaf + 0.5 * leaf_new
    np.testing.assert_allclose(leaf_ema, expected, rtol=1e-5, atol=1e-6)


def test_score_train_step_real_imag_mode(score_setup):
    config, module, sigmas, params = score_setup
    state = TrainState.create(params, get_optimizer(config))
    step = make_score_train_step(module, sigmas, data_mode="real-imag")
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    state, loss = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_sharded_train_step_matches_single_device(score_setup):
    """DP over the 8-device mesh must give the same loss/params as 1 device."""
    config, module, sigmas, params = score_setup
    mesh = make_mesh()
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1))
    key = jax.random.PRNGKey(2)

    state_a = TrainState.create(params, get_optimizer(config))
    step_plain = make_score_train_step(module, sigmas)
    state_a, loss_a = step_plain(state_a, batch, key)

    # copy params: the mesh step donates its input state, and device_put of
    # an already-replicated array can alias the fixture's buffers
    params_copy = jax.tree_util.tree_map(jnp.copy, params)
    state_b = TrainState.create(params_copy, get_optimizer(config))
    step_mesh = make_score_train_step(module, sigmas, mesh=mesh)
    state_b, loss_b = step_mesh(replicate(state_b, mesh),
                                shard_batch(batch, mesh),
                                replicate(key, mesh))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)[0]
    lb = jax.tree_util.tree_leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-4, atol=1e-6)


def test_clf_and_seg_steps():
    config = tiny_config()
    sigmas = get_sigmas(config)
    X = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 1))

    clf = ResNetClf(config=Config({"Clf": {"in_channels": 1, "num_cls": 10}}))
    cparams = clf.init(jax.random.PRNGKey(1), X)["params"]
    cstate = TrainState.create(cparams, get_optimizer(config))
    cstep = make_clf_train_step(clf, sigmas)
    y = jnp.arange(4) % 10
    cstate, closs = cstep(cstate, (X, y), jax.random.PRNGKey(2))
    assert np.isfinite(float(closs))

    seg = UNet(out_channels=2, features=(8, 16), strides=(2,), ndim=2)
    sparams = seg.init(jax.random.PRNGKey(3), X)["params"]
    sstate = TrainState.create(sparams, get_optimizer(config))
    sstep = make_seg_train_step(seg, sigmas)
    mask = (jax.random.uniform(jax.random.PRNGKey(4), (4, 16, 16)) > 0.5
            ).astype(jnp.int32)
    sstate, sloss = sstep(sstate, (X, mask), jax.random.PRNGKey(5))
    assert np.isfinite(float(sloss))


def test_checkpoint_roundtrip(tmp_path, score_setup):
    config, module, sigmas, params = score_setup
    state = TrainState.create(params, get_optimizer(config), ema_decay=0.9)
    step = make_score_train_step(module, sigmas)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    state, _ = step(state, batch, jax.random.PRNGKey(2))

    ckpt = Checkpointer(str(tmp_path / "ckpts"), track_best=True)
    ckpt.save(int(state.step), state, val_loss=1.23)
    restored = ckpt.restore(state)
    ckpt.close()
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    e0 = jax.tree_util.tree_leaves(state.ema.params)[0]
    e1 = jax.tree_util.tree_leaves(restored.ema.params)[0]
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_fit_loop_runs(tmp_path, score_setup):
    config, module, sigmas, params = score_setup
    state = TrainState.create(params, get_optimizer(config))
    step = make_score_train_step(module, sigmas)
    eval_step = make_score_eval_step(module, sigmas)
    data = np.random.RandomState(0).rand(8, 16, 16, 1).astype(np.float32)
    it = batch_iterator(data, 4, seed=0)
    cfg = FitConfig(n_epochs=2, log_every=1, log_dir=str(tmp_path / "run"))
    hook_calls = []
    state = fit(state, step, it, cfg, eval_step=eval_step, val_iter_fn=it,
                epoch_end_hook=lambda s, e: hook_calls.append(e))
    assert int(state.step) == 4
    assert hook_calls == [0, 1]
    assert os.path.exists(os.path.join(cfg.log_dir, "metrics.jsonl"))


def test_continuous_score_train_step(score_setup):
    from inverseproblemwithdiffusionmodel_tpu.sde import VESDE
    from inverseproblemwithdiffusionmodel_tpu.training import (
        make_continuous_score_train_step)
    config, module, sigmas, params = score_setup
    # NCSNv2 consumes sigma values, matching VE's continuous conditioning
    sde = VESDE(N=8, sigma_min=0.01, sigma_max=10.0)
    params_copy = jax.tree_util.tree_map(jnp.copy, params)
    state = TrainState.create(params_copy, get_optimizer(config))
    step = make_continuous_score_train_step(module, sde)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    losses = []
    for _ in range(4):
        state, loss = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ald_visualization_hook(tmp_path, score_setup):
    from inverseproblemwithdiffusionmodel_tpu.training import (
        make_ald_visualization_hook)
    config, module, sigmas, params = score_setup
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), get_optimizer(config))
    hook = make_ald_visualization_hook(module, sigmas, (2, 16, 16, 1),
                                       str(tmp_path), step_lr=1e-5)
    hook(state, 0)
    assert (tmp_path / "samples_epoch0000.png").exists()


def test_fit_resumes_from_checkpoint(tmp_path, score_setup):
    """Elastic restart: a second fit() continues from the saved step."""
    config, module, sigmas, params = score_setup
    data = np.random.RandomState(0).rand(8, 16, 16, 1).astype(np.float32)
    it = batch_iterator(data, 4, seed=0)
    cfg = FitConfig(n_epochs=1, log_every=1, log_dir=str(tmp_path / "run"))

    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), get_optimizer(config))
    step = make_score_train_step(module, sigmas)
    state = fit(state, step, it, cfg)
    assert int(state.step) == 2

    # fresh state, same log dir -> resumes at step 2, ends at 4
    fresh = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), get_optimizer(config))
    resumed = fit(fresh, step, it, cfg)
    assert int(resumed.step) == 4


def test_filtered_1d_training_weights_background():
    """TV-filtered DSM: constant (background) tubes contribute no loss."""
    from inverseproblemwithdiffusionmodel_tpu.losses.dsm import (
        anneal_dsm_score_estimation)
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import filter_batch
    sigmas = jnp.asarray([1.0, 0.1])
    batch = jnp.concatenate([
        jnp.sin(jnp.arange(8.0))[None, :, None] *
        jnp.ones((2, 8, 4)),                                # dynamic
        jnp.ones((2, 8, 4)) * 0.5,                          # flat background
    ])
    w = filter_batch(batch, th=0.05)
    # dynamic rows kept; flat rows dropped (rows 0-1 forced kept anyway)
    assert w.shape == (4,)
    assert float(w[0]) == 1.0 and float(w[1]) == 1.0
    assert float(w[2]) == 0.0 and float(w[3]) == 0.0
    score = lambda x, labels: -x
    l_w = anneal_dsm_score_estimation(score, batch, sigmas,
                                      jax.random.PRNGKey(0), sample_weight=w)
    l_u = anneal_dsm_score_estimation(score, batch, sigmas,
                                      jax.random.PRNGKey(0))
    assert np.isfinite(float(l_w)) and float(l_w) != float(l_u)


def test_remat_train_step_matches_plain(score_setup):
    config, module, sigmas, params = score_setup
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 1))
    key = jax.random.PRNGKey(2)
    s1 = TrainState.create(jax.tree_util.tree_map(jnp.copy, params),
                           get_optimizer(config))
    s2 = TrainState.create(jax.tree_util.tree_map(jnp.copy, params),
                           get_optimizer(config))
    step_plain = make_score_train_step(module, sigmas)
    step_remat = make_score_train_step(module, sigmas, remat=True)
    s1, l1 = step_plain(s1, batch, key)
    s2, l2 = step_remat(s2, batch, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-7)


def test_bf16_mixed_precision_train_step():
    """compute_dtype=bf16 trains: finite loss near the f32 step's, params
    move, and master params / opt state stay f32."""
    import optax
    from inverseproblemwithdiffusionmodel_tpu.training import (
        TrainState, make_score_train_step)
    from inverseproblemwithdiffusionmodel_tpu.models.ncsnv2 import NCSNv2
    from inverseproblemwithdiffusionmodel_tpu.config import Config

    cfg = Config({"data": {"channels": 1, "image_size": 16,
                           "logit_transform": False, "rescaled": False},
                  "model": {"ngf": 8, "nonlinearity": "elu",
                            "normalization": "InstanceNorm++",
                            "sigma_begin": 5.0, "sigma_end": 0.1,
                            "num_classes": 4, "sigma_dist": "geometric"}})
    module = NCSNv2(config=cfg)
    x0 = jnp.zeros((4, 16, 16, 1))
    params = module.init(jax.random.PRNGKey(0), x0, jnp.ones((4,)))["params"]
    sigmas = jnp.array([5.0, 2.0, 0.5, 0.1])
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1))

    losses = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        state = TrainState.create(params, optax.adam(1e-3), ema_decay=None)
        step = make_score_train_step(module, sigmas, data_mode="real-imag",
                                     compute_dtype=dt)
        state2, loss = step(state, batch, jax.random.PRNGKey(2))
        losses[name] = float(loss)
        assert np.isfinite(losses[name])
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()) > 0,
            state.params, state2.params)
        assert any(jax.tree_util.tree_leaves(moved))
        assert all(p.dtype == jnp.float32
                   for p in jax.tree_util.tree_leaves(state2.params))
    # same batch, same key: bf16 loss within a few percent of f32
    assert abs(losses["bf16"] - losses["f32"]) / losses["f32"] < 0.05


def test_bf16_clf_seg_continuous_steps():
    """compute_dtype=bf16 on the clf / seg / continuous steps: finite losses,
    params move, master params stay f32."""
    import optax
    from inverseproblemwithdiffusionmodel_tpu.training import (
        TrainState, make_clf_train_step, make_seg_train_step,
        make_continuous_score_train_step)
    from inverseproblemwithdiffusionmodel_tpu.models.classifier import ResNetClf
    from inverseproblemwithdiffusionmodel_tpu.models.unet import UNet
    from inverseproblemwithdiffusionmodel_tpu.models.simple import ScoreNet
    from inverseproblemwithdiffusionmodel_tpu.sde import VESDE

    key = jax.random.PRNGKey(0)
    sigmas = jnp.array([2.0, 0.5])

    from inverseproblemwithdiffusionmodel_tpu.config import Config
    clf = ResNetClf(config=Config({"Clf": {"in_channels": 1, "num_cls": 3}}))
    X = jax.random.uniform(key, (2, 16, 16, 1))
    p = clf.init(key, X)["params"]
    st = TrainState.create(p, optax.adam(1e-3), ema_decay=None)
    step = make_clf_train_step(clf, sigmas, compute_dtype=jnp.bfloat16)
    st2, loss = step(st, (X, jnp.array([0, 2])), key)
    assert np.isfinite(float(loss))
    assert all(q.dtype == jnp.float32
               for q in jax.tree_util.tree_leaves(st2.params))

    seg = UNet(out_channels=2, features=(8, 16), strides=(2,))
    y = (X[..., 0] > 0.5).astype(jnp.int32)
    p = seg.init(key, X)["params"]
    st = TrainState.create(p, optax.adam(1e-3), ema_decay=None)
    step = make_seg_train_step(seg, sigmas, compute_dtype=jnp.bfloat16)
    st2, loss = step(st, (X, y), key)
    assert np.isfinite(float(loss))

    sde = VESDE()
    net = ScoreNet(marginal_prob_std=lambda t: sde.marginal_prob(
        jnp.zeros(()), t)[1], channels=(8, 16, 16, 16), embed_dim=16)
    p = net.init(key, X, jnp.ones((2,)))["params"]
    st = TrainState.create(p, optax.adam(1e-3), ema_decay=None)
    step = make_continuous_score_train_step(net, sde,
                                            compute_dtype=jnp.bfloat16)
    st2, loss = step(st, X, key)
    assert np.isfinite(float(loss))


def test_grad_accum_multisteps_state():
    """optax.MultiSteps under TrainState: params change only every N
    micro-steps and the accumulated update matches the mean-gradient step."""
    import optax
    from inverseproblemwithdiffusionmodel_tpu.training import TrainState

    params = {"w": jnp.ones((3,))}
    grads = [{"w": jnp.array([1.0, 0.0, 2.0])},
             {"w": jnp.array([3.0, 2.0, 0.0])}]
    tx = optax.MultiSteps(optax.sgd(0.1), every_k_schedule=2)
    st = TrainState.create(params, tx, ema_decay=None)
    st = st.apply_gradients(grads[0])
    np.testing.assert_allclose(np.asarray(st.params["w"]), 1.0)  # no update yet
    st = st.apply_gradients(grads[1])
    want = 1.0 - 0.1 * np.array([2.0, 1.0, 1.0])  # mean grad step
    np.testing.assert_allclose(np.asarray(st.params["w"]), want, rtol=1e-6)


def test_restore_params_structure_agnostic(tmp_path):
    """Checkpoints written without EMA (clf/seg trainers) or with a
    MultiSteps-wrapped optimizer restore via restore_params — the full
    TrainState-template path raises a tree-structure mismatch for both."""
    import optax
    from inverseproblemwithdiffusionmodel_tpu.training import (
        TrainState, Checkpointer)

    params = {"w": jnp.arange(4.0)}
    # no EMA
    st = TrainState.create(params, optax.adam(1e-3), ema_decay=None)
    ck = Checkpointer(str(tmp_path / "a"), track_best=False)
    ck.save(3, st)
    loaded, step = ck.restore_params(use_ema=True)   # falls back to raw
    ck.close()
    assert step == int(st.step)  # the state's own step counter
    np.testing.assert_allclose(np.asarray(loaded["w"]), np.arange(4.0))

    # MultiSteps optimizer + EMA
    tx = optax.MultiSteps(optax.adam(1e-3), every_k_schedule=2)
    st = TrainState.create(params, tx, ema_decay=0.9)
    ck = Checkpointer(str(tmp_path / "b"), track_best=False)
    ck.save(7, st)
    loaded, step = ck.restore_params(use_ema=True)
    ck.close()
    assert step == int(st.step)
    np.testing.assert_allclose(np.asarray(loaded["w"]), np.arange(4.0))


def test_weight_decay_skips_frozen_fourier_projection():
    """L2 weight decay must not shrink the frozen GaussianFourierProjection
    matrix (requires_grad=False in the reference): with zero gradients the
    frozen W stays put while ordinary params decay."""
    import optax
    from inverseproblemwithdiffusionmodel_tpu.training.state import (
        get_optimizer)
    config = tiny_config()
    config = config.replace(**{"optim.weight_decay": 0.1,
                               "optim.grad_clip": 0.0})
    params = {"GaussianFourierProjection_0": {"W": jnp.ones((4,))},
              "Dense_0": {"kernel": jnp.ones((2, 2))}}
    tx = get_optimizer(config)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(new["GaussianFourierProjection_0"]["W"]), 1.0)
    assert float(jnp.max(jnp.abs(new["Dense_0"]["kernel"] - 1.0))) > 1e-6


def test_continuous_step_applies_dropout():
    """The continuous train step runs the net in TRAIN mode: nn.Dropout is
    live (the torch reference trains with dropout on). With identical
    params and key, a dropout-0.9 module must produce a different loss than
    a dropout-0 module; eval-mode apply (the sampling path) is unaffected."""
    from inverseproblemwithdiffusionmodel_tpu.configs_continuous import (
        get_continuous_config)
    from inverseproblemwithdiffusionmodel_tpu.models.ncsnpp import NCSNpp
    from inverseproblemwithdiffusionmodel_tpu.sde import VESDE
    from inverseproblemwithdiffusionmodel_tpu.training import (
        make_continuous_score_train_step)
    small = {"data.image_size": 16, "model.nf": 16,
             "model.num_res_blocks": 1, "model.ch_mult": (1, 2),
             "model.attn_resolutions": (8,)}
    # init_scale=0 zero-initializes each block's final conv (reference
    # convention), which silences dropout at init — use a real scale so the
    # dropout mask reaches the loss
    cfg0 = get_continuous_config("ve/cifar10_ncsnpp_continuous").replace(
        **small, **{"model.dropout": 0.0, "model.init_scale": 1.0})
    cfg9 = cfg0.replace(**{"model.dropout": 0.9})
    m0, m9 = NCSNpp(config=cfg0), NCSNpp(config=cfg9)
    x = jnp.zeros((2, 16, 16, 3))
    cond = jnp.array([5.0, 1.0])
    params = m0.init(jax.random.PRNGKey(0), x, cond)["params"]
    sde = VESDE(N=8, sigma_min=0.01, sigma_max=10.0)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    losses = {}
    for name, m in (("p0", m0), ("p9", m9)):
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params),
            get_optimizer(tiny_config()))
        step = make_continuous_score_train_step(m, sde)
        _, loss = step(state, batch, jax.random.PRNGKey(2))
        losses[name] = float(loss)
    assert np.isfinite(list(losses.values())).all()
    assert abs(losses["p0"] - losses["p9"]) > 1e-6, losses


def test_continuous_dsm_reduce_mean_false_is_sigma2_weighted():
    """reduce_mean=False is score_sde's 0.5*sum((score*std + z)^2): with a
    zero score the loss is 0.5*D per sample regardless of the noise level
    (the sigma^2 weighting). The un-weighted integrand would blow up at
    small std."""
    from inverseproblemwithdiffusionmodel_tpu.losses.dsm import (
        continuous_dsm_loss)
    from inverseproblemwithdiffusionmodel_tpu.sde import VESDE
    sde = VESDE(N=8, sigma_min=0.01, sigma_max=50.0)
    x = jnp.zeros((32, 8, 8, 1))
    D = 8 * 8
    loss = float(continuous_dsm_loss(lambda x, t: jnp.zeros_like(x), sde, x,
                                     jax.random.PRNGKey(0),
                                     reduce_mean=False))
    assert 0.3 * D < loss < 0.8 * D, loss


def test_fit_resume_fresh_rng_and_partial_epoch_counter(tmp_path):
    """A resumed fit() must not replay the crashed run's PRNG stream, and a
    max_steps stop mid-first-epoch must not inflate the rebased epoch
    counter."""
    import optax
    from inverseproblemwithdiffusionmodel_tpu.training import (
        fit, FitConfig, batch_iterator)
    data = np.random.RandomState(0).rand(4, 2).astype(np.float32)
    params = {"w": jnp.zeros((2,))}

    keys_seen = []

    def train_step(state, batch, key):
        keys_seen.append(np.asarray(key))
        return state.replace(step=state.step + 1), jnp.float32(0.0)

    log_dir = str(tmp_path / "run")
    cfg = FitConfig(n_epochs=2, seed=7, log_dir=log_dir,
                    ckpt_every_epochs=1)
    it = batch_iterator(data, 2, shuffle=False)
    state = TrainState.create(params, optax.sgd(1e-3))
    state = fit(state, train_step, it, cfg)
    assert int(state.step) == 4  # 2 epochs x 2 batches
    first_run_keys = [k.tolist() for k in keys_seen]

    # resume: 1 more batch then stop mid-epoch (max_steps=5)
    keys_seen.clear()
    epochs_seen = []
    cfg2 = FitConfig(n_epochs=50, seed=7, log_dir=log_dir, max_steps=5,
                     ckpt_every_epochs=1)
    state2 = TrainState.create(params, optax.sgd(1e-3))
    state2 = fit(state2, train_step, it, cfg2,
                 epoch_end_hook=lambda s, e: epochs_seen.append(e))
    assert int(state2.step) == 5
    # fresh randomness: the resumed first key differs from the original
    assert keys_seen[0].tolist() != first_run_keys[0]
    # partial first epoch (1 batch) must not rebase epoch to 4//1 = 4
    assert epochs_seen and epochs_seen[0] < 2, epochs_seen


def test_score_train_step_centering_matches_manual(score_setup):
    """if_centering=True == centering the batch by hand with the flag off
    (the reference's TrainScoreModelDiscrete 2X-1 shift before collation)."""
    config, module, sigmas, params = score_setup
    batch = jax.random.uniform(jax.random.PRNGKey(5), (4, 16, 16, 1))
    key = jax.random.PRNGKey(6)
    st = lambda: TrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), get_optimizer(config))
    s_on = make_score_train_step(module, sigmas, if_centering=True)
    s_off = make_score_train_step(module, sigmas)
    _, loss_on = s_on(st(), batch, key)
    _, loss_manual = s_off(st(), 2.0 * batch - 1.0, key)
    _, loss_off = s_off(st(), batch, key)
    np.testing.assert_allclose(float(loss_on), float(loss_manual), rtol=1e-6)
    assert abs(float(loss_on) - float(loss_off)) > 1e-6
