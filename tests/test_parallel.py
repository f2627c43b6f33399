"""Mesh / sharding / ensemble utilities on the 8-device virtual CPU mesh."""
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverseproblemwithdiffusionmodel_tpu.parallel import (
    make_mesh, data_sharding, shard_batch, replicate, pad_to_multiple,
    repeat_measurement, ensemble_keys, run_sharded_ensemble,
    ensemble_mean_std)


def assert_collective_census(hlo: str) -> None:
    """The scaling-design invariant (SURVEY 2.7, examples/chain_scaling.py):
    a chain-sharded hot loop may contain NO tensor collectives — chains are
    independent — and every all-reduce site must be scalar-shaped (the CG
    proximal's dot products). A full-tensor all-reduce is the likely GSPMD
    fallback if e.g. the tube reshape reshards, and would silently break
    the linear-ICI-scaling projection the README cites."""
    for op in ("all-to-all", "all-gather", "collective-permute",
               "reduce-scatter"):
        assert op not in hlo, f"unexpected tensor collective {op}"
    # result shape precedes the op name: `%x = f32[] all-reduce(...)`
    # (or a tuple of scalars). Any digit inside [] means a tensor.
    # Anchor to DEFINING sites (`= <shape> all-reduce(`): operand
    # references like `fusion(%param, %all-reduce.1)` must not match,
    # or a fused tensor consumer of a scalar all-reduce trips the assert.
    for shape in re.findall(r"=\s*(\(?[^=\n]*?)\s*all-reduce(?:-start)?\(",
                            hlo):
        assert not re.search(r"\[\s*\d", shape), \
            f"non-scalar all-reduce in sharded hot loop: {shape}"


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (len(jax.devices()), 1)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(n_data=64, n_model=64)


def test_shard_and_replicate_placement():
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(8, 2)
    xs = shard_batch(x, mesh)
    assert xs.sharding.is_equivalent_to(data_sharding(mesh), 2)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))
    xr = replicate(x, mesh)
    assert xr.sharding.is_fully_replicated


def test_pad_to_multiple():
    x = np.arange(10.0).reshape(5, 2)
    padded, n = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and n == 5
    padded2, n2 = pad_to_multiple(x, 5)
    assert padded2.shape == (5, 2) and n2 == 5


def test_ensemble_keys_distinct():
    keys = ensemble_keys(jax.random.PRNGKey(0), 8)
    assert keys.shape[0] == 8
    assert len({tuple(np.asarray(k)) for k in keys}) == 8


def test_run_sharded_ensemble_chains_independent():
    """Each chain must see its own fold of the key and its own batch row."""
    mesh = make_mesh()
    measurement = jnp.ones((1, 4, 4)) * 2.0

    @jax.jit
    def sampler(y, key):
        keys = ensemble_keys(key, y.shape[0])
        noise = jax.vmap(lambda k, row: jax.random.normal(k, row.shape))(
            keys, y)
        return y + 0.01 * noise

    out = run_sharded_ensemble(sampler, measurement, 8,
                               jax.random.PRNGKey(0), mesh=mesh)
    assert out.shape == (8, 4, 4)
    # chains differ (independent noise) but share the measurement
    assert float(jnp.std(out, axis=0).max()) > 0
    mean, std = ensemble_mean_std(out)
    assert mean.shape == (4, 4) and std.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(mean), 2.0, atol=0.1)


def test_repeat_measurement_nonzero_axis():
    m = jnp.ones((3, 1, 4, 4))
    out = repeat_measurement(m, 5, batch_axis=1)
    assert out.shape == (3, 5, 4, 4)


def test_sharded_pair_reconstruction_matches_unsharded():
    """Full pair ALD with the chain axis sharded over the 8-device mesh must
    equal the unsharded run (chains are independent; no cross-chain comms)."""
    import jax.numpy as jnp
    from inverseproblemwithdiffusionmodel_tpu.operators import make_sense
    from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
        PairSENSE, PairL2Penalty)
    from inverseproblemwithdiffusionmodel_tpu.samplers import ALDConfig
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        ald_inverse_proximal_pair)
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import stack_parts

    H = W = 16
    mesh = make_mesh()
    sense = make_sense("exp", 2, 8, 0.1, (H, W, 1), seed=0, num_frames=1)
    pair = PairSENSE.from_complex(sense)
    yy, xx = jnp.mgrid[0:H, 0:W]
    target = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))[None, :, :, None]
    yr, yi = pair(target, jnp.zeros_like(target))
    yr8 = jnp.tile(yr, (1, 8, 1, 1, 1))
    yi8 = jnp.tile(yi, (1, 8, 1, 1, 1))
    sigmas = jnp.exp(jnp.linspace(jnp.log(1.0), jnp.log(0.01), 10))

    def score_fn(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = stack_parts(jnp.broadcast_to(target, (x.shape[0] // 2, H, W, 1)),
                          jnp.zeros((x.shape[0] // 2, H, W, 1)))
        return (tgt - x) / sig ** 2

    cfg = ALDConfig(n_steps_each=2, step_lr=3e-5)
    prox = PairL2Penalty(lin_tfm=pair, num_iters=3)

    @jax.jit
    def recon(yr, yi, k):
        return ald_inverse_proximal_pair(score_fn, sigmas, (yr, yi), pair,
                                         prox, k, cfg, lr_scaled=50.0)

    key = jax.random.PRNGKey(0)
    xr_plain, xi_plain = recon(yr8, yi8, key)

    from jax.sharding import NamedSharding, PartitionSpec as P
    chain_sh = NamedSharding(mesh, P(None, "data"))   # coil, CHAIN, H, W, C
    yr_s = jax.device_put(yr8, chain_sh)
    yi_s = jax.device_put(yi8, chain_sh)
    xr_sh, xi_sh = recon(yr_s, yi_s, key)
    np.testing.assert_allclose(np.asarray(xr_plain), np.asarray(xr_sh),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xi_plain), np.asarray(xi_sh),
                               rtol=1e-4, atol=1e-5)


def test_census_real_net_64px_chain_sharded():
    """Collective census at production-class shapes (VERDICT r2 task 7):
    a REAL NCSNv2 ngf32 score net at 64^2, 8 ALD chains sharded 8-way over
    the mesh data axis, CG proximal SENSE data consistency. The compiled
    HLO must satisfy the census invariant: zero tensor collectives, every
    all-reduce scalar (the CG dots) — this is the basis of the linear
    x8 ICI throughput projection (examples/chain_scaling.py)."""
    from inverseproblemwithdiffusionmodel_tpu.config import Config
    from inverseproblemwithdiffusionmodel_tpu.models.registry import (
        get_network, make_score_fn)
    from inverseproblemwithdiffusionmodel_tpu.operators import make_sense
    from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
        PairSENSE, PairL2Penalty)
    from inverseproblemwithdiffusionmodel_tpu.samplers import ALDConfig
    from inverseproblemwithdiffusionmodel_tpu.samplers.ald_pair import (
        ald_inverse_proximal_pair)
    from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import (
        sigma_ladder)

    S, B = 64, 8
    mesh = make_mesh()
    config = Config({"data": {"channels": 1, "image_size": S,
                              "logit_transform": False, "rescaled": False},
                     "model": {"ngf": 32, "nonlinearity": "elu",
                               "normalization": "InstanceNorm++"}})
    module = get_network(config)
    sigmas = sigma_ladder(10.0, 0.01, 4)
    x0 = jnp.zeros((2 * B, S, S, 1))
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x0,
                                  jnp.ones((2 * B,)))["params"]
    score_fn = make_score_fn(module, params, sigmas)

    sense = make_sense("exp", 4, 8, 0.1, (S, S, 1), seed=0, num_frames=1)
    pair = PairSENSE.from_complex(sense)
    target = jnp.ones((B, S, S, 1)) * 0.5
    yr, yi = pair(target, jnp.zeros_like(target))
    prox = PairL2Penalty.with_normal_kernel(pair, num_iters=6)
    cfg = ALDConfig(n_steps_each=1, step_lr=3e-5)

    @jax.jit
    def recon(yr, yi, k):
        return ald_inverse_proximal_pair(score_fn, sigmas, (yr, yi), pair,
                                         prox, k, cfg, lr_scaled=50.0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    chain_sh = NamedSharding(mesh, P(None, "data"))   # coil, CHAIN, H, W, C
    yr_s = jax.device_put(yr, chain_sh)
    yi_s = jax.device_put(yi, chain_sh)
    key = jax.random.PRNGKey(1)
    hlo = recon.lower(yr_s, yi_s, key).compile().as_text()
    assert_collective_census(hlo)
    # and it executes on the mesh
    xr, xi = recon(yr_s, yi_s, key)
    assert np.isfinite(np.asarray(xr)).all()


def test_distributed_helpers_single_process():
    """Single-process semantics of the multi-host helpers: initialize is a
    no-op, this process is primary, batch slice covers everything."""
    from inverseproblemwithdiffusionmodel_tpu.parallel import (
        initialize_distributed, is_primary, local_batch_slice)
    assert initialize_distributed() is False  # no pod env -> single process
    assert is_primary()
    assert local_batch_slice(16) == slice(0, 16)


def test_shard_chain_axis_pads_indivisible_batches():
    """An ensemble of 3 chains shards onto 8 devices: padded to 8, original
    count returned, rows past it are edge copies."""
    from inverseproblemwithdiffusionmodel_tpu.parallel import shard_chain_axis
    mesh = make_mesh()
    y = jnp.arange(3 * 4, dtype=jnp.float32).reshape(3, 4)
    sharded, n = shard_chain_axis(y, mesh)
    assert n == 3 and sharded.shape[0] == len(jax.devices())
    np.testing.assert_allclose(np.asarray(sharded)[:3], np.asarray(y))
    pad_rows = np.asarray(sharded)[3:]
    np.testing.assert_allclose(
        pad_rows, np.tile(np.asarray(y[2]), (pad_rows.shape[0], 1)))
    # non-leading chain axis (SENSE measurements: (coils, chains, ...))
    y2 = jnp.ones((4, 5, 2))
    sharded2, n2 = shard_chain_axis(y2, mesh, axis=1)
    assert n2 == 5 and sharded2.shape == (4, 8, 2)


def test_sharded_2d_time_matches_unsharded():
    """Factorized 2D+time pair ALD with the chain axis sharded over the mesh
    == unsharded. Validates the SURVEY 5 scaling design: the spatial step's
    frame batch (B*T) and the temporal step's tube batch (B*H*W/k^2) are
    sharded B-major over 'data'; GSPMD keeps the (B*T)<->(B,T)<->tube
    reshapes local (chains are independent, so no cross-chain collectives)."""
    import jax.numpy as jnp
    from inverseproblemwithdiffusionmodel_tpu.operators import make_sense
    from inverseproblemwithdiffusionmodel_tpu.operators.pair import (
        PairSENSE, PairL2Penalty)
    from inverseproblemwithdiffusionmodel_tpu.samplers import (
        ALDConfig, ald_2d_time_pair)
    from inverseproblemwithdiffusionmodel_tpu.samplers.sigmas import (
        sigma_ladder)
    from inverseproblemwithdiffusionmodel_tpu.utils.misc import stack_parts

    H = W = 16
    B, T = 8, 2
    mesh = make_mesh()
    sense = make_sense("exp", 2, 8, 0.1, (H, W, 1), seed=0, num_frames=1)
    pair = PairSENSE.from_complex(sense)

    yy, xx = jnp.mgrid[0:H, 0:W]
    base = jnp.exp(-(((yy - 8) ** 2 + (xx - 6) ** 2) / 20.0))
    frames = jnp.stack([base * (0.8 + 0.1 * t) for t in range(T)])[..., None]
    fr = jnp.tile(frames, (B, 1, 1, 1))            # (B*T, H, W, 1) B-major
    yr, yi = pair(fr, jnp.zeros_like(fr))          # (S, B*T, H, W, 1)
    sigmas = sigma_ladder(1.0, 0.01, 8)
    sigmas_T = sigma_ladder(0.5, 0.01, 4)

    def score_S(x, labels):
        sig = sigmas[labels].reshape(-1, *([1] * (x.ndim - 1)))
        tgt = stack_parts(jnp.broadcast_to(fr, (x.shape[0] // 2, H, W, 1)),
                          jnp.zeros((x.shape[0] // 2, H, W, 1)))
        return (tgt - x) / sig ** 2

    def score_T(x, labels):
        sig = sigmas_T[labels].reshape(-1, *([1] * (x.ndim - 1)))
        return -x / (sig ** 2 + 10.0)

    cfg = ALDConfig(n_steps_each=1, step_lr=3e-5)
    prox = PairL2Penalty(lin_tfm=pair, num_iters=2)

    @jax.jit
    def recon(yr, yi, k):
        return ald_2d_time_pair(score_S, score_T, sigmas, sigmas_T, (yr, yi),
                                pair, prox, k, cfg, lr_scaled=20.0,
                                mode_T="diffusion1d", win_size=4,
                                num_frames=T)

    key = jax.random.PRNGKey(3)
    xr_plain, xi_plain = recon(yr, yi, key)

    from jax.sharding import NamedSharding, PartitionSpec as P
    chain_sh = NamedSharding(mesh, P(None, "data"))  # coil, B*T, H, W, C
    yr_sh = jax.device_put(yr, chain_sh)
    yi_sh = jax.device_put(yi, chain_sh)
    xr_sh, xi_sh = recon(yr_sh, yi_sh, key)
    np.testing.assert_allclose(np.asarray(xr_plain), np.asarray(xr_sh),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xi_plain), np.asarray(xi_sh),
                               rtol=1e-4, atol=1e-5)

    # HLO audit: the (B*T)<->(B,T)<->tube layout transforms must partition
    # WITHOUT tensor collectives (an all-to-all around reshape_temporal_dim
    # would mean GSPMD resharded the tube axis); the only cross-chip traffic
    # allowed in the chain is the CG proximal's scalar all-reduce dots.
    hlo = recon.lower(yr_sh, yi_sh, key).compile().as_text()
    assert_collective_census(hlo)


def test_run_sharded_ensemble_indivisible_count():
    """The README's 105-chain ensemble on an 8-device mesh: padded to the
    data axis internally, padding chains sliced off the result."""
    mesh = make_mesh()
    measurement = jnp.ones((1, 4, 4)) * 2.0

    @jax.jit
    def sampler(y, key):
        keys = ensemble_keys(key, y.shape[0])
        noise = jax.vmap(lambda k, row: jax.random.normal(k, row.shape))(
            keys, y)
        return y + 0.01 * noise

    out = run_sharded_ensemble(sampler, measurement, 105,
                               jax.random.PRNGKey(0), mesh=mesh)
    assert out.shape == (105, 4, 4)
    mean, std = ensemble_mean_std(out)
    np.testing.assert_allclose(np.asarray(mean), 2.0, atol=0.05)


def test_run_sharded_ensemble_coil_leading_measurement():
    """SENSE-style layouts: the measurement's chain axis is 1 (coils lead)
    while the sampler output's chain axis is 0 — the padding must be sliced
    off the OUTPUT chain axis, not blindly off axis 0 of the measurement
    layout."""
    mesh = make_mesh()
    measurement = jnp.arange(2 * 1 * 4 * 4, dtype=jnp.float32).reshape(
        2, 1, 4, 4)  # (coils, B=1, H, W)

    def sampler(y, key):
        # conj-op analog: sum over the coil axis -> (chains, H, W)
        return y.sum(axis=0)

    out = run_sharded_ensemble(sampler, measurement, 5,
                               jax.random.PRNGKey(0), mesh=mesh,
                               measurement_batch_axis=1,
                               output_batch_axis=0)
    assert out.shape == (5, 4, 4)
    want = np.asarray(measurement.sum(axis=0)[0])
    for i in range(5):
        np.testing.assert_allclose(np.asarray(out[i]), want)
