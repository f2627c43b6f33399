"""Serve ALD reconstruction over HTTP from a trained score prior.

Production companion to the one-shot research CLIs (no reference
counterpart — the reference has no deployment path, SURVEY.md §2.6): loads
a score checkpoint, compiles the full chain ONCE at a fixed geometry, then
answers POST /reconstruct requests (k-space pair in, ensemble mean/std out)
with zero recompiles — per-request masks and coil maps enter the compiled
program as arguments. See serving/server.py for the wire protocol.

Example:
  python -m inverseproblemwithdiffusionmodel_tpu.scripts.serve_recon \\
      --ds_name ACDC --ckpt_dir runs/acdc_prior --R 8 --chains 16 \\
      --dtype bf16 --port 8471
"""
from __future__ import annotations

import argparse

from ._common import apply_overrides, reload_model
from ..config import load_config
from ..samplers.sigmas import check_ladder_stability, get_sigmas
from ..serving import EngineSpec, ReconstructionEngine
from ..serving.server import serve


def _serving_mesh(args):
    """Optional chain-sharding mesh: --data_shards N shards the compiled
    chain ensemble over N devices' `data` axis (-1 = all devices).
    Chains are independent, so reconstruction latency divides by N."""
    n = getattr(args, "data_shards", 1)
    if n in (0, 1):
        return None
    import jax
    from ..parallel.mesh import make_mesh
    if n == -1:
        n = len(jax.devices())
    if n > len(jax.devices()):
        raise SystemExit(f"--data_shards {n} exceeds the "
                         f"{len(jax.devices())} available devices")
    if args.chains % n:
        raise SystemExit(f"--chains {args.chains} must be a multiple of "
                         f"--data_shards {n}")
    return make_mesh(n_data=n, n_model=1)


def build_cine_engine(args):
    """2D+time engine: spatial prior from --ds_name, temporal 1-D prior
    from --ds_name_T (pixel tubes), per-frame vd masks."""
    import numpy as np
    from ..serving.cine import CineEngineSpec, CineReconstructionEngine

    config_S = apply_overrides(load_config(args.ds_name, "real-imag"),
                               args.override)
    size = config_S.data.image_size
    module_S, params_S = reload_model(config_S, "Diffusion", args.ckpt_dir)
    sigmas_S = get_sigmas(config_S, "recons")
    if args.levels:
        from ..samplers.sigmas import sigma_ladder
        sigmas_S = sigma_ladder(config_S.recons.sigma_begin,
                                config_S.recons.sigma_end, args.levels,
                                config_S.recons.sigma_dist)
    module_T = params_T = sigmas_T = None
    if "diffusion1d" in args.mode_T:
        config_T = load_config(args.ds_name_T, "real-imag")
        module_T, params_T = reload_model(config_T, "Diffusion1D",
                                          args.ckpt_dir_T)
        sigmas_T = get_sigmas(config_T, "recons")
    n_steps = args.num_steps_each or config_S.sampling.n_steps_each
    step_lr = args.step_lr or config_S.sampling.step_lr
    check_ladder_stability(sigmas_S, n_steps, step_lr)

    mask = None
    if args.R:
        from ..operators.masks import generate_mask
        from ..operators.fourier import MASK_PRESETS
        mask = generate_mask(args.frames, size, seed=args.seed,
                             **MASK_PRESETS[args.R]).reshape(
                                 args.frames, 1, size, 1)
    sens_re = None
    if args.num_sens and args.synth_sens:
        from ..operators.fourier import _exp_sens_map
        maps = np.stack([_exp_sens_map(size, size, args.seed + i)
                         for i in range(args.num_sens)])
        maps = maps / np.sqrt((maps ** 2).sum(axis=0, keepdims=True))
        sens_re = maps[..., None]

    spec = CineEngineSpec(height=size, width=size, frames=args.frames,
                          channels=config_S.data.channels,
                          num_sens=args.num_sens, chains=args.chains,
                          n_steps_each=n_steps, step_lr=step_lr,
                          lr_scaled=args.lr_scaled, mode_T=args.mode_T,
                          lamda_T=args.lamda_T, win_size=args.win_size,
                          if_random_shift=args.random_shift,
                          prox_iters=args.prox_iters, dtype=args.dtype,
                          mode=args.mode)
    return CineReconstructionEngine(
        module_S, params_S, sigmas_S, spec=spec, module_T=module_T,
        params_T=params_T, sigmas_T=sigmas_T, mask=mask, sens_re=sens_re,
        mesh=_serving_mesh(args))


def build_engine(args) -> ReconstructionEngine:
    if getattr(args, "workload", "2d") == "cine":
        return build_cine_engine(args)
    config = load_config(args.ds_name, "real-imag")
    config = apply_overrides(config, args.override)
    size = config.data.image_size
    module, params = reload_model(config, "Diffusion", args.ckpt_dir)

    sigmas = get_sigmas(config, "recons")
    if args.levels:
        from ..samplers.sigmas import sigma_ladder
        sigmas = sigma_ladder(config.recons.sigma_begin,
                              config.recons.sigma_end, args.levels,
                              config.recons.sigma_dist)
    n_steps = args.num_steps_each or config.sampling.n_steps_each
    step_lr = args.step_lr or config.sampling.step_lr
    check_ladder_stability(sigmas, n_steps, step_lr)

    mask = None
    if args.R:
        from ..operators.masks import generate_mask
        from ..operators.fourier import MASK_PRESETS
        mask = generate_mask(1, size, seed=args.seed,
                             **MASK_PRESETS[args.R])
    sens_re = sens_im = None
    if args.num_sens and args.synth_sens:
        import numpy as np
        from ..operators.fourier import _exp_sens_map
        maps = np.stack([_exp_sens_map(size, size, args.seed + i)
                         for i in range(args.num_sens)])
        maps = maps / np.sqrt((maps ** 2).sum(axis=0, keepdims=True))
        sens_re = maps[..., None]

    seg_module = seg_params = None
    if args.seg_ckpt_dir:
        seg_module, seg_params = reload_model(config, "Seg",
                                              args.seg_ckpt_dir)

    # pair-pipeline images are (B, H, W, C) with the Re/Im split on the
    # batch axis, so C is the config's per-part channel count (1 everywhere)
    spec = EngineSpec(height=size, width=size,
                      channels=config.data.channels,
                      num_sens=args.num_sens, chains=args.chains,
                      levels=int(sigmas.shape[0]), n_steps_each=n_steps,
                      step_lr=step_lr, lr_scaled=args.lr_scaled,
                      prox_iters=args.prox_iters, dtype=args.dtype,
                      mode=args.mode, seg_lamda=args.seg_lamda,
                      seg_start_time=args.seg_start_time,
                      seg_step_type=args.seg_step_type,
                      seg_mode=args.seg_mode)
    return ReconstructionEngine(module, params, sigmas, spec=spec,
                                mask=mask, sens_re=sens_re, sens_im=sens_im,
                                seg_module=seg_module, seg_params=seg_params,
                                mesh=_serving_mesh(args))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workload", default="2d", choices=["2d", "cine"],
                   help="2d: single-volume ALD+prox; cine: 2D+time "
                        "factorized (spatial + temporal prior)")
    p.add_argument("--ds_name", default="ACDC")
    p.add_argument("--ckpt_dir", default=None,
                   help="orbax checkpoint dir of the trained score model")
    # cine-only flags
    p.add_argument("--ds_name_T", default="CINE127_1D",
                   help="[cine] temporal prior's dataset config")
    p.add_argument("--ckpt_dir_T", default=None,
                   help="[cine] orbax ckpt dir of the temporal 1-D prior")
    p.add_argument("--mode_T", default="diffusion1d",
                   choices=["tv", "diffusion1d", "none", "diffusion1d-only",
                            "tv-only"])
    p.add_argument("--lamda_T", type=float, default=1.0)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--random_shift", action="store_true",
                   help="[cine] random spatial shift de-aliasing")
    # seg-guided serving (2d workload; reference headline recon)
    p.add_argument("--seg_ckpt_dir", default=None,
                   help="orbax ckpt dir of a trained seg UNet — enables "
                        "guided serving (requests pass seg_label maps)")
    p.add_argument("--seg_lamda", type=float, default=1.0)
    p.add_argument("--seg_start_time", type=float, default=0.0,
                   help="guidance ramp start as a ladder fraction "
                        "(1.0 = ramp never activates)")
    p.add_argument("--seg_step_type", default="linear",
                   choices=["linear", "constant"])
    p.add_argument("--seg_mode", default="full", choices=["full", "FG"])
    p.add_argument("--R", type=int, default=8, choices=[0, 8, 16, 20],
                   help="default undersampling mask preset (0 = fully "
                        "sampled default; requests may override per call)")
    p.add_argument("--num_sens", type=int, default=4,
                   help="coil count (0 = single-coil masked Fourier)")
    p.add_argument("--synth_sens", action="store_true",
                   help="default coil maps = the reference's synthetic exp "
                        "family (else uniform; requests may override)")
    p.add_argument("--chains", type=int, default=16,
                   help="ensemble chains per request (compiled batch)")
    p.add_argument("--data_shards", type=int, default=1,
                   help="shard the chain ensemble over this many devices' "
                        "`data` mesh axis (-1 = all; must divide --chains). "
                        "Chains are independent, so latency divides by N")
    p.add_argument("--levels", type=int, default=0,
                   help="override the recons ladder length (0 = config)")
    p.add_argument("--num_steps_each", type=int, default=None)
    p.add_argument("--step_lr", type=float, default=None)
    p.add_argument("--lr_scaled", type=float, default=5.0)
    p.add_argument("--prox_iters", type=int, default=4)
    p.add_argument("--dtype", default="bf16",
                   choices=["f32", "bf16", "int8"])
    p.add_argument("--mode", default="steps", choices=["scan", "steps"],
                   help="whole-chain XLA program vs host-stepped levels "
                        "(see CLAUDE.md: some compile services reject "
                        "very large programs)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip compile-at-startup (first request compiles)")
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VALUE")
    args = p.parse_args(argv)

    engine = build_engine(args)
    if not args.no_warmup:
        print(f"[serve] compiling at {engine.spec} ...", flush=True)
        print(f"[serve] warm in {engine.warmup():.1f}s", flush=True)
    serve(engine, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
