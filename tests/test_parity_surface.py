"""Import-level parity pin: every SURVEY.md §2 component's public symbol
exists where PARITY.md says it does. Pure imports — no tracing, no compute —
so a missing/renamed component fails in seconds, not after a model compile.
"""
import importlib

import pytest

PKG = "inverseproblemwithdiffusionmodel_tpu"

# (module, [symbols]) — one entry per PARITY.md row
SURFACE = [
    # §2.1 native ops → Pallas / XLA
    (f"{PKG}.ops.upfirdn2d", ["upfirdn2d", "upsample_2d", "downsample_2d",
                              "upsample_conv_2d", "conv_downsample_2d"]),
    (f"{PKG}.ops.fused_act", ["fused_leaky_relu"]),
    (f"{PKG}.ops.pallas_kernels", ["fused_leaky_relu_pallas",
                                   "upsample2x_pallas", "downsample2x_pallas"]),
    # §2.2 SDE & samplers
    (f"{PKG}.sde.sde_lib", ["SDE", "VPSDE", "subVPSDE", "VESDE",
                            "ReverseSDE", "get_ddpm_params"]),
    (f"{PKG}.sde.sampling", ["register_predictor", "register_corrector",
                             "get_predictor", "get_corrector",
                             "get_sampling_fn", "get_pc_sampler",
                             "get_ode_sampler", "vanilla_pc_sampler",
                             "EulerMaruyamaPredictor",
                             "ReverseDiffusionPredictor",
                             "AncestralSamplingPredictor", "NonePredictor",
                             "LangevinCorrector", "AnnealedLangevinDynamics",
                             "NoneCorrector", "get_score_fn"]),
    # §2.3 continuous model zoo
    (f"{PKG}.models.registry", ["register_model", "get_model", "create_model",
                                "get_network", "make_score_fn", "get_model_fn",
                                "TASK_NAME_TO_MODEL_CTOR"]),
    (f"{PKG}.models.ncsnpp", ["NCSNpp"]),
    (f"{PKG}.models.ddpm", ["DDPM"]),
    (f"{PKG}.models.layerspp", ["GaussianFourierProjection", "Combine",
                                "AttnBlockpp", "Upsample", "Downsample",
                                "ResnetBlockDDPMpp", "ResnetBlockBigGANpp",
                                "NIN", "get_timestep_embedding"]),
    (f"{PKG}.models.layers", ["CRPBlock", "RCUBlock", "MSFBlock",
                              "RefineBlock", "ResidualBlock",
                              "ConditionalResidualBlock", "ConvMeanPool",
                              "MeanPoolConv", "UpsampleConv"]),
    (f"{PKG}.models.ncsn", ["CondCRPBlock", "CondRCUBlock", "CondMSFBlock",
                            "CondRefineBlock"]),
    (f"{PKG}.models.layerspp", ["default_init"]),
    (f"{PKG}.models.normalization", ["get_normalization", "InstanceNormPlus",
                                     "ConditionalInstanceNormPlus",
                                     "VarianceNorm", "NoneNorm"]),
    (f"{PKG}.models.ema", ["EmaState"]),
    (f"{PKG}.models.simple", ["ScoreNet"]),
    # §2.4 discrete stack
    (f"{PKG}.models.ncsnv2", ["NCSNv2", "NCSNv2Deeper", "NCSNv2Deepest"]),
    (f"{PKG}.models.ncsn", ["NCSN", "NCSNdeeper"]),
    (f"{PKG}.models.ncsn1d", ["NCSN1D", "NCSN1DDeeper", "NCSN1DDeepest",
                              "UNET1D"]),
    (f"{PKG}.models.ncsn3d", ["NCSN3D", "NCSN3DShallow"]),
    (f"{PKG}.models.classifier", ["ResNetClf"]),
    (f"{PKG}.samplers.sigmas", ["get_sigmas", "sigma_ladder", "get_lh_weights",
                                "check_ladder_stability"]),
    (f"{PKG}.samplers.ald", ["ALDConfig", "ald_unconditional_sampler",
                             "ald_inverse_seg_proximal_real_imag",
                             "ald_2d_time", "compute_clf_grad",
                             "compute_seg_grad", "interp_sigmas_T"]),
    (f"{PKG}.samplers.ald_variants", ["ald_inpainting", "ald_interpolation",
                                      "ald_cls_conditioned",
                                      "ald_inverse_problem"]),
    (f"{PKG}.samplers.ald_pair", ["ald_inverse_proximal_pair",
                                  "ald_2d_time_pair"]),
    (f"{PKG}.samplers.map_opt", ["MAPConfig", "map_optimizer",
                                 "map_optimizer_2d_time", "tv_reconstruction",
                                 "tv_norm_noncircular"]),
    (f"{PKG}.operators.base", ["LinearTransform"]),
    (f"{PKG}.operators.fourier", ["UndersamplingFourier",
                                  "RandomUndersamplingFourier", "SENSE",
                                  "make_sense"]),
    (f"{PKG}.operators.masking", ["SkipLines"]),
    (f"{PKG}.operators.masks", ["generate_mask", "random_cartesian_mask"]),
    (f"{PKG}.operators.finite_diff", ["FiniteDiff"]),
    (f"{PKG}.operators.proximal", ["Proximal", "L2Penalty", "Constrained",
                                   "SingleCoil", "get_proximal"]),
    (f"{PKG}.operators.pair", ["PairSENSE", "PairL2Penalty"]),
    (f"{PKG}.ops.fft", ["i2k_complex", "k2i_complex"]),
    (f"{PKG}.ops.fft_pair", ["i2k_pair", "k2i_pair"]),
    (f"{PKG}.losses.dsm", ["anneal_dsm_score_estimation",
                           "continuous_dsm_loss"]),
    (f"{PKG}.losses.guidance", ["clf_loss_with_perturbation",
                                "seg_loss_with_perturbation"]),
    # §2.5 helpers
    (f"{PKG}.data.datasets", ["load_data"]),
    (f"{PKG}.config", ["load_config", "Config"]),
    (f"{PKG}.utils.misc", ["collate_batch", "add_phase", "filter_batch",
                           "stack_parts", "unstack_parts", "normalize",
                           "denormalize", "data_transform",
                           "inverse_data_scaler", "get_timestamp",
                           "undersample_seg_mask"]),
    (f"{PKG}.utils.reshape", ["reshape_temporal_dim",
                              "reshape_temporal_dim_np"]),
    (f"{PKG}.utils.metrics", ["REGISTERED_METRICS", "compute_metrics",
                              "compute_snr", "nrmse", "ssim"]),
    (f"{PKG}.utils.visualizations", ["create_sample_grid_plot",
                                     "metric_vs_hyperparam",
                                     "grid_of_temporal_samples"]),
    (f"{PKG}.utils.dataset_stats", ["max_pairwise_distance"]),
    (f"{PKG}.utils.torch_import", ["load_torch_checkpoint",
                                   "convert_ncsn_state_dict",
                                   "export_ncsn_state_dict",
                                   "extract_ema_state_dict",
                                   "collate_state_dict"]),
    (f"{PKG}.training.state", ["TrainState", "get_optimizer"]),
    (f"{PKG}.training.train", ["make_score_train_step", "make_clf_train_step",
                               "make_seg_train_step",
                               "make_continuous_score_train_step"]),
    (f"{PKG}.training.checkpoint", ["Checkpointer"]),
    (f"{PKG}.training.loop", ["fit", "FitConfig", "MetricsLogger"]),
    (f"{PKG}.training.callbacks", ["make_ald_visualization_hook",
                                   "make_pc_visualization_hook"]),
    (f"{PKG}.utils.profiling", ["trace", "annotate"]),
    # §2.7 parallelism
    (f"{PKG}.parallel.mesh", ["make_mesh", "shard_batch", "replicate"]),
    (f"{PKG}.parallel.ensemble", ["repeat_measurement"]),
    # ncsn/regularizers/__init__.py:4-15
    (f"{PKG}.regularizers", ["AbstractRegularizer", "ZeroReg",
                             "TVRegularizer"]),
    (f"{PKG}.utils.tb_export", ["jsonl_to_events", "TBMirror"]),
    (f"{PKG}.configs_continuous", ["get_continuous_config",
                                   "get_default_configs"]),
]

SCRIPTS = [
    "train_ncsn", "train_clf", "train_seg", "unconditioned_sampling",
    "mnist_inv_clf_sampling", "mnist_inv_clf_prox_sampling", "mnist_MAP",
    "acdc_MAP", "acdc_MAP_keep_center",
    "acdc_inv_seg_sampling_keep_center_prox_real_imag",
    "acdc_SENSE_real_img", "acdc_SENSE_MAP", "acdc_SENSE_TV",
    "cine_inv_sampling_keep_center_prox_real_imag",
    "cine_SENSE_real_img_2d_time", "cine_SENSE_real_img_2d_time_MAP",
    "generate_train_ncsn", "generate_train_seg", "vol2slices", "pc_sampling",
    "import_torch_checkpoint", "serve_recon", "export_tensorboard",
]


@pytest.mark.parametrize("module_name,symbols", SURFACE,
                         ids=[m for m, _ in SURFACE])
def test_surface_symbols(module_name, symbols):
    mod = importlib.import_module(module_name)
    missing = [s for s in symbols if not hasattr(mod, s)]
    assert not missing, f"{module_name} missing {missing}"


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_entrypoints(script):
    mod = importlib.import_module(f"{PKG}.scripts.{script}")
    assert callable(getattr(mod, "main")), f"{script}.main not callable"
