"""End-to-end CLI smoke tests on tiny configs (synthetic data fallbacks)."""
import json
import glob
import os
import warnings

import numpy as np
import pytest

warnings.filterwarnings("ignore", message=".*SYNTHETIC.*")

TINY = ["--override", "data.image_size=16", "--override", "model.ngf=8",
        "--override", "model.num_classes=6",
        "--override", "recons.num_classes=6"]


def test_train_ncsn_debug(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts.train_ncsn import main
    state = main(["--ds_name", "MNIST", "--task_name", "Diffusion",
                  "--mode", "real-imag", "--train_mode", "debug",
                  "--batch_size", "2", "--log_dir", str(tmp_path)] + TINY)
    assert int(state.step) == 2
    metrics = glob.glob(str(tmp_path / "*" / "metrics.jsonl"))
    assert metrics
    ckpts = glob.glob(str(tmp_path / "*" / "ckpts" / "*"))
    assert ckpts


def test_unconditioned_sampling(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts.unconditioned_sampling \
        import main
    out = main(["--ds_name", "MNIST", "--num_samples", "2",
                "--save_dir", str(tmp_path)] + TINY)
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(out).all()


def test_acdc_keep_center_recon(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts. \
        acdc_inv_seg_sampling_keep_center_prox_real_imag import main
    out = main(["--save_dir", str(tmp_path), "--num_samples", "2",
                "--R", "8"] + TINY)
    assert out.shape == (2, 16, 16, 1)
    run_dirs = os.listdir(tmp_path)
    assert len(run_dirs) == 1
    files = set(os.listdir(os.path.join(tmp_path, run_dirs[0])))
    assert {"original.npy", "measurement.npy", "ZF.npy",
            "reconstructions.npy", "args.json"} <= files


def test_acdc_sense_recon_and_map_and_tv(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts.acdc_SENSE_real_img \
        import main as sense_main
    out = sense_main(["--save_dir", str(tmp_path), "--num_samples", "2",
                      "--R", "8"] + TINY)
    assert out.shape == (2, 16, 16, 1)

    from inverseproblemwithdiffusionmodel_tpu.scripts.acdc_SENSE_MAP \
        import main as map_main
    out = map_main(["--save_dir", str(tmp_path), "--n_iters", "5"] + TINY)
    assert out.shape == (1, 16, 16, 1)

    from inverseproblemwithdiffusionmodel_tpu.scripts.acdc_SENSE_TV \
        import main as tv_main
    out = tv_main(["--save_dir", str(tmp_path), "--n_iters", "5"] + TINY)
    assert out.shape == (1, 16, 16, 1)


def test_mnist_map_and_clf_scripts(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts.mnist_MAP import main
    out = main(["--save_dir", str(tmp_path), "--n_iters", "5",
                "--num_skip_lines", "8"] + TINY)
    assert out.shape == (1, 16, 16, 1)

    from inverseproblemwithdiffusionmodel_tpu.scripts. \
        mnist_inv_clf_prox_sampling import main as clf_main
    out = clf_main(["--save_dir", str(tmp_path), "--num_skip_lines", "8",
                    "--cls", "1"] + TINY)
    assert out.shape == (1, 16, 16, 1)


def test_cine_2d_time_script(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts. \
        cine_SENSE_real_img_2d_time import main
    tiny_T = ["--override_T", "model.num_classes=6",
              "--override_T", "recons.num_classes=6",
              "--override_T", "model.ngf=8"]
    out = main(["--save_dir", str(tmp_path), "--mode_T", "tv",
                "--image_size", "16", "--num_frames", "4",
                "--win_size", "4", "--R", "8"] + TINY + tiny_T)
    assert out.shape == (1, 4, 16, 16, 1)

    # ensemble chains: the per-frame masks must tile to the B*T chain axis
    out = main(["--save_dir", str(tmp_path), "--mode_T", "tv",
                "--image_size", "16", "--num_frames", "4",
                "--win_size", "4", "--R", "8", "--num_samples", "2"]
               + TINY + tiny_T)
    assert out.shape == (2, 4, 16, 16, 1)
    assert np.isfinite(np.abs(out)).all()


def test_generators_and_vol2slices(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts.generate_train_ncsn \
        import main as gen_main
    gen_main(["--ds_names", "MNIST", "--save_dir", str(tmp_path / "jobs")])
    assert (tmp_path / "jobs" / "train_ncsn_MNIST_real-imag.sh").exists()
    # reference preset sets: 1=MNIST with real-valued + complex modes
    gen_main(["--set_num", "1", "--save_dir", str(tmp_path / "jobs2")])
    assert (tmp_path / "jobs2" / "train_ncsn_MNIST_real-valued.sh").exists()
    assert (tmp_path / "jobs2" / "train_ncsn_MNIST_complex.sh").exists()

    # vol2slices roundtrip on a synthetic volume file
    import numpy as np
    vol_dir = tmp_path / "vols"
    os.makedirs(vol_dir)
    np.savez(vol_dir / "case0.npz",
             image=np.random.rand(1, 3, 8, 8).astype(np.float32),
             multiClassMasks=np.zeros((1, 3, 8, 8), np.int64),
             PD=np.zeros((1, 3, 8, 8)), T1=np.zeros((1, 3, 8, 8)),
             T2=np.zeros((1, 3, 8, 8)))
    from inverseproblemwithdiffusionmodel_tpu.scripts.vol2slices import main
    main(["--root_dir", str(vol_dir), "--save_dir", str(tmp_path / "slices")])
    assert len(os.listdir(tmp_path / "slices")) == 3


def test_train_ncsn_1d_and_3d_debug(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts.train_ncsn import main
    tiny1d = ["--override", "model.ngf=8", "--override", "model.num_classes=6",
              "--override", "data.channels=16", "--override", "data.image_size=8"]
    state = main(["--ds_name", "SanityCheck1D", "--task_name", "Diffusion1D",
                  "--mode", "real-imag", "--train_mode", "debug",
                  "--batch_size", "4", "--filter_th", "0.001",
                  "--log_dir", str(tmp_path / "run1d")] + tiny1d)
    assert int(state.step) == 2

    tiny3d = ["--override", "model.ngf=8", "--override", "model.num_classes=6",
              "--override", "data.channels=16", "--override", "data.image_size=8",
              "--override", "data.channels_3d=1"]
    state = main(["--ds_name", "SanityCheck1D", "--task_name", "Diffusion3D",
                  "--mode", "real-valued", "--train_mode", "debug",
                  "--batch_size", "2",
                  "--log_dir", str(tmp_path / "run3d")] + tiny3d)
    assert int(state.step) == 2


def test_pc_sampling_script(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts.pc_sampling import main
    out = main(["--config", "ve/cifar10_ncsnpp_continuous",
                "--num_samples", "2", "--save_dir", str(tmp_path),
                "--override", "data.image_size=16",
                "--override", "model.nf=16",
                "--override", "model.num_res_blocks=1",
                "--override", "model.ch_mult=[1, 2]",
                "--override", "model.attn_resolutions=[8]",
                "--override", "model.num_scales=10"])
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()


def test_cine_2d_time_with_3d_temporal_net(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts. \
        cine_SENSE_real_img_2d_time import main
    tiny_T = ["--override_T", "model.num_classes=6",
              "--override_T", "recons.num_classes=6",
              "--override_T", "model.ngf=8",
              "--override_T", "data.channels=16",
              "--override_T", "data.channels_3d=1",
              "--override_T", "data.image_size=4"]
    out = main(["--save_dir", str(tmp_path), "--mode_T", "diffusion1d",
                "--task_name_T", "Diffusion3D",
                "--image_size", "16", "--num_frames", "4",
                "--win_size", "4", "--R", "8"] + TINY + tiny_T)
    assert out.shape == (1, 4, 16, 16, 1)


def test_cine_2d_time_map_script(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts. \
        cine_SENSE_real_img_2d_time_MAP import main
    tiny_T = ["--override_T", "model.num_classes=6",
              "--override_T", "recons.num_classes=6",
              "--override_T", "model.ngf=8"]
    out = main(["--save_dir", str(tmp_path), "--mode_T", "tv",
                "--image_size", "16", "--num_frames", "4",
                "--win_size", "4", "--R", "8", "--n_iters", "5"]
               + TINY + tiny_T)
    assert out.shape == (1, 4, 16, 16, 1)

    # reference exposes --num_samples here too (MAP ensemble, :117)
    out = main(["--save_dir", str(tmp_path), "--mode_T", "tv",
                "--image_size", "16", "--num_frames", "4",
                "--win_size", "4", "--R", "8", "--n_iters", "5",
                "--num_samples", "2"] + TINY + tiny_T)
    assert out.shape == (2, 4, 16, 16, 1)


def test_mnist_inv_clf_sampling_script(tmp_path):
    from inverseproblemwithdiffusionmodel_tpu.scripts. \
        mnist_inv_clf_sampling import main
    out = main(["--save_dir", str(tmp_path), "--num_skip_lines", "8",
                "--cls", "2"] + TINY)
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(out).all()


def test_acdc_sense_use_mesh(tmp_path):
    """Ensemble chains sharded over the 8-device virtual mesh."""
    from inverseproblemwithdiffusionmodel_tpu.scripts.acdc_SENSE_real_img \
        import main
    out = main(["--save_dir", str(tmp_path), "--num_samples", "8",
                "--R", "8", "--use_mesh"] + TINY)
    assert out.shape == (8, 16, 16, 1)
    assert np.isfinite(np.abs(out)).all()


def test_mnist_measurement_is_image_domain_skiplines(tmp_path):
    """The MNIST inverse problems are IMAGE-domain inpainting (the
    reference applies SkipLines directly to the image, mnist_MAP.py:66),
    not Fourier undersampling: the saved measurement must be the decimated
    rows of the original image itself."""
    from inverseproblemwithdiffusionmodel_tpu.scripts.mnist_MAP import main
    out = main(["--save_dir", str(tmp_path), "--n_iters", "2",
                "--num_skip_lines", "4"] + TINY)
    run_dir = sorted(glob.glob(str(tmp_path / "*")))[-1]
    original = np.load(os.path.join(run_dir, "original.npy"))
    measurement = np.load(os.path.join(run_dir, "measurement.npy"))
    assert measurement.shape == (1, 4, 16, 1)  # every 4th of 16 rows
    np.testing.assert_allclose(np.abs(measurement),
                               np.abs(original[:, 0::4]), atol=1e-6)
