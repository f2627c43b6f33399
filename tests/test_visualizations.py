"""Result aggregation / figure generation (utils/visualizations.py)."""
import json
import os

import numpy as np
import pytest

from inverseproblemwithdiffusionmodel_tpu.utils import visualizations as V


@pytest.fixture
def run_dir(tmp_path):
    rng = np.random.RandomState(0)
    truth = rng.rand(1, 16, 16, 1).astype(np.float32)
    recons = truth[0][None] + 0.05 * rng.randn(4, 16, 16, 1).astype(np.float32)
    np.save(tmp_path / "original.npy", truth)
    np.save(tmp_path / "reconstructions.npy", recons)
    np.save(tmp_path / "ZF.npy", truth * 0.5)
    with open(tmp_path / "args.json", "w") as f:
        json.dump({"R": 8, "lamda": 0.5}, f)
    return str(tmp_path)


def test_load_run_and_metrics(run_dir):
    run = V.load_run(run_dir)
    assert {"original", "reconstructions", "ZF", "args"} <= set(run)
    m = V.per_sample_metrics(run["reconstructions"], run["original"])
    assert len(m["nrmse"]) == 4
    assert m["mean_nrmse"][0] < 0.2
    assert 0 < m["mean_ssim"][0] <= 1


def test_create_sample_grid_plot(run_dir):
    path, metrics = V.create_sample_grid_plot(run_dir)
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(run_dir, "metrics.txt"))
    text = open(os.path.join(run_dir, "metrics.txt")).read()
    assert "NRMSE" in text and "SSIM" in text


def test_metric_vs_hyperparam(run_dir, tmp_path):
    out = str(tmp_path / "sweep.png")
    pts = V.metric_vs_one_hyperparam([run_dir], "R", save_path=out)
    assert os.path.exists(out)
    assert pts[0][0] == (8,)


def test_temporal_grid_and_gif(tmp_path):
    vol = np.random.RandomState(0).rand(6, 12, 12).astype(np.float32)
    p1 = V.grid_of_temporal_samples(vol, num_frames=3,
                                    save_path=str(tmp_path / "t.png"))
    assert os.path.exists(p1)
    p2 = V.save_vol_as_gif(vol, str(tmp_path / "v.gif"))
    assert os.path.exists(p2)


def test_vis_images(tmp_path):
    imgs = [np.random.rand(8, 8) for _ in range(3)]
    p = V.vis_images(*imgs, titles=["a", "b", "c"],
                     save_path=str(tmp_path / "imgs.png"))
    assert os.path.exists(p)


def test_per_sample_metrics_2d_time_volumes():
    """(N, T, H, W, 1) volume ensembles: SSIM averages frame-wise instead
    of crashing, NRMSE shapes are validated."""
    from inverseproblemwithdiffusionmodel_tpu.utils.visualizations import (
        per_sample_metrics)
    rng = np.random.RandomState(0)
    truth = rng.rand(3, 16, 16, 1).astype(np.float32)      # (T, H, W, 1)
    recons = np.stack([truth + 0.01 * rng.randn(*truth.shape)
                       for _ in range(4)]).astype(np.float32)
    rows = per_sample_metrics(recons, truth)
    assert len(rows["ssim"]) == 4 and np.isfinite(rows["ssim"]).all()
    assert rows["mean_ssim"][0] > 0.5
    # leading batch dim of 1 on the original is stripped
    rows2 = per_sample_metrics(recons, truth[None])
    np.testing.assert_allclose(rows2["nrmse"], rows["nrmse"])
    import pytest
    with pytest.raises(ValueError, match="does not match"):
        per_sample_metrics(recons, truth[:2])
