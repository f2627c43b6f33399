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
