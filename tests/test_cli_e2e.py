"""CLI end-to-end: train -> eval -> render on a tiny synthetic scene."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_scene")
    write_dataset(
        root,
        SyntheticSceneConfig(
            num_views_train=8, num_views_eval=2, image_size=32, num_bands=8,
            num_spheres=2,
        ),
    )
    return root


def test_train_eval_render_cli(scene_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from umhs_tpu.cli.train import main as train_main

    train_main(
        [
            "umhsnerf",
            "--data", str(scene_dir),
            "--pipeline.num_classes", "2",
            "--pipeline.model.method", "rgb+spectral",
            "--pipeline.model.load_vca", "True",
            "--pipeline.model.grid-resolution", "16",
            "--pipeline.model.grid-levels", "1",
            "--pipeline.model.log2-hashmap-size", "13",
            "--pipeline.model.max-res", "64",
            "--pipeline.model.num-candidates", "128",
            "--pipeline.model.max-samples-per-ray", "16",
            "--pipeline.model.cone-angle", "0.0",
            "--pipeline.model.eval-num-rays-per-chunk", "1024",
            "--pipeline.datamanager.train-num-rays-per-batch", "256",
            "--pipeline.datamanager.eval-num-rays-per-batch", "128",
            "--max-num-iterations", "60",
            "--steps_per_save", "60",
            "--steps-per-eval-batch", "1000000",
            "--mixed-precision", "False",
            "--experiment-name", "cli-e2e",
            "--vis", "console",
        ]
    )
    run_dir = Path("outputs/cli-e2e/umhsnerf")
    assert (run_dir / "config.yml").exists()
    assert (run_dir / "final_metrics.json").exists()
    ckpts = list((run_dir / "umhs_models").glob("step-*"))
    assert ckpts, "no checkpoint written"
    final = json.loads((run_dir / "final_metrics.json").read_text())
    assert "psnr" in final["eval"]

    # ---- eval CLI -------------------------------------------------------
    from umhs_tpu.cli.eval import main as eval_main

    result = eval_main(
        ["--load-config", str(run_dir / "config.yml"),
         "--output-path", "eval_out.json"]
    )
    assert result["checkpoint_step"] == 60
    assert "psnr_spectral" in result["results"]
    assert os.path.exists("eval_out.json")

    # ---- render CLI ------------------------------------------------------
    cam_path = {
        "render_height": 24,
        "render_width": 24,
        "fps": 2,
        "camera_path": [
            {
                "camera_to_world": list(
                    np.array(
                        [[1, 0, 0, 0], [0, 0, -1, -0.9], [0, 1, 0, 0], [0, 0, 0, 1]],
                        dtype=float,
                    ).reshape(-1)
                ),
                "fov": 60.0,
            }
            for _ in range(2)
        ],
    }
    with open("cam_path.json", "w") as f:
        json.dump(cam_path, f)

    from umhs_tpu.cli.render import main as render_main

    images = render_main(
        [
            "camera-path",
            "--load-config", str(run_dir / "config.yml"),
            "--camera-path-filename", "cam_path.json",
            "--output-path", "renders/out.mp4",
            "--rendered-output-names", "rgb", "abundances_0", "wv_0", "depth",
        ]
    )
    assert len(images) == 2
    assert images[0].shape == (24, 24 * 4, 3)  # 4 tiled outputs
    assert images[0].dtype == np.uint8
    assert os.path.exists("renders/out.mp4") or os.path.exists("renders/out")
