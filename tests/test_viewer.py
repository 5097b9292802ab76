"""Viewer tests: render_view math + the HTTP surface end to end."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from umhs_tpu.cli.viewer import ViewerState, make_handler
from umhs_tpu.data.datamanager import DataManagerConfig
from umhs_tpu.data.dataparser import DataParserConfig
from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset
from umhs_tpu.engine.trainer import OptimizerConfig, Trainer, TrainerConfig
from umhs_tpu.models.model import ModelConfig


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = tmp_path_factory.mktemp("viewer_scene")
    write_dataset(
        root,
        SyntheticSceneConfig(
            num_views_train=6, num_views_eval=2, image_size=24, num_bands=6,
            num_spheres=1,
        ),
    )
    tr = Trainer(
        TrainerConfig(
            max_num_iterations=40, steps_per_save=10**9, steps_per_eval_batch=10**9,
            steps_per_log=10**9, output_dir=tmp_path_factory.mktemp("out"),
            experiment_name="viewer", mixed_precision=False, use_mesh=False,
            optimizer=OptimizerConfig(lr=1e-2, max_steps=40),
        ),
        ModelConfig(
            method="rgb+spectral", grid_resolution=16, grid_levels=1, max_res=64,
            log2_hashmap_size=12, num_candidates=128, max_samples_per_ray=16,
            cone_angle=0.0, eval_num_rays_per_chunk=1024,
        ),
        DataManagerConfig(
            dataparser=DataParserConfig(data=root, num_classes=2),
            train_num_rays_per_batch=128, eval_num_rays_per_batch=64,
        ),
        num_classes=2,
    ).setup()
    tr.train()
    return tr


def test_render_view_outputs(trainer):
    state = ViewerState(trainer, resolution=32)
    names = state.output_names()
    assert "rgb" in names and "seg_pred" in names and "abundances_0" in names
    img = state.render_view(0.8, 0.5, 1.0, 50.0, "rgb")
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.uint8
    depth = state.render_view(0.8, 0.5, 1.0, 50.0, "depth")
    assert depth.shape == (32, 32, 3)


def test_http_surface(trainer):
    state = ViewerState(trainer, resolution=24)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
        assert b"umhs viewer" in page
        outs = json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/outputs").read()
        )
        assert "rgb" in outs
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?theta=1.0&phi=0.4&radius=1.2&fov=50&output=rgb"
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # unknown path -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
