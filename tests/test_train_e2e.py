"""End-to-end training smoke tests on the synthetic scene.

The minimum viable slice of SURVEY.md §7 step 4: dataparser -> sampler ->
field -> compositor -> loss -> Adam -> eval metrics, on a tiny scene — and
the spectral path with VCA init, unmixing, and eval-image metrics.
"""

import os

import jax
import numpy as np
import pytest

from umhs_tpu.data.datamanager import DataManagerConfig
from umhs_tpu.data.dataparser import DataParserConfig
from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset
from umhs_tpu.engine.trainer import OptimizerConfig, Trainer, TrainerConfig
from umhs_tpu.models.model import ModelConfig


SCENE = SyntheticSceneConfig(
    num_views_train=10, num_views_eval=2, image_size=40, num_bands=8, num_spheres=2
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene_e2e")
    write_dataset(root, SCENE)
    return root


def _trainer(scene_dir, tmp_path, method="rgb+spectral", iters=300, **model_kw):
    model_cfg = ModelConfig(
        method=method,
        grid_resolution=32,
        grid_levels=1,
        max_res=128,
        log2_hashmap_size=15,
        num_candidates=256,
        max_samples_per_ray=32,
        cone_angle=0.0,
        pred_specular=False,
        load_vca=(method != "rgb"),
        eval_num_rays_per_chunk=800,
        **model_kw,
    )
    dm_cfg = DataManagerConfig(
        dataparser=DataParserConfig(data=scene_dir, num_classes=2),
        train_num_rays_per_batch=512,
        eval_num_rays_per_batch=256,
    )
    t_cfg = TrainerConfig(
        max_num_iterations=iters,
        steps_per_save=10_000_000,  # no checkpoints in smoke test
        steps_per_eval_batch=10_000_000,
        steps_per_log=100,
        output_dir=tmp_path / "outputs",
        experiment_name="smoke",
        mixed_precision=False,
        use_mesh=False,
        optimizer=OptimizerConfig(lr=1e-2, max_steps=iters),
    )
    return Trainer(t_cfg, model_cfg, dm_cfg, num_classes=2)


def test_rgb_training_improves(scene_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    trainer = _trainer(scene_dir, tmp_path, method="rgb", iters=250).setup()
    m0 = trainer.eval_batch()
    metrics = trainer.train()
    m1 = trainer.eval_batch()
    assert m1["psnr"] > m0["psnr"] + 3, (m0, m1)
    assert m1["psnr"] > 16, m1
    assert np.isfinite(metrics["loss/total"])


def test_spectral_training_and_eval_image(scene_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    trainer = _trainer(scene_dir, tmp_path, method="rgb+spectral", iters=400).setup()
    # VCA side-channel must have seeded the endmembers
    assert os.path.exists("vca.npy")
    em0 = np.load("vca.npy")
    np.testing.assert_allclose(
        np.asarray(trainer.state["params"]["endmembers"]), em0, atol=1e-6
    )

    trainer.train()
    m = trainer.eval_image(0)
    assert m["psnr"] > 14, m
    assert m["psnr_spectral"] > 14, m
    assert m["sam_spectral"] < 0.5, m
    assert 0 < m["ssim"] <= 1
    # endmember dump side-channel (every 100 steps)
    assert os.path.exists("endmembers.npy")
    em = np.load("endmembers.npy")
    assert em.shape == (2, SCENE.num_bands)
    assert em.min() >= 0 and em.max() <= 1  # clamped


def test_checkpoint_roundtrip(scene_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    trainer = _trainer(scene_dir, tmp_path, method="rgb", iters=30).setup()
    trainer.train(num_iterations=30)
    trainer.save_checkpoint()
    ckpt_dir = trainer.checkpoint_dir
    ref_psnr = trainer.eval_batch()["psnr"]

    trainer2 = _trainer(scene_dir, tmp_path, method="rgb", iters=30).setup()
    trainer2.load_checkpoint(ckpt_dir)
    assert trainer2.step == 30
    np.testing.assert_allclose(
        np.asarray(trainer2.state["params"]["hash_table"]),
        np.asarray(trainer.state["params"]["hash_table"]),
        atol=1e-7,
    )
    assert abs(trainer2.eval_batch()["psnr"] - ref_psnr) < 1e-3


def test_dynamic_batch_adaptation(scene_dir, tmp_path, monkeypatch):
    """The trainer must resize (rays, samples/ray) at the adapt boundary and
    keep training correctly afterwards."""
    monkeypatch.chdir(tmp_path)
    trainer = _trainer(scene_dir, tmp_path, method="rgb", iters=96)
    import dataclasses as dc

    trainer.config = dc.replace(
        trainer.config, dynamic_batching=True, adapt_steps=(48,), target_num_samples=8192
    )
    trainer.setup()
    trainer.train()
    # after adaptation the dynamic ray count differs from the static config
    assert trainer._dyn_rays != trainer.datamanager.config.train_num_rays_per_batch
    assert trainer._dyn_march.num_samples <= trainer.model.march_config.num_samples
    m = trainer.eval_batch()
    assert np.isfinite(m["psnr"]) and m["psnr"] > 10


def test_dynamic_state_survives_resume(scene_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import dataclasses as dc

    trainer = _trainer(scene_dir, tmp_path, method="rgb", iters=64)
    trainer.config = dc.replace(
        trainer.config, dynamic_batching=True, adapt_steps=(32,), target_num_samples=8192
    )
    trainer.setup()
    trainer.train()
    trainer.save_checkpoint()
    adapted = (trainer._dyn_rays, trainer._dyn_march.num_samples, trainer._dyn_budget)
    assert adapted[0] != trainer.datamanager.config.train_num_rays_per_batch

    t2 = _trainer(scene_dir, tmp_path, method="rgb", iters=64)
    t2.config = dc.replace(
        t2.config, dynamic_batching=True, adapt_steps=(32,), target_num_samples=8192
    )
    t2.setup()
    t2.load_checkpoint(trainer.checkpoint_dir)
    assert (t2._dyn_rays, t2._dyn_march.num_samples, t2._dyn_budget) == adapted
    t2.train(num_iterations=80)  # continues with the adapted shapes
    assert t2.step == 80


def test_periodic_readapt_resizes_budget(scene_dir, tmp_path, monkeypatch):
    """adapt_every re-runs _adapt_batch when mean samples/ray drifts
    after the one-shot adapt steps (occupancy keeps pruning past them)."""
    monkeypatch.chdir(tmp_path)
    import dataclasses as dc

    trainer = _trainer(scene_dir, tmp_path, method="rgb", iters=96)
    trainer.config = dc.replace(
        trainer.config,
        dynamic_batching=True,
        adapt_steps=(16,),
        adapt_every=16,
        adapt_drift=0.0,  # any drift triggers: forces the periodic path
    )
    trainer.setup()
    calls = []
    orig = trainer._adapt_batch
    trainer._adapt_batch = lambda *a, **kw: (calls.append(trainer.step), orig(*a, **kw))[1]
    trainer.train(num_iterations=32)
    assert calls and calls[0] == 16  # one-shot adapt fired
    n_scheduled = len(calls)
    trainer.train()  # periodic checks at 48, 64, 80, 96
    assert len(calls) > n_scheduled, calls  # periodic re-adapt fired
    # budget tracks the measured mean: ~1.3x mean samples/ray x rays
    assert trainer._dyn_budget <= 1.35 * trainer._dyn_rays * 32
