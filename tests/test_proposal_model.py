"""Proposal-sampler (nerfacto-style) model family: forward, losses, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umhs_tpu.data.datamanager import DataManagerConfig
from umhs_tpu.data.dataparser import DataParserConfig
from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset
from umhs_tpu.engine.trainer import OptimizerConfig, Trainer, TrainerConfig
from umhs_tpu.models.model import ModelConfig, UMHSModel


def _model(method="rgb"):
    cfg = ModelConfig(
        method=method,
        sampler="proposal",
        num_proposal_samples=(64, 32),
        num_nerf_samples=16,
        log2_hashmap_size=13,
        max_res=64,
        near_plane=0.05,
        far_plane=20.0,
        pred_specular=(method != "rgb"),
    )
    wl = list(range(450, 651, 10)) if method != "rgb" else []
    return UMHSModel(cfg, wavelengths=wl, num_classes=3, num_images=4)


def _rays(n=8):
    o = jnp.tile(jnp.array([[0.0, 0.0, -1.5]]), (n, 1))
    px = jax.random.uniform(jax.random.PRNGKey(0), (n, 2), minval=-0.3, maxval=0.3)
    d = jnp.concatenate([px, jnp.ones((n, 1))], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return {"origins": o, "directions": d,
            "camera_indices": jnp.zeros(n, dtype=jnp.int32)}


class TestProposalForward:
    def test_params_include_proposals(self):
        model = _model()
        params, _ = model.init(jax.random.PRNGKey(0))
        assert "proposal_0" in params and "proposal_1" in params

    def test_forward_outputs_and_aux(self):
        model = _model("rgb+spectral")
        params, occ = model.init(jax.random.PRNGKey(0))
        out = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        assert out["rgb"].shape == (8, 3)
        assert out["spectral"].shape == (8, 21)
        assert out["prop_edges_0"].shape == (8, 65)
        assert out["prop_weights_1"].shape == (8, 32)
        assert out["final_weights"].shape == (8, 16)
        assert np.isfinite(np.asarray(out["rgb"])).all()
        # eval mode omits aux
        out_eval = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1),
                                 train=False)
        assert "final_edges" not in out_eval

    def test_loss_includes_proposal_terms(self):
        model = _model("rgb")
        params, occ = model.init(jax.random.PRNGKey(0))
        out = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        batch = {"image": jax.random.uniform(jax.random.PRNGKey(2), (8, 4))}
        ld = model.loss(out, batch, jax.random.PRNGKey(3))
        assert set(ld) == {"rgb_loss", "interlevel_loss", "distortion_loss"}
        for v in ld.values():
            assert np.isfinite(float(v))

    def test_grads_reach_proposals(self):
        model = _model("rgb")
        params, occ = model.init(jax.random.PRNGKey(0))
        rays = _rays()
        batch = {"image": jax.random.uniform(jax.random.PRNGKey(2), (8, 4))}

        def total(p):
            out = model.forward(p, occ, rays, rng=jax.random.PRNGKey(1))
            return sum(model.loss(out, batch, jax.random.PRNGKey(3)).values())

        g = jax.grad(total)(params)
        assert float(jnp.abs(g["proposal_0"]["hash_table"]).sum()) > 0
        assert float(jnp.abs(g["proposal_1"]["hash_table"]).sum()) > 0
        assert float(jnp.abs(g["hash_table"]).sum()) > 0


def test_proposal_training_improves(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    root = tmp_path / "scene"
    write_dataset(root, SyntheticSceneConfig(
        num_views_train=8, num_views_eval=2, image_size=32, num_bands=6,
        num_spheres=1))
    trainer = Trainer(
        TrainerConfig(max_num_iterations=250, steps_per_save=10**9,
                      steps_per_eval_batch=10**9, steps_per_log=10**9,
                      output_dir=tmp_path / "out", experiment_name="prop",
                      mixed_precision=False, use_mesh=False,
                      optimizer=OptimizerConfig(lr=1e-2, max_steps=250)),
        ModelConfig(method="rgb", sampler="proposal",
                    num_proposal_samples=(64, 32), num_nerf_samples=16,
                    log2_hashmap_size=13, max_res=64, far_plane=20.0,
                    eval_num_rays_per_chunk=512),
        DataManagerConfig(dataparser=DataParserConfig(data=root, num_classes=2),
                          train_num_rays_per_batch=256,
                          eval_num_rays_per_batch=128),
        num_classes=2,
    ).setup()
    m0 = trainer.eval_batch()
    trainer.train()
    m1 = trainer.eval_batch()
    assert m1["psnr"] > m0["psnr"] + 2, (m0, m1)
    assert np.isfinite(m1["psnr"])
