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


def _trainer(scene_dir, tmp_path, method="rgb+spectral", iters=300,
             trainer_kw=None, **model_kw):
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
        optimizer=OptimizerConfig(lr=1e-2, max_steps=iters),
        **{"use_mesh": False, **(trainer_kw or {})},
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
        trainer.config, dynamic_batching=True, adapt_steps=(48,),
        target_num_samples=8192, adapt_prefetch_steps=0,
    )
    trainer.setup()
    trainer.train()
    # after adaptation the dynamic ray count differs from the static config
    assert trainer._dyn_rays != trainer.datamanager.config.train_num_rays_per_batch
    assert trainer._dyn_march.num_samples <= trainer.model.march_config.num_samples
    m = trainer.eval_batch()
    assert np.isfinite(m["psnr"]) and m["psnr"] > 10


def test_adapt_prefetch_defers_application(scene_dir, tmp_path, monkeypatch):
    """adapt_prefetch_steps > 0: the adapt DECIDES its new shape at the
    scheduled boundary but APPLIES it adapt_prefetch_steps later (the new
    shape's executable compiles in the background in between), and the
    decided shape matches the blocking path's — the deferral changes when,
    not what."""
    monkeypatch.chdir(tmp_path)
    import dataclasses as dc

    def build(prefetch_steps):
        t = _trainer(scene_dir, tmp_path, method="rgb", iters=96)
        t.config = dc.replace(
            t.config, dynamic_batching=True, adapt_steps=(48,),
            target_num_samples=8192, adapt_prefetch_steps=prefetch_steps,
        )
        return t.setup()

    blocking = build(0)
    blocking.train()
    deferred = build(16)
    applies = []
    orig = deferred._apply_adapt
    deferred._apply_adapt = lambda new: (applies.append(deferred.step), orig(new))[1]
    deferred.train()
    # applied exactly one chunk (16 steps) after the decision at 48
    assert applies and applies[0] == 64, applies
    # the decided shape is identical to the blocking path's
    assert deferred._dyn_rays == blocking._dyn_rays
    assert deferred._dyn_march.num_samples == blocking._dyn_march.num_samples
    assert deferred._dyn_budgets == blocking._dyn_budgets
    # the prefetched executable was registered before application
    m = deferred.eval_batch()
    assert np.isfinite(m["psnr"]) and m["psnr"] > 10


def test_sliced_driver_prefetch_registers_before_apply(
    scene_dir, tmp_path, monkeypatch
):
    """bench.py drives train() in 16-step slices, so every adapt decision
    fires exactly at a slice end (self.step == that call's num_iterations).
    The prefetch must simulate the ladder against the GLOBAL schedule
    (cfg.max_num_iterations): with a call-local horizon it was a silent
    no-op and every rung application blocked on a synchronous fast-tier
    compile (round-4 advisor finding, the cold bench's dominant hidden
    cost)."""
    monkeypatch.chdir(tmp_path)
    import dataclasses as dc

    t = _trainer(scene_dir, tmp_path, method="rgb", iters=96)
    t.config = dc.replace(
        t.config, dynamic_batching=True, adapt_steps=(48,),
        target_num_samples=8192, adapt_prefetch_steps=16,
    )
    t.setup()
    while t.step < 48:
        t.train(num_iterations=t.step + 16)  # one chunk per call, as bench
    pend = t._pending_adapt
    assert pend is not None and pend["apply_step"] == 64
    budgets = list(pend["budgets"])
    budget = tuple(budgets) if len(budgets) > 1 else budgets[0]
    key = (16, pend["rays"], pend["march"].num_samples, budget, False)
    # the pending shape's executable is registered BEFORE application
    assert key in t._chunk_fns, (key, list(t._chunk_fns))
    while t.step < 96:
        t.train(num_iterations=t.step + 16)
    assert t._dyn_rays == pend["rays"]
    assert np.isfinite(t.eval_batch()["psnr"])


def test_fuse_gate_defers_past_scheduled_ladder(scene_dir, tmp_path):
    """Occ-update fusion must not engage while the scheduled adapt ladder
    is climbing: interim rungs live ~100 steps and a fused variant costs a
    compile + program load to save ~1.2 s/16 steps. The gate is the later
    of warmup end and (last live scheduled decision + prefetch), rounded to
    the occ interval — and scheduled adapts beyond max_num_iterations are
    dead and must not push it."""
    import dataclasses as dc

    t = _trainer(scene_dir, tmp_path, method="rgb", iters=96)
    t.config = dc.replace(
        t.config, dynamic_batching=True, adapt_steps=(48,),
        adapt_prefetch_steps=16,
    )
    t.setup()
    assert t._fuse_gate_step() == t.model.occ_config.warmup_steps  # 64 < 256

    t2 = _trainer(scene_dir, tmp_path, method="rgb", iters=3000)
    t2.config = dc.replace(
        t2.config, dynamic_batching=True, adapt_steps=(512, 2048),
        adapt_prefetch_steps=96,
    )
    t2.setup()
    assert t2._fuse_gate_step() == 2144  # 2048 + 96, already 16-aligned

    # adapts at/after max_num_iterations never fire -> gate is warmup end
    t3 = _trainer(scene_dir, tmp_path, method="rgb", iters=288)
    t3.setup()  # default adapt_steps=(512, 2048), all dead at 288 iters
    assert t3._fuse_gate_step() == t3.model.occ_config.warmup_steps

    # fusion disabled -> gate unreachable
    t4 = _trainer(
        scene_dir, tmp_path, method="rgb", iters=96,
        trainer_kw={"fuse_occ_update": False},
    )
    t4.setup()
    assert t4._fuse_gate_step() > 10**9


def test_dynamic_state_survives_resume(scene_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import dataclasses as dc

    trainer = _trainer(scene_dir, tmp_path, method="rgb", iters=64)
    trainer.config = dc.replace(
        trainer.config, dynamic_batching=True, adapt_steps=(32,),
        target_num_samples=8192, adapt_prefetch_steps=0,
    )
    trainer.setup()
    trainer.train()
    trainer.save_checkpoint()
    adapted = (trainer._dyn_rays, trainer._dyn_march.num_samples, trainer._dyn_budgets)
    assert adapted[0] != trainer.datamanager.config.train_num_rays_per_batch

    t2 = _trainer(scene_dir, tmp_path, method="rgb", iters=64)
    t2.config = dc.replace(
        t2.config, dynamic_batching=True, adapt_steps=(32,),
        target_num_samples=8192, adapt_prefetch_steps=0,
    )
    t2.setup()
    t2.load_checkpoint(trainer.checkpoint_dir)
    assert (t2._dyn_rays, t2._dyn_march.num_samples, t2._dyn_budgets) == adapted
    # the sampling stream resumes where it left off (rng rides the
    # checkpoint) instead of replaying the setup seed's batches
    assert np.array_equal(
        np.asarray(t2.state["rng"]), np.asarray(trainer.state["rng"])
    )
    t2.train(num_iterations=80)  # continues with the adapted shapes
    assert t2.step == 80


def test_periodic_readapt_resizes_budget(scene_dir, tmp_path, monkeypatch):
    """adapt_every re-runs the adapt computation when mean samples/ray
    drifts after the one-shot adapt steps (occupancy keeps pruning past
    them)."""
    monkeypatch.chdir(tmp_path)
    import dataclasses as dc

    trainer = _trainer(scene_dir, tmp_path, method="rgb", iters=96)
    trainer.config = dc.replace(
        trainer.config,
        dynamic_batching=True,
        adapt_steps=(16,),
        adapt_every=16,
        adapt_prefetch_steps=0,
        adapt_drift=0.0,  # any drift triggers: forces the periodic path
    )
    trainer.setup()
    calls = []
    orig = trainer._compute_adapt
    trainer._compute_adapt = lambda *a, **kw: (calls.append(trainer.step), orig(*a, **kw))[1]
    trainer.train(num_iterations=32)
    assert calls and calls[0] == 16  # one-shot adapt fired
    n_scheduled = len(calls)
    trainer.train()  # periodic checks at 48, 64, 80, 96
    assert len(calls) > n_scheduled, calls  # periodic re-adapt fired
    # budget tracks the measured mean: ~1.3x mean samples/ray x rays
    assert trainer._dyn_budgets[0] <= 1.35 * trainer._dyn_rays * 32


def test_141band_bf16_staging_training(scene_dir, tmp_path, monkeypatch):
    """Bayspec envelope: 141-band cubes staged in device HBM as bfloat16
    (hs_dtype lever that halves HBM for the real 141-band scenes; reference:
    /root/reference/scripts/anacampseros.sh, endmembers_hotdog.npy 4x141).

    The check is STAGING PARITY: training against the bf16 ground truth
    must track the f32-staged arm (the tiny 8-view scene overfits, so
    absolute held-out PSNR is not a meaningful bar here — reference scale
    is covered by scripts/quality_reference_scale.py)."""
    monkeypatch.chdir(tmp_path)
    scene141 = SyntheticSceneConfig(
        num_views_train=8, num_views_eval=2, image_size=32,
        num_bands=141, wavelength_start=400.0, wavelength_step=2.0,
        num_spheres=3,
    )
    root = tmp_path / "scene141"
    write_dataset(root, scene141)

    def run(hs_dtype):
        model_cfg = ModelConfig(
            method="rgb+spectral", grid_resolution=16, grid_levels=1,
            max_res=64, log2_hashmap_size=13, num_candidates=128,
            max_samples_per_ray=16, cone_angle=0.0, pred_specular=True,
            load_vca=True, eval_num_rays_per_chunk=512,
        )
        dm_cfg = DataManagerConfig(
            dataparser=DataParserConfig(data=root, num_classes=4),
            train_num_rays_per_batch=256,
            eval_num_rays_per_batch=128,
            hs_dtype=hs_dtype,
        )
        t_cfg = TrainerConfig(
            max_num_iterations=300, steps_per_save=10**7,
            steps_per_eval_batch=10**7, steps_per_log=100,
            output_dir=tmp_path / f"outputs_{hs_dtype}",
            experiment_name="smoke141",
            mixed_precision=False, use_mesh=False,
            optimizer=OptimizerConfig(lr=1e-2, max_steps=300),
        )
        trainer = Trainer(t_cfg, model_cfg, dm_cfg, num_classes=4).setup()
        expect = (
            jax.numpy.bfloat16 if hs_dtype == "bfloat16" else jax.numpy.float32
        )
        assert trainer.train_data["hs_image"].dtype == expect
        metrics = trainer.train()
        ev = trainer.eval_batch()
        return metrics, ev

    m_bf16, ev_bf16 = run("bfloat16")
    m_f32, ev_f32 = run("float32")
    # training progressed through the bf16 GT (train-batch PSNR well above
    # the ~13 dB of an empty model on this scene)
    assert m_bf16["psnr_spectral"] > 20, m_bf16
    assert np.isfinite(ev_bf16["psnr_spectral"])
    # parity with the f32-staged arm on both train and held-out metrics
    assert abs(m_bf16["psnr_spectral"] - m_f32["psnr_spectral"]) < 1.5, (
        m_bf16, m_f32,
    )
    assert abs(ev_bf16["psnr_spectral"] - ev_f32["psnr_spectral"]) < 1.5, (
        ev_bf16, ev_f32,
    )
    em = np.load("endmembers.npy")
    assert em.shape == (4, 141)


def test_three_stage_dynamic_budgets(scene_dir, tmp_path, monkeypatch):
    """stage_boundaries=(4, 8): after the one-shot adapt the trainer sizes
    THREE compact stage budgets, the chunk compiles with the three-way lane
    split, per-stage eval metrics surface, and training stays sane."""
    monkeypatch.chdir(tmp_path)
    import dataclasses as dc

    t = _trainer(
        scene_dir, tmp_path, method="rgb", iters=64, stage_boundaries=(4, 8)
    )
    t.config = dc.replace(
        t.config, dynamic_batching=True, adapt_steps=(32,),
        target_num_samples=8192, adapt_prefetch_steps=0,
    )
    t.setup()
    m = t.train()
    assert len(t._dyn_budgets) == 3, t._dyn_budgets
    assert "num_eval_s3_per_batch" in m, sorted(m)
    assert m["psnr"] > 15.0, m["psnr"]
    # resume keeps all three budgets
    t.save_checkpoint()
    t2 = _trainer(
        scene_dir, tmp_path, method="rgb", iters=64, stage_boundaries=(4, 8)
    )
    t2.config = dc.replace(
        t2.config, dynamic_batching=True, adapt_steps=(32,),
        target_num_samples=8192, adapt_prefetch_steps=0,
    )
    t2.setup()
    t2.load_checkpoint(t.checkpoint_dir)
    assert t2._dyn_budgets == t._dyn_budgets


def test_fused_occ_update_parity(scene_dir, tmp_path, monkeypatch):
    """The fused-into-chunk partial occupancy update (fuse_occ_update=True,
    the default) must produce the same trajectory as the separate occ
    dispatch: both consume the identical fold_in(seed+2, step) RNG stream,
    so past the 256-step occupancy warmup the two paths differ only by XLA
    fusion boundaries (nerfacc update_every_n_steps semantics either way,
    /root/reference/umhsnerf/umhs_model.py:549-554)."""
    results = []
    for fuse in (True, False):
        monkeypatch.chdir(tmp_path)
        t = _trainer(
            scene_dir, tmp_path, method="rgb", iters=288,
            trainer_kw={"fuse_occ_update": fuse},
        ).setup()
        t.train()
        # the fused variant must actually have been exercised
        fused_keys = [k for k in t._chunk_fns if k[-1]]
        assert bool(fused_keys) == fuse, t._chunk_fns.keys()
        results.append(
            (
                np.asarray(t.state["occ"]["binaries"]),
                np.asarray(t.state["params"]["density_mlp"]["w0"])
                if "density_mlp" in t.state["params"]
                else np.asarray(
                    jax.tree_util.tree_leaves(t.state["params"])[0]
                ),
                t.eval_batch()["psnr"],
            )
        )
    (bin_a, w_a, psnr_a), (bin_b, w_b, psnr_b) = results
    assert (bin_a == bin_b).mean() > 0.995, (bin_a.mean(), bin_b.mean())
    np.testing.assert_allclose(w_a, w_b, rtol=1e-3, atol=1e-4)
    assert abs(psnr_a - psnr_b) < 0.5, (psnr_a, psnr_b)


def test_warmup_full_thinning_grid_reconciles(scene_dir, tmp_path, monkeypatch):
    """occ_warmup_full_every=k demotes all but every k-th due warmup update
    to the cheap partial form (each full map costs ~7.3 s on-TPU at the
    reference 128^3x4 config). This test pins what thinning DOES guarantee:
    the occupancy grid converges to (almost) the same binary map as the
    exact nerfacc schedule, and training stays healthy.

    It deliberately does NOT gate thinned-vs-exact quality parity: a
    3-seed/288-step A/B on this scene measured the thinned arms
    consistently ~0.7-2.3 dB BEHIND the exact schedule on held-out views
    (full_every=2: -1.53/-0.90/-1.45 dB at seeds 42/43/44; full_every=4:
    -2.27/-0.70/-1.31), i.e. warmup thinning is NOT quality-neutral at
    short horizons. That measured negative is why occ_warmup_full_every
    stays 1 in ModelConfig (production) and is confined to the
    throughput benchmark (docs/PERFORMANCE.md round 5)."""
    results = []
    for full_every in (1, 4):
        monkeypatch.chdir(tmp_path)
        t = _trainer(
            scene_dir, tmp_path, method="rgb", iters=288,
            occ_warmup_full_every=full_every,
        ).setup()
        t.train()
        results.append(
            (np.asarray(t.state["occ"]["binaries"]), t.eval_all_images()["psnr"])
        )
    (bin_a, psnr_a), (bin_b, psnr_b) = results
    # post-warmup EMA updates reconcile the binary grids
    assert (bin_a == bin_b).mean() > 0.98, (bin_a.mean(), bin_b.mean())
    # absolute health floor only (see docstring for the comparative A/B)
    assert psnr_b > 16, (psnr_a, psnr_b)
    assert psnr_a > 16, (psnr_a, psnr_b)


def test_specular_trap_regression(tmp_path, monkeypatch):
    """Fixed-seed regression on the early-training specular trap
    (docs/PERFORMANCE.md): at seed 42 with pred_specular the view-dependent
    residual can absorb the diffuse signal and stall training at total loss
    ~0.04 (the round-3 trilinear bench arm stalled at train PSNR ~21 this
    way; reference formula umhs_field.py:251-258 has no guard). With the
    default specular_ramp_steps warmup the trapping configuration must
    converge well past the stall plateau within 240 steps."""
    monkeypatch.chdir(tmp_path)
    scene = SyntheticSceneConfig(
        num_views_train=10, num_views_eval=2, image_size=64,
        num_bands=32, num_spheres=6,
    )
    root = tmp_path / "trap_scene"
    write_dataset(root, scene)
    trainer = Trainer(
        TrainerConfig(
            max_num_iterations=240, steps_per_save=10**9,
            steps_per_eval_batch=10**9, steps_per_eval_image=10**9,
            steps_per_log=80, output_dir=tmp_path / "outputs",
            experiment_name="trap", mixed_precision=False, use_mesh=False,
            seed=42, save_final=False,
            optimizer=OptimizerConfig(lr=2e-2, eps=1e-15, max_steps=10000),
        ),
        ModelConfig(
            method="rgb+spectral", pred_specular=True, load_vca=True,
            temperature=0.4, grid_resolution=32, grid_levels=1, max_res=256,
            log2_hashmap_size=15, num_candidates=256, max_samples_per_ray=32,
            cone_angle=0.0, eval_num_rays_per_chunk=1024,
            hash_interpolation="tetrahedral",
            # specular_ramp_steps left at its default: the default config
            # must not fall into the trap
        ),
        DataManagerConfig(
            dataparser=DataParserConfig(data=root, num_classes=6),
            train_num_rays_per_batch=1024, eval_num_rays_per_batch=512,
        ),
        num_classes=6,
    ).setup()
    assert trainer.model_config.specular_ramp_steps > 0  # default is ON
    m = trainer.train()
    # the trap plateaus at ~0.04; healthy convergence is well under 0.02
    assert float(m["loss/total"]) < 0.02, m["loss/total"]


def test_dino_head_trains_and_cluster_gate(scene_dir, tmp_path, monkeypatch):
    """pred_dino behavioural test: precomputed DINO features ride the batch
    (reference hs_dataloader.py:67-73), dino_mse decreases over a short
    train, and cluster_loss is gated to 0 before step 3000
    (reference umhs_model.py:376-381)."""
    monkeypatch.chdir(tmp_path)
    import json as _json

    import torch

    root = tmp_path / "scene_dino"
    write_dataset(root, SCENE)
    # synthetic per-view DINO features: smooth functions of pixel position
    meta = _json.loads((root / "transforms.json").read_text())
    h = w = SCENE.image_size
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    for i, frame in enumerate(meta["frames"]):
        base = np.stack([np.sin(3 * xx + i), np.cos(2 * yy - i)], axis=0)
        feat = np.concatenate([base] * 64, axis=0).astype(np.float32)  # (128,H,W)
        rel = frame["file_path"].replace(".png", "_dino.pt")
        torch.save(torch.from_numpy(feat), root / rel)
        frame["dino_file_path"] = rel
    (root / "transforms.json").write_text(_json.dumps(meta))

    trainer = _trainer(
        root, tmp_path, method="rgb+spectral", iters=60, pred_dino=True
    ).setup()
    assert "dino_feat" in trainer.train_data
    assert "dino_mlp" in trainer.state["params"]
    assert "dino_clusters" in trainer.state["params"]

    # warm the occupancy grid + model before probing (a cold grid renders
    # zero dino features, making the cluster inner products trivially 0)
    m = trainer.train(num_iterations=20)
    d0 = float(m["loss/dino_mse"])

    # direct loss probe: cluster gate closed before 3000, open after
    from umhs_tpu.data.datamanager import sample_pixel_batch

    rays, batch = sample_pixel_batch(
        trainer.train_data, trainer.train_cam, jax.random.PRNGKey(0), 512
    )
    out = trainer.model.forward(
        trainer.state["params"], trainer.state["occ"], rays,
        rng=jax.random.PRNGKey(1), train=True,
    )
    l_pre = trainer.model.loss(out, batch, rng=jax.random.PRNGKey(2), step=10)
    l_post = trainer.model.loss(out, batch, rng=jax.random.PRNGKey(2), step=3001)
    assert "dino_mse" in l_pre
    assert float(l_pre["cluster_loss"]) == 0.0
    assert float(l_post["cluster_loss"]) != 0.0

    m = trainer.train(num_iterations=60)
    d1 = float(m["loss/dino_mse"])
    assert np.isfinite(d0) and np.isfinite(d1)
    assert d1 < d0, (d0, d1)


def test_scan1_bridge_parity(scene_dir, tmp_path, monkeypatch):
    """Cold-start scan-1 bridge: scan(1) dispatched n times must reproduce
    the scan(n) chunk's final state and last-step metrics bitwise (the
    trainer steps through the bridge while the scan-n executable is still
    backend-compiling — engine/trainer.py train() dispatch site)."""
    monkeypatch.chdir(tmp_path)
    t = _trainer(scene_dir, tmp_path, method="rgb", iters=16)
    t.setup()
    t._init_dyn()
    march = t._dyn_march
    budget = t._dyn_budgets[0]
    f16 = t._build_train_chunk(16, t._dyn_rays, march, budget)
    f1 = t._build_train_chunk(1, t._dyn_rays, march, budget)
    # donated args: copy the state for the second run
    s0 = jax.tree.map(lambda x: np.asarray(x).copy(), t.state)
    sA, mA = f16(jax.tree.map(jax.numpy.asarray, s0), t.train_data, t.train_cam)
    sB = jax.tree.map(jax.numpy.asarray, s0)
    for _ in range(16):
        sB, mB = f1(sB, t.train_data, t.train_cam)
    for ka in sA:
        for la, lb in zip(
            jax.tree.leaves(sA[ka]), jax.tree.leaves(sB[ka])
        ):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for k in mA:
        np.testing.assert_array_equal(np.asarray(mA[k]), np.asarray(mB[k]))
