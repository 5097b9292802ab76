"""Model-level tests: forward, losses, metrics, segmentation outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umhs_tpu.models.model import ModelConfig, UMHSModel
from umhs_tpu.ops.occupancy import mark_all_occupied

WL = list(range(450, 651, 10))


def _small_model(method="rgb+spectral", **kw):
    cfg = ModelConfig(
        method=method,
        grid_resolution=16,
        grid_levels=1,
        max_res=64,
        log2_hashmap_size=12,
        num_candidates=128,
        max_samples_per_ray=16,
        pred_specular=(method != "rgb"),
        cone_angle=0.0,
        **kw,
    )
    return UMHSModel(
        cfg, wavelengths=WL if method != "rgb" else [], num_classes=4, num_images=3
    )


def _rays(n=8, key=0):
    k = jax.random.PRNGKey(key)
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    px = jax.random.uniform(k, (n, 2), minval=-0.3, maxval=0.3)
    d = jnp.concatenate([px, jnp.ones((n, 1))], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "origins": o,
        "directions": d,
        "camera_indices": jnp.zeros(n, dtype=jnp.int32),
    }


class TestForward:
    def test_spectral_outputs(self):
        model = _small_model()
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        out = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        for key in (
            "rgb",
            "spectral",
            "spectral2",
            "specular",
            "abundances",
            "accumulation",
            "depth",
            "seg_probs",
            "seg_raw",
            "seg_pred",
            "num_samples_per_ray",
        ):
            assert key in out, key
        assert out["spectral"].shape == (8, 21)
        assert out["rgb"].shape == (8, 3)
        assert out["abundances"].shape == (8, 4)
        assert out["seg_pred"].shape == (8, 3)
        acc = np.asarray(out["accumulation"])
        assert (acc >= 0).all() and (acc <= 1 + 1e-5).all()
        assert np.isfinite(np.asarray(out["depth"])).all()

    def test_rgb_method_outputs(self):
        model = _small_model("rgb")
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        out = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        assert "rgb" in out and "spectral" not in out

    def test_forward_jits(self):
        model = _small_model()
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        f = jax.jit(lambda p, b, r, k: model.forward(p, b, r, rng=k))
        out = f(params, occ, _rays(), jax.random.PRNGKey(1))
        assert out["spectral"].shape == (8, 21)

    def test_empty_grid_transparent(self):
        model = _small_model()
        params, occ = model.init(jax.random.PRNGKey(0))  # all unoccupied
        out = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(out["accumulation"]), 0.0, atol=1e-6)
        assert int(np.asarray(out["num_samples_per_ray"]).sum()) == 0


class TestLossAndMetrics:
    def _batch(self, n=8, bands=21, rgba=True, key=5):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        img = jax.random.uniform(ks[0], (n, 4 if rgba else 3))
        hs = jax.random.uniform(ks[1], (n, bands))
        return {"image": img, "hs_image": hs}

    def test_loss_keys_by_method(self):
        for method, keys in (
            ("rgb", {"rgb_loss"}),
            ("spectral", {"spectral_loss"}),
            ("rgb+spectral", {"spectral_loss", "rgb_loss"}),
        ):
            model = _small_model(method)
            params, occ = model.init(jax.random.PRNGKey(0))
            occ = mark_all_occupied(occ)
            out = model.forward(
                params, occ, _rays(), rng=jax.random.PRNGKey(1)
            )
            ld = model.loss(out, self._batch(), jax.random.PRNGKey(2))
            assert set(ld) == keys, method
            for v in ld.values():
                assert np.isfinite(float(v))

    def test_spectral_weight_applied(self):
        m1 = _small_model("rgb+spectral", spectral_loss_weight=5.0)
        m2 = _small_model("rgb+spectral", spectral_loss_weight=1.0)
        params, occ = m1.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        out = m1.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        batch = self._batch()
        l1 = m1.loss(out, batch, jax.random.PRNGKey(2))
        l2 = m2.loss(out, batch, jax.random.PRNGKey(2))
        np.testing.assert_allclose(
            float(l1["spectral_loss"]), 5 * float(l2["spectral_loss"]), rtol=1e-5
        )

    def test_random_background_blending(self):
        """With accumulation < 1 the random background must enter pred rgb:
        two RNGs give different rgb losses."""
        model = _small_model("rgb+spectral")
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        out = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        batch = self._batch()
        la = model.loss(out, batch, jax.random.PRNGKey(10))
        lb = model.loss(out, batch, jax.random.PRNGKey(11))
        assert float(la["rgb_loss"]) != float(lb["rgb_loss"])

    def test_metrics(self):
        model = _small_model()
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        out = model.forward(params, occ, _rays(), rng=jax.random.PRNGKey(1))
        m = model.metrics(out, self._batch())
        for k in ("psnr", "rmse", "psnr_spectral", "rmse_spectral", "num_samples_per_batch"):
            assert k in m
            assert np.isfinite(float(m[k]))

    def test_loss_differentiable(self):
        model = _small_model()
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        batch = self._batch()
        rays = _rays()

        def total(p):
            out = model.forward(p, occ, rays, rng=jax.random.PRNGKey(1))
            ld = model.loss(out, batch, jax.random.PRNGKey(2))
            return sum(ld.values())

        g = jax.grad(total)(params)
        assert float(jnp.abs(g["endmembers"]).sum()) > 0
        assert float(jnp.abs(g["hash_table"]).sum()) > 0


class TestOccupancySchedule:
    def test_schedule(self):
        model = _small_model()
        due, full = model.occ_update_due(0)
        assert due and full
        due, full = model.occ_update_due(5)
        assert not due
        due, full = model.occ_update_due(512)
        assert due and not full

    def test_warmup_full_thinning(self):
        """occ_warmup_full_every=k keeps every k-th due warmup update full
        and demotes the rest to partial; post-warmup unaffected."""
        model = _small_model(occ_warmup_full_every=2)
        w = model.occ_config.warmup_steps
        n = model.occ_config.update_interval
        fulls = [s for s in range(0, w, n) if model.occ_update_due(s) == (True, True)]
        partials = [s for s in range(0, w, n) if model.occ_update_due(s) == (True, False)]
        assert fulls == list(range(0, w, 2 * n))
        assert partials == list(range(n, w, 2 * n))
        due, full = model.occ_update_due(w + n)
        assert due and not full
        # default (=1) is the exact nerfacc schedule: all warmup dues full
        ref = _small_model()
        assert all(ref.occ_update_due(s) == (True, True) for s in range(0, w, n))

    def test_update_occupancy_runs(self):
        model = _small_model()
        params, occ = model.init(jax.random.PRNGKey(0))
        occ2 = model.update_occupancy(occ, params, jax.random.PRNGKey(1), full=True)
        assert occ2["occs"].shape == occ["occs"].shape


class TestCompactSamples:
    def test_compact_matches_padded(self):
        """Compact-space forward must equal the padded path when the global
        budget is not binding."""
        import dataclasses as dc

        m_pad = _small_model()
        m_pad = UMHSModel(
            dc.replace(m_pad.config, compact_samples=False),
            wavelengths=WL, num_classes=4, num_images=3,
        )
        m_cmp = UMHSModel(
            dc.replace(m_pad.config, compact_samples=True, compact_fraction=1.0),
            wavelengths=WL, num_classes=4, num_images=3,
        )
        params, occ = m_pad.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        rays = _rays()
        rng = jax.random.PRNGKey(1)
        a = m_pad.forward(params, occ, rays, rng=rng)
        b = m_cmp.forward(params, occ, rays, rng=rng)
        for k in ("spectral", "rgb", "accumulation", "depth", "abundances"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=2e-4, atol=2e-5,
                err_msg=k,
            )

    def test_budget_scaling_conserves_depth(self):
        """With a binding global budget, rays get coarser but opacity stays
        close (optical depth conserved by dt rescaling)."""
        import dataclasses as dc

        base = _small_model()
        tight = UMHSModel(
            dc.replace(base.config, compact_samples=True, compact_fraction=0.25),
            wavelengths=WL, num_classes=4, num_images=3,
        )
        loose = UMHSModel(
            dc.replace(base.config, compact_samples=True, compact_fraction=1.0),
            wavelengths=WL, num_classes=4, num_images=3,
        )
        params, occ = base.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        rays = _rays(n=64)  # large enough that the 256-slot floor binds
        a = loose.forward(params, occ, rays, rng=jax.random.PRNGKey(1))
        b = tight.forward(params, occ, rays, rng=jax.random.PRNGKey(1))
        assert int(np.asarray(b["num_samples_per_ray"]).sum()) <= 64 * 16 * 0.25 + 64
        np.testing.assert_allclose(
            np.asarray(a["accumulation"]), np.asarray(b["accumulation"]), atol=0.15
        )

    def test_compact_gradients_flow(self):
        model = _small_model()  # compact_samples defaults True
        assert model.config.compact_samples
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        rays = _rays()
        batch = {
            "image": jax.random.uniform(jax.random.PRNGKey(5), (8, 4)),
            "hs_image": jax.random.uniform(jax.random.PRNGKey(6), (8, 21)),
        }

        def total(p):
            out = model.forward(p, occ, rays, rng=jax.random.PRNGKey(1))
            ld = model.loss(out, batch, jax.random.PRNGKey(2))
            return sum(ld.values())

        g = jax.grad(total)(params)
        assert float(jnp.abs(g["hash_table"]).sum()) > 0
        assert float(jnp.abs(g["endmembers"]).sum()) > 0


class TestStagedEval:
    """Staged compact evaluation with exact transmittance termination
    (nerfacc sigma_fn semantics at stage granularity)."""

    def test_staged_budgets_match_single(self):
        # stage_boundaries takes precedence over stage_samples when set
        # (and defaults to (8, 16)); pin it empty to exercise the single
        # stage_samples split
        model = _small_model(stage_samples=4, stage_boundaries=())
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        r = _rays(64)
        a = model.forward(params, occ, r, rng=jax.random.PRNGKey(1),
                          compact_budget=1024)
        b = model.forward(params, occ, r, rng=jax.random.PRNGKey(1),
                          compact_budget=(256, 768))
        for k in ("rgb", "spectral", "accumulation", "depth"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5
            )
        assert int(b["num_eval_s1_per_ray"].sum()) == 256
        assert int(b["num_eval_s2_per_ray"].sum()) == 768

    def test_three_stage_matches_two_stage(self):
        """An extra termination checkpoint (stage_boundaries) only removes
        provably-invisible evaluations — rendered outputs are unchanged."""
        two = _small_model(stage_samples=4, stage_boundaries=())
        three = _small_model(stage_boundaries=(2, 4))
        assert three.active_stage_boundaries(16) == (2, 4)
        params, occ = two.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        r = _rays(64)
        a = two.forward(params, occ, r, rng=jax.random.PRNGKey(1),
                        compact_budget=(256, 768))
        b = three.forward(params, occ, r, rng=jax.random.PRNGKey(1),
                          compact_budget=(128, 128, 768))
        for k in ("rgb", "spectral", "accumulation", "depth"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5
            )
        evals_a = int(a["num_eval_s1_per_ray"].sum()) + int(
            a["num_eval_s2_per_ray"].sum()
        )
        evals_b = (
            int(b["num_eval_s1_per_ray"].sum())
            + int(b["num_eval_s2_per_ray"].sum())
            + int(b["num_eval_s3_per_ray"].sum())
        )
        assert evals_b <= evals_a
        # per-stage metrics surface for the trainer's budget sizing
        m = three.metrics(b, {"image": jnp.zeros((64, 4))})
        assert "num_eval_s3_per_batch" in m

    def test_termination_skips_occluded_tail(self):
        # train a few steps is overkill: fake an opaque field by scaling
        # the density MLP's output bias enormously -> every sample opaque,
        # so stage 2 must evaluate ~nothing while renders stay finite
        model = _small_model(stage_samples=4, stage_boundaries=())
        params, occ = model.init(jax.random.PRNGKey(0))
        occ = mark_all_occupied(occ)
        params["mlp_base"]["layers"][-1]["b"] = (
            params["mlp_base"]["layers"][-1]["b"].at[0].set(50.0)
        )  # trunc_exp clamps at 15 -> density e^15 everywhere
        r = _rays(64)
        out = model.forward(params, occ, r, rng=jax.random.PRNGKey(1),
                            compact_budget=(256, 768))
        assert int(out["num_eval_s1_per_ray"].sum()) > 0
        assert int(out["num_eval_s2_per_ray"].sum()) == 0  # all rays dead
        assert bool(jnp.all(jnp.isfinite(out["rgb"])))
        assert float(out["accumulation"].min()) > 0.9  # opaque renders
