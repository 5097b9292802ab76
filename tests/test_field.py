"""Field tests: density path, spectral unmixing math, head wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umhs_tpu.models.field import (
    FieldConfig,
    clamp_endmembers,
    field_density,
    field_outputs,
    init_field_params,
    scene_contract,
)
from umhs_tpu.ops.encodings import HashEncodingConfig

SMALL_HASH = HashEncodingConfig(
    num_levels=4, log2_hashmap_size=12, base_resolution=4, max_resolution=32
)


def _cfg(**kw):
    defaults = dict(
        method="rgb+spectral",
        num_classes=4,
        num_bands=21,
        num_images=3,
        temperature=0.3,
        pred_specular=True,
        hash=SMALL_HASH,
    )
    defaults.update(kw)
    return FieldConfig(**defaults)


class TestSceneContraction:
    def test_identity_inside(self):
        x = jnp.array([[0.5, -0.3, 0.9]])
        np.testing.assert_allclose(scene_contract(x), x, atol=1e-7)

    def test_contracts_outside(self):
        x = jnp.array([[10.0, 0.0, 0.0]])
        y = np.asarray(scene_contract(x))
        np.testing.assert_allclose(y, [[2.0 - 0.1, 0.0, 0.0]], atol=1e-5)

    def test_bounded(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 100
        y = np.asarray(scene_contract(x))
        assert np.abs(y).max() <= 2.0 + 1e-5


class TestDensity:
    def test_shapes_and_nonnegative(self):
        cfg = _cfg()
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (50, 3), minval=-1, maxval=1)
        density, geo = field_density(params, cfg, pos)
        assert density.shape == (50,)
        assert geo.shape == (50, cfg.geo_feat_dim)
        assert (np.asarray(density) >= 0).all()

    def test_outside_box_zero_without_contraction(self):
        cfg = _cfg(use_scene_contraction=False)
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        pos = jnp.array([[5.0, 5.0, 5.0]])
        density, _ = field_density(params, cfg, pos)
        assert float(density[0]) == 0.0


class TestSpectralHeads:
    def test_output_keys_and_shapes(self):
        cfg = _cfg()
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        n = 32
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1, maxval=1)
        dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        cam = jnp.zeros(n, dtype=jnp.int32)
        _, geo = field_density(params, cfg, pos)
        out = field_outputs(params, cfg, pos, dirs, cam, geo)
        assert set(out) == {"spectral", "spectral2", "specular", "abundances"}
        assert out["spectral"].shape == (n, 21)
        assert out["abundances"].shape == (n, 4)
        a = np.asarray(out["abundances"])
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)  # simplex

    def test_linear_mixing_model(self):
        """spec2 (diffuse part) must equal sum_k a_k * s_k * E_k exactly."""
        cfg = _cfg()
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        n = 8
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-0.9, maxval=0.9)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        cam = jnp.zeros(n, dtype=jnp.int32)
        _, geo = field_density(params, cfg, pos)
        out = field_outputs(params, cfg, pos, dirs, cam, geo)
        # reconstruct: spectral - specular residual == E-weighted mixture
        spec_diffuse = np.asarray(out["spectral2"])
        a = np.asarray(out["abundances"])  # (n, K)
        E = np.asarray(params["endmembers"])  # (K, B)
        # the per-point scalars are internal; verify the mixture lies in the
        # cone spanned by {a_k E_k}: residual of least-squares fit ~ 0
        basis = a[:, :, None] * E[None, :, :]  # (n, K, B)
        for i in range(n):
            coef, res, *_ = np.linalg.lstsq(basis[i].T, spec_diffuse[i], rcond=None)
            recon = basis[i].T @ coef
            np.testing.assert_allclose(recon, spec_diffuse[i], atol=1e-5)
            assert (coef > -1e-5).all() and (coef < 1 + 1e-5).all()  # sigmoids

    def test_specular_additive(self):
        cfg = _cfg()
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        n = 8
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-0.9, maxval=0.9)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        cam = jnp.zeros(n, dtype=jnp.int32)
        _, geo = field_density(params, cfg, pos)
        out = field_outputs(params, cfg, pos, dirs, cam, geo)
        np.testing.assert_allclose(
            np.asarray(out["spectral"]),
            np.asarray(out["spectral2"]) + np.asarray(out["specular"]),
            atol=1e-5,
        )

    def test_specular_ramp_gates_residual(self):
        """specular_ramp_steps fades the residual linearly over the first N
        steps (docs/PERFORMANCE.md 'Early-training specular trap'): at step 0
        the residual is exactly 0, at N it matches the unramped output, and
        at N/2 it is exactly half — computed in f32 regardless of the
        compute dtype (ADVICE r3: a bf16 ramp quantises step/N to ~8 bits)."""
        cfg = _cfg(specular_ramp_steps=100)
        cfg_off = _cfg(specular_ramp_steps=0)
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        n = 16
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-0.9, maxval=0.9)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        cam = jnp.zeros(n, dtype=jnp.int32)
        _, geo = field_density(params, cfg, pos)

        def run(c, step):
            return field_outputs(
                params, c, pos, dirs, cam, geo,
                step=jnp.asarray(step, jnp.int32) if step is not None else None,
            )

        full = run(cfg_off, 0)
        at0 = run(cfg, 0)
        at50 = run(cfg, 50)
        at100 = run(cfg, 100)
        at9999 = run(cfg, 9999)
        nostep = run(cfg, None)  # step untraced (entry() path): no ramp
        res_full = np.asarray(full["spectral"]) - np.asarray(full["spectral2"])
        res0 = np.asarray(at0["spectral"]) - np.asarray(at0["spectral2"])
        res50 = np.asarray(at50["spectral"]) - np.asarray(at50["spectral2"])
        res100 = np.asarray(at100["spectral"]) - np.asarray(at100["spectral2"])
        np.testing.assert_allclose(res0, 0.0, atol=1e-7)
        np.testing.assert_allclose(res50, 0.5 * res_full, atol=1e-6)
        np.testing.assert_allclose(res100, res_full, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(at9999["spectral"]), np.asarray(full["spectral"]), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(nostep["spectral"]), np.asarray(full["spectral"]), atol=1e-7
        )
        # diffuse path unaffected by the gate
        np.testing.assert_allclose(
            np.asarray(at0["spectral2"]), np.asarray(full["spectral2"]), atol=1e-7
        )

    def test_vca_init_used(self):
        cfg = _cfg()
        em = np.random.default_rng(0).random((4, 21)).astype(np.float32)
        params = init_field_params(jax.random.PRNGKey(0), cfg, endmembers_init=em)
        np.testing.assert_allclose(np.asarray(params["endmembers"]), em)

    def test_endmember_clamp(self):
        cfg = _cfg()
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        params["endmembers"] = jnp.array([[-1.0, 2.0] + [0.5] * 19] * 4)
        clamped = clamp_endmembers(params)
        e = np.asarray(clamped["endmembers"])
        assert e.min() >= 0.0 and e.max() <= 1.0

    def test_rgb_method(self):
        cfg = _cfg(method="rgb", num_bands=0, pred_specular=False)
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        assert "endmembers" not in params
        n = 16
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1, maxval=1)
        dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        _, geo = field_density(params, cfg, pos)
        out = field_outputs(params, cfg, pos, dirs, jnp.zeros(n, jnp.int32), geo)
        assert set(out) == {"rgb"}
        rgb = np.asarray(out["rgb"])
        assert rgb.shape == (n, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1  # sigmoid head

    def test_gradients_flow(self):
        cfg = _cfg()
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.9, maxval=0.9)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))

        def loss(p):
            d, geo = field_density(p, cfg, pos)
            out = field_outputs(p, cfg, pos, dirs, jnp.zeros(16, jnp.int32), geo)
            return jnp.sum(out["spectral"] ** 2) + jnp.sum(d**2)

        g = jax.grad(loss)(params)
        for name in ("hash_table", "endmembers"):
            assert float(jnp.abs(g[name]).sum()) > 0, f"no grad to {name}"
        for mlp in ("mlp_base", "feature_mlp", "mlp_head", "mlp_directional"):
            total = sum(
                float(jnp.abs(layer["w"]).sum()) for layer in g[mlp]["layers"]
            )
            assert total > 0, f"no grad to {mlp}"
