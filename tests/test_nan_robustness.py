"""Regression tests for the silent NaN-poisoning class.

Three independent routes once collapsed training to background fitting with
finite losses (see docs/PERFORMANCE.md): exp overflow x zero selector,
jnp.take's NaN fill mode on budget mismatch, and NaN persistence through the
occupancy EMA max.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from umhs_tpu.models.field import FieldConfig, field_density, init_field_params
from umhs_tpu.models.model import ModelConfig, UMHSModel
from umhs_tpu.ops.activations import trunc_exp
from umhs_tpu.ops.encodings import HashEncodingConfig
from umhs_tpu.ops.occupancy import OccGridConfig, init_occ_state, update_occ_state


def test_trunc_exp_forward_clamped():
    """exp overflow must not produce inf (inf * 0-selector = NaN)."""
    y = np.asarray(trunc_exp(jnp.array([0.0, 100.0, 1e6, -1e6])))
    assert np.isfinite(y).all()
    assert y[1] == y[2]
    np.testing.assert_allclose(y[1], np.exp(15.0), rtol=1e-6)


def test_density_finite_under_extreme_params():
    cfg = FieldConfig(
        method="rgb",
        num_images=2,
        hash=HashEncodingConfig(num_levels=4, log2_hashmap_size=12,
                                base_resolution=4, max_resolution=32),
    )
    params = init_field_params(jax.random.PRNGKey(0), cfg)
    # blow up the base MLP so pre-activations overflow exp
    params["mlp_base"]["layers"][-1]["b"] = (
        params["mlp_base"]["layers"][-1]["b"] + 1e6
    )
    pos = jnp.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0], [0.5, 0.5, 0.5]])
    d, _ = field_density(params, cfg, pos)
    assert np.isfinite(np.asarray(d)).all()


def test_occ_update_survives_nan_density():
    cfg = OccGridConfig(resolution=8, levels=1)
    s = init_occ_state(cfg)
    nan_density = lambda x: jnp.full(x.shape[:-1], jnp.nan)
    s = update_occ_state(s, cfg, nan_density, 0.01, jax.random.PRNGKey(0), full=True)
    assert np.isfinite(np.asarray(s["occs"])).all()
    # and a later real update still works
    ball = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 0.3, 50.0, 0.0)
    s = update_occ_state(s, cfg, ball, 0.01, jax.random.PRNGKey(1), full=True)
    assert bool(s["binaries"].any())


def test_forward_loss_grads_finite_with_extreme_density_params():
    """End-to-end: huge density pre-activations must not NaN loss or grads."""
    from umhs_tpu.ops.occupancy import mark_all_occupied

    model = UMHSModel(
        ModelConfig(method="rgb", grid_resolution=16, grid_levels=1, max_res=64,
                    log2_hashmap_size=12, num_candidates=128, max_samples_per_ray=16,
                    cone_angle=0.0),
        wavelengths=[], num_classes=2, num_images=2,
    )
    params, occ = model.init(jax.random.PRNGKey(0))
    params["mlp_base"]["layers"][-1]["b"] = (
        params["mlp_base"]["layers"][-1]["b"] + 100.0
    )
    occ = mark_all_occupied(occ)
    n = 16
    rays = {
        "origins": jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
        "directions": jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1)),
        "camera_indices": jnp.zeros(n, jnp.int32),
    }
    batch = {"image": jax.random.uniform(jax.random.PRNGKey(1), (n, 4))}

    def total(p):
        out = model.forward(p, occ, rays, rng=jax.random.PRNGKey(2))
        return sum(model.loss(out, batch, jax.random.PRNGKey(3)).values())

    val, grads = jax.value_and_grad(total)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
