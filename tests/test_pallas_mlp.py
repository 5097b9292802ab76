"""Pallas fused-MLP kernel vs the reference jnp implementation.

Runs in Pallas interpret mode so the 8-device CPU test mesh can execute the
kernel; on TPU the same code compiles natively (apply_mlp auto-dispatches).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from umhs_tpu.ops.mlp import apply_mlp, init_mlp
from umhs_tpu.ops.pallas.mlp_fused import mlp_apply_fused


def _setup(in_dim=27, width=64, out_dim=5, layers=3, n=300):
    params = init_mlp(
        jax.random.PRNGKey(0), in_dim=in_dim, num_layers=layers,
        layer_width=width, out_dim=out_dim,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (n, in_dim))
    return params, x


class TestFusedMLP:
    def test_forward_matches_reference_f32(self):
        params, x = _setup()
        ref = apply_mlp(params, x, compute_dtype=jnp.float32, fused=False)
        with pltpu.force_tpu_interpret_mode():
            out = mlp_apply_fused(params, x, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_forward_matches_reference_bf16(self):
        params, x = _setup(n=1500)  # spans >1 tile
        ref = apply_mlp(params, x, compute_dtype=jnp.bfloat16, fused=False)
        with pltpu.force_tpu_interpret_mode():
            out = mlp_apply_fused(params, x, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)

    def test_grads_match_reference(self):
        params, x = _setup(n=1300)  # non-multiple of the tile: padding path
        cot = jax.random.normal(jax.random.PRNGKey(2), (1300, 5))

        def loss_ref(p, x):
            return jnp.sum(apply_mlp(p, x, compute_dtype=jnp.float32,
                                     fused=False) * cot)

        def loss_fused(p, x):
            return jnp.sum(mlp_apply_fused(p, x, compute_dtype=jnp.float32)
                           * cot)

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        with pltpu.force_tpu_interpret_mode():
            g_fus = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_single_layer(self):
        params = init_mlp(jax.random.PRNGKey(3), in_dim=16, num_layers=1,
                          layer_width=0, out_dim=21)
        x = jax.random.normal(jax.random.PRNGKey(4), (64, 16))
        ref = apply_mlp(params, x, compute_dtype=jnp.float32, fused=False)
        with pltpu.force_tpu_interpret_mode():
            out = mlp_apply_fused(params, x, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_out_activation_applied_outside(self):
        params, x = _setup(n=64)
        ref = apply_mlp(params, x, out_activation=jax.nn.sigmoid,
                        compute_dtype=jnp.float32, fused=False)
        with pltpu.force_tpu_interpret_mode():
            out = jax.nn.sigmoid(
                mlp_apply_fused(params, x, compute_dtype=jnp.float32)
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
