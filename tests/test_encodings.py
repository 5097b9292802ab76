"""Tests for frequency, spherical-harmonic, and hash-grid encodings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umhs_tpu.ops.encodings import (
    HashEncodingConfig,
    hash_encode,
    init_hash_table,
    nerf_encoding,
    sh_encoding,
)


class TestNerfEncoding:
    def test_shape_and_values(self):
        x = jnp.array([[0.25, 0.0, 1.0]])
        enc = nerf_encoding(x, num_frequencies=2, min_freq_exp=0.0, max_freq_exp=1.0)
        assert enc.shape == (1, 12)
        e = np.asarray(enc)
        # first feature block is sin/cos of 2*pi*x at freqs {1, 2}
        np.testing.assert_allclose(e[0, 0], np.sin(2 * np.pi * 0.25), atol=1e-6)
        np.testing.assert_allclose(e[0, 1], np.sin(4 * np.pi * 0.25), atol=1e-6)
        np.testing.assert_allclose(e[0, 2], np.cos(2 * np.pi * 0.25), atol=1e-6)

    def test_include_input(self):
        x = jnp.ones((3, 2))
        enc = nerf_encoding(x, num_frequencies=3, max_freq_exp=2.0, include_input=True)
        assert enc.shape == (3, 2 + 2 * 3 * 2)


class TestSHEncoding:
    def test_shape(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        assert sh_encoding(d, levels=4).shape == (1, 16)
        assert sh_encoding(d, levels=2).shape == (1, 4)

    def test_degree0_constant(self):
        d = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        enc = np.asarray(sh_encoding(d))
        np.testing.assert_allclose(enc[:, 0], 0.28209479177387814, atol=1e-6)

    def test_orthonormality(self):
        """Monte-Carlo check: int Y_i Y_j dOmega = delta_ij (x 4pi / N)."""
        key = jax.random.PRNGKey(1)
        d = jax.random.normal(key, (200000, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        Y = np.asarray(sh_encoding(d))  # (N, 16)
        gram = (Y.T @ Y) / Y.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


class TestHashEncoding:
    CFG = HashEncodingConfig(
        num_levels=4, features_per_level=2, log2_hashmap_size=12, base_resolution=4, max_resolution=32
    )

    def test_table_layout(self):
        cfg = self.CFG
        # coarse levels are dense (res^3 entries), fine levels capped by hashmap
        assert cfg.level_sizes[0] == cfg.resolutions[0] ** 3
        assert cfg.level_sizes[-1] == min(cfg.resolutions[-1] ** 3, cfg.hashmap_size)
        assert cfg.table_size == sum(cfg.level_sizes)
        assert cfg.output_dim == 8

    def test_shapes(self):
        cfg = self.CFG
        table = init_hash_table(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
        out = hash_encode(table, x, cfg)
        assert out.shape == (17, cfg.output_dim)
        out2 = hash_encode(table, x.reshape(1, 17, 3), cfg)
        assert out2.shape == (1, 17, cfg.output_dim)
        np.testing.assert_allclose(out, out2[0], atol=1e-6)

    def test_interpolation_continuity(self):
        """Encoding must be continuous: tiny position deltas -> tiny output deltas."""
        cfg = self.CFG
        table = init_hash_table(jax.random.PRNGKey(0), cfg) * 1e4  # amplify
        x = jnp.array([[0.37, 0.52, 0.81]])
        eps = 1e-5
        a = hash_encode(table, x, cfg)
        b = hash_encode(table, x + eps, cfg)
        assert np.abs(np.asarray(a - b)).max() < 1e-2

    def test_gradient_flows_to_table(self):
        cfg = self.CFG
        table = init_hash_table(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3))

        def loss(t):
            return jnp.sum(hash_encode(t, x, cfg) ** 2)

        g = jax.grad(loss)(table)
        assert np.asarray(jnp.abs(g).sum()) > 0

    def test_big_config_matches_reference_dims(self):
        cfg = HashEncodingConfig()  # reference defaults: 16 levels, 2^19, 16->2048
        assert cfg.output_dim == 32
        assert cfg.num_levels == 16
        assert abs(cfg.growth_factor - 1.3819) < 1e-3
        # first level is dense 17^3 < 2^19; last levels hash-capped
        assert cfg.level_sizes[0] == cfg.resolutions[0] ** 3
        assert cfg.level_sizes[-1] == 1 << 19

    def test_distinct_positions_distinct_features(self):
        cfg = self.CFG
        table = init_hash_table(jax.random.PRNGKey(3), cfg)
        a = hash_encode(table, jnp.array([[0.1, 0.1, 0.1]]), cfg)
        b = hash_encode(table, jnp.array([[0.9, 0.9, 0.9]]), cfg)
        assert np.abs(np.asarray(a - b)).max() > 0


class TestHashEncodingLaneLayout:
    """Production lane-layout implementation must match the reference impl."""

    def test_matches_reference_small(self):
        from umhs_tpu.ops.encodings import hash_encode_reference

        cfg = TestHashEncoding.CFG
        table = init_hash_table(jax.random.PRNGKey(7), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(8), (37, 3))
        a = np.asarray(hash_encode(table, x, cfg))
        b = np.asarray(hash_encode_reference(table, x, cfg))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)

    def test_matches_reference_full_config(self):
        from umhs_tpu.ops.encodings import hash_encode_reference

        cfg = HashEncodingConfig()  # 16 levels, 2^19 — the real model config
        table = init_hash_table(jax.random.PRNGKey(9), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(10), (64, 3))
        a = np.asarray(hash_encode(table, x, cfg))
        b = np.asarray(hash_encode_reference(table, x, cfg))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)

    def test_boundary_positions(self):
        from umhs_tpu.ops.encodings import hash_encode_reference

        cfg = TestHashEncoding.CFG
        table = init_hash_table(jax.random.PRNGKey(11), cfg)
        x = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.5]])
        a = np.asarray(hash_encode(table, x, cfg))
        b = np.asarray(hash_encode_reference(table, x, cfg))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)

    def test_custom_vjp_matches_autodiff(self):
        """The width-1 scatter backward must equal autodiff of the reference."""
        from umhs_tpu.ops.encodings import hash_encode_reference

        cfg = TestHashEncoding.CFG
        table = init_hash_table(jax.random.PRNGKey(12), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(13), (29, 3))
        cot = jax.random.normal(jax.random.PRNGKey(14), (29, cfg.output_dim))

        g_prod = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg) * cot))(table)
        g_ref = jax.grad(lambda t: jnp.sum(hash_encode_reference(t, x, cfg) * cot))(
            table
        )
        np.testing.assert_allclose(np.asarray(g_prod), np.asarray(g_ref), rtol=1e-4, atol=1e-7)

    def test_stochastic_grad_unbiased_support(self):
        """Stochastic one-corner backward: per-level gradient mass must equal
        the dense backward's (each sample deposits exactly g at one corner),
        and its support must be a subset of the dense gradient's support."""
        import dataclasses

        from umhs_tpu.ops.encodings import hash_encode_reference

        cfg = dataclasses.replace(TestHashEncoding.CFG, stochastic_grad=True)
        cfg_dense = TestHashEncoding.CFG
        table = init_hash_table(jax.random.PRNGKey(20), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(21), (64, 3))
        cot = jax.random.normal(jax.random.PRNGKey(22), (64, cfg.output_dim))

        g_sto = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg) * cot))(table)
        g_dense = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg_dense) * cot))(
            table
        )
        # total gradient mass per feature column is preserved exactly
        np.testing.assert_allclose(
            np.asarray(g_sto.sum(axis=0)), np.asarray(g_dense.sum(axis=0)), rtol=1e-4
        )
        # support subset: stochastic touches only rows the dense grad touches
        sto_rows = np.unique(np.nonzero(np.asarray(g_sto))[0])
        dense_rows = set(np.unique(np.nonzero(np.asarray(g_dense))[0]).tolist())
        assert all(r in dense_rows for r in sto_rows)
        # and strictly fewer rows (one corner instead of eight)
        assert len(sto_rows) < len(dense_rows)


class TestTetrahedralInterpolation:
    """4-vertex simplex interpolation (ops/encodings.py tetrahedral mode):
    half the gather rows of trilinear; must be exact at corners, convex,
    continuous, with a consistent custom VJP."""

    import dataclasses as _dc

    CFG = _dc.replace(TestHashEncoding.CFG, interpolation="tetrahedral")

    def test_exact_at_grid_corners(self):
        # single dense level: at integer corner coords the encoding must
        # equal the table row exactly (all schemes agree at corners)
        import dataclasses

        cfg = dataclasses.replace(
            self.CFG, num_levels=1, base_resolution=4, max_resolution=4
        )
        table = init_hash_table(jax.random.PRNGKey(0), cfg) * 1e4
        res = cfg.resolutions[0]
        scale = cfg.scales[0]
        t2 = table.reshape(-1, cfg.features_per_level)
        for corner in [(0, 0, 0), (1, 2, 3), (3, 3, 3)]:
            # tcnn convention: grid coord = pos*scale + 0.5
            pos = jnp.asarray([(c - 0.5) / scale for c in corner])[None]
            out = np.asarray(hash_encode(table, pos, cfg))[0]
            idx = corner[0] + corner[1] * res + corner[2] * res * res
            np.testing.assert_allclose(out, np.asarray(t2[idx]), rtol=1e-4)

    def test_weights_are_barycentric(self):
        from umhs_tpu.ops.encodings import _lane_iw_tetra

        cfg = self.CFG
        x = jax.random.uniform(jax.random.PRNGKey(1), (50, 3))
        idx, w, lane = _lane_iw_tetra(x, cfg)
        assert idx.shape == w.shape == (50, cfg.num_levels * 4)
        wl = np.asarray(w).reshape(50, cfg.num_levels, 4)
        np.testing.assert_allclose(wl.sum(-1), 1.0, atol=1e-5)
        assert (wl >= -1e-6).all()

    def test_continuity(self):
        cfg = self.CFG
        table = init_hash_table(jax.random.PRNGKey(2), cfg) * 1e4
        # cross a cell face and a diagonal (sorting-order change)
        for x0 in ([0.37, 0.52, 0.81], [0.5, 0.5, 0.5], [0.3, 0.3, 0.3]):
            x = jnp.asarray([x0])
            eps = 1e-6
            a = hash_encode(table, x, cfg)
            for delta in ([eps, 0, 0], [0, eps, 0], [eps, eps, eps], [-eps, eps, 0]):
                b = hash_encode(table, x + jnp.asarray([delta]), cfg)
                assert np.abs(np.asarray(a - b)).max() < 1e-2

    def test_custom_vjp_matches_autodiff_of_impl(self):
        from umhs_tpu.ops.encodings import _hash_encode_impl

        cfg = self.CFG
        table = init_hash_table(jax.random.PRNGKey(3), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(4), (29, 3))
        cot = jax.random.normal(jax.random.PRNGKey(5), (29, cfg.output_dim))

        g_vjp = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg) * cot))(table)
        g_auto = jax.grad(
            lambda t: jnp.sum(_hash_encode_impl(t, x, cfg) * cot)
        )(table)
        np.testing.assert_allclose(
            np.asarray(g_vjp), np.asarray(g_auto), rtol=1e-4, atol=1e-7
        )

    def test_stochastic_grad_mass_preserved(self):
        import dataclasses

        cfg = dataclasses.replace(self.CFG, stochastic_grad=True)
        table = init_hash_table(jax.random.PRNGKey(6), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(7), (64, 3))
        cot = jax.random.normal(jax.random.PRNGKey(8), (64, cfg.output_dim))
        g_sto = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg) * cot))(table)
        g_dense = jax.grad(
            lambda t: jnp.sum(hash_encode(t, x, self.CFG) * cot)
        )(table)
        np.testing.assert_allclose(
            np.asarray(g_sto.sum()), np.asarray(g_dense.sum()), rtol=1e-4
        )

    def test_fewer_lanes_than_trilinear(self):
        from umhs_tpu.ops.encodings import _lane_indices_weights

        x = jax.random.uniform(jax.random.PRNGKey(9), (8, 3))
        idx_t, _, _ = _lane_indices_weights(x, self.CFG)
        idx_8, _, _ = _lane_indices_weights(x, TestHashEncoding.CFG)
        assert idx_t.shape[1] * 2 == idx_8.shape[1]


def test_split_dense_gather_bit_identical():
    """split_dense_gather regroups the forward gather into per-slice
    gathers (small-table fast path); outputs and table-grads must be
    BIT-identical to the single-gather path."""
    import dataclasses as dc

    for interp in ("trilinear", "tetrahedral"):
        cfg = HashEncodingConfig(
            num_levels=6, features_per_level=2, log2_hashmap_size=12,
            base_resolution=4, max_resolution=64, interpolation=interp,
        )
        cfg_split = dc.replace(cfg, split_dense_gather=True)
        assert len(cfg_split.gather_groups) >= 2
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, cfg)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))

        f = lambda c: lambda t: jnp.sum(hash_encode(t, pos, c) ** 2)
        v0, g0 = jax.value_and_grad(f(cfg))(table)
        v1, g1 = jax.value_and_grad(f(cfg_split))(table)
        np.testing.assert_array_equal(
            np.asarray(hash_encode(table, pos, cfg)),
            np.asarray(hash_encode(table, pos, cfg_split)),
        )
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
