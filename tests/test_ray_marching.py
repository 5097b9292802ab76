"""Static-shape ray marching tests."""

import jax
import jax.numpy as jnp
import numpy as np

from umhs_tpu.ops.occupancy import (
    OccGridConfig,
    init_occ_state,
    mark_all_occupied,
    update_occ_state,
)
from umhs_tpu.ops.ray_marching import (
    MarchConfig,
    candidate_ts,
    march_rays,
    ray_aabb_intersect,
    sample_positions,
)

OCC = OccGridConfig(resolution=16, levels=2)
MARCH = MarchConfig(
    num_candidates=256, num_samples=32, render_step_size=0.02, cone_angle=0.0,
    near_plane=0.05, far_plane=100.0,
)


def test_ray_aabb_intersect():
    o = jnp.array([[-2.0, 0.0, 0.0], [0.0, 0.0, 0.0], [-2.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    tmin, tmax = ray_aabb_intersect(o, d, (-1, -1, -1), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(tmin)[:2], [1.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tmax)[:2], [3.0, 1.0], atol=1e-5)
    assert tmin[2] > tmax[2]  # miss


def test_candidate_schedule_uniform():
    ts, dts = candidate_ts(jnp.array([0.5]), MARCH)
    t = np.asarray(ts)[0]
    np.testing.assert_allclose(np.diff(t), MARCH.render_step_size, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dts)[0], MARCH.render_step_size, rtol=1e-6)


def test_candidate_schedule_cone_growth():
    march = MarchConfig(num_candidates=512, render_step_size=0.01, cone_angle=0.01)
    ts, dts = candidate_ts(jnp.array([0.1]), march)
    t = np.asarray(ts)[0]
    d = np.asarray(dts)[0]
    assert (np.diff(t) > 0).all()
    # late steps grow ~ t * cone_angle
    np.testing.assert_allclose(d[-1], t[-1] * 0.01, rtol=1e-3)
    # early steps clamped at render_step_size
    np.testing.assert_allclose(d[0], 0.01, rtol=1e-5)


def test_march_full_grid_starts_near_entry():
    s = mark_all_occupied(init_occ_state(OCC))
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    out = march_rays(s["binaries"], OCC, MARCH, o, d)
    assert out["t_starts"].shape == (1, 32)
    assert bool(out["mask"][0, 0])
    # grid spans +/-2 (2 levels), entry at t=1
    np.testing.assert_allclose(float(out["t_starts"][0, 0]), 1.0, atol=0.03)
    assert int(out["num_samples"][0]) == 32  # fully occupied -> saturates


def test_march_skips_empty_space():
    """Only a ball at origin occupied: samples concentrate near the ball."""
    cfg = OccGridConfig(resolution=32, levels=1)
    dens = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 0.25, 100.0, 0.0)
    s = init_occ_state(cfg)
    s = update_occ_state(s, cfg, dens, 0.02, jax.random.PRNGKey(0), full=True)
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    march = MarchConfig(num_candidates=512, num_samples=64, render_step_size=0.01,
                        cone_angle=0.0, near_plane=0.05, far_plane=10.0)
    out = march_rays(s["binaries"], cfg, march, o, d)
    n = int(out["num_samples"][0])
    assert n > 0
    ts = np.asarray(out["t_starts"][0, :n])
    # ball spans t in [1.75 - eps, 2.25 + eps] along this ray (entry at x=-0.25)
    assert ts.min() > 1.6 and ts.max() < 2.45


def test_march_miss_gives_empty():
    cfg = OccGridConfig(resolution=8, levels=1)
    s = init_occ_state(cfg)  # nothing occupied
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    out = march_rays(s["binaries"], cfg, MARCH, o, d)
    assert int(out["num_samples"][0]) == 0
    assert not bool(out["mask"].any())


def test_stratified_jitter_changes_samples():
    s = mark_all_occupied(init_occ_state(OCC))
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    a = march_rays(s["binaries"], OCC, MARCH, o, d, rng=jax.random.PRNGKey(0))
    b = march_rays(s["binaries"], OCC, MARCH, o, d, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a["t_starts"]), np.asarray(b["t_starts"]))


def test_sample_positions_midpoints():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 2.0]])  # non-unit: must be normalised internally
    t_starts = jnp.array([[1.0, 2.0]])
    t_ends = jnp.array([[1.5, 2.5]])
    pos = np.asarray(sample_positions(o, d, t_starts, t_ends))
    np.testing.assert_allclose(pos[0, 0], [0, 0, 1.25], atol=1e-6)
    np.testing.assert_allclose(pos[0, 1], [0, 0, 2.25], atol=1e-6)


def test_march_jittable():
    s = mark_all_occupied(init_occ_state(OCC))
    f = jax.jit(lambda b, o, d: march_rays(b, OCC, MARCH, o, d))
    out = f(s["binaries"], jnp.array([[-3.0, 0.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    assert out["t_starts"].shape == (1, 32)


def test_occ_subsampled_march_matches_fine():
    """Cell-granular occupancy (occ_subsamples=4) must cover the same region
    as per-step queries on a fully occupied grid."""
    s = mark_all_occupied(init_occ_state(OCC))
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    fine = MarchConfig(num_candidates=256, num_samples=32, render_step_size=0.02,
                       cone_angle=0.0, near_plane=0.05, far_plane=100.0)
    sub = MarchConfig(num_candidates=256, num_samples=32, render_step_size=0.02,
                      cone_angle=0.0, near_plane=0.05, far_plane=100.0,
                      occ_subsamples=4)
    a = march_rays(s["binaries"], OCC, fine, o, d)
    b = march_rays(s["binaries"], OCC, sub, o, d)
    # both saturate the budget starting at grid entry (t=1)
    assert int(a["num_samples"][0]) == 32
    assert int(b["num_samples"][0]) == 32
    np.testing.assert_allclose(float(b["t_starts"][0, 0]), 1.0, atol=0.03)
    # fine intervals are contiguous within each coarse interval
    ts = np.asarray(b["t_starts"][0])
    te = np.asarray(b["t_ends"][0])
    np.testing.assert_allclose(te[0:3], ts[1:4], rtol=1e-5)


def test_occ_subsampled_skips_empty():
    cfg = OccGridConfig(resolution=32, levels=1)
    dens = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 0.25, 100.0, 0.0)
    s = init_occ_state(cfg)
    s = update_occ_state(s, cfg, dens, 0.02, jax.random.PRNGKey(0), full=True)
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    march = MarchConfig(num_candidates=512, num_samples=64, render_step_size=0.01,
                        cone_angle=0.0, near_plane=0.05, far_plane=10.0,
                        occ_subsamples=4)
    out = march_rays(s["binaries"], cfg, march, o, d)
    n = int(out["num_samples"][0])
    assert n > 0 and n % 4 == 0
    ts = np.asarray(out["t_starts"][0, :n])
    assert ts.min() > 1.55 and ts.max() < 2.5


class TestHierarchicalMarch:
    """Two-stage pooled-grid marching (MarchConfig.pool): must agree with the
    flat path on dense grids and skip empty space on sparse ones."""

    def _setup(self, pool):
        occ_cfg = OccGridConfig(resolution=16, levels=1, pool=pool)
        march = MarchConfig(
            num_candidates=256, num_samples=64, render_step_size=0.02,
            cone_angle=0.0, near_plane=0.05, far_plane=100.0,
            occ_subsamples=2, pool=pool, pool_supers=32,
        )
        o = jnp.array([[-2.0, 0.05, 0.0], [-2.0, 0.4, 0.3], [-2.0, 5.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]] * 3)
        return occ_cfg, march, o, d

    def test_dense_grid_matches_flat_path(self):
        occ_cfg, march, o, d = self._setup(pool=4)
        state = mark_all_occupied(init_occ_state(occ_cfg))
        out_h = march_rays(
            state["binaries"], occ_cfg, march, o, d,
            binaries_pooled=state["binaries_pooled"],
        )
        import dataclasses

        flat = dataclasses.replace(march, pool=0)
        out_f = march_rays(state["binaries"], occ_cfg, flat, o, d)
        # cone=0, ample budgets: stage A subdividing reproduces the exact
        # flat candidate schedule, so the outputs must match exactly
        for k in ("t_starts", "t_ends", "mask", "num_samples"):
            np.testing.assert_allclose(
                np.asarray(out_h[k]), np.asarray(out_f[k]), atol=1e-6, err_msg=k
            )
        assert int(out_h["num_samples"][0]) > 0
        assert int(out_h["num_samples"][2]) == 0  # ray misses the box

    def test_sparse_grid_skips_empty_space(self):
        occ_cfg, march, o, d = self._setup(pool=4)
        state = init_occ_state(occ_cfg)
        res = occ_cfg.resolution
        # occupy one small region around x in [0, 0.125], y=z~0
        bin3 = np.zeros((res, res, res), dtype=bool)  # (z, y, x)
        bin3[8, 8, 8:10] = True
        binaries = jnp.asarray(bin3.reshape(-1))
        from umhs_tpu.ops.occupancy import _pool_binaries

        pooled = _pool_binaries(binaries, occ_cfg)
        out = march_rays(binaries, occ_cfg, march, o, d, binaries_pooled=pooled)
        ns = np.asarray(out["num_samples"])
        assert ns[0] > 0  # ray along y~0.06,z~0 passes the occupied cells
        assert ns[2] == 0
        # all returned sample midpoints lie inside occupied cells
        mids = (np.asarray(out["t_starts"][0]) + np.asarray(out["t_ends"][0])) / 2
        mask0 = np.asarray(out["mask"][0])
        pts = np.asarray(o[0])[None] + np.asarray(d[0])[None] * mids[:, None]
        pts = pts[mask0]
        ijk = np.clip(((pts + 1) / 2 * res).astype(int), 0, res - 1)
        assert bin3[ijk[:, 2], ijk[:, 1], ijk[:, 0]].all()

    def test_pooled_query_agrees_with_pooling(self):
        from umhs_tpu.ops.occupancy import _pool_binaries, query_occupancy

        occ_cfg = OccGridConfig(resolution=16, levels=2, pool=4)
        key = jax.random.PRNGKey(0)
        binaries = jax.random.bernoulli(key, 0.05, (2 * 16**3,))
        pooled = _pool_binaries(binaries, occ_cfg)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (512, 3), minval=-1.9,
                                 maxval=1.9)
        fine = np.asarray(query_occupancy(binaries, pts, occ_cfg))
        sup = np.asarray(query_occupancy(pooled, pts, occ_cfg, res=4))
        # a fine-occupied point must be supercell-occupied (no false negatives)
        assert (sup | ~fine).all()


class TestEarlyStopOD:
    """March-time early ray termination from the EMA occs values
    (nerfacc VolumetricSampler terminates at transmittance < 1e-4,
    /root/reference/umhsnerf/umhs_model.py:229-237)."""

    def _slab_state(self):
        # occupy an x-slab [0.0, 0.25] across the level-0 box with a huge
        # EMA value (optically thick); leave the rest empty
        occ = OccGridConfig(resolution=16, levels=1)
        state = init_occ_state(occ)
        res = occ.resolution
        ijk = np.stack(np.meshgrid(np.arange(res), np.arange(res),
                                   np.arange(res), indexing="ij"), -1)
        x = (ijk[..., 0] + 0.5) / res * 2.0 - 1.0
        slab = (x > 0.0) & (x < 0.25)
        flat = np.zeros((res**3,), np.float32)
        flat[slab.transpose(2, 1, 0).reshape(-1)] = 100.0  # density*step
        state["occs"] = jnp.asarray(flat)
        state["binaries"] = state["occs"] > 0.01
        return occ, state

    def test_culls_behind_opaque_slab(self):
        occ, state = self._slab_state()
        o = jnp.array([[-2.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        march = MarchConfig(num_candidates=256, num_samples=64,
                            render_step_size=0.02, cone_angle=0.0,
                            near_plane=0.05, far_plane=100.0,
                            early_stop_od=5.0)
        out = march_rays(state["binaries"], occ, march, o, d,
                         occs=state["occs"])
        # only the first slab entries survive: od grows by ~100*dt/step=100
        # per sample, so everything past the first sample is culled
        n_with = int(out["num_samples"][0])
        out_off = march_rays(state["binaries"], occ,
                             MarchConfig(num_candidates=256, num_samples=64,
                                         render_step_size=0.02, cone_angle=0.0,
                                         near_plane=0.05, far_plane=100.0,
                                         early_stop_od=0.0),
                             o, d, occs=state["occs"])
        n_without = int(out_off["num_samples"][0])
        assert n_without > n_with >= 1
        assert n_with <= 2  # od passes 5.0 within ~1 sample of slab entry

    def test_no_occs_is_noop(self):
        occ, state = self._slab_state()
        o = jnp.array([[-2.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        march = MarchConfig(num_candidates=256, num_samples=64,
                            render_step_size=0.02, cone_angle=0.0,
                            near_plane=0.05, far_plane=100.0,
                            early_stop_od=5.0)
        a = march_rays(state["binaries"], occ, march, o, d)  # no occs
        b = march_rays(state["binaries"], occ, march, o, d,
                       occs=jnp.zeros_like(state["occs"]))  # zero od
        assert int(a["num_samples"][0]) == int(b["num_samples"][0])


def test_row_table_march_matches_bitfield():
    """occ_rows / pooled_rows (8-byte row gathers) must march identically
    to the bool bitfields."""
    cfg = OccGridConfig(resolution=16, levels=2, pool=4)
    s = init_occ_state(cfg)

    def dens(p):
        return jnp.where(jnp.linalg.norm(p, axis=-1) < 0.5, 50.0, 0.0)

    s = update_occ_state(s, cfg, dens, 0.02, jax.random.PRNGKey(0), full=True)
    o = jnp.array([[-3.0, 0.05, 0.0], [-3.0, 0.9, 0.2]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    march = MarchConfig(num_candidates=256, num_samples=32,
                        render_step_size=0.02, cone_angle=0.0,
                        near_plane=0.05, far_plane=100.0, pool=4)
    a = march_rays(s["binaries"], cfg, march, o, d,
                   binaries_pooled=s["binaries_pooled"])
    b = march_rays(s["binaries"], cfg, march, o, d,
                   binaries_pooled=s["binaries_pooled"],
                   occ_rows=s["occ_rows"].reshape(-1, 2),
                   pooled_rows=s["pooled_rows"].reshape(-1, 2))
    np.testing.assert_array_equal(np.asarray(a["mask"]), np.asarray(b["mask"]))
    np.testing.assert_allclose(
        np.asarray(a["t_starts"]), np.asarray(b["t_starts"]), atol=1e-7
    )


def test_packed_words_march_matches_bitfield():
    """packed 4^3-supercell bit-words must march BIT-IDENTICALLY to the
    bool bitfield / row-table paths (same occupancy, same selection)."""
    cfg = OccGridConfig(resolution=16, levels=2, pool=4)
    s = init_occ_state(cfg)

    def dens(p):
        return jnp.where(jnp.linalg.norm(p - 0.21, axis=-1) < 0.45, 80.0, 0.0)

    s = update_occ_state(s, cfg, dens, 0.02, jax.random.PRNGKey(3), full=True)
    assert "packed_words" in s
    o = jnp.array([[-3.0, 0.05, 0.0], [-3.0, 0.9, 0.2], [-3.0, 0.2, 0.21]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.05, 0.02]])
    for pool in (0, 4):
        march = MarchConfig(num_candidates=256, num_samples=32,
                            render_step_size=0.02, cone_angle=0.004,
                            near_plane=0.05, far_plane=100.0, pool=pool,
                            occ_subsamples=2)
        kw = dict(binaries_pooled=s["binaries_pooled"]) if pool else {}
        a = march_rays(s["binaries"], cfg, march, o, d, **kw)
        b = march_rays(s["binaries"], cfg, march, o, d,
                       packed_words=s["packed_words"], **kw)
        np.testing.assert_array_equal(
            np.asarray(a["mask"]), np.asarray(b["mask"]), err_msg=f"pool={pool}"
        )
        np.testing.assert_allclose(
            np.asarray(a["t_starts"]), np.asarray(b["t_starts"]), atol=1e-7
        )
        np.testing.assert_array_equal(
            np.asarray(a["num_occupied"]), np.asarray(b["num_occupied"])
        )


def test_packed_query_matches_binaries():
    """query_packed_occupancy / query_packed_supercell vs direct queries on
    random positions across all cascade levels."""
    from umhs_tpu.ops.occupancy import (
        query_occupancy,
        query_packed_occupancy,
        query_packed_supercell,
    )

    cfg = OccGridConfig(resolution=16, levels=3, pool=4)
    s = init_occ_state(cfg)
    key = jax.random.PRNGKey(7)
    # random binary grid (exercise every bit position)
    bins = jax.random.bernoulli(key, 0.3, s["binaries"].shape)
    s = dict(s, binaries=bins)
    from umhs_tpu.ops.occupancy import _pack_supercell_words, _pool_binaries

    packed = _pack_supercell_words(bins, cfg)
    pooled = _pool_binaries(bins, cfg)
    pos = jax.random.uniform(
        jax.random.PRNGKey(8), (4096, 3), minval=-4.2, maxval=4.2
    )
    got = query_packed_occupancy(packed, pos, cfg)
    want = query_occupancy(bins, pos, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    got_s = query_packed_supercell(packed, pos, cfg)
    want_s = query_occupancy(pooled, pos, cfg, res=cfg.resolution // 4)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
