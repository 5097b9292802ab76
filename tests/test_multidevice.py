"""Multi-device (8-way virtual CPU mesh) sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umhs_tpu.parallel.mesh import batch_sharded, make_mesh, put_replicated, replicated


def test_eight_devices_available():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, batch_sharded(mesh))
    assert len(xs.sharding.device_set) == 8
    xr = jax.device_put(x, replicated(mesh))
    assert xr.sharding.is_fully_replicated


def test_dryrun_multichip_entrypoint():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_forward_matches_single_device():
    """The mesh-sharded forward must be numerically identical to unsharded."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g
    from umhs_tpu.ops.occupancy import mark_all_occupied
    from umhs_tpu.parallel.mesh import make_mesh, put_replicated, shard_rays

    model = g._small_flagship()
    params, occ = model.init(jax.random.PRNGKey(0))
    occ = mark_all_occupied(occ)
    rays = g._example_rays(64, jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)

    out_single = jax.jit(
        lambda p, o, r: model.forward(p, o, r, rng=rng, train=True)
    )(params, occ, rays)

    mesh = make_mesh()
    p_r = put_replicated(params, mesh)
    o_r = put_replicated(occ, mesh)

    def fwd(p, o, r):
        r = shard_rays(r, mesh)
        return model.forward(p, o, r, rng=rng, train=True)

    with mesh:
        out_sharded = jax.jit(fwd)(p_r, o_r, rays)

    for k in out_single:
        np.testing.assert_allclose(
            np.asarray(out_single[k]),
            np.asarray(out_sharded[k]),
            atol=2e-5,
            rtol=2e-4,
            err_msg=k,
        )


def _flagship_setup(num_rays=128):
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g
    from umhs_tpu.ops.occupancy import mark_all_occupied

    model = g._small_flagship()
    params, occ = model.init(jax.random.PRNGKey(0))
    occ = mark_all_occupied(occ)
    rays = g._example_rays(num_rays, jax.random.PRNGKey(1))
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(2), (num_rays, 4)),
        "hs_image": jax.random.uniform(jax.random.PRNGKey(3), (num_rays, 21)),
    }
    return model, params, occ, rays, batch


def test_shard_map_grads_match_per_shard_simulation():
    """make_grad_fn under the mesh == running compute() per shard slice with
    the same folded keys and averaging — validates the shard_map wiring."""
    from umhs_tpu.parallel.mesh import make_grad_fn, make_mesh

    model, params, occ, rays, batch = _flagship_setup(128)
    mesh = make_mesh()
    n = 8
    k_march, k_bg = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
    step = jnp.zeros((), jnp.int32)

    sharded_fn = jax.jit(make_grad_fn(model, mesh, compact_budget=2048))
    total_s, ld_s, metrics_s, grads_s = sharded_fn(
        params, occ, rays, batch, k_march, k_bg, step
    )

    # single-device simulation of the 8 shards
    local_fn = jax.jit(make_grad_fn(model, None, compact_budget=2048 // n))
    totals, grads_all, nspb = [], [], 0.0
    per = 128 // n
    for i in range(n):
        sl = lambda x: x[i * per : (i + 1) * per]
        t_i, _, m_i, g_i = local_fn(
            params,
            occ,
            jax.tree.map(sl, rays),
            jax.tree.map(sl, batch),
            jax.random.fold_in(k_march, i),
            jax.random.fold_in(k_bg, i),
            step,
        )
        totals.append(float(t_i))
        grads_all.append(g_i)
        nspb += float(m_i["num_samples_per_batch"])

    np.testing.assert_allclose(float(total_s), np.mean(totals), rtol=2e-4)
    assert float(metrics_s["num_samples_per_batch"]) == nspb
    mean_grads = jax.tree.map(
        lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs]), axis=0),
        *grads_all,
    )
    flat_s, _ = jax.tree_util.tree_flatten(grads_s)
    flat_m, _ = jax.tree_util.tree_flatten(mean_grads)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        )


def test_shard_local_compaction_no_resharding_collectives():
    """The compiled sharded train-grad must contain NO all-gather /
    all-to-all / collective-permute: compaction is shard-local; the only
    collectives are the explicit grads pmean + sample-count psum
    (all-reduce)."""
    from umhs_tpu.parallel.mesh import make_grad_fn, make_mesh

    model, params, occ, rays, batch = _flagship_setup(128)
    mesh = make_mesh()
    fn = jax.jit(make_grad_fn(model, mesh, compact_budget=2048))
    compiled = fn.lower(
        params, occ, rays, batch,
        jax.random.PRNGKey(5), jax.random.PRNGKey(6), jnp.zeros((), jnp.int32),
    ).compile()
    txt = compiled.as_text()
    assert "all-gather" not in txt, "unexpected all-gather in sharded step"
    assert "all-to-all" not in txt, "unexpected all-to-all in sharded step"
    assert "collective-permute" not in txt, "unexpected collective-permute"
    assert "all-reduce" in txt  # the grads pmean must exist


def test_eval_forward_sharded_no_collectives():
    """The eval/render forward is ray-sharded under the mesh (not
    replicated): its compiled HLO must contain NO collectives at all, and
    its results must match the unsharded forward exactly."""
    from umhs_tpu.parallel.mesh import make_eval_forward, make_mesh

    model, params, occ, rays, _ = _flagship_setup(128)
    mesh = make_mesh()
    key = jax.random.PRNGKey(9)

    step = jnp.zeros((), jnp.int32)
    fn = jax.jit(make_eval_forward(model, mesh))
    lowered = fn.lower(params, occ, rays, key, step)
    txt = lowered.compile().as_text()
    for coll in ("all-gather", "all-to-all", "collective-permute", "all-reduce"):
        assert coll not in txt, f"unexpected {coll} in sharded eval forward"
    # the ray axis really is partitioned across the 8 devices
    assert 'sharding={devices=[8' in lowered.as_text() or "data" in str(
        jax.tree_util.tree_leaves(fn(params, occ, rays, key, step))[0].sharding
    )

    out_s = fn(params, occ, rays, key, step)
    out_r = jax.jit(make_eval_forward(model, None))(params, occ, rays, key, step)
    for k in out_r:
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_r[k]), atol=2e-5, rtol=2e-4,
            err_msg=k,
        )
