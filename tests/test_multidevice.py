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
