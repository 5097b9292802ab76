"""Occupancy grid tests: level selection, update, binarisation."""

import jax
import jax.numpy as jnp
import numpy as np

from umhs_tpu.ops.occupancy import (
    OccGridConfig,
    init_occ_state,
    mark_all_occupied,
    query_occupancy,
    update_occ_state,
)

CFG = OccGridConfig(resolution=16, levels=3)


def test_init_shapes():
    s = init_occ_state(CFG)
    assert s["occs"].shape == (3 * 16**3,)
    assert s["binaries"].shape == (3 * 16**3,)
    assert not bool(s["binaries"].any())


def test_query_level_selection():
    s = mark_all_occupied(init_occ_state(CFG))
    # inside level 0 / level 1 shell / level 2 shell / outside all
    pos = jnp.array(
        [[0.5, 0.0, 0.0], [1.5, 0.0, 0.0], [3.0, 0.0, 0.0], [9.0, 0.0, 0.0]]
    )
    occ = np.asarray(query_occupancy(s["binaries"], pos, CFG))
    assert occ.tolist() == [True, True, True, False]


def test_query_respects_binaries_per_level():
    s = init_occ_state(CFG)
    # mark only the level-0 cell containing the origin-ish point
    res = CFG.resolution
    ijk = np.floor(((np.array([0.5, 0.0, 0.0]) + 1) / 2) * res).astype(int)
    flat = ijk[0] + ijk[1] * res + ijk[2] * res * res
    binaries = s["binaries"].at[flat].set(True)
    occ = np.asarray(
        query_occupancy(binaries, jnp.array([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]]), CFG)
    )
    assert occ.tolist() == [True, False]


def _ball_density(x):
    """Density 50 inside a 0.3-radius ball at origin."""
    return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.3, 50.0, 0.0)


def test_update_marks_ball_occupied():
    cfg = OccGridConfig(resolution=16, levels=2)
    s = init_occ_state(cfg)
    s = update_occ_state(
        s, cfg, _ball_density, render_step_size=0.01, rng=jax.random.PRNGKey(0), full=True
    )
    inside = np.asarray(query_occupancy(s["binaries"], jnp.array([[0.0, 0.0, 0.0]]), cfg))
    far = np.asarray(query_occupancy(s["binaries"], jnp.array([[0.9, 0.9, 0.9]]), cfg))
    assert inside[0]
    assert not far[0]


def test_update_partial_then_decay():
    cfg = OccGridConfig(resolution=8, levels=1, ema_decay=0.5)
    s = init_occ_state(cfg)
    s = update_occ_state(s, cfg, _ball_density, 0.01, jax.random.PRNGKey(0), full=True)
    occ0 = float(s["occs"].max())
    # now zero density everywhere: occupied values should decay via EMA
    s2 = update_occ_state(
        s, cfg, lambda x: jnp.zeros(x.shape[:-1]), 0.01, jax.random.PRNGKey(1), full=True
    )
    assert float(s2["occs"].max()) <= occ0 * 0.5 + 1e-6


def test_update_jittable():
    cfg = OccGridConfig(resolution=8, levels=2)
    s = init_occ_state(cfg)
    f = jax.jit(
        lambda st, key: update_occ_state(st, cfg, _ball_density, 0.01, key, full=False)
    )
    s = f(s, jax.random.PRNGKey(0))
    assert s["occs"].shape == (2 * 8**3,)


def test_lower_envelope_tracker():
    """occs_low: rises geometrically (x2/update) under consistent density,
    collapses instantly on a low probe (boundary-cell behaviour) — the
    basis of quality-safe march termination."""
    cfg = OccGridConfig(resolution=8, levels=1)
    s = init_occ_state(cfg)
    high = lambda p: jnp.full(p.shape[:-1], 10.0)
    zero = lambda p: jnp.zeros(p.shape[:-1])
    key = jax.random.PRNGKey(0)
    for i in range(8):
        s = update_occ_state(s, cfg, high, 1.0, jax.random.fold_in(key, i), full=True)
    low8 = float(jnp.mean(s["occs_low"]))
    # geometric climb from the occ_thre seed: 0.01 * 2^7 = 1.28
    assert 0.5 < low8 < 3.0, low8
    for i in range(8, 40):
        s = update_occ_state(s, cfg, high, 1.0, jax.random.fold_in(key, i), full=True)
    assert float(jnp.mean(s["occs_low"])) > 8.0  # converges to the density
    # one zero probe collapses the envelope (heavy-tailed safety)
    s = update_occ_state(s, cfg, zero, 1.0, jax.random.fold_in(key, 99), full=True)
    assert float(jnp.mean(s["occs_low"])) == 0.0
    # the max-EMA stays high through the zero (slow 0.95 decay)
    assert float(jnp.mean(s["occs"])) > 8.0
