"""Compositing tests: masked fixed-shape weights vs the dense golden math."""

import jax
import jax.numpy as jnp
import numpy as np

from umhs_tpu.ops.compositing import (
    accumulate,
    exclusive_cumsum,
    get_weights_dense,
    render_accumulation,
    render_depth_expected,
    render_weights,
)


def test_exclusive_cumsum():
    x = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(exclusive_cumsum(x), [[0.0, 1.0, 3.0]])


def test_weights_match_dense_reference():
    """With a full mask and no filtering, render_weights must equal the
    reference's dense cumsum helper (umhs_renderer.py:117-138)."""
    rng = np.random.default_rng(0)
    R, S = 4, 16
    t = np.sort(rng.uniform(0.1, 2.0, (R, S + 1)), axis=-1)
    t_starts, t_ends = t[:, :-1], t[:, 1:]
    sigmas = rng.uniform(0.0, 20.0, (R, S))
    mask = jnp.ones((R, S), dtype=bool)

    w = render_weights(
        jnp.asarray(t_starts), jnp.asarray(t_ends), jnp.asarray(sigmas), mask,
        alpha_thre=0.0, early_stop_eps=0.0,
    )
    deltas = jnp.asarray(t_ends - t_starts)[..., None]
    dens = jnp.asarray(sigmas)[..., None]
    w_ref = get_weights_dense(deltas, dens)[..., 0]
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-5, atol=1e-7)


def test_padding_lanes_zero_weight():
    R, S = 2, 8
    t_starts = jnp.tile(jnp.arange(S, dtype=jnp.float32)[None], (R, 1)) * 0.1
    t_ends = t_starts + 0.1
    sigmas = jnp.ones((R, S)) * 5.0
    mask = jnp.tile((jnp.arange(S) < 4)[None], (R, 1))
    w = np.asarray(render_weights(t_starts, t_ends, sigmas, mask))
    assert (w[:, 4:] == 0).all()
    assert (w[:, :4] > 0).all()


def test_masked_samples_do_not_attenuate():
    """A masked lane in the middle must not reduce later transmittance."""
    t_starts = jnp.array([[0.0, 0.1, 0.2]])
    t_ends = t_starts + 0.1
    sigmas = jnp.array([[1.0, 100.0, 1.0]])
    full = render_weights(t_starts, t_ends, sigmas, jnp.array([[True, True, True]]),
                          early_stop_eps=0.0)
    holed = render_weights(t_starts, t_ends, sigmas, jnp.array([[True, False, True]]),
                           early_stop_eps=0.0)
    assert holed[0, 2] > full[0, 2]
    assert holed[0, 1] == 0.0


def test_alpha_threshold_filtering():
    t_starts = jnp.array([[0.0, 0.1]])
    t_ends = t_starts + 0.1
    sigmas = jnp.array([[0.001, 50.0]])  # alpha ~1e-4 then large
    mask = jnp.ones((1, 2), dtype=bool)
    w = np.asarray(render_weights(t_starts, t_ends, sigmas, mask, alpha_thre=0.01))
    assert w[0, 0] == 0.0
    assert w[0, 1] > 0.5


def test_early_stop():
    S = 10
    t_starts = jnp.arange(S, dtype=jnp.float32)[None] * 0.1
    t_ends = t_starts + 0.1
    sigmas = jnp.full((1, S), 1000.0)  # opaque immediately
    mask = jnp.ones((1, S), dtype=bool)
    w = np.asarray(render_weights(t_starts, t_ends, sigmas, mask, early_stop_eps=1e-4))
    assert w[0, 0] > 0.99
    assert (w[0, 2:] == 0).all()


def test_accumulate_and_depth():
    R, S, C = 3, 5, 7
    key = jax.random.PRNGKey(0)
    w = jax.nn.softmax(jax.random.normal(key, (R, S)))
    v = jax.random.uniform(jax.random.PRNGKey(1), (R, S, C))
    out = accumulate(w, v)
    assert out.shape == (R, C)
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("rs,rsc->rc", np.asarray(w), np.asarray(v)), rtol=1e-5
    )
    acc = render_accumulation(w)
    np.testing.assert_allclose(np.asarray(acc), 1.0, rtol=1e-5)

    t_starts = jnp.tile(jnp.arange(S, dtype=jnp.float32)[None], (R, 1))
    t_ends = t_starts + 1.0
    mask = jnp.ones((R, S), dtype=bool)
    depth = render_depth_expected(w, t_starts, t_ends, mask)
    assert depth.shape == (R, 1)
    mids = np.asarray(t_starts) + 0.5
    expected = (np.asarray(w) * mids).sum(-1) / np.asarray(w).sum(-1)
    np.testing.assert_allclose(np.asarray(depth)[:, 0], expected, rtol=1e-4)


def test_weights_differentiable():
    t_starts = jnp.array([[0.0, 0.1, 0.2]])
    t_ends = t_starts + 0.1
    mask = jnp.ones((1, 3), dtype=bool)

    def loss(sig):
        w = render_weights(t_starts, t_ends, sig, mask)
        return jnp.sum(w * jnp.array([[1.0, 2.0, 3.0]]))

    g = jax.grad(loss)(jnp.array([[1.0, 2.0, 3.0]]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
