"""Proposal-sampling ops: PDF resampling, interlevel + distortion losses."""

import jax
import jax.numpy as jnp
import numpy as np

from umhs_tpu.ops.proposal_sampling import (
    distortion_loss,
    interlevel_loss,
    pdf_resample,
    sdist_to_t,
    uniform_bins,
    _outer_measure,
)


def test_sdist_warp():
    s = jnp.array([0.0, 0.5, 1.0])
    t = np.asarray(sdist_to_t(s, near=0.1, far=100.0))
    np.testing.assert_allclose(t[0], 0.1, rtol=1e-5)
    np.testing.assert_allclose(t[2], 100.0, rtol=1e-5)
    assert 0.1 < t[1] < 1.0  # disparity spacing front-loads samples


def test_uniform_bins():
    b = np.asarray(uniform_bins(4, 8))
    assert b.shape == (4, 9)
    np.testing.assert_allclose(b[:, 0], 0.0)
    np.testing.assert_allclose(b[:, -1], 1.0)
    assert (np.diff(b, axis=1) > 0).all()
    bj = np.asarray(uniform_bins(4, 8, rng=jax.random.PRNGKey(0)))
    assert not np.allclose(b, bj)
    assert (np.diff(bj, axis=1) >= 0).all()


def test_pdf_resample_concentrates():
    """Resampled bins must cluster where the weights are."""
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17), (2, 17))
    w = jnp.zeros((2, 16)).at[:, 8:12].set(1.0)  # mass in [0.5, 0.75]
    new = np.asarray(pdf_resample(bins, w, 16, padding=0.0001))
    assert new.shape == (2, 17)
    assert (np.diff(new, axis=1) >= 0).all()
    inside = ((new >= 0.49) & (new <= 0.76)).mean()
    assert inside > 0.8, inside


def test_pdf_resample_uniform_stays_uniform():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 33), (1, 33))
    w = jnp.ones((1, 32))
    new = np.asarray(pdf_resample(bins, w, 32))
    np.testing.assert_allclose(new[0], np.linspace(0, 1, 33), atol=0.02)


def test_outer_measure_identity():
    """Outer measure of a histogram onto its own bins >= the weights."""
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
    w = jnp.asarray(np.random.default_rng(0).random((1, 8)).astype(np.float32))
    outer = np.asarray(_outer_measure(bins, bins, w))
    assert (outer >= np.asarray(w) - 1e-6).all()


def test_interlevel_loss_zero_when_proposal_covers():
    """A proposal identical to the final histogram incurs ~zero loss."""
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17), (3, 17))
    w = jax.random.uniform(jax.random.PRNGKey(0), (3, 16))
    loss = float(interlevel_loss(bins, w, bins, w))
    assert loss < 1e-10


def test_interlevel_loss_penalises_miss():
    """Proposal mass far from the final mass must be penalised."""
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17), (1, 17))
    w_final = jnp.zeros((1, 16)).at[:, 12].set(1.0)
    w_prop_good = jnp.zeros((1, 16)).at[:, 12].set(1.0)
    w_prop_bad = jnp.zeros((1, 16)).at[:, 2].set(1.0)
    good = float(interlevel_loss(bins, w_prop_good, bins, w_final))
    bad = float(interlevel_loss(bins, w_prop_bad, bins, w_final))
    assert good < 1e-10
    assert bad > 0.5


def test_interlevel_grads_to_proposal_only():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
    wp = jnp.ones((1, 8)) * 0.05
    wf = jnp.zeros((1, 8)).at[:, 4].set(0.9)
    g = jax.grad(lambda p: interlevel_loss(bins, p, bins, wf))(wp)
    assert np.abs(np.asarray(g)).sum() > 0
    gf = jax.grad(lambda f: interlevel_loss(bins, wp, bins, f))(wf)
    np.testing.assert_allclose(np.asarray(gf), 0.0)


def test_distortion_loss():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17), (1, 17))
    w_spread = jnp.ones((1, 16)) / 16.0
    w_tight = jnp.zeros((1, 16)).at[:, 8].set(1.0)
    assert float(distortion_loss(bins, w_tight)) < float(distortion_loss(bins, w_spread))

    # brute-force check of the O(N) cumulative form
    rng = np.random.default_rng(1)
    w = rng.random((1, 16)).astype(np.float32)
    mids = np.asarray((bins[:, :-1] + bins[:, 1:]) / 2)[0]
    widths = np.asarray(bins[:, 1:] - bins[:, :-1])[0]
    pair = sum(
        w[0, i] * w[0, j] * abs(mids[i] - mids[j])
        for i in range(16)
        for j in range(16)
    )
    brute = pair + (w[0] ** 2 * widths).sum() / 3.0
    np.testing.assert_allclose(
        float(distortion_loss(bins, jnp.asarray(w))), brute, rtol=1e-4
    )
