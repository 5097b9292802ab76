"""Proposal-network sampling (nerfacto-style uniform -> PDF resampling).

The reference's experiment scripts also train nerfstudio's `nerfacto`
(scripts/nerfacto.sh), whose sampler is a chain of proposal density networks
with PDF resampling instead of an occupancy grid. This module provides the
TPU-native sampling math: stratified uniform bins in s-space (uniform-in-
disparity warp for unbounded scenes), and PDF resampling by vectorised
inverse-CDF (binary search over the weight CDF — the same pattern as the
marcher's compaction, no sorts).

All shapes static: (R, N+1) bin edges, (R, N) weights.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sdist_to_t(s: jnp.ndarray, near: float, far: float) -> jnp.ndarray:
    """Uniform-in-disparity warp: s in [0,1] -> t in [near, far] with
    1/t linear in s (nerfacto's spacing for unbounded scenes)."""
    inv = (1.0 - s) / near + s / far
    return 1.0 / inv


def uniform_bins(
    num_rays: int, num_samples: int, rng: Optional[jax.Array] = None
) -> jnp.ndarray:
    """Stratified s-space bin edges (R, N+1) in [0, 1]."""
    edges = jnp.linspace(0.0, 1.0, num_samples + 1)
    edges = jnp.broadcast_to(edges, (num_rays, num_samples + 1))
    if rng is not None:
        # jitter interior edges within half a bin (stratified)
        delta = 1.0 / num_samples
        jitter = (jax.random.uniform(rng, (num_rays, 1)) - 0.5) * delta
        interior = jnp.clip(edges[:, 1:-1] + jitter, 0.0, 1.0)
        edges = jnp.concatenate([edges[:, :1], interior, edges[:, -1:]], axis=1)
    return edges


def pdf_resample(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    rng: Optional[jax.Array] = None,
    padding: float = 0.01,
) -> jnp.ndarray:
    """Inverse-CDF resampling: new bin edges concentrated where weights are.

    Args:
        bins: (R, N+1) existing bin edges (any monotonic space).
        weights: (R, N) non-negative per-bin weights.
        num_samples: number of OUTPUT bins (returns (R, num_samples+1) edges).
        rng: stratified jitter when given, else uniform midpoints.
        padding: histogram padding so empty regions keep some probability
            (nerfstudio's histogram_padding).

    Returns:
        (R, num_samples+1) new bin edges.
    """
    R, N = weights.shape
    w = weights + padding / N
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros((R, 1), w.dtype), jnp.cumsum(w, axis=-1)], axis=-1
    )  # (R, N+1), last ~1

    M = num_samples + 1
    u = jnp.linspace(0.0, 1.0, M)
    u = jnp.broadcast_to(u, (R, M))
    if rng is not None:
        du = 1.0 / num_samples
        jitter = (jax.random.uniform(rng, (R, 1)) - 0.5) * du
        u = jnp.clip(u + jitter, 0.0, 1.0)

    # binary search: idx = first bin with cdf[idx+1] >= u
    lo = jnp.zeros((R, M), jnp.int32)
    hi = jnp.full((R, M), N, jnp.int32)
    for _ in range(max(N.bit_length(), 1)):
        mid = (lo + hi) // 2
        mid_val = jnp.take_along_axis(cdf, mid + 1, axis=1)
        go_right = mid_val < u
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    idx = jnp.minimum(lo, N - 1)  # (R, M)

    cdf_lo = jnp.take_along_axis(cdf, idx, axis=1)
    cdf_hi = jnp.take_along_axis(cdf, idx + 1, axis=1)
    bin_lo = jnp.take_along_axis(bins, idx, axis=1)
    bin_hi = jnp.take_along_axis(bins, idx + 1, axis=1)
    frac = jnp.where(cdf_hi > cdf_lo, (u - cdf_lo) / (cdf_hi - cdf_lo + 1e-12), 0.0)
    frac = jnp.clip(frac, 0.0, 1.0)
    edges = bin_lo + frac * (bin_hi - bin_lo)
    # enforce monotonicity against fp edge cases
    edges = jnp.maximum.accumulate(edges, axis=1)
    return edges


def _searchsorted_rows(sorted_edges: jnp.ndarray, x: jnp.ndarray, side: str) -> jnp.ndarray:
    """Vectorised per-row searchsorted: for each row r, the insertion index
    of x[r, j] into sorted_edges[r, :]. side as in numpy."""
    E = sorted_edges.shape[1]
    lo = jnp.zeros_like(x, dtype=jnp.int32)
    hi = jnp.full_like(x, E, dtype=jnp.int32)
    for _ in range(max(E.bit_length(), 1)):
        mid = (lo + hi) // 2
        mv = jnp.take_along_axis(sorted_edges, jnp.minimum(mid, E - 1), axis=1)
        go_right = jnp.where(mid >= E, False, (mv < x) if side == "left" else (mv <= x))
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _outer_measure(
    query_bins: jnp.ndarray, src_bins: jnp.ndarray, src_weights: jnp.ndarray
) -> jnp.ndarray:
    """Outer measure of the (src_bins, src_weights) histogram over each query
    bin (mip-NeRF 360 `inner_outer`): total src weight of every src bin that
    overlaps the query interval."""
    R = src_weights.shape[0]
    cw = jnp.concatenate(
        [jnp.zeros((R, 1), src_weights.dtype), jnp.cumsum(src_weights, -1)], axis=-1
    )  # (R, Ns+1)
    Ns1 = src_bins.shape[1]
    idx_lo = jnp.clip(
        _searchsorted_rows(src_bins, query_bins, "right") - 1, 0, Ns1 - 1
    )
    idx_hi = jnp.clip(_searchsorted_rows(src_bins, query_bins, "left"), 0, Ns1 - 1)
    cw_lo = jnp.take_along_axis(cw, idx_lo, axis=1)
    cw_hi = jnp.take_along_axis(cw, idx_hi, axis=1)
    return cw_hi[:, 1:] - cw_lo[:, :-1]


def interlevel_loss(
    prop_bins: jnp.ndarray,
    prop_weights: jnp.ndarray,
    final_bins: jnp.ndarray,
    final_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Proposal supervision (mip-NeRF 360 lossfun_outer / nerfstudio
    interlevel_loss): the proposal's outer measure over each final bin must
    upper-bound the final weight; gradients flow to the proposal only.

    All bins share one (s-)space.
    """
    w = jax.lax.stop_gradient(final_weights)
    t = jax.lax.stop_gradient(final_bins)
    w_outer = _outer_measure(t, prop_bins, prop_weights)  # (R, Nf)
    excess = jnp.clip(w - w_outer, 0.0, None)
    return jnp.mean(jnp.sum(excess**2 / (w + 1e-7), axis=-1))


def distortion_loss(bins: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """mip-NeRF 360 distortion regulariser in s-space (nerfstudio
    distortion_loss): encourages compact, consolidated weight distributions.

    L = sum_ij w_i w_j |m_i - m_j| + 1/3 sum_i w_i^2 (b_hi - b_lo)_i
    computed with the O(N) cumulative form.
    """
    mids = (bins[:, :-1] + bins[:, 1:]) / 2.0
    widths = bins[:, 1:] - bins[:, :-1]
    # O(N) pairwise term via sorted-order prefix sums (mids are sorted)
    cw = jnp.cumsum(weights, axis=-1)
    cwm = jnp.cumsum(weights * mids, axis=-1)
    # sum_ij w_i w_j |m_i - m_j| = 2 * sum_i w_i (m_i * cw_{i-1} - cwm_{i-1})
    cw_prev = cw - weights
    cwm_prev = cwm - weights * mids
    pairwise = 2.0 * jnp.sum(weights * (mids * cw_prev - cwm_prev), axis=-1)
    self_term = jnp.sum(weights**2 * widths, axis=-1) / 3.0
    return jnp.mean(pairwise + self_term)
