"""Vertex Component Analysis (VCA) endmember extraction.

Re-implementation of Nascimento & Bioucas-Dias' VCA used by the reference to
initialise the endmember matrix (/root/reference/umhsnerf/data/utils/vca.py:24-162).
Host-side numpy: runs once per dataset at load time, result cached to disk.

Note a reference quirk we deliberately fix: in the reference, the entire
low-SNR (projection to R-1 dims) branch body sits under `if verbose:`
(vca.py:99-116), so with the default verbose=False a low-SNR input raises
NameError — which the caller swallows (hs_dataloader.py:52-58), silently
falling back to random endmember init. Here both branches always execute.
"""

from __future__ import annotations

import numpy as np


def estimate_snr(Y: np.ndarray, r_m: np.ndarray, x: np.ndarray) -> float:
    """SNR estimate (dB) of hyperspectral data given its p-dim projection.

    Y: (L, N) data, r_m: (L, 1) mean, x: (p, N) projected zero-mean data.
    """
    L, N = Y.shape
    p = x.shape[0]
    power_y = np.sum(Y**2) / float(N)
    power_x = np.sum(x**2) / float(N) + np.sum(r_m**2)
    return float(10.0 * np.log10((power_x - p / L * power_y) / (power_y - power_x)))


def vca(
    Y: np.ndarray,
    num_endmembers: int,
    snr_input: float = 0.0,
    rng: np.random.Generator | None = None,
    verbose: bool = False,
):
    """Vertex Component Analysis.

    Args:
        Y: (L, N) matrix — L bands, N pixels; each pixel a linear mixture of
            `num_endmembers` endmember signatures.
        num_endmembers: number of endmembers R to extract (1 <= R <= L).
        snr_input: optional known SNR in dB (0 -> estimate from data).
        rng: numpy Generator for the random direction draws (seeded for
            reproducibility; the reference uses global np.random).

    Returns:
        (Ae, indices, Yp): (L, R) endmember matrix, (R,) chosen pixel indices,
        (L, N) projected data.
    """
    if Y.ndim != 2:
        raise ValueError("Y must be (bands, pixels)")
    L, N = Y.shape
    R = int(num_endmembers)
    if R < 1 or R > L:
        raise ValueError("num_endmembers must be in [1, L]")
    if rng is None:
        rng = np.random.default_rng(0)

    Y = np.asarray(Y, dtype=np.float64)

    # --- SNR estimate ----------------------------------------------------
    y_mean = np.mean(Y, axis=1, keepdims=True)
    Y_zero = Y - y_mean
    # R-dim projection basis from the (L, L) correlation of zero-mean data.
    Ud_full = np.linalg.svd(Y_zero @ Y_zero.T / float(N))[0]
    Ud = Ud_full[:, :R]
    x_p = Ud.T @ Y_zero

    if snr_input == 0.0:
        snr = estimate_snr(Y, y_mean, x_p)
    else:
        snr = float(snr_input)
    snr_threshold = 15.0 + 10.0 * np.log10(R)
    if verbose:
        print(f"VCA: SNR = {snr:.2f} dB (threshold {snr_threshold:.2f})")

    # --- Projection ------------------------------------------------------
    if snr < snr_threshold:
        # Low SNR: project to R-1 dims, lift back, append constant coordinate.
        d = R - 1
        Ud_d = Ud[:, :d]
        Yp = Ud_d @ x_p[:d, :] + y_mean
        x = x_p[:d, :]
        if d > 0:
            c = np.amax(np.sum(x**2, axis=0)) ** 0.5
        else:
            x = np.zeros((0, N))
            c = 1.0
        y = np.vstack((x, c * np.ones((1, N))))
    else:
        # High SNR: projective projection onto R dims.
        d = R
        Ud_d = np.linalg.svd(Y @ Y.T / float(N))[0][:, :d]
        x = Ud_d.T @ Y
        Yp = Ud_d @ x
        u = np.mean(x, axis=1, keepdims=True)
        y = x / (u.T @ x + 1e-6)

    # --- Iterative vertex search -----------------------------------------
    indices = np.zeros(R, dtype=int)
    A = np.zeros((R, R))
    A[-1, 0] = 1.0
    for i in range(R):
        w = rng.random((R, 1))
        f = w - A @ (np.linalg.pinv(A) @ w)
        f = f / (np.linalg.norm(f) + 1e-12)
        v = f.T @ y
        indices[i] = int(np.argmax(np.abs(v)))
        A[:, i] = y[:, indices[i]]

    Ae = Yp[:, indices]
    return Ae, indices, Yp


def vca_endmembers_from_cube(
    cube: np.ndarray, num_endmembers: int, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Run VCA on an (H, W, B) hyperspectral cube -> (num_endmembers, B).

    Mirrors the reference call site (hs_dataloader.py:52-58): the cube is
    clamped to [0, 1], flattened to (B, H*W), and the transposed endmember
    matrix is returned (rows = endmembers).
    """
    cube = np.clip(np.asarray(cube, dtype=np.float64), 0.0, 1.0)
    Y = cube.reshape(-1, cube.shape[-1]).T  # (B, H*W)
    Ae, _, _ = vca(Y, num_endmembers, rng=rng)
    return Ae.T.astype(np.float32)
