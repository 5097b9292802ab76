"""VCA endmember-extraction tests on synthetic linear mixtures."""

import numpy as np

from umhs_tpu.data.vca import vca, vca_endmembers_from_cube


def _synthetic_mixture(num_bands=21, num_endmembers=4, num_pixels=2000, seed=0):
    rng = np.random.default_rng(seed)
    # smooth, distinct endmember spectra in [0, 1]
    t = np.linspace(0, 1, num_bands)
    E = np.stack(
        [0.2 + 0.6 * np.exp(-((t - c) ** 2) / 0.02) for c in np.linspace(0.1, 0.9, num_endmembers)]
    )  # (R, B)
    # abundances on the simplex, many near-pure pixels so vertices exist
    A = rng.dirichlet(np.ones(num_endmembers) * 0.3, size=num_pixels)  # (N, R)
    pure_idx = rng.integers(0, num_pixels, size=num_endmembers * 5)
    for i, p in enumerate(pure_idx):
        A[p] = np.eye(num_endmembers)[i % num_endmembers]
    Y = (A @ E).T  # (B, N)
    Y += rng.normal(0, 1e-4, Y.shape)
    return Y, E


def test_vca_recovers_endmembers():
    Y, E_true = _synthetic_mixture()
    Ae, indices, Yp = vca(Y, 4, rng=np.random.default_rng(1))
    assert Ae.shape == (21, 4)
    assert Yp.shape == Y.shape
    # every extracted endmember should match one true endmember (up to permutation)
    found = Ae.T  # (4, B)
    for e in E_true:
        cos = found @ e / (np.linalg.norm(found, axis=1) * np.linalg.norm(e) + 1e-12)
        assert cos.max() > 0.99, f"no extracted endmember matches (max cos {cos.max()})"


def test_vca_low_snr_branch_executes():
    """The reference's low-SNR branch crashes when verbose=False (body is
    indented under `if verbose:`); ours must work either way."""
    Y, _ = _synthetic_mixture()
    rng = np.random.default_rng(2)
    noisy = Y + rng.normal(0, 0.5, Y.shape)  # force low SNR
    Ae, _, _ = vca(noisy, 4, rng=rng, verbose=False)
    assert Ae.shape == (21, 4)
    assert np.isfinite(Ae).all()


def test_vca_from_cube():
    Y, _ = _synthetic_mixture(num_pixels=64 * 64)
    cube = Y.T.reshape(64, 64, 21)
    em = vca_endmembers_from_cube(cube, 4, rng=np.random.default_rng(3))
    assert em.shape == (4, 21)
    assert em.dtype == np.float32


def test_vca_validates_inputs():
    import pytest

    with pytest.raises(ValueError):
        vca(np.zeros((4, 4, 4)), 2)
    with pytest.raises(ValueError):
        vca(np.zeros((4, 10)), 9)
