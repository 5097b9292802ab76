"""Parity tests for the spectrum->RGB colour system.

Golden values computed with an independent numpy transcription of the
reference math (/root/reference/umhsnerf/utils/spec_to_rgb.py:61-126 and the
offline converter data/spec2rgb.py:93-104).
"""

import numpy as np
import jax.numpy as jnp

from umhs_tpu.ops.spec_to_rgb import (
    ColourSystem,
    build_spec_to_rgb_matrix,
    srgb_gamma,
)

NESPOF_WAVELENGTHS = list(range(450, 651, 10))  # 21 bands


def _reference_matrix(wavelengths, cs="sRGB"):
    """Independent numpy implementation of the reference's matrix build."""

    def g(x, alpha, mu, s1, s2):
        sigma = np.clip((x < mu) * s1 + (x >= mu) * s2, 1e-6, None)
        return alpha * np.exp((x - mu) ** 2 / (-2 * sigma**2))

    def cx(x):
        return g(x, 1.056, 5998, 379, 310) + g(x, 0.362, 4420, 160, 267) + g(
            x, -0.065, 5011, 204, 262
        )

    def cy(x):
        return g(x, 0.821, 5688, 469, 405) + g(x, 0.286, 5309, 163, 311)

    def cz(x):
        return g(x, 1.217, 4370, 118, 360) + g(x, 0.681, 4590, 260, 138)

    def xyz_from_xy(x, y):
        return np.array((x, y, 1 - x - y))

    illuminant_d65 = xyz_from_xy(0.3127, 0.3291)
    red, green, blue, white = (
        xyz_from_xy(0.64, 0.33),
        xyz_from_xy(0.30, 0.60),
        xyz_from_xy(0.15, 0.06),
        illuminant_d65,
    )
    bands = np.array(wavelengths) * 10
    cmf = np.array([cx(bands), cy(bands), cz(bands)])
    M = np.vstack((red, green, blue)).T
    MI = np.linalg.inv(M)
    wscale = MI.dot(white)
    A = MI / wscale[:, np.newaxis]
    RGB = cmf.T @ A.T
    return RGB / np.sum(RGB, axis=0, keepdims=True)


def test_matrix_matches_reference_math():
    ours = build_spec_to_rgb_matrix(NESPOF_WAVELENGTHS)
    ref = _reference_matrix(NESPOF_WAVELENGTHS)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_matrix_columns_sum_to_one():
    m = build_spec_to_rgb_matrix(NESPOF_WAVELENGTHS)
    np.testing.assert_allclose(m.sum(axis=0), np.ones(3), rtol=1e-5)


def test_gamma_curve():
    x = jnp.array([0.0, 0.001, 0.0031308, 0.5, 1.0])
    y = np.asarray(srgb_gamma(x))
    np.testing.assert_allclose(y[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(y[1], 12.92 * 0.001, rtol=1e-5)
    np.testing.assert_allclose(y[3], 1.055 * 0.5 ** (1 / 2.4) - 0.055, rtol=1e-5)
    np.testing.assert_allclose(y[4], 1.0, rtol=1e-5)


def test_flat_spectrum_is_grayish():
    """A flat (white-ish) spectrum should map near R=G=B after normalisation."""
    cs = ColourSystem(NESPOF_WAVELENGTHS)
    rgb = np.asarray(cs(jnp.ones((1, 21)) * 0.5))
    assert rgb.shape == (1, 3)
    # column normalisation makes a flat spectrum integrate to 0.5 per channel
    np.testing.assert_allclose(rgb, srgb_gamma(jnp.full((1, 3), 0.5)), atol=1e-5)


def test_forward_clamps():
    cs = ColourSystem(NESPOF_WAVELENGTHS)
    rgb = np.asarray(cs(jnp.ones((4, 21)) * 10.0))
    assert rgb.max() <= 1.0 and rgb.min() >= 0.0


def test_141_band_shape():
    wl = np.linspace(400, 1000, 141)  # Bayspec-style
    cs = ColourSystem(wl)
    rgb = np.asarray(cs(jnp.ones((7, 141)) * 0.3))
    assert rgb.shape == (7, 3)
