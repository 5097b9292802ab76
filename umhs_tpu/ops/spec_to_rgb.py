"""Spectrum -> sRGB projection (CIE 1931 analytic colour-matching functions).

TPU-native equivalent of the reference ColourSystem
(/root/reference/umhsnerf/utils/spec_to_rgb.py:61-126): a fixed (B, 3)
transform matrix built at trace time from analytic CIE CMFs (sums of
piecewise Gaussians in Angstrom units — wavelengths in nm are multiplied by
10), projected through the chromaticity matrix of the chosen colour space
with its reference white, column-normalised so each RGB channel's CMF sums
to 1 over the band axis. The forward pass is a single matmul + sRGB gamma +
clamp, which XLA fuses into surrounding compute.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _piecewise_gaussian(x, alpha, mu, sigma_l, sigma_r):
    """Asymmetric Gaussian used by the analytic CIE 1931 CMF fit.

    x is in Angstroms. sigma_l applies below the mean, sigma_r above.
    """
    x = np.asarray(x, dtype=np.float64)
    sigma = np.where(x < mu, sigma_l, sigma_r)
    sigma = np.clip(sigma, 1e-6, None)
    return alpha * np.exp(-((x - mu) ** 2) / (2.0 * sigma**2))


def cie_x(x):
    """CIE 1931 x-bar analytic fit (Wyman et al. multi-lobe Gaussian)."""
    return (
        _piecewise_gaussian(x, 1.056, 5998.0, 379.0, 310.0)
        + _piecewise_gaussian(x, 0.362, 4420.0, 160.0, 267.0)
        + _piecewise_gaussian(x, -0.065, 5011.0, 204.0, 262.0)
    )


def cie_y(x):
    """CIE 1931 y-bar analytic fit."""
    return _piecewise_gaussian(x, 0.821, 5688.0, 469.0, 405.0) + _piecewise_gaussian(
        x, 0.286, 5309.0, 163.0, 311.0
    )


def cie_z(x):
    """CIE 1931 z-bar analytic fit."""
    return _piecewise_gaussian(x, 1.217, 4370.0, 118.0, 360.0) + _piecewise_gaussian(
        x, 0.681, 4590.0, 260.0, 138.0
    )


def _xy_to_xyz(x, y):
    return np.array((x, y, 1.0 - x - y), dtype=np.float64)


ILLUMINANT = {
    "D65": _xy_to_xyz(0.3127, 0.3291),
    "E": _xy_to_xyz(1.0 / 3.0, 1.0 / 3.0),
}

# (red, green, blue, white) chromaticities per colour space.
COLOR_SPACE = {
    "sRGB": (
        _xy_to_xyz(0.64, 0.33),
        _xy_to_xyz(0.30, 0.60),
        _xy_to_xyz(0.15, 0.06),
        ILLUMINANT["D65"],
    ),
    "AdobeRGB": (
        _xy_to_xyz(0.64, 0.33),
        _xy_to_xyz(0.21, 0.71),
        _xy_to_xyz(0.15, 0.06),
        ILLUMINANT["D65"],
    ),
    "AppleRGB": (
        _xy_to_xyz(0.625, 0.34),
        _xy_to_xyz(0.28, 0.595),
        _xy_to_xyz(0.155, 0.07),
        ILLUMINANT["D65"],
    ),
    "UHDTV": (
        _xy_to_xyz(0.708, 0.292),
        _xy_to_xyz(0.170, 0.797),
        _xy_to_xyz(0.131, 0.046),
        ILLUMINANT["D65"],
    ),
    "CIERGB": (
        _xy_to_xyz(0.7347, 0.2653),
        _xy_to_xyz(0.2738, 0.7174),
        _xy_to_xyz(0.1666, 0.0089),
        ILLUMINANT["E"],
    ),
}


def build_spec_to_rgb_matrix(wavelengths_nm, color_space: str = "sRGB") -> np.ndarray:
    """Build the fixed (B, 3) spectrum->RGB projection matrix.

    Args:
        wavelengths_nm: sequence of band-centre wavelengths in nanometres
            (e.g. 450..650 step 10 for NeSpoF scenes).
        color_space: one of COLOR_SPACE keys.

    Returns:
        float32 (B, 3) matrix M such that rgb_linear = spectrum @ M.
    """
    bands_angstrom = np.asarray(wavelengths_nm, dtype=np.float64) * 10.0
    cmf = np.stack(
        [cie_x(bands_angstrom), cie_y(bands_angstrom), cie_z(bands_angstrom)], axis=0
    )  # (3, B)

    red, green, blue, white = COLOR_SPACE[color_space]
    chroma = np.stack((red, green, blue), axis=0).T  # (3, 3), columns = primaries
    chroma_inv = np.linalg.inv(chroma)
    white_scale = chroma_inv @ white
    xyz_to_rgb = chroma_inv / white_scale[:, None]  # (3, 3)

    rgb = cmf.T @ xyz_to_rgb.T  # (B, 3)
    rgb = rgb / np.sum(rgb, axis=0, keepdims=True)  # column-normalise over bands
    return rgb.astype(np.float32)


def srgb_gamma(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB electro-optical gamma: 12.92 x below 0.0031308, else 1.055 x^(1/2.4) - 0.055."""
    return jnp.where(
        x < 0.0031308,
        12.92 * x,
        1.055 * jnp.power(jnp.clip(x, 1e-6, None), 1.0 / 2.4) - 0.055,
    )


def srgb_gamma_np(x: np.ndarray) -> np.ndarray:
    """Numpy twin of srgb_gamma for host-side data prep."""
    return np.where(
        x < 0.0031308,
        12.92 * x,
        1.055 * np.power(np.clip(x, 1e-6, None), 1.0 / 2.4) - 0.055,
    )


class ColourSystem:
    """Callable spectrum->RGB converter. The matrix is a baked constant.

    forward: rgb = clamp(gamma(spec @ M), 0, 1). Matches the reference
    ColourSystem.forward (/root/reference/umhsnerf/utils/spec_to_rgb.py:112-126).
    """

    def __init__(self, wavelengths_nm, color_space: str = "sRGB"):
        self.wavelengths_nm = tuple(float(w) for w in wavelengths_nm)
        self.color_space = color_space
        self.matrix = jnp.asarray(build_spec_to_rgb_matrix(wavelengths_nm, color_space))

    def __call__(self, spectrum: jnp.ndarray) -> jnp.ndarray:
        rgb = spectrum.astype(jnp.float32) @ self.matrix
        rgb = srgb_gamma(rgb)
        return jnp.clip(rgb, 0.0, 1.0)
