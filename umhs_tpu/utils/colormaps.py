"""Colormaps for eval-image artifacts.

Equivalent of the nerfstudio colormap helpers the reference uses when
assembling its eval images (gt|pred side-by-side, turbo depth, turbo
accumulation — /root/reference/umhsnerf/umhs_model.py:407-512 via
nerfstudio colormaps.apply_colormap / apply_depth_colormap).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _turbo(x: np.ndarray) -> np.ndarray:
    """Turbo colormap lookup on x in [0,1] -> (..., 3) float RGB."""
    try:
        import matplotlib

        cmap = matplotlib.colormaps["turbo"]
        return cmap(np.clip(x, 0.0, 1.0))[..., :3].astype(np.float32)
    except Exception:
        # grayscale fallback if matplotlib is unavailable
        g = np.clip(x, 0.0, 1.0).astype(np.float32)
        return np.stack([g, g, g], axis=-1)


def apply_colormap(x: np.ndarray) -> np.ndarray:
    """(H, W) or (H, W, 1) values in [0, 1] -> (H, W, 3) turbo RGB."""
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 3:
        x = x[..., 0]
    return _turbo(x)


def apply_depth_colormap(
    depth: np.ndarray,
    accumulation: Optional[np.ndarray] = None,
    near: Optional[float] = None,
    far: Optional[float] = None,
) -> np.ndarray:
    """Normalise depth to [0,1] (by min/max unless near/far given), colour
    with turbo, and attenuate by accumulation so empty rays render dark —
    the nerfstudio apply_depth_colormap behaviour the reference inherits."""
    depth = np.asarray(depth, dtype=np.float32)
    if depth.ndim == 3:
        depth = depth[..., 0]
    lo = float(np.min(depth)) if near is None else near
    hi = float(np.max(depth)) if far is None else far
    x = (depth - lo) / max(hi - lo, 1e-10)
    rgb = _turbo(x)
    if accumulation is not None:
        acc = np.asarray(accumulation, dtype=np.float32)
        if acc.ndim == 3:
            acc = acc[..., 0]
        rgb = rgb * np.clip(acc, 0.0, 1.0)[..., None]
    return rgb
