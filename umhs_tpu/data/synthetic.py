"""Procedural multi-view hyperspectral test scene.

The reference is validated on NeSpoF captures (21 bands, 512^2) that are not
shipped with the repo; this module generates a geometrically consistent
stand-in: lambertian spheres, each with a distinct smooth endmember spectrum,
ray-traced analytically from orbit cameras. Used by the end-to-end tests,
the training smoke runs, and bench.py.

Layout written by `write_dataset` mirrors what the reference's offline prep
produces (data/spec2rgb.py + data/adapt_transforms.py): a transforms.json
with fl_x/fl_y/cx/cy/w/h + per-frame `file_path` (PNG) and
`hyperspectral_file_path` (.npy cube), frames under train/ eval/ dirs for
the filename split, and a `wavelengths` list.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops.spec_to_rgb import build_spec_to_rgb_matrix, srgb_gamma_np


@dataclasses.dataclass(frozen=True)
class SyntheticSceneConfig:
    num_views_train: int = 24
    num_views_eval: int = 4
    image_size: int = 64
    num_bands: int = 21
    wavelength_start: float = 450.0
    wavelength_step: float = 10.0
    num_spheres: int = 4
    camera_radius: float = 3.0
    focal_scale: float = 1.2  # focal = focal_scale * image_size
    seed: int = 0

    @property
    def wavelengths(self) -> np.ndarray:
        return self.wavelength_start + self.wavelength_step * np.arange(self.num_bands)


def _look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0.0, 0.0, 1.0])):
    """OpenGL camera-to-world: camera looks down -z."""
    z = eye - target
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def make_spheres(cfg: SyntheticSceneConfig):
    """Sphere centres/radii + per-sphere endmember spectra (K, B) in [0,1]."""
    rng = np.random.default_rng(cfg.seed)
    centers, radii = [], []
    for i in range(cfg.num_spheres):
        ang = 2 * np.pi * i / cfg.num_spheres
        r = 0.45 if cfg.num_spheres > 1 else 0.0
        centers.append([r * np.cos(ang), r * np.sin(ang), 0.15 * (i % 2)])
        radii.append(0.28 + 0.05 * rng.random())
    t = np.linspace(0.0, 1.0, cfg.num_bands)
    spectra = []
    for i in range(cfg.num_spheres):
        c = (i + 0.5) / cfg.num_spheres
        spectra.append(0.15 + 0.75 * np.exp(-((t - c) ** 2) / 0.03))
    return np.asarray(centers), np.asarray(radii), np.asarray(spectra)


def _trace(
    origins: np.ndarray,
    dirs: np.ndarray,
    centers: np.ndarray,
    radii: np.ndarray,
    spectra: np.ndarray,
    light_dir=np.array([0.4, 0.3, 0.85]),
) -> Tuple[np.ndarray, np.ndarray]:
    """Ray-trace lambertian spheres. Returns (spectral image (..., B), alpha)."""
    light = light_dir / np.linalg.norm(light_dir)
    B = spectra.shape[1]
    n = origins.shape[0]
    best_t = np.full(n, np.inf)
    best_idx = np.full(n, -1, dtype=int)
    for i, (c, r) in enumerate(zip(centers, radii)):
        oc = origins - c
        b = np.sum(oc * dirs, axis=-1)
        disc = b * b - (np.sum(oc * oc, axis=-1) - r * r)
        hit = disc > 0
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = -b - sq
        t = np.where(t > 1e-3, t, -b + sq)
        valid = hit & (t > 1e-3) & (t < best_t)
        best_t = np.where(valid, t, best_t)
        best_idx = np.where(valid, i, best_idx)

    spec = np.zeros((n, B), dtype=np.float32)
    alpha = (best_idx >= 0).astype(np.float32)
    hit_mask = best_idx >= 0
    if hit_mask.any():
        pts = origins[hit_mask] + dirs[hit_mask] * best_t[hit_mask, None]
        idx = best_idx[hit_mask]
        normals = (pts - centers[idx]) / radii[idx][:, None]
        shade = 0.35 + 0.65 * np.maximum(normals @ light, 0.0)
        spec[hit_mask] = spectra[idx] * shade[:, None]
    return np.clip(spec, 0.0, 1.0), alpha


def render_views(cfg: SyntheticSceneConfig, num_views: int, phase: float = 0.0):
    """Render orbit views. Returns (poses (V,4,4), cubes (V,H,W,B),
    rgba (V,H,W,4))."""
    centers, radii, spectra = make_spheres(cfg)
    H = W = cfg.image_size
    focal = cfg.focal_scale * cfg.image_size
    cx = cy = cfg.image_size / 2.0
    m = build_spec_to_rgb_matrix(cfg.wavelengths)

    poses, cubes, rgbas = [], [], []
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views + phase
        elev = 0.45 + 0.25 * np.sin(3 * ang)
        eye = cfg.camera_radius * np.array(
            [np.cos(ang) * np.cos(elev), np.sin(ang) * np.cos(elev), np.sin(elev)]
        )
        c2w = _look_at(eye, np.zeros(3))
        poses.append(c2w)

        vv, uu = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
        x = (uu - cx) / focal
        y = (vv - cy) / focal
        dirs_cam = np.stack([x, -y, -np.ones_like(x)], axis=-1).reshape(-1, 3)
        dirs_world = dirs_cam @ c2w[:3, :3].T
        dirs_world /= np.linalg.norm(dirs_world, axis=-1, keepdims=True)
        origins = np.tile(eye, (H * W, 1))

        spec, alpha = _trace(origins, dirs_world, centers, radii, spectra)
        cube = spec.reshape(H, W, cfg.num_bands)
        rgb = np.clip(srgb_gamma_np(np.clip(cube @ m, 0, 1)), 0, 1)
        rgba = np.concatenate([rgb, alpha.reshape(H, W, 1)], axis=-1)
        cubes.append(cube)
        rgbas.append(rgba.astype(np.float32))
    return np.stack(poses), np.stack(cubes), np.stack(rgbas)


def write_dataset(root: Path, cfg: Optional[SyntheticSceneConfig] = None) -> Path:
    """Write a reference-layout dataset directory; returns the root path."""
    from PIL import Image

    cfg = cfg or SyntheticSceneConfig()
    root = Path(root)
    frames: List[Dict] = []
    for split, n, phase in (
        ("train", cfg.num_views_train, 0.0),
        ("eval", cfg.num_views_eval, 0.13),
    ):
        (root / split).mkdir(parents=True, exist_ok=True)
        poses, cubes, rgbas = render_views(cfg, n, phase)
        for i in range(n):
            img_rel = f"{split}/r_{i}.png"
            hs_rel = f"{split}/r_{i}.npy"
            Image.fromarray((rgbas[i] * 255).astype(np.uint8), mode="RGBA").save(
                root / img_rel
            )
            np.save(root / hs_rel, cubes[i])
            frames.append(
                {
                    "file_path": img_rel,
                    "hyperspectral_file_path": hs_rel,
                    "transform_matrix": poses[i].tolist(),
                }
            )
    meta = {
        "fl_x": cfg.focal_scale * cfg.image_size,
        "fl_y": cfg.focal_scale * cfg.image_size,
        "cx": cfg.image_size / 2.0,
        "cy": cfg.image_size / 2.0,
        "w": cfg.image_size,
        "h": cfg.image_size,
        "camera_model": "OPENCV",
        "wavelengths": [float(w) for w in cfg.wavelengths],
        "frames": frames,
    }
    with open(root / "transforms.json", "w") as f:
        json.dump(meta, f, indent=2)
    return root
