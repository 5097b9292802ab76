"""Camera model + ray generation.

Equivalent of the slice of nerfstudio `Cameras` / `RayGenerator` the
reference exercises (rays generated per sampled pixel at
/root/reference/umhsnerf/data/umhs_datamanager.py:95-108 and per camera at
umhs_model.py:530-540). Convention matches nerfstudio: OpenGL
camera-to-world (x right, y up, z backward), pixel (row, col) + 0.5 centre
offset, direction_cam = [(u - cx)/fx, -(v - cy)/fy, -1].

Ray generation is pure jnp so the pixel-sampler -> ray path fuses into the
train step (no host round trip per batch).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

CAMERA_MODELS = ("PERSPECTIVE", "OPENCV", "OPENCV_FISHEYE", "EQUIRECTANGULAR")


@dataclasses.dataclass
class Cameras:
    """Batched pinhole cameras (vectorised over N frames); numpy host-side,
    converted to device arrays once by the datamanager."""

    camera_to_worlds: np.ndarray  # (N, 3, 4) OpenGL c2w
    fx: np.ndarray  # (N,)
    fy: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    width: np.ndarray  # (N,) int
    height: np.ndarray
    distortion_params: Optional[np.ndarray] = None  # (N, 6) k1 k2 k3 k4 p1 p2
    camera_type: str = "PERSPECTIVE"

    def __len__(self) -> int:
        return self.camera_to_worlds.shape[0]

    def rescale_output_resolution(self, scaling_factor: float) -> "Cameras":
        return dataclasses.replace(
            self,
            fx=self.fx * scaling_factor,
            fy=self.fy * scaling_factor,
            cx=self.cx * scaling_factor,
            cy=self.cy * scaling_factor,
            width=(self.width * scaling_factor).astype(self.width.dtype),
            height=(self.height * scaling_factor).astype(self.height.dtype),
        )

    def to_device_dict(self) -> Dict[str, jnp.ndarray]:
        d = {
            "c2w": jnp.asarray(self.camera_to_worlds, dtype=jnp.float32),
            "fx": jnp.asarray(self.fx, dtype=jnp.float32),
            "fy": jnp.asarray(self.fy, dtype=jnp.float32),
            "cx": jnp.asarray(self.cx, dtype=jnp.float32),
            "cy": jnp.asarray(self.cy, dtype=jnp.float32),
        }
        if self.distortion_params is not None and np.abs(self.distortion_params).max() > 0:
            d["distortion"] = jnp.asarray(self.distortion_params, dtype=jnp.float32)
        return d


def _undistort_radial(x, y, dist):
    """Iterative (Newton-free fixed-point) undistortion for OpenCV
    k1,k2,k3,p1,p2. 5 iterations is plenty for photographic distortion."""
    k1, k2, k3 = dist[..., 0], dist[..., 1], dist[..., 2]
    p1, p2 = dist[..., 4], dist[..., 5]
    xd, yd = x, y
    for _ in range(5):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return x, y


def generate_rays(
    cam: Dict[str, jnp.ndarray],
    camera_indices: jnp.ndarray,
    pixel_rows: jnp.ndarray,
    pixel_cols: jnp.ndarray,
    camera_type: str = "PERSPECTIVE",
) -> Dict[str, jnp.ndarray]:
    """Generate world-space rays for (camera, row, col) index triples.

    cam: device dict from Cameras.to_device_dict().
    camera_type: static per-dataset camera model (the reference takes it
    from transforms.json meta, umhs_dataparser.py:334-337; nerfstudio
    implements PERSPECTIVE/OPENCV, OPENCV_FISHEYE and EQUIRECTANGULAR).
    Kept a Python string (static under jit) rather than a traced leaf.
    Returns {"origins", "directions" (unit), "camera_indices"}.
    """
    idx = camera_indices.astype(jnp.int32)
    fx = jnp.take(cam["fx"], idx)
    fy = jnp.take(cam["fy"], idx)
    cx = jnp.take(cam["cx"], idx)
    cy = jnp.take(cam["cy"], idx)
    c2w = jnp.take(cam["c2w"], idx, axis=0)  # (R, 3, 4)

    u = pixel_cols.astype(jnp.float32) + 0.5
    v = pixel_rows.astype(jnp.float32) + 0.5
    x = (u - cx) / fx
    y = (v - cy) / fy
    if "distortion" in cam and camera_type != "EQUIRECTANGULAR":
        dist = jnp.take(cam["distortion"], idx, axis=0)
        x, y = _undistort_radial(x, y, dist)

    # OpenGL camera: +x right, +y up, looking down -z; image v grows downward
    if camera_type in ("PERSPECTIVE", "OPENCV"):
        dirs_cam = jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)  # (R, 3)
    elif camera_type == "OPENCV_FISHEYE":
        # equidistant projection: radius in the normalised image plane IS the
        # polar angle theta (nerfstudio CameraType.FISHEYE)
        theta = jnp.clip(jnp.sqrt(x * x + y * y), 1e-9, jnp.pi)
        sin_over_theta = jnp.sin(theta) / theta
        dirs_cam = jnp.stack(
            [x * sin_over_theta, -y * sin_over_theta, -jnp.cos(theta)], axis=-1
        )
    elif camera_type == "EQUIRECTANGULAR":
        # normalised coords span [-1, 1] across the pano (cx=W/2, fx=W/2,
        # cy=H/2, fy=H/2): longitude theta around +y, latitude phi toward +y;
        # the image centre looks down -z
        theta = -jnp.pi * x
        phi = -0.5 * jnp.pi * y  # v grows downward -> negative latitude
        cos_phi = jnp.cos(phi)
        dirs_cam = jnp.stack(
            [jnp.sin(theta) * cos_phi, jnp.sin(phi), -jnp.cos(theta) * cos_phi],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown camera_type {camera_type!r}")
    dirs_world = jnp.einsum("rij,rj->ri", c2w[:, :, :3], dirs_cam)
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origins = c2w[:, :, 3]
    return {
        "origins": origins,
        "directions": dirs_world,
        "camera_indices": idx,
    }


def generate_camera_rays(
    cam: Dict[str, jnp.ndarray],
    camera_index: int,
    height: int,
    width: int,
    camera_type: str = "PERSPECTIVE",
) -> Dict[str, jnp.ndarray]:
    """All pixel rays of one camera, row-major: (H*W,) ray dict."""
    rows, cols = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    n = height * width
    idx = jnp.full((n,), camera_index, dtype=jnp.int32)
    return generate_rays(
        cam, idx, rows.reshape(-1), cols.reshape(-1), camera_type=camera_type
    )
