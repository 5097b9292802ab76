"""Data manager: device-resident image tensors + jit-able pixel sampling.

TPU-native redesign of the reference `UMHSDataManager`
(/root/reference/umhsnerf/data/umhs_datamanager.py:61-134), whose per-step
path is image dataloader -> PixelSampler.sample -> RayGenerator. Here the
whole split sits in device HBM and `sample_train_batch` (pure, jittable)
draws uniform (image, row, col) pixels, gathers every batch key
(image / hs_image / seg_image / dino_feat), and generates the rays — all
fused into the train step, no host round trip.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cameras import generate_camera_rays, generate_rays
from .dataparser import DataParserConfig, UMHSDataParser
from .dataset import HyperspectralDataset


@dataclasses.dataclass(frozen=True)
class DataManagerConfig:
    dataparser: DataParserConfig = dataclasses.field(default_factory=DataParserConfig)
    train_num_rays_per_batch: int = 9216 * 4
    eval_num_rays_per_batch: int = 4096
    patch_size: int = 1
    images_on_device: bool = True
    hs_dtype: str = "float32"  # bfloat16 to halve HBM for 141-band scenes


def sample_pixel_batch(
    data: Dict[str, jnp.ndarray],
    cam: Dict[str, jnp.ndarray],
    rng: jax.Array,
    batch_size: int,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Uniformly sample `batch_size` pixels across all frames; gather values
    and generate their rays. Pure function — call under jit.

    data: {"image": (N,H,W,C), optional "hs_image": (N,H,W,B), ...}
    Returns (rays, batch) where batch values are (batch_size, C) float32.
    """
    images = data["image"]
    n, h, w = images.shape[:3]
    k1, k2, k3 = jax.random.split(rng, 3)
    img_idx = jax.random.randint(k1, (batch_size,), 0, n)
    rows = jax.random.randint(k2, (batch_size,), 0, h)
    cols = jax.random.randint(k3, (batch_size,), 0, w)

    batch = {}
    for key, arr in data.items():
        vals = arr[img_idx, rows, cols]
        batch[key] = vals.astype(jnp.float32) if vals.dtype != jnp.int32 else vals
    batch["indices"] = jnp.stack([img_idx, rows, cols], axis=-1)

    rays = generate_rays(cam, img_idx, rows, cols)
    return rays, batch


class UMHSDataManager:
    """Owns train/eval datasets staged on device."""

    def __init__(self, config: DataManagerConfig, num_classes: Optional[int] = None):
        self.config = config
        dp_cfg = config.dataparser
        if num_classes is not None:
            dp_cfg = dataclasses.replace(dp_cfg, num_classes=num_classes)
        parser = UMHSDataParser(dp_cfg)
        self.train_outputs = parser.parse("train")
        self.eval_outputs = parser.parse("val")
        self.train_dataset = HyperspectralDataset(
            self.train_outputs, vca_cache=dp_cfg.vca_cache
        )
        self.eval_dataset = HyperspectralDataset(
            self.eval_outputs, vca_cache=dp_cfg.vca_cache, compute_vca=False
        )
        self._train_device_data: Optional[Dict[str, jnp.ndarray]] = None
        self._train_cam: Optional[Dict[str, jnp.ndarray]] = None

    # ------------------------------------------------------------------
    @property
    def metadata(self) -> Dict:
        return self.train_outputs.metadata

    @property
    def wavelengths(self):
        return self.train_outputs.metadata.get("wavelengths")

    @property
    def num_train_images(self) -> int:
        return len(self.train_dataset)

    def train_device_data(self) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Stage train images + cameras onto the default device (cached)."""
        if self._train_device_data is None:
            hs_dtype = (
                jnp.bfloat16 if self.config.hs_dtype == "bfloat16" else jnp.float32
            )
            arrays = self.train_dataset.arrays()
            staged = {}
            for k, v in arrays.items():
                if k == "hs_image":
                    staged[k] = jnp.asarray(v, dtype=hs_dtype)
                elif k == "seg_image":
                    staged[k] = jnp.asarray(v, dtype=jnp.int32)
                else:
                    staged[k] = jnp.asarray(v, dtype=jnp.float32)
            self._train_device_data = staged
            self._train_cam = self.train_outputs.cameras.to_device_dict()
        return self._train_device_data, self._train_cam

    def eval_image(self, idx: int):
        """(camera rays (H*W), gt batch dict of full-image arrays) for eval."""
        cam = self.eval_outputs.cameras.to_device_dict()
        h = int(self.eval_outputs.cameras.height[idx])
        w = int(self.eval_outputs.cameras.width[idx])
        rays = generate_camera_rays(cam, idx, h, w)
        batch = {
            k: jnp.asarray(v[idx]) for k, v in self.eval_dataset.arrays().items()
        }
        return rays, batch, (h, w)
