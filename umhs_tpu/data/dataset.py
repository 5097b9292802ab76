"""In-memory hyperspectral dataset.

Equivalent of the reference `HyperspectralDataset`
(/root/reference/umhsnerf/data/utils/hs_dataloader.py:23-77) — loads RGB(A)
images and per-frame `.npy` hyperspectral cubes (clamped to [0,1]), plus
optional segmentation PNGs / DINO feature tensors, and owns the `vca.npy`
side-channel: if the cache is absent, VCA runs on the first cube and the
endmember matrix is written for the field init to pick up
(hs_dataloader.py:52-58; the dataparser deletes stale caches).

Unlike the torch pipeline (CPU dataloader workers streaming image batches to
the GPU each step), the TPU design stages the *entire* split into device
memory once — NeRF pixel sampling touches every image every step, so
resident tensors + on-device gather beat a host loader. HS cubes can be
staged as bfloat16 to halve HBM (141-band real scenes).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .dataparser import DataparserOutputs
from .vca import vca_endmembers_from_cube


def _load_image(path: Path) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    return img


class HyperspectralDataset:
    """Loads a DataparserOutputs split fully into host arrays."""

    def __init__(
        self,
        outputs: DataparserOutputs,
        vca_cache: str = "vca.npy",
        compute_vca: bool = True,
    ):
        self.outputs = outputs
        self.metadata = outputs.metadata
        self.num_classes = outputs.metadata.get("num_classes", 5)

        self.images = np.stack([_load_image(p) for p in outputs.image_filenames])

        hs_files = outputs.metadata.get("hs_filenames")
        self.hs_images: Optional[np.ndarray] = None
        if hs_files:
            from ..native import parallel_load_cubes

            first = np.clip(np.load(hs_files[0]).astype(np.float32), 0.0, 1.0)
            if compute_vca and not os.path.exists(vca_cache):
                try:
                    em = vca_endmembers_from_cube(first, self.num_classes)
                    np.save(vca_cache, em)
                except Exception:
                    pass  # mirror reference: fall back to random init
            # multithreaded native staging (gigabytes for 141-band scenes)
            self.hs_images = parallel_load_cubes(hs_files, first.shape)

        # per-frame validity masks (nerfstudio PixelSampler semantics: only
        # nonzero-mask pixels may be sampled; reference collects mask_path at
        # umhs_dataparser.py:203-213)
        self.masks: Optional[np.ndarray] = None
        if outputs.mask_filenames:
            from PIL import Image

            masks = []
            for p in outputs.mask_filenames:
                m = np.asarray(Image.open(p))
                if m.ndim == 3:
                    m = m[..., 0]
                masks.append(m > 0)
            self.masks = np.stack(masks)

        seg_files = outputs.metadata.get("seg_filenames")
        self.seg_images: Optional[np.ndarray] = None
        if seg_files:
            from PIL import Image

            self.seg_images = np.stack(
                [np.asarray(Image.open(p)) for p in seg_files]
            ).astype(np.int32)

        dino_files = outputs.metadata.get("dino_filenames")
        self.dino_feats: Optional[np.ndarray] = None
        if dino_files:
            import torch

            feats = [
                torch.load(p, map_location="cpu", weights_only=False)
                .permute(1, 2, 0)
                .numpy()
                for p in dino_files
            ]
            self.dino_feats = np.stack(feats).astype(np.float32)

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def image_height(self) -> int:
        return self.images.shape[1]

    @property
    def image_width(self) -> int:
        return self.images.shape[2]

    def batch_keys(self) -> List[str]:
        keys = ["image"]
        if self.hs_images is not None:
            keys.append("hs_image")
        if self.seg_images is not None:
            keys.append("seg_image")
        if self.dino_feats is not None:
            keys.append("dino_feat")
        return keys

    def valid_indices(self) -> Optional[np.ndarray]:
        """Flat (img*H*W + row*W + col) indices of maskable pixels, or None
        when the split has no masks. Precomputed once on the host so the
        jitted pixel sampler draws uniformly from the valid set only — the
        static-shape equivalent of nerfstudio's mask-aware PixelSampler."""
        if self.masks is None:
            return None
        return np.flatnonzero(self.masks.reshape(-1)).astype(np.int32)

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {"image": self.images}
        if self.hs_images is not None:
            out["hs_image"] = self.hs_images
        if self.seg_images is not None:
            out["seg_image"] = self.seg_images
        if self.dino_feats is not None:
            out["dino_feat"] = self.dino_feats
        return out
