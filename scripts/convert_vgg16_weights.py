#!/usr/bin/env python
"""Convert ImageNet VGG16 weights to the .npz archive umhs_tpu's LPIPS
loads (umhs_tpu/utils/metrics.py:_vgg16_weight_file).

This build environment has zero network egress, so the pretrained weights
cannot be vendored here; run this once on any machine with the checkpoint
and drop the output at assets/vgg16_imagenet.npz (or point
$UMHS_VGG16_WEIGHTS at it) to upgrade LPIPS from the seeded-random
fallback to true calibrated vgg16_imagenet (reference parity:
/root/reference/umhsnerf/umhs_model.py:432 uses torchvision LPIPS).

Accepted inputs:
  - a torchvision checkpoint:  vgg16-397923af.pth
    (https://download.pytorch.org/models/vgg16-397923af.pth)
  - a Keras weights file:      vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5

Usage:
  python scripts/convert_vgg16_weights.py vgg16-397923af.pth assets/vgg16_imagenet.npz
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def from_torch(path: Path) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # torchvision VGG16: features.{0,2,5,7,10,12,14,17,19,21,24,26,28}
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for i, fid in enumerate(conv_ids):
        out[f"conv{i}_w"] = sd[f"features.{fid}.weight"].numpy()
        out[f"conv{i}_b"] = sd[f"features.{fid}.bias"].numpy()
    return out


def from_keras(path: Path) -> dict:
    import h5py

    names = [
        "block1_conv1", "block1_conv2", "block2_conv1", "block2_conv2",
        "block3_conv1", "block3_conv2", "block3_conv3",
        "block4_conv1", "block4_conv2", "block4_conv3",
        "block5_conv1", "block5_conv2", "block5_conv3",
    ]
    out = {}
    with h5py.File(path, "r") as f:
        for i, name in enumerate(names):
            g = f[name][name]
            # keras kernels are (kh, kw, cin, cout); torch wants (cout, cin, kh, kw)
            k = np.asarray(g["kernel:0"]).transpose(3, 2, 0, 1)
            out[f"conv{i}_w"] = k
            out[f"conv{i}_b"] = np.asarray(g["bias:0"])
    return out


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, dst = Path(sys.argv[1]), Path(sys.argv[2])
    weights = from_keras(src) if src.suffix == ".h5" else from_torch(src)
    assert len(weights) == 26, f"expected 13 conv layers, got {len(weights) // 2}"
    assert weights["conv0_w"].shape == (64, 3, 3, 3), weights["conv0_w"].shape
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dst, **weights)
    print(f"wrote {dst} ({dst.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
