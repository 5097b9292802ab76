"""Image/spectral quality metrics: PSNR, SSIM, SAM, RMSE (+LPIPS hook).

Equivalents of the metric stack the reference pulls from torchmetrics
(/root/reference/umhsnerf/umhs_model.py:385-453): PSNR (data range 1.0),
SSIM (11x11 Gaussian window, standard constants), Spectral Angle Mapper
(per-pixel angle, nanmean-reduced), RMSE. Host-side numpy implementations —
these run on full eval images, not in the train hot loop.

LPIPS uses ImageNet VGG16 weights when a local torchvision cache exists;
in zero-egress environments it falls back to a *seeded random* VGG16
feature stack (variant recorded in LPIPS_VARIANT) so eval always reports a
perceptual distance (eval-only metric in the reference as well).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(pred) - np.asarray(gt)) ** 2))
    return float(10.0 * np.log10(data_range**2 / max(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_separable(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Valid-mode separable 2-D convolution over leading two axes."""
    from scipy.ndimage import convolve1d

    out = convolve1d(img, k, axis=0, mode="constant")
    out = convolve1d(out, k, axis=1, mode="constant")
    pad = len(k) // 2
    return out[pad:-pad, pad:-pad]


def ssim(
    pred: np.ndarray,
    gt: np.ndarray,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean SSIM with 11x11 Gaussian window (matches torchmetrics defaults
    sufficiently for parity checks; channels averaged)."""
    pred = np.asarray(pred, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel()

    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        mu_x = _filter2d_separable(x, kern)
        mu_y = _filter2d_separable(y, kern)
        sigma_x = _filter2d_separable(x * x, kern) - mu_x**2
        sigma_y = _filter2d_separable(y * y, kern) - mu_y**2
        sigma_xy = _filter2d_separable(x * y, kern) - mu_x * mu_y
        num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
        den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
        vals.append(np.mean(num / den))
    return float(np.mean(vals))


def sam(pred: np.ndarray, gt: np.ndarray, eps: float = 1e-8) -> float:
    """Spectral Angle Mapper: mean angle (radians) between per-pixel spectra
    (reference uses torchmetrics SpectralAngleMapper(reduction='none') then
    nanmean, umhs_model.py:447)."""
    pred = np.asarray(pred, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    dot = np.sum(pred * gt, axis=-1)
    denom = np.linalg.norm(pred, axis=-1) * np.linalg.norm(gt, axis=-1)
    cos = np.clip(dot / (denom + eps), -1.0, 1.0)
    # zero-spectrum pixels (background) produce angle ~pi/2 artifacts; the
    # torchmetrics version yields nan there and the reference nanmeans them.
    ang = np.arccos(cos)
    ang = np.where(denom < eps, np.nan, ang)
    return float(np.nanmean(ang))


def rmse(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.sqrt(np.mean((np.asarray(pred) - np.asarray(gt)) ** 2)))


def mse2psnr(mse: float) -> float:
    """MSE -> PSNR for [0,1] images (reference utils/metrics.py:3)."""
    return float(-10.0 * np.log10(max(float(mse), 1e-12)))


_LPIPS_CACHE = {}

#: which feature extractor lpips() ended up using:
#: "vgg16_imagenet" (local pretrained cache) or "vgg16_random" (seeded
#: random init — the zero-egress fallback; randomly-initialised conv
#: features are a known usable perceptual metric [Amir & Weiss 2021],
#: comparable *within* a run but not across differently-seeded extractors).
LPIPS_VARIANT: Optional[str] = None


# VGG16 conv trunk: out-channels per conv, 'M' = 2x2 maxpool
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")


def _vgg16_weight_file() -> Optional["Path"]:
    """Locate a dropped-in ImageNet VGG16 weight archive (.npz produced by
    scripts/convert_vgg16_weights.py). Checked locations, in order:
    $UMHS_VGG16_WEIGHTS, <repo>/assets/vgg16_imagenet.npz,
    ~/.cache/umhs_tpu/vgg16_imagenet.npz. This environment has zero
    egress, so the weights cannot be fetched — but any deployment with the
    file present gets true calibrated LPIPS with no code change."""
    from pathlib import Path

    env = os.environ.get("UMHS_VGG16_WEIGHTS")
    candidates = [Path(env)] if env else []
    candidates += [
        Path(__file__).resolve().parents[2] / "assets" / "vgg16_imagenet.npz",
        Path.home() / ".cache" / "umhs_tpu" / "vgg16_imagenet.npz",
    ]
    for p in candidates:
        if p.is_file():
            return p
    return None


def _build_vgg_features():
    """VGG16 feature stack: ImageNet-pretrained when a converted weight
    archive (see _vgg16_weight_file) or torchvision's cache is available;
    otherwise the same architecture built in plain torch with deterministic
    random init (seed 0)."""
    global LPIPS_VARIANT
    import torch

    try:
        import torchvision

        vgg = torchvision.models.vgg16(
            weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1
        )
        LPIPS_VARIANT = "vgg16_imagenet"
        return vgg.features.eval(), torch
    except Exception:
        pass
    torch.manual_seed(0)
    layers, c_in, convs = [], 3, []
    for spec in _VGG16_CFG:
        if spec == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            conv = torch.nn.Conv2d(c_in, spec, 3, padding=1)
            convs.append(conv)
            layers.append(conv)
            layers.append(torch.nn.ReLU(inplace=True))
            c_in = spec
    wfile = _vgg16_weight_file()
    if wfile is not None:
        with np.load(wfile) as z:
            with torch.no_grad():
                for i, conv in enumerate(convs):
                    conv.weight.copy_(torch.from_numpy(z[f"conv{i}_w"]))
                    conv.bias.copy_(torch.from_numpy(z[f"conv{i}_b"]))
        LPIPS_VARIANT = "vgg16_imagenet"
    else:
        LPIPS_VARIANT = "vgg16_random"
    return torch.nn.Sequential(*layers).eval(), torch


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS-style perceptual distance over VGG16 feature maps.

    Uses ImageNet-pretrained weights when a local torchvision cache is
    present; otherwise a seeded randomly-initialised VGG16 (see
    LPIPS_VARIANT). Returns None only if torch/torchvision are unavailable.

    pred/gt: (H, W, 3) in [0, 1]. Reference computes LPIPS per eval image
    (/root/reference/umhsnerf/umhs_model.py:432).
    """
    try:
        if "model" not in _LPIPS_CACHE:
            model, torch = _build_vgg_features()
            _LPIPS_CACHE["model"] = model
            _LPIPS_CACHE["torch"] = torch
        torch = _LPIPS_CACHE["torch"]
        feats = _LPIPS_CACHE["model"]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        def prep(x):
            t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
            return (t - mean) / std

        layers = {3, 8, 15, 22, 29}
        xa, xb = prep(pred), prep(gt)
        dist = 0.0
        with torch.no_grad():
            for i, layer in enumerate(feats):
                xa, xb = layer(xa), layer(xb)
                if i in layers:
                    na = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
                    nb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
                    dist += float(((na - nb) ** 2).mean())
        return dist
    except Exception:
        return None
