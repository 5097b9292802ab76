"""Offline dataset preparation tools.

Equivalents of the reference's L6 prep scripts (SURVEY.md §1):

- `convert_nespof_scene` — /root/reference/data/spec2rgb.py: read per-
  wavelength EXR Stokes frames (450-650 nm step 10 -> 21 bands), stack to an
  (H, W, 21) cube saved as `r_k.npy`, and write the gamma-corrected sRGB PNG
  via the same CIE colour-system math. Gated on OpenEXR availability.
- `add_camera_params` / `add_hyperspectral_paths` — data/adapt_transforms.py:
  inject fl_x/fl_y/cx/cy/w/h/camera_model=OPENCV (focal from camera_angle_x)
  and per-frame `hyperspectral_file_path` into Blender-style transforms.
- `merge_transforms` — data/add_val.py: concatenate val+train frame lists
  into a single transforms.json (the filename split happens at parse time).

All host-side; invoked from the CLI (python -m umhs_tpu.data.prep ...).
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..ops.spec_to_rgb import build_spec_to_rgb_matrix, srgb_gamma_np

NESPOF_WAVELENGTHS = list(range(450, 651, 10))  # 21 bands


def read_exr(path: Path) -> np.ndarray:
    """Read a single-channel (or RGB) EXR as float array. Requires OpenEXR."""
    try:
        import OpenEXR  # noqa: F401
        import Imath

        f = OpenEXR.InputFile(str(path))
        dw = f.header()["dataWindow"]
        h = dw.max.y - dw.min.y + 1
        w = dw.max.x - dw.min.x + 1
        pt = Imath.PixelType(Imath.PixelType.FLOAT)
        channels = list(f.header()["channels"].keys())
        chan = "R" if "R" in channels else channels[0]
        data = np.frombuffer(f.channel(chan, pt), dtype=np.float32)
        return data.reshape(h, w)
    except ImportError:
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(str(path)))
        return img[..., 0] if img.ndim == 3 else img


def spec_cube_to_rgb_png(cube: np.ndarray, wavelengths, out_path: Path) -> None:
    """(H, W, B) cube -> gamma-corrected sRGB PNG (spec2rgb.py:152-162)."""
    from PIL import Image

    m = build_spec_to_rgb_matrix(wavelengths)
    rgb = np.clip(cube, 0, 1) @ m
    rgb = np.clip(srgb_gamma_np(np.clip(rgb, 0, 1)), 0, 1)
    Image.fromarray((rgb * 255).astype(np.uint8)).save(out_path)


def convert_nespof_scene(
    scene_dir: Path,
    out_dir: Path,
    split: str = "train",
    wavelengths: Optional[List[int]] = None,
    stokes_component: str = "s0",
) -> int:
    """Convert a NeSpoF-style scene: per view, one EXR per wavelength under
    <scene>/<split>/<wavelength>/..._{s0}.exr -> (H, W, B) r_k.npy + r_k.png.

    Returns the number of views converted.
    """
    wavelengths = wavelengths or NESPOF_WAVELENGTHS
    scene_dir, out_dir = Path(scene_dir), Path(out_dir)
    (out_dir / split).mkdir(parents=True, exist_ok=True)

    wl_dirs = [scene_dir / split / str(wl) for wl in wavelengths]
    assert wl_dirs[0].exists(), f"missing wavelength dir {wl_dirs[0]}"
    frames = sorted(
        p.name for p in wl_dirs[0].iterdir() if stokes_component in p.name
    )
    for k, frame_name in enumerate(frames):
        bands = [read_exr(d / frame_name) for d in wl_dirs]
        cube = np.clip(np.stack(bands, axis=-1), 0.0, 1.0).astype(np.float32)
        np.save(out_dir / split / f"r_{k}.npy", cube)
        spec_cube_to_rgb_png(
            cube, wavelengths, out_dir / split / f"r_{k}.png"
        )
    return len(frames)


def add_camera_params(
    transforms_path: Path, width: int = 512, height: int = 512
) -> dict:
    """Inject intrinsics derived from camera_angle_x (adapt_transforms.py:6-24)."""
    with open(transforms_path) as f:
        meta = json.load(f)
    angle_x = meta["camera_angle_x"]
    focal = 0.5 * width / math.tan(0.5 * angle_x)
    meta.update(
        {
            "fl_x": focal,
            "fl_y": focal,
            "cx": width / 2.0,
            "cy": height / 2.0,
            "w": width,
            "h": height,
            "camera_model": "OPENCV",
        }
    )
    with open(transforms_path, "w") as f:
        json.dump(meta, f, indent=4)
    return meta


def add_hyperspectral_paths(transforms_path: Path) -> dict:
    """Add hyperspectral_file_path = file_path + '.npy' per frame
    (adapt_transforms.py:33-38)."""
    with open(transforms_path) as f:
        meta = json.load(f)
    for frame in meta["frames"]:
        fp = frame["file_path"]
        base = fp[:-4] if fp.endswith(".png") else fp
        frame["hyperspectral_file_path"] = base + ".npy"
    with open(transforms_path, "w") as f:
        json.dump(meta, f, indent=4)
    return meta


def merge_transforms(
    val_path: Path, train_path: Path, out_path: Path
) -> dict:
    """Concatenate val+train frames into one transforms.json (add_val.py)."""
    with open(val_path) as f:
        val = json.load(f)
    with open(train_path) as f:
        train = json.load(f)
    merged = dict(train)
    merged["frames"] = val["frames"] + train["frames"]
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=4)
    return merged


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    assert argv, "usage: prep {convert-nespof|add-camera-params|add-hs-paths|merge} ..."
    cmd, args = argv[0], argv[1:]
    if cmd == "convert-nespof":
        n = convert_nespof_scene(Path(args[0]), Path(args[1]), *args[2:])
        print(f"converted {n} views")
    elif cmd == "add-camera-params":
        add_camera_params(Path(args[0]))
    elif cmd == "add-hs-paths":
        add_hyperspectral_paths(Path(args[0]))
    elif cmd == "merge":
        merge_transforms(Path(args[0]), Path(args[1]), Path(args[2]))
    else:
        raise SystemExit(f"unknown prep command {cmd}")


if __name__ == "__main__":
    main()
