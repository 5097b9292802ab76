"""`umhs-render` — the ns-render camera-path equivalent.

Reference surface (/root/reference/scripts/render.sh): render a saved camera
path to a video, selecting named outputs — "rgb", per-band "wv_i", abundance
maps "abundances_i", specular residual bands "residual_i", "seg_pred",
"depth", "accumulation" (output names produced at umhs_model.py:273-313).

Camera-path json is nerfstudio's format: {"camera_path": [{"camera_to_world":
[16 floats], "fov": deg, "aspect": a}, ...], "render_height": H,
"render_width": W, "fps": n, "seconds": s}.

Frames are tiled horizontally per requested output (ns-render behaviour) and
written as an mp4 when imageio+ffmpeg are available, else a PNG sequence.

Usage:
    python -m umhs_tpu.cli.render camera-path \
        --load-config outputs/exp/umhsnerf/config.yml \
        --camera-path-filename path.json --output-path renders/out.mp4 \
        --rendered-output-names rgb abundances_0 abundances_1
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Dict, List

import numpy as np


def _colormap(x: np.ndarray) -> np.ndarray:
    """Simple turbo-ish colormap for scalar maps (depth/abundances/bands)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def select_output(outputs: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """Map an ns-render output name to an (H, W, 3) image."""
    if name == "rgb":
        return np.clip(outputs["rgb"], 0, 1)
    if name in ("seg_pred", "specular"):
        return np.clip(outputs[name][..., :3], 0, 1)
    if name in ("accumulation",):
        return _colormap(outputs["accumulation"][..., 0])
    if name == "depth":
        d = outputs["depth"][..., 0]
        rng = np.ptp(d)
        return _colormap((d - d.min()) / (rng + 1e-9))
    if name.startswith("wv_"):
        i = int(name.split("_")[1])
        return np.repeat(np.clip(outputs["spectral"][..., i : i + 1], 0, 1), 3, axis=-1)
    if name.startswith("abundances_"):
        i = int(name.split("_")[1])
        a = outputs["abundances"][..., i]
        return _colormap(a / (a.max() + 1e-9))
    if name.startswith("residual_"):
        i = int(name.split("_")[1])
        return np.repeat(np.clip(outputs["specular"][..., i : i + 1], 0, 1), 3, axis=-1)
    raise KeyError(f"unknown rendered output name {name}")


def cameras_from_path_json(path_json: Dict, fallback_hw=(256, 256)):
    """Build per-frame intrinsics/extrinsics from a camera-path json."""
    h = int(path_json.get("render_height", fallback_hw[0]))
    w = int(path_json.get("render_width", fallback_hw[1]))
    frames = []
    for cam in path_json["camera_path"]:
        c2w = np.asarray(cam["camera_to_world"], dtype=np.float32).reshape(4, 4)
        fov = float(cam.get("fov", 50.0))
        focal = 0.5 * h / np.tan(0.5 * np.deg2rad(fov))
        frames.append({"c2w": c2w[:3], "focal": focal})
    return frames, h, w


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from ..configs import load_config
    from ..data.cameras import generate_camera_rays
    from ..engine.trainer import Trainer

    assert argv and argv[0] == "camera-path", "only camera-path mode is supported"
    argv = argv[1:]
    opts: Dict[str, object] = {"rendered_output_names": ["rgb"]}
    i = 0
    while i < len(argv):
        key = argv[i].lstrip("-").replace("-", "_")
        if key == "rendered_output_names":
            vals = []
            i += 1
            while i < len(argv) and not argv[i].startswith("--"):
                vals.append(argv[i].strip('"'))
                i += 1
            opts[key] = vals
        else:
            opts[key] = argv[i + 1]
            i += 2

    config = load_config(Path(opts["load_config"]))
    trainer = Trainer(
        config.trainer,
        config.pipeline.model,
        config.pipeline.datamanager,
        num_classes=config.pipeline.num_classes,
    )
    trainer.setup()
    trainer.load_checkpoint(trainer.checkpoint_dir)

    with open(opts["camera_path_filename"]) as f:
        path_json = json.load(f)
    frames, h, w = cameras_from_path_json(path_json)

    import jax.numpy as jnp

    images: List[np.ndarray] = []
    names = opts["rendered_output_names"]
    for fi, fr in enumerate(frames):
        cam = {
            "c2w": jnp.asarray(fr["c2w"])[None],
            "fx": jnp.asarray([fr["focal"]]),
            "fy": jnp.asarray([fr["focal"]]),
            "cx": jnp.asarray([w / 2.0]),
            "cy": jnp.asarray([h / 2.0]),
        }
        rays = generate_camera_rays(cam, 0, h, w)
        outputs = trainer.render_camera(rays, (h, w))
        tiles = [select_output(outputs, n) for n in names]
        images.append((np.concatenate(tiles, axis=1) * 255).astype(np.uint8))
        print(f"[umhs-render] frame {fi + 1}/{len(frames)}")

    out_path = Path(opts["output_path"])
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fps = int(path_json.get("fps", 24))
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(out_path, images, fps=fps)
        print(f"[umhs-render] wrote {out_path}")
    except Exception as e:
        from PIL import Image

        frame_dir = out_path.with_suffix("")
        frame_dir.mkdir(parents=True, exist_ok=True)
        for i, img in enumerate(images):
            Image.fromarray(img).save(frame_dir / f"frame_{i:05d}.png")
        print(f"[umhs-render] video backend unavailable ({e}); wrote PNG frames to {frame_dir}")
    return images


if __name__ == "__main__":
    main()
