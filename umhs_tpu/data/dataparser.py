"""transforms.json dataparser.

TPU-native equivalent of the reference `UMHSDataParser`
(/root/reference/umhsnerf/data/umhs_dataparser.py:111-568), a fork of
nerfstudio's dataparser. Reproduces the behaviours the method relies on:

- global or per-frame intrinsics/distortion with assert-on-missing fallback
  (umhs_dataparser.py:169-199);
- frames sorted by resolved filename (umhs_dataparser.py:157-163);
- auxiliary sidecar paths per frame: mask_path, seg_file_path,
  depth_file_path, hyperspectral_file_path, dino_file_path
  (umhs_dataparser.py:203-233);
- stale `vca.npy` deleted when hyperspectral frames are present
  (umhs_dataparser.py:227-228) so endmember init always reflects this run;
- eval split modes fraction / filename (default; parent dir contains
  "train"/"eval") / interval / all (umhs_dataparser.py:43-65,267-287);
- pose auto-orientation ("up"/"pca"/"none") + centering ("poses"/"focus"/
  "none") and auto-scaling translations into the ±1 box
  (umhs_dataparser.py:295-308);
- scene box ±scene_scale; wavelengths required when HS frames present;
- auto downscale to <=1600 px via `images_N/`-style folders
  (umhs_dataparser.py:539-568).

All host-side numpy — runs once at setup.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .cameras import Cameras

MAX_AUTO_RESOLUTION = 1600


@dataclasses.dataclass(frozen=True)
class DataParserConfig:
    data: Path = Path()
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = None
    scene_scale: float = 1.0
    orientation_method: str = "up"  # pca | up | vertical | none
    center_method: str = "poses"  # poses | focus | none
    auto_scale_poses: bool = True
    eval_mode: str = "filename"  # fraction | filename | interval | all
    train_split_fraction: float = 0.9
    eval_interval: int = 8
    depth_unit_scale_factor: float = 1e-3
    load_3D_points: bool = False
    num_classes: int = 5
    vca_cache: str = "vca.npy"


@dataclasses.dataclass
class DataparserOutputs:
    image_filenames: List[Path]
    cameras: Cameras
    scene_scale: float
    dataparser_scale: float
    dataparser_transform: np.ndarray  # (3, 4)
    mask_filenames: Optional[List[Path]] = None
    metadata: Dict = dataclasses.field(default_factory=dict)


def _rotation_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix taking unit vector a to unit vector b (Rodrigues)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-8:
        if c > 0:
            return np.eye(3)
        # 180 degrees: rotate around any axis orthogonal to a
        axis = np.cross(a, np.array([1.0, 0.0, 0.0]))
        if np.linalg.norm(axis) < 1e-8:
            axis = np.cross(a, np.array([0.0, 1.0, 0.0]))
        axis = axis / np.linalg.norm(axis)
        return 2.0 * np.outer(axis, axis) - np.eye(3)
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx * (1.0 / (1.0 + c))


def _focus_of_attention(poses: np.ndarray) -> np.ndarray:
    """Least-squares closest point to all camera optical axes."""
    origins = poses[:, :3, 3]
    dirs = -poses[:, :3, 2]  # cameras look down -z
    m = np.eye(3)[None] - dirs[:, :, None] * dirs[:, None, :]
    mt_m = m.sum(0)
    mt_b = (m @ origins[:, :, None]).sum(0)
    return np.linalg.solve(mt_m, mt_b)[:, 0]


def auto_orient_and_center_poses(
    poses: np.ndarray, method: str = "up", center_method: str = "poses"
) -> Tuple[np.ndarray, np.ndarray]:
    """Orient/center (N, 4, 4) OpenGL c2w poses. Returns (poses, transform
    (3,4)) — mirrors nerfstudio camera_utils.auto_orient_and_center_poses."""
    origins = poses[:, :3, 3]
    if center_method == "poses":
        translation = origins.mean(0)
    elif center_method == "focus":
        translation = _focus_of_attention(poses)
    elif center_method == "none":
        translation = np.zeros(3)
    else:
        raise ValueError(f"unknown center method {center_method}")

    if method in ("up", "vertical"):
        up = poses[:, :3, 1].mean(0)
        up = up / np.linalg.norm(up)
        rotation = _rotation_between(up, np.array([0.0, 0.0, 1.0]))
    elif method == "pca":
        centered = origins - origins.mean(0)
        _, eigvec = np.linalg.eigh(centered.T @ centered)
        # smallest-variance direction becomes z
        rotation = eigvec[:, [1, 2, 0]].T
        if np.linalg.det(rotation) < 0:
            rotation[2] *= -1
    elif method == "none":
        rotation = np.eye(3)
    else:
        raise ValueError(f"unknown orientation method {method}")

    transform = np.concatenate(
        [rotation, (rotation @ -translation)[:, None]], axis=1
    )  # (3, 4)
    transform_h = np.vstack([transform, [0.0, 0.0, 0.0, 1.0]])
    new_poses = np.einsum("ij,njk->nik", transform_h, poses)
    return new_poses, transform


def get_train_eval_split_filename(image_filenames: List[Path]):
    """Split by parent-directory name containing 'train' or 'eval'
    (reference umhs_dataparser.py:43-65)."""
    i_train, i_eval = [], []
    for idx, fname in enumerate(image_filenames):
        base = os.path.basename(os.path.dirname(str(fname)))
        if "train" in base:
            i_train.append(idx)
        elif "eval" in base:
            i_eval.append(idx)
        else:
            raise ValueError(
                "frame should contain train/eval in its parent dir to use the "
                "filename eval mode"
            )
    return np.array(i_train), np.array(i_eval)


def get_train_eval_split_fraction(image_filenames, train_split_fraction: float):
    """Evenly spaced train subset (nerfstudio convention)."""
    num_images = len(image_filenames)
    num_train = int(np.ceil(num_images * train_split_fraction))
    num_eval = num_images - num_train
    i_all = np.arange(num_images)
    i_train = np.linspace(0, num_images - 1, num_train, dtype=int)
    i_eval = np.setdiff1d(i_all, i_train)[:num_eval]
    return i_train, i_eval


def get_train_eval_split_interval(image_filenames, eval_interval: int):
    i_all = np.arange(len(image_filenames))
    i_eval = i_all[::eval_interval]
    i_train = np.setdiff1d(i_all, i_eval)
    return i_train, i_eval


def get_train_eval_split_all(image_filenames):
    i_all = np.arange(len(image_filenames))
    return i_all, i_all


class UMHSDataParser:
    """Parses a nerfstudio-style transforms.json dataset directory."""

    def __init__(self, config: DataParserConfig):
        self.config = config
        self.downscale_factor: Optional[int] = None

    # -- helpers -----------------------------------------------------------
    def _get_fname(self, filepath: Path, data_dir: Path, prefix="images_") -> Path:
        if self.downscale_factor is None:
            if self.config.downscale_factor is None:
                from PIL import Image

                test_img = Image.open(data_dir / filepath)
                w, h = test_img.size
                max_res = max(h, w)
                df = 0
                while (max_res / 2**df) > MAX_AUTO_RESOLUTION and (
                    data_dir / f"{prefix}{2 ** (df + 1)}" / filepath.name
                ).exists():
                    df += 1
                self.downscale_factor = 2**df
            else:
                self.downscale_factor = self.config.downscale_factor
        if self.downscale_factor > 1:
            return data_dir / f"{prefix}{self.downscale_factor}" / filepath.name
        return data_dir / filepath

    # -- main --------------------------------------------------------------
    def parse(self, split: str = "train") -> DataparserOutputs:
        cfg = self.config
        assert cfg.data.exists(), f"Data directory {cfg.data} does not exist."
        if cfg.data.suffix == ".json":
            meta_path, data_dir = cfg.data, cfg.data.parent
        else:
            meta_path, data_dir = cfg.data / "transforms.json", cfg.data
        with open(meta_path) as f:
            meta = json.load(f)

        fixed = {k: k in meta for k in ("fl_x", "fl_y", "cx", "cy", "h", "w")}
        distort_fixed = any(
            k in meta for k in ("k1", "k2", "k3", "p1", "p2", "distortion_params")
        )

        # sort frames by resolved filename (reference umhs_dataparser.py:157-163)
        fnames = [
            self._get_fname(Path(fr["file_path"]), data_dir) for fr in meta["frames"]
        ]
        order = np.argsort([str(f) for f in fnames])
        frames = [meta["frames"][i] for i in order]

        image_filenames, poses = [], []
        mask_filenames, seg_filenames = [], []
        depth_filenames, hs_filenames, dino_filenames = [], [], []
        fx, fy, cx, cy, height, width, distort = [], [], [], [], [], [], []

        def frame_distortion(src) -> np.ndarray:
            if "distortion_params" in src:
                d = np.asarray(src["distortion_params"], dtype=np.float32)
                out = np.zeros(6, dtype=np.float32)
                out[: len(d)] = d
                return out
            return np.array(
                [float(src.get(k, 0.0)) for k in ("k1", "k2", "k3", "k4", "p1", "p2")],
                dtype=np.float32,
            )

        for frame in frames:
            fname = self._get_fname(Path(frame["file_path"]), data_dir)
            for key, kind in (
                ("fl_x", fx),
                ("fl_y", fy),
                ("cx", cx),
                ("cy", cy),
                ("h", height),
                ("w", width),
            ):
                if not fixed[key]:
                    assert key in frame, f"{key} not specified in frame"
                    kind.append(float(frame[key]))
            if not distort_fixed:
                distort.append(frame_distortion(frame))

            image_filenames.append(fname)
            poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))

            if "mask_path" in frame:
                mask_filenames.append(
                    self._get_fname(Path(frame["mask_path"]), data_dir, "masks_")
                )
            if "seg_file_path" in frame:
                seg_filenames.append(
                    self._get_fname(Path(frame["seg_file_path"]), data_dir, "segs_")
                )
            if "depth_file_path" in frame:
                depth_filenames.append(
                    self._get_fname(Path(frame["depth_file_path"]), data_dir, "depths_")
                )
            if "hyperspectral_file_path" in frame:
                hs_filenames.append(
                    self._get_fname(
                        Path(frame["hyperspectral_file_path"]), data_dir, "hs_"
                    )
                )
            if "dino_file_path" in frame:
                dino_filenames.append(
                    self._get_fname(Path(frame["dino_file_path"]), data_dir, "dino_")
                )

        # stale VCA cache invalidation (reference umhs_dataparser.py:227-228)
        if hs_filenames and os.path.exists(cfg.vca_cache):
            os.remove(cfg.vca_cache)

        for name, lst in (
            ("mask", mask_filenames),
            ("depth", depth_filenames),
            ("hyperspectral", hs_filenames),
            ("dino", dino_filenames),
            ("seg", seg_filenames),
        ):
            assert len(lst) in (0, len(image_filenames)), (
                f"Different number of image and {name} filenames: "
                f"{len(lst)} vs {len(image_filenames)}"
            )

        # ---- split selection ------------------------------------------------
        if cfg.eval_mode == "fraction":
            i_train, i_eval = get_train_eval_split_fraction(
                image_filenames, cfg.train_split_fraction
            )
        elif cfg.eval_mode == "filename":
            i_train, i_eval = get_train_eval_split_filename(image_filenames)
        elif cfg.eval_mode == "interval":
            i_train, i_eval = get_train_eval_split_interval(
                image_filenames, cfg.eval_interval
            )
        elif cfg.eval_mode == "all":
            i_train, i_eval = get_train_eval_split_all(image_filenames)
        else:
            raise ValueError(f"unknown eval mode {cfg.eval_mode}")
        if split == "train":
            indices = i_train
        elif split in ("val", "test", "eval"):
            indices = i_eval
        else:
            raise ValueError(f"unknown split {split}")

        # ---- orient / center / scale ---------------------------------------
        poses = np.stack(poses)  # (N, 4, 4)
        orientation_method = meta.get("orientation_override", cfg.orientation_method)
        poses, transform_matrix = auto_orient_and_center_poses(
            poses, method=orientation_method, center_method=cfg.center_method
        )
        scale_factor = 1.0
        if cfg.auto_scale_poses:
            scale_factor /= float(np.max(np.abs(poses[:, :3, 3])))
        scale_factor *= cfg.scale_factor
        poses[:, :3, 3] *= scale_factor

        def select(lst):
            return [lst[i] for i in indices] if lst else []

        image_filenames = select(image_filenames)
        mask_filenames = select(mask_filenames)
        depth_filenames = select(depth_filenames)
        hs_filenames = select(hs_filenames)
        seg_filenames = select(seg_filenames)
        dino_filenames = select(dino_filenames)

        wavelengths = None
        if hs_filenames:
            assert "wavelengths" in meta, "Wavelengths not specified in metadata"
            wavelengths = [float(x) for x in meta["wavelengths"]]

        poses = poses[indices]

        def intrinsic(key, per_frame):
            if fixed[key]:
                return np.full(len(indices), float(meta[key]), dtype=np.float32)
            return np.asarray(per_frame, dtype=np.float32)[indices]

        heights = (
            np.full(len(indices), int(meta["h"]), dtype=np.int32)
            if fixed["h"]
            else np.asarray(height, dtype=np.int32)[indices]
        )
        widths = (
            np.full(len(indices), int(meta["w"]), dtype=np.int32)
            if fixed["w"]
            else np.asarray(width, dtype=np.int32)[indices]
        )
        if distort_fixed:
            distortion = np.tile(frame_distortion(meta)[None], (len(indices), 1))
        else:
            distortion = np.stack(distort)[indices]

        camera_type = meta.get("camera_model", "PERSPECTIVE")
        cameras = Cameras(
            camera_to_worlds=poses[:, :3, :4],
            fx=intrinsic("fl_x", fx),
            fy=intrinsic("fl_y", fy),
            cx=intrinsic("cx", cx),
            cy=intrinsic("cy", cy),
            height=heights,
            width=widths,
            distortion_params=distortion,
            camera_type=camera_type,
        )
        assert self.downscale_factor is not None
        cameras = cameras.rescale_output_resolution(1.0 / self.downscale_factor)

        if "applied_transform" in meta:
            applied = np.asarray(meta["applied_transform"], dtype=np.float64)
            transform_h = np.vstack([transform_matrix, [0, 0, 0, 1]])
            applied_h = np.vstack([applied, [0, 0, 0, 1]])
            dataparser_transform = (transform_h @ applied_h)[:3]
        else:
            dataparser_transform = transform_matrix
        if "applied_scale" in meta:
            scale_factor *= float(meta["applied_scale"])

        extra_meta = {}
        if cfg.load_3D_points and "ply_file_path" in meta:
            pts = load_ply_points(
                data_dir / meta["ply_file_path"], dataparser_transform, scale_factor
            )
            if pts is not None:
                extra_meta.update(pts)

        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_scale=cfg.scene_scale,
            dataparser_scale=scale_factor,
            dataparser_transform=dataparser_transform,
            mask_filenames=mask_filenames or None,
            metadata={
                "depth_filenames": depth_filenames or None,
                "depth_unit_scale_factor": cfg.depth_unit_scale_factor,
                "hs_filenames": hs_filenames or None,
                "dino_filenames": dino_filenames or None,
                "seg_filenames": seg_filenames or None,
                "split": split,
                "num_classes": cfg.num_classes,
                "wavelengths": wavelengths,
                "height": heights,
                "width": widths,
                **extra_meta,
            },
        )


def load_ply_points(ply_path: Path, transform: np.ndarray, scale: float):
    """Load a sparse point cloud from a .ply file (ascii or binary little
    endian), transform into dataparser coordinates, and scale — the TPU
    equivalent of the reference's open3d-based `_load_3D_points`
    (umhs_dataparser.py:500-537). Returns {"points3D_xyz", "points3D_rgb"}
    or None when the file has no points."""
    with open(ply_path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next((l.split()[1] for l in header if l.startswith("format")), "ascii")
        n_vertex = 0
        props = []
        in_vertex = False
        for l in header:
            if l.startswith("element vertex"):
                n_vertex = int(l.split()[-1])
                in_vertex = True
            elif l.startswith("element"):
                in_vertex = False
            elif l.startswith("property") and in_vertex:
                parts = l.split()
                props.append((parts[1], parts[2]))
        if n_vertex == 0:
            return None

        type_map = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "short": "i2",
            "ushort": "u2", "int": "i4", "uint": "u4",
        }
        if fmt == "ascii":
            rows = [f.readline().split() for _ in range(n_vertex)]
            data = np.asarray(rows, dtype=np.float64)
            names = [name for _, name in props]
        else:
            endian = "<" if "little" in fmt else ">"
            dtype = np.dtype([(name, endian + type_map[t]) for t, name in props])
            raw = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
            names = list(raw.dtype.names)
            data = np.stack(
                [raw[n].astype(np.float64) for n in names], axis=-1
            )

    def col(name, default=None):
        if name in names:
            return data[:, names.index(name)]
        return default

    xyz = np.stack([col("x"), col("y"), col("z")], axis=-1)
    xyz_h = np.concatenate([xyz, np.ones_like(xyz[:, :1])], axis=-1)
    xyz = (xyz_h @ np.vstack([transform, [0, 0, 0, 1]]).T)[:, :3] * scale
    out = {"points3D_xyz": xyz.astype(np.float32)}
    if "red" in names:
        rgb = np.stack([col("red"), col("green"), col("blue")], axis=-1)
        if rgb.max() <= 1.0:
            rgb = rgb * 255.0
        out["points3D_rgb"] = rgb.astype(np.uint8)
    return out
