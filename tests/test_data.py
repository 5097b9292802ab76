"""Data layer tests: synthetic scene -> dataparser -> dataset -> sampler -> rays."""

import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umhs_tpu.data.cameras import generate_camera_rays, generate_rays
from umhs_tpu.data.datamanager import (
    DataManagerConfig,
    UMHSDataManager,
    sample_pixel_batch,
)
from umhs_tpu.data.dataparser import (
    DataParserConfig,
    UMHSDataParser,
    auto_orient_and_center_poses,
    get_train_eval_split_filename,
)
from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset

SCENE = SyntheticSceneConfig(
    num_views_train=6, num_views_eval=2, image_size=32, num_bands=8, num_spheres=2
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    write_dataset(root, SCENE)
    return root


class TestSynthetic:
    def test_layout(self, dataset_dir):
        meta = json.loads((dataset_dir / "transforms.json").read_text())
        assert len(meta["frames"]) == 8
        assert len(meta["wavelengths"]) == 8
        f = meta["frames"][0]
        assert "hyperspectral_file_path" in f
        cube = np.load(dataset_dir / f["hyperspectral_file_path"])
        assert cube.shape == (32, 32, 8)
        assert cube.min() >= 0 and cube.max() <= 1

    def test_views_show_spheres(self, dataset_dir):
        meta = json.loads((dataset_dir / "transforms.json").read_text())
        cube = np.load(dataset_dir / meta["frames"][0]["hyperspectral_file_path"])
        assert cube.max() > 0.1  # spheres visible
        assert (cube.sum(-1) == 0).any()  # background present


class TestDataParser:
    def test_parse_and_split(self, dataset_dir):
        parser = UMHSDataParser(DataParserConfig(data=dataset_dir, num_classes=2))
        train = parser.parse("train")
        val = parser.parse("val")
        assert len(train.image_filenames) == 6
        assert len(val.image_filenames) == 2
        assert train.metadata["wavelengths"] == [float(w) for w in SCENE.wavelengths]
        assert train.metadata["num_classes"] == 2
        assert len(train.metadata["hs_filenames"]) == 6

    def test_poses_scaled_into_unit_box(self, dataset_dir):
        parser = UMHSDataParser(DataParserConfig(data=dataset_dir))
        train = parser.parse("train")
        t = train.cameras.camera_to_worlds[:, :3, 3]
        assert np.abs(t).max() <= 1.0 + 1e-5

    def test_stale_vca_deleted(self, dataset_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        np.save("vca.npy", np.zeros((2, 8)))
        parser = UMHSDataParser(DataParserConfig(data=dataset_dir))
        parser.parse("train")
        assert not os.path.exists("vca.npy")

    def test_filename_split_requires_train_eval(self):
        with pytest.raises(ValueError):
            get_train_eval_split_filename([Path("a/img/x.png")])

    def test_orientation_up(self):
        """After 'up' orientation the mean camera up axis must align with +z."""
        rng = np.random.default_rng(0)
        poses = []
        for _ in range(10):
            # random rotation with consistent up tilt
            theta = rng.uniform(0, 2 * np.pi)
            c2w = np.eye(4)
            tilt = np.array([0.3, 0.1, 0.94])
            tilt /= np.linalg.norm(tilt)
            z = np.array([np.cos(theta), np.sin(theta), 0.0])
            x = np.cross(tilt, z)
            x /= np.linalg.norm(x)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = x, tilt, np.cross(x, tilt)
            c2w[:3, 3] = rng.normal(0, 2, 3) + 5.0
            poses.append(c2w)
        poses = np.stack(poses)
        new_poses, transform = auto_orient_and_center_poses(poses)
        up = new_poses[:, :3, 1].mean(0)
        up /= np.linalg.norm(up)
        np.testing.assert_allclose(up, [0, 0, 1], atol=1e-5)
        # centered
        np.testing.assert_allclose(new_poses[:, :3, 3].mean(0), 0.0, atol=1e-5)


class TestRays:
    def test_center_pixel_ray_points_at_target(self, dataset_dir):
        """The central pixel's ray must pass near the scene origin (cameras
        look at the origin in the synthetic scene)."""
        parser = UMHSDataParser(DataParserConfig(data=dataset_dir))
        train = parser.parse("train")
        cam = train.cameras.to_device_dict()
        rays = generate_rays(
            cam,
            jnp.array([0]),
            jnp.array([SCENE.image_size / 2 - 0.5]),
            jnp.array([SCENE.image_size / 2 - 0.5]),
        )
        o = np.asarray(rays["origins"][0])
        d = np.asarray(rays["directions"][0])
        # the original scene origin (the look-at target) lands at
        # transform @ [0,0,0,1] scaled by the dataparser scale
        target = train.dataparser_transform[:, 3] * train.dataparser_scale
        # distance from the transformed target to the ray line
        v = o - target
        closest = v - d * np.dot(v, d)
        assert np.linalg.norm(closest) < 0.05
        np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-5)

    def test_camera_rays_shape(self, dataset_dir):
        parser = UMHSDataParser(DataParserConfig(data=dataset_dir))
        train = parser.parse("train")
        cam = train.cameras.to_device_dict()
        rays = generate_camera_rays(cam, 0, 32, 32)
        assert rays["origins"].shape == (1024, 3)
        # all origins identical (single camera)
        o = np.asarray(rays["origins"])
        assert np.ptp(o, axis=0).max() < 1e-6


class TestDataManager:
    def test_end_to_end(self, dataset_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        dm = UMHSDataManager(
            DataManagerConfig(
                dataparser=DataParserConfig(data=dataset_dir),
                train_num_rays_per_batch=64,
            ),
            num_classes=2,
        )
        assert dm.num_train_images == 6
        assert dm.wavelengths == [float(w) for w in SCENE.wavelengths]
        # VCA side-channel written by first cube load
        assert os.path.exists("vca.npy")
        em = np.load("vca.npy")
        assert em.shape == (2, 8)

        data, cam = dm.train_device_data()
        assert data["image"].shape == (6, 32, 32, 4)  # RGBA
        assert data["hs_image"].shape == (6, 32, 32, 8)

        rays, batch = sample_pixel_batch(data, cam, jax.random.PRNGKey(0), 64)
        assert rays["origins"].shape == (64, 3)
        assert batch["image"].shape == (64, 4)
        assert batch["hs_image"].shape == (64, 8)

        # sampled pixel values must match the source arrays
        idx = np.asarray(batch["indices"])
        src = np.asarray(data["image"])[idx[:, 0], idx[:, 1], idx[:, 2]]
        np.testing.assert_allclose(np.asarray(batch["image"]), src, atol=1e-6)

    def test_sampler_jits(self, dataset_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        dm = UMHSDataManager(
            DataManagerConfig(dataparser=DataParserConfig(data=dataset_dir)),
            num_classes=2,
        )
        data, cam = dm.train_device_data()
        f = jax.jit(lambda k: sample_pixel_batch(data, cam, k, 32))
        rays, batch = f(jax.random.PRNGKey(1))
        assert rays["directions"].shape == (32, 3)

    def test_eval_image(self, dataset_dir, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        dm = UMHSDataManager(
            DataManagerConfig(dataparser=DataParserConfig(data=dataset_dir)),
            num_classes=2,
        )
        rays, batch, (h, w) = dm.eval_image(0)
        assert (h, w) == (32, 32)
        assert rays["origins"].shape == (1024, 3)
        assert batch["image"].shape == (32, 32, 4)


class TestPlyPoints:
    def _write_ascii_ply(self, path, pts, rgb):
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
            f.write("end_header\n")
            for p, c in zip(pts, rgb):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")

    def test_ascii_ply(self, tmp_path):
        from umhs_tpu.data.dataparser import load_ply_points

        pts = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
        rgb = np.array([[255, 0, 0], [0, 255, 0]])
        self._write_ascii_ply(tmp_path / "p.ply", pts, rgb)
        out = load_ply_points(tmp_path / "p.ply", np.eye(4)[:3], 0.5)
        np.testing.assert_allclose(out["points3D_xyz"], pts * 0.5, atol=1e-6)
        np.testing.assert_array_equal(out["points3D_rgb"], rgb)

    def test_binary_ply(self, tmp_path):
        from umhs_tpu.data.dataparser import load_ply_points

        n = 3
        dtype = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
        arr = np.zeros(n, dtype=dtype)
        arr["x"] = [1, 2, 3]
        arr["y"] = [4, 5, 6]
        arr["z"] = [7, 8, 9]
        with open(tmp_path / "b.ply", "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {n}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"end_header\n")
            f.write(arr.tobytes())
        out = load_ply_points(tmp_path / "b.ply", np.eye(4)[:3], 1.0)
        np.testing.assert_allclose(out["points3D_xyz"][:, 0], [1, 2, 3], atol=1e-6)
        assert "points3D_rgb" not in out
