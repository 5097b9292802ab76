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


class TestMaskAndPatchSampling:
    """Mask-aware + patch-based pixel sampling (reference mask_path
    collection umhs_dataparser.py:203-213; patch_size umhs_datamanager.py:57)."""

    def _data(self):
        n, h, w = 3, 16, 16
        key = jax.random.PRNGKey(0)
        data = {"image": jax.random.uniform(key, (n, h, w, 3))}
        cam = {
            "c2w": jnp.tile(jnp.eye(4)[None, :3], (n, 1, 1)),
            "fx": jnp.full((n,), 20.0),
            "fy": jnp.full((n,), 20.0),
            "cx": jnp.full((n,), w / 2.0),
            "cy": jnp.full((n,), h / 2.0),
        }
        return data, cam, (n, h, w)

    def test_masked_pixels_never_sampled(self):
        data, cam, (n, h, w) = self._data()
        # mask out the left half of every frame
        mask = np.zeros((n, h, w), dtype=bool)
        mask[:, :, w // 2 :] = True
        data["valid_indices"] = jnp.asarray(
            np.flatnonzero(mask.reshape(-1)).astype(np.int32)
        )
        rays, batch = sample_pixel_batch(data, cam, jax.random.PRNGKey(1), 512)
        idx = np.asarray(batch["indices"])
        assert (idx[:, 2] >= w // 2).all()  # only unmasked columns
        assert "valid_indices" not in batch
        # values still gathered correctly
        src = np.asarray(data["image"])[idx[:, 0], idx[:, 1], idx[:, 2]]
        np.testing.assert_allclose(np.asarray(batch["image"]), src, atol=1e-6)

    def test_patch_sampling_contiguous(self):
        data, cam, (n, h, w) = self._data()
        p = 4
        rays, batch = sample_pixel_batch(
            data, cam, jax.random.PRNGKey(2), 8 * p * p, patch_size=p
        )
        idx = np.asarray(batch["indices"]).reshape(8, p, p, 3)
        # each block: one image, contiguous rows/cols
        assert (np.ptp(idx[..., 0], axis=(1, 2)) == 0).all()
        for a in range(8):
            r0, c0 = idx[a, 0, 0, 1], idx[a, 0, 0, 2]
            np.testing.assert_array_equal(
                idx[a, :, :, 1], np.broadcast_to(r0 + np.arange(p)[:, None], (p, p))
            )
            np.testing.assert_array_equal(
                idx[a, :, :, 2], np.broadcast_to(c0 + np.arange(p)[None, :], (p, p))
            )
        assert idx[..., 1].max() < h and idx[..., 2].max() < w

    def test_masked_patch_anchors_valid(self):
        data, cam, (n, h, w) = self._data()
        mask = np.zeros((n, h, w), dtype=bool)
        mask[:, 4:12, 4:12] = True
        data["valid_indices"] = jnp.asarray(
            np.flatnonzero(mask.reshape(-1)).astype(np.int32)
        )
        p = 4
        f = jax.jit(
            lambda k: sample_pixel_batch(data, cam, k, 4 * p * p, patch_size=p)
        )
        rays, batch = f(jax.random.PRNGKey(3))
        idx = np.asarray(batch["indices"])
        # patches clamp inside the image and straddle the valid region
        assert idx[:, 1].min() >= 0 and idx[:, 1].max() < h
        assert idx[:, 2].min() >= 0 and idx[:, 2].max() < w

    def test_dataset_valid_indices_from_masks(self, dataset_dir, tmp_path, monkeypatch):
        """End-to-end: mask PNGs on disk -> dataset masks -> valid indices."""
        from PIL import Image

        monkeypatch.chdir(tmp_path)
        # write mask PNGs + a transforms.json referencing them
        src = json.loads((Path(dataset_dir) / "transforms.json").read_text())
        root = tmp_path / "masked_scene"
        root.mkdir()
        (root / "masks").mkdir()
        import shutil

        for item in Path(dataset_dir).iterdir():
            if item.name != "transforms.json":
                if item.is_dir():
                    shutil.copytree(item, root / item.name)
                else:
                    shutil.copy(item, root / item.name)
        for fr in src["frames"]:
            name = Path(fr["file_path"]).stem + ".png"
            m = np.zeros((32, 32), dtype=np.uint8)
            m[:, 16:] = 255
            Image.fromarray(m).save(root / "masks" / name)
            fr["mask_path"] = f"masks/{name}"
        (root / "transforms.json").write_text(json.dumps(src))

        dm = UMHSDataManager(
            DataManagerConfig(dataparser=DataParserConfig(data=root)),
            num_classes=2,
        )
        vi = dm.train_dataset.valid_indices()
        assert vi is not None
        cols = vi % 32
        assert (cols >= 16).all()
        data, cam = dm.train_device_data()
        assert "valid_indices" in data
        rays, batch = sample_pixel_batch(data, cam, jax.random.PRNGKey(4), 128)
        assert (np.asarray(batch["indices"])[:, 2] >= 16).all()


class TestCameraModels:
    """Fisheye / equirectangular ray generation with hand-computed goldens
    (reference camera model selection: umhs_dataparser.py:334-337)."""

    def _cam(self, n=1, fx=100.0, fy=100.0, cx=50.0, cy=50.0):
        return {
            "c2w": jnp.tile(jnp.eye(4)[None, :3], (n, 1, 1)),
            "fx": jnp.full((n,), fx),
            "fy": jnp.full((n,), fy),
            "cx": jnp.full((n,), cx),
            "cy": jnp.full((n,), cy),
        }

    def test_fisheye_center_and_edge(self):
        cam = self._cam()
        idx = jnp.zeros((3,), jnp.int32)
        # pixel centers: principal point, theta=0.5 rad right, 0.5 rad up
        rows = jnp.array([49.5, 49.5, -0.5])
        cols = jnp.array([49.5, 99.5, 49.5])
        rays = generate_rays(cam, idx, rows, cols, camera_type="OPENCV_FISHEYE")
        d = np.asarray(rays["directions"])
        # principal point looks straight down -z
        np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-6)
        # 50px right at fx=100 -> theta = 0.5 rad in +x
        np.testing.assert_allclose(
            d[1], [np.sin(0.5), 0.0, -np.cos(0.5)], atol=1e-6
        )
        # 50px up -> theta = 0.5 rad in +y (image v grows downward)
        np.testing.assert_allclose(
            d[2], [0.0, np.sin(0.5), -np.cos(0.5)], atol=1e-6
        )

    def test_equirectangular_golden(self):
        # 360 pano: W=360, H=180, cx=W/2, fx=W/2, cy=H/2, fy=H/2
        cam = self._cam(fx=180.0, fy=90.0, cx=180.0, cy=90.0)
        idx = jnp.zeros((4,), jnp.int32)
        rows = jnp.array([89.5, 89.5, 89.5, -0.5 + 45.0])
        cols = jnp.array([179.5, 89.5, 359.5, 179.5])
        rays = generate_rays(cam, idx, rows, cols, camera_type="EQUIRECTANGULAR")
        d = np.asarray(rays["directions"])
        # center -> -z
        np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-6)
        # quarter-pano left (x_n=-0.5): theta=+pi/2 -> +x
        np.testing.assert_allclose(d[1], [1, 0, 0], atol=1e-6)
        # extreme right edge (x_n ~ 1): theta ~ -pi -> +z (behind)
        np.testing.assert_allclose(d[2], [0, 0, 1], atol=1e-2)
        # 45 deg up from center (y_n=-0.5): phi=+pi/4
        s = np.sin(np.pi / 4)
        np.testing.assert_allclose(d[3], [0, s, -s], atol=1e-6)

    def test_unit_norm_and_jit(self):
        cam = self._cam()
        idx = jnp.zeros((64,), jnp.int32)
        rows = jnp.linspace(0, 99, 64)
        cols = jnp.linspace(0, 99, 64)
        for ct in ("OPENCV_FISHEYE", "EQUIRECTANGULAR", "PERSPECTIVE"):
            f = jax.jit(
                lambda r, c, ct=ct: generate_rays(cam, idx, r, c, camera_type=ct)
            )
            d = np.asarray(f(rows, cols)["directions"])
            np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
