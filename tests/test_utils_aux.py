"""Tests for aux subsystems: metrics, hooks, profiler, prep, explore, writer."""

import json
import math
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from umhs_tpu.utils import metrics as M
from umhs_tpu.utils.hooks import assert_finite, checkify_nan
from umhs_tpu.utils.profiler import time_function
from umhs_tpu.utils.writer import ConsoleWriter, make_writer


class TestMetrics:
    def test_psnr(self):
        a = np.zeros((8, 8, 3))
        b = np.full((8, 8, 3), 0.1)
        assert abs(M.psnr(a, a) - 120.0) < 1  # clamped mse floor
        assert abs(M.psnr(a, b) - 20.0) < 1e-3

    def test_ssim_identity(self):
        rng = np.random.default_rng(0)
        img = rng.random((32, 32, 3))
        assert M.ssim(img, img) > 0.999
        assert M.ssim(img, rng.random((32, 32, 3))) < 0.5

    def test_sam(self):
        a = np.ones((4, 4, 8))
        assert M.sam(a, a * 2) < 1e-4  # same direction (float eps in arccos)
        b = np.zeros((4, 4, 8))
        b[..., 0] = 1
        c = np.zeros((4, 4, 8))
        c[..., 1] = 1
        assert abs(M.sam(b, c) - math.pi / 2) < 1e-3  # orthogonal

    def test_mse2psnr(self):
        assert abs(M.mse2psnr(0.01) - 20.0) < 1e-6


class TestHooks:
    def test_assert_finite(self):
        assert_finite({"a": jnp.ones(3)})
        with pytest.raises(FloatingPointError):
            assert_finite({"a": jnp.array([1.0, np.nan])})

    def test_checkify_nan(self):
        import jax

        f = checkify_nan(jax.jit(lambda x: jnp.log(x)))
        f(jnp.ones(3))  # fine
        with pytest.raises(Exception):
            f(jnp.zeros(3) - 1.0)  # log of negative -> nan


def test_time_function_records():
    @time_function
    def work():
        return 42

    assert work() == 42


class TestPrep:
    def test_camera_params_and_hs_paths(self, tmp_path):
        from umhs_tpu.data.prep import add_camera_params, add_hyperspectral_paths

        meta = {
            "camera_angle_x": 0.6911,
            "frames": [{"file_path": "train/r_0.png"}, {"file_path": "train/r_1.png"}],
        }
        p = tmp_path / "transforms.json"
        p.write_text(json.dumps(meta))
        out = add_camera_params(p)
        assert out["camera_model"] == "OPENCV"
        assert abs(out["fl_x"] - 0.5 * 512 / math.tan(0.6911 / 2)) < 1e-6
        out = add_hyperspectral_paths(p)
        assert out["frames"][0]["hyperspectral_file_path"] == "train/r_0.npy"

    def test_merge(self, tmp_path):
        from umhs_tpu.data.prep import merge_transforms

        (tmp_path / "a.json").write_text(json.dumps({"frames": [{"f": 1}]}))
        (tmp_path / "b.json").write_text(
            json.dumps({"frames": [{"f": 2}], "fl_x": 5})
        )
        merged = merge_transforms(
            tmp_path / "a.json", tmp_path / "b.json", tmp_path / "m.json"
        )
        assert len(merged["frames"]) == 2
        assert merged["fl_x"] == 5

    def test_spec_cube_png(self, tmp_path):
        from umhs_tpu.data.prep import NESPOF_WAVELENGTHS, spec_cube_to_rgb_png

        cube = np.random.default_rng(0).random((8, 8, 21)).astype(np.float32)
        spec_cube_to_rgb_png(cube, NESPOF_WAVELENGTHS, tmp_path / "x.png")
        assert (tmp_path / "x.png").exists()

    def test_exr_roundtrip(self, tmp_path):
        from umhs_tpu.data.prep import read_exr, write_exr_minimal

        rng = np.random.default_rng(3)
        img = rng.random((9, 13)).astype(np.float32)
        write_exr_minimal(tmp_path / "f32.exr", img)
        np.testing.assert_array_equal(read_exr(tmp_path / "f32.exr"), img)
        # HALF pixels (NeSpoF EXRs are half-float)
        write_exr_minimal(tmp_path / "f16.exr", img, half=True)
        np.testing.assert_allclose(
            read_exr(tmp_path / "f16.exr"), img, atol=1e-3
        )

    def test_convert_nespof_scene(self, tmp_path):
        """End-to-end EXR->cube conversion on a generated NeSpoF-layout
        fixture (reference: /root/reference/data/spec2rgb.py:141-162)."""
        from umhs_tpu.data.prep import (
            NESPOF_WAVELENGTHS,
            convert_nespof_scene,
            write_exr_minimal,
        )

        rng = np.random.default_rng(5)
        h = w = 6
        n_views = 2
        truth = rng.random((n_views, h, w, len(NESPOF_WAVELENGTHS))).astype(
            np.float32
        ) * 1.2 - 0.1  # exercise the [0,1] clip
        scene = tmp_path / "scene"
        for b, wl in enumerate(NESPOF_WAVELENGTHS):
            d = scene / "train" / str(wl)
            d.mkdir(parents=True)
            for k in range(n_views):
                write_exr_minimal(d / f"frame_{k}_s0.exr", truth[k, :, :, b])

        out = tmp_path / "out"
        n = convert_nespof_scene(scene, out)
        assert n == n_views
        for k in range(n_views):
            cube = np.load(out / "train" / f"r_{k}.npy")
            assert cube.shape == (h, w, len(NESPOF_WAVELENGTHS))
            np.testing.assert_allclose(
                cube, np.clip(truth[k], 0.0, 1.0), atol=1e-6
            )
            assert (out / "train" / f"r_{k}.png").exists()


class TestExplore:
    def test_cube_stats_and_band(self, tmp_path):
        from umhs_tpu.data.explore import band_image, cube_stats

        cube = np.random.default_rng(1).random((8, 8, 5)).astype(np.float32)
        np.save(tmp_path / "c.npy", cube)
        s = cube_stats(tmp_path / "c.npy")
        assert s["shape"] == (8, 8, 5)
        img = band_image(tmp_path / "c.npy", 2, tmp_path / "b.png")
        assert img.shape == (8, 8)
        assert (tmp_path / "b.png").exists()

    def test_wavelength_curve(self):
        from umhs_tpu.data.explore import wavelength_rgb_curve

        m = wavelength_rgb_curve(list(range(450, 651, 10)))
        assert m.shape == (21, 3)


class TestWriter:
    def test_console_writer_jsonl(self, tmp_path, capsys):
        w = ConsoleWriter(tmp_path / "m.jsonl")
        w.write(5, {"psnr": 21.5})
        out = capsys.readouterr().out
        assert "psnr" in out and "step 5" in out
        rec = json.loads((tmp_path / "m.jsonl").read_text().strip())
        assert rec["step"] == 5 and rec["psnr"] == 21.5

    def test_make_writer_fallback(self, tmp_path):
        w = make_writer("nonexistent+console", tmp_path)
        w.write(1, {"x": 1.0})
        w.close()


class TestLPIPS:
    def test_fallback_is_variant_scoped(self):
        from umhs_tpu.utils import metrics as mu

        rng = np.random.default_rng(0)
        a = rng.random((32, 32, 3)).astype(np.float32)
        v = mu.lpips(a, a)
        assert v is not None and v < 1e-8  # identical images -> ~0
        assert mu.LPIPS_VARIANT in ("vgg16_random", "vgg16_imagenet")

    def test_npz_dropin_upgrades_variant(self, tmp_path, monkeypatch):
        """A converted vgg16_imagenet.npz (scripts/convert_vgg16_weights.py
        layout) switches LPIPS_VARIANT to 'vgg16_imagenet' and loads into
        the conv stack (verified here with correctly-shaped stand-in
        weights; the real archive has identical structure)."""
        from umhs_tpu.utils import metrics as mu

        rng = np.random.default_rng(0)
        shapes, c_in, arrs = [], 3, {}
        i = 0
        for spec in mu._VGG16_CFG:
            if spec == "M":
                continue
            arrs[f"conv{i}_w"] = rng.standard_normal(
                (spec, c_in, 3, 3)
            ).astype(np.float32) * 0.05
            arrs[f"conv{i}_b"] = np.zeros(spec, np.float32)
            c_in = spec
            i += 1
        f = tmp_path / "vgg16_imagenet.npz"
        np.savez(f, **arrs)
        monkeypatch.setenv("UMHS_VGG16_WEIGHTS", str(f))
        mu._LPIPS_CACHE.clear()
        try:
            a = rng.random((32, 32, 3)).astype(np.float32)
            b = rng.random((32, 32, 3)).astype(np.float32)
            v = mu.lpips(a, b)
            assert v is not None and v > 0
            assert mu.LPIPS_VARIANT == "vgg16_imagenet"
        finally:
            mu._LPIPS_CACHE.clear()
            mu.LPIPS_VARIANT = None


def test_bench_warm_state_key(monkeypatch, tmp_path):
    """The bench's warm-state cache key tracks code content + bench knobs:
    same inputs -> same dir; any knob change -> different dir (stale state
    must never be restored into changed code)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.delenv("UMHS_BENCH_STAGES", raising=False)
    d1 = bench._warm_state_dir()
    assert d1 == bench._warm_state_dir()  # deterministic
    monkeypatch.setenv("UMHS_BENCH_STAGES", "8,16")
    d2 = bench._warm_state_dir()
    assert d1 != d2
    # pruning keeps at most one stale sibling
    for name in ("bench_state_aaa", "bench_state_bbb", "bench_state_ccc"):
        (tmp_path / ".cache" / "umhs_tpu" / name).mkdir(parents=True)
    bench._warm_state_dir()
    left = sorted(
        p.name for p in (tmp_path / ".cache" / "umhs_tpu").glob("bench_state_*")
    )
    assert len(left) == 1, left
