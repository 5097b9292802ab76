"""Native loader tests: parity with numpy across dtypes + parallelism."""

import numpy as np
import pytest

from umhs_tpu.native import _build_lib, parallel_load_cubes


def _write(tmp_path, name, arr):
    p = tmp_path / name
    np.save(p, arr)
    return p


def test_native_lib_builds():
    lib = _build_lib()
    assert lib is not None, "g++ build of the native loader failed"


def test_native_path_actually_used(tmp_path):
    """Call the C ABI directly — rc must be 0 (no silent numpy fallback)."""
    import ctypes

    a = (np.arange(12) % 256).astype(np.uint8).reshape(3, 4)
    p = tmp_path / "direct.npy"
    np.save(p, a)
    lib = _build_lib()
    out = np.full((1, 3, 4), -7.0, dtype=np.float32)
    paths = (ctypes.c_char_p * 1)(str(p).encode())
    rc = lib.umhs_load_npy_f32(
        paths, 1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 12, 1, 1
    )
    assert rc == 0, "native load failed; would silently fall back"
    np.testing.assert_allclose(out[0], a / 255.0, rtol=1e-6)


@pytest.mark.parametrize(
    "dtype,scale",
    [(np.float32, 1.0), (np.float64, 1.0), (np.uint8, 1 / 255.0), (np.uint16, 1 / 65535.0)],
)
def test_dtype_parity(tmp_path, dtype, scale):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        raw = rng.integers(0, np.iinfo(dtype).max, (4, 6, 5)).astype(dtype)
        expect = raw.astype(np.float32) * scale
    else:
        raw = rng.normal(0.4, 0.4, (4, 6, 5)).astype(dtype)
        expect = np.clip(raw.astype(np.float32), 0, 1)
    paths = [_write(tmp_path, f"c{i}.npy", raw) for i in range(3)]
    out = parallel_load_cubes(paths, (4, 6, 5))
    assert out.shape == (3, 4, 6, 5)
    np.testing.assert_allclose(out[0], np.clip(expect, 0, 1), rtol=1e-6)
    np.testing.assert_allclose(out[2], np.clip(expect, 0, 1), rtol=1e-6)


def test_many_files_parallel(tmp_path):
    rng = np.random.default_rng(1)
    arrs = [rng.random((8, 8, 3)).astype(np.float32) for _ in range(32)]
    paths = [_write(tmp_path, f"f{i}.npy", a) for i, a in enumerate(arrs)]
    out = parallel_load_cubes(paths, (8, 8, 3), n_threads=8)
    for i, a in enumerate(arrs):
        np.testing.assert_allclose(out[i], np.clip(a, 0, 1), rtol=1e-6)


def test_no_clamp(tmp_path):
    a = np.array([[-1.0, 2.0]], dtype=np.float32)
    p = _write(tmp_path, "x.npy", a)
    out = parallel_load_cubes([p], (1, 2), clamp01=False)
    np.testing.assert_allclose(out[0], a)
    out2 = parallel_load_cubes([p], (1, 2), clamp01=True)
    np.testing.assert_allclose(out2[0], [[0.0, 1.0]])


def test_shape_mismatch_fallback_raises(tmp_path):
    p = _write(tmp_path, "bad.npy", np.zeros((2, 2), np.float32))
    with pytest.raises(Exception):
        parallel_load_cubes([p], (3, 3))
