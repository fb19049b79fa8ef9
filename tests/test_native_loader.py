"""Native C++ npz decoder vs numpy oracle (compressed + uncompressed,
f4 + f8 dtypes)."""

import numpy as np
import pytest

from gan3d_tpu.data.native import NativeNpzPool, available
from gan3d_tpu.data.datasets import NpzDirDataset, make_dir_dataset

pytestmark = pytest.mark.skipif(not available(),
                                reason="native loader unavailable")


def test_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    shapes = (4, 6, 5)
    paths = []
    expect = []
    for i, (dtype, compress) in enumerate(
            [(np.float32, True), (np.float32, False),
             (np.float64, True), (np.float64, False)]):
        x = (rng.normal(size=shapes) * 2).astype(dtype)
        p = str(tmp_path / f"{i}.npz")
        (np.savez_compressed if compress else np.savez)(p, X=x)
        paths.append(p)
        expect.append(np.clip(x, -1, 1).astype(np.float32))
    pool = NativeNpzPool(2)
    out = pool.decode_batch(paths, shapes)
    np.testing.assert_allclose(out, np.stack(expect), atol=1e-7)


def test_dir_dataset_native_batch(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(10, 4, 4, 4)) * 2).astype(np.float32)
    arch = str(tmp_path / "a.npz")
    np.savez(arch, X=x)
    d = str(tmp_path / "dir")
    make_dir_dataset(arch, d)
    ds_native = NpzDirDataset(d, native=True)
    ds_py = NpzDirDataset(d, native=False)
    assert ds_native._pool is not None
    idx = [3, 1, 7]
    np.testing.assert_allclose(ds_native.batch(idx), ds_py.batch(idx),
                               atol=1e-7)


def test_error_on_wrong_size(tmp_path):
    x = np.zeros((2, 2), np.float32)
    p = str(tmp_path / "0.npz")
    np.savez(p, X=x)
    pool = NativeNpzPool(1)
    with pytest.raises(IOError):
        pool.decode_batch([p], (3, 3))


def test_throughput_sanity(tmp_path):
    """Native batch decode should not be slower than 3x numpy (it is
    typically much faster; loose bound keeps CI stable)."""
    import time

    rng = np.random.default_rng(2)
    x = rng.normal(size=(32, 32, 32, 32)).astype(np.float32)
    arch = str(tmp_path / "a.npz")
    np.savez(arch, X=x)
    d = str(tmp_path / "dir")
    make_dir_dataset(arch, d)
    idx = list(range(32))

    ds_native = NpzDirDataset(d, native=True, native_threads=4)
    ds_py = NpzDirDataset(d, native=False)
    ds_native.batch(idx)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        ds_native.batch(idx)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        ds_py.batch(idx)
    t_py = time.perf_counter() - t0
    print(f"native {t_native:.3f}s vs numpy {t_py:.3f}s")
    assert t_native < 3 * t_py
